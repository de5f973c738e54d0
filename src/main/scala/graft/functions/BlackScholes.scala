package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Black-Scholes pricing + greeks as Column pipelines over an option grid
  * (s, k, t, sigma columns; r constant).
  *
  * Reference: backtesting/derivatives.py BlackScholesModel (:57-213).
  * Everything is plain IEEE column arithmetic around the codegen'd
  * [[NormCdfExpr]], so a million-row option chain prices inside one
  * whole-stage-codegen loop.
  */
object BlackScholes {
  val R = 0.02

  /** Adds d1/d2/nd1/nd2/ndm1/ndm2/pdf1 then price + greek columns. */
  def withPricing(grid: DataFrame): DataFrame = {
    val s = col("s"); val k = col("k"); val t = col("t"); val sigma = col("sigma")
    grid
      .withColumn("d1",
        (log(s / k) + (lit(R) + sigma * sigma * 0.5) * t) / (sigma * sqrt(t)))
      .withColumn("d2", col("d1") - sigma * sqrt(t))
      .withColumn("nd1", NormCdf(col("d1")))
      .withColumn("nd2", NormCdf(col("d2")))
      .withColumn("ndm1", NormCdf(-col("d1")))
      .withColumn("ndm2", NormCdf(-col("d2")))
      .withColumn("pdf1", exp(lit(-0.5) * col("d1") * col("d1")) * 0.3989422804014327)
      .withColumn("disc", exp(t * -R))
      .withColumn("call", s * col("nd1") - k * col("disc") * col("nd2"))
      .withColumn("put", k * col("disc") * col("ndm2") - s * col("ndm1"))
      .withColumn("delta_call", col("nd1"))
      .withColumn("delta_put", -col("ndm1"))
      .withColumn("gamma", col("pdf1") / (s * sigma * sqrt(t)))
      .withColumn("vega", s * col("pdf1") * sqrt(t) / 100)
      .withColumn("theta_call",
        (-s * col("pdf1") * sigma / (sqrt(t) * 2) - lit(R) * k * col("disc") * col("nd2")) / 365)
      .withColumn("theta_put",
        (-s * col("pdf1") * sigma / (sqrt(t) * 2) + lit(R) * k * col("disc") * col("ndm2")) / 365)
      .withColumn("rho_call", k * t * col("disc") * col("nd2") / 100)
      .withColumn("rho_put", -k * t * col("disc") * col("ndm2") / 100)
  }

  /** The matching DuckDB CTE chain over a `grid(id, s, k, t, sigma)` CTE.
    * Final CTE: `priced`.
    */
  def pricedSql: String = pricedSqlFrom("grid", "")

  /** Same chain reading from `src`, intermediate/final CTE names prefixed
    * with `p` — lets one oracle price twice (entry vs current state).
    * Final CTE: `${p}priced`.
    */
  def pricedSqlFrom(src: String, p: String): String = {
    import NormCdf.{ncdfSql, npdfSql}
    s"""${p}d AS (
       |  SELECT *,
       |         (ln(s / k) + (0.02 + sigma * sigma * 0.5) * t) / (sigma * sqrt(t)) AS d1
       |  FROM $src
       |),
       |${p}dd AS (SELECT *, d1 - sigma * sqrt(t) AS d2 FROM ${p}d),
       |${p}cdfs AS (
       |  SELECT *,
       |         ${ncdfSql("d1")} AS nd1, ${ncdfSql("d2")} AS nd2,
       |         ${ncdfSql("-d1")} AS ndm1, ${ncdfSql("-d2")} AS ndm2,
       |         ${npdfSql("d1")} AS pdf1, exp(t * -0.02) AS disc
       |  FROM ${p}dd
       |),
       |${p}priced AS (
       |  SELECT *,
       |         s * nd1 - k * disc * nd2 AS call,
       |         k * disc * ndm2 - s * ndm1 AS put,
       |         nd1 AS delta_call, -ndm1 AS delta_put,
       |         pdf1 / (s * sigma * sqrt(t)) AS gamma,
       |         s * pdf1 * sqrt(t) / 100 AS vega,
       |         (-s * pdf1 * sigma / (sqrt(t) * 2) - 0.02 * k * disc * nd2) / 365 AS theta_call,
       |         (-s * pdf1 * sigma / (sqrt(t) * 2) + 0.02 * k * disc * ndm2) / 365 AS theta_put,
       |         k * t * disc * nd2 / 100 AS rho_call,
       |         -k * t * disc * ndm2 / 100 AS rho_put
       |  FROM ${p}cdfs
       |)""".stripMargin
  }
}
