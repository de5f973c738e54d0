package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Black-Scholes implied volatility as a native Catalyst expression.
  *
  * The reference prices chains forward (derivatives.py:57
  * `BlackScholesModel`); the inverse — given a market premium, what vol
  * does it imply — is the next call a derivatives user makes, flagged as
  * the one remaining derivatives gap in round 9. The inversion is a
  * fixed 40-step bisection on sigma ∈ [0.01, 5.0] (resolution ≈ 4.5e-12):
  *
  *  - *bisection, not Newton*: clamped Newton ping-pongs between the
  *    sigma bounds on low-vega rows (a step from a flat region overshoots
  *    to a clamp, where the next step overshoots back), while bisection
  *    is unconditionally convergent on the monotone price curve
  *    (vega > 0 everywhere), so a fixed iteration count is total;
  *  - *fixed iterations, not a convergence test*, so the DuckDB oracle
  *    can unroll the identical arithmetic as 40 generated CTEs
  *    ([[bisectSql]]) and the result is hash-exact, same posture as the
  *    LCG minhash permutations and the A&S [[NormCdf]] polynomial;
  *  - *ulp-robust*: libm and the JVM may differ in the last ulp of
  *    `exp`/`log`, which can flip a `price < target` branch — but only
  *    when mid is already within ~ulp/vega of the root, after which both
  *    engines' brackets collapse onto that same root from either side,
  *    so the final 1e-6 snap agrees.
  *
  * One row-local codegen'd call per option — no shuffle, no state;
  * a 100 TB chain inverts embarrassingly parallel inside the scan stage.
  */
case class ImpliedVolExpr(s: Expression, k: Expression, t: Expression,
    isCall: Expression, target: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(s, k, t, isCall, target)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bs_implied_vol"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else ImpliedVol.bisect(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Boolean],
      vs(4).asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    val anyNull =
      if (nullable) cs.map(_.isNull.toString).mkString(" || ") else "false"
    val childCode = cs.map(_.code.toString).mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.ImpliedVol.bisect(
          ${cs(0).value}, ${cs(1).value}, ${cs(2).value},
          ${cs(3).value}, ${cs(4).value});
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ImpliedVolExpr =
    copy(s = c(0), k = c(1), t = c(2), isCall = c(3), target = c(4))
}

object ImpliedVol {
  val Lo = 0.01
  val Hi = 5.0
  val Iters = 40

  /** One Black-Scholes price. Must stay formula-identical with the SQL in
    * [[bisectSql]] (and with [[BlackScholes.withPricing]] for the target
    * construction): same literal 0.02 rate, same association order.
    */
  def price(s: Double, k: Double, t: Double, disc: Double,
      sigma: Double, isCall: Boolean): Double = {
    val sqt = math.sqrt(t)
    val d1 = (math.log(s / k) + (0.02 + sigma * sigma * 0.5) * t) / (sigma * sqt)
    val d2 = d1 - sigma * sqt
    if (isCall) s * NormCdf.cdf(d1) - k * disc * NormCdf.cdf(d2)
    else k * disc * NormCdf.cdf(-d2) - s * NormCdf.cdf(-d1)
  }

  /** Fixed 40-step bisection for the sigma with price(sigma) = target. */
  def bisect(s: Double, k: Double, t: Double, isCall: Boolean,
      target: Double): Double = {
    val disc = math.exp(t * -0.02)
    var lo = Lo
    var hi = Hi
    var i = 0
    while (i < Iters) {
      val mid = (lo + hi) * 0.5
      if (price(s, k, t, disc, mid, isCall) < target) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) * 0.5
  }

  def apply(s: Column, k: Column, t: Column, isCall: Column, target: Column): Column =
    Bridge.toColumn(ImpliedVolExpr(
      Bridge.toExpression(s.cast("double")), Bridge.toExpression(k.cast("double")),
      Bridge.toExpression(t.cast("double")), Bridge.toExpression(isCall),
      Bridge.toExpression(target.cast("double"))))

  /** The identical bisection as generated DuckDB CTEs.
    *
    * `src` must provide (s, k, t, is_call, target) plus any passthrough
    * columns in `carry`; the final CTE `bs_iv` carries them plus `iv`.
    */
  def bisectSql(src: String, carry: Seq[String]): String = {
    import NormCdf.ncdfSql
    val keep = (carry ++ Seq("s", "k", "t", "is_call", "target", "disc")).mkString(", ")
    val seed =
      s"""bi0 AS (
         |  SELECT $keep, $Lo AS lo, $Hi AS hi
         |  FROM (SELECT *, exp(t * -0.02) AS disc FROM $src)
         |)""".stripMargin
    val steps = (1 to Iters).map { i =>
      s"""bi$i AS (
         |  SELECT $keep,
         |         CASE WHEN price < target THEN mid ELSE lo END AS lo,
         |         CASE WHEN price < target THEN hi ELSE mid END AS hi
         |  FROM (
         |    SELECT *, CASE WHEN is_call
         |                   THEN s * ${ncdfSql("d1")} - k * disc * ${ncdfSql("d2")}
         |                   ELSE k * disc * ${ncdfSql("-d2")} - s * ${ncdfSql("-d1")}
         |              END AS price
         |    FROM (SELECT *, d1 - mid * sqrt(t) AS d2
         |          FROM (SELECT *, (ln(s / k) + (0.02 + mid * mid * 0.5) * t) / (mid * sqrt(t)) AS d1
         |                FROM (SELECT *, (lo + hi) * 0.5 AS mid FROM bi${i - 1})))
         |  )
         |)""".stripMargin
    }
    val fin =
      s"""bs_iv AS (
         |  SELECT $keep, (lo + hi) * 0.5 AS iv FROM bi$Iters
         |)""".stripMargin
    (seed +: steps :+ fin).mkString(",\n")
  }
}
