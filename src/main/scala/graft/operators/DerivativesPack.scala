package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.{BlackScholes, ImpliedVol, Port}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derivatives queries: Black-Scholes chain pricing + greeks, option
  * strategy P&L tables, futures calculator.
  * Reference: backtesting/derivatives.py.
  *
  * The option grid derives deterministically from `part`
  * (spot := p_retailprice; strike/expiry/vol fan out from p_partkey), so
  * the chain scales with the table and both engines build identical
  * inputs.
  */
object DerivativesPack extends QueryPack {

  private def grid(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey").as("id"),
      col("p_retailprice").as("s"),
      (col("p_retailprice") * (lit(0.8) + (col("p_partkey") % 5).cast("double") * 0.1)).as("k"),
      ((lit(1) + col("p_partkey") % 24).cast("double") / 12.0).as("t"),
      (lit(0.15) + (col("p_partkey") % 20).cast("double") * 0.01).as("sigma"))

  private val GridCte: String =
    """grid AS (
      |  SELECT p_partkey AS id, p_retailprice AS s,
      |         p_retailprice * (0.8 + CAST(p_partkey % 5 AS DOUBLE) * 0.1) AS k,
      |         CAST(1 + p_partkey % 24 AS DOUBLE) / 12.0 AS t,
      |         0.15 + CAST(p_partkey % 20 AS DOUBLE) * 0.01 AS sigma
      |  FROM part
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_black_scholes" -> ((s, d) =>
      BlackScholes.withPricing(grid(s, d))
        .select(col("id"), col("s"), col("k"), col("t"), col("sigma"),
          Port.r(col("call"), 4).as("call"),
          Port.r(col("put"), 4).as("put"),
          Port.r(col("delta_call"), 6).as("delta_call"),
          Port.r(col("delta_put"), 6).as("delta_put"),
          Port.r(col("gamma"), 8).as("gamma"),
          Port.r(col("vega"), 4).as("vega"),
          Port.r(col("theta_call"), 6).as("theta_call"),
          Port.r(col("theta_put"), 6).as("theta_put"),
          Port.r(col("rho_call"), 4).as("rho_call"),
          Port.r(col("rho_put"), 4).as("rho_put"))
        .orderBy("id")),
    "q_option_strategies" -> ((s, d) =>
      BlackScholes.withPricing(grid(s, d))
        .select(col("id"), col("s"), col("k"),
          // covered call (derivatives.py:224), 100 shares
          Port.r(col("s") * 100, 2).as("cc_stock_value"),
          Port.r(col("call") * 100, 4).as("cc_premium_received"),
          Port.r((col("k") - col("s")) * 100 + col("call") * 100, 4).as("cc_max_profit"),
          Port.r(col("s") - col("call"), 4).as("cc_breakeven"),
          // protective put (derivatives.py:254)
          Port.r(col("put") * 100, 4).as("pp_premium_paid"),
          Port.r((col("s") - col("k")) * 100 + col("put") * 100, 4).as("pp_max_loss"),
          Port.r(col("s") + col("put"), 4).as("pp_breakeven"),
          // straddle (derivatives.py:284), 1 contract
          Port.r((col("call") + col("put")) * 100, 4).as("st_total_cost"),
          Port.r(col("k") + (col("call") + col("put")), 4).as("st_upper_breakeven"),
          Port.r(col("k") - (col("call") + col("put")), 4).as("st_lower_breakeven"))
        .orderBy("id")),
    "q_iron_condor" -> ((s, d) => {
      import s.implicits._
      val legsDf = Seq(("lp", 0.9), ("up", 0.95), ("lc", 1.05), ("uc", 1.1)).toDF("leg", "mult")
      val legs = grid(s, d).drop("k").crossJoin(broadcast(legsDf))
        .withColumn("k", col("s") * col("mult"))
      val priced = BlackScholes.withPricing(legs)
      priced.groupBy("id", "s", "t", "sigma")
        .agg(
          max(when(col("leg") === "lp", col("put"))).as("put_lp"),
          max(when(col("leg") === "up", col("put"))).as("put_up"),
          max(when(col("leg") === "lc", col("call"))).as("call_lc"),
          max(when(col("leg") === "uc", col("call"))).as("call_uc"),
          max(when(col("leg") === "lp", col("k"))).as("k_lp"),
          max(when(col("leg") === "up", col("k"))).as("k_up"),
          max(when(col("leg") === "lc", col("k"))).as("k_lc"))
        .withColumn("net_credit_raw",
          (-col("put_lp") + col("put_up") + col("call_lc") - col("call_uc")) * 100)
        .select(col("id"), col("s"), col("t"), col("sigma"),
          Port.r(col("net_credit_raw"), 4).as("net_credit"),
          Port.r(((col("k_up") - col("k_lp")) - col("net_credit_raw") / 100) * 100, 4).as("max_loss"),
          Port.r(col("k_up") - col("net_credit_raw") / 100, 4).as("lower_breakeven"),
          Port.r(col("k_lc") + col("net_credit_raw") / 100, 4).as("upper_breakeven"))
        .orderBy("id")
    }),
    "q_derivatives_portfolio" -> ((s, d) => {
      // DerivativesPortfolio valuation (derivatives.py:451-523): option
      // positions from the part-derived grid (entry premium = BS price at
      // inception), revalued at a moved spot and rolled-down expiry;
      // futures positions from orders; one book per (id % 10). PnLs are
      // snapped per position and summed as longs — exact aggregation.
      val base = grid(s, d)
        .withColumn("book", col("id") % 10)
        .withColumn("qty",
          (when(col("id") % 3 === 0, -1).otherwise(1) * (lit(1) + col("id") % 5)).cast("double"))
        .withColumn("is_call", col("id") % 2 === 0)
      val entry = BlackScholes.withPricing(base)
        .select(col("id"), col("book"), col("qty"), col("is_call"),
          when(col("is_call"), col("call")).otherwise(col("put")).as("entry_premium"),
          col("s"), col("k"), col("t"), col("sigma"))
      val curGrid = entry.select(col("id"), col("book"), col("qty"), col("is_call"),
          col("entry_premium"),
          (col("s") * (lit(0.95) + (col("id") % 11).cast("double") * 0.01)).as("s"),
          col("k"), (col("t") - lit(1.0) / 12).as("t"), col("sigma"))
        .filter(col("t") > 0) // expired options drop out (reference :545)
      val cur = BlackScholes.withPricing(curGrid)
      def e4(c: org.apache.spark.sql.Column) = floor(c * 1e4 + lit(0.5)).cast("long")
      def e6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + lit(0.5)).cast("long")
      val optBook = cur
        .select(col("book"),
          e4((when(col("is_call"), col("call")).otherwise(col("put")) - col("entry_premium"))
            * col("qty") * 100).as("pnl_e4"),
          e6(when(col("is_call"), col("delta_call")).otherwise(col("delta_put"))
            * col("qty") * 100).as("delta_e6"),
          e6(col("gamma") * col("qty") * 100).as("gamma_e6"),
          e6(col("vega") * col("qty") * 100).as("vega_e6"))
        .groupBy("book")
        .agg(count(lit(1)).as("n_options"), sum(col("pnl_e4")).as("opt_pnl_e4"),
          sum(col("delta_e6")).as("delta_e6"), sum(col("gamma_e6")).as("gamma_e6"),
          sum(col("vega_e6")).as("vega_e6"))
      val futBook = Tables.orders(s, d).select(
          (col("o_orderkey") % 10).as("book"),
          e4((col("o_totalprice") / 100 * (lit(0.9) + (col("o_orderkey") % 21).cast("double") * 0.01)
            - col("o_totalprice") / 100) * 50
            * (lit(1) + col("o_orderkey") % 10).cast("double")).as("pnl_e4"))
        .groupBy("book")
        .agg(count(lit(1)).as("n_futures"), sum(col("pnl_e4")).as("fut_pnl_e4"))
      optBook.join(futBook, "book")
        .select(col("book"), col("n_options"), col("n_futures"),
          (col("opt_pnl_e4") / 1e4).as("opt_pnl"),
          (col("fut_pnl_e4") / 1e4).as("fut_pnl"),
          (lit(1000000.0) + (col("opt_pnl_e4") + col("fut_pnl_e4")) / 1e4).as("portfolio_value"),
          (col("delta_e6") / 1e6).as("net_delta"),
          (col("gamma_e6") / 1e6).as("net_gamma"),
          (col("vega_e6") / 1e6).as("net_vega"))
        .orderBy("book")
    }),
    "q_implied_vol" -> ((s, d) => {
      // Implied volatility round-trip (the inverse of q_black_scholes;
      // round-9 verdict's one noted derivatives gap): market premium :=
      // the BS price at the grid's true sigma, snapped to 1e-6 so both
      // engines seed the inversion with bit-identical targets, then
      // inverted by the fixed-iteration bisection expression. The gate
      // keeps rows with >= 0.5% of spot in time value — computed from the
      // snapped target and +/- arithmetic only (no exp in the predicate,
      // so the kept row set cannot ulp-flip) — dropping deep-ITM /
      // short-dated rows where sigma barely moves the price and IV is
      // ill-conditioned in any engine.
      val tgt = BlackScholes.withPricing(grid(s, d))
        .select(col("id"), col("s"), col("k"), col("t"),
          col("sigma").as("sigma_true"),
          (col("id") % 2 === 0).as("is_call"),
          Port.r(when(col("id") % 2 === 0, col("call")).otherwise(col("put")), 6).as("target"))
      tgt
        .filter((col("target") - greatest(
            when(col("is_call"), col("s") - col("k")).otherwise(col("k") - col("s")),
            lit(0.0))) / col("s") >= 0.005)
        .select(col("id"), col("s"), col("k"), col("t"),
          col("is_call").cast("int").as("is_call"),
          col("target"), col("sigma_true"),
          Port.r(ImpliedVol(col("s"), col("k"), col("t"), col("is_call"), col("target")), 6).as("iv"))
        .orderBy("id")
    }),
    "q_futures_calc" -> ((s, d) =>
      // contracts derive from orders: entry := totalprice/100 at order date,
      // current := entry*(1±drift by priority), size 50, qty 1+key%10.
      Tables.orders(s, d).select(
        col("o_orderkey").as("id"),
        (col("o_totalprice") / 100).as("entry"),
        (col("o_totalprice") / 100 * (lit(0.9) + (col("o_orderkey") % 21).cast("double") * 0.01)).as("current"),
        lit(50.0).as("contract_size"),
        (lit(1) + col("o_orderkey") % 10).cast("double").as("qty"))
        .withColumn("margin", Port.r(col("current") * col("contract_size") * col("qty") * 0.10, 4))
        .withColumn("pnl", Port.r((col("current") - col("entry")) * col("contract_size") * col("qty"), 4))
        .withColumn("basis", Port.r(col("entry") - col("current"), 6))
        .withColumn("carry_cost",
          Port.r(col("entry") * exp((lit(0.02) - 0.01) * 0.5) - col("entry"), 6))
        .orderBy("id"))
  )

  def oracles: Map[String, String] = Map(
    "q_black_scholes" ->
      s"""WITH $GridCte,
         |${BlackScholes.pricedSql}
         |SELECT id, s, k, t, sigma,
         |       floor(call * 1e4 + 0.5) / 1e4 AS call,
         |       floor(put * 1e4 + 0.5) / 1e4 AS put,
         |       floor(delta_call * 1e6 + 0.5) / 1e6 AS delta_call,
         |       floor(delta_put * 1e6 + 0.5) / 1e6 AS delta_put,
         |       floor(gamma * 1e8 + 0.5) / 1e8 AS gamma,
         |       floor(vega * 1e4 + 0.5) / 1e4 AS vega,
         |       floor(theta_call * 1e6 + 0.5) / 1e6 AS theta_call,
         |       floor(theta_put * 1e6 + 0.5) / 1e6 AS theta_put,
         |       floor(rho_call * 1e4 + 0.5) / 1e4 AS rho_call,
         |       floor(rho_put * 1e4 + 0.5) / 1e4 AS rho_put
         |FROM priced ORDER BY id""".stripMargin,
    "q_option_strategies" ->
      s"""WITH $GridCte,
         |${BlackScholes.pricedSql}
         |SELECT id, s, k,
         |       floor(s * 100 * 1e2 + 0.5) / 1e2 AS cc_stock_value,
         |       floor(call * 100 * 1e4 + 0.5) / 1e4 AS cc_premium_received,
         |       floor(((k - s) * 100 + call * 100) * 1e4 + 0.5) / 1e4 AS cc_max_profit,
         |       floor((s - call) * 1e4 + 0.5) / 1e4 AS cc_breakeven,
         |       floor(put * 100 * 1e4 + 0.5) / 1e4 AS pp_premium_paid,
         |       floor(((s - k) * 100 + put * 100) * 1e4 + 0.5) / 1e4 AS pp_max_loss,
         |       floor((s + put) * 1e4 + 0.5) / 1e4 AS pp_breakeven,
         |       floor((call + put) * 100 * 1e4 + 0.5) / 1e4 AS st_total_cost,
         |       floor((k + (call + put)) * 1e4 + 0.5) / 1e4 AS st_upper_breakeven,
         |       floor((k - (call + put)) * 1e4 + 0.5) / 1e4 AS st_lower_breakeven
         |FROM priced ORDER BY id""".stripMargin,
    "q_iron_condor" ->
      s"""WITH legsrc AS (
         |  SELECT p_partkey AS id, p_retailprice AS s,
         |         CAST(1 + p_partkey % 24 AS DOUBLE) / 12.0 AS t,
         |         0.15 + CAST(p_partkey % 20 AS DOUBLE) * 0.01 AS sigma
         |  FROM part
         |),
         |grid AS (
         |  SELECT id, s, t, sigma, leg, s * mult AS k
         |  FROM legsrc CROSS JOIN (VALUES ('lp', 0.9), ('up', 0.95),
         |                                 ('lc', 1.05), ('uc', 1.1)) l(leg, mult)
         |),
         |${BlackScholes.pricedSql},
         |agg AS (
         |  SELECT id, s, t, sigma,
         |         max(CASE WHEN leg = 'lp' THEN put END) AS put_lp,
         |         max(CASE WHEN leg = 'up' THEN put END) AS put_up,
         |         max(CASE WHEN leg = 'lc' THEN call END) AS call_lc,
         |         max(CASE WHEN leg = 'uc' THEN call END) AS call_uc,
         |         max(CASE WHEN leg = 'lp' THEN k END) AS k_lp,
         |         max(CASE WHEN leg = 'up' THEN k END) AS k_up,
         |         max(CASE WHEN leg = 'lc' THEN k END) AS k_lc
         |  FROM priced GROUP BY 1, 2, 3, 4
         |),
         |cr AS (
         |  SELECT *, (-put_lp + put_up + call_lc - call_uc) * 100 AS net_credit_raw
         |  FROM agg
         |)
         |SELECT id, s, t, sigma,
         |       floor(net_credit_raw * 1e4 + 0.5) / 1e4 AS net_credit,
         |       floor(((k_up - k_lp) - net_credit_raw / 100) * 100 * 1e4 + 0.5) / 1e4 AS max_loss,
         |       floor((k_up - net_credit_raw / 100) * 1e4 + 0.5) / 1e4 AS lower_breakeven,
         |       floor((k_lc + net_credit_raw / 100) * 1e4 + 0.5) / 1e4 AS upper_breakeven
         |FROM cr ORDER BY id""".stripMargin,
    "q_derivatives_portfolio" ->
      s"""WITH grid AS (
         |  SELECT p_partkey AS id, p_retailprice AS s,
         |         p_retailprice * (0.8 + CAST(p_partkey % 5 AS DOUBLE) * 0.1) AS k,
         |         CAST(1 + p_partkey % 24 AS DOUBLE) / 12.0 AS t,
         |         0.15 + CAST(p_partkey % 20 AS DOUBLE) * 0.01 AS sigma,
         |         p_partkey % 10 AS book,
         |         CAST((CASE WHEN p_partkey % 3 = 0 THEN -1 ELSE 1 END) * (1 + p_partkey % 5) AS DOUBLE) AS qty,
         |         p_partkey % 2 = 0 AS is_call
         |  FROM part
         |),
         |${BlackScholes.pricedSql},
         |entry AS (
         |  SELECT id, book, qty, is_call,
         |         CASE WHEN is_call THEN call ELSE put END AS entry_premium,
         |         s, k, t, sigma
         |  FROM priced
         |),
         |grid2 AS (
         |  SELECT id, book, qty, is_call, entry_premium,
         |         s * (0.95 + CAST(id % 11 AS DOUBLE) * 0.01) AS s,
         |         k, t - 1.0 / 12 AS t, sigma
         |  FROM entry
         |  WHERE t - 1.0 / 12 > 0
         |),
         |${BlackScholes.pricedSqlFrom("grid2", "c")},
         |optbook AS (
         |  SELECT book, count(*) AS n_options,
         |         CAST(sum(CAST(floor((CASE WHEN is_call THEN call ELSE put END - entry_premium)
         |               * qty * 100 * 1e4 + 0.5) AS BIGINT)) AS BIGINT) AS opt_pnl_e4,
         |         CAST(sum(CAST(floor((CASE WHEN is_call THEN delta_call ELSE delta_put END)
         |               * qty * 100 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS delta_e6,
         |         CAST(sum(CAST(floor(gamma * qty * 100 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS gamma_e6,
         |         CAST(sum(CAST(floor(vega * qty * 100 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS vega_e6
         |  FROM cpriced GROUP BY book
         |),
         |futbook AS (
         |  SELECT o_orderkey % 10 AS book, count(*) AS n_futures,
         |         CAST(sum(CAST(floor((o_totalprice / 100 * (0.9 + CAST(o_orderkey % 21 AS DOUBLE) * 0.01)
         |               - o_totalprice / 100) * 50 * CAST(1 + o_orderkey % 10 AS DOUBLE) * 1e4 + 0.5) AS BIGINT)) AS BIGINT) AS fut_pnl_e4
         |  FROM orders GROUP BY 1
         |)
         |SELECT o.book, o.n_options, f.n_futures,
         |       o.opt_pnl_e4 / 1e4 AS opt_pnl,
         |       f.fut_pnl_e4 / 1e4 AS fut_pnl,
         |       1000000.0 + (o.opt_pnl_e4 + f.fut_pnl_e4) / 1e4 AS portfolio_value,
         |       o.delta_e6 / 1e6 AS net_delta,
         |       o.gamma_e6 / 1e6 AS net_gamma,
         |       o.vega_e6 / 1e6 AS net_vega
         |FROM optbook o JOIN futbook f ON o.book = f.book ORDER BY o.book""".stripMargin,
    "q_implied_vol" ->
      s"""WITH $GridCte,
         |${BlackScholes.pricedSql},
         |tgt AS (
         |  SELECT id, s, k, t, sigma AS sigma_true, (id % 2 = 0) AS is_call,
         |         ${Port.rsql("CASE WHEN id % 2 = 0 THEN call ELSE put END", 6)} AS target
         |  FROM priced
         |),
         |gated AS (
         |  SELECT * FROM tgt
         |  WHERE (target - greatest(CASE WHEN is_call THEN s - k ELSE k - s END, 0.0)) / s >= 0.005
         |),
         |${ImpliedVol.bisectSql("gated", Seq("id", "sigma_true"))}
         |SELECT id, s, k, t, CAST(is_call AS INT) AS is_call, target, sigma_true,
         |       ${Port.rsql("iv", 6)} AS iv
         |FROM bs_iv ORDER BY id""".stripMargin,
    "q_futures_calc" ->
      """WITH f AS (
        |  SELECT o_orderkey AS id,
        |         o_totalprice / 100 AS entry,
        |         o_totalprice / 100 * (0.9 + CAST(o_orderkey % 21 AS DOUBLE) * 0.01) AS current,
        |         50.0 AS contract_size,
        |         CAST(1 + o_orderkey % 10 AS DOUBLE) AS qty
        |  FROM orders
        |)
        |SELECT id, entry, current, contract_size, qty,
        |       floor(current * contract_size * qty * 0.10 * 1e4 + 0.5) / 1e4 AS margin,
        |       floor((current - entry) * contract_size * qty * 1e4 + 0.5) / 1e4 AS pnl,
        |       floor((entry - current) * 1e6 + 0.5) / 1e6 AS basis,
        |       floor((entry * exp((0.02 - 0.01) * 0.5) - entry) * 1e6 + 0.5) / 1e6 AS carry_cost
        |FROM f ORDER BY id""".stripMargin
  )
}
