package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Standard-normal CDF as a native Catalyst expression (whole-stage
  * codegen emits a static call, so Black-Scholes pricing stays inside the
  * generated loop — no UDF serialization boundary).
  *
  * Abramowitz & Stegun 26.2.17 polynomial (|ε| < 7.5e-8), chosen because
  * the identical arithmetic is expressible in the DuckDB oracle
  * (see `ncdfSql`) — only `exp` differs at the last ulp between libm and
  * the JVM, which the Port.r output snap absorbs.
  *
  * Reference semantics: backtesting/derivatives.py:57 (scipy norm.cdf).
  */
case class NormCdfExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm_cdf"
  override protected def nullSafeEval(x: Any): Any = NormCdf.cdf(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormCdf.cdf($c)")
  override protected def withNewChildInternal(newChild: Expression): NormCdfExpr =
    copy(child = newChild)
}

object NormCdf {
  /** A&S 26.2.17. Must stay formula-identical with [[ncdfSql]]. */
  def cdf(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.2316419 * math.abs(x))
    val tail = math.exp(-0.5 * x * x) * 0.3989422804014327 *
      (t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))))
    if (x >= 0) 1.0 - tail else tail
  }

  /** Standard-normal pdf (for greeks). */
  def pdf(x: Double): Double = math.exp(-0.5 * x * x) * 0.3989422804014327

  def apply(c: Column): Column =
    Bridge.toColumn(NormCdfExpr(Bridge.toExpression(c.cast("double"))))

  /** The same A&S polynomial as DuckDB SQL over argument expression `x`. */
  def ncdfSql(x: String): String = {
    val t = s"(1.0/(1.0 + 0.2316419*abs($x)))"
    val tail = s"exp(-0.5*($x)*($x)) * 0.3989422804014327 * " +
      s"($t*(0.319381530 + $t*(-0.356563782 + $t*(1.781477937 + $t*(-1.821255978 + $t*1.330274429)))))"
    s"(CASE WHEN ($x) >= 0 THEN 1.0 - $tail ELSE $tail END)"
  }

  /** Normal pdf as DuckDB SQL. */
  def npdfSql(x: String): String = s"(exp(-0.5*($x)*($x)) * 0.3989422804014327)"
}
