package graft.plans

import graft.functions.{DotProductExpr, ImpliedVolExpr, NormCdfExpr, SimHash56Expr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering graft's native expressions with the SQL
  * function registry, so `spark.sql("SELECT norm_cdf(x) ...")` resolves to
  * the codegen'd Catalyst expression.
  *
  * Install with:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("norm_cdf"),
      new ExpressionInfo(classOf[NormCdfExpr].getName, "norm_cdf"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "norm_cdf takes exactly one argument")
        NormCdfExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "dot_product takes exactly two arguments")
        DotProductExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash56"),
      new ExpressionInfo(classOf[SimHash56Expr].getName, "simhash56"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "simhash56 takes exactly one argument")
        SimHash56Expr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("bs_implied_vol"),
      new ExpressionInfo(classOf[ImpliedVolExpr].getName, "bs_implied_vol"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 5,
          "bs_implied_vol(s, k, t, is_call, target) takes exactly five arguments")
        ImpliedVolExpr(children(0), children(1), children(2), children(3), children(4))
      }))
  }
}
