package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("norm_cdf resolves from SQL via GraftExtensions") {
    val base = TestSpark.spark // shared SparkContext stays alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val v = s.sql("SELECT norm_cdf(CAST(0.0 AS DOUBLE)) AS p").collect()(0).getDouble(0)
      assert(math.abs(v - 0.5) < 1e-7)
      val sym = s.sql("SELECT norm_cdf(CAST(1.5 AS DOUBLE)) + norm_cdf(CAST(-1.5 AS DOUBLE)) AS one")
        .collect()(0).getDouble(0)
      assert(math.abs(sym - 1.0) < 1e-7)
      val d = s.sql(
        "SELECT dot_product(array(2.0D, 3.0D), array(5.0D, 7.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(d == 31.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
