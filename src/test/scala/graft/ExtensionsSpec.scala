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
      // SQL-resolved simhash must equal the Column-API expression
      val sh = s.sql("SELECT simhash56('the quick brown fox') AS h")
        .collect()(0).getLong(0)
      assert(sh == graft.functions.SimHash56.simhash(
        org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox")))
      // SQL-resolved implied vol round-trips a known premium
      val iv = s.sql(
        "SELECT bs_implied_vol(100.0D, 100.0D, 1.0D, true, 10.0D) AS iv")
        .collect()(0).getDouble(0)
      assert(iv == graft.functions.ImpliedVol.bisect(100.0, 100.0, 1.0, true, 10.0))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
