package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class BucketedJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucketed orders x lineitem joins with zero shuffle exchanges") {
    val dir = Files.createTempDirectory("graft-buckets")
    BucketedTables.writeBucketed(
      Tables.orders(spark, TestSpark.Sf), "orders_b",
      s"$dir/orders", "o_orderkey", 8)
    BucketedTables.writeBucketed(
      Tables.lineitem(spark, TestSpark.Sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", s"$dir/lineitem", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.read(spark, "lineitem_b")
        .join(BucketedTables.read(spark, "orders_b"), "o_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val total = joined.collect().map(_.getAs[Long]("n")).sum
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must read co-located buckets: the only exchange
      // allowed is the one for the final groupBy
      val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin")(1)
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(total == Tables.lineitem(spark, TestSpark.Sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
