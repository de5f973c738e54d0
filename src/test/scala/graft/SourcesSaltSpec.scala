package graft

import graft.etl.Normalizer
import graft.operators.SaltedJoin
import graft.sources.FileSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class FileSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("csv and json roundtrips preserve the tick schema and rows") {
    val dir = Files.createTempDirectory("graft-files")
    val ticks = Normalizer.trades(Tables.events(spark, TestSpark.Sf))
      .select("ts_ms", "symbol", "price", "volume")
    FileSource.writeTicksCsv(ticks, s"$dir/csv")
    FileSource.writeTicksJson(ticks, s"$dir/json")
    val csv = FileSource.readTicksCsv(spark, s"$dir/csv")
    val json = FileSource.readTicksJson(spark, s"$dir/json")
    assert(csv.schema.fieldNames.toSeq == FileSource.TickSchema.fieldNames.toSeq)
    assert(csv.schema.map(_.dataType) == FileSource.TickSchema.map(_.dataType))
    assert(csv.count() == ticks.count() && json.count() == ticks.count())
    // same OHLCV bars regardless of source format
    def barsOf(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", col("ts_ms") * 1000000L)
        .groupBy("symbol").agg(sum("price").as("s"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(barsOf(csv) == barsOf(json))
  }
}

class SaltedJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("salted join returns the same rows as a plain join") {
    import spark.implicits._
    val big = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", 1.0), ("k7", 2.0)).toDF("key", "w")
    val plain = big.join(small, "key").agg(count(lit(1)), sum("v"), sum("w")).collect()(0)
    val salted = SaltedJoin(big, small, "key", salt = 8)
      .agg(count(lit(1)), sum("v"), sum("w")).collect()(0)
    assert(plain == salted)
  }
}
