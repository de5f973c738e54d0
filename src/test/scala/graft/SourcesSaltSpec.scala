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

class ShardWriterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("shard layout matches the manifest and streams each shard in hash order") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val out = Files.createTempDirectory("shards").toString
    graft.sources.ShardWriter.writeShards(docs.select("doc_id", "text"), out, nShards = 64)
    // the written layout agrees with the oracled manifest query:
    // same per-shard doc counts, hash ranges included
    val manifest = graft.operators.CorpusPack.queries("q_shard_manifest")(spark, TestSpark.Sf)
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("min_h"), r.getAs[Long]("max_h"))).toMap
    val back = spark.read.parquet(out)
    val counts = back.groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Int]("shard").toLong -> r.getAs[Long]("n")).toMap
    assert(counts === manifest.view.mapValues(_._1).toMap)
    // a shard directory read back is already in (h, doc_id) order — the
    // loader contract (single file per shard here, order-preserving scan)
    val some = manifest.keys.toSeq.sorted.take(4)
    some.foreach { sh =>
      val rows = graft.sources.ShardWriter.readShard(spark, out, sh)
        .select("h", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.nonEmpty)
      assert(rows.sortBy(identity).toSeq === rows.toSeq, s"shard $sh not in hash order")
      assert(rows.head._1 === manifest(sh)._2 && rows.last._1 === manifest(sh)._3)
    }
  }
}
