package graft.tools

import java.sql.Timestamp

import graft.{GraftSession, Tables}
import graft.operators.DedupPack
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One-off: per-trigger durationMs breakdown of the flagged pipeline
  * (queryPlanning vs addBatch vs walCommit ...) to split planner cost
  * from execution cost. `runMain graft.tools.NearDupProgress [sfDir]`.
  */
object NearDupProgress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-neardup-progress")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docsDf = Tables.documents(spark, sfDir)
    val index = StreamingNearDup.corpusIndex(docsDf).cache()
    index.count()
    val docRows: Seq[(Timestamp, Long, String)] = docsDf
      .orderBy("doc_id").select(col("doc_id"), col("text"))
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => (new Timestamp(i.toLong), r.getLong(0), r.getString(1)) }
      .take(4000)

    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val bIdx = index.select("band", "sig").distinct().cache(); bIdx.count()
    val withSigs = StreamingNearDup.bandSigArray(docs, "__sigs")
    val probed = (0 until DedupPack.NumBands).foldLeft(withSigs) { (df, b) =>
      df.join(bIdx.filter(col("band") === b).select(col("sig").as(s"__hit$b")),
        element_at(col("__sigs"), b + 1) === col(s"__hit$b"), "left")
    }
    val pipe = probed
      .filter((0 until DedupPack.NumBands).map(b => col(s"__hit$b").isNotNull)
        .reduce(_ || _))
      .select(col("ts"), col("doc_id"), posexplode(col("__sigs")).as(Seq("band", "sig")))
      .join(index, Seq("band", "sig"))
      .filter(col("doc_id") =!= col("match_doc"))
      .select(col("ts"), col("doc_id"), col("match_doc"))

    val q = pipe.writeStream.format("memory").queryName("ndprog")
      .outputMode("append").start()
    q.processAllAvailable()
    docRows.grouped(500).foreach { c =>
      input.addData(c: _*); q.processAllAvailable()
    }
    q.recentProgress.foreach { p =>
      System.err.println(s"[ndprog] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs}")
    }
    q.explain()
    q.stop()
    spark.stop()
  }
}
