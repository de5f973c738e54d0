package graft.tools

import java.sql.Timestamp

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Scratch profiler for the streaming near-dup lane (r14): times each
  * stage of the flagged pipeline separately to locate the 34 docs/s
  * bottleneck the probe rebase did not move.
  *
  * `runMain graft.tools.NearDupProfile [sfDir] [nBatches]`
  */
object NearDupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(20)
    val spark = GraftSession.get("graft-neardup-profile")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docsDf = Tables.documents(spark, sfDir)
    val index = graft.streaming.StreamingNearDup.corpusIndex(docsDf).cache()
    System.err.println(s"[prof] index rows = ${index.count()}")
    val bIdx = index.select("band", "sig").distinct().cache()
    System.err.println(s"[prof] bIdx rows = ${bIdx.count()}")

    val baseMs = 0L
    val docRows: Seq[(Timestamp, Long, String)] = docsDf
      .orderBy("doc_id").select(col("doc_id"), col("text"))
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => (new Timestamp(baseMs + i), r.getLong(0), r.getString(1)) }
    System.err.println(s"[prof] docs = ${docRows.length}")

    def time(name: String)(build: DataFrame => DataFrame): Unit = {
      val input = MemoryStream[(Timestamp, Long, String)]
      val q = build(input.toDF().toDF("ts", "doc_id", "text")).writeStream
        .format("memory").queryName(s"p_$name").outputMode("append").start()
      q.processAllAvailable()
      val size = math.max(1, (docRows.length + nBatches - 1) / nBatches)
      val cs = docRows.grouped(size).toSeq
      val t0 = System.nanoTime()
      cs.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      val out = spark.table(s"p_$name").count()
      q.stop()
      System.err.println(f"[prof] $name%-22s $sec%8.2f s  ${docRows.length / sec}%8.0f docs/s (out=$out)")
    }

    import graft.operators.DedupPack
    import graft.streaming.StreamingNearDup

    // 1. signatures only
    time("sigs") { docs =>
      StreamingNearDup.bandSigArray(docs, "__sigs").drop("text", "__sigs")
    }

    // 2. sigs + 8 probes, no identity join, no dedup state
    time("probes") { docs =>
      val withSigs = StreamingNearDup.bandSigArray(docs, "__sigs")
      val probed = (0 until DedupPack.NumBands).foldLeft(withSigs) { (df, b) =>
        df.join(bIdx.filter(col("band") === b).select(col("sig").as(s"__hit$b")),
          element_at(col("__sigs"), b + 1) === col(s"__hit$b"), "left")
      }
      probed.filter((0 until DedupPack.NumBands).map(b => col(s"__hit$b").isNotNull)
        .reduce(_ || _)).select("ts", "doc_id")
    }

    // 3. + identity join (no dedup state)
    time("probes_identity") { docs =>
      val withSigs = StreamingNearDup.bandSigArray(docs, "__sigs")
      val probed = (0 until DedupPack.NumBands).foldLeft(withSigs) { (df, b) =>
        df.join(bIdx.filter(col("band") === b).select(col("sig").as(s"__hit$b")),
          element_at(col("__sigs"), b + 1) === col(s"__hit$b"), "left")
      }
      probed.filter((0 until DedupPack.NumBands).map(b => col(s"__hit$b").isNotNull)
        .reduce(_ || _))
        .select(col("ts"), col("doc_id"), posexplode(col("__sigs")).as(Seq("band", "sig")))
        .join(index, Seq("band", "sig"))
        .filter(col("doc_id") =!= col("match_doc"))
        .select(col("ts"), col("doc_id"), col("match_doc"))
    }

    // 4. full flagged (adds the watermark dedup state)
    time("flagged_full") { docs =>
      StreamingNearDup.flagged(docs, index, "10 minutes")
    }

    spark.stop()
  }
}
