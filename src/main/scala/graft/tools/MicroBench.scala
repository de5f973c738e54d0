package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{DedupPack, TextPack}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc operator microbenchmarks (dev tool, not part of the driver
  * contract). `runMain graft.tools.MicroBench <sfDir>`.
  */
object MicroBench {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[micro] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
  }

  def shinglesWindow(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
      .distinct()
  }

  def minhashExplode(shd: DataFrame): DataFrame =
    shd.withColumn("perm", explode(sequence(lit(0), lit(31))))
      .withColumn("h", xxhash64(col("perm"), col("shingle")))
      .groupBy("doc_id", "perm").agg(min(col("h")).as("mh"))

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("micro")
    val docs = Tables.documents(spark, d)
    docs.count() // warm

    if (sys.env.contains("MICRO_Q")) {
      // isolate arbitrary registered queries from bench neighborhood
      // effects: MICRO_Q=q_lang_id,q_decontaminate [MICRO_Q_ROUNDS=3]
      val names = sys.env("MICRO_Q").split(",").map(_.trim).filter(_.nonEmpty)
      val rounds = sys.env.getOrElse("MICRO_Q_ROUNDS", "3").toInt
      for (r <- 1 to rounds; nm <- names)
        time(s"${nm}_r$r")(
          graft.SparkEntry.queries(nm)(spark, d).queryExecution.toRdd.count())
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_PLANexec")) {
      // split a registered query's cost into driver-side plan+codegen vs
      // cluster execution: build once, time executedPlan materialization,
      // then time toRdd.count twice on the SAME frame (re-execution
      // reuses the compiled plan). MICRO_PLANexec=q_feature_importance
      val nm = sys.env("MICRO_PLANexec")
      graft.SparkEntry.queries(nm)(spark, d).queryExecution.toRdd.count() // session+cache warm
      for (r <- 1 to 3) {
        val df = graft.SparkEntry.queries(nm)(spark, d)
        time(s"${nm}_plan_r$r") { df.queryExecution.executedPlan; 0L }
        time(s"${nm}_exec_r$r")(df.queryExecution.toRdd.count())
        time(s"${nm}_reexec_r$r")(df.queryExecution.toRdd.count())
      }
      // per-stage wall breakdown of one fresh run: where do the seconds go?
      val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, String)]
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
          stages.synchronized {
            stages += ((i.stageId, ms, i.numTasks, i.name.takeWhile(_ != '\n').take(90)))
          }
        }
      })
      time(s"${nm}_listened")(
        graft.SparkEntry.queries(nm)(spark, d).queryExecution.toRdd.count())
      Thread.sleep(500)
      stages.sortBy(-_._2).take(15).foreach { case (id, ms, nt, n) =>
        println(f"[stage] id=$id%-4d ${ms / 1000.0}%7.2f s  tasks=$nt%-3d $n")
      }
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_BUCKETED")) {
      // Bucketed-layout evidence (r13 verdict task 9): replicate the two
      // FACT tables MICRO_BUCKETED-x (offset orderkeys preserve the join
      // structure while scaling the shuffle), write them BOTH as plain
      // parquet and as a bucketed+sorted-by-orderkey layout
      // (sources/BucketedTables), then run the REGISTERED q3/q10 shapes
      // (TpchPack.q3From/q10From — the same code the oracled queries
      // execute) over each. The bucketed orders⋈lineitem SortMergeJoin
      // reads co-located buckets with NO Exchange on either side; q3's
      // downstream groupBy(l_orderkey, ...) also rides the bucket
      // partitioning (grouping keys ⊇ partitioning key), so its agg
      // exchange disappears too.
      val mult = sys.env("MICRO_BUCKETED").toIntOption.getOrElse(10)
      val buckets = 32
      val base = "/tmp/graft_bucket_bench"
      val o0 = Tables.orders(spark, d)
      val l0 = Tables.lineitem(spark, d)
      val maxOk = o0.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
      def rep(df: DataFrame, key: String): DataFrame =
        df.withColumn("__r", explode(sequence(lit(0L), lit(mult - 1L))))
          .withColumn(key, col(key) + col("__r") * maxOk).drop("__r")
      rep(o0, "o_orderkey").write.mode("overwrite").parquet(s"$base/orders_plain")
      rep(l0, "l_orderkey").write.mode("overwrite").parquet(s"$base/lineitem_plain")
      spark.sql("DROP TABLE IF EXISTS orders_bb")
      spark.sql("DROP TABLE IF EXISTS lineitem_bb")
      graft.sources.BucketedTables.writeBucketed(
        spark.read.parquet(s"$base/orders_plain"), "orders_bb",
        s"$base/orders_b", "o_orderkey", buckets)
      graft.sources.BucketedTables.writeBucketed(
        spark.read.parquet(s"$base/lineitem_plain"), "lineitem_bb",
        s"$base/lineitem_b", "l_orderkey", buckets)
      val cust = Tables.customer(spark, d)
      val nat = Tables.nation(spark, d)
      import graft.operators.TpchPack
      def variants: Seq[(String, () => DataFrame)] = Seq(
        "q3_plain" -> (() => TpchPack.q3From(
          spark.read.parquet(s"$base/lineitem_plain"),
          spark.read.parquet(s"$base/orders_plain"), cust)),
        "q3_bucketed" -> (() => TpchPack.q3From(
          spark.table("lineitem_bb"), spark.table("orders_bb"), cust)),
        "q10_plain" -> (() => TpchPack.q10From(
          spark.read.parquet(s"$base/lineitem_plain"),
          spark.read.parquet(s"$base/orders_plain"), cust, nat)),
        "q10_bucketed" -> (() => TpchPack.q10From(
          spark.table("lineitem_bb"), spark.table("orders_bb"), cust, nat)))
      // Two planning regimes: the default (size-based broadcast — at
      // THIS scale AQE broadcasts the filtered orders side, and the
      // bucket layout's visible win is the agg exchange riding the scan
      // partitioning), and broadcast OFF — the 100 TB regime, where a
      // fact side can never broadcast and the co-located SortMergeJoin
      // with zero Exchange AND zero Sort (buckets are sorted) is the
      // whole point of the layout.
      for (bcast <- Seq(true, false)) {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          if (bcast) "10485760" else "-1")
        val sfx = if (bcast) "" else "_smj"
        for (r <- 1 to 3; (nm0, mk) <- variants) {
          val nm = nm0 + sfx
          val df = mk()
          time(s"${nm}_r$r")(df.queryExecution.toRdd.count())
          if (r == 1) {
            // AQE's toString prints final AND initial plans — count the
            // executed (final) section only
            val plan = df.queryExecution.executedPlan.toString
              .split("== Initial Plan ==")(0)
            val nExch = "Exchange hashpartitioning".r.findAllIn(plan).length
            val nSort = "\\+- \\*?\\(?\\d*\\)? ?Sort ".r.findAllIn(plan).length
            println(s"[plan] $nm hash_exchanges=$nExch sorts=$nSort")
            if (sys.env.contains("MICRO_BUCKETED_EXPLAIN"))
              println(plan.linesIterator
                .filter(l => l.contains("Join") || l.contains("Exchange") ||
                  l.contains("Scan") || l.contains("Aggregate") || l.contains("Sort"))
                .map(l => s"[planx] $nm | ${l.take(150)}").mkString("\n"))
          }
        }
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_SCMP")) {
      // stage-by-stage cost of q_strategy_comparison (same layer shapes
      // as ExtrasPack): which of the three WindowExec passes / wide agg
      // dominates the 1.3 s isolated warm time?
      import graft.backtest.{Backtester, Metrics, Signals}
      import graft.operators.Bars
      val w = Window.partitionBy("symbol").orderBy("bucket_ms")
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      val sfx = Seq("ma_cross" -> "s_ma", "mean_reversion" -> "s_mr", "momentum" -> "s_mo")
      val base = Signals.allThreePlain(Bars.ohlcvCached(spark, d, 60)).cache()
      base.queryExecution.toRdd.count()
      // the stages use Backtester's shared expression builders — the
      // profiler must time the PRODUCTION expressions, not a copy that
      // silently drifts when the builders change
      def lagLayer = base.select(
        col("*") +:
          Backtester.returnsExpr(col("close"), lag(col("close"), 1).over(w)).as("returns") +:
          sfx.map { case (x, sc) =>
            lag(col(sc).cast("double"), 1).over(w).as(s"prev_pos_$x")
          }: _*)
      def netLayer = lagLayer.select(
        col("*") +: sfx.flatMap { case (x, sc) =>
          val pos = col(sc).cast("double")
          val prev = col(s"prev_pos_$x")
          val net = Backtester.stratRetExpr(prev, col("returns")) -
            Backtester.costExpr(pos, prev, Backtester.DefaultCostRate)
          Seq(pos.as(s"position_$x"), net.as(s"net_$x"))
        }: _*)
      def eqLayer = netLayer.select(
        col("*") +: sfx.map { case (x, _) =>
          Backtester.logEquityExpr(col(s"net_$x"), cum).as(s"log_equity_$x")
        }: _*)
      def peakLayer = eqLayer.select(
        col("*") +: sfx.map { case (x, _) =>
          max(col(s"log_equity_$x")).over(cum).as(s"peak_$x")
        }: _*)
      def withDd = peakLayer.select(
        col("*") +: sfx.map { case (x, _) =>
          (exp(col(s"log_equity_$x") - col(s"peak_$x")) - 1).as(s"dd_$x")
        }: _*)
      val aggs = sfx.flatMap { case (x, _) =>
        Metrics.aggExprs(col(s"net_$x"), col(s"position_$x"),
          col(s"prev_pos_$x"), col(s"dd_$x"), s"_$x")
      }
      for (r <- 1 to 3) {
        time(s"base_r$r")(base.queryExecution.toRdd.count())
        time(s"lag_r$r")(lagLayer.queryExecution.toRdd.count())
        time(s"net_r$r")(netLayer.queryExecution.toRdd.count())
        time(s"eq_r$r")(eqLayer.queryExecution.toRdd.count())
        time(s"peak_r$r")(peakLayer.queryExecution.toRdd.count())
        time(s"dd_r$r")(withDd.queryExecution.toRdd.count())
        time(s"agg_r$r") {
          val wide = withDd.groupBy("symbol").agg(aggs.head, aggs.tail: _*)
          wide.queryExecution.toRdd.count()
        }
      }
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_EXPLAIN")) {
      // formatted physical plans: MICRO_EXPLAIN=q_a,q_b
      for (nm <- sys.env("MICRO_EXPLAIN").split(",").map(_.trim).filter(_.nonEmpty)) {
        println(s"=== $nm ===")
        graft.SparkEntry.queries(nm)(spark, d).explain("formatted")
      }
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_HOT_KEY")) {
      // hot-key posture check: ONE symbol's entire order flow (1M mixed
      // lifecycle events) through the SortedScan streaming scan — the
      // whole stream lands on a single task and must stream through
      // bounded state (resting book), not buffer the event history
      import spark.implicits._
      import graft.operators.OrderLifecycle
      import graft.operators.OrderLifecycle.BookEvent
      val n = 1000000
      val events = spark.range(n).select(
        lit("HOT").as("symbol"),
        col("id").as("ts"),
        col("id").as("event_id"),
        when(col("id") % 10 === 0, "market")
          .when(col("id") % 10 === 1, "cancel")
          .when(col("id") % 10 <= 4, "limit").otherwise("tick").as("kind"),
        when(col("id") % 2 === 0, "buy").otherwise("sell").as("side"),
        (lit(100.0) + (col("id") % 1000).cast("double") / 100 *
          when(col("id") % 10 <= 4 && col("id") % 10 >= 2,
            (col("id") % 2 * 2 - 1).cast("double") * 0.5).otherwise(0.0)).as("price"),
        (lit(1.0) + (col("id") % 7).cast("double")).as("qty"),
        (col("id") - col("id") % 97).as("ref_id"))
        .as[BookEvent]
      time(s"order_lifecycle_hot_${n / 1000}k")(OrderLifecycle.run(events).count())
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_FILL")) {
      // gap-run explode vs the r02 spine-join + window-sort fills
      import graft.etl.EtlPack
      for (r <- 1 to 3) {
        time(s"fill_minutes_r$r")(EtlPack.queries("q_fill_missing_minutes")(spark, d).queryExecution.toRdd.count())
        time(s"fill_bfill_r$r")(EtlPack.queries("q_fill_missing_bfill")(spark, d).queryExecution.toRdd.count())
        time(s"fill_interp_r$r")(EtlPack.queries("q_fill_missing_interp")(spark, d).queryExecution.toRdd.count())
      }
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_CHUNK")) {
      // hot-symbol posture: 5M bars of ONE symbol. The plain signal
      // window sorts all 5M rows in a single task; the chunked form
      // spreads (symbol, chunk) tasks across the cores — the measured
      // justification for ChunkedWindows at scale.
      import graft.backtest.Signals
      val n = sys.env.getOrElse("MICRO_CHUNK_N", "5000000").toLong
      val hot = spark.range(n).select(
        lit("HOT").as("symbol"),
        (col("id") * 60000L).as("bucket_ms"),
        (lit(100.0) + (col("id") % 997).cast("double") / 10).as("close"))
        .cache()
      hot.count()
      for (r <- 1 to 2) {
        time(s"hot_ma_cross_plain_r$r")(
          Signals.maCrossPlain(hot).queryExecution.toRdd.count())
        time(s"hot_ma_cross_chunked_r$r")(
          Signals.maCrossChunked(hot).queryExecution.toRdd.count())
        // the adaptive default with the depth hint a deploy-time feed
        // would carry — must track the winner at this n
        time(s"hot_ma_cross_auto_r$r")(
          Signals.maCross(hot, rowsPerSymbolHint = Some(n)).queryExecution.toRdd.count())
      }
      println(s"[micro] auto picked chunked=${Signals.useChunked(hot, Some(n))} " +
        s"at n=$n (threshold ${Signals.ChunkSwitchRows})")
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_CLUSTER")) {
      for (r <- 1 to 3)
        time(s"dedup_clusters_r$r")(
          TextPack.queries("q_dedup_clusters")(spark, d).queryExecution.toRdd.count())
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_CC")) {
      // worst-case convergence evidence: a PATH graph of n nodes has
      // diameter n-1 — plain min-label propagation needs n-1 rounds;
      // pointer jumping must converge in O(log n). MICRO_CC_N=65536
      // (diameter 65535) is the posture probe for web-scale dup chains.
      val n = sys.env.getOrElse("MICRO_CC_N", "65536").toLong
      val pairs = spark.range(n - 1)
        .select(col("id").as("doc1"), (col("id") + 1).as("doc2"))
      time(s"cc_path_n$n") {
        val (labels, iters, release) =
          graft.operators.ConnectedComponents.labels(pairs, maxIter = 64)
        val comps = labels.select("root").distinct().count()
        val rows = labels.count()
        println(s"[micro] cc_path: n=$n diameter=${n - 1} iterations=$iters components=$comps")
        release()
        rows
      }
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_SIG")) {
      import graft.backtest.Signals
      import graft.operators.Bars
      val bars = Bars.ohlcvCached(spark, d, 60)
      bars.count()
      for (r <- 1 to 3) {
        time(s"ma_cross_plain_r$r")(Signals.maCrossPlain(bars).queryExecution.toRdd.count())
        time(s"ma_cross_chunked_r$r")(Signals.maCrossChunked(bars).queryExecution.toRdd.count())
        time(s"mean_rev_plain_r$r")(Signals.meanReversionPlain(bars).queryExecution.toRdd.count())
        time(s"mean_rev_chunked_r$r")(Signals.meanReversionChunked(bars).queryExecution.toRdd.count())
      }
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_COLD_PROBE")) {
      val tiny = Tables.documents(spark, "/root/testdata/sf0.001")
      time("cold_shingles_tiny")(TextPack.shingles(tiny).count())
      time("cold_shingles_full")(TextPack.shingles(docs).count())
      time("cold_shingles_full_2nd")(TextPack.shingles(docs).count())
      spark.stop(); return
    }

    if (sys.env.contains("MICRO_EMA")) {
      // 60 lag frame processors vs one sliding collect_list frame + get()
      import graft.operators.Bars
      val bars = Bars.ohlcvCached(spark, d, 60)
      bars.count()
      val w = Window.partitionBy("symbol").orderBy("bucket_ms")
      def lagForm: DataFrame = {
        val withLags = bars.select(
          col("symbol") +: col("bucket_ms") +:
            (0 until 60).map(k => coalesce(lag(col("close"), k).over(w), lit(0.0)).as(s"l$k")): _*)
        val num12 = (0 until 60).map(k => col(s"l$k") * math.pow(1 - 2.0 / 13, k)).reduce(_ + _)
        val num26 = (0 until 60).map(k => col(s"l$k") * math.pow(1 - 2.0 / 27, k)).reduce(_ + _)
        withLags.select(col("symbol"), col("bucket_ms"), num12.as("n12"), num26.as("n26"))
      }
      def arrForm: DataFrame = {
        val arr = collect_list(col("close")).over(w.rowsBetween(-59, 0))
        val withArr = bars.select(col("symbol"), col("bucket_ms"), arr.as("a"))
        def tap(k: Int) = coalesce(get(col("a"), size(col("a")) - k - 1), lit(0.0))
        val num12 = (0 until 60).map(k => tap(k) * math.pow(1 - 2.0 / 13, k)).reduce(_ + _)
        val num26 = (0 until 60).map(k => tap(k) * math.pow(1 - 2.0 / 27, k)).reduce(_ + _)
        withArr.select(col("symbol"), col("bucket_ms"), num12.as("n12"), num26.as("n26"))
      }
      for (r <- 1 to 3) {
        time(s"ema_60lags_r$r")(lagForm.queryExecution.toRdd.count())
        time(s"ema_array_r$r")(arrForm.queryExecution.toRdd.count())
        time(s"ema_full_query_r$r")(
          graft.backtest.ExtrasPack.queries("q_ema_macd")(spark, d).queryExecution.toRdd.count())
      }
      spark.stop(); return
    }

    for (round <- 1 to 3) {
      println(s"[micro] --- round $round ---")
      time("shingles_array")(TextPack.shingles(docs).count())
      time("shingles_window")(shinglesWindow(docs).count())
      time("minhash_nested_hof")(DedupPack.minhashSignatures(docs).count())
      time("minhash_explode") {
        minhashExplode(TextPack.shingles(docs).select("doc_id", "shingle")).count()
      }
      time("lsh_full_query")(DedupPack.queries("q_dedup_minhash_lsh")(spark, d).count())
      time("jaccard_full_query")(TextPack.queries("q_dedup_ngram_jaccard")(spark, d).count())
      locally {
        val sig = DedupPack.bandSignatures(DedupPack.minhashSignatures(docs))
        val a = sig.select(col("doc_id").as("doc1"), col("band"), col("sig"))
        val b = sig.select(col("doc_id").as("doc2"), col("band"), col("sig"))
        val cand = a.join(b, Seq("band", "sig")).filter(col("doc1") < col("doc2"))
          .groupBy("doc1", "doc2").agg(count(lit(1)).as("n_bands_matched"))
        time("lsh_candidates_only")(cand.count())
        val shd = TextPack.shingles(docs).select("doc_id", "shingle")
        val inter = shd.select(col("doc_id").as("doc1"), col("shingle"))
          .join(shd.select(col("doc_id").as("doc2"), col("shingle")), "shingle")
          .filter(col("doc1") < col("doc2"))
          .join(cand.select("doc1", "doc2"), Seq("doc1", "doc2"), "leftsemi")
          .groupBy("doc1", "doc2").agg(count(lit(1)).as("inter"))
        time("lsh_inter_only")(inter.count())
      }
    }
    spark.stop()
  }
}
