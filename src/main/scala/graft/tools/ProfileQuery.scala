package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage wall/task profile of one registered query, warm: runs the
  * query once to fill session memos, then a profiled pass with a stage
  * listener. Prints one line per stage (submit-order): wall ms, task
  * count, total task ms, and the stage's first line of its name — the
  * tool for attributing a slow warm row to its plan stage.
  *
  * `runMain graft.tools.ProfileQuery <sfDir> <query>[,query2...]`
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq("q_tfidf_topterms"))
    val spark = GraftSession.get("graft-profile")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, d).queryExecution.toRdd.count() // memo fill + codegen warm
      fn(spark, d).queryExecution.toRdd.count() // second warm
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, Long, String)]()
      val l = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val wall = (for {
            c <- i.completionTime; s <- i.submissionTime
          } yield c - s).getOrElse(-1L)
          stages.add((i.stageId, wall, i.numTasks,
            i.taskMetrics.executorRunTime, i.name.linesIterator.next().take(90)))
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      fn(spark, d).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      spark.sparkContext.removeSparkListener(l)
      println(f"PROFILE $name total=$sec%.2f s")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, wall, nt, trt, nm) =>
        println(f"  stage $id%4d wall=${wall}%5d ms tasks=$nt%3d taskTime=${trt}%6d ms  $nm")
      }
      if (sys.env.contains("PROFILE_PLAN")) {
        val qe = fn(spark, d).queryExecution
        qe.toRdd.count()
        println(qe.executedPlan.toString.linesIterator.map(_.take(160)).mkString("\n"))
      }
    }
    spark.stop()
  }
}
