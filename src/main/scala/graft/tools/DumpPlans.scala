package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dumps `.explain("formatted")` for the named queries to
  * `<outDir>/<query>_<suffix>.txt` — the before/after plan evidence for
  * optimization rounds. Each query is executed once first (memo fill +
  * AQE finalize) so the captured plan is the WARM plan the bench
  * measures, then the formatted initial plan AND the final adaptive
  * plan are written.
  *
  * `runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix> <q1,q2,...>`
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val outDir = new java.io.File(args(1))
    outDir.mkdirs()
    val suffix = args(2)
    val names = args(3).split(",").toSeq
    val spark = GraftSession.get("graft-dumpplans")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, d).queryExecution.toRdd.count() // memo fill / warm
      val qe = fn(spark, d).queryExecution
      val formatted = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      qe.toRdd.count() // finalize AQE on THIS instance
      val finalPlan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      val pw = new java.io.PrintWriter(new java.io.File(outDir, s"${name}_$suffix.txt"))
      try {
        pw.println(s"==== $name ($suffix) — explain(formatted), warm plan")
        pw.println(formatted)
        pw.println(s"==== $name ($suffix) — final adaptive executed plan")
        pw.println(finalPlan)
      } finally pw.close()
      println(s"dumped $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
