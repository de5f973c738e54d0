package graft

import graft.tools.ExplainAudit
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide scale-posture guard: every registered query's EXECUTED
  * plan (AQE-final) is swept for the two mechanical scale-killers —
  *   1. a cartesian product (a non-broadcast cross join shuffles n×m;
  *      every deliberate crossJoin in the engine is broadcast(small)),
  *   2. a global (unpartitioned) window whose input is not already
  *      aggregate-reduced — the single-partition funnel that the
  *      two-level prefix-sum pattern exists to avoid.
  * A new query that regresses either shape fails here by name, without
  * anyone remembering to add it to a per-query spec.
  */
class PlanGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def isAggregate(p: SparkPlan): Boolean = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
    case _ => false
  }

  test("no query executes a cartesian product or a global window over unreduced data") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.Sf)
      df.queryExecution.toRdd.count() // execute so AQE finalizes
      val nodes = ExplainAudit.collectNodes(df.queryExecution.executedPlan)
      if (nodes.exists(_.isInstanceOf[CartesianProductExec]))
        offenders += s"$name: CartesianProduct"
      nodes.foreach {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          // the global window's input must be aggregate-reduced (chunk
          // sums, per-symbol stats, fold grids...) somewhere below. An
          // InMemoryTableScan leaf is accepted: every memoized frame in
          // this engine is an aggregate product (bars, features, pairs),
          // and the per-query audits cover the cache-fill plans.
          val below = ExplainAudit.collectNodes(w.child)
          val reduced = below.exists(isAggregate) ||
            below.exists(_.isInstanceOf[InMemoryTableScanExec])
          if (!reduced)
            offenders += s"$name: global WindowExec over unreduced input"
        case _ => ()
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
