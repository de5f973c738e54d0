package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (latest right row at-or-before each left row) via
  * the union trick: tag both sides, sort within partition by (time, tag)
  * with right rows first at ties, forward-fill right values, keep left
  * rows.
  *
  * This is the scalable shape for quote-asof-trade enrichment: one shuffle
  * on the partition key, no range-condition row explosion, window state is
  * a single value. Reference capability: etl/database_writer.py:165
  * (get_latest_trades as-of) and the tick→bar enrichment implicit in
  * backtesting/engine.py's price lookup.
  */
object AsOfJoin {

  /** @param left      rows to enrich; must carry `partCol` and `timeCol`
    * @param right     lookup side; same `partCol`/`timeCol` plus `valueCols`
    * @param timeCol   numeric event-time column (same unit both sides)
    * @param tolerance max staleness: a match further than this from the
    *                  left row's time yields nulls (pandas merge_asof
    *                  `tolerance`); None = unbounded
    */
  def backward(left: DataFrame, right: DataFrame, partCol: String,
               timeCol: String, valueCols: Seq[String],
               tolerance: Option[Long] = None): DataFrame =
    join(left, right, partCol, timeCol, valueCols, tolerance, forward = false)

  /** Forward as-of: earliest right row at-or-after each left row — the
    * same union trick over a DESCENDING scan (still the running O(n)
    * frame, see the bfill note in graft.etl.Cleaner).
    */
  def forward(left: DataFrame, right: DataFrame, partCol: String,
              timeCol: String, valueCols: Seq[String],
              tolerance: Option[Long] = None): DataFrame =
    join(left, right, partCol, timeCol, valueCols, tolerance, forward = true)

  private def join(left: DataFrame, right: DataFrame, partCol: String,
                   timeCol: String, valueCols: Seq[String],
                   tolerance: Option[Long], forward: Boolean): DataFrame = {
    val clash = valueCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"valueCols must be disjoint from left's columns, clash: ${clash.mkString(",")}")
    val leftTagged = valueCols
      .foldLeft(left.withColumn("_tag", lit(1))) { (df, v) =>
        df.withColumn(v, lit(null).cast(right.schema(v).dataType))
      }
      .withColumn("_rt", lit(null).cast(right.schema(timeCol).dataType))
      .select((Seq(partCol, timeCol, "_tag", "_rt") ++ valueCols).map(col) ++
        left.columns.filterNot(c => c == partCol || c == timeCol).map(col): _*)

    val rightTagged = right
      .withColumn("_tag", lit(0))
      .withColumn("_rt", col(timeCol))
      .select((Seq(partCol, timeCol, "_tag", "_rt") ++ valueCols).map(col): _*)

    val extraLeftCols = left.columns.filterNot(c => c == partCol || c == timeCol)
    val unioned = rightTagged
      .select((Seq(partCol, timeCol, "_tag", "_rt") ++ valueCols).map(col) ++
        extraLeftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
      .unionByName(leftTagged)

    // Tiebreaker: among right rows sharing (partCol, timeCol) the
    // greatest valueCols tuple wins (documented, deterministic) — without
    // it the last-ignore-nulls pick depends on shuffle arrival order. In
    // the forward scan time runs descending, so right rows still sort
    // before the left rows of the same instant (tag 0 first) and the
    // greatest tuple is still the last one the running frame sees.
    val timeOrder = if (forward) col(timeCol).desc else col(timeCol).asc
    val w = Window.partitionBy(partCol)
      .orderBy(timeOrder +: col("_tag") +: valueCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // window layering (r07): every fill shares ONE WindowExec (the old
    // foldLeft planned one per value column, and each later fill's sort
    // saw earlier fills' outputs in the tiebreaker — one projection pins
    // the documented original-tuple ordering for all of them)
    val fillCols = (valueCols :+ "_rt").toSet
    val filled = unioned.select(unioned.columns.map { c =>
      if (fillCols(c)) last(col(c), ignoreNulls = true).over(w).as(c)
      else col(c)
    }: _*)
    val gap =
      if (forward) col("_rt") - col(timeCol) else col(timeCol) - col("_rt")
    val bounded = tolerance.fold(filled) { tol =>
      valueCols.foldLeft(filled) { (df, v) =>
        df.withColumn(v, when(gap <= tol, col(v)))
      }
    }
    bounded.filter(col("_tag") === 1).drop("_tag", "_rt")
  }
}
