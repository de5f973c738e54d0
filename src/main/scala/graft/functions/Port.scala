package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable rounding for oracle-comparable outputs.
  *
  * Library `round()` differs between engines at half boundaries (Spark
  * rounds the exact decimal expansion of the double; DuckDB rounds after
  * float scaling), so any value ulp-close to a boundary hashes differently.
  * `floor(x*10^d + 0.5)/10^d` is pure IEEE arithmetic — identical in every
  * engine — so equal inputs give bit-identical outputs. Use `r` in Spark
  * queries and `rsql` in the DuckDB oracle for every noisy double
  * (ratios, stddevs, anything transcendental); leave untouched input
  * values and exact integer sums unrounded.
  */
object Port {
  def r(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * s + lit(0.5)) / s
  }

  def rsql(e: String, digits: Int): String =
    s"floor(($e) * 1e$digits + 0.5) / 1e$digits"
}
