package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by all operators.
  *
  * Correctness-by-construction rules for the DuckDB oracle compare:
  *   - timestamps → epoch millis (`unix_millis` here, `epoch_ms` in DuckDB;
  *     both floor, so ns-parquet truncation agrees).
  *   - money/quantity aggregates → cast to DECIMAL before SUM (exact,
  *     summation-order independent), cast the final sum to DOUBLE (the same
  *     exact decimal → the same double on both engines).
  *   - ratios/averages → a single IEEE division of bit-identical operands,
  *     never a rounded intermediate.
  */
object Cols {
  /** Global-order window over a KNOWN-BOUNDED summary (≤days / ≤types /
    * ≤buckets rows after an upstream aggregate): partitioning by a constant
    * declares the single-partition execution as intent instead of tripping
    * WindowExec's "No Partition Defined" warning, which assumes corpus-sized
    * input and was flooding every bench log from eight bounded-series ops
    * (VERDICT r9 #5). Use ONLY on inputs already reduced to O(summary) rows
    * — on corpus-sized data a global window is the bottleneck regardless of
    * what the log says. */
  def boundedWindow(order: Column*): org.apache.spark.sql.expressions.WindowSpec =
    org.apache.spark.sql.expressions.Window.partitionBy(lit(0)).orderBy(order: _*)

  /** Epoch milliseconds of a timestamp / timestamp_ntz column (session TZ is
    * UTC, so the NTZ→LTZ cast is the identity). */
  def tsMs(c: Column): Column = unix_millis(c.cast("timestamp_ltz"))

  /** Calendar day as a yyyy-MM-dd string. */
  def dayStr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Exact SUM: decimal-cast inputs, exact decimal accumulation, double out. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact-sum average: one double division of exact operands. */
  def davg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))

  /** The TPC-H discounted-revenue term l_extendedprice·(1−l_discount),
    * decimal-quantized at (18,6) — ONE definition of the value every
    * revenue aggregate sums, so the dozen queries using it (and their
    * oracles) can never drift in precision or scale. */
  def revenueTerm: Column =
    (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(18, 6))

  /** Exact revenue SUM: decimal accumulation of [[revenueTerm]], double out. */
  def drevenue: Column = sum(revenueTerm).cast("double")
}
