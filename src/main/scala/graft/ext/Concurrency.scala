package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-concurrency analytics — the sweep-line family: how many
  * sessions (or any `[start, end]` intervals) are open at once, read off
  * boundary events with a running ±1 sum.
  *
  * The textbook formulation sorts every boundary globally and scans once —
  * a single-task global-order window that dies at scale. Here the running
  * sum is [[Packing.prefixSum]], the engine's shared two-level distributed
  * prefix sum (within-time-range cumsum in parallel, then a group-axis
  * prefix join), in its signed form (`monotone = false`): the sweep stays
  * exact, every step is an integer, and no task ever sees more than one
  * time-range's boundaries. The same construction nests if the group axis
  * itself outgrows one task.
  *
  * Boundary encoding: a session `[s, e]` (inclusive micros, `s ≤ e`)
  * becomes `+1` at `pid = 2s` and `−1` at `pid = 2e + 1` — the parity bit
  * orders every start STRICTLY before any end at the same microsecond, so
  * a session ending exactly when another starts counts as overlapping
  * (the convention a capacity planner wants), while equal-time boundaries
  * of the same kind land on one `pid` and the RANGE-frame cumsum counts
  * them together.
  */
object Concurrency {

  /** Per-day maximum concurrency over `[startCol, endCol]` interval rows
    * (epoch-micros, inclusive ends). Returns `(day, max_concurrent)` where
    * `day` is the epoch-day of the boundary at which the maximum was
    * observed — maxima are evaluated at boundary points, which is exact:
    * concurrency only changes there.
    *
    * `groupSize` partitions the sweep by pid ranges (pid = 2×micros ± 1);
    * the default is one week of pid space per group — at 1000 executors
    * and years of data the group axis stays thousands of rows, far under
    * one task's window limit, while each group's boundary set is bounded
    * by that week's traffic.
    *
    * A day with NO boundary points emits no row (concurrency is constant
    * through it, equal to the previous boundary's value) — deliberate:
    * emitting it would need a day grid, and the consumer that wants one
    * composes this with the q133 gap-fill operator.
    */
  def maxConcurrent(
      intervals: DataFrame,
      startCol: String = "ts_start",
      endCol: String = "ts_end",
      groupSize: Long = 7L * 86400000000L * 2L): DataFrame = {
    // both boundaries of an interval come out of ONE pass over the input
    // (a union of two selects would recompute the interval-producing
    // subtree — e.g. a full sessionization — once per boundary kind)
    val b = intervals
      .select(explode(array(
        struct((col(startCol) * 2).as("pid"), lit(1L).as("delta")),
        struct((col(endCol) * 2 + 1).as("pid"), lit(-1L).as("delta")))).as("__b"))
      .select(col("__b.pid").as("pid"), col("__b.delta").as("delta"))
    Packing.prefixSum(b, "pid", "delta", groupSize, monotone = false)
      // inclusive running sum: __start excludes the current row's value,
      // and the RANGE frame already folded tied-pid peers into __cum_in —
      // so prefix + cum_in (= __start + delta) IS the concurrency at pid
      .withColumn("conc", col("__start") + col("delta"))
      .withColumn("day", expr("pid div 2 div 86400000000"))
      .groupBy("day")
      .agg(max(col("conc")).as("max_concurrent"))
  }
}
