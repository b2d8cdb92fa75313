package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass range-partitioned global ordering — the scale-safe replacement
  * for `Window.orderBy(...)` with no partition clause (which moves every row
  * through ONE task: the `WindowExec: No Partition Defined` plan shape).
  *
  * Pass 1: `repartitionByRange` on the order key samples range boundaries
  * and places each row in a range-ordered partition (equal keys always land
  * together, so a TOTAL order key — tie-broken by a unique id — yields a
  * well-defined global order regardless of where the sampled boundaries
  * fall). Within each partition a PARTITIONED window computes the local
  * running aggregate in parallel.
  *
  * Pass 2: per-partition totals contract to at most `numPartitions` rows —
  * bounded by CONFIGURATION, not by data — and their running offsets are
  * computed on the driver (the same bounded-model discipline as the IVF
  * centroid reads in [[Similarity]]: ≤ one long per partition, never a
  * corpus-sized collect) and broadcast-joined back. global = offset + local.
  *
  * Sister construction to [[Packing.prefixSum]], which groups by an integer
  * id range; this one orders by ARBITRARY sort columns (descending, multi-
  * column, expression keys), which the three global-rank call sites (q374's
  * weight rank, q328's two Spearman rank axes, q264's sweep-line running
  * sum) need. Identical correctness contract: all arithmetic is integer and
  * the result is bit-equal to the single-partition `Window.orderBy` form,
  * so existing DuckDB oracles replay unchanged.
  */
object RangeRank {

  /** Global running sum of `value` (cast to long, must be non-null) over
    * rows in `order` — ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    * semantics, inclusive of the current row. `order` should be a total
    * order (include a unique tie-break column) unless the consumer is
    * provably tie-permutation-insensitive (q264's per-day max is).
    */
  def prefix(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      out: String,
      numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "at least one order column")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Stage ONCE: spark_partition_id() is only consistent across the two
    // consumers below (the totals aggregate and the final join) if the
    // range shuffle runs exactly once — localCheckpoint pins the assignment
    // (the Packing.prefixSum discipline). Rows here are whatever the caller
    // passes; the three call sites project to narrow id+key rows first.
    val staged = df
      .withColumn("__rr_v", value.cast("long"))
      .repartitionByRange(parts, order: _*)
      .withColumn("__rr_pid", spark_partition_id().cast("long"))
      .localCheckpoint()
    // Bounded driver read: ≤ `parts` (pid, partition total) pairs.
    val totals = staged.groupBy("__rr_pid").agg(sum("__rr_v").as("__rr_t"))
      .collect()
      .map { r =>
        // a null partition sum means every value in that range partition was
        // null — the documented non-null precondition is violated; fail with
        // the contract instead of an opaque NPE out of getLong
        require(!r.isNullAt(1),
          s"RangeRank.prefix: range partition ${r.getLong(0)} holds only null " +
            "values — `value` must be non-null (cast/coalesce it first)")
        (r.getLong(0), r.getLong(1))
      }
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) => val o = acc; acc += t; (pid, o) }
    val offDf = spark.createDataFrame(offsets.toIndexedSeq)
      .toDF("__rr_pid", "__rr_off")
    val w = Window.partitionBy("__rr_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    staged.join(broadcast(offDf), "__rr_pid")
      .withColumn(out, col("__rr_off") + sum(col("__rr_v")).over(w))
      .drop("__rr_pid", "__rr_v", "__rr_off")
  }

  /** Global `row_number()` over `order` (1-based, long) — `prefix` with a
    * constant 1 weight. `order` must be a total order for a deterministic
    * result; every call site tie-breaks on a unique id column.
    */
  def rank(
      df: DataFrame,
      order: Seq[Column],
      out: String,
      numPartitions: Int = 0): DataFrame =
    prefix(df, order, lit(1L), out, numPartitions)
}
