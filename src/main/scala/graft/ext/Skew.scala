package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins — the salting counterpart to AQE's
  * runtime skew-join splitting.
  *
  * AQE only splits skewed partitions of sort-merge joins it can observe at
  * a shuffle boundary; salting is the deterministic, planner-independent
  * fix: the skewed (probe) side scatters each hot key across `salts`
  * sub-keys, the build side replicates each row `salts` times, and the join
  * key becomes (key, salt) — a hot key's rows now land on `salts` reducers
  * instead of one. Cost: build side inflates ×`salts`; use a salts value
  * around the observed skew factor, and only when the build side is too big
  * to broadcast outright (broadcasting sidesteps skew entirely).
  *
  * Two salt modes, a real trade-off:
  *
  *   - default (content hash of the non-key payload): DETERMINISTIC under
  *     task recomputation — a retried map task reassigns identical salts, so
  *     a mid-shuffle fetch failure cannot double-count or drop rows (the
  *     SPARK-23207 round-robin-repartition failure class). Limitation: rows
  *     of a hot key that are fully IDENTICAL collapse onto one salt and are
  *     not spread.
  *   - `spreadIdenticalRows = true` (row-local id mod salts): round-robins
  *     even identical rows across all salts — the common duplicate-row skew
  *     case — but salt assignment depends on row order within a partition,
  *     so it is only safe where recomputation is all-or-nothing (no
  *     mid-stage retry consuming a partial older attempt): single-attempt
  *     batch jobs, or inputs that arrive deterministically ordered.
  *
  * Either way the salt only routes — result rows are exactly those of the
  * unsalted join under failure-free execution (asserted in SkewSpec).
  */
object Skew {

  /** The probe-side salt expression — exposed for tests so the spread
    * property is asserted on the SAME expression the join uses.
    */
  private[ext] def probeSalt(
      probe: DataFrame,
      keys: Seq[String],
      salts: Int,
      spreadIdenticalRows: Boolean): Column =
    if (spreadIdenticalRows) pmod(monotonically_increasing_id(), lit(salts.toLong))
    else {
      val payload = probe.columns.filterNot(keys.contains)
      val saltSrc = if (payload.nonEmpty) payload.map(col).toSeq else keys.map(col)
      pmod(hash(saltSrc: _*), lit(salts))
    }

  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner",
      spreadIdenticalRows: Boolean = false): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(keys.nonEmpty, "need at least one key column")
    // the build side is replicated x salts, so join types that emit
    // UNMATCHED build rows would duplicate them salts times
    val supported = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(supported.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports probe-preserving join types only, got '$joinType' " +
        "(an outer build side would replicate unmatched rows per salt)")
    val p = probe.withColumn("__salt", probeSalt(probe, keys, salts, spreadIdenticalRows))
    val b = build.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, keys :+ "__salt", joinType).drop("__salt")
  }
}
