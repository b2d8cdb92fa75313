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

  /** EXACT count-distinct per key for skewed keys, in two stages.
    *
    * Plain `groupBy(key).agg(count_distinct(v))` plans distinct as a
    * re-aggregation keyed on (key, v) — already two shuffles — and then the
    * per-key merge: a hot key's entire distinct-value set converges on ONE
    * reducer, which at 100 TB is the task that never finishes. Salting by
    * `hash(value) % salts` splits each key's value space into `salts`
    * DISJOINT partitions (the same value always lands on the same salt, so
    * per-salt distinct counts ADD EXACTLY — no overlap to reconcile):
    *
    *   stage 1: groupBy(key, salt) → count_distinct(v)   (hot key on `salts` reducers)
    *   stage 2: groupBy(key)       → sum(partials)       (`salts` small rows per key)
    *
    * The salt is content-derived, so task retries reassign identically
    * (the SPARK-23207-safe choice, same rationale as [[probeSalt]]).
    * Result equals the unsalted aggregate row-for-row (SkewSpec; q111 is
    * oracled against the definitional COUNT(DISTINCT)).
    */
  def saltedDistinctCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salts: Int,
      outCol: String = "n_distinct"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(keys.nonEmpty, "need at least one key column")
    df.select((keys.map(col) :+ col(valueCol)): _*)
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count_distinct(col(valueCol)).as("__part"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__part").as(outCol))
  }
}
