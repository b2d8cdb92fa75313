package graft.ext

import org.apache.spark.sql.DataFrame
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
  * The probe-side salt is row-local (`monotonically_increasing_id mod
  * salts` — consecutive within a partition, so hot-key rows round-robin
  * across all salts) rather than content-derived: a content hash collapses
  * to ONE salt when the hot key's rows are identical (the common
  * duplicate-row skew case), defeating the mitigation exactly when it is
  * needed. The salt only routes — result rows are exactly those of the
  * unsalted join regardless of salt assignment (asserted in SkewSpec).
  */
object Skew {

  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(keys.nonEmpty, "need at least one key column")
    // the build side is replicated x salts, so join types that emit
    // UNMATCHED build rows would duplicate them salts times
    val supported = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(supported.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports probe-preserving join types only, got '$joinType' " +
        "(an outer build side would replicate unmatched rows per salt)")
    val p = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val b = build.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, keys :+ "__salt", joinType).drop("__salt")
  }
}
