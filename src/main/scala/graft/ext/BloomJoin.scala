package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Bloom-pruned semi/anti joins — the join regime BETWEEN broadcast and
  * shuffle: the build side is too big to broadcast as an exact hash relation
  * but its Bloom sketch (bits, not rows) still fits everywhere, so the probe
  * side is pruned BEFORE its shuffle and only might-match rows pay exchange
  * cost. This is exactly the mechanism behind Spark's own
  * `InjectRuntimeFilter` (`spark.sql.optimizer.runtime.bloomFilter.*`);
  * stating it as an operator makes the pruning deterministic, tunable
  * (items/bits per call, not session conf), and assertable in plans/specs
  * rather than dependent on the optimizer's cost heuristics firing.
  *
  * Correctness: a Bloom filter has no false NEGATIVES, so the prefilter can
  * only drop rows the exact join would drop anyway; the exact semi join
  * afterwards removes the false positives. Results therefore equal the plain
  * semi/anti join row-for-row (asserted in BloomJoinSpec, and q109 is
  * oracled against the definitional `EXISTS`).
  *
  * Scale accounting (per 100 TB probe, 10⁸-row build, 1% fpp ≈ 120 MB of
  * bits): the sketch is built in one pass over the build side (partials
  * merge map-side — it is a TypedImperativeAggregate) and reaches the probe
  * tasks as a SCALAR SUBQUERY — the same conveyance Spark's
  * `InjectRuntimeFilter` uses — so the bits ride the subquery result
  * channel, NEVER a `lit(bytes)` embedded in the plan tree (a 120 MB
  * literal would bloat every plan copy, the UI string, and task
  * serialization — the same literal-expression wall the IVF centroid path
  * removed). The probe filter then runs map-side on the scan; the
  * downstream shuffle carries only `selectivity + fpp` of the probe. When
  * the build side fits a broadcast hash join outright, use that instead —
  * this operator pays one extra build-side pass to avoid shuffling an
  * unbroadcastable relation.
  */
object BloomJoin {

  /** Probe-side rows that (exactly) have / don't have a build-side match on
    * the key, with a Bloom prefilter ahead of the exact join.
    *
    * `expectedItems`/`numBits` size the sketch: ~10 bits per distinct build
    * key gives fpp ≈ 1%. Nulls never match in SQL semi-join semantics, so
    * null probe keys are dropped (semi) / kept (anti) without probing.
    */
  def bloomSemiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1000000L): DataFrame =
    pruned(probe, build, probeKey, buildKey, expectedItems, numBits, anti = false)

  def bloomAntiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1000000L): DataFrame =
    pruned(probe, build, probeKey, buildKey, expectedItems, numBits, anti = true)

  private def pruned(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long,
      numBits: Long,
      anti: Boolean): DataFrame = {
    val keys = build.select(col(buildKey)).na.drop()
    // the one-row sketch as a scalar subquery: built lazily inside the same
    // query (no driver round trip at operator-construction time) and shipped
    // to probe tasks by the subquery machinery, not as a plan literal
    val sketch = keys
      .agg(GraftFunctions.bloomFilterAgg(
        xxhash64(col(buildKey)), expectedItems, numBits).as("bf"))
      .scalar()
    // empty build side → null sketch → might-contain evaluates null; treat
    // as "definitely absent", which is exact for both join flavors
    val hit = coalesce(
      GraftFunctions.bloomMightContain(sketch, xxhash64(col(probeKey))), lit(false))

    if (anti) {
      // anti join: the Bloom filter can only prove absence ("definitely not
      // in the build side"). Rows the sketch clears bypass the join COST but
      // not the join RESULT — they are exactly the anti-join keepers; only
      // might-contain rows need the exact join to sort false positives from
      // real matches.
      val definitelyAbsent = probe.filter(col(probeKey).isNotNull && !hit)
      val maybe = probe.filter(col(probeKey).isNull || hit)
        .join(build.select(col(buildKey).as("__bk")),
          col(probeKey) === col("__bk"), "left_anti")
      definitelyAbsent.unionByName(maybe)
    } else {
      probe
        .filter(hit)
        .join(build.select(col(buildKey).as("__bk")),
          col(probeKey) === col("__bk"), "left_semi")
    }
  }
}
