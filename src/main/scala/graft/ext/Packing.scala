package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for pretraining pipelines — the
  * concat-and-chunk form: documents are laid end to end in id order and the
  * token stream is cut into fixed-`budget` packs; each document is stamped
  * with the pack its first token lands in and its offset inside that pack.
  * (The alternative greedy whole-doc bin fill is a sequential fold with no
  * parallel formulation; concat-and-chunk is what large-scale pipelines
  * actually run, and it is exactly a prefix sum.)
  *
  * Scale shape: the global running token count is a TWO-LEVEL distributed
  * prefix sum, never a single global-order window (a `Window.orderBy` with
  * no partition moves the whole corpus through one task):
  *
  *   1. within-group cumulative sum, windowed per `idCol div groupSize` —
  *      shuffle-partitioned by group, parallel. Step 1's output (narrow
  *      rows: ids and counts, never the corpus text) is STAGED once as
  *      executor-local blocks — both step-2 consumers read the blocks, so
  *      the value-producing scan + tokenization run exactly once BY
  *      CONSTRUCTION, not by optimizer grace (Spark's exchange-reuse rule
  *      is defeated here by a null-filter asymmetry the join side's key
  *      adds, and left lazy the corpus would be scanned once per
  *      consumer);
  *   2. group totals — the LAST cumulative value per group — get the same
  *      cumulative sum over the tiny group axis and join back as per-group
  *      prefix offsets. No forced broadcast: AQE broadcasts the prefix
  *      side only when it actually fits (at ~250M groups for a
  *      trillion-doc corpus it must not reach the driver).
  *
  * If even the group axis outgrows one window task, the same construction
  * nests once more. All arithmetic is integer, so the DuckDB oracle
  * (`sum() OVER (ORDER BY id)`) matches exactly.
  */
object Packing {

  /** The TWO-LEVEL distributed prefix sum itself (steps 1–2 of the object
    * doc), reusable by any in-id-order accumulation ([[packByBudget]],
    * [[Compaction.planBins]], [[Concurrency.maxConcurrent]]): returns the
    * input columns plus `__start` = the exact sum of `valueCol` over all
    * EARLIER ids. With `monotone = true` (the default) values must be
    * non-negative — the group total is read off the within-group cumsum's
    * max, which shares the window's own aggregation buffer. Signed values
    * (the sweep-line ±1 deltas) pass `monotone = false`, which reads the
    * group total as the LAST row's cumulative value via `max_by` instead —
    * same single scan, one extra struct per group.
    */
  private[ext] def prefixSum(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      groupSize: Long,
      monotone: Boolean = true): DataFrame = {
    require(groupSize > 0, "groupSize must be positive")
    val t = df.withColumn("__g", expr(s"$idCol div $groupSize"))
    // staged once (see the object doc, step 1) — `within` feeds both the
    // group-total aggregate and the prefix join; rows here are narrow by
    // contract (callers project to id + value before calling)
    val within = t.withColumn("__cum_in",
        sum(col(valueCol)).over(Window.partitionBy("__g").orderBy(idCol)))
      .localCheckpoint()
    // group total = the group's LAST cumulative value, taken from `within`
    // itself so the value-producing scan runs once; one row per group feeds
    // the global-order window over the GROUP axis, not the corpus. (For the
    // tied-id edge: the window's default RANGE frame gives every peer the
    // same cumulative value, so `max_by` on a tied max id is well-defined.)
    val groupTotal =
      if (monotone) max(col("__cum_in"))
      else max_by(col("__cum_in"), col(idCol))
    val prefixes = within.groupBy("__g").agg(groupTotal.as("__gt"))
      .withColumn("__prefix", coalesce(
        sum(col("__gt")).over(Window.orderBy("__g")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__g", "__prefix")
    within.join(prefixes, "__g")
      .withColumn("__start", col("__prefix") + col("__cum_in") - col(valueCol))
      .drop("__g", "__cum_in", "__prefix")
  }

  def packByBudget(
      docs: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      groupSize: Long = 4096L): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val t = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
    prefixSum(t, idCol, "n_tokens", groupSize)
      .select(col(idCol), col("n_tokens"),
        expr(s"__start div $budget").as("pack_id"),
        (col("__start") % budget).as("pack_offset"))
  }

  /** Segment-boundary layout per pack: [[packByBudget]] re-read as what
    * the trainer consumes — for every pack, the ordered comma-joined list
    * of segment (document) token lengths. These are the attention-mask
    * segment boundaries of sequence packing (each segment attends only
    * within itself). `collect_list` has no order contract, so the
    * `array_sort` on (offset, id) structs BEFORE the join is what makes
    * the value engine-exact (the q97 deterministic-collect rule). Per-pack
    * state is bounded by docs-per-pack ≤ budget (every doc occupies ≥ 1
    * token of its start pack); one more shuffle on `pack_id` over the
    * prefix sum's output.
    */
  def packSegments(
      docs: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      groupSize: Long = 4096L): DataFrame =
    packByBudget(docs, budget, idCol, textCol, groupSize)
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              col("pack_offset"), col(idCol), col("n_tokens")))),
            x => x.getField("n_tokens").cast("string")),
          ",").as("segments"))
}
