package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Corpus curation needs samples that are REPRODUCIBLE (the same subset on
  * every run, every engine, any partitioning) and CHEAP (no global shuffle
  * just to pick rows). Both operators key off the md5 hash of the row id —
  * the same 60-bit-prefix arithmetic as [[Dedup.baseHash]] — so membership
  * is a pure per-row predicate any engine can replay, and both are
  * oracle-verified in DuckDB (unlike `df.sample`, whose RNG is
  * partitioning-dependent and engine-private).
  *
  * 100 TB shape: [[hashSample]] is a pushable-shape filter (scan-time, no
  * shuffle, no state). [[stratifiedQuota]] shuffles only (strata, hash, id)
  * triples through a per-stratum top-k window; at extreme stratum skew the
  * standard two-level trick (pre-filter with a generous [[hashSample]],
  * then the exact window) bounds the window input.
  */
object Sampling {

  /** 60-bit hash gate: keep rows whose `md5(id)` prefix falls below
    * `fraction` of the hash space. Deterministic, order- and
    * partitioning-independent; expected (not exact) fraction.
    */
  def hashGate(id: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val threshold = (fraction * (1L << 60).toDouble).toLong
    Dedup.baseHash(id.cast("string")) < lit(threshold)
  }

  /** Deterministic ~`fraction` sample of `df` keyed on `idCol`. */
  def hashSample(df: DataFrame, fraction: Double, idCol: String = "doc_id"): DataFrame =
    df.filter(hashGate(col(idCol), fraction))

  /** Weighted corpus MIXING: per-source sampling fractions — the ratios
    * knob of a pretraining data pipeline ("keep 100% of wiki, 35% of
    * common-crawl, 5% of forums"). Each row passes its source's
    * [[hashGate]]; sources absent from `weights` get `defaultFraction`
    * (0.0 = drop unknown sources, the safe default for a curated mix).
    *
    * Same 100 TB shape as [[hashSample]]: a pure per-row predicate (the
    * weight lookup compiles to a CASE chain over the source column), no
    * shuffle, no state, deterministic across runs/engines/partitionings.
    */
  def weightedMix(
      df: DataFrame,
      weights: Map[String, Double],
      sourceCol: String = "source",
      idCol: String = "doc_id",
      defaultFraction: Double = 0.0): DataFrame = {
    require(weights.nonEmpty, "weights must name at least one source")
    // deterministic CASE order (sorted by source) so plans are stable
    val gate = weights.toSeq.sortBy(_._1).foldRight(
      hashGate(col(idCol), defaultFraction)) { case ((src, frac), rest) =>
      when(col(sourceCol) === lit(src), hashGate(col(idCol), frac)).otherwise(rest)
    }
    df.filter(gate)
  }

  /** Deterministic train/validation/test split assignment: each row's
    * 60-bit md5 hash position selects its split by cumulative fraction
    * (e.g. 0.8/0.1/0.1). The assignment is a pure per-row function of the
    * id — reproducible across runs, engines and partitionings, and STABLE
    * UNDER CORPUS GROWTH: adding documents never moves an existing
    * document between splits (the property a training pipeline needs so
    * yesterday's eval set is not contaminated by today's resplit).
    * Fractions must sum to 1 (±1e-9); expected, not exact, sizes.
    *
    * Same 100 TB shape as [[hashSample]]: no shuffle, no state, a scan-time
    * projection.
    */
  def splitAssign(
      df: DataFrame,
      fractions: Seq[(String, Double)],
      idCol: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty, "at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val thresholds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val h = Dedup.baseHash(col(idCol).cast("string"))
    // last split is the unconditional else-branch: every row gets a split
    // even if float rounding leaves the top threshold a hair under 2^60
    val gate = fractions.init.zip(thresholds.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), cum), rest) =>
      when(h < lit((cum * (1L << 60).toDouble).toLong), lit(name)).otherwise(rest)
    }
    df.withColumn("split", gate)
  }

  /** GROUP-aware k-fold assignment for cross-validation: every row of one
    * group (user, document family, session owner) lands in the SAME fold —
    * the leakage-prevention property row-level folding silently violates
    * (a user's morning events training a model evaluated on their
    * afternoon). The fold is `md5(group) % k`: a pure per-row projection
    * (no shuffle, no state), reproducible across runs/engines/
    * partitionings, and stable under corpus growth like [[splitAssign]].
    */
  def groupKFold(
      df: DataFrame,
      groupCol: String,
      k: Int,
      foldCol: String = "fold"): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    df.withColumn(foldCol,
      pmod(Dedup.baseHash(col(groupCol).cast("string")), lit(k.toLong)).cast("int"))
  }

  /** Exactly `perStratum` rows per stratum (fewer if the stratum is
    * smaller), chosen deterministically by hash order with id tiebreak —
    * a reproducible stratified quota, not a probabilistic one. This IS the
    * bounded-state per-key uniform sampler (a bottom-k-by-hash sketch): the
    * k smallest hashes of a uniform hash family are a uniform k-subset.
    *
    * Scale shape: the reduction is
    * [[graft.functions.GraftFunctions.collectTopK]] with `reverse = true`
    * (k smallest), NOT a `row_number` window — k rows of state per
    * (partition, stratum), heap-merged map-side, so the shuffle carries
    * k rows per stratum instead of sorting every stratum in full. The
    * hottest stratum costs k, not its row count — the property that makes
    * per-user / per-domain sampling safe at 100 TB. Rows ride the heap as
    * a nested struct, so every column must be orderable (no map columns;
    * the (hash, id) prefix is unique, so payload fields never actually
    * decide a comparison).
    */
  def stratifiedQuota(
      df: DataFrame,
      strataCols: Seq[String],
      perStratum: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(perStratum > 0, "perStratum must be positive")
    val h = Dedup.baseHash(col(idCol).cast("string"))
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(strataCols.map(col): _*)
      .agg(graft.functions.GraftFunctions.collectTopK(
        struct(h.as("h"), col(idCol).as("i"), payload.as("p")),
        perStratum, reverse = true).as("tk"))
      .select(explode(col("tk.p")).as("__r"))
      .select(col("__r.*"))
  }

  /** Per-source TOKEN-budget greedy selection: within each source, take
    * documents in `orderBy` priority order until the source's cumulative
    * token count reaches `budgetPerSource` (a document whose START is
    * inside the budget is kept whole — concat-and-chunk semantics, like
    * [[Packing.packByBudget]]). This is quota sampling in the unit that
    * actually matters for pretraining — tokens, not documents — so a
    * source of ten huge files and a source of a million tweets get the
    * same training-token share. Default priority: longest documents first
    * (`n_chars desc`), id tie-break; the policy is caller-pluggable.
    *
    * Scale shape: one shuffle on the source plus a per-source sort (the
    * greedy ORDER is the semantics; sort-based shuffle spills, so a skewed
    * source is slow but safe). Emits `cum_before` so downstream stages can
    * re-derive the cut without re-running the window.
    */
  def tokenQuota(
      df: DataFrame,
      budgetPerSource: Long,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      orderBy: Seq[Column] = Seq(col("n_chars").desc)): DataFrame = {
    require(budgetPerSource > 0, "token budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(orderBy :+ col(idCol).asc: _*)
    df.select(col(idCol), col(sourceCol), col("n_chars"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(
        sum(col("n_tokens")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < budgetPerSource)
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("cum_before"))
  }

  /** Deterministic training-shard layout: `shard` = md5-hash of the id mod
    * `nShards`, `pos` = the document's 0-based position within its shard in
    * (hash, id) order. Together they ARE the "global shuffle" a trainer
    * wants — a reproducible pseudorandom permutation of the corpus laid
    * out as `nShards` independently readable sequences — without any
    * engine-private RNG (`df.orderBy(rand())` changes with partitioning;
    * this never does).
    *
    * Scale shape: one shuffle on the shard id plus a per-shard sort —
    * exactly the work a shard WRITER must do anyway; hash sharding makes
    * the shards size-balanced by construction, so no shard straggles.
    */
  def shardAssign(
      df: DataFrame,
      nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h").asc, col(idCol).asc)
    df.select(col(idCol), Dedup.baseHash(col(idCol).cast("string")).as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Incremental shard APPEND: place a batch of NEW documents into an
    * existing [[shardAssign]] layout without touching old rows. `manifest`
    * is the layout's per-shard row count — `(shard, n_existing)`,
    * MODEL-sized (≤ nShards rows) and broadcast — and new documents get
    * the same hash-mod shard with in-shard positions continuing after
    * `n_existing` in (hash, id) order. Appending is a pure function of the
    * new batch plus the manifest: yesterday's shards stay immutable,
    * today's write only appends, and the trainer's readers never
    * re-shuffle old data — the layout twin of the incremental dedup
    * index ([[Dedup]]'s persisted-index tier).
    */
  def shardAppend(
      newDocs: DataFrame,
      manifest: DataFrame,
      nShards: Int,
      idCol: String = "doc_id"): DataFrame =
    shardAssign(newDocs, nShards, idCol)
      .join(broadcast(manifest), Seq("shard"), "left")
      .withColumn("pos", col("pos") + coalesce(col("n_existing"), lit(0L)))
      .select(col(idCol), col("shard"), col("pos"))

  /** Per-source data-mixture plan under a total token budget with
    * sqrt-temperature reweighting (α = 0.5): `weight = floor(sqrt(tokens))`
    * flattens the source distribution — the standard move that keeps a
    * dominant crawl from drowning small high-quality sources — then each
    * source's `share_ppm` of the budget and its implied `epochs_ppm`
    * (allocated / available tokens, >1e6 means the source repeats) come
    * out as exact integers. `floor(sqrt)` on a double is bit-stable
    * cross-engine (IEEE sqrt is correctly rounded), so the plan is
    * oracle-exact despite the one libm call.
    *
    * Scale shape: one partial-aggregated shuffle on the source; everything
    * after runs on the MODEL-sized per-source table (the unpartitioned
    * window is |sources| rows, never data-sized).
    */
  def mixturePlan(
      df: DataFrame,
      totalBudget: Long,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(totalBudget > 0, "token budget must be positive")
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
      .withColumn("weight", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      .withColumn("share_ppm",
        expr("1000000 * weight div " +
          "sum(weight) over (rows between unbounded preceding and unbounded following)"))
      .withColumn("alloc_tokens", expr(s"$totalBudget * share_ppm div 1000000"))
      .withColumn("epochs_ppm", expr("1000000 * alloc_tokens div n_tokens"))
  }

  /** Per-group percentile floor gate: keep rows at or above their group's
    * p-th DISCRETE percentile of `valueCol` — the calibrated curation cut
    * ("drop each source's shortest quartile") that a single global
    * threshold gets wrong when sources have different length regimes.
    * `percentile_disc` boundaries are data elements, so the cut is
    * bit-exact cross-engine (the q103/q128/q138 contract).
    *
    * Scale shape: one partial-aggregated pass builds the model-sized
    * per-group anchor table (|groups| rows), explicitly broadcast back;
    * the filter is then scan-side — the data never shuffles.
    */
  def percentileFloor(
      df: DataFrame,
      groupCol: String = "source",
      valueCol: String = "n_chars",
      p: Double = 0.25): DataFrame = {
    require(p > 0.0 && p < 1.0, "p must be in (0,1)")
    val anchors = df.groupBy(col(groupCol))
      .agg(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY $valueCol)").as("__floor"))
    df.join(broadcast(anchors), groupCol)
      .filter(col(valueCol) >= col("__floor"))
      .drop("__floor")
  }

  /** Class-balanced EXACT downsample: every label keeps exactly
    * min-class-count rows, selected deterministically by md5-hash rank —
    * the classic class-rebalance step before training a classifier head,
    * with none of `df.sample`'s run-to-run drift. The per-class k comes
    * off a one-row scalar anchor (the same driver-read contract as the
    * z-order bounds row and q138's percentile anchor); selection is then
    * [[stratifiedQuota]]'s bounded-state bottom-k-by-hash — k rows of
    * state per label, never a per-label sort, so the hottest class costs
    * k, not its row count.
    */
  def balancedSample(
      df: DataFrame,
      labelCol: String = "label",
      idCol: String = "vec_id"): DataFrame = {
    val k = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n"))).head().getLong(0)
    require(k > 0 && k <= Int.MaxValue, s"degenerate min class count: $k")
    stratifiedQuota(df, Seq(labelCol), k.toInt, idCol)
  }

  /** WEIGHTED k-sample via priority sampling (Duffield, Lund & Thorup,
    * JACM 2007): each row draws priority `hash(id) div max(weight, 1)`
    * from the 60-bit md5 space and the k SMALLEST priorities win — higher
    * weight ⇒ proportionally smaller expected priority ⇒ proportionally
    * higher inclusion odds, the integer-exact stand-in for the
    * `u^(1/w)` exponential-keys scheme (whose float pow would not
    * reproduce across engines). The quality-weighted corpus draw:
    * "sample 50k docs, preferring long/high-quality ones" with
    * deterministic, partitioning-independent output.
    *
    * Scale shape: priorities are map-side arithmetic; the global bottom-k
    * is a per-partition top-k heap merged on the driver-side single
    * reducer (`TakeOrderedAndProject` — k rows of state per partition,
    * never a full sort). Ties break on the id, so the sample is unique.
    */
  def prioritySample(
      df: DataFrame,
      k: Int,
      weight: Column,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("__h", Dedup.baseHash(col(idCol).cast("string")))
      .withColumn("__w", greatest(weight.cast("long"), lit(1L)))
      .withColumn("priority", expr("__h div __w"))
      .drop("__h", "__w")
      .orderBy(col("priority").asc, col(idCol).asc)
      .limit(k)
  }
}
