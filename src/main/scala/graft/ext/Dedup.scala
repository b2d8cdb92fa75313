package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deduplication operators for LLM training-data pipelines.
  *
  * Five tiers, cheapest-first — the standard corpus-cleaning ladder:
  *
  *   1. exact: hash-groupBy on a normalized fingerprint (one shuffle on the
  *      md5 key; map-side combine makes the exchange tiny);
  *   2. MinHash + LSH banding for near-dups: shingle → signature → band
  *      buckets → in-bucket candidate pairs (groupBy + pair enumeration,
  *      payload-free) → Jaccard verify on shingle sets fetched per surviving
  *      pair. At 100 TB candidates stay bucket-local: no quadratic blowup,
  *      skew bounded by bucket size;
  *   3. SimHash: one 48-bit per-doc sketch, Hamming-adjacent pairs within
  *      blocking buckets;
  *   4. n-gram Jaccard within a deterministic blocking window (verify tier);
  *   5. embedding cosine near-dup within a blocking key (label / coarse
  *      quantization cell), see [[Similarity]] for the ANN machinery.
  *
  * All hashing is md5-derived (a standard algorithm available in every
  * engine) plus affine universal hashes over a 31-bit field — deterministic
  * and integer-exact, so every tier can be oracle-verified in DuckDB.
  * Zero UDFs: shingling, hashing and sketches are the one-pass codegen'd
  * Catalyst expressions in [[graft.functions]] (the equivalent higher-order
  * function chains are interpreter-only and re-walk the array once per hash
  * function / sketch bit — parity between the two formulations is asserted
  * in VectorFunctionsSpec).
  */
object Dedup {

  // ---------------- exact ----------------

  /** Exact-duplicate groups: one row per distinct normalized text, with the
    * surviving (minimum) doc id and the group size.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(TextAnalysis.md5Fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("copies"))

  /** Exact dedup: keep the minimum-id representative per normalized text. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keepers = exactGroups(docs, idCol, textCol).select(col("keeper_id").as(idCol))
    docs.join(keepers, idCol) // broadcast or shuffle join per AQE; keepers ≤ docs
  }

  /** Cross-source contamination matrix: for every pair of sources, how many
    * distinct fingerprints appear in BOTH — the leakage audit run before
    * mixing corpora (a benchmark set hiding inside a crawl source, a vendor
    * dump re-scraped under another name). Pairs are unordered
    * (`source_a < source_b`).
    *
    * `prefixTokens = Some(k)` fingerprints only the first k normalized
    * tokens instead of the whole text — the shared-prefix leakage signal
    * (the same article re-scraped with different boilerplate tails hashes
    * equal on its head and different end-to-end). `None` is the strict
    * exact-duplicate matrix.
    *
    * Scale shape: one shuffle on the md5 fingerprint for the
    * `(fingerprint, source)` distinct; the self-join then runs WITHIN
    * fingerprint groups whose size is bounded by |sources| (the distinct
    * collapsed per-source copies), so its output is at most
    * C(|sources|, 2) per fingerprint and the result is a model-sized
    * |sources|² matrix — never a doc×doc product. Corpus scanned once per
    * side of the self-join from the same staged projection (Spark reuses
    * the exchange; at 100 TB both sides hash on fingerprint — co-located).
    */
  def crossSourceOverlap(
      docs: DataFrame,
      textCol: String = "text",
      sourceCol: String = "source",
      prefixTokens: Option[Int] = None): DataFrame = {
    val fp = prefixTokens match {
      case Some(k) =>
        require(k > 0, "prefixTokens must be positive")
        md5(array_join(slice(TextAnalysis.tokens(col(textCol)), 1, k), " "))
      case None => TextAnalysis.md5Fingerprint(col(textCol))
    }
    val fs = docs.select(fp.as("fingerprint"), col(sourceCol).as("__src")).distinct()
    val a = fs.select(col("fingerprint"), col("__src").as("source_a"))
    val b = fs.select(col("fingerprint"), col("__src").as("source_b"))
    a.join(b, Seq("fingerprint"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared_fps"))
  }

  // ---------------- MinHash + LSH ----------------

  /** Distinct character k-shingles over an ALREADY-NORMALIZED column
    * (first-occurrence order; input shorter than k ⇒ empty array) — the
    * one-pass codegen'd [[graft.functions.CharShingles]].
    */
  def shinglesOfNorm(t: Column, k: Int = 5): Column =
    GraftFunctions.charShingles(t, k)

  /** Convenience form over raw text — fine for one-off use; hot paths should
    * project [[TextAnalysis.normalize]] first and call [[shinglesOfNorm]].
    */
  def shingles(text: Column, k: Int = 5): Column =
    shinglesOfNorm(TextAnalysis.normalize(text), k)

  /** 60-bit base hash of a shingle via md5 (hex → bigint). Reference
    * formulation — the hot path hashes whole arrays in one pass via
    * [[graft.functions.Md5Longs]]; this scalar form defines the arithmetic
    * both must match (and the DuckDB oracle mirrors).
    */
  def baseHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Affine universal-hash parameters over the Mersenne field 2^31-1,
    * generated from a fixed seed so Spark and the oracle agree.
    */
  final case class HashParams(a: Long, b: Long)
  val Mersenne31 = 2147483647L

  def hashParams(n: Int, seed: Long = 42L): Seq[HashParams] = {
    val rng = new java.util.Random(seed)
    Seq.fill(n) {
      HashParams(1 + math.abs(rng.nextLong()) % (Mersenne31 - 1), math.abs(rng.nextLong()) % Mersenne31)
    }
  }

  /** Shared stage: (doc_id, hs) — distinct-shingle 60-bit md5 hashes of the
    * normalized text, shared by the batch MinHash ladder and the
    * incremental path so the two can never drift.
    *
    * The length prefilter runs on the RAW text column: it is cheap and
    * pushes down to the scan, while a filter on the normalized length would
    * ALSO push down (Catalyst substitutes projections into predicates and
    * pushes through Repartition) and run the normalize regex serially below
    * the fan-out exchange. The 3x slack covers the rare case-mapping
    * expansions of `lower()` (e.g. İ → i + combining dot), so the filter is
    * a strict superset of the normalized-length guard; docs whose
    * NORMALIZED text is still shorter than k get an empty shingle set and a
    * per-doc sentinel band bucket downstream — never a candidate.
    */
  private[ext] def shingleHashes(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = docs
    .filter(length(col(textCol)) * 3 >= k)
    .select(col(idCol).as("doc_id"), TextAnalysis.normalize(col(textCol)).as("t"))
    .select(col("doc_id"),
      GraftFunctions.md5Longs(shinglesOfNorm(col("t"), k), digits = 15).as("hs"))

  /** Shared stage: (doc_id, band, bucket) MinHash band rows from a
    * [[shingleHashes]] frame; empty/null signatures get per-doc sentinel
    * buckets (singletons — they can never become candidates).
    */
  private[ext] def minhashBandRows(
      sh: DataFrame, params: Seq[HashParams], bands: Int, rowsPerBand: Int): DataFrame =
    bandRowsOfSig(minhashSigFrame(sh, params), bands, rowsPerBand)

  /** (doc_id, sig) — the signature stage alone, so a caller sweeping BAND
    * GROUPINGS of one signature (the [[lshParameterSweep]] report) can pay
    * for the affine-min kernel once and re-bucket cheaply.
    */
  private[ext] def minhashSigFrame(sh: DataFrame, params: Seq[HashParams]): DataFrame =
    sh.select(col("doc_id"),
      GraftFunctions.minhashSig(col("hs"),
        params.map(_.a), params.map(_.b), Mersenne31).as("sig"))

  /** (doc_id, band, bucket) from a (doc_id, sig) frame; empty/null
    * signatures get per-doc sentinel buckets (singletons — never
    * candidates).
    */
  private[ext] def bandRowsOfSig(
      withSig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val buckets = array((0 until bands).map { b =>
      md5(concat_ws(",", (0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r)): _*))
    }: _*)
    val sentinel = array((0 until bands).map(b =>
      concat(lit(s"e$b:"), col("doc_id").cast("string"))): _*)
    withSig.select(col("doc_id"),
      posexplode(when(col("sig").isNotNull, buckets).otherwise(sentinel))
        .as(Seq("band", "bucket")))
  }

  /** Guard for caller-supplied staged BAND relations: the band frame's
    * max(band)+1 must equal the banding the call's meta/fresh path assumes —
    * a sketch persisted at a different grouping would otherwise hash
    * arrivals into buckets that can never collide with the stored rows,
    * i.e. silently find nothing. One small aggregate over two pruned int
    * columns (parquet-backed staged relations never materialize shingle
    * arrays for this); an empty staged frame is vacuously accepted (there
    * is nothing to mis-bucket). k and rowsPerBand are NOT derivable from
    * the band rows (buckets are md5 digests), so they remain the caller's
    * contract — DedupSpec's staged≡fresh asserts cover the in-repo callers.
    */
  private def requireStagedBanding(
      bandRows: DataFrame, bands: Int, caller: String): Unit = {
    val r = bandRows.agg(max(col("band"))).head()
    if (!r.isNullAt(0)) {
      val got = r.getInt(0) + 1
      require(got == bands,
        s"$caller: staged band rows span $got bands but the call expects " +
          s"$bands — the staged sketch was built at different knobs")
    }
  }

  /** Guard for caller-supplied staged SIGNATURE relations: every signature
    * must have exactly bands×rowsPerBand minhashes, or re-bucketing at the
    * call's grouping reads past/short of the stored array. Same cost shape
    * as [[requireStagedBanding]] (one small aggregate, arrays stay columnar).
    */
  private def requireStagedSigLen(
      sig: DataFrame, totalLen: Int, caller: String): Unit = {
    val r = sig.agg(min(size(col("sig"))), max(size(col("sig")))).head()
    if (!r.isNullAt(0))
      require(r.getInt(0) == totalLen && r.getInt(1) == totalLen,
        s"$caller: staged signatures have ${r.getInt(0)}..${r.getInt(1)} " +
          s"hashes but the call expects $totalLen (bands x rowsPerBand)")
  }

  /** Banded LSH candidate pairs + Jaccard verification.
    *
    * 100 TB shape (each stage pays its cost exactly once):
    *
    *   1. md5 is computed ONCE per shingle (`hs = baseHash % P`), then the
    *      bands×rows affine maps run over the cheap long array;
    *   2. all band buckets come from ONE evaluation of the signature
    *      pipeline, `posexplode`d into (band, bucket) rows — no per-band
    *      union branches re-running the scan;
    *   3. candidate generation is payload-free: only (doc_id, band, bucket)
    *      reaches the shuffle. Pairs are enumerated inside each bucket via
    *      groupBy + collect_list + a pair-comprehension HOF (one shuffle,
    *      signature pipeline evaluated once); the full shingle sets are
    *      fetched by doc_id re-join ONLY for surviving candidate pairs.
    *
    * A pathologically large bucket (16 agreeing minhashes) means the docs in
    * it are near-identical, so its O(m²) pairs are inherent to the OUTPUT,
    * not an artifact of the plan.
    *
    * @param bands       number of LSH bands
    * @param rowsPerBand signature rows hashed into each band bucket
    * @param threshold   Jaccard cutoff for the verify stage
    */
  def minhashNearDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {

    val params = hashParams(bands * rowsPerBand)

    // (doc_id, sh): evaluated by the signature pipeline, and re-joined by
    // doc_id at verify time for surviving pairs only.
    //
    val shingled = shingleHashes(docs, idCol, textCol, k)

    // one-pass kernels: md5 once per shingle, then all 16 affine mins in a
    // single sweep of the long array (codegen'd — see [[graft.functions]];
    // shared with the incremental path via [[minhashBandRows]])
    val bandRows = minhashBandRows(shingled, params, bands, rowsPerBand)

    nearDupsFromRelations(bandRows, shingled, threshold)
  }

  /** Near-dup pairs from PRECOMPUTED sketch relations — the candidate +
    * verify tail of [[minhashNearDups]] (which funnels through here, so
    * the paths cannot drift), split out for deployments that persist the
    * (doc_id, band, bucket) band rows and (doc_id, hs) shingle sets once
    * per corpus version ([[writeIndex]]'s relations) and re-run only the
    * bucketing + verify stages. `bandRows`/`shingled` must come from the
    * SAME corpus and sketch knobs (both are per-doc functions, so a
    * superset corpus restricted by a doc_id semi-join is also exact);
    * `shingled` may be a superset of `bandRows`' docs — the verify stage
    * looks up candidate ids only.
    */
  def nearDupsFromRelations(
      bandRows: DataFrame,
      shingled: DataFrame,
      threshold: Double = 0.5): DataFrame =
    bucketPairs(bandRows)
      .transform(verifyJaccard(_, shingled))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** Distinct (doc_a, doc_b), doc_a < doc_b, sharing at least one band
    * bucket — the candidate-generation stage of the banded LSH.
    */
  private[ext] def bucketPairs(bandRows: DataFrame): DataFrame = {
    // in-bucket pair enumeration: sort ids, emit (ids(i), ids(j)) for i < j
    val ids = array_sort(collect_list(col("doc_id")))
    val pairList = transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))), b =>
        struct(a.as("doc_a"), b.as("doc_b"))))
    // the bucket-list relation is tiny in BYTES but the pair explosion is
    // heavy in OUTPUT — AQE coalesces the groupBy shuffle by input size and
    // would run the enumeration on one partition; the explicit repartition
    // (REPARTITION_BY_NUM: AQE keeps it) spreads buckets across the cluster
    bandRows
      .groupBy("band", "bucket")
      .agg(ids.as("ids"))
      .filter(size(col("ids")) > 1)
      .repartition(bandRows.sparkSession.sparkContext.defaultParallelism)
      .select(explode(flatten(pairList)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .dropDuplicates("doc_a", "doc_b") // a pair can collide in several bands
  }

  /** (doc_a, doc_b, jaccard): true hash-space Jaccard for each candidate
    * pair — the verify stage. The pair is exploded to one row per side so
    * `shingled` is scanned ONCE (two per-side joins would each re-evaluate
    * the shingle pipeline over the full corpus); the conditional-first
    * regroup shuffles shingle arrays only for candidate rows, which are
    * few by construction.
    */
  private[ext] def verifyJaccard(candidates: DataFrame, shingled: DataFrame): DataFrame = {
    val sides = candidates
      .select(col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
    // candidate side is usually tiny (bucket-local near-dups) but its size
    // is DATA-dependent — a low threshold or duplicate-heavy corpus can blow
    // it up, so no forced broadcast hint: AQE converts the exchange to a
    // broadcast join at runtime when the side fits and degrades to a shuffle
    // join when it doesn't (a forced hint would OOM the driver instead).
    // This choice DEPENDS on AQE (spark.sql.adaptive.enabled, default true
    // since Spark 3.2): with AQE off the corpus-sized shingled relation
    // always shuffle-joins — a silent perf cliff, so re-enable AQE (or add
    // a broadcast hint at the call site when the candidate side is known
    // to be small) before running the dedup pipeline on a tuned-down cluster
    val paired = sides
      .join(shingled, Seq("doc_id"))
      .groupBy("doc_a", "doc_b")
      .agg(
        first(when(col("doc_id") === col("doc_a"), col("hs")), ignoreNulls = true).as("hs_a"),
        first(when(col("doc_id") === col("doc_b"), col("hs")), ignoreNulls = true).as("hs_b"))
    // Jaccard in hash space; array_intersect/array_union both return
    // DISTINCT elements, mirroring the oracle's list_distinct formulation
    val inter = size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
    val union = size(array_union(col("hs_a"), col("hs_b"))).cast("double")
    paired.withColumn("jaccard", round(inter / union, 4))
  }

  /** LSH band-configuration sweep: for each (bands, rowsPerBand) grouping
    * of ONE shared 16-hash signature, the measured candidate-pair count,
    * the true pairs among them (hash-space Jaccard ≥ threshold), and
    * integer-ppm precision — the empirical counterpart of the
    * 1−(1−s^r)^b collision curve, measured on the actual corpus before
    * committing a production banding (the q206 HLL-precision-sweep pattern
    * applied to the dedup ladder's main tuning knob).
    *
    * More bands/fewer rows (8×2) is the high-recall/low-precision end —
    * candidates explode; fewer bands/more rows (2×8) the opposite. The
    * report quantifies that trade on real data, where the theoretical
    * curve needs the (unknown) pair-similarity distribution.
    *
    * Scale/cost shape: the shingle and signature stages are computed once
    * and persisted (signature rows are |docs| × 16 longs); each config
    * re-buckets the SAME signatures — only the cheap md5-concat and the
    * candidate join rerun per config. Candidate COUNTS are exact, but the
    * Jaccard-verify tier — the only stage that moves shingle ARRAYS, and
    * quadratic-ish for the high-recall bandings this sweep exists to
    * expose (8×2 emits ~500× more candidates than 2×8 here) — runs on a
    * DETERMINISTIC hash-sample of each candidate set (md5 of the pair id,
    * so both engines sample the identical pairs), at a PER-CONFIG rate
    * sized inversely to the banding's expected collision volume (1/1,
    * 1/4, 1/64 at the defaults — the high-recall config is precisely the
    * one whose full verify would be quadratic); precision is reported
    * over the sample with its size published. The per-config
    * counts are 1-row aggregate actions (bounded driver reads); the
    * staged persists are released before return.
    */
  def lshParameterSweep(
      docs: DataFrame,
      configs: Seq[(Int, Int, Int)] = Seq((2, 8, 1), (4, 4, 4), (8, 2, 64)),
      k: Int = 5,
      threshold: Double = 0.5,
      staged: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val spark = docs.sparkSession
    require(configs.nonEmpty && configs.map(c => c._1 * c._2).distinct.size == 1,
      "all configs must group the same total signature length")
    require(configs.forall(_._3 >= 1), "sample modulus must be >= 1")
    val params = hashParams(configs.head._1 * configs.head._2)
    // `staged`: optional precomputed ([[shingleHashes]], [[minhashSigFrame]])
    // over the same docs/k/params — a persisted corpus sketch skips the
    // shingle + signature stages and the sweep re-buckets as usual
    val (shingled, sig) = staged match {
      case Some((sh, sg)) =>
        // loud contract check: a sketch persisted at a different signature
        // length would re-bucket garbage silently (see the guard's doc)
        requireStagedSigLen(sg, configs.head._1 * configs.head._2, "lshParameterSweep")
        (sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
          sg.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      case None =>
        val sh = shingleHashes(docs, "doc_id", "text", k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (sh, minhashSigFrame(sh, params)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
    try {
      val rows = configs.map { case (bands, rowsPerBand, sampleMod) =>
        val cand = bucketPairs(bandRowsOfSig(sig, bands, rowsPerBand))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val gate = expr(
            s"cast(conv(substring(md5(concat(doc_a, ':', doc_b)), 1, 15), 16, 10) AS bigint) % $sampleMod = 0")
          // candidate + sample counts fold in ONE pass over the cached pair
          // table (they were two count jobs); the Jaccard verify then runs
          // on the sampled slice only — two jobs per config, not three
          val counts = cand
            .agg(count(lit(1)).as("nc"),
              coalesce(sum(when(gate, 1L).otherwise(0L)), lit(0L)).as("ns"))
            .head()
          val (nCand, nSampled) = (counts.getLong(0), counts.getLong(1))
          val nTrue = verifyJaccard(cand.filter(gate), shingled)
            .filter(col("jaccard") >= threshold).count()
          val ppm = if (nSampled == 0) 0L else (1000000L * nTrue) / nSampled
          (bands, rowsPerBand, nCand, nSampled, nTrue, ppm)
        } finally cand.unpersist(false)
      }
      import spark.implicits._
      rows.toDF("bands", "rows_per_band", "n_candidates", "n_sampled",
        "n_true_sampled", "precision_ppm")
        .select(col("bands").cast("long"), col("rows_per_band").cast("long"),
          col("n_candidates"), col("n_sampled"), col("n_true_sampled"),
          col("precision_ppm"))
    } finally { sig.unpersist(false); shingled.unpersist(false) }
  }

  /** Store-backed-snapshot location for the iterative/staged operators: an
    * explicit `checkpointDir` wins; when absent, a deployment that has
    * called `sparkContext.setCheckpointDir` gets a fresh subdirectory
    * under that location (unique per call, so concurrent pipelines never
    * clobber each other's rounds) — store-backed snapshots with no code
    * change, mirroring `df.checkpoint()`'s resolution. `None` (no explicit
    * dir, no context dir) means executor-local `localCheckpoint` blocks.
    * Like reliable RDD checkpoints, a context-derived final snapshot is
    * not auto-deleted — it lives under the admin-chosen checkpoint
    * location with the same retention the deployment already applies.
    */
  private def resolveCheckpointDir(
      spark: org.apache.spark.sql.SparkSession,
      explicit: Option[String]): Option[String] =
    explicit.orElse(spark.sparkContext.getCheckpointDir.map(d =>
      s"${d.stripSuffix("/")}/graft-${java.util.UUID.randomUUID().toString.take(8)}"))

  /** Near-dup PAIRS → duplicate CLUSTERS: connected components by
    * alternating large-star / small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14), the step
    * that turns any pair-emitting tier (MinHash, SimHash, n-gram, cosine)
    * into dedup groups. Returns one row per node: (doc_id, cluster_id)
    * where cluster_id is the smallest doc id in the component (singletons
    * cluster as themselves).
    *
    * Scale shape: each round is two groupBy-min + two joins, all
    * shuffle-partitioned on the node id — no adjacency lists, no
    * collect_list, the driver only orchestrates (one convergence COUNT per
    * round, no data collected). Unlike one-hop min-label propagation
    * (O(component diameter) rounds — a 10k-doc duplicate CHAIN needs 10k
    * rounds), star contraction halves tree heights every round and
    * converges in O(log n) rounds regardless of component shape, so
    * `maxIters` = 50 covers any corpus that fits in storage. Only the
    * pair-touched subset of the corpus enters the fixpoint; every node
    * absent from the edge list is trivially its own cluster and is joined
    * back after.
    *
    * Each round is snapshotted to truncate lineage (otherwise analysis +
    * codegen grow quadratically with rounds). The snapshot store resolves
    * via [[resolveCheckpointDir]]: an explicit `checkpointDir` wins; a
    * cluster that has called `sparkContext.setCheckpointDir` (the normal
    * 100 TB deployment posture) gets store-backed rounds under that
    * location with NO code change; only when neither is set do rounds fall
    * back to `localCheckpoint` (executor-local blocks — right for local
    * mode, lost-executor risk on a real cluster). Store-backed rounds are
    * written as PARQUET and read back — a reliable snapshot a lost
    * executor replays from. Parquet rounds
    * rather than `df.checkpoint()` deliberately: reliable RDD checkpoints
    * are never reclaimed by the ContextCleaner (up to `maxIters`
    * corpus-scale snapshots would accumulate) and `setCheckpointDir`
    * mutates global SparkContext state. Superseded rounds are deleted as
    * soon as the next lands; the FINAL round's files back the returned
    * (lazy) frame, so the caller owns the directory's lifecycle and cleans
    * it after consuming the result. Standalone callers should therefore
    * pass an EXPLICIT `checkpointDir` they can clean; the context-derived
    * default mainly serves [[dedupCorpus]], which materializes the keeper
    * ids and then deletes the surviving round itself.
    */
  def duplicateClusters(
      nodes: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxIters: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = nodes.sparkSession
    val snapDir = resolveCheckpointDir(spark, checkpointDir)

    var roundId = 0
    def snap(df: DataFrame): (DataFrame, Option[String]) = snapDir match {
      case None => (df.localCheckpoint(), None)
      case Some(dir) =>
        val path = s"${dir.stripSuffix("/")}/cc_round_$roundId"
        roundId += 1
        df.write.mode("overwrite").parquet(path)
        (spark.read.parquet(path), Some(path))
    }
    def drop(path: Option[String]): Unit = path.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    }

    // canonical directed edges, larger id → smaller id; materialized once so
    // the rounds never re-run the pair-producing pipeline (e.g. the full
    // MinHash chain)
    var (edges, edgesPath) = snap(pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())

    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // large-star: every node links its LARGER neighbors to the minimum of
      // its closed neighborhood. Directionality invariant: emitted (v, m)
      // always has m <= u < v.
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val afterLarge = sym.filter(col("v") > col("u"))
        .join(lsMin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: every node re-links its smaller neighbors (and itself)
      // to the minimum among them — on (big → small) edges that is one
      // groupBy-min + one relink join
      val ssMin = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val (next, nextPath) = snap(afterLarge.join(ssMin, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(ssMin.select(col("u"), col("m").as("v")))
        .distinct())
      // fixed point = identical edge set; both sides are distinct, so rows
      // seen once in the bag union are the symmetric difference (one action)
      val diff = next.unionByName(edges).groupBy("u", "v").count()
        .filter(col("count") === 1).count()
      // the superseded round is dead once the diff has read it: parquet
      // rounds are deleted here (reliable checkpoints would accumulate);
      // localCheckpoint blocks are RDD-owned and reclaimed by the
      // ContextCleaner once unreachable
      drop(edgesPath)
      converged = diff == 0
      edges = next
      edgesPath = nextPath
      iter += 1
    }
    // silent non-convergence would return plausible-but-split clusters; the
    // caller bounds the rounds, so failing loudly is the only safe contract
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters did not converge within $maxIters rounds — " +
          "star contraction needs O(log n) rounds, so this is a bug or a " +
          "pathological input; raise maxIters only after inspecting the pairs")
    // at the fixed point every component is a star centered at its minimum:
    // non-center nodes appear exactly once as u, centers only as v
    nodes.select(col(idCol))
      .join(edges.select(col("u").as(idCol), col("v").as("lab")), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("lab"), col(idCol)).as("cluster_id"))
  }

  /** One-call corpus dedup: exact dedup, then MinHash near-dup pairs over
    * the exact keepers, then connected components, keeping the minimum-id
    * document per cluster. The composed form of the ladder a training-data
    * pipeline actually runs; every stage is the operator verified
    * individually (q20/q21/q27), and the composition has its own oracle
    * (q28).
    *
    * Cache lifecycle: the exact-dedup boundary is persisted only for the
    * DURATION of this call (it feeds the MinHash chain twice, the cluster
    * fixpoint's node set, and the keeper filter — five lazy re-evaluations
    * without it) and is released before returning; the keeper-id set — one
    * id column, the only thing the later stages actually decided — is
    * snapshotted instead, and the returned frame re-derives the exact tier
    * once (a single shuffle) when the caller materializes it. A long
    * bench/verify JVM therefore never carries a corpus-sized pinned cache
    * from one query into the next.
    *
    * `checkpointDir` (defaulting like [[duplicateClusters]] from the
    * context's checkpoint location) additionally switches the keeper
    * snapshot and the fixpoint rounds from executor-local blocks to
    * store-backed parquet for lost-executor replay on a real cluster.
    *
    * `staged`: optional PRECOMPUTED (shingled, bandRows) sketch relations
    * ([[shingleHashes]] / [[minhashBandRows]] at this call's `k`/banding,
    * over a SUPERSET of `docs` — both are per-doc functions, so a doc_id
    * semi-join restricts them exactly). A corpus-version pipeline persists
    * these once ([[writeIndex]]) and every downstream dedup pass skips
    * re-shingling the corpus; decisions are bit-identical to the inline
    * derivation (asserted staged-vs-fresh in DedupSpec).
    */
  def dedupCorpus(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.5,
      checkpointDir: Option[String] = None,
      staged: Option[(DataFrame, DataFrame)] = None): DataFrame =
    dedupCore(docs, idCol, textCol, checkpointDir) { (exact, keepIds) =>
      staged match {
        case Some((sh, bandRows)) =>
          // the fresh path below runs minhashNearDups at its defaults
          // (k=5, 4x4) — a staged sketch at another banding would yield
          // silently different dedup decisions, so fail loudly instead
          requireStagedBanding(bandRows, bands = 4, "dedupCorpus")
          nearDupsFromRelations(
            bandRows.join(keepIds, Seq("doc_id"), "left_semi"), sh, threshold)
        case None =>
          minhashNearDups(exact, idCol, textCol, threshold = threshold)
      }
    }

  /** [[dedupCorpus]] served from PERSISTED verified pairs — the deepest
    * tier of the corpus-version staging ladder ([[writeIndex]] persists the
    * sketch; a pipeline that also persists the verified `(doc_a, doc_b,
    * jaccard)` pair set per corpus version skips candidate bucketing AND
    * Jaccard verification on every downstream pass, re-running only the
    * exact tier and the cluster fixpoint). `pairs` must be the
    * [[nearDupsFromRelations]] output over a SUPERSET of `docs` at this
    * call's sketch knobs and at a threshold ≤ `threshold` (pair Jaccards
    * are per-pair constants, so the superset restricted by the two-sided
    * keeper semi-join plus the `>= threshold` re-filter is exactly the
    * inline derivation — asserted staged-vs-fresh in DedupSpec, including
    * on a filtered-subset corpus, the q102 shape). A pairs relation from
    * DIFFERENT sketch knobs cannot be detected here (banding is not
    * recoverable from verified pairs), so the contract is on the caller —
    * persist pairs next to the sketch that produced them, as
    * [[writeIndex]] does for its relations.
    */
  def dedupCorpusFromPairs(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.5,
      checkpointDir: Option[String] = None): DataFrame =
    dedupCore(docs, idCol, textCol, checkpointDir) { (_, keepIds) =>
      pairs.filter(col("jaccard") >= threshold)
        .join(keepIds.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
        .join(keepIds.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
    }

  /** Shared composition core of the corpus-dedup tiers: exact tier →
    * near-dup pairs over the exact keepers (supplied by the tier) →
    * cluster fixpoint → minimum-id keeper join. `pairsOf(exact, keepIds)`
    * receives the persisted exact frame and its one-column id relation
    * (named `doc_id`) and returns the verified pair relation restricted to
    * those keepers.
    */
  private def dedupCore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      checkpointDir: Option[String])(
      pairsOf: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val exact = exactDedup(docs, idCol, textCol).persist()
    try {
      val snapDir = resolveCheckpointDir(spark, checkpointDir)
      val pairs = pairsOf(exact, exact.select(col(idCol).as("doc_id")))
      // the fixpoint rounds go into a PER-INVOCATION subdirectory: the
      // post-materialization sweep below must only ever delete rounds THIS
      // call created — a sibling duplicateClusters/dedupCorpus sharing the
      // same explicit checkpoint dir may still be backing an unconsumed
      // result with its own final round
      val ccDir = snapDir.map(d =>
        s"${d.stripSuffix("/")}/cc-${java.util.UUID.randomUUID().toString.take(8)}")
      // eager: every fixpoint round materializes, so `clusters` scans the
      // final round's snapshot, not the pair pipeline
      val clusters =
        duplicateClusters(exact, pairs, idCol, checkpointDir = ccDir)
      val keeperIds = clusters
        .filter(col("cluster_id") === col(idCol)).select(col(idCol))
      snapDir match {
        case None => exact.join(keeperIds.localCheckpoint(), idCol)
        case Some(dir) =>
          val p = s"${dir.stripSuffix("/")}/keepers"
          keeperIds.write.mode("overwrite").parquet(p)
          // this invocation's rounds are dead once the keeper ids are
          // materialized — delete them so a checkpoint location retains
          // only the id-sized keepers file, not a corpus-sized edge set
          ccDir.foreach { cc =>
            val hp = new org.apache.hadoop.fs.Path(cc)
            hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
          }
          exact.join(spark.read.parquet(p), idCol)
      }
    } finally exact.unpersist()
  }

  /** Incremental dedup: clean a NEW batch against an EXISTING corpus — the
    * production shape (each crawl dedups against everything already kept,
    * not against itself from scratch). Two tiers, mirroring the batch
    * ladder:
    *
    *   1. exact: anti-join on the normalized fingerprint — new docs whose
    *      text already exists are dropped (one shuffle on the md5 key);
    *   2. near-dup: MinHash band buckets of the surviving new docs joined
    *      against the band buckets of the existing corpus; candidates are
    *      verified with hash-space Jaccard, and a new doc with ANY
    *      at-or-above-threshold match in the existing corpus is dropped.
    *
    * This form derives the existing side's relations inline; at 100 TB
    * recomputing the corpus fingerprints/bands per batch is the dominant
    * cost, so write them ONCE per corpus version with [[writeIndex]] and
    * probe with [[dedupAgainstIndex]] — both funnel into the same core, so
    * the paths cannot drift. Near-dups WITHIN the new batch are out of
    * scope by design — run [[dedupCorpus]] on the batch first.
    */
  def dedupAgainst(
      newDocs: DataFrame,
      existing: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val existingFp = existing
      .select(TextAnalysis.md5Fingerprint(col(textCol)).as("__fp")).distinct()
    val shOld = shingleHashes(existing, idCol, textCol, k)
    val oldBands = minhashBandRows(shOld, hashParams(bands * rowsPerBand), bands, rowsPerBand)
    dedupAgainstRelations(
      newDocs, existingFp, oldBands, shOld, idCol, textCol, k, bands, rowsPerBand, threshold)
  }

  /** Write the dedup INDEX of a corpus version: the three relations the
    * incremental probe needs — distinct exact fingerprints, MinHash band
    * rows, and per-doc shingle-hash sets — plus a `meta` sidecar pinning
    * the sketch parameters (a probe with different knobs would silently
    * find nothing; the sidecar makes it fail loudly instead).
    *
    * Written once per corpus version, read by every subsequent batch: the
    * per-batch cost becomes proportional to the BATCH (its own shingling +
    * a bucket equi-join against parquet), not the corpus. All three
    * relations are plain columnar parquet — bucket-join pushdown and column
    * pruning apply as usual.
    */
  def writeIndex(
      existing: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      staged: Option[(DataFrame, DataFrame)] = None): Unit = {
    val spark = existing.sparkSession
    import spark.implicits._
    existing
      .select(TextAnalysis.md5Fingerprint(col(textCol)).as("__fp")).distinct()
      .write.mode("overwrite").parquet(s"$path/fingerprints")
    staged match {
      // precomputed (shingled, bandRows) at THIS call's k/banding over a
      // superset of `existing` — per-doc functions, so the doc_id semi-join
      // restricts them exactly and the index writes skip re-shingling
      case Some((sh0, bands0)) =>
        // the meta sidecar below is stamped with THIS call's k/bands/rows —
        // staged band rows at another banding would write a corrupt index
        // (probes hash arrivals with meta params that don't match the
        // stored bands), so validate the derivable half of the contract
        requireStagedBanding(bands0, bands, "writeIndex")
        val ids = existing.select(col(idCol).as("doc_id"))
        sh0.join(ids, Seq("doc_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$path/shingles")
        bands0.join(ids, Seq("doc_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$path/bands")
      case None =>
        // shingles feed both their own relation and the band rows — persist
        // so the shingling pipeline runs once, not per sink
        val sh = shingleHashes(existing, idCol, textCol, k).persist()
        sh.write.mode("overwrite").parquet(s"$path/shingles")
        minhashBandRows(sh, hashParams(bands * rowsPerBand), bands, rowsPerBand)
          .write.mode("overwrite").parquet(s"$path/bands")
        sh.unpersist()
    }
    Seq((k, bands, rowsPerBand)).toDF("k", "bands", "rows_per_band")
      .coalesce(1).write.mode("overwrite").json(s"$path/meta")
  }

  /** Append newly ACCEPTED documents to a [[writeIndex]] corpus index —
    * the maintenance half of streaming/incremental corpus dedup: each
    * accepted batch extends the fingerprints, shingles and band rows (all
    * parquet `append`, no rewrite of the existing index), so the NEXT
    * batch dedups against everything admitted so far. Sketch parameters
    * come from the index's own meta sidecar — an appender can never mix
    * bandings. The mirror of [[Similarity.appendToIvfIndex]] on the dedup
    * side.
    */
  def appendToIndex(
      accepted: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val spark = accepted.sparkSession
    val meta = spark.read.json(s"$path/meta").collect().head
    val (k, bands, rowsPerBand) = (
      meta.getAs[Long]("k").toInt,
      meta.getAs[Long]("bands").toInt,
      meta.getAs[Long]("rows_per_band").toInt)
    // SEVER the lineage before the first write. The natural caller passes
    // dedupAgainstIndex's output straight in — a plan that READS this very
    // index. Spark invalidates path-dependent caches on each append
    // (CacheManager.recacheByPath), so without the checkpoint the first
    // append (fingerprints) silently RE-DERIVES `accepted` against the
    // half-updated index — the batch then dedups against its own
    // fingerprints and appends EMPTY shingle/band relations. Caught by the
    // q233 gate: batch 2 stopped seeing batch 1's admissions.
    val acc = accepted.localCheckpoint()
    acc.select(TextAnalysis.md5Fingerprint(col(textCol)).as("__fp")).distinct()
      .write.mode("append").parquet(s"$path/fingerprints")
    val sh = shingleHashes(acc, idCol, textCol, k).persist()
    sh.write.mode("append").parquet(s"$path/shingles")
    minhashBandRows(sh, hashParams(bands * rowsPerBand), bands, rowsPerBand)
      .write.mode("append").parquet(s"$path/bands")
    sh.unpersist()
  }

  /** Incremental dedup probing a [[writeIndex]]-persisted corpus index —
    * identical semantics to [[dedupAgainst]] (asserted in DedupSpec), with
    * the existing side read from parquet instead of recomputed. Sketch
    * parameters come from the index's own meta sidecar.
    */
  def dedupAgainstIndex(
      newDocs: DataFrame,
      indexPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    val meta = spark.read.json(s"$indexPath/meta").collect().head
    val (k, bands, rowsPerBand) = (
      meta.getAs[Long]("k").toInt,
      meta.getAs[Long]("bands").toInt,
      meta.getAs[Long]("rows_per_band").toInt)
    dedupAgainstRelations(
      newDocs,
      spark.read.parquet(s"$indexPath/fingerprints"),
      spark.read.parquet(s"$indexPath/bands"),
      spark.read.parquet(s"$indexPath/shingles"),
      idCol, textCol, k, bands, rowsPerBand, threshold)
  }

  /** One streaming ingest step against a [[writeIndex]] corpus index:
    * probe (identical decisions to [[dedupAgainstIndex]] — same tiers,
    * same relations) AND append the survivors to the index
    * ([[appendToIndex]] semantics), fused so the batch is shingled ONCE
    * and the meta sidecar is read once — the probe's tier-2 shingle stage
    * IS the appended shingle/band source, where the two-call form pays
    * the whole shingling pipeline a second time inside appendToIndex.
    *
    * Ordering discipline: the survivors and their shingles are
    * localCheckpoint-severed BEFORE the first append (the
    * [[appendToIndex]] lineage hazard — an un-severed plan re-derives
    * against the half-updated index and admits a batch against its own
    * fingerprints). The returned frame is the checkpointed survivor
    * snapshot, safe to write after the appends.
    */
  def ingestAgainstIndex(
      newDocs: DataFrame,
      indexPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    val meta = spark.read.json(s"$indexPath/meta").collect().head
    val (k, bands, rowsPerBand) = (
      meta.getAs[Long]("k").toInt,
      meta.getAs[Long]("bands").toInt,
      meta.getAs[Long]("rows_per_band").toInt)
    val params = hashParams(bands * rowsPerBand)
    // tier 1 — keep __fp: the fingerprint append below reuses it instead of
    // re-hashing the accepted texts
    val exactSurvivors = newDocs
      .withColumn("__fp", TextAnalysis.md5Fingerprint(col(textCol)))
      .join(spark.read.parquet(s"$indexPath/fingerprints"),
        Seq("__fp"), "left_anti")
    // the ONE shingling of the batch: probe candidates, Jaccard verify, and
    // both appended relations all ride this snapshot
    val shNew = shingleHashes(exactSurvivors, idCol, textCol, k).localCheckpoint()
    val candidates = minhashBandRows(shNew, params, bands, rowsPerBand)
      .withColumnRenamed("doc_id", "new_id")
      .join(spark.read.parquet(s"$indexPath/bands")
        .withColumnRenamed("doc_id", "old_id"), Seq("band", "bucket"))
      .select("new_id", "old_id")
      .dropDuplicates("new_id", "old_id")
    val dropped = candidates
      .join(shNew.select(col("doc_id").as("new_id"), col("hs").as("hs_new")), Seq("new_id"))
      .join(spark.read.parquet(s"$indexPath/shingles")
        .select(col("doc_id").as("old_id"), col("hs").as("hs_old")), Seq("old_id"))
      .withColumn("jaccard",
        round(size(array_intersect(col("hs_new"), col("hs_old"))).cast("double")
          / size(array_union(col("hs_new"), col("hs_old"))).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id").as(idCol)).distinct()
    val survivors = exactSurvivors.join(dropped, Seq(idCol), "left_anti")
      .localCheckpoint()
    val shAcc = shNew
      .join(survivors.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    survivors.select(col("__fp")).distinct()
      .write.mode("append").parquet(s"$indexPath/fingerprints")
    shAcc.write.mode("append").parquet(s"$indexPath/shingles")
    minhashBandRows(shAcc, params, bands, rowsPerBand)
      .write.mode("append").parquet(s"$indexPath/bands")
    survivors.drop("__fp")
  }

  /** Shared core of [[dedupAgainst]] / [[dedupAgainstIndex]]: tier-1 exact
    * anti-join + tier-2 banded candidates + hash-space Jaccard verify, with
    * the existing side abstracted to its three relations.
    */
  private def dedupAgainstRelations(
      newDocs: DataFrame,
      existingFp: DataFrame,
      oldBands: DataFrame,
      oldShingles: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      bands: Int,
      rowsPerBand: Int,
      threshold: Double): DataFrame = {

    // tier 1: exact fingerprint anti-join
    val exactSurvivors = newDocs
      .withColumn("__fp", TextAnalysis.md5Fingerprint(col(textCol)))
      .join(existingFp, Seq("__fp"), "left_anti")
      .drop("__fp")

    // tier 2: MinHash bands of survivors vs bands of the existing corpus —
    // the same shingleHashes/minhashBandRows pipeline as the batch ladder,
    // so the two paths cannot drift
    val params = hashParams(bands * rowsPerBand)
    val shNew = shingleHashes(exactSurvivors, idCol, textCol, k)
    val candidates = minhashBandRows(shNew, params, bands, rowsPerBand)
      .withColumnRenamed("doc_id", "new_id")
      .join(oldBands.withColumnRenamed("doc_id", "old_id"), Seq("band", "bucket"))
      .select("new_id", "old_id")
      .dropDuplicates("new_id", "old_id")
    val verified = candidates
      .join(shNew.select(col("doc_id").as("new_id"), col("hs").as("hs_new")), Seq("new_id"))
      .join(oldShingles.select(col("doc_id").as("old_id"), col("hs").as("hs_old")), Seq("old_id"))
      .withColumn("jaccard",
        round(size(array_intersect(col("hs_new"), col("hs_old"))).cast("double")
          / size(array_union(col("hs_new"), col("hs_old"))).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id").as(idCol)).distinct()

    exactSurvivors.join(verified, Seq(idCol), "left_anti")
  }

  // ---------------- benchmark decontamination ----------------

  /** Benchmark decontamination: drop training docs sharing at least
    * `minHits` DISTINCT word n-grams with ANY document of an evaluation /
    * benchmark set — the standard guard against test-set leakage into
    * training corpora (the n-gram-overlap method used by public LLM data
    * pipelines), distinct from dedup: one benchmark doc may contaminate
    * thousands of training docs that are no near-duplicates of each other.
    *
    * 100 TB shape: the benchmark side collapses to its DISTINCT n-gram set
    * — eval suites are tiny relative to a training corpus, so AQE
    * broadcasts it and the contaminated-id scan is map-side over the
    * training n-gram explode; only (t_id, matched-ngram) pairs — hits, not
    * the corpus — reach the count-distinct shuffle, and the final drop is a
    * left-anti join on ids.
    */
  def decontaminate(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      minHits: Int = 2): DataFrame = {
    val contaminated = contaminatedIds(train, benchmark, idCol, textCol, n, minHits)
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** The flag form of [[decontaminate]]: (id, hits) per contaminated
    * training doc — for auditing what would be dropped and why.
    */
  def contaminationReport(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      minHits: Int = 2): DataFrame =
    contaminatedHits(train, benchmark, idCol, textCol, n)
      .filter(col("hits") >= minHits)

  private def contaminatedIds(
      train: DataFrame, benchmark: DataFrame, idCol: String, textCol: String,
      n: Int, minHits: Int): DataFrame =
    contaminatedHits(train, benchmark, idCol, textCol, n)
      .filter(col("hits") >= minHits)
      .select(col(idCol))

  private def contaminatedHits(
      train: DataFrame, benchmark: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val tN = train.select(col(idCol),
        explode(wordNgrams(col(textCol), n)).as("__ng"))
    val bN = benchmark.select(explode(wordNgrams(col(textCol), n)).as("__ng")).distinct()
    tN.join(bN, "__ng")
      .groupBy(idCol)
      .agg(countDistinct(col("__ng")).as("hits"))
  }

  // ---------------- SimHash ----------------

  /** 48-bit md5-derived hash per whitespace token, one pass
    * ([[graft.functions.Md5Longs]], digits=12).
    */
  def tokenHashes(text: Column): Column =
    GraftFunctions.md5Longs(TextAnalysis.tokens(text), digits = 12)

  /** SimHash sketch from a pre-hashed token column: per bit b, sum ±1
    * weighted by token-hash bit b; bit set iff the sum is >= 0. Per-doc, no
    * shuffle, one codegen'd pass over the array
    * ([[graft.functions.SimHashPack]] — vs 48 interpreted `aggregate`
    * passes in the HOF formulation it replaces).
    */
  def simhashOfHashes(th: Column, bits: Int = 48): Column =
    GraftFunctions.simhashPack(th, bits)

  /** Convenience form over raw text — hot paths should project
    * [[tokenHashes]] first and call [[simhashOfHashes]] on the column.
    */
  def simhash(text: Column, bits: Int = 48): Column =
    simhashOfHashes(tokenHashes(text), bits)

  /** SimHash near-dup pairs: docs whose sketches agree on one of the
    * quarter-blocks (standard Hamming-block LSH) and whose full Hamming
    * distance is <= maxHamming.
    *
    * Same 100 TB shape as [[minhashNearDups]]: the sketch pipeline is
    * evaluated ONCE (the 4 12-bit blocking keys are posexploded from a
    * single pass, not per-block union branches), and in-bucket pairs are
    * enumerated via groupBy + pair HOF, carrying only (doc_id, 48-bit
    * sketch) — so no shuffle ever sees the token arrays.
    */
  def simhashNearDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 8): DataFrame = {

    val sk = docs
      .select(col(idCol).as("doc_id"), tokenHashes(col(textCol)).as("th"))
      .select(col("doc_id"), simhashOfHashes(col("th")).as("sk"))
    // 4 blocking keys: 12-bit slices — classic simhash blocking; recall is
    // tuned by block count and both engines (Spark + oracle) apply the same
    // blocking, so the pair set stays integer-exact. NULL sketches (null
    // text) get per-doc sentinel keys: groupBy groups nulls TOGETHER, so a
    // corpus with many null-text rows would otherwise pair them O(m²) in
    // the key=null bucket (same guard as the minhash sentinel buckets).
    val blockArr = array((0 until 4).map(q => shiftright(col("sk"), q * 12) % 4096L): _*)
    val sentinelArr = array((0 until 4).map(q =>
      -(col("doc_id") * 4 + lit(q)) - 1): _*)
    val blocks = sk.select(col("doc_id"), col("sk"),
      posexplode(when(col("sk").isNotNull, blockArr).otherwise(sentinelArr))
        .as(Seq("q", "key")))

    val items = array_sort(collect_list(struct(col("doc_id"), col("sk"))))
    val pairList = transform(col("items"), (a, i) =>
      transform(slice(col("items"), i + lit(2), size(col("items"))), b =>
        struct(
          a.getField("doc_id").as("doc_a"), b.getField("doc_id").as("doc_b"),
          a.getField("sk").as("sk_a"), b.getField("sk").as("sk_b"))))
    // same AQE-vs-output-heavy-explosion consideration as in
    // [[minhashNearDups]]: spread the bucket lists before enumerating pairs.
    //
    // De-duplication of pairs colliding in SEVERAL blocks is a map-side
    // FILTER, not a shuffle: both sketches ride the pair, so "keep the pair
    // only in its first colliding block" (no block q' < q also matches) is
    // a cheap expression — near-identical docs collide in all 4 blocks and
    // a dropDuplicates would shuffle ~4x the distinct-pair volume.
    val firstCollidingBlock = (0 until 3).map { qq =>
      (col("q") <= qq) ||
        (shiftright(col("sk_a"), qq * 12) % 4096L =!= shiftright(col("sk_b"), qq * 12) % 4096L)
    }.reduce(_ && _)
    blocks
      .groupBy("q", "key")
      .agg(items.as("items"))
      .filter(size(col("items")) > 1)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("q"), explode(flatten(pairList)).as("p"))
      .select(col("q"), col("p.doc_a"), col("p.doc_b"), col("p.sk_a"), col("p.sk_b"))
      .filter(firstCollidingBlock)
      .withColumn("hamming", bit_count(col("sk_a").bitwiseXOR(col("sk_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  // ---------------- cross-document line dedup ----------------

  /** C4-style cross-document LINE dedup: every duplicate occurrence of a
    * line across the whole corpus is removed except the first (ordered by
    * (id, line position)), and each document is reassembled from its
    * surviving lines in original order. The classic boilerplate killer —
    * repeated headers/footers/navigation chrome vanish corpus-wide while
    * each document keeps its unique content. Documents whose every line
    * was seen earlier disappear from the output (C4 drops empty docs).
    *
    * Scale shape: the keeper per line value is `groupBy(line).min(doc,
    * pos)` — partial aggregation collapses a boilerplate line's millions
    * of occurrences map-side BEFORE the shuffle, so a hot line costs one
    * row per input partition, not one reducer-bound row per occurrence (a
    * `row_number` window over the line key would ship every occurrence to
    * one task). The join back is a same-key equi-join; payloads are the
    * line text plus two longs. Reassembly sorts each doc's surviving
    * (pos, line) pairs per row — per-document work, no extra shuffle
    * beyond the groupBy on the id.
    *
    * Returns (idCol, n_lines_kept, rebuilt) — rebuilt is the surviving
    * text joined with `lineSep`.
    */
  def dedupLinesAcross(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      lineSep: String = "\n"): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(lineSep)))
        .as(Seq("__ln", "line")))
    val keepers = lines
      .groupBy("line")
      .agg(min(struct(col(idCol), col("__ln"))).as("__k"))
    val kept = lines.join(keepers, "line")
      .filter(col(idCol) === col(s"__k.$idCol") && col("__ln") === col("__k.__ln"))
    kept.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines_kept"),
        concat_ws(lineSep,
          transform(array_sort(collect_list(struct(col("__ln"), col("line")))),
            s => s.getField("line"))).as("rebuilt"))
  }

  /** BATCH windowed dedup — the bounded-horizon analogue of the streaming
    * tier's `dropDuplicatesWithinWatermark` gate ([[graft.streaming
    * .CdcStream.dedupStream]]) and the backfill path that must agree with
    * it: a row is a duplicate iff its PREDECESSOR with the same fingerprint
    * is at most `gapUs` older; once the prior occurrence has aged past the
    * gap the content is re-admitted (exactly what watermark-evicted state
    * does on the streaming side). Plain exact dedup keeps one row per
    * fingerprint FOREVER — wrong for event/telemetry feeds where "the same
    * action again next week" is a fresh observation, not a duplicate.
    *
    * Predecessor semantics (lag-based, not last-KEPT-based): each row
    * compares against the nearest earlier occurrence, so a steady drumbeat
    * of sub-gap repeats collapses to its first row per quiet period — the
    * same outcome the streaming gate produces when state keeps refreshing
    * within the watermark. Ties on `tsUs` break by `tieCol` ascending; the
    * earlier-ordered row survives.
    *
    * Scale shape: one shuffle on the fingerprint; the window partition is
    * one fingerprint's occurrence chain (duplicate count, not corpus size),
    * so the hottest key costs its duplicate chain only. No global order,
    * no state beyond the window sort.
    */
  def dedupWithinGap(
      df: DataFrame,
      fp: Column,
      tsUs: Column,
      gapUs: Long,
      tie: Column): DataFrame = {
    require(gapUs >= 0, "gap must be non-negative")
    require(!df.columns.contains("__fp") && !df.columns.contains("__prev"),
      "input already has a working column (__fp/__prev)")
    val w = Window.partitionBy(col("__fp")).orderBy(tsUs.asc, tie.asc)
    df.withColumn("__fp", fp)
      .withColumn("__prev", lag(tsUs, 1).over(w))
      .filter(col("__prev").isNull || tsUs - col("__prev") > gapUs)
      .drop("__fp", "__prev")
  }

  // ---------------- content-defined chunking ----------------

  /** Content-defined chunking (CDC) over normalized word tokens: a chunk
    * boundary falls AFTER every token whose 60-bit md5 hash is ≡ 0 mod
    * `boundaryMod`, so the expected chunk length is `boundaryMod` tokens
    * and — the property fixed-size chunking lacks — every boundary
    * decision depends only on the token under it. An insertion or deletion
    * reshapes the one chunk it lands in (and at most its successor when it
    * adds/removes a boundary token); every other chunk re-fingerprints
    * byte-identically, so chunk-level dedup catches shared runs between
    * document VERSIONS and incremental crawl snapshots that whole-document
    * fingerprints miss entirely (the LBFS principle — Muthitacharoen et
    * al., SOSP 2001 — applied to corpus text).
    *
    * Returns one row per (doc, chunk): id, `extraCols`, chunk_idx,
    * n_tokens, and `fp` = md5 of the chunk's space-joined token run.
    * Chunk-level dedup downstream is tier-1 machinery: a hash groupBy on
    * `fp`, with all the [[exactGroups]] scale properties.
    *
    * Scale shape: posexplode is map-side; ONE shuffle on the id orders
    * each document's tokens for the running boundary count (a per-doc
    * prefix sum — never a global window); the (doc, chunk) contraction
    * rides the same partitioning. Per-chunk state is `boundaryMod`-bounded
    * in expectation; no all-pairs anywhere.
    */
  def cdcChunks(
      docs: DataFrame,
      boundaryMod: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
      extraCols: Seq[String] = Seq("source")): DataFrame = {
    require(boundaryMod >= 2, "boundaryMod must be >= 2 (1 would split every token)")
    val keep = (idCol +: extraCols).map(col)
    val toks = docs
      .select(keep :+ posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "term")): _*)
      .filter(col("term") =!= "")
    // boundary AFTER a matching token ⇒ a token's chunk counts only the
    // boundaries strictly BEFORE it: an exclusive running sum
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("__b", (baseHash(col("term")) % boundaryMod === 0).cast("long"))
      .withColumn("chunk_idx", coalesce(sum(col("__b")).over(w), lit(0L)))
      .groupBy(keep :+ col("chunk_idx"): _*)
      .agg(
        count(lit(1)).as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("term")))),
            x => x.getField("term")), " ")).as("fp"))
  }

  // ---------------- n-gram Jaccard ----------------

  /** Distinct word n-grams over an ALREADY-TOKENIZED column (space-joined,
    * first-occurrence order; fewer than n tokens ⇒ empty) — the one-pass
    * codegen'd [[graft.functions.WordNgrams]].
    */
  def wordNgramsOfToks(toks: Column, n: Int = 3): Column =
    GraftFunctions.wordNgrams(toks, n)

  /** Convenience form over raw text — hot paths should project
    * [[TextAnalysis.tokens]] first and call [[wordNgramsOfToks]].
    */
  def wordNgrams(text: Column, n: Int = 3): Column =
    wordNgramsOfToks(TextAnalysis.tokens(text), n)

  /** Pairwise n-gram Jaccard within a deterministic blocking window:
    * candidates share `blockCols` and sit within `window` ids of each other.
    *
    * The id window is part of the JOIN KEY, not a post-join filter: ids are
    * bucketed at `window` granularity (`id div window`) and the left side
    * probes its own and the next bucket — any pair with
    * `1 <= doc_b - doc_a <= window` lands in exactly one probe (the id
    * bucket is monotone and advances by at most one per `window` ids), so
    * no dedup is needed and candidate generation is O(rows × bucket
    * population), never O(block²), even when one `blockCols` value
    * dominates the corpus.
    */
  /** Bounded EDIT-DISTANCE near-dup pairs — the character-level fuzzy tier
    * below n-gram Jaccard (catches transpositions/typos that shingle sets
    * blur). Same (block, id-window) bucketing as every pair tier, so
    * candidates stay O(rows × window).
    *
    * The O(|a|·|b|) dynamic program is evaluated EXACTLY ONCE per
    * length-plausible candidate: the join carries only constant-time
    * predicates (bucket equality, id window, and the
    * `abs(length(a)-length(b)) <= maxDist` lower bound — the same guard the
    * [[graft.plans.LevenshteinPrefilter]] rule injects when the DP sits in a
    * predicate), and `levenshtein` itself runs inside a map-side partial
    * aggregate keyed on the (unique) pair. Putting the DP in a filter OR a
    * post-filter projection evaluates it twice — Catalyst's predicate
    * pushdown re-inlines a projected alias into the join condition, so the
    * aggregate is the barrier that makes single evaluation stick; the bound
    * then filters on the aggregated `dist`, which cannot be pushed below the
    * aggregate. Cost at scale: the extra exchange carries (keys, int) rows —
    * the partial aggregate fully collapses map-side because pairs are unique
    * — which is noise next to the DP it halves.
    * (The rule stays installed via
    * [[graft.functions.GraftFunctions.registerOptimizations]] here, or the
    * `GraftExtensions` session extension in a configured deployment, and
    * still guards ad-hoc `levenshtein <= k` predicates users write.)
    */
  def editDistancePairs(
      docs: DataFrame,
      blockCols: Seq[String],
      maxDist: Int = 50,
      idCol: String = "doc_id",
      textCol: String = "text",
      window: Long = 200L): DataFrame = {
    graft.functions.GraftFunctions.registerOptimizations(docs.sparkSession)
    val base = docs.select(
      (blockCols.map(col) :+ col(idCol).as("doc_id") :+
        TextAnalysis.normalize(col(textCol)).as("t")): _*)
    val a = base.toDF(blockCols ++ Seq("doc_a", "t_a"): _*)
      .withColumn("id_bucket",
        explode(array(expr(s"doc_a div $window"), expr(s"doc_a div $window + 1"))))
    val b = base.toDF(blockCols ++ Seq("doc_b", "t_b"): _*)
      .withColumn("id_bucket", expr(s"doc_b div $window"))
    a.join(b, blockCols :+ "id_bucket")
      .filter((col("doc_b") - col("doc_a")).between(lit(1), lit(window)))
      .filter(abs(length(col("t_a")) - length(col("t_b"))) <= maxDist)
      .groupBy((blockCols.map(col) :+ col("doc_a") :+ col("doc_b")): _*)
      // the BANDED 3-arg form: O((2k+1)·n) instead of O(n·m) per pair —
      // for k ≪ |doc| this is the dominant cost of the whole tier cut by
      // |doc|/(2k+1). Distances ≤ maxDist come back exact (so survivors
      // are value-identical to the unbounded DP the oracle replays);
      // beyond the band it short-circuits to −1, excluded by the filter.
      .agg(min(levenshtein(col("t_a"), col("t_b"), maxDist)).as("dist"))
      .filter(col("dist").between(0, maxDist))
  }

  def ngramJaccardPairs(
      docs: DataFrame,
      blockCols: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      window: Long = 200L): DataFrame = {

    val base = docs
      .select(
        (blockCols.map(col) :+ col(idCol).as("doc_id") :+
          TextAnalysis.tokens(col(textCol)).as("toks")): _*)
      .select(
        (blockCols.map(col) :+ col("doc_id") :+ wordNgramsOfToks(col("toks"), n).as("ng")): _*)
    val a = base.toDF(blockCols ++ Seq("doc_a", "ng_a"): _*)
      .withColumn("id_bucket",
        explode(array(expr(s"doc_a div $window"), expr(s"doc_a div $window + 1"))))
    val b = base.toDF(blockCols ++ Seq("doc_b", "ng_b"): _*)
      .withColumn("id_bucket", expr(s"doc_b div $window"))
    val inter = size(array_intersect(col("ng_a"), col("ng_b"))).cast("double")
    val union = size(array_union(col("ng_a"), col("ng_b"))).cast("double")
    a.join(b, blockCols :+ "id_bucket")
      .filter((col("doc_b") - col("doc_a")).between(lit(1), lit(window)))
      .withColumn("jaccard", round(inter / union, 4))
      .select((blockCols.map(col) :+ col("doc_a") :+ col("doc_b") :+ col("jaccard")): _*)
  }

  /** Asymmetric n-gram CONTAINMENT pairs — quote / partial-duplicate
    * detection, the directional statistic Jaccard hides: a short document
    * fully quoted inside a long one has C(short→long) ≈ 1 while the
    * symmetric Jaccard is tiny. `C(A→B) = |A∩B| / |A|` over DISTINCT
    * word n-grams; both directions ride one candidate pair as integer
    * basis points (10⁴·∩ div |side| — no float, zero-denominator rows
    * excluded by the non-empty filter).
    *
    * Candidate generation is [[ngramJaccardPairs]]'s blocked id-window
    * join verbatim — never all-pairs; the containment arithmetic is the
    * only delta.
    */
  def ngramContainmentPairs(
      docs: DataFrame,
      blockCols: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      window: Long = 200L): DataFrame = {

    val base = docs
      .select(
        (blockCols.map(col) :+ col(idCol).as("doc_id") :+
          TextAnalysis.tokens(col(textCol)).as("toks")): _*)
      .select(
        (blockCols.map(col) :+ col("doc_id") :+
          array_distinct(wordNgramsOfToks(col("toks"), n)).as("ng")): _*)
      .filter(size(col("ng")) > 0)
    val a = base.toDF(blockCols ++ Seq("doc_a", "ng_a"): _*)
      .withColumn("id_bucket",
        explode(array(expr(s"doc_a div $window"), expr(s"doc_a div $window + 1"))))
    val b = base.toDF(blockCols ++ Seq("doc_b", "ng_b"): _*)
      .withColumn("id_bucket", expr(s"doc_b div $window"))
    a.join(b, blockCols :+ "id_bucket")
      .filter((col("doc_b") - col("doc_a")).between(lit(1), lit(window)))
      .withColumn("inter", size(array_intersect(col("ng_a"), col("ng_b"))).cast("long"))
      .select((blockCols.map(col) :+ col("doc_a") :+ col("doc_b") :+
        expr("(10000 * inter) div size(ng_a)").as("cont_ab_4") :+
        expr("(10000 * inter) div size(ng_b)").as("cont_ba_4")): _*)
  }

  /** EXACT token-set similarity join via PREFIX FILTERING (Chaudhuri et
    * al.'s SSJoin / the PPJoin family's core filter) — every pair with
    * Jaccard ≥ `tNum/tDen` over DISTINCT normalized tokens, with its exact
    * similarity in ppm. The third tier of the pair ladder: the id-window
    * blocks (q23/q184) bound WHICH pairs are comparable, MinHash LSH (q21)
    * finds likely pairs with banding false negatives — prefix filtering is
    * EXACT with no window assumption: if Jaccard(A,B) ≥ t, then A and B
    * MUST share a token among each one's (sz − ⌈t·sz⌉ + 1) RAREST tokens
    * (if all prefix tokens missed, the intersection is confined to the
    * suffixes, too small to reach t) — so joining on prefix tokens alone
    * loses nothing, and rarest-first ordering makes the join fan-out
    * df-bounded instead of stopword-bounded.
    *
    * All threshold math is integer cross-multiplication (`tDen·inter ≥
    * tNum·union`, ⌈t·sz⌉ = (tNum·sz + tDen − 1) div tDen), so the pair
    * set and the ppm are hash-exact across engines.
    *
    * Scale shape: one token-keyed shuffle for df, one doc-keyed aggregate
    * to sorted token structs (no per-doc window — `sort_array` orders
    * (df, tok) inside the row), the candidate self-join keyed on PREFIX
    * tokens only (with the 5·min ≥ 3·max length filter killing
    * cross-size pairs before dedup), then a distinct on bare id pairs and
    * a probe-rejoin to fetch the two token arrays for the exact verify —
    * arrays never ride through the distinct.
    */
  def prefixFilterJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tNum: Long = 3L,
      tDen: Long = 5L): DataFrame = {
    require(tNum > 0 && tDen > tNum, "threshold must be a rational in (0,1)")
    val tokRows = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("tok"))
      .filter(col("tok") =!= "")
    val df = tokRows.groupBy("tok").agg(count(lit(1)).as("df"))
    val sorted = tokRows.join(df, "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("arr"))
      .withColumn("sz", size(col("arr")).cast("long"))
      .withColumn("toks", expr("transform(arr, x -> x.tok)"))
      .withColumn("p",
        col("sz") - expr(s"($tNum * sz + $tDen - 1) div $tDen") + 1)
      .select(col("doc_id"), col("sz"), col("toks"),
        expr("slice(toks, 1, int(p))").as("prefix"))
      .localCheckpoint() // feeds both candidate arms + the verify rejoin
    val pfx = sorted.select(col("doc_id"), col("sz"),
      explode(col("prefix")).as("ptok"))
    val cand = pfx.toDF("doc_a", "sz_a", "ptok")
      .join(pfx.toDF("doc_b", "sz_b", "ptok"), Seq("ptok"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("sz_a"), col("sz_b")) * tDen >=
          greatest(col("sz_a"), col("sz_b")) * tNum)
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sorted.select(col("doc_id").as("doc_a"), col("toks").as("ta"),
        col("sz").as("sa")), "doc_a")
      .join(sorted.select(col("doc_id").as("doc_b"), col("toks").as("tb"),
        col("sz").as("sb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select(col("doc_a"), col("doc_b"),
        expr("(1000000 * inter) div uni").as("jacc_ppm"))
  }

  // ---------------- exact substring (span-level) ----------------

  /** Exact duplicated-SPAN detection — the token-span tier of the ladder
    * (Lee, Ippolito, Nystrom, Zhang, Eck, Callison-Burch & Carlini,
    * "Deduplicating Training Data Makes Language Models Better", ACL 2022:
    * the ExactSubstr operator): duplicated runs of ≥ `minSpanTokens` tokens
    * INSIDE otherwise-unique documents, which the document tiers
    * (fingerprint / MinHash / SimHash) and the line tier
    * ([[dedupLinesAcross]]) both miss — boilerplate headers, licence
    * blocks, templated paragraphs repeated across a crawl.
    *
    * The paper builds one corpus-wide suffix array — inherently
    * sequential. The distributed formulation: every token position
    * contributes its k-token gram's 60-bit md5 hash; a gram occurring ≥ 2
    * times ANYWHERE in the corpus (including twice inside one document —
    * the paper counts self-repeats as duplication) marks its start
    * position; maximal runs of consecutive marked positions extend to
    * spans of `run_length + k − 1` tokens (gaps-and-islands). Every
    * duplicated substring of length ≥ k marks ALL its k-grams, so every
    * duplicated span of ≥ minSpanTokens (≥ k) is found exactly; a false
    * positive requires two DISTINCT grams to collide in the 60-bit hash —
    * negligible, and IDENTICAL in the DuckDB replay, so the oracle gate
    * stays hash-exact.
    *
    * Scale shape: |tokens| gram rows (narrow: id + int + long), produced
    * by ONE corpus scan that is checkpointed so both consumers share it;
    * the ≥2-occurrence mark is a map-side-combined `groupBy(gh).count ≥ 2`
    * contracted to distinct gram hashes BEFORE the shuffle, then a
    * `left_semi` join-back onto the checkpointed grams — the hottest gram
    * (at crawl scale, exactly the boilerplate gram the operator exists to
    * find) costs ~1 row per map task, never one reducer task per
    * occurrence; then a per-DOCUMENT window for the island merge
    * (partition = one document's marked positions, bounded by document
    * length) and one groupBy per (doc, island). No all-pairs step and no
    * global order anywhere.
    *
    * Returns one row per maximal duplicated span:
    * (idCol, span_start — 0-based token position, span_tokens).
    */
  def exactSubstrSpans(
      docs: DataFrame,
      k: Int = 8,
      minSpanTokens: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 2, "gram width k must be >= 2")
    require(minSpanTokens >= k, "minSpanTokens must be >= k (shorter spans are invisible)")
    val grams = tokenGrams(docs, k, idCol, textCol).localCheckpoint()
    spansFromMarked(markedDupGrams(grams, idCol), k, minSpanTokens, idCol)
  }

  /** Positions whose gram hash occurs ≥ 2 times in `grams` (the ExactSubstr
    * mark). Shape matters more than arithmetic here: a
    * `count.over(Window.partitionBy("gh"))` would shuffle every OCCURRENCE
    * row of the most frequent gram through the single reducer task owning
    * its hash — at 100 TB that gram is a licence header with hundreds of
    * millions of occurrences. The map-side-combined groupBy contracts each
    * gram to ~1 row per map task before the shuffle, and the `left_semi`
    * join-back rides the caller's checkpointed gram stage, so the
    * tokenize+explode lineage is not recomputed. Marked set is identical
    * to the window formulation (DedupSpec asserts bit-equality).
    */
  private def markedDupGrams(grams: DataFrame, idCol: String): DataFrame = {
    val dup = grams.groupBy("gh").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select("gh")
    grams.join(dup, Seq("gh"), "left_semi").select(col(idCol), col("pos"))
  }

  /** (idCol, pos, gh): every token position's k-gram 60-bit hash — the
    * shared gram stage of the batch ([[exactSubstrSpans]]) and incremental
    * ([[exactSubstrSpansAgainstIndex]]) paths, so the two can never drift.
    * Docs shorter than k tokens contribute nothing.
    */
  private def tokenGrams(
      docs: DataFrame, k: Int, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame =
    docs
      .select(col(idCol) +: carry.map(col) :+
        TextAnalysis.tokens(col(textCol)).as("__toks"): _*)
      .filter(size(col("__toks")) >= k)
      .select(col(idCol) +: carry.map(col) :+
        // two codegen'd one-pass kernels (positional k-grams, then md5
        // prefixes) — the per-position `transform(sequence, i =>
        // baseHash(array_join(slice(...))))` chain this replaces is a
        // CodegenFallback HOF whose interpreted slice+join+md5 per token
        // position was the measured hot path of every ExactSubstr query
        // (r14 q383 profile: the gram scan, not streaming machinery, was
        // the per-batch cost). Arithmetic is UNCHANGED: wordNgramsAll
        // shares array_join's skip-null join semantics and md5Longs IS
        // baseHash per element (parity asserted in DedupSpec)
        posexplode(GraftFunctions.md5Longs(
          GraftFunctions.wordNgramsAll(col("__toks"), k), digits = 15))
          .as(Seq("pos", "gh")): _*)

  /** Gaps-and-islands merge of marked gram START positions into maximal
    * duplicated spans — the shared tail of both ExactSubstr paths.
    */
  private def spansFromMarked(
      marked: DataFrame, k: Int, minSpanTokens: Int, idCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy("pos")
    marked
      .withColumn("__isl", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) - min(col("pos")) + k).cast("long").as("span_tokens"))
      .filter(col("span_tokens") >= minSpanTokens)
      .select(col(idCol), col("span_start"), col("span_tokens"))
  }

  /** Seed (overwrite) the ExactSubstr gram index at `path`: the DISTINCT
    * k-gram hashes of `docs`. Existence is all the incremental path needs
    * ("seen at least once before"), so the index is bounded by |distinct
    * grams|, not corpus occurrences.
    */
  def writeGramIndex(
      docs: DataFrame, path: String, k: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    tokenGrams(docs, k, idCol, textCol).select("gh").distinct()
      .write.mode("overwrite").parquet(path)

  /** Append a processed batch's distinct gram hashes to the index.
    * Duplicate gh rows across appends are harmless (the reader is a
    * semi-join), and a per-append distinct keeps growth bounded without a
    * full-index rewrite — the same append-only discipline as
    * [[appendToIndex]].
    */
  def appendGramIndex(
      docs: DataFrame, path: String, k: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    tokenGrams(docs, k, idCol, textCol).select("gh").distinct()
      .write.mode("append").parquet(path)

  /** Incremental ExactSubstr: duplicated spans of an ARRIVING batch
    * against everything already ingested — a batch position is marked iff
    * its gram exists in the index (seen in ANY earlier batch, including
    * the seed) OR occurs ≥ 2 times inside the batch itself; islands merge
    * exactly as in the batch path. One-pass semantics by construction:
    * the FIRST occurrence of a gram later duplicated by a future batch is
    * not retro-flagged (the paper's streaming approximation — re-running
    * [[exactSubstrSpans]] over the accumulated corpus is the batch
    * reconciliation), so results are arrival-order-dependent and the
    * oracle must replay the same batch split.
    *
    * Scale shape: one scan of the BATCH (never the corpus), the in-batch
    * ≥2 mark via the same map-side-combined groupBy + semi-join as the
    * batch path ([[markedDupGrams]]), a semi-join against the index (AQE
    * broadcasts it while small; at corpus scale it is a shuffle join on
    * gh — still |batch grams|-bounded work), the per-doc island merge.
    */
  def exactSubstrSpansAgainstIndex(
      batch: DataFrame,
      indexPath: String,
      k: Int = 8,
      minSpanTokens: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minSpanTokens >= k, "minSpanTokens must be >= k")
    val spark = batch.sparkSession
    val grams = tokenGrams(batch, k, idCol, textCol).localCheckpoint()
    val idx = spark.read.parquet(indexPath)
    val inIndex = grams.join(idx, Seq("gh"), "left_semi")
      .select(col(idCol), col("pos"))
    val inBatch = markedDupGrams(grams, idCol)
    val marked = inIndex.unionByName(inBatch).distinct()
    spansFromMarked(marked, k, minSpanTokens, idCol)
  }

  /** One streaming ingest step for ExactSubstr: detect the arriving
    * batch's duplicated spans against the index
    * ([[exactSubstrSpansAgainstIndex]] semantics, decision-for-decision)
    * AND append the batch's distinct grams ([[appendGramIndex]]), fused so
    * the tokenize+explode+hash gram stage runs ONCE per batch — the
    * two-call form pays it twice. The spans are localCheckpoint-pinned
    * BEFORE the index append: the detection semi-join must see the
    * pre-batch index state (un-pinned, the lazy plan would re-read the
    * grown index and flag the batch against its own grams).
    */
  def exactSubstrIngestBatch(
      batch: DataFrame,
      indexPath: String,
      k: Int = 8,
      minSpanTokens: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minSpanTokens >= k, "minSpanTokens must be >= k")
    val spark = batch.sparkSession
    val grams = tokenGrams(batch, k, idCol, textCol).localCheckpoint()
    val inIndex = grams
      .join(spark.read.parquet(indexPath), Seq("gh"), "left_semi")
      .select(col(idCol), col("pos"))
    val marked = inIndex.unionByName(markedDupGrams(grams, idCol)).distinct()
    val spans = spansFromMarked(marked, k, minSpanTokens, idCol).localCheckpoint()
    grams.select("gh").distinct().write.mode("append").parquet(indexPath)
    spans
  }

  /** Deterministic batch REPLAY of the incremental ExactSubstr fold: the
    * spans each batch of [[exactSubstrSpansAgainstIndex]] would emit given
    * arrival order `batchCol` (0 = the index seed, which emits nothing;
    * higher = later). A position is marked iff its gram was seen in ANY
    * strictly-earlier batch (index semantics) OR occurs ≥ 2 times inside
    * its own batch — exactly the per-batch rule, folded in one pass so an
    * oracle (or a reconciliation) can replay the stream without running it.
    *
    * Scale shape: one corpus scan to grams (checkpointed), one map-side-
    * combined groupBy to per-(gram, batch) counts, a window over gh whose
    * partitions hold ≤ |batches| COUNT rows (never occurrences — the
    * hottest gram is already contracted), a semi-join back on (gh, batch),
    * the per-doc island merge.
    */
  def exactSubstrSpansIncrementalReplay(
      docs: DataFrame,
      batchCol: Column,
      k: Int = 8,
      minSpanTokens: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minSpanTokens >= k, "minSpanTokens must be >= k")
    val grams = tokenGrams(docs.withColumn("__b", batchCol.cast("long")),
      k, idCol, textCol, carry = Seq("__b")).localCheckpoint()
    val perBatch = grams.groupBy("gh", "__b").agg(count(lit(1)).as("__n"))
    val dupKeys = perBatch
      .withColumn("__minb", min(col("__b")).over(Window.partitionBy("gh")))
      .filter(col("__b") > col("__minb") || col("__n") >= 2)
      .select("gh", "__b")
    val marked = grams.filter(col("__b") > 0)
      .join(dupKeys, Seq("gh", "__b"), "left_semi")
      .select(col(idCol), col("pos"))
    spansFromMarked(marked, k, minSpanTokens, idCol)
  }

  /** [[exactSubstrReconcile]] against the REPLAYED incremental fold, fused
    * onto ONE gram scan: the generic reconcile recomputes grams once for
    * the batch detection and once inside the replay, but when the
    * incremental side is itself a deterministic replay both marks derive
    * from the same per-(gram, batch) count table — the full-corpus ≥2 rule
    * is `Σ_b count ≥ 2` (a second map-side-combined fold over COUNTS, never
    * a second corpus scan) and the incremental rule is the min-batch /
    * in-batch test. Output and flag semantics identical to
    * `exactSubstrReconcile(docs, exactSubstrSpansIncrementalReplay(docs,
    * batchCol))` — DedupSpec asserts the equivalence.
    */
  def exactSubstrReconcileReplay(
      docs: DataFrame,
      batchCol: Column,
      k: Int = 8,
      minSpanTokens: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minSpanTokens >= k, "minSpanTokens must be >= k")
    val grams = tokenGrams(docs.withColumn("__b", batchCol.cast("long")),
      k, idCol, textCol, carry = Seq("__b")).localCheckpoint()
    val perBatch = grams.groupBy("gh", "__b").agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val dupAll = perBatch.groupBy("gh").agg(sum("__n").as("__t"))
      .filter(col("__t") >= 2).select("gh")
    val full = spansFromMarked(
      grams.join(dupAll, Seq("gh"), "left_semi").select(col(idCol), col("pos")),
      k, minSpanTokens, idCol)
    val dupKeys = perBatch
      .withColumn("__minb", min(col("__b")).over(Window.partitionBy("gh")))
      .filter(col("__b") > col("__minb") || col("__n") >= 2)
      .select("gh", "__b")
    val inc = spansFromMarked(
      grams.filter(col("__b") > 0)
        .join(dupKeys, Seq("gh", "__b"), "left_semi")
        .select(col(idCol), col("pos")),
      k, minSpanTokens, idCol)
      .withColumn("__hit", lit(1L))
    full.join(inc, Seq(idCol, "span_start", "span_tokens"), "left")
      .withColumn("missed_by_stream",
        when(col("__hit").isNull, 1L).otherwise(0L))
      .drop("__hit")
  }

  /** ExactSubstr batch RECONCILIATION — the retro-flagging pass the
    * incremental tier's one-pass semantics defers (a gram's FIRST
    * occurrence, duplicated only by a later batch, is never flagged at
    * ingest): re-runs exact span detection over the ACCUMULATED corpus
    * ([[exactSubstrSpans]] — so the reconciled set is by construction the
    * batch-exact answer) and flags each span the incremental fold missed.
    * `missed_by_stream = 1` means no identical (id, start, tokens) row was
    * emitted at ingest — this covers both wholly-unseen spans (the first
    * occurrence) and spans the stream saw SHORTER (later marks extended
    * the island, so the batch-exact extent differs); downstream removal
    * must reprocess exactly these rows and no others.
    *
    * Scale shape: one full batch detection (its own shapes documented
    * there) plus a left join of two span tables — both tiny contractions
    * of the corpus, key = (id, start, tokens).
    */
  def exactSubstrReconcile(
      docs: DataFrame,
      incremental: DataFrame,
      k: Int = 8,
      minSpanTokens: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val full = exactSubstrSpans(docs, k, minSpanTokens, idCol, textCol)
    val inc = incremental
      .select(col(idCol), col("span_start"), col("span_tokens"))
      .distinct()
      .withColumn("__hit", lit(1L))
    full.join(inc, Seq(idCol, "span_start", "span_tokens"), "left")
      .withColumn("missed_by_stream",
        when(col("__hit").isNull, 1L).otherwise(0L))
      .drop("__hit")
  }
}
