package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * Zero UDFs: shingling, hashing and signatures are Catalyst higher-order
  * functions inside whole-stage codegen.
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

  // ---------------- MinHash + LSH ----------------

  /** Character k-shingles over an ALREADY-NORMALIZED column reference,
    * distinct. Guarded against short strings: Spark's `sequence(1, 0)`
    * DESCENDS ([1,0]), so the transform only runs when at least one shingle
    * exists.
    *
    * Callers must pass a cheap column (an attribute), not an expression
    * tree: anything passed here is embedded INSIDE the per-element lambda
    * and re-evaluated once per shingle — an inlined `normalize` turns
    * shingling into O(len² · regex) per document. Project the normalized
    * text first (Catalyst's CollapseProject keeps the projection because the
    * expensive producer is referenced more than once).
    */
  def shinglesOfNorm(t: Column, k: Int = 5): Column =
    when(length(t) >= k,
      array_distinct(
        transform(sequence(lit(1), length(t) - (k - 1)), i => t.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Convenience form over raw text — fine for one-off use; hot paths should
    * project [[TextAnalysis.normalize]] first and call [[shinglesOfNorm]].
    */
  def shingles(text: Column, k: Int = 5): Column =
    shinglesOfNorm(TextAnalysis.normalize(text), k)

  /** 60-bit base hash of a shingle via md5 (hex → bigint). */
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
    // doc_id at verify time for surviving pairs only. The normalized text is
    // its own projection so the regex runs once per doc, not once per
    // shingle (see [[shinglesOfNorm]]).
    val shingled = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.normalize(col(textCol)).as("t"))
      .filter(length(col("t")) >= k)
      .select(col("doc_id"), shinglesOfNorm(col("t"), k).as("sh"))

    // hash once per shingle; 16 affine maps over the long array
    val withSig = shingled
      .select(col("doc_id"), transform(col("sh"), s => baseHash(s) % Mersenne31).as("hs"))
      .select(
        col("doc_id"),
        array(params.map(p =>
          array_min(transform(col("hs"), h => (lit(p.a) * h + lit(p.b)) % Mersenne31))): _*).as("sig"))

    // one band-bucket array per doc, posexploded → (doc_id, band, bucket)
    val bandBuckets = array((0 until bands).map { b =>
      md5(concat_ws(",", (0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r)): _*))
    }: _*)
    val bandRows = withSig.select(col("doc_id"), posexplode(bandBuckets).as(Seq("band", "bucket")))

    // in-bucket pair enumeration: sort ids, emit (ids(i), ids(j)) for i < j
    val ids = array_sort(collect_list(col("doc_id")))
    val pairList = transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))), b =>
        struct(a.as("doc_a"), b.as("doc_b"))))
    val candidates = bandRows
      .groupBy("band", "bucket")
      .agg(ids.as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(pairList)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .dropDuplicates("doc_a", "doc_b") // a pair can collide in several bands

    // verify: true Jaccard on the distinct shingle sets. The pair is
    // exploded to one row per side so `shingled` is scanned ONCE (two
    // per-side joins would each re-evaluate the shingle pipeline over the
    // full corpus); the conditional-first regroup shuffles shingle arrays
    // only for candidate rows, which are few by construction.
    val sides = candidates
      .select(col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
    // broadcast the candidate side: the corpus-sized `shingled` relation then
    // never shuffles its arrays (if candidates outgrow broadcast range, the
    // dedup output itself is corpus-scale and an exchange is inherent)
    val paired = broadcast(sides)
      .join(shingled, Seq("doc_id"))
      .groupBy("doc_a", "doc_b")
      .agg(
        first(when(col("doc_id") === col("doc_a"), col("sh")), ignoreNulls = true).as("sh_a"),
        first(when(col("doc_id") === col("doc_b"), col("sh")), ignoreNulls = true).as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    paired
      .withColumn("jaccard", round(inter / union, 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ---------------- SimHash ----------------

  /** 48-bit md5-derived hash per whitespace token — project this ONCE, then
    * feed the resulting column to [[simhashOfHashes]]: the md5 runs once per
    * token instead of once per token per sketch bit.
    */
  def tokenHashes(text: Column): Column =
    transform(TextAnalysis.tokens(text), t => conv(substring(md5(t), 1, 12), 16, 10).cast("long"))

  /** 48-bit SimHash from a pre-hashed token column: per bit b, sum ±1
    * weighted by token-hash bit b; bit set iff the sum is >= 0. Per-doc,
    * no shuffle. `th` must be a cheap column reference — the 48 per-bit
    * aggregates each re-evaluate whatever expression is passed here.
    */
  def simhashOfHashes(th: Column, bits: Int = 48): Column = {
    val bitCols = (0 until bits).map { b =>
      val bitSum = aggregate(th, lit(0L),
        (acc, h) => acc + (shiftright(h, b) % 2L) * 2L - 1L)
      when(bitSum >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

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
    // blocking, so the pair set stays integer-exact.
    val blockArr = array((0 until 4).map(q => shiftright(col("sk"), q * 12) % 4096L): _*)
    val blocks = sk.select(col("doc_id"), col("sk"), posexplode(blockArr).as(Seq("q", "key")))

    val items = array_sort(collect_list(struct(col("doc_id"), col("sk"))))
    val pairList = transform(col("items"), (a, i) =>
      transform(slice(col("items"), i + lit(2), size(col("items"))), b =>
        struct(
          a.getField("doc_id").as("doc_a"), b.getField("doc_id").as("doc_b"),
          a.getField("sk").as("sk_a"), b.getField("sk").as("sk_b"))))
    blocks
      .groupBy("q", "key")
      .agg(items.as("items"))
      .filter(size(col("items")) > 1)
      .select(explode(flatten(pairList)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.sk_a"), col("p.sk_b"))
      .dropDuplicates("doc_a", "doc_b") // a pair can collide in several blocks
      .withColumn("hamming", bit_count(col("sk_a").bitwiseXOR(col("sk_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  // ---------------- n-gram Jaccard ----------------

  /** Word n-grams over an ALREADY-TOKENIZED column reference (guarded like
    * [[shinglesOfNorm]], and with the same inlining caveat: pass a cheap
    * column, or the tokenizer's regex re-runs once per n-gram).
    */
  def wordNgramsOfToks(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))

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
}
