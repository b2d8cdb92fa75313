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
  *      buckets → candidate pairs via a bucket equi-join → Jaccard verify.
  *      The join is on (band, bucket-hash), so at 100 TB candidates stay
  *      bucket-local: no quadratic blowup, skew bounded by bucket size;
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

  /** Character k-shingles of the normalized text, distinct. Guarded against
    * short strings: Spark's `sequence(1, 0)` DESCENDS ([1,0]), so the
    * transform only runs when at least one shingle exists.
    */
  def shingles(text: Column, k: Int = 5): Column = {
    val norm = TextAnalysis.normalize(text)
    when(length(norm) >= k,
      array_distinct(
        transform(sequence(lit(1), length(norm) - (k - 1)), i => norm.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

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

  /** MinHash signature: for each hash fn j, min over shingles of
    * `(a_j * (base % P) + b_j) % P`.
    */
  def minhashSignature(shingleArr: Column, params: Seq[HashParams]): Seq[Column] =
    params.map { p =>
      array_min(transform(shingleArr,
        s => (lit(p.a) * (baseHash(s) % Mersenne31) + lit(p.b)) % Mersenne31))
    }

  /** Banded LSH candidate pairs + Jaccard verification.
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
    val norm = TextAnalysis.normalize(col(textCol))

    val withSig = docs
      .filter(length(norm) >= k)
      .select(col(idCol).as("doc_id"), shingles(col(textCol), k).as("sh"))
      .withColumn("sig", array(minhashSignature(col("sh"), params): _*))

    // band buckets: bucket key = md5 of the band's signature slice
    val bandRows = (0 until bands).map { b =>
      withSig.select(
        col("doc_id"), col("sh"),
        lit(b).as("band"),
        md5(concat_ws(",", (0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r)): _*))
          .as("bucket"))
    }.reduce(_ unionAll _)

    // candidates: same (band, bucket); dedup pairs found in several bands
    val a = bandRows.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = bandRows.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val candidates = a
      .join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")

    // verify: true Jaccard on the distinct shingle sets
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    candidates
      .withColumn("jaccard", round(inter / union, 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ---------------- SimHash ----------------

  /** 48-bit SimHash over whitespace tokens: per bit b, sum ±1 weighted by
    * token-hash bit b; bit set iff the sum is >= 0. One pass, no shuffle.
    */
  def simhash(text: Column, bits: Int = 48): Column = {
    val toks = TextAnalysis.tokens(text)
    val hashes = transform(toks, t => conv(substring(md5(t), 1, 12), 16, 10).cast("long"))
    val bitCols = (0 until bits).map { b =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b) % 2L) * 2L - 1L)
      when(bitSum >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash near-dup pairs: docs whose sketches agree on one of the
    * quarter-blocks (standard Hamming-block LSH) and whose full Hamming
    * distance is <= maxHamming.
    */
  def simhashNearDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 8): DataFrame = {

    val sk = docs.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sk"))
    // 4 blocking keys: 12-bit slices — near-dups (<=8 differing bits over 48)
    // must agree on at least one slice by pigeonhole when distance <= 3·12/…;
    // classic simhash blocking, recall-tuned by block count.
    val blocks = (0 until 4).map { q =>
      sk.select(col("doc_id"), col("sk"), lit(q).as("q"),
        (shiftright(col("sk"), q * 12) % 4096L).as("key"))
    }.reduce(_ unionAll _)

    val a = blocks.select(col("q"), col("key"), col("doc_id").as("doc_a"), col("sk").as("sk_a"))
    val b = blocks.select(col("q"), col("key"), col("doc_id").as("doc_b"), col("sk").as("sk_b"))
    val hamming = (0 until 48)
      .map(i => ((shiftright(col("sk_a"), i) + shiftright(col("sk_b"), i)) % 2L).cast("int"))
      .reduce(_ + _)
    a.join(b, Seq("q", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  // ---------------- n-gram Jaccard ----------------

  /** Word n-grams of the normalized text (guarded like [[shingles]]). */
  def wordNgrams(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Pairwise n-gram Jaccard within a deterministic blocking window:
    * candidates share `blockCols` and sit within `window` ids of each other.
    * Blocking keeps the self-join linear (each row meets O(window) others) —
    * the 100 TB-safe shape for a verify tier.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCols: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      window: Long = 200L): DataFrame = {

    val base = docs.select(
      (blockCols.map(col) :+ col(idCol).as("doc_id") :+ wordNgrams(col(textCol), n).as("ng")): _*)
    val a = base.toDF(blockCols ++ Seq("doc_a", "ng_a"): _*)
    val b = base.toDF(blockCols ++ Seq("doc_b", "ng_b"): _*)
    val inter = size(array_intersect(col("ng_a"), col("ng_b"))).cast("double")
    val union = size(array_union(col("ng_a"), col("ng_b"))).cast("double")
    a.join(b, blockCols)
      .filter((col("doc_b") - col("doc_a")).between(lit(1), lit(window)))
      .withColumn("jaccard", round(inter / union, 4))
      .select((blockCols.map(col) :+ col("doc_a") :+ col("doc_b") :+ col("jaccard")): _*)
  }
}
