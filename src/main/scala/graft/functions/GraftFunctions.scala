package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Column-level API over the graft custom Catalyst expressions, plus SQL
  * registration (both as a [[SparkSessionExtensions]] hook for
  * `spark.sql.extensions=graft.functions.GraftExtensions` and as an
  * imperative `register(spark)` for sessions that already exist).
  */
object GraftFunctions {

  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)
  private def col(e: Expression): Column = GraftColumnBridge.column(e)

  /** Σᵢ aᵢ·bᵢ in double — codegen'd; accepts array<float|double>. */
  def vecDot(a: Column, b: Column): Column = col(VecDot(expr(a), expr(b)))

  /** L2 norm √(Σᵢ aᵢ²) — codegen'd; accepts array<float|double>. */
  def vecNorm(a: Column): Column = col(VecNorm(expr(a)))

  /** Per-element `conv(substring(md5(s),1,digits),16,10) % mod` in one pass. */
  def md5Longs(arr: Column, digits: Int, mod: Long = 0L): Column =
    col(Md5Longs(expr(arr), digits, mod))

  /** One-pass SimHash sketch over pre-hashed tokens. */
  def simhashPack(th: Column, bits: Int = 48): Column = col(SimHashPack(expr(th), bits))

  /** One-pass MinHash signature (affine family over field p). */
  def minhashSig(hs: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    col(MinHashSig(expr(hs), as, bs, p))

  /** Distinct character k-shingles, first-occurrence order, one pass. */
  def charShingles(t: Column, k: Int): Column = col(CharShingles(expr(t), k))

  /** Distinct word n-grams (space-joined), one pass. */
  def wordNgrams(toks: Column, n: Int): Column = col(WordNgrams(expr(toks), n))
  def wordNgramsAll(toks: Column, n: Int): Column =
    col(WordNgrams(expr(toks), n, distinct = false))

  /** Stopword-hit count against a fixed word list, one pass. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    col(StopwordCount(expr(toks), words))

  /** 8-bit scalar-quantization codes for (vec, mn, mx). */
  def vecSq8(v: Column, mn: Column, mx: Column): Column =
    col(VecSq8(expr(v), expr(mn), expr(mx)))

  /** Every stride-th byte of a binary column (media downsample stub). */
  def byteStride(bin: Column, stride: Int): Column = col(ByteStride(expr(bin), stride))

  /** Hilbert-curve index of (x, y) on the 2^bits grid ([[HilbertIndex]]). */
  def hilbertIndex(x: Column, y: Column, bits: Int = 16): Column =
    col(HilbertIndex(expr(x), expr(y), bits))

  /** Jaro-Winkler similarity in [0,1], codegen'd ([[JaroWinkler]]). */
  def jaroWinkler(a: Column, b: Column): Column = col(JaroWinkler(expr(a), expr(b)))

  /** Full Damerau-Levenshtein distance, codegen'd ([[DamerauLevenshtein]]). */
  def damerauLevenshtein(a: Column, b: Column): Column =
    col(DamerauLevenshtein(expr(a), expr(b)))

  /** Polynomial rolling hash over codepoints, one pass. */
  def polyRollingHash(t: Column, mult: Long = 31L, mod: Long = 1000000007L): Column =
    col(PolyRollingHash(expr(t), mult, mod))

  /** Spark's own Bloom-filter aggregate (the engine's runtime-join-filter
    * building block, not SQL-registered upstream) exposed as a Column: one
    * `binary` sketch of the xxhash64-hashed inputs. `numBits` fixes the
    * filter size (fpp ≈ (1-e^(-kn/m))^k); the aggregate merges partials
    * map-side like any TypedImperativeAggregate.
    */
  def bloomFilterAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    col(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      expr(hashed),
      org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Membership probe against a [[bloomFilterAgg]] sketch. Spark's type
    * check admits a constant OR a scalar subquery for the sketch side:
    * prefer `aggDf.scalar()` (the sketch rides the subquery result channel
    * to tasks — see [[graft.ext.BloomJoin]]); `lit(bytes)` re-embedding is
    * only safe for small sketches (≲ a few MB) because a plan-tree literal
    * is copied on every transformation and rendered in the UI.
    */
  def bloomMightContain(bloom: Column, hashed: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      expr(bloom), expr(hashed)))

  /** BOUNDED-STATE top-k aggregate: the k largest values of `e` (any
    * orderable type — use `struct(score, id)` for arg-ranking with a
    * deterministic tie-break) as an array. Wraps Spark's internal
    * `CollectTopK` (a `BoundedPriorityQueue` TypedImperativeAggregate that
    * upstream never SQL-registers) rather than reimplementing it — the
    * engine already has the exact machinery, it just doesn't expose it.
    *
    * Why it matters at scale: `row_number() OVER (PARTITION BY g ORDER BY
    * s) <= k` SORTS every group in full; this aggregate carries k elements
    * of state per group, merges heaps map-side, and ships k rows per
    * (partition, group) through the shuffle — the top-N-per-key operator a
    * 100 TB leaderboard actually wants. Output order is heap order —
    * callers wanting ranked output sort the k-element array (O(k log k),
    * driver-free).
    */
  def collectTopK(e: Column, k: Int, reverse: Boolean = false): Column =
    col(new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
      expr(e), k, reverse).toAggregateExpression())

  /** Spark's count-min-sketch aggregate (the frequency sibling of
    * [[bloomFilterAgg]]'s membership and HLL's cardinality) exposed as a
    * Column: one `binary` sketch answering point frequency queries with
    * `est ∈ [exact, exact + ε·N]` at `confidence`. Merges partials
    * map-side; the bytes deserialize via
    * `org.apache.spark.util.sketch.CountMinSketch.readFrom` — a bounded
    * model read (width·depth counters, data-size-independent). Fixed
    * `seed` ⇒ deterministic sketch for a given input multiset.
    */
  def countMinSketchAgg(e: Column, eps: Double, confidence: Double, seed: Int): Column =
    col(new org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg(
      expr(e),
      org.apache.spark.sql.catalyst.expressions.Literal(eps),
      org.apache.spark.sql.catalyst.expressions.Literal(confidence),
      org.apache.spark.sql.catalyst.expressions.Literal(seed))
      .toAggregateExpression())

  /** (name, info, builder) triples for every graft SQL function. */
  private[graft] def registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    def info(name: String, usage: String, clazz: Class[_]) =
      new ExpressionInfo(clazz.getName, null, name, usage, "")
    def intArg(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
    }
    Seq(
      (FunctionIdentifier("vec_dot"),
        info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays", classOf[VecDot]),
        (es: Seq[Expression]) => VecDot(es(0), es(1))),
      (FunctionIdentifier("vec_norm"),
        info("vec_norm", "vec_norm(a) - L2 norm of a float/double array", classOf[VecNorm]),
        (es: Seq[Expression]) => VecNorm(es(0))),
      (FunctionIdentifier("vec_cosine"),
        info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float/double arrays",
          classOf[VecDot]),
        (es: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.Divide(
            VecDot(es(0), es(1)),
            org.apache.spark.sql.catalyst.expressions.Multiply(VecNorm(es(0)), VecNorm(es(1))))),
      (FunctionIdentifier("simhash_pack"),
        info("simhash_pack", "simhash_pack(hashes, bits) - pack a SimHash sketch from token hashes",
          classOf[SimHashPack]),
        (es: Seq[Expression]) => SimHashPack(es(0), intArg(es(1), "bits"))),
      (FunctionIdentifier("char_shingles"),
        info("char_shingles", "char_shingles(text, k) - distinct character k-shingles",
          classOf[CharShingles]),
        (es: Seq[Expression]) => CharShingles(es(0), intArg(es(1), "k"))),
      (FunctionIdentifier("jaro_winkler"),
        info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]",
          classOf[JaroWinkler]),
        (es: Seq[Expression]) => JaroWinkler(es(0), es(1))),
      (FunctionIdentifier("damerau_levenshtein"),
        info("damerau_levenshtein",
          "damerau_levenshtein(a, b) - full Damerau-Levenshtein edit distance",
          classOf[DamerauLevenshtein]),
        (es: Seq[Expression]) => DamerauLevenshtein(es(0), es(1)))
    )
  }

  /** Register the SQL surface on an already-built session. */
  def register(spark: SparkSession): Unit = registry.foreach { case (ident, inf, builder) =>
    spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
  }

  /** Install the graft optimizer rules on an already-built session (the
    * extensions path does this at build time; `experimental` is the
    * documented session-mutable hook for existing sessions). Idempotent.
    */
  def registerOptimizations(spark: SparkSession): Unit = {
    val rules = Seq(graft.plans.LevenshteinPrefilter)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * graft SQL function surface and optimizer rules at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registry.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
  }
}
