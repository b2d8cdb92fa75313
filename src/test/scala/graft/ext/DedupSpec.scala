package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Dedup-ladder specs: output equivalence of the bucketed windowed-pair
  * plans against the naive quadratic shape, pair-set structural invariants,
  * and the scale-shape assertion that the id window is part of the join key.
  */
class DedupSpec extends SparkSpec {

  private def docs: DataFrame = Tables.documents(spark, Sf0001)
  private def embeds: DataFrame = Tables.embeddings(spark, Sf0001)

  test("ngramJaccardPairs joins on the id bucket (no block-quadratic join)") {
    val plan = Dedup
      .ngramJaccardPairs(docs, blockCols = Seq("lang", "source"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("id_bucket"), s"expected id_bucket in the join key:\n$plan")
  }

  test("ngramJaccardPairs equals the naive block-join + window filter") {
    val base = docs
      .select(col("lang"), col("source"), col("doc_id"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("lang"), col("source"), col("doc_id"),
        Dedup.wordNgramsOfToks(col("toks"), 3).as("ng"))
    val a = base.toDF("lang", "source", "doc_a", "ng_a")
    val b = base.toDF("lang", "source", "doc_b", "ng_b")
    val naive = a.join(b, Seq("lang", "source"))
      .filter((col("doc_b") - col("doc_a")).between(lit(1), lit(200)))
      .withColumn("jaccard",
        round(size(array_intersect(col("ng_a"), col("ng_b"))).cast("double")
          / size(array_union(col("ng_a"), col("ng_b"))).cast("double"), 4))
      .select("lang", "source", "doc_a", "doc_b", "jaccard")
    val fast = Dedup.ngramJaccardPairs(docs, blockCols = Seq("lang", "source"))
    assert(fast.count() === naive.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("editDistancePairs equals the naive block-join + bounded levenshtein") {
    val base = docs.select(col("lang"), col("doc_id"),
      TextAnalysis.normalize(col("text")).as("t"))
    val a = base.toDF("lang", "doc_a", "t_a")
    val b = base.toDF("lang", "doc_b", "t_b")
    val naive = a.join(b, Seq("lang"))
      .filter((col("doc_b") - col("doc_a")).between(lit(1), lit(200)))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b")))
      .filter(col("dist") <= 60)
      .select("lang", "doc_a", "doc_b", "dist")
    val fast = Dedup.editDistancePairs(docs, blockCols = Seq("lang"), maxDist = 60)
    assert(fast.count() > 0, "threshold too tight for the fixture — vacuous test")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("duplicateClusters: chain needs multiple rounds; components + singletons exact") {
    import spark.implicits._
    val nodes = (1L to 9L).toDF("doc_id")
    // chain 1-2-3-4-5 (diameter forces >1 propagation round), pair 7-8,
    // singletons 6 and 9
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("duplicateClusters: 300-node chain (diameter >> maxIters) still converges") {
    import spark.implicits._
    // one-hop min-label propagation needs diameter rounds and would throw at
    // maxIters=50 here; star contraction needs O(log n)
    val nodes = (1L to 300L).toDF("doc_id")
    val pairs = (1L until 300L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 300)
    assert(got.forall(_._2 == 1L), "all chain nodes must label to the component min")
  }

  test("duplicateClusters: reliable checkpointDir path matches localCheckpoint path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    try {
      val nodes = (1L to 9L).toDF("doc_id")
      val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
      val got = Dedup.duplicateClusters(nodes, pairs, checkpointDir = Some(dir.toString))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(
        1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
        6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
      // superseded round snapshots must be deleted as the fixpoint advances —
      // only the final round (backing the returned frame) may remain
      import scala.jdk.CollectionConverters._
      val rounds = java.nio.file.Files.list(dir).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("cc_round_")).toSeq
      assert(rounds.size === 1, s"superseded rounds not cleaned: $rounds")
    } finally rmTree(dir)
  }

  test("dedupAgainstIndex over a persisted index equals the inline dedupAgainst") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx")
    try {
      val existing = docs.filter(col("doc_id") < 250)
      val batch = docs.filter(col("doc_id") >= 250)
      Dedup.writeIndex(existing, dir.toString)
      val viaIndex = Dedup.dedupAgainstIndex(batch, dir.toString)
      val inline = Dedup.dedupAgainst(batch, existing)
      assert(viaIndex.count() > 0)
      assert(viaIndex.exceptAll(inline).isEmpty && inline.exceptAll(viaIndex).isEmpty)
    } finally rmTree(dir)
  }

  test("dedupCorpus: composition matches hand-built ladder; no pinned cache survives") {
    spark.catalog.clearCache()
    val got = Dedup.dedupCorpus(docs)
    assert(got.count() > 0)
    // the staged exact-dedup persist must be released by the time the
    // caller has materialized the result — a long bench/verify JVM must not
    // carry a corpus-sized InMemoryRelation from one query into the next
    assert(spark.sharedState.cacheManager.isEmpty,
      "dedupCorpus leaked a cached plan past its own lifecycle")
    val exact = Dedup.exactDedup(docs)
    val clusters =
      Dedup.duplicateClusters(exact, Dedup.minhashNearDups(exact, threshold = 0.5))
    val expected = exact.join(
      clusters.filter(col("cluster_id") === col("doc_id")).select("doc_id"), "doc_id")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("dedupLinesAcross: first occurrence wins corpus-wide, docs reassemble in order") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "alpha\nboiler\nbeta"),
      (2L, "boiler\ngamma\nalpha"), // boiler+alpha already seen → only gamma survives
      (3L, "boiler")                // fully duplicate doc → dropped entirely
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLinesAcross(fixture)
      .select("doc_id", "n_lines_kept", "rebuilt")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, 3L, "alpha\nboiler\nbeta"),
      (2L, 1L, "gamma")))
  }

  test("dedupCorpus with a checkpoint dir keeps only the keeper snapshot") {
    withTempDir("graft-dcorp") { dir =>
      import scala.jdk.CollectionConverters._
      val got = Dedup.dedupCorpus(docs, checkpointDir = Some(dir.toString))
      assert(got.count() > 0)
      val names = java.nio.file.Files.list(dir).iterator().asScala
        .map(_.getFileName.toString).toSeq
      assert(names.contains("keepers"), s"keeper snapshot missing: $names")
      assert(!names.exists(_.startsWith("cc")),
        s"dead fixpoint rounds not cleaned: $names")
    }
  }

  test("decontaminate equals the naive distinct-ngram-overlap formulation") {
    import spark.implicits._
    val train = docs.filter(col("doc_id") >= 50)
    val bench = docs.filter(col("doc_id") < 50)
    val got = Dedup.decontaminate(train, bench).select("doc_id")
    val tN = train.select(col("doc_id"),
      explode(Dedup.wordNgrams(col("text"), 3)).as("ng"))
    val bGrams = bench.select(explode(Dedup.wordNgrams(col("text"), 3)).as("ng"))
      .distinct().as[String].collect().toSet
    val bad = tN.filter(col("ng").isin(bGrams.toSeq: _*))
      .groupBy("doc_id").agg(countDistinct("ng").as("h"))
      .filter(col("h") >= 2).select("doc_id")
    val expected = train.select("doc_id").exceptAll(bad)
    assert(got.count() > 0 && got.count() < train.count(),
      "fixture must actually drop some contaminated docs")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // and the report names only dropped docs, with hit counts >= threshold
    val report = Dedup.contaminationReport(train, bench)
    assert(report.select(min(col("hits"))).head.getLong(0) >= 2L)
    assert(report.count() === train.count() - got.count())
  }

  test("minhashNearDups at threshold 0 (candidate explosion) completes unforced") {
    // every banded candidate survives verification at threshold 0 — the
    // data-dependent blow-up case the forced-broadcast hint used to risk;
    // AQE must be free to pick a shuffle join here
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.0).collect()
    assert(pairs.nonEmpty)
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("minhashNearDups emits each pair once, ordered, above threshold") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5).collect()
    assert(pairs.nonEmpty)
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length, "duplicate candidate pair emitted")
    pairs.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b, s"pair not ordered: ($a,$b)")
      assert(j >= 0.5 && j <= 1.0, s"bad jaccard ($a,$b,$j)")
    }
  }

  test("minhash banding is a strict superset filter: pairs agree on >=1 band") {
    // every emitted pair must share at least one band bucket by construction;
    // verify via an independent recomputation of the band buckets
    val params = Dedup.hashParams(16)
    val sig = docs
      .select(col("doc_id"), TextAnalysis.normalize(col("text")).as("t"))
      .filter(length(col("t")) >= 5)
      .select(col("doc_id"), Dedup.shinglesOfNorm(col("t"), 5).as("sh"))
      .select(col("doc_id"),
        transform(col("sh"), s => Dedup.baseHash(s) % Dedup.Mersenne31).as("hs"))
      .select(col("doc_id"), array(params.map(p =>
        array_min(transform(col("hs"), h => (lit(p.a) * h + lit(p.b)) % Dedup.Mersenne31))): _*).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5).collect()
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val shared = (0 until 4).exists { band =>
        (0 until 4).forall(rr => sig(a)(band * 4 + rr) == sig(b)(band * 4 + rr))
      }
      assert(shared, s"pair ($a,$b) shares no band")
    }
  }

  test("simhashNearDups pairs are unique, ordered, within the Hamming bound") {
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 8).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not ordered")
      val h = r.getInt(2)
      assert(h >= 0 && h <= 8, s"hamming $h out of bound")
    }
  }

  test("exactDedup keeps one representative per normalized text") {
    val deduped = Dedup.exactDedup(docs)
    val norms = deduped
      .select(TextAnalysis.md5Fingerprint(col("text")).as("fp"))
      .groupBy("fp").count().filter(col("count") > 1).count()
    assert(norms === 0L)
  }

  test("dedupWithinGap: sub-gap repeats drop, aged-out content re-admits") {
    import spark.implicits._
    val rows = Seq(
      // key A: t=0 keeps, t=5 dup (gap 10), t=12 keeps (7 after t=5? NO —
      // lag is vs the PREVIOUS OCCURRENCE: 12-5=7 <= 10 → drops),
      // t=30 re-admits (30-12=18 > 10)
      (1L, "A", 0L), (2L, "A", 5L), (3L, "A", 12L), (4L, "A", 30L),
      // key B: single row always keeps
      (5L, "B", 3L),
      // key C: tie on ts — lower id survives, higher id is the 0-delta dup
      (6L, "C", 7L), (7L, "C", 7L)
    ).toDF("id", "k", "ts_us")
    val kept = Dedup.dedupWithinGap(rows,
        fp = col("k"), tsUs = col("ts_us"), gapUs = 10L, tie = col("id"))
      .select("id").as[Long].collect().sorted
    assert(kept === Array(1L, 4L, 5L, 6L))
  }

  test("appendToIndex survives being fed dedupAgainstIndex's own output") {
    // REGRESSION (q233): survivors' plan READS the index; Spark's
    // recacheByPath on the first append used to re-derive them against the
    // half-updated index, dropping every row (the batch deduped against its
    // own fingerprints) and appending EMPTY shingle/band relations.
    val idx = graft.queries.Scratch.stableDir("dedupspec-idx")
    Dedup.writeIndex(docs.filter(col("doc_id") < 100), idx)
    val before = spark.read.parquet(s"$idx/bands").count()
    val survivors = Dedup.dedupAgainstIndex(
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 120), idx)
    val n = survivors.count()
    assert(n > 0, "fixture must admit at least one new doc")
    Dedup.appendToIndex(survivors, idx)
    assert(spark.read.parquet(s"$idx/fingerprints").count() === 100 + n)
    assert(spark.read.parquet(s"$idx/bands").count() === before + n * 4,
      "band rows must grow by 4 per admitted doc — empty append means the " +
        "accepted plan was re-derived against the half-updated index")
    // the next batch must now dedup against the admissions: re-feeding the
    // SAME docs drops every one — admitted docs hit their own fingerprints,
    // the rest were near-dups of the base index already
    assert(Dedup.dedupAgainstIndex(
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 120), idx).count() === 0L)
  }

  test("crossSourceOverlap: distinct shared texts per unordered source pair") {
    import spark.implicits._
    val rows = Seq(
      // "hello world" appears in A (twice — distinct collapses) and B
      (1L, "hello world", "A"), (2L, "Hello   WORLD ", "A"), (3L, "hello world", "B"),
      // "x" shared by A and C
      (4L, "x", "A"), (5L, "x", "C"),
      // "y" only in B: contributes to no pair
      (6L, "y", "B")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceOverlap(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("A", "B") -> 1L, ("A", "C") -> 1L))
  }

  test("crossSourceOverlap prefix mode: shared heads match, tails may differ") {
    import spark.implicits._
    val rows = Seq(
      // same 3-token head, different tails → prefix-3 collides, full text differs
      (1L, "one two three alpha", "A"), (2L, "one two three beta", "B"),
      // different head → no pair
      (3L, "four five six", "A"), (4L, "seven eight nine", "B")
    ).toDF("doc_id", "text", "source")
    val strict = Dedup.crossSourceOverlap(rows).collect()
    assert(strict.isEmpty)
    val prefixed = Dedup.crossSourceOverlap(rows, prefixTokens = Some(3)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(prefixed === Map(("A", "B") -> 1L))
    // a prefix longer than the doc clamps to the whole text
    val clamped = Dedup.crossSourceOverlap(rows, prefixTokens = Some(99)).collect()
    assert(clamped.isEmpty)
  }

  test("prefixFilterJaccardPairs is LOSSLESS: exactly the brute-force pair set") {
    import spark.implicits._
    // hand-enumerated Jaccard over distinct token sets at t = 3/5:
    // (1,2) 4/6, (1,8) 5/5, (2,8) 4/6, (6,7) 3/5 boundary (>= keeps it);
    // every other pair is below; doc 9 is whitespace-only (no tokens)
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"), (3L, "a b c x y"),
      (4L, "p q r"), (6L, "a b c z"), (7L, "a b c w"),
      (8L, "A  b c D e"), (9L, "   ")).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (1L, 2L) -> 666666L, (1L, 8L) -> 1000000L,
      (2L, 8L) -> 666666L, (6L, 7L) -> 600000L))
  }

  test("prefixFilterJaccardPairs: a stricter rational threshold drops the boundary") {
    import spark.implicits._
    // at t = 2/3 the 3/5 and 4/6=2/3 pairs sit ON or BELOW: >= keeps 2/3,
    // drops 3/5 — the integer cross-multiplication is exact, no epsilon
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"),
      (6L, "a b c z"), (7L, "a b c w")).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJaccardPairs(docs, tNum = 2L, tDen = 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("cdcChunks: chunks partition each doc; identical docs chunk identically") {
    import spark.implicits._
    val d = docs.limit(50)
    val chunks = Dedup.cdcChunks(d, boundaryMod = 8)
    val perDoc = chunks.groupBy("doc_id")
      .agg(sum("n_tokens").as("tok_sum"), count(lit(1)).as("n_chunks"),
        max("chunk_idx").as("max_idx"))
    val expected = d.select(col("doc_id"),
      size(filter(TextAnalysis.tokens(col("text")), t => t =!= "")).as("n_tok"))
    // token-partition: chunk token counts sum back to the doc's token count,
    // and chunk indexes are dense 0..n-1
    val joined = perDoc.join(expected, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("tok_sum") === r.getAs[Int]("n_tok").toLong)
      assert(r.getAs[Long]("max_idx") === r.getAs[Long]("n_chunks") - 1)
    }
    // determinism: same text ⇒ same fingerprint multiset
    val dup = d.withColumn("doc_id", col("doc_id") + 100000L)
    val a = chunks.groupBy("fp").count()
    val b = Dedup.cdcChunks(dup, boundaryMod = 8).groupBy("fp").count()
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("cdcChunks edit-locality: an inserted token leaves distant chunks intact") {
    import spark.implicits._
    // long synthetic doc: 400 distinct tokens
    val words = (0 until 400).map(i => s"w$i").mkString(" ")
    val edited = (0 until 400).map(i => s"w$i")
      .patch(200, Seq("INSERTED"), 0).mkString(" ")
    val base = Seq((1L, words, "s")).toDF("doc_id", "text", "source")
    val ed = Seq((1L, edited, "s")).toDF("doc_id", "text", "source")
    def fps(df: DataFrame): Set[String] =
      Dedup.cdcChunks(df, boundaryMod = 8).select("fp").as[String].collect().toSet
    val (a, b) = (fps(base), fps(ed))
    // the edit must NOT reshuffle everything: most chunks survive unchanged
    // (fixed-size chunking would shift every chunk after the insertion)
    val shared = a.intersect(b).size
    assert(shared >= (a.size * 3) / 4,
      s"edit reshaped too many chunks: ${a.size} before, ${b.size} after, $shared shared")
    assert(a != b, "an insertion must change at least the chunk it lands in")
  }

  test("exactSubstrSpans: a planted cross-doc span is found at the right offset") {
    import spark.implicits._
    def words(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val span = words("dup", 20) // 20 shared tokens, unique elsewhere
    val fixture = Seq(
      (1L, words("alpha", 10) + " " + span + " " + words("omega", 5)),
      (2L, words("beta", 3) + " " + span + " " + words("gamma", 12)),
      (3L, words("solo", 40))).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(fixture, k = 8, minSpanTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // the shared 20-token run starts at token 10 in doc 1, token 3 in doc 2;
    // doc 3 shares nothing and must emit no span
    assert(spans.toSeq === Seq((1L, 10L, 20L), (2L, 3L, 20L)))
  }

  test("exactSubstrSpans: whole-document duplicates yield one full-width span each") {
    import spark.implicits._
    val text = (0 until 30).map(i => s"w$i").mkString(" ")
    val fixture = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(fixture, k = 8, minSpanTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(spans.toSeq === Seq((1L, 0L, 30L), (2L, 0L, 30L)))
  }

  test("exactSubstrSpans: a within-doc self-repeat is duplication (paper semantics)") {
    import spark.implicits._
    val run = (0 until 12).map(i => s"r$i").mkString(" ")
    val doc = run + " " + (0 until 9).map(i => s"mid$i").mkString(" ") + " " + run
    val spans = Dedup.exactSubstrSpans(
        Seq((7L, doc)).toDF("doc_id", "text"), k = 8, minSpanTokens = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // both occurrences of the 12-token run surface: positions 0 and 21
    assert(spans.toSeq === Seq((7L, 0L, 12L), (7L, 21L, 12L)))
  }

  test("exactSubstrSpans: sub-minimum runs and short docs are silent") {
    import spark.implicits._
    val short = "a b c" // < k tokens: contributes no grams at all
    val tenRun = (0 until 10).map(i => s"t$i").mkString(" ")
    val fixture = Seq(
      (1L, short), (2L, short),
      (3L, tenRun + " " + words10("x")), (4L, tenRun + " " + words10("y")))
      .toDF("doc_id", "text")
    // 10-token shared run < minSpanTokens=16 → filtered; short docs skipped
    assert(Dedup.exactSubstrSpans(fixture, k = 8, minSpanTokens = 16).count() === 0L)
  }

  private def words10(tag: String): String =
    (0 until 10).map(i => s"$tag$i").mkString(" ")

  test("incremental ExactSubstr: a span flags only once its gram is indexed") {
    import spark.implicits._
    def mk(tag: String, n: Int): String = (0 until n).map(i => s"$tag$i").mkString(" ")
    withTempDir("gidx") { tmp =>
      val idx = tmp.resolve("idx").toString
      val span = mk("dup", 20)
      Dedup.writeGramIndex(Seq((1L, mk("seed", 30))).toDF("doc_id", "text"), idx)
      // batch 1 carries the span's FIRST occurrence: nothing indexed yet,
      // nothing self-repeated -> no span (the one-pass blind spot, by design)
      val b1 = Seq((10L, mk("b1a", 5) + " " + span)).toDF("doc_id", "text")
      assert(Dedup.exactSubstrSpansAgainstIndex(b1, idx).count() === 0L)
      Dedup.appendGramIndex(b1, idx)
      // batch 2 re-carries the span: now indexed -> flagged at offset 0
      val b2 = Seq((20L, span + " " + mk("b2t", 7))).toDF("doc_id", "text")
      val s2 = Dedup.exactSubstrSpansAgainstIndex(b2, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(s2 === Seq((20L, 0L, 20L)))
    }
  }

  test("ingestAgainstIndex equals dedupAgainstIndex + appendToIndex exactly") {
    // the fused form shingles the batch once; admissions AND the resulting
    // index state must be identical to the two-call form
    withTempDir("ingest-eq") { tmp =>
      val idxA = tmp.resolve("two-call").toString
      val idxB = tmp.resolve("fused").toString
      val seed = docs.filter(col("doc_id") < 40)
      val batch = docs.filter(col("doc_id") >= 40 && col("doc_id") < 120)
      Dedup.writeIndex(seed, idxA)
      Dedup.writeIndex(seed, idxB)
      val survA = Dedup.dedupAgainstIndex(batch, idxA).localCheckpoint()
      Dedup.appendToIndex(survA, idxA)
      val survB = Dedup.ingestAgainstIndex(batch, idxB)
      def ids(df: DataFrame): Seq[Long] =
        df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids(survB) === ids(survA))
      assert(survB.columns.toSeq === survA.columns.toSeq)
      def fpSet(p: String): Set[String] =
        spark.read.parquet(s"$p/fingerprints").collect().map(_.getString(0)).toSet
      def bandSet(p: String): Set[(Long, Int, Long)] =
        spark.read.parquet(s"$p/bands").collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
            r.getAs[Long]("bucket"))).toSet
      def shingleDocs(p: String): Set[Long] =
        spark.read.parquet(s"$p/shingles").collect()
          .map(_.getAs[Long]("doc_id")).toSet
      assert(fpSet(idxB) === fpSet(idxA))
      assert(bandSet(idxB) === bandSet(idxA))
      assert(shingleDocs(idxB) === shingleDocs(idxA))
      assert(ids(survB).nonEmpty, "fixture must admit something")
    }
  }

  test("exactSubstrIngestBatch equals spansAgainstIndex + appendGramIndex exactly") {
    withTempDir("gidx-fused") { tmp =>
      val idxA = tmp.resolve("two-call").toString
      val idxB = tmp.resolve("fused").toString
      val seed = docs.filter(col("doc_id") < 40)
      val batch = docs.filter(col("doc_id") >= 40 && col("doc_id") < 120)
      Dedup.writeGramIndex(seed, idxA)
      Dedup.writeGramIndex(seed, idxB)
      val spansA = Dedup.exactSubstrSpansAgainstIndex(batch, idxA).localCheckpoint()
      Dedup.appendGramIndex(batch, idxA)
      val spansB = Dedup.exactSubstrIngestBatch(batch, idxB)
      def spans(df: DataFrame): Seq[(Long, Long, Long)] =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(spans(spansB) === spans(spansA))
      def ghSet(p: String): Set[Long] =
        spark.read.parquet(p).collect().map(_.getAs[Long]("gh")).toSet
      assert(ghSet(idxB) === ghSet(idxA))
    }
  }

  test("exactSubstrSpans equals the window-count formulation (shape-only change)") {
    // the ≥2-occurrence mark moved from count().over(Window.partitionBy(gh))
    // to a map-side-combined groupBy + left_semi (round-12); the marked set —
    // and therefore every span — must be bit-identical on real data
    val k = 8
    val grams = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("toks")) - k),
          i => Dedup.baseHash(array_join(slice(col("toks"), i + 1, lit(k)), " "))))
          .as(Seq("pos", "gh")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gh")
    val marked = grams.withColumn("n", count(lit(1)).over(w))
      .filter(col("n") >= 2)
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val viaWindow = marked
      .withColumn("isl", col("pos") - row_number().over(wd))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) - min(col("pos")) + k).cast("long").as("span_tokens"))
      .filter(col("span_tokens") >= 16)
      .select("doc_id", "span_start", "span_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val viaGroupBy = Dedup.exactSubstrSpans(docs, k = k, minSpanTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(viaGroupBy === viaWindow)
    assert(viaGroupBy.nonEmpty, "fixture must exercise the span path")
  }

  test("exactSubstrSpans plan: no window partitioned by the gram hash") {
    // the hottest gram at crawl scale is exactly the boilerplate the operator
    // exists to find — a gh-partitioned window would route all its
    // occurrences through one reducer task; only the per-DOC island window
    // (bounded by document length) is allowed
    val plan = Dedup.exactSubstrSpans(docs, k = 8, minSpanTokens = 16)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(gh"),
      s"gram-hash window reintroduced:\n$plan")
  }

  test("incremental replay with everything in one batch equals the batch path") {
    // batchCol = 1 for all docs (no seed): in-batch ≥2 is then the global
    // ≥2 rule, so the replay must reproduce exactSubstrSpans exactly
    def spans(df: DataFrame): Seq[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val replay = spans(Dedup.exactSubstrSpansIncrementalReplay(
      docs, lit(1), k = 8, minSpanTokens = 16))
    val batch = spans(Dedup.exactSubstrSpans(docs, k = 8, minSpanTokens = 16))
    assert(replay === batch)
  }

  test("reconcile: reconciled set equals the batch path; one-pass blind spot flagged") {
    import spark.implicits._
    def mk(tag: String, n: Int): String = (0 until n).map(i => s"$tag$i").mkString(" ")
    val span = mk("dup", 20)
    val fixture = Seq(
      (5L, mk("seed", 30)),                      // batch 0 (index seed)
      (10L, mk("pre", 5) + " " + span),          // batch 1: FIRST occurrence
      (20L, span + " " + mk("post", 7))          // batch 2: the duplicate
    ).toDF("doc_id", "text")
    val batchOf = when(col("doc_id") < 10, 0L)
      .when(col("doc_id") < 20, 1L).otherwise(2L)
    val inc = Dedup.exactSubstrSpansIncrementalReplay(
      fixture, batchOf, k = 8, minSpanTokens = 16)
    // the stream sees only batch 2's side (batch 1's gram wasn't indexed yet)
    assert(inc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((20L, 0L, 20L)))
    val rec = Dedup.exactSubstrReconcile(fixture, inc, k = 8, minSpanTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    // reconciled set = batch-exact spans; the first occurrence is the miss
    assert(rec === Seq((10L, 5L, 20L, 1L), (20L, 0L, 20L, 0L)))
    val full = Dedup.exactSubstrSpans(fixture, k = 8, minSpanTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rec.map(t => (t._1, t._2, t._3)) === full)
  }

  test("fused reconcile-replay equals the generic reconcile over the replay") {
    val batchOf = when(col("doc_id") < 100, 0L)
      .when(col("doc_id") < 250, 1L).otherwise(2L)
    def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    val generic = Dedup.exactSubstrReconcile(docs,
      Dedup.exactSubstrSpansIncrementalReplay(docs, batchOf, k = 8, minSpanTokens = 16),
      k = 8, minSpanTokens = 16)
    val fused = Dedup.exactSubstrReconcileReplay(docs, batchOf, k = 8, minSpanTokens = 16)
    assert(rows(fused) === rows(generic))
    assert(rows(fused).nonEmpty, "fixture must exercise the reconcile path")
  }

  test("incremental ExactSubstr: in-batch self-duplication flags both occurrences") {
    import spark.implicits._
    def mk(tag: String, n: Int): String = (0 until n).map(i => s"$tag$i").mkString(" ")
    withTempDir("gidx2") { tmp =>
      val idx = tmp.resolve("idx").toString
      Dedup.writeGramIndex(Seq((1L, mk("seed", 30))).toDF("doc_id", "text"), idx)
      val span = mk("twin", 16)
      val batch = Seq(
        (10L, span + " " + mk("xa", 9)),
        (11L, mk("yb", 4) + " " + span)).toDF("doc_id", "text")
      val spans = Dedup.exactSubstrSpansAgainstIndex(batch, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(spans === Seq((10L, 0L, 16L), (11L, 4L, 16L)))
    }
  }

  test("ExactSubstr gram kernel equals the HOF slice+join+md5 formulation") {
    // the r14 codegen'd gram stage (wordNgramsAll ∘ md5Longs) must be
    // position-for-position identical to the interpreted reference chain
    // it replaced, or every ExactSubstr oracle replay would drift
    import graft.functions.GraftFunctions
    val base = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val hof = base.select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - 8),
        i => Dedup.baseHash(array_join(slice(col("toks"), i + 1, lit(8)), " "))))
        .as(Seq("pos", "gh")))
    val kernel = base.select(col("doc_id"), posexplode(
        GraftFunctions.md5Longs(GraftFunctions.wordNgramsAll(col("toks"), 8),
          digits = 15))
        .as(Seq("pos", "gh")))
    val k = rows(kernel)
    assert(k === rows(hof))
    assert(k.nonEmpty, "fixture must exercise the gram stage")
  }

  test("staged MinHash sketch is row-identical to a fresh derivation (fixture not weakened)") {
    // the r14 staging (stagedDedupSketch: shingles/sig/bands parquet written
    // once per JVM per corpus) must be indistinguishable from recomputing —
    // or every dedup-family query reading it (q21/q27/q28/q29/q102/q224/
    // q386) would run on a different sketch than its oracle replays
    val fan = Tables.fanOut(docs)
    val freshSh = Dedup.shingleHashes(fan, "doc_id", "text", 5)
    def shRows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).sortBy(_._1).toSeq
    assert(shRows(ExtQueries.stagedDocShingles(spark, Sf0001)) === shRows(freshSh))
    val freshSig = Dedup.minhashSigFrame(freshSh, Dedup.hashParams(16))
    def sigRows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), Option(r.getSeq[Long](1)).map(_.toSeq)))
      .sortBy(_._1).toSeq
    assert(sigRows(ExtQueries.stagedDocSig(spark, Sf0001)) === sigRows(freshSig))
    def bandRows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(bandRows(ExtQueries.stagedDocBands(spark, Sf0001))
      === bandRows(Dedup.bandRowsOfSig(freshSig, 4, 4)))
  }

  test("staged-sketch consumers equal the inline derivations exactly") {
    val fan = Tables.fanOut(docs)
    val sh = ExtQueries.stagedDocShingles(spark, Sf0001)
    val bands = ExtQueries.stagedDocBands(spark, Sf0001)
    // pair tier: nearDupsFromRelations over the staged sketch IS
    // minhashNearDups (same tail, asserted on the full fixture pair set)
    val viaStaged = Dedup.nearDupsFromRelations(bands, sh, threshold = 0.5)
    val fresh = Dedup.minhashNearDups(fan, threshold = 0.5)
    assert(viaStaged.exceptAll(fresh).isEmpty && fresh.exceptAll(viaStaged).isEmpty)
    assert(fresh.count() > 0, "fixture must exercise the near-dup path")
    // composed ladder: dedupCorpus with the staged sketch keeps the same
    // keeper set as the inline form (superset relations + semi-join)
    val keepStaged = Dedup.dedupCorpus(fan, staged = Some((sh, bands)))
      .select("doc_id")
    val keepFresh = Dedup.dedupCorpus(fan).select("doc_id")
    assert(keepStaged.exceptAll(keepFresh).isEmpty
      && keepFresh.exceptAll(keepStaged).isEmpty)
  }

  test("staged verified pairs are row-identical to the fresh pair derivation") {
    // the r15 pair tier: the persisted (doc_a, doc_b, jaccard) set must BE
    // the minhashNearDups output — q21 serves it verbatim, q27 clusters it
    val fresh = Dedup.minhashNearDups(Tables.fanOut(docs), threshold = 0.5)
    val staged = ExtQueries.stagedDocPairs(spark, Sf0001)
    assert(staged.exceptAll(fresh).isEmpty && fresh.exceptAll(staged).isEmpty)
    assert(fresh.count() > 0)
  }

  test("dedupCorpusFromPairs equals dedupCorpus, on the full corpus and a filtered subset") {
    val fan = Tables.fanOut(docs)
    val pairs = ExtQueries.stagedDocPairs(spark, Sf0001)
    // full corpus: the served-pairs tier reproduces the inline ladder
    val fullServed = Dedup.dedupCorpusFromPairs(fan, pairs).select("doc_id")
    val fullInline = Dedup.dedupCorpus(fan).select("doc_id")
    assert(fullServed.exceptAll(fullInline).isEmpty
      && fullInline.exceptAll(fullServed).isEmpty)
    // filtered subset (the q102 shape): candidate membership is a per-pair
    // bucket property, so superset pairs restricted by the keeper semi-join
    // must equal pairs derived from the subset alone
    val subset = fan.filter(col("doc_id") % 3 =!= 0)
    val subServed = Dedup.dedupCorpusFromPairs(subset, pairs).select("doc_id")
    val subInline = Dedup.dedupCorpus(subset).select("doc_id")
    assert(subServed.exceptAll(subInline).isEmpty
      && subInline.exceptAll(subServed).isEmpty)
    // a tighter call-site threshold re-filters served pairs (pairs staged
    // at 0.5 serve any threshold >= 0.5)
    val tightServed = Dedup.dedupCorpusFromPairs(fan, pairs, threshold = 0.9)
      .select("doc_id")
    val tightInline = Dedup.dedupCorpus(fan, threshold = 0.9).select("doc_id")
    assert(tightServed.exceptAll(tightInline).isEmpty
      && tightInline.exceptAll(tightServed).isEmpty)
  }

  test("staging scale gate: sf0.001 takes the in-memory path; forced-parquet is row-identical") {
    import graft.queries.Staging
    // the default gate classifies the tiny fixture as below-threshold, so
    // the sketch accessors above all served the localCheckpoint'd mem path;
    // forcing the threshold to 0 flips the SAME accessors onto the parquet
    // path — both must produce the identical sketch (the gate is a cost
    // decision, never a semantic one)
    assert(!Staging.stageToParquet(s"$Sf0001/documents.parquet"))
    def shRows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).sortBy(_._1).toSeq
    def bandRows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val memSh = shRows(ExtQueries.stagedDocShingles(spark, Sf0001))
    val memBands = bandRows(ExtQueries.stagedDocBands(spark, Sf0001))
    val prev = sys.props.get("graft.staging.minBytes")
    try {
      sys.props("graft.staging.minBytes") = "0"
      assert(Staging.stageToParquet(s"$Sf0001/documents.parquet"))
      assert(shRows(ExtQueries.stagedDocShingles(spark, Sf0001)) === memSh)
      assert(bandRows(ExtQueries.stagedDocBands(spark, Sf0001)) === memBands)
    } finally prev match {
      case Some(v) => sys.props("graft.staging.minBytes") = v
      case None => sys.props -= "graft.staging.minBytes"
    }
  }

  test("staged-relation contract guards fail loudly on mismatched knobs") {
    val sh = ExtQueries.stagedDocShingles(spark, Sf0001)
    val bands = ExtQueries.stagedDocBands(spark, Sf0001) // built at 4 bands
    val sig = ExtQueries.stagedDocSig(spark, Sf0001)     // 16 minhashes
    // dedupCorpus's fresh path assumes the 4x4 default banding — a sketch
    // at another grouping must be rejected, not silently mis-bucketed
    val threeBanded = Dedup.bandRowsOfSig(sig, 3, 4)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.dedupCorpus(Tables.fanOut(docs), staged = Some((sh, threeBanded)))
    }
    assert(e1.getMessage.contains("dedupCorpus"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.writeIndex(docs, graft.queries.Scratch.dir("guard-idx"),
        staged = Some((sh, threeBanded)))
    }
    assert(e2.getMessage.contains("writeIndex"))
    // sweep: staged signatures must match the configs' total length
    val e3 = intercept[IllegalArgumentException] {
      Dedup.lshParameterSweep(docs,
        configs = Seq((2, 4, 1), (4, 2, 4)), staged = Some((sh, sig)))
    }
    assert(e3.getMessage.contains("lshParameterSweep"))
    // and the matched contracts still pass (no false alarms)
    assert(Dedup.dedupCorpus(Tables.fanOut(docs),
      staged = Some((sh, bands))).count() > 0)
  }
}
