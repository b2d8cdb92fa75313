package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** TF-IDF keyword extraction and vocabulary-induction contracts: the ranks
  * and scores on a hand-computable fixture, the integer-only determinism of
  * the top-k set, and the top-N boundary tie-break of the vocabulary.
  */
class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana banana durian"),
    (3L, "apple fig fig fig")
  ).toDF("doc_id", "text")

  test("commonnessScore: exact rational scores on a hand-computed fixture") {
    val docs = Seq((0L, "a a b"), (1L, "c")).toDF("doc_id", "text")
    // counts: a=2, b=1, c=1; N=4
    // d0: n_tok=3, cnt_sum=2+2+1=5 -> (1e6*5) div (3*4) = 416666
    // d1: n_tok=1, cnt_sum=1      -> (1e6*1) div (1*4) = 250000
    val got = TextAnalysis.commonnessScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === Seq((0L, 3L, 416666L), (1L, 1L, 250000L)))
    // a common-token doc outscores a rare-token doc (the filter's point)
    assert(got(0)._3 > got(1)._3)
  }

  test("collocations: exact lift and ordering on a hand-computed fixture") {
    val docs = Seq((0L, "x y x y x")).toDF("doc_id", "text")
    // bigrams: "x y"×2, "y x"×2; N_bi=4; c_x=3, c_y=2
    // lift both = (1e4*4*2) div (3*2) = 13333; tie breaks on ngram asc
    val got = TextAnalysis.collocations(docs, minCount = 1L, topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === Seq(
      ("x y", 2L, 3L, 2L, 13333L),
      ("y x", 2L, 2L, 3L, 13333L)))
    // minCount prunes: nothing repeats 3+ times
    assert(TextAnalysis.collocations(docs, minCount = 3L, topN = 10).count() === 0L)
  }

  test("ngramNovelty: exact df counts and shared ppm on a hand-computed fixture") {
    val docs = Seq(
      (0L, "a b c"),   // distinct bigrams: "a b", "b c"
      (1L, "a b d"),   // distinct bigrams: "a b", "b d"
      (2L, "x")        // no bigram -> drops out
    ).toDF("doc_id", "text")
    // df: "a b"=2, "b c"=1, "b d"=1 -> each doc: 2 ngrams, 1 shared, 500000 ppm
    val got = TextAnalysis.ngramNovelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got === Seq((0L, 2L, 1L, 500000L), (1L, 2L, 1L, 500000L)))
  }

  test("oovRate: induced-vocab membership via a broadcast join, exact ppm") {
    val docs = Seq(
      (0L, "a a b c"), // counts a=3 b=3 c=1 z=1; top-2 vocab = {a, b}
      (1L, "a b b z")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, topN = 2)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got === Seq((0L, 4L, 1L, 250000L), (1L, 4L, 1L, 250000L)))
    // the vocab side must be model-sized and BROADCAST, never shuffled
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "oovRate's vocab membership join must be a broadcast hash join")
  }

  test("length survival curve: descending cumulative docs_ge on the bucket table") {
    withTempDir("survival") { dir =>
      Seq((0L, "a"), (1L, ("w " * 64).trim), (2L, ("w " * 65).trim),
        (3L, ("w " * 200).trim))
        .toDF("doc_id", "text")
        .write.parquet(dir.resolve("documents.parquet").toString)
      val got = ExtQueries.q148LengthSurvival(spark, dir.toString)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      // buckets: 1 tok -> 0; 64 and 65 tok -> 1 (mass 129); 200 tok -> 3;
      // docs_ge walks 1 (bucket 3) -> 3 (bucket 1) -> 4 (bucket 0)
      assert(got === Seq((0L, 1L, 1L, 4L), (1L, 2L, 129L, 3L), (3L, 1L, 200L, 1L)))
    }
  }

  test("tfidfKeywords: ranks, scores and df on a hand-computed fixture") {
    val got = TextAnalysis.tfidfKeywords(fixture, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
      .sortBy(t => (t._1, t._6))
    // doc 1: apple tf=2 (df 2), banana tf=1 (df 2), cherry tf=1 (df 1).
    //   rank1 apple (tf 2), rank2 cherry (tf 1, df 1 < banana's df 2).
    //   score(apple) = floor(2*10000*3 / (4*2)) = 7500
    //   score(cherry) = floor(1*10000*3 / (4*1)) = 7500
    // doc 2: banana tf=2, durian tf=1 df=1: score(banana)=floor(2e4*3/(3*2))=10000
    // doc 3: fig tf=3 df=1: score = floor(3*10000*3/(4*1)) = 22500
    val expected = Seq(
      (1L, "apple", 2L, 2L, 7500L, 1),
      (1L, "cherry", 1L, 1L, 7500L, 2),
      (2L, "banana", 2L, 2L, 10000L, 1),
      (2L, "durian", 1L, 1L, 10000L, 2),
      (3L, "fig", 3L, 1L, 22500L, 1),
      (3L, "apple", 1L, 2L, 3750L, 2)
    ).sortBy(t => (t._1, t._6))
    assert(got.toSeq === expected)
  }

  test("tfidfKeywords: exactly k rows per doc on real docs, rank contiguous") {
    val docs = Tables.documents(spark, Sf0001)
    val got = TextAnalysis.tfidfKeywords(docs, k = 3)
    val perDoc = got.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("rnk").as("mx"), min("rnk").as("mn")).collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getInt(3) === 1 && r.getInt(2) === r.getLong(1))
    }
    // partitioning-independent: same result from a differently-sharded input
    val again = TextAnalysis.tfidfKeywords(docs.repartition(7, col("lang")), k = 3)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
  }

  test("vocabNgrams: counts and boundary tie-break on a fixture") {
    val got = TextAnalysis.vocabNgrams(fixture, n = 2, topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // bigrams: doc1: "apple banana","banana apple","apple cherry";
    // doc2: "banana banana","banana durian"; doc3: "apple fig","fig fig" x2
    // counts: "fig fig"=2, everything else 1 → top3 = fig fig, then the
    // lexicographically first two of the 1-count ties.
    assert(got.head === ("fig fig", 2L))
    assert(got.map(_._1).toSeq === Seq("fig fig", "apple banana", "apple cherry"))
  }

  test("vocabNgrams: topN bound respected and deterministic on real docs") {
    val docs = Tables.documents(spark, Sf0001)
    val a = TextAnalysis.vocabNgrams(docs, 2, 50).collect().map(r => (r.getString(0), r.getLong(1)))
    val b = TextAnalysis.vocabNgrams(docs.repartition(5), 2, 50)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.length === 50 && a.sameElements(b))
  }

  test("paddingWaste: ceiling buckets and integer waste ppm, hand-computed") {
    import spark.implicits._
    // 64 tokens → bucket 1, zero waste; 1 token → bucket 1, 63/64 wasted;
    // 65 tokens → bucket 2, (128-65)/128 wasted
    val tiny = Seq(
      (1L, Seq.fill(64)("w").mkString(" ")),
      (2L, "w"),
      (3L, Seq.fill(65)("w").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.paddingWaste(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 65L, 128L, 1000000L * 63 / 128)),
      2L -> ((1L, 65L, 128L, 1000000L * 63 / 128))))
  }

  test("freqSpectrum: binary-digit bucket is exact at power-of-two boundaries") {
    import spark.implicits._
    // frequencies: a×1 (bucket 0), b×2, c×3 (bucket 1), d×4 (bucket 2)
    val words = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++ Seq.fill(4)("d")
    val tiny = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.freqSpectrum(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      0L -> ((1L, 1L)),   // hapax: "a"
      1L -> ((2L, 5L)),   // freq 2-3: "b","c"
      2L -> ((1L, 4L)))) // freq 4-7: "d"
  }
}
