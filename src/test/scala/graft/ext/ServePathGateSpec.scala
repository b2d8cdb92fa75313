package graft.ext

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.GraftTestBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** No-retraining gate for the model-SERVE paths — the property the r14
  * train-once/serve-many split (q229/q230, persisted dedup indexes) rests
  * on, made machine-checked: training is the only stage of these operators
  * that must run driver-side actions at PLAN-CONSTRUCTION time (Lloyd
  * rounds collect per-round aggregates; codebook init collects seeds), so
  * "the serve path never retrains" is exactly "constructing the serve-path
  * DataFrame launches zero Spark jobs". If someone re-inlines training
  * into `pqTopKFromModel`/`ivfPqFromModel`/`nearDupsFromRelations`, these
  * tests fail — the SimilaritySpec/DedupSpec equivalence asserts alone
  * would keep passing (retraining the same corpus yields the same model,
  * just 5-20x slower).
  */
class ServePathGateSpec extends SparkSpec {

  private def embeds = Tables.embeddings(spark, Sf0001)
  private def docs = Tables.documents(spark, Sf0001)

  /** Count jobs started while `build` runs, draining the async listener
    * bus before reading the counter. */
  private def jobsDuring(build: => Any): Int = {
    val n = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      build
      GraftTestBridge.waitListenerBusEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    n.get
  }

  test("listener control: train-inline PQ construction DOES launch jobs") {
    // differential control for the zero-asserts below — proves the counter
    // actually observes construction-time actions (pqTrainEncode probes the
    // dim, collects codebook seeds, and runs Lloyd rounds eagerly)
    val q = embeds.filter(col("vec_id") < 8)
    assert(jobsDuring(Similarity.pqTopK(embeds, q, k = 5, shortlist = 150)) > 0)
  }

  test("pqTopKFromModel constructs with zero jobs (never retrains)") {
    // model AND input relations built outside the window: the corpus read
    // itself costs one footer/schema job that is not the operator's
    val (books, subDim, enc) = ExtQueries.stagedPqModel(spark, Sf0001)
    val e = embeds
    val q = e.filter(col("vec_id") < 8)
    assert(jobsDuring(Similarity.pqTopKFromModel(
      e, q, books, subDim, enc, k = 5, shortlist = 150)) === 0)
  }

  test("ivfPqFromModel constructs with zero jobs (never retrains)") {
    val (books, subDim, enc) = ExtQueries.stagedPqModel(spark, Sf0001)
    val (centroids, cells) = ExtQueries.stagedIvfCoarse(spark, Sf0001)
    val e = embeds
    val q = e.filter(col("vec_id") < 8)
    assert(jobsDuring(Similarity.ivfPqFromModel(e, q, centroids, cells,
      books, subDim, enc, k = 5, nprobe = 14, shortlist = 200)) === 0)
  }

  test("nearDupsFromRelations constructs with zero jobs (never re-sketches)") {
    val sh = ExtQueries.stagedDocShingles(spark, Sf0001)   // warm the sketch
    val bands = ExtQueries.stagedDocBands(spark, Sf0001)
    assert(jobsDuring(
      Dedup.nearDupsFromRelations(bands, sh, threshold = 0.5)) === 0)
  }

  test("served pair tier constructs with zero jobs and a shuffle-free plan") {
    // the r15 deepest tier: after the sketch is staged, the persisted pair
    // set must SERVE — constructing the served frame launches no jobs, and
    // its physical plan has no Exchange and no shingle pipeline (a re-inline
    // of candidate bucketing or Jaccard verify would add both while the
    // DedupSpec value-equality asserts kept passing)
    ExtQueries.stagedDocPairs(spark, Sf0001) // warm the staged sketch
    assert(jobsDuring(ExtQueries.stagedDocPairs(spark, Sf0001)) === 0)
    val plan = ExtQueries.stagedDocPairs(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"served pair plan must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("shingle"),
      s"served pair plan must not re-run the shingle pipeline:\n$plan")
  }

  test("dedupCorpusFromPairs never re-runs candidate bucketing or verify") {
    // the serve tier's fixpoint still runs jobs eagerly (that is its
    // documented cost); the property to pin is that NONE of those jobs
    // re-derives pairs — the executed stages carry no bucket-enumeration
    // or jaccard-verify operators. Checked structurally on the restricted
    // pair relation dedupCore consumes: keeper semi-joins + threshold
    // filter over the served relation only.
    val pairs = ExtQueries.stagedDocPairs(spark, Sf0001)
    val keep = Tables.fanOut(docs).select(col("doc_id"))
    val restricted = pairs.filter(col("jaccard") >= 0.5)
      .join(keep.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(keep.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
    val plan = restricted.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("shingle") && !plan.contains("collect_list"),
      s"restriction must consume served pairs, not re-derive them:\n$plan")
  }

  test("dedupAgainstIndex construction runs metadata-only jobs") {
    // the index probe's construction cost is a CONSTANT independent of
    // corpus size: the 1-row meta JSON costs 2 jobs (schema inference +
    // collect) and each of the three index relations' parquet footer reads
    // costs 1 — measured 5 total. An accidental eager corpus action
    // (re-shingling the arrivals, a count, a re-sketch) adds jobs on top
    // and trips the bound.
    val idx = graft.queries.Scratch.dir("serve-gate-idx")
    val d = docs
    Dedup.writeIndex(d, idx) // authored outside the listener window
    val arrivals = d.limit(10)
    val jobs = jobsDuring(Dedup.dedupAgainstIndex(arrivals, idx))
    assert(jobs <= 5, s"expected metadata-only construction (<=5 jobs), got $jobs")
  }
}
