package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Similarity-tier specs: the LSH ANN recall promise (vs the exact
  * brute-force tier, at the q31 parameters) and equivalence of the bucketed
  * cosine near-dup plan with the naive quadratic shape.
  */
class SimilaritySpec extends SparkSpec {

  private def embeds: DataFrame = Tables.embeddings(spark, Sf0001)

  test("LSH top-k recall@5 >= 0.8 against brute force (q31 parameters)") {
    val queries = embeds.filter(col("vec_id") < 8)
    val k = 5
    val exact = Similarity.bruteForceTopK(embeds, queries, k)
      .select("q_id", "vec_id")
    val ann = Similarity.lshTopK(embeds, queries, k)
      .select("q_id", "vec_id")
    val total = exact.count()
    val hit = exact.intersect(ann).count()
    val recall = hit.toDouble / total
    assert(total === 8L * k)
    assert(recall >= 0.8, f"LSH recall@$k = $recall%.3f < 0.8 (hit=$hit of $total)")
  }

  test("IVF top-k recall@5 >= 0.8 against brute force (q32 parameters)") {
    val queries = embeds.filter(col("vec_id") < 8)
    val k = 5
    val exact = Similarity.bruteForceTopK(embeds, queries, k)
      .select("q_id", "vec_id")
    val ann = Similarity.ivfTopK(embeds, queries, k)
      .select("q_id", "vec_id")
    val total = exact.count()
    val hit = exact.intersect(ann).count()
    val recall = hit.toDouble / total
    assert(recall >= 0.8, f"IVF recall@$k = $recall%.3f < 0.8 (hit=$hit of $total)")
  }

  test("ivfTopKIndexed over a persisted index equals the in-memory ivfTopK") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx")
    try {
      val queries = embeds.filter(col("vec_id") < 8)
      // centroid training is seeded, so build-then-probe must reproduce the
      // in-memory path exactly (same model, same inverted file, same ranks)
      Similarity.writeIvfIndex(embeds, dir.toString)
      val viaIndex = Similarity.ivfTopKIndexed(queries, dir.toString, k = 5)
      val inMem = Similarity.ivfTopK(embeds, queries, k = 5)
      assert(viaIndex.count() > 0)
      assert(viaIndex.exceptAll(inMem).isEmpty && inMem.exceptAll(viaIndex).isEmpty)
    } finally rmTree(dir)
  }

  test("q34 prebuilt-index probe: recall@5 >= 0.8, memoized build reused") {
    val k = 5
    val q34a = graft.ext.ExtQueries.q34IvfProbe(spark, Sf0001)
      .select("q_id", "vec_id")
    // second invocation probes the SAME memoized index — identical output
    // (no retraining, so no float-order perturbation between calls)
    val q34b = graft.ext.ExtQueries.q34IvfProbe(spark, Sf0001)
      .select("q_id", "vec_id")
    assert(q34a.exceptAll(q34b).isEmpty && q34b.exceptAll(q34a).isEmpty)
    val exact = Similarity
      .bruteForceTopK(embeds, embeds.filter(col("vec_id") < 8), k)
      .select("q_id", "vec_id")
    val total = exact.count()
    val hit = exact.intersect(q34a).count()
    val recall = hit.toDouble / total
    assert(recall >= 0.8, f"probe recall@$k = $recall%.3f < 0.8 (hit=$hit of $total)")
  }

  test("IVF inverted file covers the corpus: every vector lands in one cell") {
    val e = embeds
    val centroids = Similarity.ivfCentroids(e, cells = 8, iters = 1)
    assert(centroids.length === 8)
    assert(centroids.forall(_.length === centroids.head.length))
    // every centroid is a finite vector (no NaN from an empty cell)
    assert(centroids.forall(_.forall(x => !x.isNaN && !x.isInfinite)))
    val res = Similarity.ivfTopK(e, e.filter(col("vec_id") < 4), k = 3, cells = 8, nprobe = 8)
    // probing ALL cells makes IVF exhaustive: it must equal brute force
    val exact = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 4), 3)
    assert(res.exceptAll(exact).isEmpty && exact.exceptAll(res).isEmpty)
  }

  test("brute-force top-k: k rows per query, self excluded, ranks contiguous") {
    val res = Similarity.bruteForceTopK(embeds, embeds.filter(col("vec_id") < 4), 3).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 3)
      assert(rows.forall(_.getLong(1) != q), s"query $q returned itself")
      assert(rows.map(_.getInt(2)).sorted === Array(1, 2, 3))
    }
  }

  test("cosineNearDupPairs equals the naive block-join + window filter") {
    val e = embeds
      .select(col("label").as("block"), col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = e.toDF("block", "id_a", "v_a")
    val b = e.toDF("block", "id_b", "v_b")
    val dotAB = aggregate(zip_with(col("v_a"), col("v_b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val nA = sqrt(aggregate(zip_with(col("v_a"), col("v_a"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x))
    val nB = sqrt(aggregate(zip_with(col("v_b"), col("v_b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x))
    val naive = a.join(b, Seq("block"))
      .filter((col("id_b") - col("id_a")).between(lit(1), lit(200)))
      .withColumn("cos", dotAB / (nA * nB))
      .filter(col("cos") >= 0.25)
      .select(col("block"), col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_r"))
    val fast = Similarity.cosineNearDupPairs(embeds, blockCol = "label", threshold = 0.25)
    assert(fast.count() === naive.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    val plan = fast.queryExecution.optimizedPlan.toString
    assert(plan.contains("id_bucket"), s"expected id_bucket in the join key:\n$plan")
  }
}
