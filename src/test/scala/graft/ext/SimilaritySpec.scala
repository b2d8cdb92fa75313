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

  test("JL top-k recall@5 >= 0.8 against brute force (q395 parameters)") {
    val queries = embeds.filter(col("vec_id") < 8)
    val k = 5
    val exact = Similarity.bruteForceTopK(embeds, queries, k)
      .select("q_id", "vec_id")
    val ann = Similarity.jlTopK(embeds, queries, k, outDims = 32, shortlist = 400)
      .select("q_id", "vec_id")
    val total = exact.count()
    val hit = exact.intersect(ann).count()
    val recall = hit.toDouble / total
    assert(recall >= 0.8, f"JL recall@$k = $recall%.3f < 0.8 (hit=$hit of $total)")
  }

  test("JL projection matrix is a pure function of indices: reruns bit-equal") {
    // no stored model: two independent calls must emit the identical ranked
    // output (the property that lets the oracle and any executor re-derive
    // the matrix from nothing)
    val queries = embeds.filter(col("vec_id") < 8)
    def run(): Seq[(Long, Long, Int)] =
      Similarity.jlTopK(embeds, queries, k = 5, outDims = 16, shortlist = 50)
        .select("q_id", "vec_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(run() === run())
  }

  test("PQ top-k recall@5 >= 0.8 against brute force (q229 parameters)") {
    val queries = embeds.filter(col("vec_id") < 8)
    val k = 5
    val exact = Similarity.bruteForceTopK(embeds, queries, k)
      .select("q_id", "vec_id")
    val ann = Similarity.pqTopK(embeds, queries, k, shortlist = 150)
      .select("q_id", "vec_id")
    val total = exact.count()
    val hit = exact.intersect(ann).count()
    val recall = hit.toDouble / total
    assert(total === 8L * k)
    assert(recall >= 0.8, f"PQ recall@$k = $recall%.3f < 0.8 (hit=$hit of $total)")
  }

  test("PQ output shape: k rows per query, self excluded, exact re-rank scores") {
    val queries = embeds.filter(col("vec_id") < 2)
    val k = 3
    val got = Similarity.pqTopK(embeds, queries, k, shortlist = 150).collect()
    assert(got.length === 2 * k)
    got.foreach { r =>
      assert(r.getLong(0) !== r.getLong(1), "self match must be excluded")
      assert(r.getInt(2) >= 1 && r.getInt(2) <= k)
    }
    // the re-rank is EXACT cosine: every reported score must equal the
    // brute-force score for the same (q, vec) pair
    val bf = Similarity.bruteForceTopK(embeds, queries, k = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach { r =>
      bf.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(math.abs(r.getDouble(3) - s) < 1e-9,
          s"PQ re-rank score drifted from exact cosine for ${(r.getLong(0), r.getLong(1))}")
      }
    }
  }

  test("IVF x PQ composed recall@5 >= 0.8 against brute force (q230 parameters)") {
    val queries = embeds.filter(col("vec_id") < 8)
    val k = 5
    val exact = Similarity.bruteForceTopK(embeds, queries, k)
      .select("q_id", "vec_id")
    val ann = Similarity.ivfPqTopK(embeds, queries, k, nprobe = 14, shortlist = 200)
      .select("q_id", "vec_id")
    val total = exact.count()
    val hit = exact.intersect(ann).count()
    val recall = hit.toDouble / total
    assert(total === 8L * k)
    assert(recall >= 0.8, f"IVFPQ recall@$k = $recall%.3f < 0.8 (hit=$hit of $total)")
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

  test("q34 prebuilt-index probe gate: recall flag true, memoized build reused") {
    val q34a = graft.ext.ExtQueries.q34IvfProbe(spark, Sf0001).collect()
    // second invocation probes the SAME memoized index — identical output
    // (no retraining, so no float-order perturbation between calls)
    val q34b = graft.ext.ExtQueries.q34IvfProbe(spark, Sf0001).collect()
    assert(q34a.toSeq === q34b.toSeq)
    // one gate row: 8 queries × k=5 exact pairs, recall bound met
    assert(q34a.length === 1)
    assert(q34a.head.getLong(0) === 40L)
    assert(q34a.head.getInt(1) === 1,
      "prebuilt-index probe recall@5 fell below 0.8")
  }

  test("appendToIvfIndex: appended vectors are probed without a rebuild") {
    withTempDir("graft-ivf-append") { dir =>
      val half = embeds.filter(col("vec_id") % 2 === 0)
      val rest = embeds.filter(col("vec_id") % 2 === 1)
      Similarity.writeIvfIndex(half, dir.toString)
      Similarity.appendToIvfIndex(rest, dir.toString)
      val queries = embeds.filter(col("vec_id") < 8)
      val ann = Similarity.ivfTopKIndexed(queries, dir.toString, k = 5)
        .select("q_id", "vec_id")
      val hits = ann.collect().map(r => (r.getLong(0), r.getLong(1)))
      // both halves reachable: appended (odd) ids appear among neighbors
      assert(hits.exists(_._2 % 2 == 1), "appended vectors never probed")
      assert(hits.exists(_._2 % 2 == 0))
      // recall vs brute force over the FULL corpus stays useful even though
      // the centroids were trained on half (the documented staleness trade)
      val exact = Similarity.bruteForceTopK(embeds, queries, 5).select("q_id", "vec_id")
      val recall = exact.intersect(ann).count().toDouble / exact.count()
      assert(recall >= 0.7, f"post-append recall $recall%.3f < 0.7")
    }
  }

  test("IVF at cells=1024: model stays out of the plan tree, paths equivalent") {
    // the 100 TB regime: cells ≈ √N means thousands of centroids — viable
    // only because the model rides a broadcast relation, not per-centroid
    // literal expressions (which would blow up plan/codegen size here)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-1024")
    try {
      val queries = embeds.filter(col("vec_id") < 4)
      Similarity.writeIvfIndex(embeds, dir.toString, cells = 1024, iters = 1)
      val viaIndex = Similarity.ivfTopKIndexed(queries, dir.toString, k = 3, nprobe = 64)
      val inMem = Similarity.ivfTopK(embeds, queries, k = 3, cells = 1024,
        nprobe = 64, iters = 1)
      assert(viaIndex.count() > 0)
      assert(viaIndex.exceptAll(inMem).isEmpty && inMem.exceptAll(viaIndex).isEmpty)
      // the plan carries the model as a join relation: its printed size must
      // not scale with cells (a 1024-branch expression tree would be >1 MB)
      val plan = inMem.queryExecution.executedPlan.toString
      assert(plan.length < 100000,
        s"plan size suggests the centroid model leaked into the plan tree: ${plan.length} chars")
    } finally rmTree(dir)
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

  test("semanticDedup: survivors = corpus minus rows with a lower-id near-dup") {
    val pairs = Similarity.cosineNearDupPairs(embeds, blockCol = "label", threshold = 0.25)
    val removedIds = pairs.select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
    val kept = Similarity.semanticDedup(embeds, blockCol = "label", threshold = 0.25)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = embeds.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === all -- removedIds)
    // every removed row really has a lower-id near-dup; no survivor does
    assert(removedIds.subsetOf(all))
    assert(kept.intersect(removedIds).isEmpty)
  }

  test("knnClassify: one prediction per query, votes bounded by k, correct flag consistent") {
    val k = 10
    val res = Similarity.knnClassify(embeds, embeds.filter(col("vec_id") < 8), k).collect()
    assert(res.length === 8)
    res.foreach { r =>
      val votes = r.getLong(3)
      assert(votes >= 1L && votes <= k.toLong)
      val correct = r.getInt(4)
      assert((correct == 1) === (r.getInt(1) == r.getInt(2)))
    }
    // the prediction is the plurality label of the exact top-k neighbors
    val nn = Similarity.bruteForceTopK(embeds, embeds.filter(col("vec_id") < 8), k)
      .join(embeds.select(col("vec_id"), col("label")), "vec_id")
      .select("q_id", "label").collect()
      .groupBy(_.getLong(0))
    res.foreach { r =>
      val counts = nn(r.getLong(0)).groupBy(_.getInt(1)).view.mapValues(_.size)
      val best = counts.toSeq.minBy { case (label, n) => (-n, label) }
      assert(r.getInt(2) === best._1, s"query ${r.getLong(0)}: expected plurality ${best._1}")
      assert(r.getLong(3) === best._2.toLong)
    }
  }

  test("sq8Centroids: exact integer means of the per-row SQ8 codes") {
    val res = Similarity.sq8Centroids(embeds).collect()
    val dims = embeds.select(size(col("embedding"))).head.getInt(0)
    val labels = embeds.select(countDistinct(col("label"))).head.getLong(0)
    assert(res.length === labels * dims)
    // recompute one (label, dim) cell row-by-row and compare exactly
    val byRow = embeds
      .select(col("label"), Similarity.sq8(col("embedding")).getField("codes").as("codes"))
      .collect()
      .filter(_.getInt(0) == 0)
      .map(_.getSeq[Int](1))
    val cell = res.find(r => r.getInt(0) == 0 && r.getInt(1) == 0).get
    val codes0 = byRow.map(_.head.toLong)
    assert(cell.getLong(2) === codes0.length.toLong)
    assert(cell.getLong(3) === codes0.sum)
    assert(cell.getLong(4) === (10000L * codes0.sum) / codes0.length)
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

  test("ivfTopKWhere: only predicate rows returned; filtered recall@5 >= 0.8") {
    val queries = embeds.filter(col("vec_id") < 8)
    val k = 5
    val pred = col("label") === 3
    val ann = Similarity.ivfTopKWhere(embeds, queries, pred, k, nprobe = 14)
    // pre-filtered search: every returned neighbor satisfies the predicate
    val offLabel = ann.join(
      embeds.filter(!pred).select(col("vec_id")), Seq("vec_id"), "left_semi").count()
    assert(offLabel === 0L, s"$offLabel neighbors violate the predicate")
    val exact = Similarity.bruteForceTopK(embeds.filter(pred), queries, k)
      .select("q_id", "vec_id")
    val total = exact.count()
    val hit = exact.intersect(ann.select("q_id", "vec_id")).count()
    val recall = hit.toDouble / total
    assert(recall >= 0.8, f"filtered recall@$k = $recall%.3f < 0.8 (hit=$hit of $total)")
  }

  test("ivfTopKWhere beats post-filtering: k on-label rows even under a selective filter") {
    // naive post-filter of an UNFILTERED top-k returns < k on-label rows
    // whenever neighbors are mostly off-label (the known wrong answer);
    // pre-filtered search must return a full k per query
    val queries = embeds.filter(col("vec_id") < 8)
    val perQuery = Similarity
      .ivfTopKWhere(embeds, queries, col("label") === 3, k = 5, nprobe = 14)
      .groupBy("q_id").count().collect()
    assert(perQuery.length === 8 && perQuery.forall(_.getLong(1) === 5L),
      s"expected 5 on-label neighbors per query: ${perQuery.mkString(",")}")
  }

  test("staged exact gate side is bit-equal to a fresh brute-force pass (gate not weakened)") {
    // the r13 staging (exactTop5: parquet fixture written once per JVM per
    // corpus) must be indistinguishable from recomputing — same rows, same
    // ranks, same rounded scores — or the eight recall gates reading it
    // would be gated against a different exact side than their oracles
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
    val staged = ExtQueries.exactTop5(spark, Sf0001)
      .select("q_id", "vec_id", "rank", "score_r").collect().map(key).sorted.toSeq
    val fresh = Similarity.bruteForceTopK(embeds, embeds.filter(col("vec_id") < 8), k = 5)
      .select("q_id", "vec_id", "rank", "score_r").collect().map(key).sorted.toSeq
    assert(staged === fresh)
    val stagedL3 = ExtQueries.exactTop5Label3(spark, Sf0001)
      .select("q_id", "vec_id", "rank", "score_r").collect().map(key).sorted.toSeq
    val freshL3 = Similarity.bruteForceTopK(embeds.filter(col("label") === 3),
      embeds.filter(col("vec_id") < 8), k = 5)
      .select("q_id", "vec_id", "rank", "score_r").collect().map(key).sorted.toSeq
    assert(stagedL3 === freshL3)
  }

  test("staged leave-one-out kNN predictions are bit-equal to a fresh pass (q306/q307 gates not weakened)") {
    // r15 staging: the |corpus|² leave-one-out classify pass shared by the
    // q306 confusion-marginal and q307 calibration reports is computed once
    // per JVM per corpus; it must be indistinguishable from recomputing
    // row-content keys (type-rendered), so a parquet round-trip that
    // changed a value OR a column type would both fail the assert
    def keys(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = Seq("q_id", "true_label", "pred_label", "votes", "correct")
      val d = df.select(cols.head, cols.tail: _*)
      val types = d.schema.fields.map(_.dataType.simpleString).mkString("|")
      d.collect().map(r => types + "::" + r.toString).sorted.toSeq
    }
    val staged = keys(ExtQueries.stagedKnnLoo(spark, Sf0001))
    val fresh = keys(Similarity.knnClassify(embeds, embeds, k = 5))
    assert(staged === fresh)
  }

  test("staged PQ/IVF models equal a fresh training pass (gates not weakened)") {
    // r14 staging: codebooks + encoding + coarse centroids + assignment are
    // trained once per JVM per corpus; they must be indistinguishable from
    // retraining, or q229/q230 would gate a different model than advertised
    val (books, subDim, enc) = ExtQueries.stagedPqModel(spark, Sf0001)
    val (fBooks, fSubDim, fEnc) = Similarity.pqTrainEncode(
      embeds, subspaces = 8, codes = 16, iters = 2,
      idCol = "vec_id", vecCol = "embedding")
    assert(subDim === fSubDim)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq === fBooks.map(_.map(_.toSeq).toSeq).toSeq)
    def encRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(encRows(enc) === encRows(fEnc))
    val (centroids, cells) = ExtQueries.stagedIvfCoarse(spark, Sf0001)
    val fCtr = Similarity.ivfCentroids(embeds, cells = 16, iters = 2)
    assert(centroids.map(_.toSeq).toSeq === fCtr.map(_.toSeq).toSeq)
    def cellRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val fCells = Similarity.withNearestCell(
        embeds.select(col("vec_id"), col("embedding").as("v"),
          Similarity.norm(col("embedding")).as("__vn")),
        "v", "__vn", "vec_id", fCtr)
      .select(col("vec_id"), col("cell"))
    assert(cellRows(cells) === cellRows(fCells))
  }

  test("model-served PQ and IVFxPQ equal the train-inline paths exactly") {
    val queries = embeds.filter(col("vec_id") < 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id", "rank", "score_r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sorted.toSeq
    val (books, subDim, enc) = ExtQueries.stagedPqModel(spark, Sf0001)
    assert(rows(Similarity.pqTopKFromModel(
        embeds, queries, books, subDim, enc, k = 5, shortlist = 150))
      === rows(Similarity.pqTopK(embeds, queries, k = 5, shortlist = 150)))
    val (centroids, cells) = ExtQueries.stagedIvfCoarse(spark, Sf0001)
    assert(rows(Similarity.ivfPqFromModel(embeds, queries, centroids, cells,
        books, subDim, enc, k = 5, nprobe = 14, shortlist = 200))
      === rows(Similarity.ivfPqTopK(embeds, queries, k = 5, nprobe = 14,
        shortlist = 200)))
  }

  test("q397 JL sweep: one exact-ppm row per width, monotone fixture curve, byte law") {
    val rows = ExtQueries.q397JlSweep(spark, Sf0001).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(rows.keySet === Set(2, 8, 16, 32))
    // float32 projection storage: 4 bytes per kept dimension
    rows.foreach { case (d, (bytes, ppm)) =>
      assert(bytes === d * 4)
      assert(ppm >= 0L && ppm <= 1000000L)
    }
    // the curve's point: more projected dimensions cannot hurt THIS fixture
    // (deterministic md5 matrix + fixed corpus, so the values never move);
    // d=2 is the equal-bytes-with-PQ point where the projection collapses
    assert(rows(2)._2 < rows(32)._2,
      s"expected the 8-byte JL point far below the 128-byte point: $rows")
    assert(rows(16)._2 <= rows(32)._2)
  }

  test("q399 IVF nprobe sweep: nested probes give monotone candidates+recall, exhaustive endpoint") {
    val rows = ExtQueries.q399IvfNprobeSweep(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2, 4, 8, 12, 16))
    // rank <= p probe sets are NESTED in p, and the re-rank is exact cosine,
    // so candidates AND recall are monotone non-decreasing by construction —
    // a non-monotone row means the probe/assignment wiring broke
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._4 <= b._4, s"non-monotone sweep: $a -> $b")
    }
    // nprobe = cells = 16 probes everything: the scan is the full
    // |Q|·(N−1) brute force and recall is exactly 1
    val n = embeds.count()
    val (_, cand16, scan16, rec16) = rows.last
    assert(cand16 === 8L * (n - 1))
    assert(scan16 === 1000000L && rec16 === 1000000L)
  }

  test("q400 streamed IVF ingest equals the batch-built index: same pairs, cells, provenance") {
    val got = ExtQueries.q400StreamIvfIngest(spark, Sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(4)))
      .sorted.toSeq
    // per-query rank sets are contiguous 1..5
    assert(got.size === 40)
    assert(got.groupBy(_._2).forall { case (_, rs) => rs.map(_._3).sorted == Seq(1, 2, 3, 4, 5) })
    // the streamed index must be indistinguishable from building the same
    // index in one batch pass: batch-1 seed centroids, full-corpus
    // assignment, identical probe — streaming adds arrival provenance only
    val gate = Sampling.hashGate(col("vec_id"), 0.5)
    val centroids = Similarity.ivfCentroids(embeds.filter(gate), cells = 16, iters = 0)
    val inv = Similarity.withNearestCell(
      embeds.select(col("vec_id"), col("embedding").as("c_vec"),
        Similarity.norm(col("embedding")).as("c_norm")),
      "c_vec", "c_norm", "vec_id", centroids)
    val batchSide = Similarity.probeIvf(inv, embeds.filter(col("vec_id") < 8),
        centroids, k = 5, nprobe = 12, idCol = "vec_id", vecCol = "embedding")
      .select("q_id", "vec_id", "rank")
      .join(inv.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .join(embeds.select(col("vec_id"),
        when(gate, 0L).otherwise(1L).as("arrived_batch")), Seq("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .sorted.toSeq
    assert(got === batchSide)
  }

  test("q401 adaptive band: one row per query, band dominates nprobe=1 per query") {
    val rows = ExtQueries.q401AdaptiveProbe(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === (0L to 7L).toSet)
    rows.values.foreach { case (cells, cand, hits) =>
      assert(cells >= 1L && cells <= 16L) // the best cell is always in band
      assert(cand >= cells)               // every probed cell holds >= 1 row here
      assert(hits >= 0L && hits <= 5L)
    }
    // the band is a superset of the best cell, and the re-rank is exact, so
    // per-query hits can never fall below the fixed nprobe=1 policy's hits
    val centroids = Similarity.ivfCentroids(embeds, cells = 16, iters = 0)
    val inv = Similarity.withNearestCell(
      embeds.select(col("vec_id"), col("embedding").as("c_vec"),
        Similarity.norm(col("embedding")).as("c_norm")),
      "c_vec", "c_norm", "vec_id", centroids)
    val exact = ExtQueries.exactTop5(spark, Sf0001).select("q_id", "vec_id")
    val np1 = exact.intersect(
        Similarity.probeIvf(inv, embeds.filter(col("vec_id") < 8), centroids,
          k = 5, nprobe = 1, idCol = "vec_id", vecCol = "embedding")
          .select("q_id", "vec_id"))
      .groupBy("q_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 7L).foreach { qid =>
      assert(rows(qid)._3 >= np1.getOrElse(qid, 0L),
        s"band hits below nprobe=1 for query $qid")
    }
  }

  test("labelCentroidSeparation: hand-computed centroids and pair cosines") {
    import spark.implicits._
    // label 0: (1,0),(3,0) → centroid (2,0); label 1: (0,2),(0,2) → (0,2);
    // label 2: (1,1),(3,3) → (2,2). cos(0,1)=0, cos(0,2)=cos(1,2)=1/√2
    val rows = Seq(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(3f, 0f)),
      (3L, 1, Seq(0f, 2f)), (4L, 1, Seq(0f, 2f)),
      (5L, 2, Seq(1f, 1f)), (6L, 2, Seq(3f, 3f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.labelCentroidSeparation(rows).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got === Map((0, 1) -> 0.0, (0, 2) -> 0.7071, (1, 2) -> 0.7071))
  }

  test("staging scale gate: forced-parquet PQ/IVF models equal the in-memory path") {
    import graft.queries.Staging
    // sf0.001 sits below the gate, so the model accessors above served the
    // in-memory (localCheckpoint) path; forcing the threshold to 0 flips
    // them onto the parquet path — identical models either way
    assert(!Staging.stageToParquet(s"$Sf0001/embeddings.parquet"))
    def encRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    def cellRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val (mBooks, mSubDim, mEnc) = ExtQueries.stagedPqModel(spark, Sf0001)
    val (mCtr, mCells) = ExtQueries.stagedIvfCoarse(spark, Sf0001)
    val (mEncRows, mCellRows) = (encRows(mEnc), cellRows(mCells))
    val prev = sys.props.get("graft.staging.minBytes")
    try {
      sys.props("graft.staging.minBytes") = "0"
      assert(Staging.stageToParquet(s"$Sf0001/embeddings.parquet"))
      val (pBooks, pSubDim, pEnc) = ExtQueries.stagedPqModel(spark, Sf0001)
      assert(pSubDim === mSubDim)
      assert(pBooks.map(_.map(_.toSeq).toSeq).toSeq
        === mBooks.map(_.map(_.toSeq).toSeq).toSeq)
      assert(encRows(pEnc) === mEncRows)
      val (pCtr, pCells) = ExtQueries.stagedIvfCoarse(spark, Sf0001)
      assert(pCtr.map(_.toSeq).toSeq === mCtr.map(_.toSeq).toSeq)
      assert(cellRows(pCells) === mCellRows)
    } finally prev match {
      case Some(v) => sys.props("graft.staging.minBytes") = v
      case None => sys.props -= "graft.staging.minBytes"
    }
  }
}
