package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *   - brute-force cosine top-k: exact baseline. The QUERY side is broadcast
  *     (it's the small side by construction), so the candidate generation is
  *     a map-side nested loop over the corpus scan — no shuffle until the
  *     final per-query top-k reduction;
  *   - LSH-bucketed ANN (random hyperplane signatures): the scale path. Each
  *     vector gets a `planes`-bit signature; candidates share a bucket (plus
  *     optional 1-bit multiprobe for recall), so candidate count per query is
  *     ~corpus/2^planes instead of corpus.
  *
  * Per-pair arithmetic is the codegen'd [[graft.functions.VecDot]] /
  * [[graft.functions.VecNorm]] — one primitive loop per pair inside
  * whole-stage codegen, replacing the interpreter-only `aggregate(zip_with)`
  * HOF chain (CodegenFallback, ~128 boxed lambda calls per 64-dim pair).
  * The numeric contract is unchanged: elements widen to double and
  * accumulate sequentially, matching the DuckDB oracle's
  * `list_dot_product` on `DOUBLE[]` bit-for-bit (asserted against the HOF
  * formulation in VectorFunctionsSpec). Float arrays feed the expressions
  * directly — no materialized `array<double>` copy rides the broadcast.
  * Hyperplanes come from a fixed-seed RNG so runs are reproducible.
  */
object Similarity {
  import graft.functions.GraftFunctions.{vecDot, vecNorm}

  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def norm(a: Column): Column = vecNorm(a)

  /** Cosine similarity of two float/double-array columns, in double. */
  def cosine(a: Column, b: Column): Column = vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (self excluded), rank ties broken by vec_id
    * ascending.
    *
    * Scale shape: `broadcast(queries)` ⇒ BroadcastNestedLoopJoin — the
    * corpus is scanned once, partition-parallel — and the per-query top-k
    * reduction is the BOUNDED-STATE heap aggregate
    * ([[graft.functions.GraftFunctions.collectTopK]]): k struct elements of
    * state per (partition, query), heap-merged map-side, so only |Q|·k rows
    * cross the shuffle instead of the whole |Q|·|corpus| scored cross
    * product a `row_number()` window would sort. Ranked output comes from
    * sorting the k-element array (O(k log k), row-local). The heap keeps
    * the k LARGEST structs, so the vec_id tie-break is negated going in and
    * negated back coming out. For large |Q| switch to the LSH/IVF tiers —
    * same output contract.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {

    // Norms are computed once per ROW before the join, so the per-PAIR work
    // is a single codegen'd dot product — not the 3 array passes an inlined
    // cosine() would cost.
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_norm")))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    c.join(q, col("vec_id") =!= col("q_id"))
      .withColumn("score", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .groupBy("q_id")
      .agg(graft.functions.GraftFunctions.collectTopK(
        struct(col("score"), (-col("vec_id")).as("neg_id")), k).as("tk"))
      .select(col("q_id"), posexplode(sort_array(col("tk"), asc = false)))
      .select(col("q_id"), (-col("col.neg_id")).as("vec_id"),
        (col("pos") + 1).as("rank"),
        round(col("col.score"), 4).as("score_r"))
  }

  /** Deterministic Gaussian hyperplanes (fixed seed). */
  def randomPlanes(planes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-of-projection LSH signature (one bit per hyperplane); `vec` may
    * be float or double.
    */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        when(dot(vec, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** ANN top-k via multi-table hyperplane LSH (OR-amplification): `tables`
    * independent hash tables of `planesPerTable` bits each; a corpus row is
    * a candidate for a query if they share a bucket in ANY table (plus an
    * optional 1-bit multiprobe on the query side within each table). Exact
    * cosine re-ranking within candidates. Returns (q_id, vec_id, rank,
    * score_r) like the exact tier — recall < 1 by construction, asserted
    * >= 0.8 against the brute-force tier in SimilaritySpec.
    *
    * Recall math: if a neighbor agrees with the query on one plane with
    * probability p = 1 - θ/π, a table hits with ~p^m and ANY of L tables
    * with 1-(1-p^m)^L — L amplifies recall without loosening per-table
    * precision, which is why real ANN services index L tables rather than
    * probing one table harder.
    *
    * 100 TB shape: the corpus side explodes to L (table, bucket) rows — the
    * classic L-fold LSH index — but the vectors stay map-side: candidates
    * are scored on the broadcast-join side, only (q_id, vec_id, score)
    * triples cross the dedup + top-k shuffles.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      tables: Int = 16,
      planesPerTable: Int = 4,
      probeBits: Int = 1,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {

    val ps = randomPlanes(tables * planesPerTable, dim)
    def tablePlanes(t: Int): Seq[Seq[Double]] =
      ps.slice(t * planesPerTable, (t + 1) * planesPerTable)
    def sigArray(vec: Column): Column =
      array((0 until tables).map(t => lshSignature(vec, tablePlanes(t))): _*)

    val c = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm"),
        posexplode(sigArray(col(vecCol))).as(Seq("table", "bucket")))

    // query probes per table: own bucket + every non-empty flip mask of at
    // most probeBits bits (true t-bit multiprobe; probeBits=0 disables)
    val flips: Seq[Column] =
      (1 until (1 << planesPerTable))
        .filter(m => java.lang.Integer.bitCount(m) <= probeBits)
        .map(m => lit(m.toLong))
    val q = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_norm"),
        posexplode(sigArray(col(vecCol))).as(Seq("table", "sig")))
      .withColumn("bucket",
        explode(array((lit(0L) +: flips).map(f => col("sig").bitwiseXOR(f)): _*)))
      .select("q_id", "q_vec", "q_norm", "table", "bucket")

    // a pair can collide in several tables → dedup, but only after scoring
    // and projecting down to the 3-column triple (vectors never shuffle)
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id").asc)
    c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .select("q_id", "vec_id", "score")
      .dropDuplicates("q_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), round(col("score"), 4).as("score_r"))
  }

  // ---------------- scalar quantization ----------------

  /** Per-vector SQ8 model: (mn, mx, codes) — 8-bit scalar quantization, the
    * standard 4x storage cut for embedding columns at rest (FAISS "SQ8").
    * Codes come from the codegen'd [[graft.functions.VecSq8]] (floor
    * arithmetic — integer-exact across engines); reconstruction is
    * `mn + code · (mx − mn) / 255`, worst-case error (mx − mn) / 510 per
    * element. Per-row, shuffle-free.
    */
  def sq8(vec: Column): Column = {
    val mn = array_min(vec).cast("double")
    val mx = array_max(vec).cast("double")
    struct(mn.as("mn"), mx.as("mx"),
      graft.functions.GraftFunctions.vecSq8(vec, mn, mx).as("codes"))
  }

  // ---------------- IVF (inverted-file) ANN ----------------

  /** Train IVF centroids with Lloyd iterations over (optionally sampled)
    * corpus vectors, maximizing cosine similarity (spherical k-means shape).
    *
    * Scale notes: the returned model is O(cells × dim) doubles — a MODEL,
    * not data, so collecting it to the driver is the standard k-means
    * contract (Spark MLlib does the same). Each iteration is one
    * shuffle: explode to (cell, dim_pos, value), mean per (cell, pos),
    * collect cells×dim rows. Training reads the sampled fraction only;
    * seeds are the `cells` vectors with the smallest md5-hashed ids —
    * deterministic and hash-spread, no data-order sensitivity.
    */
  def ivfCentroids(
      corpus: DataFrame,
      cells: Int,
      iters: Int = 2,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {

    val train0 = if (trainFraction < 1.0) corpus.sample(withReplacement = false, trainFraction, seed = 42L) else corpus
    val train = train0.select(col(idCol).as("id"), col(vecCol).as("v"))

    var centroids: Array[Array[Double]] = train
      .select(col("id"), col("v"), md5(col("id").cast("string")).as("h"))
      .orderBy("h").limit(cells)
      .select(transform(col("v"), _.cast("double")).as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)

    (0 until iters).foreach { _ =>
      val assigned = withNearestCell(
        train.withColumn("__vn", norm(col("v"))), "v", "__vn", "id", centroids)
        .select(col("cell"), col("v"))
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
          case None => centroids(c) // empty cell keeps its seed
        }
      }.toArray
    }
    centroids
  }

  /** The centroid MODEL as a broadcast relation (cell, ctr, ctr_norm) — not
    * as literal expressions. A per-centroid `struct(dot(vec, typedLit(ctr)))`
    * branch puts O(cells) subtrees in the plan: fine at cells≈O(100), but at
    * the cells ≈ √N a 100 TB index wants (tens of thousands) the generated
    * plan/codegen blows up long before the data does. A broadcast relation
    * scales with executor memory instead of plan size, and the argmin
    * becomes a join + aggregate that Catalyst plans normally. Centroid norms
    * are computed HERE with the same [[norm]] expression rows use, so
    * assignment arithmetic is bit-identical to scoring arithmetic.
    */
  private[ext] def centroidRelation(
      spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    broadcast(
      centroids.zipWithIndex.map { case (ctr, c) => (c, ctr.toSeq) }.toSeq
        .toDF("__cell", "__ctr")
        .withColumn("__ctr_norm", norm(col("__ctr"))))
  }

  /** Append the nearest-centroid `cell` (argmax cosine, ties to the lowest
    * cell id) to every row of `df`: a BroadcastNestedLoopJoin against the
    * centroid relation scores all cells per row — the N×cells dot products
    * ANY assignment must do, map-side and codegen'd — and a lexicographic
    * `min(struct(d, cell))` aggregate on the unique `keyCol` takes the
    * argmin (struct min orders by d, then cell — the deterministic
    * tie-break). The partial aggregate collapses map-side (rows for one key
    * are consecutive out of the nested-loop join), so the exchange carries
    * one row per input row; at scale that shuffle is folded into the
    * cell-clustered write/layout the inverted file wants anyway.
    *
    * `normCol` must hold `norm(vecCol)` (precomputed once per row, not per
    * row×cell); `keyCol` must be unique per row — remaining columns ride
    * through `first(...)`.
    */
  private[ext] def withNearestCell(
      df: DataFrame,
      vecCol: String,
      normCol: String,
      keyCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val carry = df.columns.filterNot(_ == keyCol).toSeq
    df.crossJoin(centroidRelation(df.sparkSession, centroids))
      .withColumn("__d",
        -dot(col(vecCol), col("__ctr")) / (col(normCol) * col("__ctr_norm")))
      .groupBy(col(keyCol))
      .agg(min(struct(col("__d"), col("__cell"))).as("__m"),
        carry.map(c => first(col(c)).as(c)): _*)
      .select((df.columns.toSeq.map(col) :+ col("__m.__cell").as("cell")): _*)
  }

  /** ANN top-k via an inverted-file index: corpus rows live in the cell of
    * their nearest centroid; each query probes its `nprobe` closest cells
    * and exact cosine re-ranks the candidates. Output shape matches the
    * exact tier; recall < 1 by construction (asserted >= 0.8 vs brute force
    * in SimilaritySpec). The nprobe/cells defaults are tuned for weakly
    * clustered corpora (the driver's synthetic embeddings are near-uniform,
    * the hardest case for IVF); a clustered real-world corpus supports a
    * much smaller probe fraction.
    *
    * 100 TB shape: centroids are a broadcast-sized model (cells × dim); the
    * corpus is scanned once to assign cells (map-side, codegen'd dot
    * products); candidate generation is an equi-join on the cell id with
    * the query side broadcast, so ~nprobe/cells of the corpus is scored per
    * query and vectors never cross a shuffle. A real deployment would
    * PERSIST the assigned corpus (the inverted file) and reuse it across
    * query batches — here it is recomputed because each query entry is a
    * fresh pipeline.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 8,
      iters: Int = 2,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {

    val centroids = ivfCentroids(corpus, cells, iters, trainFraction, idCol, vecCol)
    val c = withNearestCell(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm")),
      "c_vec", "c_norm", "vec_id", centroids)
    probeIvf(c, queries, centroids, k, nprobe, idCol, vecCol)
  }

  /** FILTERED ANN (pre-filtered vector search): [[ivfTopK]] restricted to
    * corpus rows satisfying `predicate` — the vector-database feature
    * ("nearest neighbors WHERE label = X") that naive post-filtering gets
    * wrong (filtering the top-k AFTER an unfiltered search returns fewer
    * than k rows whenever the filter is selective). The centroid model is
    * trained on the FULL corpus — the shared index of a production
    * deployment, where one inverted file serves every predicate — and the
    * filter is applied to the inverted file BEFORE probing, exactly like a
    * metadata bitmap filter on the postings: candidates that fail the
    * predicate are never scored. Cell assignment is per-row deterministic,
    * so filtering the assigned corpus equals filtering a materialized
    * inverted file.
    *
    * Filtered recall needs a wider probe than unfiltered: a selective
    * predicate thins each cell, so a true neighbor's cell is easier to
    * miss — callers should raise `nprobe` as selectivity rises (the gate
    * query runs 14/16).
    */
  def ivfTopKWhere(
      corpus: DataFrame,
      queries: DataFrame,
      predicate: Column,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 14,
      iters: Int = 2,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroids = ivfCentroids(corpus, cells, iters, trainFraction, idCol, vecCol)
    val assigned = withNearestCell(
      corpus.filter(predicate)
        .select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
          norm(col(vecCol)).as("c_norm")),
      "c_vec", "c_norm", "vec_id", centroids)
    probeIvf(assigned, queries, centroids, k, nprobe, idCol, vecCol)
  }

  /** Johnson–Lindenstrauss random-projection ANN (Achlioptas 2003's
    * database-friendly ±1 projections): every vector is projected to
    * `outDims` dimensions through a DATA-INDEPENDENT sign matrix — entry
    * (j, i) is the md5 parity of "j#i", so the matrix is a pure function
    * of its indices: any executor, the oracle, and a future session all
    * derive the identical matrix with no model to store or ship. A
    * `shortlist` of nearest candidates is found in projected space and
    * exact cosine re-ranks it to the final top-k — the JL usage pattern
    * when the metric must stay exact (the projection only PRUNES).
    * Distinct from the other compression tiers: LSH (q31) keeps one BIT
    * per hyperplane, PQ (q229) is data-dependent (trained codebooks),
    * Matryoshka (q340) truncates learned prefixes; JL is the
    * training-free dense projection with the distance-preservation
    * guarantee (distortion ~ √(ln n / outDims)).
    *
    * 100 TB shape: projection is one map-side pass (outDims codegen'd
    * dot products per row — no shuffle, no model broadcast); the
    * projected shortlist reuses the brute-force bounded-heap shape
    * ([[graft.functions.GraftFunctions.collectTopK]] — |Q|·shortlist
    * rows cross the shuffle, never |Q|·|corpus|) but over outDims-wide
    * vectors (4× fewer multiplies at the 64→16 default); only
    * `shortlist` raw vectors per query are re-fetched for the exact
    * re-rank (an id equi-join).
    */
  def jlTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      outDims: Int = 16,
      shortlist: Int = 150,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val signs: Seq[Seq[Double]] = (0 until outDims).map { j =>
      (0 until dim).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$j#$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = md.map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0
        else -1.0
      }
    }
    def proj(vec: Column): Column =
      array(signs.map(s => dot(vec, typedLit(s))): _*)
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"), proj(col(vecCol)).as("c_p"))
      .withColumn("c_pn", norm(col("c_p")))
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_norm"), proj(col(vecCol)).as("q_p"))
        .withColumn("q_pn", norm(col("q_p"))))
    val cand = c.join(q, col("vec_id") =!= col("q_id"))
      .withColumn("ps",
        dot(col("q_p"), col("c_p")) / (col("q_pn") * col("c_pn")))
      .groupBy("q_id")
      .agg(graft.functions.GraftFunctions.collectTopK(
        struct(col("ps"), (-col("vec_id")).as("neg_id")), shortlist).as("tk"))
      .select(col("q_id"), explode(col("tk.neg_id")).as("neg_id"))
      .select(col("q_id"), (-col("neg_id")).as("vec_id"))
    cand
      .join(c.select(col("vec_id"), col("c_vec"), col("c_norm")), Seq("vec_id"))
      .join(q.select(col("q_id"), col("q_vec"), col("q_norm")), Seq("q_id"))
      .withColumn("score",
        dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .groupBy("q_id")
      .agg(graft.functions.GraftFunctions.collectTopK(
        struct(col("score"), (-col("vec_id")).as("neg_id")), k).as("tk"))
      .select(col("q_id"), posexplode(sort_array(col("tk"), asc = false)))
      .select(col("q_id"), (-col("col.neg_id")).as("vec_id"),
        (col("pos") + 1).as("rank"),
        round(col("col.score"), 4).as("score_r"))
  }

  /** Product-quantization ANN: split every vector into `subspaces` equal
    * slices, learn a tiny per-subspace codebook (`codes` centroids, the
    * same Lloyd trainer as IVF), encode the corpus as `subspaces` small
    * integers — a 64-dim float vector compresses to 8 bytes at the
    * defaults — and answer queries by ADC (asymmetric distance
    * computation): one (query × subspace × code) lookup table of partial
    * dot products scores every encoded vector WITHOUT touching raw
    * floats, a `shortlist` of best approximate candidates is then exact
    * re-ranked to the final top-k. The standard memory-bound ANN tier
    * (IVF prunes WHICH vectors to score; PQ shrinks WHAT is stored and
    * scored — production systems compose them).
    *
    * Approximate cosine: v̂ = concat of its subspace centroids, so
    * score = Σₛ dot(qₛ, ctrₛ) / (‖q‖·√Σₛ‖ctrₛ‖²) — numerator from the
    * LUT, denominator from per-code norms carried on the encoding.
    *
    * 100 TB shape: codebooks are a driver-model (subspaces × codes ×
    * subdim ≈ KBs); encoding is one broadcast-join pass per subspace over
    * the corpus (at scale: one combined pass keyed (sub, code)); the LUT
    * is |queries|·subspaces·codes rows broadcast; ADC scoring shuffles
    * only (q_id, vec_id, partials) with map-side combine; the shortlist
    * is a bounded [[graft.functions.GraftFunctions.collectTopK]] heap and
    * only `shortlist` raw vectors per query are ever fetched for the
    * exact re-rank. Recall is gated like every approximate tier (q229).
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      subspaces: Int = 8,
      codes: Int = 16,
      shortlist: Int = 50,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (books, subDim, enc) = pqTrainEncode(corpus, subspaces, codes, iters, idCol, vecCol)
    pqTopKFromModel(corpus, queries, books, subDim, enc, k, shortlist, idCol, vecCol)
  }

  /** [[pqTopK]] served from a PRE-TRAINED model — the deployment shape,
    * where codebooks are trained once per corpus version and every query
    * batch pays only ADC scoring + the exact re-rank. `books`/`subDim`/
    * `enc` come from [[pqTrainEncode]] over the SAME corpus (q229 serves
    * from a per-JVM staged model; equivalence to the train-inline path is
    * asserted in SimilaritySpec).
    */
  def pqTopKFromModel(
      corpus: DataFrame,
      queries: DataFrame,
      books: Array[Array[Array[Double]]],
      subDim: Int,
      enc: DataFrame,
      k: Int,
      shortlist: Int = 50,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    pqAdcRerank(corpus, queries, enc, books, subDim, k, shortlist, idCol, vecCol)

  /** IVF × PQ — the two ANN tiers COMPOSED, the faiss-style production
    * architecture: IVF prunes WHICH vectors are scored (only the
    * `nprobe` cells nearest each query), PQ shrinks WHAT scoring costs
    * (ADC over 8-byte codes instead of raw floats), and the surviving
    * shortlist is exact re-ranked. At 100 TB the inverted file is the
    * cell-partitioned layout [[writeIvfIndex]] persists and the codes ride
    * in it — the scan prunes to nprobe/cells of the corpus AND never
    * reads raw vectors until the re-rank fetch.
    *
    * Because each stage discards true neighbors independently, recall
    * multiplies (~0.9 × ~0.9 at these defaults on the near-uniform
    * synthetic corpus); the q230 gate sizes nprobe/shortlist to hold the
    * composed bound.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 12,
      subspaces: Int = 8,
      codes: Int = 16,
      shortlist: Int = 150,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // coarse quantizer: corpus → cells
    val centroids = ivfCentroids(corpus, cells, iters, 1.0, idCol, vecCol)
    val corpusCells = withNearestCell(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("__vn")),
      "v", "__vn", "vec_id", centroids)
      .select(col("vec_id"), col("cell"))
    // fine quantizer: PQ codes
    val (books, subDim, encAll) = pqTrainEncode(corpus, subspaces, codes, iters, idCol, vecCol)
    ivfPqFromModel(corpus, queries, centroids, corpusCells, books, subDim,
      encAll, k, nprobe, shortlist, idCol, vecCol)
  }

  /** [[ivfPqTopK]] served from PRE-BUILT models — the deployment shape:
    * coarse centroids + the (vec_id, cell) inverted assignment + PQ
    * codebooks/encoding are authored once per corpus version, and a query
    * batch pays only the probe, the restricted ADC and the exact re-rank.
    * All model pieces must come from [[ivfCentroids]]/[[withNearestCell]]/
    * [[pqTrainEncode]] over the SAME corpus (q230 serves from per-JVM
    * staged models; equivalence to the train-inline path is asserted in
    * SimilaritySpec).
    */
  def ivfPqFromModel(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Double]],
      corpusCells: DataFrame,
      books: Array[Array[Array[Double]]],
      subDim: Int,
      encAll: DataFrame,
      k: Int,
      nprobe: Int = 12,
      shortlist: Int = 150,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // each query probes its nprobe nearest cells (model-sized relation)
    val qRows = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val probed = broadcast(qRows
      .crossJoin(centroidRelation(corpus.sparkSession, centroids))
      .withColumn("__d",
        -dot(col("q_vec"), col("__ctr")) / (col("q_norm") * col("__ctr_norm")))
      .groupBy("q_id")
      .agg(graft.functions.GraftFunctions.collectTopK(
        struct((-col("__d")).as("s"), col("__cell").as("cell")), nprobe).as("tk"))
      .select(col("q_id"), explode(col("tk.cell")).as("cell")))
    // ADC restricted to probed (q, cell) pairs
    val enc = encAll
      .join(corpusCells, Seq("vec_id"))
      .join(probed, Seq("cell"))  // expands enc rows per probing query
      .select(col("vec_id"), col("sub"), col("code"), col("q_id"))
    pqAdcRerank(corpus, queries, enc, books, subDim, k, shortlist, idCol, vecCol,
      restricted = true)
  }

  /** Train per-subspace PQ codebooks AND encode the corpus in one
    * exploded layout: every row becomes `subspaces` (vec_id, sub, slice)
    * rows, so each Lloyd round is ONE broadcast join + ONE aggregation
    * over all subspaces simultaneously (the naive per-subspace loop costs
    * `subspaces` full passes per round plus 3·subspaces driver
    * round-trips — measured 8× slower at these defaults). Returns
    * (codebooks, subDim, (vec_id, sub, code) encoding). The encoding is
    * localCheckpoint'd (it is id-sized) so the exploded staging persist
    * can be released before returning.
    */
  private[ext] def pqTrainEncode(
      corpus: DataFrame, subspaces: Int, codes: Int, iters: Int,
      idCol: String, vecCol: String): (Array[Array[Array[Double]]], Int, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % subspaces == 0, s"dim $dim must split into $subspaces subspaces")
    val subDim = dim / subspaces
    val sliced = corpus.select(col(idCol).as("vec_id"),
      posexplode(expr(
        s"transform(sequence(0, ${subspaces - 1}), s -> slice($vecCol, s * $subDim + 1, $subDim))"))
        .as(Seq("sub", "sv")))
      .withColumn("__vn", norm(col("sv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // init: per subspace, `codes` seeds in md5(id) order (the same
      // deterministic-init convention as ivfCentroids)
      val w = Window.partitionBy("sub")
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      var books: Array[Array[Array[Double]]] = {
        val rows = sliced
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= codes)
          .select(col("sub"), (col("rn") - 1).as("cell"),
            transform(col("sv"), _.cast("double")).as("v"))
          .collect()
        val bySub = rows.groupBy(_.getInt(0))
        (0 until subspaces).toArray.map { s =>
          bySub(s).sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
        }
      }
      def bookRel(b: Array[Array[Array[Double]]]): DataFrame = broadcast(
        b.zipWithIndex.flatMap { case (book, s) =>
          book.zipWithIndex.map { case (ctr, c) => (s, c, ctr.toSeq) }
        }.toSeq.toDF("sub", "__cell", "__ctr")
          .withColumn("__ctr_norm", norm(col("__ctr"))))
      // one broadcast-join argmin per round, all subspaces at once
      def assign(b: Array[Array[Array[Double]]]): DataFrame = sliced
        .join(bookRel(b), Seq("sub"))
        .withColumn("__d",
          -dot(col("sv"), col("__ctr")) / (col("__vn") * col("__ctr_norm")))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("__d"), col("__cell"))).as("__m"),
          first(col("sv")).as("sv"))
        .select(col("vec_id"), col("sub"), col("__m.__cell").as("cell"), col("sv"))
      (0 until iters).foreach { _ =>
        val means = assign(books)
          .select(col("sub"), col("cell"), posexplode(col("sv")).as(Seq("pos", "x")))
          .groupBy("sub", "cell", "pos")
          .agg(avg(col("x").cast("double")).as("m"))
          .collect()
        val bySubCell = means.groupBy(r => (r.getInt(0), r.getInt(1)))
        books = books.zipWithIndex.map { case (book, s) =>
          book.zipWithIndex.map { case (ctr, c) =>
            bySubCell.get((s, c)) match {
              case Some(rows) => rows.sortBy(_.getInt(2)).map(_.getDouble(3))
              case None => ctr // empty cell keeps its seed
            }
          }
        }
      }
      val enc = assign(books)
        .select(col("vec_id"), col("sub"), col("cell").as("code"))
        .localCheckpoint()
      (books, subDim, enc)
    } finally sliced.unpersist(false)
  }

  /** ADC scoring + bounded shortlist + exact re-rank. `enc` carries
    * (vec_id, sub, code) — or, when `restricted`, (vec_id, sub, code,
    * q_id) rows already limited to each query's candidate set (the IVF
    * prune), in which case the LUT join also keys on q_id.
    */
  private[ext] def pqAdcRerank(
      corpus: DataFrame, queries: DataFrame, enc: DataFrame,
      books: Array[Array[Array[Double]]], subDim: Int, k: Int, shortlist: Int,
      idCol: String, vecCol: String, restricted: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bookDf = broadcast(books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (ctr, c) => (s, c, ctr.toSeq) }
    }.toSeq.toDF("sub", "code", "ctr"))
    val codeNorm2 = broadcast(books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (ctr, c) => (s, c, ctr.map(x => x * x).sum) }
    }.toSeq.toDF("sub", "code", "cn2"))
    val qRows = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    // ADC lookup table: partial dot of each query slice with each code
    val lut = broadcast(qRows.crossJoin(bookDf)
      .select(col("q_id"), col("q_norm"), col("sub"), col("code"),
        dot(slice(col("q_vec"), col("sub") * lit(subDim) + lit(1), lit(subDim)),
          col("ctr")).as("pd")))
    val lutKeys = if (restricted) Seq("sub", "code", "q_id") else Seq("sub", "code")
    val scored = enc.join(codeNorm2, Seq("sub", "code"))
      .join(lut, lutKeys)
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("pd")).as("num"), sum(col("cn2")).as("vn2"),
        first(col("q_norm")).as("qn"))
      .withColumn("approx", col("num") / (col("qn") * sqrt(col("vn2"))))
    val short = scored
      .groupBy("q_id")
      .agg(graft.functions.GraftFunctions.collectTopK(
        struct(col("approx"), (-col("vec_id")).as("neg_id")), shortlist).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("t"))
      .select(col("q_id"), (-col("t.neg_id")).as("vec_id"))
    // exact re-rank of the shortlist only
    val cvec = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    short.join(cvec, Seq("vec_id"))
      .join(broadcast(qRows), Seq("q_id"))
      .withColumn("score",
        dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .groupBy("q_id")
      .agg(graft.functions.GraftFunctions.collectTopK(
        struct(col("score"), (-col("vec_id")).as("neg_id")), k).as("tk"))
      .select(col("q_id"), posexplode(sort_array(col("tk"), asc = false)))
      .select(col("q_id"), (-col("col.neg_id")).as("vec_id"),
        (col("pos") + 1).as("rank"),
        round(col("col.score"), 4).as("score_r"))
  }

  /** Hard-negative mining for contrastive training: for each query vector,
    * the top-k most similar corpus vectors with a DIFFERENT label — the
    * negatives that actually teach a metric-learning model something
    * (random negatives are trivially far; these sit just across the
    * decision boundary). The exact tier of the miner: same bounded-heap
    * shape as [[bruteForceTopK]] with the label inequality folded into
    * the join predicate, so disqualified pairs die before the dot
    * product; at 100 TB the candidate side narrows through [[ivfTopK]] /
    * [[pqTopK]] first and this runs on the shortlist.
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"), col(labelCol).as("q_label")))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"), col(labelCol).as("c_label"))
    c.join(q, col("vec_id") =!= col("q_id") && col("c_label") =!= col("q_label"))
      .withColumn("score",
        dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .groupBy("q_id")
      .agg(first(col("q_label")).as("q_label"),
        graft.functions.GraftFunctions.collectTopK(
          struct(col("score"), (-col("vec_id")).as("neg_id")), k).as("tk"))
      .select(col("q_id"), col("q_label"),
        posexplode(sort_array(col("tk"), asc = false)))
      .select(col("q_id"), col("q_label").cast("long").as("q_label"),
        (-col("col.neg_id")).as("vec_id"),
        (col("pos") + 1).as("rank"), round(col("col.score"), 4).as("score_r"))
  }

  /** Build and persist the IVF index of a corpus version: the centroid
    * MODEL (cells × dim, a parquet table of (cell, ctr)) and the INVERTED
    * FILE — every corpus vector with its precomputed norm, written
    * cell-PARTITIONED parquet. Probing with [[ivfTopKIndexed]] then reads
    * only the probed cells (a broadcast equi-join on the partition column —
    * dynamic partition pruning skips the rest of the corpus at the SCAN,
    * the property that makes IVF pay at 100 TB), and the k-means training
    * plus assignment cost is paid once per corpus version instead of per
    * query batch.
    */
  def writeIvfIndex(
      corpus: DataFrame,
      path: String,
      cells: Int = 16,
      iters: Int = 2,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = ivfCentroids(corpus, cells, iters, trainFraction, idCol, vecCol)
    centroids.zipWithIndex.map { case (ctr, c) => (c, ctr.toSeq) }.toSeq
      .toDF("cell", "ctr")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    withNearestCell(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm")),
      "c_vec", "c_norm", "vec_id", centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/invfile")
  }

  /** Incremental INSERT into a persisted IVF index: new vectors are
    * assigned to cells with the SAVED centroid model (no retrain) and
    * appended to the inverted file's cell partitions — the standard ANN
    * index lifecycle (FAISS `add` after `train`): per-batch cost is
    * proportional to the batch, and concurrent probes keep working because
    * parquet appends are new files in existing partitions. Centroids go
    * stale as the distribution drifts — recall degrades gracefully, and the
    * periodic full [[writeIvfIndex]] rebuild is the production answer, not
    * per-batch retraining (which would invalidate every existing cell
    * assignment).
    */
  def appendToIvfIndex(
      newVectors: DataFrame,
      indexPath: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val centroids = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    withNearestCell(
      newVectors.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm")),
      "c_vec", "c_norm", "vec_id", centroids)
      .write.mode("append").partitionBy("cell").parquet(s"$indexPath/invfile")
  }

  /** ANN top-k probing a [[writeIvfIndex]]-persisted index — identical
    * semantics to [[ivfTopK]] with the same training parameters (asserted
    * in SimilaritySpec; centroid training is seeded, so the two paths
    * produce the same model), with corpus assignment read from the
    * inverted file instead of recomputed.
    */
  def ivfTopKIndexed(
      queries: DataFrame,
      indexPath: String,
      k: Int,
      nprobe: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val centroids = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    val c = spark.read.parquet(s"$indexPath/invfile")
    probeIvf(c, queries, centroids, k, nprobe, idCol, vecCol)
  }

  /** Shared probe core of [[ivfTopK]] / [[ivfTopKIndexed]]: `c` is the
    * inverted file (vec_id, c_vec, c_norm, cell), inline or from parquet.
    */
  /** Per-query nprobe nearest cells — (q_id, q_vec, q_norm, cell), one row
    * per probed cell: the (small) query side scores every centroid through
    * the same broadcast relation, then rank <= nprobe — |Q|×cells
    * intermediate rows on the broadcast-bound side, never the corpus.
    * `private[ext]` so the q399 sweep can count the candidate scan each
    * probe setting induces with the SAME relation the probe itself uses.
    */
  private[ext] def probedCells(
      queries: DataFrame,
      centroids: Array[Array[Double]],
      nprobe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val pw = Window.partitionBy("q_id").orderBy(col("__d").asc, col("__cell").asc)
    queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_norm"))
      .crossJoin(centroidRelation(queries.sparkSession, centroids))
      .withColumn("__d",
        -dot(col("q_vec"), col("__ctr")) / (col("q_norm") * col("__ctr_norm")))
      .withColumn("__r", row_number().over(pw))
      .filter(col("__r") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("q_norm"), col("__cell").as("cell"))
  }

  private[ext] def probeIvf(
      c: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Double]],
      k: Int,
      nprobe: Int,
      idCol: String,
      vecCol: String): DataFrame = {
    val q = probedCells(queries, centroids, nprobe, idCol, vecCol)
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id").asc)
    c.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .select("q_id", "vec_id", "score")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), round(col("score"), 4).as("score_r"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): within each
    * embedding cluster, drop every vector that has a near-duplicate
    * (cosine >= `threshold`) with a smaller id, keeping the cluster's
    * lowest-id representative of each near-dup relation. `blockCol` is the
    * cluster id (here the corpus ships one; in production it comes from
    * [[ivfCentroids]]-style k-means over the same embeddings).
    *
    * Scale shape: candidate generation is [[cosineNearDupPairs]] — bucketed
    * on (cluster, id-window), never O(cluster²) — and the removal set is a
    * LEFT ANTI join on the id, so full vectors never shuffle twice: the
    * pair join moves (id, vec) once, the anti join moves ids only.
    */
  def semanticDedup(
      vectors: DataFrame,
      blockCol: String,
      threshold: Double,
      window: Long = 200L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val removed = cosineNearDupPairs(vectors, blockCol, threshold, window, idCol, vecCol)
      .select(col("id_b").as(idCol)).distinct()
    vectors.join(removed, Seq(idCol), "left_anti")
  }

  /** k-NN label classification: each query vector is classified by the
    * majority label of its `k` nearest corpus neighbors (exact cosine tier;
    * self excluded). Vote ties break to the smaller label — integer-only,
    * so the prediction is deterministic across engines. The standard
    * embedding-quality probe a data pipeline runs after (re)training an
    * encoder.
    *
    * Scale shape: inherits [[bruteForceTopK]]'s broadcast-query plan, then
    * two label-sized aggregations; for large query sets substitute the LSH
    * or IVF tier as the neighbor source — the vote logic is unchanged.
    */
  def knnClassify(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      labelCol: String = "label",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val labels = corpus.select(col(idCol).as("vec_id"), col(labelCol).as("n_label"))
    val votes = bruteForceTopK(corpus, queries, k, idCol, vecCol)
      .join(labels, "vec_id")
      .groupBy("q_id", "n_label")
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("q_id").orderBy(col("votes").desc, col("n_label").asc)
    val pred = votes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("n_label").as("pred_label"), col("votes"))
    pred
      .join(queries.select(col(idCol).as("q_id"), col(labelCol).as("true_label")), "q_id")
      .select(col("q_id"), col("true_label"), col("pred_label"), col("votes"),
        (col("pred_label") === col("true_label")).cast("int").as("correct"))
  }

  /** Per-label centroids in SQ8 code space: vectors are quantized row-local
    * (bit-exact integer codes, see [[sq8]]), then averaged per (label, dim)
    * in exact integer arithmetic — `(10000·Σcode) div n` — so the centroid
    * summary is engine-exact where a float mean would be summation-order
    * dependent. The cluster-profile / class-prototype shape over an
    * embedding corpus.
    *
    * Scale shape: one shuffle on (label, dim) with map-side combine; output
    * is labels × dim rows — a model-sized result regardless of corpus size.
    */
  def sq8Centroids(
      vectors: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    vectors
      .select(col(labelCol).as("label"),
        posexplode(sq8(col(vecCol)).getField("codes")).as(Seq("dim", "code")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum("code").as("code_sum"))
      .select(col("label"), col("dim"), col("n"), col("code_sum"),
        expr("(10000 * code_sum) div n").as("code_mean_4"))

  /** Embedding near-duplicate pairs within a blocking key and id window —
    * the cosine tier of the dedup ladder (see [[Dedup]]).
    *
    * As in [[Dedup.ngramJaccardPairs]], the id window is part of the join
    * key: ids are bucketed at `window` granularity and the left side probes
    * its own and the next bucket, so a qualifying pair is generated exactly
    * once and candidate count stays O(rows × bucket population) regardless
    * of `blockCol` skew — never O(block²).
    */
  def cosineNearDupPairs(
      vectors: DataFrame,
      blockCol: String,
      threshold: Double,
      window: Long = 200L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {

    val a = vectors
      .select(col(blockCol).as("block"), col(idCol).as("id_a"), col(vecCol).as("v_a"),
        norm(col(vecCol)).as("n_a"))
      .withColumn("id_bucket",
        explode(array(expr(s"id_a div $window"), expr(s"id_a div $window + 1"))))
    val b = vectors
      .select(col(blockCol).as("block"), col(idCol).as("id_b"), col(vecCol).as("v_b"),
        norm(col(vecCol)).as("n_b"))
      .withColumn("id_bucket", expr(s"id_b div $window"))
    a.join(b, Seq("block", "id_bucket"))
      .filter((col("id_b") - col("id_a")).between(lit(1), lit(window)))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select(col("block"), col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_r"))
  }

  /** Label-centroid separation matrix: per-label embedding centroids and
    * the pairwise cosine between them — the label-quality audit run before
    * training a classifier head (two labels whose centroids sit at
    * cos ≈ 1 are either synonyms or mislabeled; a label far from all
    * others is either clean or broken). Output is the unordered label-pair
    * matrix with `cos_r` rounded to 4 dp (the engine's aggregated-double
    * convention).
    *
    * Scale shape: ONE pass over the vectors — posexplode to (label, pos)
    * components, partial-aggregated shuffle on (label, pos) (≤ |labels|·dim
    * groups); everything after (centroid assembly, the pair join, the
    * cosine HOFs) runs on the MODEL-sized centroid table (|labels| rows),
    * where the deliberate non-equi pair join and interpreter-only
    * higher-order functions cost |labels|²·dim multiplications, not a
    * data-sized pass.
    */
  def labelCentroidSeparation(
      vectors: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val comp = vectors
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      // sum/count rather than avg, so the oracle's replay is the same
      // expression tree (avg would be sum/count anyway — spelled out)
      .agg((sum(col("x").cast("double")) / count(lit(1))).as("m"))
    val cent = comp.groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("c"))
    val a = cent.select(col("label").as("label_a"), col("c").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("c").as("cb"))
    def dotHof(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), 0D, (acc, v) -> acc + v)"
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        expr(s"round(${dotHof("ca", "cb")} / " +
          s"(sqrt(${dotHof("ca", "ca")}) * sqrt(${dotHof("cb", "cb")})), 4)").as("cos_r"))
  }
}
