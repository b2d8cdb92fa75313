package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over edge lists — the iterative-join family of
  * operators (the engine's connected components lives in
  * [[Dedup.duplicateClusters]]; this adds the importance measure).
  *
  * PageRank here is FIXED-POINT INTEGER PageRank: scores are integers at a
  * caller-chosen `scale`, the damping factor is an exact rational
  * `dampNum/dampDen`, and every per-edge contribution is integer floor
  * division — so the result is bit-exact across engines and runs, and the
  * DuckDB oracle can replay the iterations verbatim (the float formulation
  * accumulates join-order ulps and cannot be hash-gated). The cost of
  * exactness: each division floors away at most `outdeg − 1` units of
  * mass per node per iteration (at scale 2^20, relative loss < 2^-10 for
  * outdeg < 1024), and dangling nodes (no out-edges) leak their damped
  * mass instead of teleporting — both deterministic, both documented
  * behavior of this operator, not noise.
  *
  * Scale shape per iteration: one join edges⋈scores on src (both sides
  * hash-partitioned on src; outdeg rides the same key), one shuffle on dst
  * for the contribution sum with map-side partials, one left join back to
  * the node set. 3 iterations = 3 rounds of that — the standard Pregel
  * round shape, no driver-side state ([[Dedup.duplicateClusters]]'s
  * checkpoint guidance applies to long chains; at the typical 3-20
  * PageRank rounds the lineage stays shallow).
  */
object Graph {

  /** `iters` rounds of integer PageRank over `edges` (src → dst, parallel
    * edges allowed — they weight the contribution like a multigraph).
    * Returns (node, score) for every node appearing as src or dst.
    *
    * score_0 = scale; score_{t+1}(v) = scale·(dampDen−dampNum) div dampDen
    *   + Σ_{u→v} (score_t(u) · dampNum) div (dampDen · outdeg(u)).
    */
  def pageRankIntFixed(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iters: Int = 3,
      scale: Long = 1L << 20,
      dampNum: Long = 1L,
      dampDen: Long = 2L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(dampNum > 0 && dampDen > dampNum, "damping must be a rational in (0,1)")
    require(scale % dampDen == 0, "scale must be a multiple of dampDen (exact base)")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    val outdeg = e.groupBy("__src").agg(count(lit(1)).as("__outdeg"))
    val base = scale / dampDen * (dampDen - dampNum)
    var scores = nodes.withColumn("score", lit(scale))
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(scores.withColumnRenamed("node", "__src"), "__src")
        .join(outdeg, "__src")
        .select(col("__dst").as("node"),
          expr(s"(score * $dampNum) div ($dampDen * __outdeg)").as("__c"))
        .groupBy("node").agg(sum("__c").as("__in"))
      scores = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("score"))
    }
    scores
  }
}
