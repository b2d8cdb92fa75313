package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The staged graph edge relations must be indistinguishable from their
  * fresh derivations — or the eight consumers (q132/q228/q236/q255/q274/
  * q285/q377/q390) would analyze a different graph than their oracles
  * replay. Same discipline as DedupSpec's staged-sketch asserts.
  */
class GraphFixturesSpec extends SparkSpec {

  private def edgeRows(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  private def countRows(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  test("staged trade edges are row-identical to a fresh derivation") {
    assert(edgeRows(GraphFixtures.tradeEdges(spark, Sf0001))
      === edgeRows(GraphFixtures.freshTradeEdges(spark, Sf0001)))
    assert(GraphFixtures.tradeEdges(spark, Sf0001).count() > 0)
  }

  test("staged co-purchase counts are row-identical to a fresh derivation") {
    assert(countRows(GraphFixtures.coPurchaseCounts(spark, Sf0001))
      === countRows(GraphFixtures.freshCoPurchaseCounts(spark, Sf0001)))
    assert(GraphFixtures.coPurchaseCounts(spark, Sf0001).count() > 0)
  }

  test("staged co-purchase pairs are row-identical to a fresh derivation") {
    assert(edgeRows(GraphFixtures.coPurchasePairs(spark, Sf0001))
      === edgeRows(GraphFixtures.freshCoPurchasePairs(spark, Sf0001)))
    assert(GraphFixtures.coPurchasePairs(spark, Sf0001).count() > 0)
  }

  test("staged symmetrized relations are exactly union(e, flip(e)) of the staged sets") {
    // r15: the undirected views q274/q377/q390/q236 iterate must never
    // drift from the directed relations their oracles symmetrize
    def sym(e: Seq[(Long, Long)]) = (e ++ e.map(_.swap)).sorted
    assert(edgeRows(GraphFixtures.tradeEdgesSym(spark, Sf0001))
      === sym(edgeRows(GraphFixtures.tradeEdges(spark, Sf0001))))
    assert(edgeRows(GraphFixtures.coPurchasePairsSym(spark, Sf0001))
      === sym(edgeRows(GraphFixtures.coPurchasePairs(spark, Sf0001))))
  }

  test("co-purchase pair set is exactly the counted contraction's key set") {
    // the q228/q236 pair view and the q285 counted view must never drift:
    // the pair set IS the groupBy key set of the counts
    assert(edgeRows(GraphFixtures.coPurchasePairs(spark, Sf0001))
      === countRows(GraphFixtures.coPurchaseCounts(spark, Sf0001))
        .map { case (u, v, _) => (u, v) })
  }

  test("staging scale gate: forced-parquet edge relations equal the in-memory path") {
    import graft.queries.Staging
    // sf0.001's lineitem sits below the gate (the mem path served above);
    // forcing the threshold to 0 flips the same accessors onto parquet
    assert(!Staging.stageToParquet(s"$Sf0001/lineitem.parquet"))
    val memTrade = edgeRows(GraphFixtures.tradeEdges(spark, Sf0001))
    val memPairs = edgeRows(GraphFixtures.coPurchasePairs(spark, Sf0001))
    val prev = sys.props.get("graft.staging.minBytes")
    try {
      sys.props("graft.staging.minBytes") = "0"
      assert(edgeRows(GraphFixtures.tradeEdges(spark, Sf0001)) === memTrade)
      assert(edgeRows(GraphFixtures.coPurchasePairs(spark, Sf0001)) === memPairs)
    } finally prev match {
      case Some(v) => sys.props("graft.staging.minBytes") = v
      case None => sys.props -= "graft.staging.minBytes"
    }
  }
}
