package graft.ext

import graft.SparkSpec

/** Integer PageRank: hand-computed scores on a known graph, determinism,
  * and the documented sink/floor behavior. Triangle counting: hand-computed
  * counts on known graphs, canonicalization, and the once-per-triangle
  * invariant of the degree orientation.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankIntFixed matches hand-computed scores on a 4-node graph") {
    // 1 -> 3, 2 -> 3, 3 -> 4 ; damping 1/2, scale 8, base 4
    // s0 = 8 everywhere
    // it1: in(3) = 8/2 + 8/2 = 8 -> 12 ; in(4) = 8/2 = 4 -> 8 ; 1,2 -> 4
    // it2: in(3) = 4/2 + 4/2 = 4 -> 8 ; in(4) = 12/2 = 6 -> 10 ; 1,2 -> 4
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.pageRankIntFixed(edges, iters = 2, scale = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 4L, 2L -> 4L, 3L -> 8L, 4L -> 10L))
  }

  test("floor division and sinks: mass is lost deterministically, never invented") {
    // odd score over outdeg 2 floors; node 4 is a sink (its mass leaks)
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    // scale 10, base 5: it1: in(2) = in(3) = 10 div (2*2) = 2 -> 7; 1 -> 5
    val got = Graph.pageRankIntFixed(edges, iters = 1, scale = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 5L, 2L -> 7L, 3L -> 7L))
    // total after = 19 <= total before = 30: floors + sink loss only shrink
    assert(got.values.sum <= 30L)
  }

  test("triangleCounts matches hand-computed counts on a diamond") {
    // square 1-2-3-4 plus diagonal 1-3: triangles {1,2,3} and {1,3,4}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((3L, 2L)), 2L -> ((2L, 1L)), 3L -> ((3L, 2L)), 4L -> ((2L, 1L))))
  }

  test("triangleCounts: direction, duplicates and self-loops collapse first") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // one canonical triangle {1,2,3}; the self-loop contributes no degree
    assert(got === Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 1L))))
  }

  test("triangleCounts: K4 has 4 triangles, 3 per node — each counted once") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = (for { a <- nodes; b <- nodes if a < b } yield (a, b)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === nodes.map(_ -> ((3L, 3L))).toMap)
    // global total: sum of per-node counts = 3 × number of triangles
    assert(got.values.map(_._2).sum === 3L * 4L)
  }

  test("triangleCounts: a star has full degrees but zero triangles") {
    val edges = (2L to 5L).map(i => (1L, i)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((4L, 0L)))
    (2L to 5L).foreach(i => assert(got(i) === ((1L, 0L))))
  }

  test("kCorePeel: pendant peels first, then the cascade takes the triangle") {
    // triangle a(1)-b(2)-c(3) plus pendant d(4)-a
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("u", "v")
    // k=2: round 1 peels only the pendant; the triangle survives at deg 2
    val k2 = Graph.kCorePeel(edges, k = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(k2(4L) === ((1L, 0L)))
    Seq(1L, 2L, 3L).foreach(n => assert(k2(n) === ((0L, 2L)), s"node $n"))
    // k=3: b, c (deg 2) and d (deg 1) all fall in round 1; a still has
    // deg 3 THEN — it only cascades in round 2, the round-synchronous
    // contract (sequential peeling would take a in round 1's tail)
    val k3 = Graph.kCorePeel(edges, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Seq(2L, 3L, 4L).foreach(n => assert(k3(n) === ((1L, 0L)), s"node $n"))
    assert(k3(1L) === ((2L, 0L)))
  }

  test("kCorePeel: unconverged rounds still report deterministically") {
    // a 6-chain at k=2 peels one endpoint pair per round; rounds=1 stops
    // mid-cascade and must report survivors with their CURRENT degree
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("u", "v")
    val got = Graph.kCorePeel(chain, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((1L, 0L)) && got(6L) === ((1L, 0L)))
    // 2 and 5 are now chain ends (deg 1 < k) but round 2 never ran
    assert(got(2L) === ((0L, 1L)) && got(5L) === ((0L, 1L)))
    assert(got(3L) === ((0L, 2L)) && got(4L) === ((0L, 2L)))
  }

  test("parallel edges weight contributions like a multigraph") {
    val single = Seq((1L, 2L)).toDF("src", "dst")
    val doubled = Seq((1L, 2L), (1L, 2L)).toDF("src", "dst")
    val s = Graph.pageRankIntFixed(single, iters = 1, scale = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doubled: outdeg(1) = 2, two contributions of 8 div 4 = 2 each -> same
    // total as the single edge's 8 div 2 = 4 (exactly divisible case)
    val d = Graph.pageRankIntFixed(doubled, iters = 1, scale = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(2L) === d(2L))
  }

  test("pageRankIntWeighted is exactly the expanded multigraph's pageRankIntFixed") {
    // grouped (src, dst, w) vs the same graph written as w parallel edges —
    // the documented equivalence that justifies iterating the grouped table
    val weighted = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L))
      .toDF("src", "dst", "w")
    val expanded = Seq.fill(3)((1L, 2L)).concat(Seq((1L, 3L)))
      .concat(Seq.fill(2)((2L, 3L))).toDF("src", "dst")
    val w = Graph.pageRankIntWeighted(weighted, iters = 3, scale = 40L,
      dampNum = 17L, dampDen = 20L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Graph.pageRankIntFixed(expanded, iters = 3, scale = 40L,
      dampNum = 17L, dampDen = 20L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w === e)
  }

  test("betweennessSampled: path graph — the middle node carries the full dependency") {
    // 1-2-3 undirected, seeds {1,3}, depth 2: from each end δ(2) = 10⁶,
    // endpoints at the deep level carry 0 — bc(2) = 2·10⁶
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("u", "v")
    val got = Graph.betweennessSampled(edges, Seq(1L, 3L), depth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 2000000L, 3L -> 0L))
  }

  test("betweennessSampled: diamond splits dependency by path counts (σ division)") {
    // 1-{2,3}-4, seed 1, depth 2: σ(4) = 2, so each middle gets
    // (1·10⁶) div 2 = 500000 — Brandes' σv/σw weighting, floor-chained
    val raw = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val edges = (raw ++ raw.map(_.swap)).toDF("u", "v")
    val got = Graph.betweennessSampled(edges, Seq(1L), depth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 500000L, 3L -> 500000L, 4L -> 0L))
  }

  test("labelPropagation: barbell graph hand-replayed over two rounds") {
    // two triangles {1,2,3} {4,5,6} bridged 3-4; labels start as own id
    // r1 (min label wins every all-singleton tie):
    //   1<-{2,3}=2  2<-{1,3}=1  3<-{1,2,4}=1  4<-{3,5,6}=3  5<-{4,6}=4  6<-{4,5}=4
    // r2: 1<-{lab2=1,lab3=1}=1 (true majority)  2<-{1:2,3:1}tie=1  3<-{2,1,3}tie=1
    //     4<-{3:1,5:4,6:4}=4 (majority)          5<-{4:3,6:4}tie=3  6<-{4:3,5:4}tie=3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation: count ties break to the smallest label") {
    // star 10-{1,2}: center sees two singleton labels -> min(1,2) = 1;
    // each leaf sees only the center -> 10
    val edges = Seq((10L, 1L), (10L, 2L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 1L, 1L -> 10L, 2L -> 10L))
  }

  test("labelPropagation: duplicate and reversed edges don't weight the vote") {
    // (1,3) twice: if duplicates counted, label 3 would beat the tie;
    // the distinct undirected edge set keeps it a tie -> min = 2
    val edges = Seq((1L, 3L), (3L, 1L), (1L, 3L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 2L)
  }
}
