package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Last-writer-wins CDC compaction semantics. */
class CdcMaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("currentState applies inserts, post-images and deletes; ignores preimages") {
    val snapshot = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      (1L, "a_old", "update_preimage", 2L),  // ignored
      (1L, "a2", "update_postimage", 2L),    // overwrites
      (2L, "b", "delete", 2L),               // removes key 2
      (4L, "d", "insert", 2L),               // new key
      (4L, "d2", "update_postimage", 3L),    // later version wins
      (2L, "b2", "insert", 3L)               // re-insert after delete
    ).toDF("id", "v", "_change_type", "_commit_version")
    val got = CdcMaterialize.currentState(snapshot, changes, Seq("id"), snapshotVersion = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a2", 2L -> "b2", 3L -> "c", 4L -> "d2"))
  }

  test("NULL _change_type rows are kept as inserts (CdcFilter consistency)") {
    val snapshot = Seq((1L, "a")).toDF("id", "v")
    val changes = Seq((2L, "b", null.asInstanceOf[String], 2L))
      .toDF("id", "v", "_change_type", "_commit_version")
    val got = CdcMaterialize.currentState(snapshot, changes, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "b"))
  }

  test("a change at the snapshot's version number deterministically wins") {
    val snapshot = Seq((1L, "old")).toDF("id", "v")
    val changes = Seq((1L, "new", "update_postimage", 0L))
      .toDF("id", "v", "_change_type", "_commit_version")
    val got = CdcMaterialize.currentState(snapshot, changes, Seq("id"), snapshotVersion = 0L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "new"))
  }

  test("currentState keeps the snapshot when the change window is empty") {
    val snapshot = Seq((1L, "a")).toDF("id", "v")
    val empty = Seq.empty[(Long, String, String, Long)]
      .toDF("id", "v", "_change_type", "_commit_version")
    val got = CdcMaterialize.currentState(snapshot, empty, Seq("id"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a")))
  }

  test("scd2History reconstructs every interval, incl. delete and re-insert") {
    val snapshot = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val changes = Seq(
      (1L, "a_old", "update_preimage", 2L), // ignored — not an image
      (1L, "a2", "update_postimage", 2L),   // closes (a,1,2), opens (a2,2,_)
      (2L, "b", "delete", 3L),              // closes (b,1,3), opens nothing
      (2L, "b2", "insert", 4L),             // re-insert: new interval at 4
      (3L, "c", "insert", 2L)               // new key mid-history
    ).toDF("id", "v", "_change_type", "_commit_version")
    val got = CdcMaterialize.scd2History(snapshot, changes, Seq("id"), snapshotVersion = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got === Set(
      (1L, "a", 1L, Some(2L)), (1L, "a2", 2L, None),
      (2L, "b", 1L, Some(3L)), (2L, "b2", 4L, None),
      (3L, "c", 2L, None)))
  }

  test("scd2History as-of any version equals currentState at that version") {
    // the contract that makes the history table USEFUL: slicing it at v
    // (valid_from <= v < valid_to) must reproduce the compacted state at v
    val snapshot = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      (1L, "a2", "update_postimage", 2L),
      (2L, "b", "delete", 2L),
      (4L, "d", "insert", 3L),
      (1L, "a3", "update_postimage", 4L),
      (2L, "b2", "insert", 4L)
    ).toDF("id", "v", "_change_type", "_commit_version")
    val hist = CdcMaterialize.scd2History(snapshot, changes, Seq("id"), snapshotVersion = 1L)
    (1L to 4L).foreach { v =>
      val sliced = hist.filter(col("valid_from") <= v &&
        (col("valid_to").isNull || col("valid_to") > v))
        .select("id", "v")
      val state = CdcMaterialize.currentState(snapshot,
        changes.filter(col("_commit_version") <= v), Seq("id"), snapshotVersion = 1L)
      assert(sliced.exceptAll(state).isEmpty && state.exceptAll(sliced).isEmpty,
        s"as-of $v mismatch")
    }
  }

  test("diffSnapshots round-trips: apply the diff to before and reach after") {
    val before = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "name", "v")
    val after = Seq((1L, "a", 10L), (2L, "b2", 25L), (4L, "d", 40L)).toDF("id", "name", "v")
    val diff = CdcMaterialize.diffSnapshots(before, after, Seq("id"))
    // exact change set: unchanged 1 absent; 2 updated (pre+post); 3 deleted; 4 inserted
    val got = diff.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(got === Set(
      (2L, "b", 20L, "update_preimage"), (2L, "b2", 25L, "update_postimage"),
      (3L, "c", 30L, "delete"),
      (4L, "d", 40L, "insert")))
    // applying the diff as one commit reproduces `after` exactly
    val applied = CdcMaterialize.currentState(
      before, diff.withColumn("_commit_version", lit(2L)), Seq("id"), snapshotVersion = 1L)
    assert(applied.exceptAll(after).isEmpty && after.exceptAll(applied).isEmpty)
    // and because pre-images are real, the aggregate folds the same diff
    val agg0 = before.groupBy(lit(1).as("g")).agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    val folded = CdcMaterialize.incrementalAgg(
      agg0, diff.withColumn("g", lit(1)), Seq("g"), "v")
    val direct = after.groupBy(lit(1).as("g")).agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    assert(folded.exceptAll(direct).isEmpty && direct.exceptAll(folded).isEmpty)
  }

  test("incrementalAgg folded per commit equals re-aggregating the state") {
    val snapshot = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("id", "g", "v")
    def commit(ver: Long, rows: Seq[(Long, String, Long, String)]) =
      rows.toDF("id", "g", "v", "_change_type")
        .withColumn("_commit_version", lit(ver))
        .withColumn("_commit_timestamp", lit(s"2024-01-0$ver"))
    // commit 2: insert 4, update 1 (10 -> 15, pre+post pair)
    val c2 = commit(2L, Seq(
      (4L, "b", 40L, "insert"),
      (1L, "a", 10L, "update_preimage"), (1L, "a", 15L, "update_postimage")))
    // commit 3: delete BOTH "a" rows -> group a disappears entirely
    val c3 = commit(3L, Seq(
      (1L, "a", 15L, "delete"), (2L, "a", 20L, "delete")))

    val agg0 = snapshot.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    val folded = Seq(c2, c3).foldLeft(agg0)(
      CdcMaterialize.incrementalAgg(_, _, Seq("g"), "v"))

    val state = CdcMaterialize.currentState(
      snapshot, c2.unionByName(c3), keyCols = Seq("id"), snapshotVersion = 1L)
    val direct = state.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    assert(folded.exceptAll(direct).isEmpty && direct.exceptAll(folded).isEmpty)
    // the emptied group is GONE, not a zero row
    assert(folded.filter(col("g") === "a").count() === 0L)
    assert(folded.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet === Set(("b", 2L, 70L)))
  }

  test("incrementalJoin delta identity: equals the full join, no pair twice") {
    val a = Seq((1L, "a1"), (2L, "a2"), (3L, "a3"), (4L, "a4")).toDF("k", "pa")
    val b = Seq((1L, "b1"), (1L, "b1x"), (2L, "b2"), (4L, "b4"), (5L, "b5")).toDF("k", "pb")
    val full = a.join(b, Seq("k"))
    // every split of both sides must reproduce the full join exactly once
    for (sa <- Seq(col("k") <= 2, col("k") > 9, col("k") >= 0);
         sb <- Seq(col("pb") === "b1", col("pb") =!= "nope")) {
      val inc = CdcMaterialize.incrementalJoin(
        a.filter(!sa), a.filter(sa), b.filter(!sb), b.filter(sb), Seq("k"))
      assert(inc.count() === full.count(), s"cardinality drift for split ($sa, $sb)")
      assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
        s"multiset mismatch for split ($sa, $sb)")
    }
  }

  test("incrementalJoin with empty deltas degenerates to the base join") {
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("k", "pa")
    val b = Seq((1L, "b1"), (2L, "b2")).toDF("k", "pb")
    val none = col("k") < 0
    val inc = CdcMaterialize.incrementalJoin(
      a.filter(!none), a.filter(none), b.filter(!none), b.filter(none), Seq("k"))
    val full = a.join(b, Seq("k"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }
}
