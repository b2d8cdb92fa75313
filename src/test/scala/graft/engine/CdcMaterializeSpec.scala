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
}
