package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC state materialization: snapshot + change window → current table
  * state. The reference EXPORTS post-images and leaves applying them to the
  * consumer; this operator is that consumer side — the Delta-MERGE-shaped
  * "apply changes" a user of the upsert data types (USER/GROUP/WAREHOUSE
  * property) ultimately runs.
  *
  * Semantics per key (last writer wins):
  *   - the snapshot row counts as version `snapshotVersion` (an insert);
  *   - within the change window, `insert` and `update_postimage` rows are
  *     full post-images that replace prior state, `delete` removes the key,
  *     `update_preimage` rows are ignored (they describe the OLD image);
  *   - the row with the greatest `_commit_version` decides; the caller must
  *     not commit two changes to one key in one version (same contract as
  *     Delta's MERGE source).
  *
  * Scale shape: ONE shuffle on the key columns; per-key state is resolved by
  * a max_by-style window over (version) — no driver-side state, no iterative
  * merges. At 100 TB this is the standard "compact a CDC log onto a base"
  * job shape.
  */
object CdcMaterialize {

  def currentState(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      snapshotVersion: Long = 0L): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val dataCols = snapshot.columns.toSeq

    val base = snapshot
      .withColumn("__v", lit(snapshotVersion))
      .withColumn("__ct", lit("insert"))
    // null-safe comparisons throughout: CdcFilter treats a NULL _change_type
    // as an insert, and `=!=` would silently DROP such rows (NULL predicate)
    val delta = changes
      .filter(!(col(CdcFilter.ChangeTypeCol) <=> lit("update_preimage")))
      .withColumn("__v", col("_commit_version").cast("long"))
      .withColumn("__ct", col(CdcFilter.ChangeTypeCol))
      .withColumn("__side", lit(1))
      .select(dataCols.map(col) :+ col("__v") :+ col("__ct") :+ col("__side"): _*)

    // changes deterministically beat the snapshot when a commit shares the
    // snapshot's version number (same device as AsOfJoin's side tiebreak)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__v").desc, col("__side").desc)
    base.select(dataCols.map(col) :+ col("__v") :+ col("__ct") :+ lit(0).as("__side"): _*)
      .unionByName(delta)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !(col("__ct") <=> lit("delete")))
      .select(dataCols.map(col): _*)
  }
}
