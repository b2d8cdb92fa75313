package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Snapshot DIFF — the CDC GENERATOR, closing the loop the other three
    * operators consume: given two versions of a table, emit the exact
    * change set (`insert` / `delete` / `update_preimage` +
    * `update_postimage` pairs) that turns `before` into `after`. This is
    * how a table WITHOUT native change capture joins a CDC pipeline
    * (reconciliation/anti-entropy between replicas is the same
    * computation), and its output round-trips: [[currentState]] (before,
    * diff) = after, and [[incrementalAgg]] folds it because the pre-images
    * are real.
    *
    * Keys must be unique per side ([[currentState]]'s contract). Image
    * equality is null-safe struct equality over the non-key columns
    * (floats compare bitwise — a differing NaN payload is honestly a
    * change).
    *
    * Scale shape: ONE full-outer join on the key columns — both sides
    * shuffle once on the key; the pair-emit is a row-local explode. This
    * is the diff's floor cost on unordered storage; z-ordered/bucketed
    * layouts co-locate the join for free.
    */
  def diffSnapshots(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val dataCols = before.columns.toSeq
    require(after.columns.toSeq == dataCols,
      s"schemas must match: ${dataCols.mkString(",")} vs ${after.columns.mkString(",")}")
    val nonKey = dataCols.filterNot(keyCols.contains)
    val bs = before.select(keyCols.map(col) :+ struct(nonKey.map(col): _*).as("__b"): _*)
    val as_ = after.select(keyCols.map(col) :+ struct(nonKey.map(col): _*).as("__a"): _*)
    val entry = (img: Column, ct: String) => struct(img.as("img"), lit(ct).as("ct"))
    val entries =
      when(col("__b").isNull, array(entry(col("__a"), "insert")))
        .when(col("__a").isNull, array(entry(col("__b"), "delete")))
        .when(!(col("__a") <=> col("__b")), array(
          entry(col("__b"), "update_preimage"),
          entry(col("__a"), "update_postimage")))
        .otherwise(lit(null)) // unchanged: explode(null) emits nothing
    bs.join(as_, keyCols, "full_outer")
      .select(keyCols.map(col) :+ explode(entries).as("__x"): _*)
      .select(keyCols.map(col) ++
        nonKey.map(c => col(s"__x.img.$c").as(c)) :+
        col("__x.ct").as(CdcFilter.ChangeTypeCol): _*)
  }

  /** SCD TYPE-2 history: snapshot + change window → the full version
    * timeline per key, each image stamped `[valid_from, valid_to)` in
    * commit versions (`valid_to` null = current). The third consumer shape
    * over the CDC contract: [[currentState]] answers "what is the row NOW",
    * [[incrementalAgg]] "what is the aggregate now", this answers "what was
    * the row AS OF any version" — the slowly-changing-dimension table every
    * warehouse keeps next to a mutable source, and the point-in-time-correct
    * feature backfill a training pipeline joins against (features must come
    * from the image that was current at label time, not today's).
    *
    * Semantics per key, in version order: `insert`/`update_postimage` open
    * a new image and close the previous one at their version;
    * `delete` closes the open image without opening (a later re-insert
    * starts a new interval); `update_preimage` rows are ignored (the
    * closing version is the SUCCESSOR's `valid_from` — no pre-image
    * needed). The caller must not commit two changes to one key in one
    * version ([[currentState]]'s contract).
    *
    * Scale shape: ONE shuffle on the key columns; interval ends come from
    * `lead(version)` inside each key's (tiny) version chain — the window
    * partition is per-key, so no global sort and no skew beyond the
    * hottest key's change count.
    */
  def scd2History(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      snapshotVersion: Long = 0L): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val dataCols = snapshot.columns.toSeq
    val base = snapshot
      .select(dataCols.map(col) :+ lit(snapshotVersion).as("__v") :+
        lit("insert").as("__ct") :+ lit(0).as("__side"): _*)
    val delta = changes
      .filter(!(col(CdcFilter.ChangeTypeCol) <=> lit("update_preimage")))
      .select(dataCols.map(col) :+ col("_commit_version").cast("long").as("__v") :+
        col(CdcFilter.ChangeTypeCol).as("__ct") :+ lit(1).as("__side"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__v").asc, col("__side").asc)
    base.unionByName(delta)
      .withColumn("valid_to", lead(col("__v"), 1).over(w))
      .filter(!(col("__ct") <=> lit("delete")))
      .select(dataCols.map(col) :+ col("__v").as("valid_from") :+ col("valid_to"): _*)
  }

  /** INCREMENTAL aggregate maintenance: fold one CDC change window into a
    * persisted per-group aggregate (count + sum) at DELTA cost — the
    * materialized-view-maintenance pattern that keeps a 100 TB dashboard
    * aggregate current without rescanning history: per commit, work ∝ the
    * change batch plus one join against the (group-sized, not row-sized)
    * aggregate.
    *
    * Requires FULL CDF deltas — pre-images included: each change row
    * contributes `sign · (1, value)` with sign +1 for `insert`/
    * `update_postimage` and −1 for `delete`/`update_preimage`, so an
    * update's net row-count is 0 while its value moves by (post − pre), and
    * a delete retracts exactly the image it removes. (This is the dual of
    * [[currentState]], which IGNORES pre-images because it replaces whole
    * rows; sums are not last-writer-wins, so here the pre-image is
    * load-bearing.) count/sum are the self-maintainable aggregates; min/max
    * are NOT maintainable under deletes without the full state — use
    * [[currentState]] + re-aggregate for those.
    *
    * Groups whose maintained count reaches 0 are dropped (the aggregate of
    * an empty group is no row, matching what re-aggregation would produce).
    * Integer-valued `valueCol` keeps maintenance drift-free; float sums
    * accumulate fold-order ulps exactly like any float aggregation.
    */
  def incrementalAgg(
      prevAgg: DataFrame,
      changes: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      nCol: String = "n",
      sumCol: String = "sum_v"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val sign = when(
      col(CdcFilter.ChangeTypeCol).isNull ||
        col(CdcFilter.ChangeTypeCol).isin("insert", "update_postimage"), 1L)
      .when(col(CdcFilter.ChangeTypeCol).isin("delete", "update_preimage"), -1L)
      .otherwise(0L)
    val delta = changes
      .withColumn("__s", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__s")).as("__dn"),
        sum(col(valueCol) * col("__s")).as("__dv"))
    prevAgg.join(delta, groupCols, "full_outer")
      .select((groupCols.map(col) :+
        (coalesce(col(nCol), lit(0L)) + coalesce(col("__dn"), lit(0L))).as(nCol) :+
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__dv"), lit(0L))).as(sumCol)): _*)
      .filter(col(nCol) > 0)
  }

  /** INCREMENTAL join maintenance (insert-only deltas): given a
    * materialized join J = A⋈B and append batches ΔA, ΔB, the new state is
    *
    *   J ∪ ΔJ  with  ΔJ = ΔA⋈(B∪ΔB) ∪ A⋈ΔB
    *
    * — the classic delta-join identity ((A∪ΔA)⋈(B∪ΔB) expanded, each
    * cross term landing in exactly one arm so no joined pair is emitted
    * twice). This is [[incrementalAgg]]'s counterpart for JOIN-shaped
    * materializations: per commit the work is ∝ |Δ| · join fan-out, never
    * |A⋈B| — the difference between touching a 100 TB materialization and
    * rebuilding it. Insert-only is the EVENT-data contract
    * (CdcFilter's append semantics); updates/deletes need retraction
    * arms, i.e. the full-CDF discipline incrementalAgg documents.
    *
    * Here `baseA ⋈ baseB` stands in for reading the stored J; the caller
    * of a persisted pipeline replaces it with the materialization scan and
    * appends only ΔJ. Both delta arms shuffle on the same join keys as the
    * base join, so a key-partitioned (bucketed) layout co-locates all
    * three joins.
    */
  def incrementalJoin(
      baseA: DataFrame,
      deltaA: DataFrame,
      baseB: DataFrame,
      deltaB: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    baseA.join(baseB, keys)
      .unionByName(deltaA.join(baseB.unionByName(deltaB), keys))
      .unionByName(baseA.join(deltaB, keys))
  }
}
