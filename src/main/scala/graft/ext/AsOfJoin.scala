package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Point-in-time (as-of) join — an operator Spark's join zoo lacks natively.
  *
  * For every left row, attach the single LATEST right row with
  * `right.ts <= left.ts` within the same key (optionally no older than
  * `tolerance`). The classic uses downstream of a CDC export: enrich events
  * with the property state that was current when the event happened.
  *
  * Implementation is the scale-canonical union-and-fill composition, not a
  * theta join: both sides are tagged and unioned, ONE shuffle partitions by
  * key, and a running `last(…, ignoreNulls)` over (ts, side) fills each left
  * row with the most recent right ROW. The right row's event time and value
  * columns travel together in a single struct, so the match is always one
  * whole right row — a NULL value field rides inside a non-null struct and
  * is faithfully attached (a per-column fill would skip it and resurrect an
  * older value, and could even mix columns from different right rows).
  * Right rows sort BEFORE left rows at equal ts, so the match is inclusive
  * (`<=`). Cost is O(n log n) per key partition — never the O(|L|·|R|) a
  * naive inequality join materializes, and no per-key state collects
  * anywhere.
  *
  * Contracts: `right` must be unique per (keys, ts) — pre-aggregate if not
  * (the match would otherwise be nondeterministic in ANY engine; DuckDB's
  * native ASOF JOIN has the same caveat). The ts columns must be NUMERIC
  * (e.g. epoch-micros): tolerance arithmetic runs on the native type with
  * no lossy casts; convert timestamps with `unix_micros` first.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side — unique per (keys, rightTs)
    * @param keys       equi-join key columns (present on both sides)
    * @param leftTs     numeric event-time column on `left`
    * @param rightTs    numeric event-time column on `right`
    * @param valueCols  right columns to attach (null when nothing matches);
    *                   must not collide with `left`'s column names
    * @param tolerance  max allowed `leftTs - rightTs` (same unit as ts)
    * @param forward    false (default): classic BACKWARD as-of — latest
    *                   right with `rightTs <= leftTs`. true: FORWARD
    *                   as-of — EARLIEST right with `rightTs >= leftTs`
    *                   (the "next event after" enrichment: next purchase
    *                   after a view, next deploy after a commit); the
    *                   union-and-fill machinery is identical with the scan
    *                   order reversed, and `tolerance` bounds
    *                   `rightTs − leftTs` instead. Both directions are
    *                   inclusive at equal ts.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val overlap = valueCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"valueCols collide with left-side columns: ${overlap.mkString(", ")} — " +
        "rename them on one side first (duplicate output names would be ambiguous)")
    require(left.schema(leftTs).dataType.isInstanceOf[NumericType] &&
      right.schema(rightTs).dataType.isInstanceOf[NumericType],
      "as-of ts columns must be numeric (epoch-micros); convert timestamps with unix_micros")
    val leftCols = left.columns.toSeq

    // one struct per right row: its ts + all value columns travel together
    val packed = struct(col(rightTs).as("__rts") +: valueCols.map(col): _*)
    val packedType = right.select(packed.as("__vs")).schema.head.dataType

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__vs", lit(null).cast(packedType))
    val r = right
      .select(keys.map(col) :+ col(rightTs).as("__ts") :+ packed.as("__vs"): _*)
      .withColumn("__side", lit(0))
      // align to the left schema: left payload columns are null on right rows
      .withColumns(leftCols.filterNot(keys.contains).map(c => c -> lit(null)).toMap)
      .select(l.columns.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r)
      .withColumn("__f", last(col("__vs"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val gap: Column =
      if (forward) col("__f.__rts") - col("__ts") else col("__ts") - col("__f.__rts")
    val inTol: Column = tolerance match {
      case Some(t) => col("__f").isNotNull && gap <= lit(t)
      case None => col("__f").isNotNull
    }
    filled.select(
      leftCols.map(col) ++
        valueCols.map(v => when(inTol, col(s"__f.$v")).otherwise(lit(null)).as(v)): _*)
  }
}
