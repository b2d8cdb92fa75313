package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — an operator Spark's join zoo lacks natively.
  *
  * For every left row, attach the single LATEST right row with
  * `right.ts <= left.ts` within the same key (optionally no older than
  * `tolerance`). The classic uses downstream of a CDC export: enrich events
  * with the property state that was current when the event happened.
  *
  * Implementation is the scale-canonical union-and-fill composition, not a
  * theta join: both sides are tagged and unioned, ONE shuffle partitions by
  * key, and a running `last(value, ignoreNulls)` over (ts, side) fills each
  * left row with the most recent right value. Right rows sort BEFORE left
  * rows at equal ts, so the match is inclusive (`<=`). Cost is O(n log n)
  * per key partition — never the O(|L|·|R|) a naive inequality join
  * materializes, and no per-key state collects anywhere.
  *
  * Requirement: `right` must be unique per (keys, ts) — pre-aggregate if
  * not (the match would otherwise be nondeterministic in ANY engine;
  * DuckDB's native ASOF JOIN has the same contract).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side — unique per (keys, rightTs)
    * @param keys       equi-join key columns (present on both sides)
    * @param leftTs     event-time column on `left` (numeric or timestamp)
    * @param rightTs    event-time column on `right`
    * @param valueCols  right columns to attach (null when nothing matches)
    * @param tolerance  max allowed `leftTs - rightTs` (same unit as ts)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumns(valueCols.map(v => s"__v_$v" -> lit(null)).toMap)
      .withColumn("__rts", lit(null).cast("long"))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) ++ valueCols.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumns(valueCols.map(v => s"__v_$v" -> col(v)).toMap)
      .withColumn("__rts", col("__ts").cast("long"))
      // align to the left schema: left payload columns are null on right rows
      .withColumns(leftCols.filterNot(keys.contains).map(c => c -> lit(null)).toMap)
      .select(l.columns.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r)
      .withColumns(valueCols.map(v => s"__f_$v" -> last(col(s"__v_$v"), ignoreNulls = true).over(w)).toMap)
      .withColumn("__fts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val inTol: Column = tolerance match {
      case Some(t) => col("__fts").isNotNull && (col("__ts").cast("long") - col("__fts")) <= t
      case None => col("__fts").isNotNull
    }
    filled.select(
      leftCols.map(col) ++
        valueCols.map(v => when(inTol, col(s"__f_$v")).otherwise(lit(null)).as(v)): _*)
  }
}
