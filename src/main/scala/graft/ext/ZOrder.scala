package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) interleaving — multi-dimensional data CLUSTERING for
  * scan pruning. Range-partitioning and sorting a table by ONE key gives
  * min/max file statistics that prune scans on that key only; interleaving
  * the bits of two keys into one sort key tiles the (x, y) plane so each
  * file covers a bounded RECTANGLE — predicates on EITHER dimension skip
  * files (the layout trick behind Delta/Iceberg `ZORDER BY`, stated here as
  * plain Spark: an integer expression + `repartitionByRange` + a
  * partition-local sort; parquet row-group min/max stats do the pruning at
  * read time).
  *
  * The interleave is pure integer bit arithmetic — shift/mask/or, unrolled
  * at plan-build time to `2·bits` codegen'd terms — so it is engine-exact:
  * the q116 oracle runs the same formula in DuckDB from the same constants
  * (the generated-oracle pattern).
  */
object ZOrder {

  /** The Morton key: bit i of `x` lands at even position 2i, bit i of `y`
    * at odd 2i+1. Inputs are masked to `bits` (callers hash or bucket wider
    * domains down first); result fits 2·bits ≤ 62, so long arithmetic never
    * overflows.
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The identical formula as DuckDB SQL over column expressions `x`/`y` —
    * generated from the same constants so both engines run the same
    * integer arithmetic.
    */
  def interleaveSql(x: String, y: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    (0 until bits).flatMap { i =>
      Seq(
        s"(((($x) & $mask) >> $i & 1) << ${2 * i})",
        s"(((($y) & $mask) >> $i & 1) << ${2 * i + 1})")
    }.mkString(" | ")
  }

  /** Normalized Morton key of two long columns given their value bounds:
    * each dimension is min/max-scaled to the full `bits` width —
    * `((v - min) * mask) div max(1, max - min)` — before interleaving. Raw
    * interleaving only tiles evenly when both domains have similar bit
    * widths; a 4-bit dimension against a 20-bit one leaves the wide
    * dimension owning every high z bit and the narrow one unclustered
    * (exactly what production ZORDER implementations avoid by
    * range-normalizing first). All integer arithmetic (long multiply, floor
    * division), so the z key stays engine-exact.
    */
  def interleaveNormalized(
      x: Column, y: Column,
      xMin: Long, xMax: Long,
      yMin: Long, yMax: Long,
      bits: Int = 16): Column = {
    val mask = (1L << bits) - 1
    def norm(v: Column, mn: Long, mx: Long): Column =
      call_function("div",
        (v.cast("long") - lit(mn)) * lit(mask), lit(math.max(1L, mx - mn)))
    interleave(norm(x, xMin, xMax), norm(y, yMin, yMax), bits)
  }

  /** The same normalized key as DuckDB SQL — bounds arrive as SQL
    * expressions (column refs or scalar subqueries) so the oracle derives
    * them from the same data it scores. `//` floors like Spark's `div`
    * truncates — identical for the non-negative operands normalization
    * produces.
    */
  def interleaveNormalizedSql(
      x: String, y: String,
      xMin: String, xMax: String,
      yMin: String, yMax: String,
      bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    def norm(v: String, mn: String, mx: String): String =
      s"((($v) - ($mn)) * $mask) // greatest(1, ($mx) - ($mn))"
    interleaveSql(norm(x, xMin, xMax), norm(y, yMin, yMax), bits)
  }

  /** Dimension bounds for [[writeZOrdered]]: (xMin, xMax, yMin, yMax). */
  final case class Bounds(xMin: Long, xMax: Long, yMin: Long, yMax: Long)

  /** Cluster `df` into `files` z-ordered parquet files on (xCol, yCol):
    * range-partition on the normalized Morton key (so file k owns a
    * contiguous z range = a bounded tile of the plane), sort within
    * partitions (so row-group stats inside each file are tight too), write.
    *
    * `bounds`: pass the dimension bounds when the domain is known (the
    * common production case — ids, epoch days, bucketed hashes), making the
    * layout a SINGLE pass over the data. `None` falls back to computing
    * them with one extra aggregate-only scan (4 longs, the model-read
    * pattern) — the same pay-a-scan-for-metadata liability class as the
    * reference's count() job (SURVEY §4), which is why the parameter
    * exists. Values outside supplied bounds get a wrapped (masked) z key,
    * degrading clustering for those rows but never correctness — the rows
    * written are identical either way, only their file placement moves.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      files: Int,
      bits: Int = 16,
      bounds: Option[Bounds] = None): Unit = {
    val b = bounds.getOrElse {
      val r = df.agg(
        min(col(xCol)).as("xmn"), max(col(xCol)).as("xmx"),
        min(col(yCol)).as("ymn"), max(col(yCol)).as("ymx")).head()
      Bounds(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    df.withColumn("__z", interleaveNormalized(col(xCol), col(yCol),
        b.xMin, b.xMax, b.yMin, b.yMax, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
