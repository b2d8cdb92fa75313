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

  /** N-dimensional Morton key (bit-sliced round-robin): bit i of dimension
    * d (of D) lands at position `i·D + d`, so low bits of ALL dimensions
    * occupy the low key bits and a range of the key bounds a D-cube.
    * Inputs are masked to `bits` (callers hash or bucket wider domains
    * down first); `D·bits ≤ 62` keeps the key a non-negative long. 2-D is
    * the `D = 2` special case ([[interleave]]); real layout tuning wants
    * 3-4 dims (e.g. tenant × day × entity), each dim's per-file extent
    * shrinking as ~`files^(-1/D)`.
    */
  def interleaveN(cols: Seq[Column], bits: Int = 16): Column = {
    val d = cols.size
    require(d >= 2, "need at least two dimensions")
    require(bits >= 1 && d * bits <= 62, s"$d dims x $bits bits must fit 62")
    val mask = (1L << bits) - 1
    val ms = cols.map(_.cast("long").bitwiseAND(lit(mask)))
    (0 until bits).flatMap { i =>
      ms.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** The Morton key: bit i of `x` lands at even position 2i, bit i of `y`
    * at odd 2i+1 (= [[interleaveN]] with D = 2).
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column =
    interleaveN(Seq(x, y), bits)

  /** The identical N-dim formula as DuckDB SQL over column expressions —
    * generated from the same constants so both engines run the same
    * integer arithmetic.
    */
  def interleaveNSql(cols: Seq[String], bits: Int = 16): String = {
    val d = cols.size
    require(d >= 2 && bits >= 1 && d * bits <= 62)
    val mask = (1L << bits) - 1
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        s"(((($c) & $mask) >> $i & 1) << ${i * d + j})"
      }
    }.mkString(" | ")
  }

  /** 2-D SQL form (= [[interleaveNSql]] with D = 2). */
  def interleaveSql(x: String, y: String, bits: Int = 16): String =
    interleaveNSql(Seq(x, y), bits)

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

  /** N-dim normalized Morton key: each dimension min/max-scaled to the
    * full `bits` width before interleaving ([[interleaveNormalized]]
    * generalized; `bounds(d) = (min, max)` per dimension).
    */
  def interleaveNormalizedN(
      cols: Seq[Column],
      bounds: Seq[(Long, Long)],
      bits: Int = 16): Column = {
    require(cols.size == bounds.size, "one (min, max) pair per dimension")
    val mask = (1L << bits) - 1
    val normed = cols.zip(bounds).map { case (v, (mn, mx)) =>
      call_function("div",
        (v.cast("long") - lit(mn)) * lit(mask), lit(math.max(1L, mx - mn)))
    }
    interleaveN(normed, bits)
  }

  /** Normalized HILBERT key — [[interleaveNormalized]]'s contract with the
    * Hilbert walk instead of Morton bit interleaving
    * ([[graft.functions.HilbertIndex]], a codegen'd custom expression: the
    * per-bit data-dependent rotation has no clean built-in composition).
    * Same range normalization, same integer exactness; consecutive key
    * values are grid NEIGHBORS (no Morton diagonal jumps), so a
    * contiguous key range bounds a tighter tile — file min/max stats
    * prune better on both dimensions for the same file count.
    */
  def hilbertNormalized(
      x: Column, y: Column,
      xMin: Long, xMax: Long,
      yMin: Long, yMax: Long,
      bits: Int = 16): Column = {
    val mask = (1L << bits) - 1
    def norm(v: Column, mn: Long, mx: Long): Column =
      call_function("div",
        (v.cast("long") - lit(mn)) * lit(mask), lit(math.max(1L, mx - mn)))
    graft.functions.GraftFunctions.hilbertIndex(
      norm(x, xMin, xMax), norm(y, yMin, yMax), bits)
  }

  /** The identical Hilbert rounds as a chain of MATERIALIZED DuckDB CTEs —
    * one per bit, each carrying the (x, y, a) state forward. Masked-
    * rotation formulation: every intermediate is a non-negative integer,
    * so `//`/`%` replay Spark's shifts exactly (the q116 generated-oracle
    * pattern, extended from one expression to an unrolled loop).
    * MATERIALIZED is load-bearing: lateral-alias or plain-CTE forms
    * inline each round's multiple references to the previous state and
    * the expression tree grows ~3^bits — materializing per round keeps
    * the oracle linear. Seed table `from` must provide the key columns
    * plus normalized `hx`, `hy`; the final CTE is `hfinal(keys, x, y, a)`
    * with `a` the Hilbert index.
    */
  def hilbertRoundsCtesSql(from: String, keyCols: Seq[String], bits: Int = 16): String = {
    val keys = keyCols.mkString(", ")
    val sb = new StringBuilder
    sb.append(s"h${bits - 1} AS MATERIALIZED (SELECT $keys, hx AS x, hy AS y, 0::BIGINT AS a FROM $from)")
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      val prev = s"h$i"
      val cur = if (i == 0) "hfinal" else s"h${i - 1}"
      sb.append(s""",
         |$cur AS MATERIALIZED (
         |  SELECT $keys,
         |    CASE WHEN (y // $s) % 2 = 1 THEN x % $s
         |         WHEN (x // $s) % 2 = 1 THEN ${s - 1} - (y % $s) ELSE y % $s END AS x,
         |    CASE WHEN (y // $s) % 2 = 1 THEN y % $s
         |         WHEN (x // $s) % 2 = 1 THEN ${s - 1} - (x % $s) ELSE x % $s END AS y,
         |    a + ((CASE WHEN (x // $s) % 2 = 0 AND (y // $s) % 2 = 0 THEN 0
         |               WHEN (x // $s) % 2 = 0 THEN 1
         |               WHEN (y // $s) % 2 = 1 THEN 2 ELSE 3 END) * ${s * s}::BIGINT) AS a
         |  FROM $prev)""".stripMargin)
    }
    sb.toString
  }

  /** [[writeZOrdered]] with the Hilbert key: same single-pass /
    * supplied-bounds contract, same range-partition + within-file sort —
    * only the clustering key changes. Because consecutive Hilbert keys
    * are grid neighbors, each file's (x, y) extents are at least as tight
    * as Morton's for the same file count (q205 measures the skip-fraction
    * difference on identical predicates).
    */
  def writeHilbertOrdered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      files: Int,
      bits: Int = 16,
      bounds: Option[Bounds] = None): Unit = {
    val b = bounds.getOrElse {
      val r = df.agg(min(col(xCol)), max(col(xCol)), min(col(yCol)), max(col(yCol))).head()
      Bounds(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    df.withColumn("__h", hilbertNormalized(col(xCol), col(yCol),
        b.xMin, b.xMax, b.yMin, b.yMax, bits))
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
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
      bounds: Option[Bounds] = None): Unit =
    writeZOrderedN(df, path, Seq(xCol, yCol), files, bits,
      bounds.map(b => Seq((b.xMin, b.xMax), (b.yMin, b.yMax))))

  /** N-dim [[writeZOrdered]]: cluster `df` into `files` parquet files
    * z-ordered on `cols` (same single-pass-with-supplied-bounds /
    * fallback-scan contract; the one bounds aggregate reads 2·D longs).
    */
  def writeZOrderedN(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      files: Int,
      bits: Int = 16,
      bounds: Option[Seq[(Long, Long)]] = None): Unit = {
    val b = bounds.getOrElse {
      val aggs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      cols.indices.map(d => (r.getLong(2 * d), r.getLong(2 * d + 1)))
    }
    df.withColumn("__z", interleaveNormalizedN(cols.map(col), b, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
