package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hilbert-index contract: the masked-rotation kernel must agree with the
  * classic published algorithm cell-for-cell, walk the grid through
  * adjacent cells only (the locality property Morton lacks — and the whole
  * reason the operator exists), and run inside whole-stage codegen.
  */
class HilbertSpec extends SparkSpec {

  /** The classic unmasked rotate-and-reflect formulation (public-domain
    * textbook form) — an INDEPENDENT implementation to cross-check the
    * masked kernel. Relies on two's-complement `&` for its negative
    * intermediates, which is exactly why the shipped kernel (and the SQL
    * oracle) use the masked form instead.
    */
  private def classic(n: Long, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("masked kernel equals the classic algorithm over the full 64x64 grid") {
    val bits = 6
    for (x <- 0L until 64L; y <- 0L until 64L)
      assert(HilbertOps.xy2d(x, y, bits) === classic(64L, x, y), s"cell ($x, $y)")
  }

  test("the walk is a bijection and every step moves to a grid NEIGHBOR") {
    val bits = 5
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (HilbertOps.xy2d(x.toLong, y.toLong, bits), (x, y))
    val byD = cells.sortBy(_._1)
    // bijection: d values are exactly 0 until n*n
    assert(byD.map(_._1) === (0L until n.toLong * n))
    // locality: consecutive d are Manhattan-distance-1 neighbors — the
    // property a Morton key violates at every power-of-two boundary
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump at d=$d2: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("the expression evaluates in whole-stage codegen and matches the kernel") {
    // a parquet-backed frame so the projection cannot constant-fold into a
    // LocalTableScan (a literal Seq evaluates at plan time — that exercises
    // interpreted eval, not the generated code)
    val df = graft.queries.Tables.lineitem(spark, Sf0001)
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"),
        GraftFunctions.hilbertIndex(col("l_partkey"), col("l_suppkey"), bits = 8).as("h"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getLong(2) === HilbertOps.xy2d(r.getLong(0), r.getLong(1), 8)))
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "hilbert_index fell out of whole-stage codegen")
  }
}
