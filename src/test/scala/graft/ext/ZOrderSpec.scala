package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Z-order clustering: interleave correctness on known bit patterns, and
  * the PHYSICAL property the key exists for — files (range partitions of
  * the z key) cover bounded rectangles in BOTH dimensions, where a
  * single-key sort leaves the other dimension unclustered.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places x bits at even and y bits at odd positions") {
    val rows = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (0L, 2L),
      (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL), (12345L, 54321L))
      .toDF("x", "y")
    val got = rows.select(col("x"), col("y"),
      ZOrder.interleave(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    got.foreach { case (x, y, z) =>
      assert(z === ref(x, y), s"interleave($x, $y)")
    }
    // spot values: z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,0)=4, z(0,2)=8
    val m = got.map { case (x, y, z) => (x, y) -> z }.toMap
    assert(m((1L, 0L)) === 1L && m((0L, 1L)) === 2L && m((1L, 1L)) === 3L)
    assert(m((2L, 0L)) === 4L && m((0L, 2L)) === 8L)
  }

  test("interleaveN round-robins bits across D dimensions; D=2 equals interleave") {
    // 3-D spot values: bit i of dim d lands at 3i + d
    val rows = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (1L, 1L, 1L),
      (2L, 0L, 0L), (0L, 2L, 0L), (0L, 0L, 2L), (5L, 3L, 7L))
      .toDF("a", "b", "c")
    val got = rows.select(col("a"), col("b"), col("c"),
      ZOrder.interleaveN(Seq(col("a"), col("b"), col("c")), bits = 20).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    def ref(vs: Seq[Long], bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        vs.zipWithIndex.foldLeft(acc) { case (a, (v, d)) =>
          a | (((v >> i) & 1L) << (i * vs.size + d))
        }
      }
    got.foreach { case (k @ (a, b, c), z) =>
      assert(z === ref(Seq(a, b, c), 20), s"interleaveN$k")
    }
    assert(got((1L, 0L, 0L)) === 1L && got((0L, 1L, 0L)) === 2L
      && got((0L, 0L, 1L)) === 4L && got((1L, 1L, 1L)) === 7L)
    assert(got((2L, 0L, 0L)) === 8L && got((0L, 2L, 0L)) === 16L
      && got((0L, 0L, 2L)) === 32L)
    // the 2-D public API is exactly the D=2 case
    val two = Seq((12345L, 54321L)).toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y")).as("z2"),
        ZOrder.interleaveN(Seq(col("x"), col("y"))).as("zn"))
      .head()
    assert(two.getLong(0) === two.getLong(1))
  }

  test("3-dim z-ordered layout bounds per-file extents in ALL THREE dimensions") {
    val work = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
    try {
      val li = Tables.lineitem(spark, Sf0001)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val dims = Seq("l_orderkey", "l_partkey", "l_suppkey")
      ZOrder.writeZOrderedN(li, s"$work/z3", dims, files = 64, bits = 16)
      val out = spark.read.parquet(s"$work/z3")
      assert(out.exceptAll(li).isEmpty && li.exceptAll(out).isEmpty)

      val r = li.agg(
        (max(dims(0)) - min(dims(0))).as("r0"),
        (max(dims(1)) - min(dims(1))).as("r1"),
        (max(dims(2)) - min(dims(2))).as("r2")).head()
      val e = out.groupBy(input_file_name())
        .agg((max(dims(0)) - min(dims(0))).as("e0"),
          (max(dims(1)) - min(dims(1))).as("e1"),
          (max(dims(2)) - min(dims(2))).as("e2"))
        .agg(avg("e0"), avg("e1"), avg("e2")).head()
      // 64 files in 3 dims ≈ a 4x4x4 tiling: every dimension's mean
      // per-file extent must be well under its full range (a single-key
      // sort leaves two of the three at ~full range)
      (0 until 3).foreach { d =>
        assert(e.getDouble(d) < 0.5 * r.getLong(d),
          s"dim ${dims(d)} extent ${e.getDouble(d)} vs range ${r.getLong(d)}")
      }
    } finally rmTree(java.nio.file.Paths.get(work))
  }

  test("z-ordered layout bounds per-file extents in BOTH dimensions") {
    val li = Tables.lineitem(spark, Sf0001)
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val ranges = li.agg(
      (max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
      .head()
    val (rx, ry) = (ranges.getLong(0).toDouble, ranges.getLong(1).toDouble)

    def meanExtents(sorted: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val e = sorted
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
        .agg(avg("ex"), avg("ey")).head()
      (e.getDouble(0), e.getDouble(1))
    }
    // z layout: 16 range partitions of the NORMALIZED Morton key = ~4x4
    // tiling even though the two domains have very different widths
    val bounds = li.agg(min("x"), max("x"), min("y"), max("y")).head()
    val (zx, zy) = meanExtents(
      li.withColumn("__z", ZOrder.interleaveNormalized(col("x"), col("y"),
          bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3)))
        .repartitionByRange(16, col("__z")).drop("__z"))
    // single-key layout: x is clustered, y is not
    val (sx, sy) = meanExtents(li.repartitionByRange(16, col("x")))

    // both dimensions bounded under z (tiles), vs the single-key layout
    // where the unsorted dimension spans ~the full range in every file
    assert(zx < 0.5 * rx, s"z layout x-extent $zx vs range $rx")
    assert(zy < 0.5 * ry, s"z layout y-extent $zy vs range $ry")
    assert(sy > 0.9 * ry, s"x-sorted layout should leave y unclustered, got $sy of $ry")
    assert(zy < 0.6 * sy, s"z should beat single-key on the second dimension: $zy vs $sy")
  }

  test("writeZOrdered with caller-supplied bounds skips the scan and matches the scanned layout") {
    val work = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      val li = Tables.lineitem(spark, Sf0001)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val b = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).head()
      val known = ZOrder.Bounds(b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))

      // count the jobs each write needs: supplied bounds must save the
      // bounds-aggregate job (the single-pass claim, asserted not narrated)
      def jobsDuring(body: => Unit): Int = {
        val counter = new java.util.concurrent.atomic.AtomicInteger
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            counter.incrementAndGet(); ()
          }
        }
        spark.sparkContext.addSparkListener(l)
        try {
          body
          // listener delivery is async: poll until the count stops moving
          var prev = -1
          var spins = 0
          while (counter.get() != prev && spins < 50) {
            prev = counter.get(); Thread.sleep(100); spins += 1
          }
        } finally spark.sparkContext.removeSparkListener(l)
        counter.get()
      }
      val jobsScanned = jobsDuring(ZOrder.writeZOrdered(
        li, s"$work/scanned", "l_partkey", "l_suppkey", files = 16))
      val jobsSupplied = jobsDuring(ZOrder.writeZOrdered(
        li, s"$work/supplied", "l_partkey", "l_suppkey", files = 16, bounds = Some(known)))
      assert(jobsSupplied < jobsScanned,
        s"supplied bounds should skip the bounds scan: $jobsSupplied vs $jobsScanned jobs")

      // identical rows either way (layout is the only thing bounds affect;
      // exact file placement is not comparable — repartitionByRange samples
      // with an RDD-id-derived seed, so two runs draw different boundaries)
      val scanned = spark.read.parquet(s"$work/scanned")
      val supplied = spark.read.parquet(s"$work/supplied")
      assert(scanned.exceptAll(supplied).isEmpty && supplied.exceptAll(scanned).isEmpty)
      // and the supplied-bounds output still has the z property: per-file
      // extents bounded in BOTH dimensions
      val r = li.agg(
        (max("l_partkey") - min("l_partkey")).as("rx"),
        (max("l_suppkey") - min("l_suppkey")).as("ry")).head()
      val e = supplied
        .groupBy(input_file_name())
        .agg((max("l_partkey") - min("l_partkey")).as("ex"),
          (max("l_suppkey") - min("l_suppkey")).as("ey"))
        .agg(avg("ex"), avg("ey")).head()
      assert(e.getDouble(0) < 0.5 * r.getLong(0),
        s"x extent ${e.getDouble(0)} vs range ${r.getLong(0)}")
      assert(e.getDouble(1) < 0.5 * r.getLong(1),
        s"y extent ${e.getDouble(1)} vs range ${r.getLong(1)}")
    } finally rmTree(java.nio.file.Paths.get(work))
  }
}
