package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zone-map contract: the prune report's skipped-row count must equal the
  * brute-force count of rows living in files whose [zmin, zmax] cannot
  * intersect the predicate interval — and a clustered layout must prune
  * strictly more than an anti-correlated one for the same predicate.
  */
class ZoneMapsSpec extends SparkSpec {

  import spark.implicits._

  // 10 files × 100 rows; `k` is perfectly clustered with the file id,
  // `r` is a decorrelated permutation of the same domain.
  private def fixture = (0L until 1000L)
    .map(i => (i, i, (i * 613L) % 1000L))
    .toDF("id", "k", "r")

  test("pruneReport counts exactly the rows of non-intersecting files") {
    val zones = ZoneMaps.zoneStats(fixture, expr("id div 100"), col("k"))
    val rep = ZoneMaps.pruneReport(
      zones.withColumn("lo", lit(450L)).withColumn("hi", lit(549L)),
      col("lo"), col("hi"), "clustered").head()
    // files 0..3 (k ≤ 399) and 6..9 (k ≥ 600) prune; 4 and 5 intersect
    assert(rep.getAs[Long]("n_files") === 10L)
    assert(rep.getAs[Long]("n_pruned") === 8L)
    assert(rep.getAs[Long]("rows_total") === 1000L)
    assert(rep.getAs[Long]("rows_skipped") === 800L)
    assert(rep.getAs[Long]("skip_ppm") === 800000L)
  }

  test("clustered layout skips more than a decorrelated one") {
    def ppm(c: String): Long = {
      val zones = ZoneMaps.zoneStats(fixture, expr("id div 100"), col(c))
      ZoneMaps.pruneReport(
        zones.withColumn("lo", lit(450L)).withColumn("hi", lit(549L)),
        col("lo"), col("hi"), c).head().getAs[Long]("skip_ppm")
    }
    // (i*613)%1000 cycles the whole domain inside every 100-row file, so
    // every file's zone straddles the interval — nothing prunes.
    assert(ppm("k") === 800000L)
    assert(ppm("r") === 0L)
  }

  test("empty-prune edge: an interval covering the domain skips nothing") {
    val zones = ZoneMaps.zoneStats(fixture, expr("id div 100"), col("k"))
    val rep = ZoneMaps.pruneReport(
      zones.withColumn("lo", lit(0L)).withColumn("hi", lit(9999L)),
      col("lo"), col("hi"), "all").head()
    assert(rep.getAs[Long]("n_pruned") === 0L)
    assert(rep.getAs[Long]("rows_skipped") === 0L)
    assert(rep.getAs[Long]("skip_ppm") === 0L)
  }
}
