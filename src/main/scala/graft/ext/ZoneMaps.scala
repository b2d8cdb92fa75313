package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File-level zone maps — the min/max data-skipping statistics every
  * columnar lake format (parquet row-group stats, Delta/Iceberg file
  * stats) uses to prune I/O before a single byte of data is read.
  *
  * The reference delegates skipping entirely to Delta's file statistics
  * (its scans are `VERSION AS OF` / `table_changes` reads —
  * `unload_databricks_data_to_s3.py:183-200` — where pruning happens
  * below the API). This module makes that layer itself queryable: build
  * the zone map a given file layout WOULD have, then measure how much a
  * predicate could skip. That turns layout decisions (insertion order vs
  * z-order — see [[ZOrder]]) into a number you can regression-test: the
  * fraction of rows a range predicate never has to scan.
  *
  * Scale shape: a zone map is one aggregation keyed by file id (a shuffle
  * to |files| rows — million-row output for a 100 TB table, trivially
  * partitioned), and a prune report is a second aggregation over that
  * model-sized table. Nothing here is per-row after the first groupBy.
  * All arithmetic is integer min/max/count — engine-exact.
  */
object ZoneMaps {

  /** Per-file min/max/count for one stat column under a synthetic file
    * assignment. `fileId` is any deterministic row→file expression (e.g.
    * `l_orderkey div 4000` models insertion-clustered 4k-row files).
    */
  def zoneStats(df: DataFrame, fileId: Column, stat: Column): DataFrame =
    df.groupBy(fileId.as("file_id"))
      .agg(min(stat).as("zmin"), max(stat).as("zmax"), count(lit(1)).as("n_rows"))

  /** One-row skip report for the closed predicate interval [lo, hi]: a
    * file is prunable iff its zone cannot intersect the interval
    * (`zmax < lo || zmin > hi`). `zones` must carry
    * (file_id, zmin, zmax, n_rows) plus the lo/hi columns (typically
    * crossJoined 1-row bounds so no value ever visits the driver).
    */
  def pruneReport(zones: DataFrame, lo: Column, hi: Column, label: String): DataFrame = {
    val pruned = col("zmax") < lo || col("zmin") > hi
    zones
      .agg(
        count(lit(1)).as("n_files"),
        sum(pruned.cast("long")).as("n_pruned"),
        sum(col("n_rows")).as("rows_total"),
        sum(when(pruned, col("n_rows")).otherwise(lit(0L))).as("rows_skipped"))
      .withColumn("skip_ppm", expr("(1000000 * rows_skipped) div rows_total"))
      .withColumn("layout", lit(label))
  }
}
