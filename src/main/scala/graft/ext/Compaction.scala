package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file COMPACTION planning — the table-housekeeping operator every
  * long-lived 100 TB layout needs: incremental commits (CDC folds, streaming
  * sinks, per-run exports like the reference's) accrete files far below the
  * ideal scan unit, and read throughput decays with per-file open/footer
  * overhead until someone rewrites small files into `targetBytes`-sized
  * ones. The PLAN (which files merge into which output) is itself a query
  * over the file manifest — this operator is that query, the same shape
  * `OPTIMIZE`/bin-packing maintenance jobs compute.
  *
  * Binning rule: files in stable `idCol` order are laid end to end and cut
  * at `targetBytes` boundaries — bin = `floor(cumulative_bytes_before /
  * targetBytes)` — i.e. concat-and-chunk over whole files, the same
  * formulation as [[Packing.packByBudget]] over tokens (a bin may overhang
  * its target by at most one file; a greedy close-when-full fold is
  * sequential and gains little). Keeping id order preserves any clustering
  * the layout already has (e.g. a [[ZOrder]] write's z-ranges): compaction
  * merges NEIGHBORS, it never interleaves distant key ranges.
  *
  * Scale shape: the cumulative size is [[Packing.prefixSum]]'s two-level
  * distributed prefix sum — no global-order window over the manifest (at
  * 100 TB with 128 MB files the manifest is ~10⁶ rows; with the small files
  * this plans away, far more). All integer arithmetic → exact DuckDB
  * oracle.
  */
object Compaction {

  /** Assign each file a compaction bin: input columns plus `bin_id`.
    * Files with `bytes >= targetBytes` still join their neighbors' bin by
    * the cut rule (they already span ≥ 1 full bin width, so they dominate
    * whatever bin they land in — rewriting them is a no-op the executor of
    * the plan can skip by `bytes` alone).
    */
  def planBins(
      files: DataFrame,
      targetBytes: Long,
      idCol: String = "file_id",
      sizeCol: String = "bytes",
      groupSize: Long = 4096L): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    Packing.prefixSum(files, idCol, sizeCol, groupSize)
      .withColumn("bin_id", expr(s"__start div $targetBytes"))
      .drop("__start")
  }

  /** The plan SUMMARY maintenance jobs act on: one row per bin with its
    * file count and total bytes (a bin with `n_files == 1` needs no
    * rewrite).
    */
  def planSummary(
      files: DataFrame,
      targetBytes: Long,
      idCol: String = "file_id",
      sizeCol: String = "bytes",
      groupSize: Long = 4096L): DataFrame =
    planBins(files, targetBytes, idCol, sizeCol, groupSize)
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_files"), sum(col(sizeCol)).as("bin_bytes"))
}
