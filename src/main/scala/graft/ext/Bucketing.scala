package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (hash-clustered) table layout — Spark's answer to co-located
  * joins: both sides written `bucketBy(n, key)` agree on a partitioning at
  * REST, so an equi-join on the key plans with NO Exchange on either side.
  * At 100 TB this converts the recurring fact-to-fact join (the one too big
  * to broadcast either side of) from two full shuffles per run into zero —
  * the shuffle is paid ONCE at write time and amortized over every
  * subsequent join, aggregation, or incremental batch keyed the same way.
  *
  * Mechanics that make it work (all asserted in BucketingSpec):
  *   - `repartition(buckets, key)` before the write → exactly one file per
  *     bucket, so the sorted-bucket property survives (many files per bucket
  *     would re-introduce a merge Sort under the join);
  *   - `sortBy(key)` inside buckets → SortMergeJoin needs no Sort either;
  *   - both sides must agree on bucket COUNT and key (Spark joins bucketed
  *     tables shuffle-free only when the clustering matches).
  *
  * Tables are EXTERNAL (explicit parquet `path`), so the data lives under
  * the caller's directory and the metastore entry is just a pointer —
  * re-registering in a fresh session is cheap and idempotent.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table. Overwrites
    * both the table entry and the path.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** The co-located equi-join of two same-bucketing tables, as DataFrames.
    * Callers join/aggregate the result like any relation; the plan carries
    * no Exchange below the join (BucketingSpec asserts it).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
