package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver's TPC-H-ish fixtures (TESTDATA.md).
  *
  * Reads are plain Parquet scans: column pruning and predicate pushdown
  * reach the scan untouched (verify with `.explain` → `ReadSchema` /
  * `PushedFilters`), which is the property that matters when the same query
  * shape runs over 100 TB instead of 60k rows.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    // rejects unless nanos are surfaced as long (nanos since epoch). Set
    // defensively here because the driver may hand us a fresh session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** Spread a narrow scan across the cluster before CPU-heavy per-row work
    * (md5 shingling, 48-bit sketches, per-pair dot products).
    *
    * A small parquet file arrives as ONE input partition, serializing every
    * downstream expression onto a single core regardless of `local[n]` /
    * executor count. At real scale the input already has ≥ parallelism
    * splits and this is a no-op — the condition makes the shuffle a
    * small-corpus-only cost, never a 100 TB one.
    *
    * The check is planner-side only: estimated split count = leaf-relation
    * statistics bytes / `spark.sql.files.maxPartitionBytes` — the same
    * sizing the file source itself uses — compared against the default
    * parallelism. (The earlier `df.rdd.getNumPartitions` probe forced
    * physical planning of the sub-plan at query-BUILD time and would
    * de-optimize composition under further SQL.)
    */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val inputBytes = df.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    if (inputBytes < BigInt(maxSplit) * target) df.repartition(target) else df
  }
}
