package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Bucketed co-located joins: shuffle-freedom of the join (the property the
  * write-time clustering buys) and result identity with the plain parquet
  * join.
  */
class BucketingSpec extends SparkSpec {

  private def fixture(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    Bucketing.writeBucketed(Tables.orders(spark, Sf0001),
      "orders_bkt_spec", s"$dir/orders", "o_orderkey", buckets = 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, Sf0001).withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_bkt_spec", s"$dir/lineitem", "o_orderkey", buckets = 4)
    ("orders_bkt_spec", "lineitem_bkt_spec")
  }

  test("bucketed equi-join plans with no Exchange and no extra Sort") {
    val (o, l) = fixture()
    // the property bucketing buys is shuffle-freedom when NEITHER side can
    // broadcast (at 100 TB neither fact table does); the sf0.001 fixture is
    // broadcast-sized, so pin the regime the layout is FOR
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try Bucketing.bucketedJoin(spark, o, l, "o_orderkey")
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert(!plan.contains("Exchange"),
      s"bucketed join should be shuffle-free:\n$plan")
    // SMJ's remaining Sorts must be partition-LOCAL (`, false`) — O(n) over
    // the at-rest bucket order, no exchange. (Spark ≥3.0 does not report
    // bucket sort order at scan time unless the legacy
    // bucketedTableScan.outputOrdering conf is on, so the local Sort node
    // stays; the property bucketing buys — no shuffle — is asserted above.)
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"bucketed join introduced a global sort:\n$plan")
    val joined = Bucketing.bucketedJoin(spark, o, l, "o_orderkey")

    // result identity with the plain parquet join
    val plain = Tables.orders(spark, Sf0001).join(
      Tables.lineitem(spark, Sf0001).withColumnRenamed("l_orderkey", "o_orderkey"),
      Seq("o_orderkey"))
    assert(joined.count() === plain.count())
    val a = joined.groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
    val b = plain.groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("each bucketed table writes exactly one file per bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt-files").toString
    Bucketing.writeBucketed(Tables.orders(spark, Sf0001),
      "orders_bkt_files", s"$dir/o", "o_orderkey", buckets = 4)
    val files = new java.io.File(s"$dir/o").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.length === 4,
      s"expected one file per bucket, got ${files.map(_.getName).mkString(", ")}")
  }
}
