package graft.engine

import graft.SparkSpec
import graft.engine.JobSpec._

class CdcFilterSpec extends SparkSpec {
  import spark.implicits._

  private def cdcFrame = Seq(
    (1L, "insert"),
    (2L, "update_preimage"),
    (3L, "update_postimage"),
    (4L, "delete"),
    (5L, null.asInstanceOf[String])
  ).toDF("id", "_change_type")
    .withColumn("_commit_version", org.apache.spark.sql.functions.lit(7L))
    .withColumn("_commit_timestamp", org.apache.spark.sql.functions.lit("2024-01-01"))

  test("EVENT keeps inserts and null change types only") {
    val out = CdcFilter.filterData(cdcFrame, Event)
    assert(out.select("id").as[Long].collect().sorted === Array(1L, 5L))
  }

  test("property types also keep update post-images; WAREHOUSE shares the branch") {
    for (dt <- Seq(UserProperty, GroupProperty, WarehouseProperty)) {
      val out = CdcFilter.filterData(cdcFrame, dt)
      assert(out.select("id").as[Long].collect().sorted === Array(1L, 3L, 5L), s"for $dt")
    }
  }

  test("CDF metadata columns are dropped after filtering") {
    val out = CdcFilter.filterData(cdcFrame, Event)
    assert(out.columns.toSeq === Seq("id"))
  }

  test("frames without _change_type pass through untouched") {
    val df = Seq((1L, "a")).toDF("id", "x")
    assert(CdcFilter.filterData(df, Event) eq df)
  }

  test("mutability mode bypasses filter and keeps metadata columns") {
    val out = CdcFilter.filterData(cdcFrame, Event, mutabilityMode = true)
    assert(out.count() === 5)
    assert(out.columns.contains("_change_type"))
  }
}
