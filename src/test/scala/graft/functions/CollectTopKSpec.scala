package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** The bounded-state top-k aggregate: equivalence with the definitional
  * window formulation (across the 32-partition merge path), k bounding, and
  * the two-phase plan shape that makes it scale.
  */
class CollectTopKSpec extends SparkSpec {

  test("collectTopK(struct) equals the ranked-window top-k per group") {
    val per = Tables.events(spark, Sf0001)
      .groupBy("event_type", "user_id")
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
    val viaAgg = per.groupBy("event_type")
      .agg(GraftFunctions.collectTopK(struct(col("cents"), col("user_id")), 5).as("tk"))
      .select(col("event_type"), explode(col("tk")).as("t"))
      .select(col("event_type"), col("t.cents"), col("t.user_id"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("cents").desc, col("user_id").desc)
    val viaWindow = per
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("event_type", "cents", "user_id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("collectTopK(reverse = true) equals the ascending-window bottom-k per group") {
    val per = Tables.events(spark, Sf0001)
      .groupBy("event_type", "user_id")
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
    val viaAgg = per.groupBy("event_type")
      .agg(GraftFunctions.collectTopK(
        struct(col("cents"), col("user_id")), 5, reverse = true).as("tk"))
      .select(col("event_type"), explode(col("tk")).as("t"))
      .select(col("event_type"), col("t.cents"), col("t.user_id"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("cents").asc, col("user_id").asc)
    val viaWindow = per
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("event_type", "cents", "user_id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("state is bounded at k even when the group is larger") {
    val n = Tables.events(spark, Sf0001)
      .groupBy("event_type")
      .agg(GraftFunctions.collectTopK(struct(col("value"), col("event_id")), 7).as("tk"))
      .select(size(col("tk")).as("n"))
      .agg(max("n"), min("n")).head()
    assert(n.getInt(0) === 7 && n.getInt(1) === 7)
  }

  test("the aggregate plans two-phase (map-side heap merge), no window sort") {
    val plan = Tables.events(spark, Sf0001)
      .groupBy("event_type")
      .agg(GraftFunctions.collectTopK(struct(col("value"), col("event_id")), 3).as("tk"))
      .queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate = heaps merge map-side; the
    // exchange carries k elements per (partition, group), not the group
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), s"top-k should not fall back to a window:\n$plan")
  }
}
