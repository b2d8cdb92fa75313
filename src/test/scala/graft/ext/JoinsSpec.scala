package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** As-of and range join operator contracts, pinned against the naive
  * formulations they replace at scale.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOf matches latest right row at-or-before left ts; inclusive ties; null when none") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 50L))
      .toDF("k", "ts")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (3L, 1L, "z"))
      .toDF("k", "rts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("k", "ts", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
      .toSet
    assert(got === Set(
      (1L, 10L, "a"),  // tie: right row at the same ts matches (inclusive)
      (1L, 20L, "b"),  // latest of the two prior rows
      (1L, 5L, null),  // nothing at-or-before
      (2L, 50L, null)  // key has no right rows at all
    ))
  }

  test("forward asOf matches earliest right at-or-after; inclusive ties; tolerance nulls") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 40L), (2L, 50L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "a"), (1L, 25L, "b"), (3L, 1L, "z")).toDF("k", "rts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"),
        tolerance = Some(5L), forward = true)
      .select("k", "ts", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
      .toSet
    assert(got === Set(
      (1L, 10L, "a"),  // tie at equal ts matches (inclusive), gap 0 <= 5
      (1L, 20L, "b"),  // next right at 25, gap 5 within tolerance
      (1L, 40L, null), // nothing at-or-after
      (2L, 50L, null)  // key has no right rows at all
    ))
    // without tolerance the 20 -> 25 match stays; a 6-wide gap is dropped
    val tight = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"),
        tolerance = Some(4L), forward = true)
      .select("k", "ts", "v").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(tight(20L) === null, "gap 5 must fail a tolerance of 4")
    assert(tight(10L) === "a")
  }

  test("asOf attaches the true latest right row even when its value is NULL") {
    val left = Seq((1L, 3L)).toDF("k", "ts")
    val right = Seq((1L, 1L, Some("a")), (1L, 2L, None))
      .toDF("k", "rts", "v")
    // the as-of match is the ts=2 row whose v IS NULL — a per-column
    // ignoreNulls fill would resurrect the stale ts=1 'a'
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v")).collect()
    assert(got.length === 1 && got.head.isNullAt(2))
  }

  test("asOf rejects valueCols colliding with left columns") {
    val left = Seq((1L, 3L, "x")).toDF("k", "ts", "v")
    val right = Seq((1L, 1L, "a")).toDF("k", "rts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asOf tolerance nullifies matches older than the bound") {
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "ts")
    val right = Seq((1L, 90L, "x")).toDF("k", "rts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"), tolerance = Some(50L))
      .select("ts", "v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(got === Set((100L, "x"), (200L, null))) // 200-90=110 > 50
  }

  test("asOf equals DuckDB-style naive asof on real events data") {
    val e = Tables.events(spark, Sf0001).withColumn("tsu", expr("ts div 1000"))
    val purchases = e.filter(col("event_type") === "purchase").select("event_id", "user_id", "tsu")
    val signups = e.filter(col("event_type") === "signup")
      .groupBy("user_id", "tsu").agg(max("value").as("v"))
    val fast = AsOfJoin.asOf(purchases, signups, Seq("user_id"), "tsu", "tsu", Seq("v"))
    // naive: theta-join all prior signups, keep the latest per purchase
    val naive = purchases.as("p")
      .join(signups.as("s"),
        col("p.user_id") === col("s.user_id") && col("s.tsu") <= col("p.tsu"), "left")
      .groupBy(col("p.event_id"), col("p.user_id"), col("p.tsu"))
      .agg(max_by(col("s.v"), col("s.tsu")).as("v"))
      .select(col("event_id"), col("user_id"), col("tsu"), col("v"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("pointInInterval raises a descriptive error for absurdly wide intervals") {
    import spark.implicits._
    val points = Seq((1L, 5.0)).toDF("id", "p")
    val wide = Seq((9L, 0.0, 1.0e9)).toDF("iv", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, wide, "p", "lo", "hi", bucketWidth = 1.0).count()
    }
    assert(e.getMessage.contains("pointInInterval") ||
      Option(e.getCause).exists(_.getMessage.contains("pointInInterval")))
  }

  test("pointInInterval equals the naive BETWEEN join") {
    val points = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") / col("l_quantity")).as("up"))
    val bands = Tables.part(spark, Sf0001)
      .select(col("p_partkey"), (col("p_retailprice") - 0.1).as("lo"),
        (col("p_retailprice") + 0.1).as("hi"))
    val fast = RangeJoin.pointInInterval(points, bands, "up", "lo", "hi", bucketWidth = 1.0)
      .select("l_orderkey", "l_linenumber", "p_partkey")
    val naive = points.join(bands, col("up").between(col("lo"), col("hi")))
      .select("l_orderkey", "l_linenumber", "p_partkey")
    assert(fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // and the bucketed plan is an EQUI-join (hash/sort-merge), not a
    // nested-loop: the join condition carries the quantized bucket key
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"expected equi-join plan:\n$plan")
  }
}
