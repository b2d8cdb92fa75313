package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Salted-join contract: identical result set to the unsalted join, salt in
  * the join key (so a hot key spreads over `salts` reducers).
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join on orders ⋈ customer") {
    val orders = Tables.orders(spark, Sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, Sf0001)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val salted = Skew.saltedJoin(orders, customer, Seq("o_custkey"), salts = 8)
    val plain = orders.join(customer, Seq("o_custkey"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"expected __salt in the join key:\n$plan")
  }

  test("probe salt: content mode spreads distinct payloads deterministically") {
    import spark.implicits._
    val probe = (1 to 512).map(i => (7L, s"p$i")).toDF("k", "p")
    // the ACTUAL expression saltedJoin uses, both evaluations identical
    // (retry-stability is exactly re-evaluation giving the same assignment)
    val salt = Skew.probeSalt(probe, Seq("k"), 8, spreadIdenticalRows = false).cast("long")
    val once = probe.withColumn("__salt", salt).collect().map(r => r.getString(1) -> r.getLong(2))
    val again = probe.withColumn("__salt", salt).collect().map(r => r.getString(1) -> r.getLong(2))
    assert(once.sorted.sameElements(again.sorted), "content salt must be recompute-stable")
    assert(once.map(_._2).distinct.length > 1, "distinct payloads must spread across salts")
  }

  test("probe salt: spreadIdenticalRows mode spreads a constant-payload hot key") {
    import spark.implicits._
    // identical rows (the common duplicate-row skew case): the content hash
    // collapses them onto ONE salt; the row-local mode must not
    val probe = Seq.fill(512)((7L, "same")).toDF("k", "p")
    val contentSalts = probe
      .withColumn("__salt", Skew.probeSalt(probe, Seq("k"), 8, spreadIdenticalRows = false))
      .select("__salt").distinct().count()
    assert(contentSalts === 1L, "identical rows hash to one salt by construction")
    val spreadSalts = probe
      .withColumn("__salt", Skew.probeSalt(probe, Seq("k"), 8, spreadIdenticalRows = true))
      .select("__salt").distinct().count()
    assert(spreadSalts > 1, "constant-payload hot key still landed on one salt")
    // and the join result is unchanged in either mode
    val build = Seq((7L, "m")).toDF("k", "b")
    assert(Skew.saltedJoin(probe, build, Seq("k"), 8, spreadIdenticalRows = true).count() === 512L)
    assert(Skew.saltedJoin(probe, build, Seq("k"), 8).count() === 512L)
  }

  test("pointInInterval treats an inverted interval (lo > hi) as empty") {
    import spark.implicits._
    // hiB - loB is negative for inverted intervals: it must not pass the
    // width guard into a DESCENDING sequence() of ~1e9 bucket ids, and it
    // must match nothing (BETWEEN semantics)
    val points = Seq((1L, 5.0)).toDF("id", "p")
    val ivs = Seq((9L, 1.0e9, 0.0), (10L, 4.0, 6.0)).toDF("iv", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", bucketWidth = 1.0)
      .select("iv").as[Long].collect()
    assert(got.toSeq === Seq(10L))
  }

  test("saltedJoin preserves left-join semantics for unmatched keys") {
    import spark.implicits._
    val probe = Seq((1L, "x"), (2L, "y")).toDF("k", "p")
    val build = Seq((1L, "m")).toDF("k", "b")
    val got = Skew.saltedJoin(probe, build, Seq("k"), salts = 4, joinType = "left")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(got === Set((1L, "x", Some("m")), (2L, "y", None)))
  }

  test("saltedDistinctCount equals the plain COUNT(DISTINCT) per key") {
    val e = Tables.events(spark, Sf0001)
    val salted = Skew.saltedDistinctCount(e, Seq("event_type"), "user_id", salts = 16,
      outCol = "n_users")
    val plain = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // salts = 1 degenerates to the plain aggregate too
    val one = Skew.saltedDistinctCount(e, Seq("event_type"), "user_id", salts = 1,
      outCol = "n_users")
    assert(one.exceptAll(plain).isEmpty && plain.exceptAll(one).isEmpty)
  }
}
