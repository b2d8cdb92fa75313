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

  test("saltedJoin preserves left-join semantics for unmatched keys") {
    import spark.implicits._
    val probe = Seq((1L, "x"), (2L, "y")).toDF("k", "p")
    val build = Seq((1L, "m")).toDF("k", "b")
    val got = Skew.saltedJoin(probe, build, Seq("k"), salts = 4, joinType = "left")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(got === Set((1L, "x", Some("m")), (2L, "y", None)))
  }
}
