package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Bloom-pruned joins: result identity with the exact semi/anti joins (the
  * no-false-negatives contract), the prefilter's presence in the physical
  * plan, and the empty-build edge.
  */
class BloomJoinSpec extends SparkSpec {

  private def li = Tables.lineitem(spark, Sf0001)
  private def urgent =
    Tables.orders(spark, Sf0001).filter(col("o_orderpriority") === "1-URGENT")

  test("bloomSemiJoin equals the exact left-semi join") {
    val viaBloom = BloomJoin.bloomSemiJoin(li, urgent, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, numBits = 1L << 16)
    val exact = li.join(urgent.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi")
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
    assert(viaBloom.count() > 0)
  }

  test("bloomAntiJoin equals the exact left-anti join") {
    val viaBloom = BloomJoin.bloomAntiJoin(li, urgent, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, numBits = 1L << 16)
    val exact = li.join(urgent.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_anti")
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
    assert(viaBloom.count() > 0)
  }

  test("the Bloom prefilter gates the probe scan in the physical plan") {
    val plan = BloomJoin.bloomSemiJoin(li, urgent, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no Bloom membership probe ahead of the join:\n$plan")
    // the sketch must ride the scalar-subquery channel, not sit in the plan
    // tree as a binary literal (a large-numBits literal bloats every plan
    // copy and task binary — the IVF-centroid literal wall)
    assert(plan.toLowerCase.contains("subquery"),
      s"sketch is not conveyed by a scalar subquery:\n$plan")
    assert(!plan.contains("might_contain(0x"),
      s"sketch embedded as a binary literal in the plan:\n$plan")
  }

  test("empty build side: semi keeps nothing, anti keeps everything") {
    val none = urgent.filter(lit(false))
    assert(BloomJoin.bloomSemiJoin(li, none, "l_orderkey", "o_orderkey").count() === 0L)
    assert(BloomJoin.bloomAntiJoin(li, none, "l_orderkey", "o_orderkey").count() === li.count())
  }
}
