package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Packing contracts: the two-level distributed prefix sum must equal the
  * definitional single global running sum, for any group size.
  */
class PackingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, Sf0001)

  test("two-level prefix sum equals the single-window definition (multi-group)") {
    // groupSize 64 over 500 docs → 8 groups, so the per-group prefix join
    // is genuinely exercised
    val got = Packing.packByBudget(docs, budget = 512L, groupSize = 64L)
    val naive = docs
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(Window.orderBy("doc_id")))
      .select(col("doc_id"), col("n_tokens"),
        expr("(cum - n_tokens) div 512").as("pack_id"),
        ((col("cum") - col("n_tokens")) % 512).as("pack_offset"))
    assert(got.count() === docs.count())
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("pack invariants: offsets in [0, budget), first doc at pack 0 offset 0") {
    val got = Packing.packByBudget(docs, budget = 512L, groupSize = 64L)
    assert(got.filter(col("pack_offset") < 0 || col("pack_offset") >= 512).count() === 0L)
    val first = got.orderBy("doc_id").limit(1).head()
    assert(first.getLong(2) === 0L && first.getLong(3) === 0L)
  }

  test("packSegments: per-pack segment lengths in offset order, hand-computed") {
    import spark.implicits._
    // token lengths 4,3,5,10,2 at budget 10 → starts 0,4,7,12,22 →
    // packs 0,0,0,1,2 — pack 0 holds [4,3,5], pack 1 [10], pack 2 [2]
    val tiny = Seq(
      (1L, "a b c d"), (2L, "a b c"), (3L, "a b c d e"),
      (4L, "a b c d e f g h i j"), (5L, "a b")).toDF("doc_id", "text")
    val got = Packing.packSegments(tiny, budget = 10L, groupSize = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === Map(
      0L -> ((3L, "4,3,5")), 1L -> ((1L, "10")), 2L -> ((1L, "2"))))
  }
}
