package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Contracts of the [[LevenshteinPrefilter]] optimizer rule: the rewrite
  * changes the PLAN, never the RESULT; it is idempotent (it runs inside a
  * fixed-point batch); and it leaves the banded 3-arg form alone.
  */
class LevenshteinPrefilterSpec extends SparkSpec {

  import spark.implicits._

  private def installed(): Unit =
    graft.functions.GraftFunctions.registerOptimizations(spark)

  test("rewrite preserves results exactly (guard is implied by the bound)") {
    installed()
    val docs = Tables.documents(spark, Sf0001).limit(60)
      .select(col("doc_id"), lower(col("text")).as("t"))
    val pairs = docs.toDF("ida", "ta").crossJoin(docs.toDF("idb", "tb"))
      .filter(col("ida") < col("idb"))
    val bounded = pairs.filter(levenshtein(col("ta"), col("tb")) <= 40)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth computed without the rule: distances materialized first,
    // so no bounded-levenshtein predicate exists for the rule to rewrite
    val reference = pairs
      .withColumn("d", levenshtein(col("ta"), col("tb")))
      .collect().filter(_.getInt(4) <= 40)
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(bounded === reference)
  }

  test("the optimized plan carries the length-difference guard, once") {
    installed()
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text"))
    val df = docs.toDF("ida", "ta").crossJoin(docs.toDF("idb", "tb"))
      .filter(levenshtein(col("ta"), col("tb")) <= 25)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("levenshtein"), optimized)
    assert(optimized.contains("abs(") && optimized.contains("length("),
      s"prefilter missing from the optimized plan:\n$optimized")
    // fixed-point safe: exactly one guard per predicate, not one per pass
    assert("abs\\(".r.findAllIn(optimized).size === 1, optimized)
  }

  test("damerau_levenshtein <= k gets the same length guard, results intact") {
    installed()
    import graft.functions.GraftFunctions.damerauLevenshtein
    val names = Tables.part(spark, Sf0001).select(col("p_name")).distinct()
    val pairs = names.toDF("a").crossJoin(names.toDF("b")).filter(col("a") < col("b"))
    val df = pairs.filter(damerauLevenshtein(col("a"), col("b")) <= 3)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs(") && optimized.contains("length("),
      s"prefilter missing for damerau_levenshtein:\n$optimized")
    // the guard never drops a qualifying pair: dl >= abs(len diff)
    val guarded = df.select("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val reference = pairs
      .withColumn("d", damerauLevenshtein(col("a"), col("b")))
      .collect().filter(_.getInt(2) <= 3)
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(guarded === reference)
  }

  test("rule is a no-op on already-guarded and on 3-arg banded predicates") {
    val guarded = spark.sql(
      "SELECT * FROM VALUES ('ab','abc') AS t(a, b) " +
        "WHERE abs(length(a) - length(b)) <= 2 AND levenshtein(a, b) <= 2")
    assert(guarded.count() === 1L)
    // banded form: returns -1 above the threshold; rule must not touch it
    val banded = Seq(("kitten", "sitting")).toDF("a", "b")
      .select(expr("levenshtein(a, b, 1)").as("d"))
    assert(banded.head.getInt(0) === -1)
  }
}
