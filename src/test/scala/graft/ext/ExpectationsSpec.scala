package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Expectations: violated-when-unevaluable semantics, the one-scan plan for
  * N row rules, and uniqueness counting.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations.Rule

  private def df = Seq(
    (1L, Some(5L), "a"),
    (2L, None, "b"),     // null v: violates v_positive (unevaluable) but not name_known
    (3L, Some(-1L), "a"),
    (3L, Some(7L), "zz") // dup id; unknown name
  ).toDF("id", "v", "name")

  test("rules count false AND null as violations, in one report") {
    val got = Expectations.check(df, Seq(
        Rule("v_positive", col("v") > 0),
        Rule("name_known", col("name").isin("a", "b")),
        Rule("id_not_null", col("id").isNotNull)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      "v_positive" -> ((2L, 4L)),  // null v + negative v
      "name_known" -> ((1L, 4L)),
      "id_not_null" -> ((0L, 4L))))
  }

  test("N row rules cost one aggregate scan, not N") {
    val plan = Expectations.check(df, Seq(
        Rule("a", col("v") > 0), Rule("b", col("id") > 0), Rule("c", col("name") =!= "")))
      .queryExecution.executedPlan.toString
    // one partial+final aggregate pair over a single source scan; a
    // rule-per-scan shape would union N aggregates
    assert(!plan.contains("Union"), s"per-rule scans leaked in:\n$plan")
    assert("LocalTableScan".r.findAllIn(plan).size <= 1, plan)
  }

  test("unique counts every row of a duplicated key, zero when unique") {
    val dup = Expectations.unique(df, Seq("id"), "id_unique").head()
    assert((dup.getString(0), dup.getLong(1), dup.getLong(2)) === (("id_unique", 2L, 4L)))
    val uniq = Expectations.unique(df.filter(col("v").isNotNull), Seq("id", "v"), "u").head()
    assert(uniq.getLong(1) === 0L)
  }
}
