package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Jaro-Winkler contract: the kernel must reproduce the published textbook
  * values (the same ones DuckDB's `jaro_winkler_similarity` — the q221
  * oracle side — returns), handle the degenerate cases, and run inside
  * whole-stage codegen (a Scala UDF here would box every candidate pair of
  * the blocked fuzzy join).
  */
class StringSimilaritySpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    SimOps.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel reproduces the published textbook values") {
    // Winkler's own canonical examples
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    // prefix boost caps at 4 chars; suffix-only change on a long prefix
    assert(math.abs(jw("red widget", "red widgets") - 0.9818181818181818) < 1e-15)
  }

  test("degenerate cases: equal, empty, disjoint, window-excluded transposition") {
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("x", "y") === 0.0)
    // match window for len-2 strings is max(2,2)/2-1 = 0 → "ab"/"ba" share
    // no in-window chars at all (the classic surprise; DuckDB agrees)
    assert(jw("ab", "ba") === 0.0)
  }

  test("boost applies only above the 0.7 jaro threshold") {
    // "abcdef"/"abzzzz": m=2 (the shared prefix), t=0
    // → jaro = (2/6 + 2/6 + 2/2)/3 = 0.555… ≤ 0.7, so despite the 2-char
    // common prefix NO Winkler boost may be added (boosted would be 0.644…)
    val raw = jw("abcdef", "abzzzz")
    val expectedJaro = (2.0 / 6 + 2.0 / 6 + 1.0) / 3
    assert(raw === expectedJaro, "boost leaked below the 0.7 threshold")
  }

  test("expression survives compiled codegen and matches the kernel") {
    val e = JaroWinkler(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, StringType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val out = proj(InternalRow(
      UTF8String.fromString("small ring"), UTF8String.fromString("small rung")))
    assert(out.getDouble(0) === jw("small ring", "small rung"))
    assert(math.abs(out.getDouble(0) - 0.96) < 1e-15)
  }

  test("whole-stage codegen over parquet; nulls propagate") {
    val df = graft.queries.Tables.part(spark, Sf0001)
      .select(col("p_name"),
        GraftFunctions.jaroWinkler(col("p_name"), lit("small ring")).as("sim"),
        GraftFunctions.jaroWinkler(lit(null).cast("string"), col("p_name")).as("nsim"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) === jw(r.getString(0), "small ring"))
      assert(r.isNullAt(2), "null input must yield null similarity")
    }
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "jaro_winkler fell out of whole-stage codegen")
  }

  test("SQL registration: jaro_winkler callable from spark.sql") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").head().getDouble(0)
    assert(math.abs(got - 0.9611111111111111) < 1e-15)
  }

  private def dl(a: String, b: String): Int =
    SimOps.damerauLevenshtein(UTF8String.fromString(a), UTF8String.fromString(b))

  test("damerau-levenshtein: FULL (Lowrance-Wagner) semantics, not OSA") {
    // the discriminating case: OSA says 3, full DL says 2 — DuckDB (the
    // q276 oracle side) returns 2
    assert(dl("CA", "ABC") === 2)
    assert(dl("ab", "ba") === 1)
    assert(dl("abc", "acb") === 1)
    // transposition-free inputs degrade to plain levenshtein
    assert(dl("kitten", "sitting") === 3)
    assert(dl("", "abc") === 3 && dl("abc", "") === 3)
    assert(dl("same", "same") === 0)
    // substitution is never beaten by a fake double-transposition
    assert(dl("abcd", "abed") === 1)
  }

  test("damerau-levenshtein expression: compiled codegen matches the kernel") {
    val e = DamerauLevenshtein(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, StringType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val out = proj(InternalRow(
      UTF8String.fromString("small ring"), UTF8String.fromString("small rign")))
    assert(out.getInt(0) === 1, "adjacent swap must cost one edit")
    assert(out.getInt(0) === dl("small ring", "small rign"))
  }
}
