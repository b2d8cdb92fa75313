package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[RangeRank]] must be BIT-EQUAL to the single-partition global window it
  * replaces — the eight r11 call-site swaps (q374/q328/q264/q288/q290/q266/
  * q278/q372) rely on existing DuckDB oracles replaying unchanged. Checked
  * against Spark's own `Window.orderBy` on inputs with ties, negatives, and
  * more partitions than the test session's 4 shuffle partitions.
  */
class RangeRankSpec extends SparkSpec {
  import spark.implicits._

  test("rank equals global row_number over a total order (ties on the key)") {
    // keys collide heavily so boundary placement matters; id breaks ties
    val df = (1L to 997L).map(i => (i, i % 13)).toDF("id", "k")
    val got = RangeRank.rank(df, Seq(col("k").desc, col("id").asc), "r", 7)
      .select("id", "r")
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("k").desc, col("id").asc)).cast("long"))
      .select("id", "r")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("prefix equals a global ROWS running sum with signed values") {
    val df = (1L to 500L).map(i => (i, if (i % 3 == 0) -2L else 1L)).toDF("id", "v")
    val got = RangeRank.prefix(df, Seq(col("id").asc), col("v"), "cum", 5)
      .select("id", "cum")
    val want = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("id").asc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "cum")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("result carries no unpartitioned WindowExec and keeps input columns") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = (1L to 100L).map(i => (i, s"p$i")).toDF("id", "payload")
    val out = RangeRank.rank(df, Seq(col("id").desc), "r", 3)
    assert(out.columns.toSet === Set("id", "payload", "r"))
    val bad = out.queryExecution.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "RangeRank itself shipped a global window")
  }

  test("property: rank/prefix equal the global window on random shapes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 400)
      mod <- Gen.choose(1, 20) // tie density of the sort key
      parts <- Gen.choose(2, 9) // deliberately unrelated to data size
      neg <- Gen.oneOf(true, false)
    } yield (n, mod, parts, neg)
    val cases = (1 to 8).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.size === 8)
    cases.foreach { case (n, mod, parts, neg) =>
      val df = (1L to n.toLong)
        .map(i => (i, i % mod, if (neg && i % 3 == 0) -i else i))
        .toDF("id", "k", "v")
      val gotR = RangeRank.rank(df, Seq(col("k").asc, col("id").desc), "r", parts)
        .select("id", "r")
      val wantR = df.withColumn("r",
          row_number().over(Window.orderBy(col("k").asc, col("id").desc)).cast("long"))
        .select("id", "r")
      assert(gotR.except(wantR).isEmpty && wantR.except(gotR).isEmpty,
        s"rank mismatch at n=$n mod=$mod parts=$parts")
      val gotP = RangeRank.prefix(df, Seq(col("k").asc, col("id").asc), col("v"), "c", parts)
        .select("id", "c")
      val wantP = df.withColumn("c",
          sum(col("v")).over(Window.orderBy(col("k").asc, col("id").asc)
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select("id", "c")
      assert(gotP.except(wantP).isEmpty && wantP.except(gotP).isEmpty,
        s"prefix mismatch at n=$n mod=$mod parts=$parts")
    }
  }

  test("degenerate inputs: empty frame and single row") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(RangeRank.rank(empty, Seq(col("id")), "r").count() === 0L)
    val one = Seq((42L, 7L)).toDF("id", "v")
    val r = RangeRank.prefix(one, Seq(col("id")), col("v"), "cum").collect()
    assert(r.length === 1 && r.head.getAs[Long]("cum") === 7L)
  }
}
