package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sweep-line concurrency: hand-computed maxima, the end==start overlap
  * convention, tied boundaries, day attribution, and equivalence of the
  * signed two-level prefix sum against the definitional global window.
  */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  test("maxConcurrent matches hand-computed overlap on one day") {
    // A=[0,10] and B=[5,15] overlap (2); C=[20,30] and D=[30,35] touch at
    // t=30 — the inclusive-end convention counts that as concurrent (2)
    val ivals = Seq((0L, 10L), (5L, 15L), (20L, 30L), (30L, 35L))
      .toDF("ts_start", "ts_end")
    val got = Concurrency.maxConcurrent(ivals).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2L))
  }

  test("tied starts land on one boundary and count together") {
    val ivals = Seq((7L, 9L), (7L, 12L), (7L, 8L)).toDF("ts_start", "ts_end")
    val got = Concurrency.maxConcurrent(ivals).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L))
  }

  test("maxima attribute to the day of the boundary that realizes them") {
    // A spans midnight; B starts on day 1 while A is still open
    val ivals = Seq((0L, Day + 10L), (Day + 5L, Day + 20L))
      .toDF("ts_start", "ts_end")
    val got = Concurrency.maxConcurrent(ivals).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 2L))
  }

  test("signed two-level prefix sum equals the single-window definition") {
    // groupSize 16 over pids up to 241 → ~16 groups: the signed
    // (monotone=false) group-prefix path is genuinely exercised
    val ivals = Seq((0L, 100L), (10L, 40L), (20L, 90L), (50L, 60L),
      (55L, 120L), (95L, 95L), (100L, 110L)).toDF("ts_start", "ts_end")
    val got = Concurrency.maxConcurrent(ivals, groupSize = 16L)
    val b = ivals.select((col("ts_start") * 2).as("pid"), lit(1L).as("delta"))
      .union(ivals.select((col("ts_end") * 2 + 1).as("pid"), lit(-1L).as("delta")))
    val naive = b
      .withColumn("conc", sum("delta").over(Window.orderBy("pid")))
      .withColumn("day", expr("pid div 2 div 86400000000"))
      .groupBy("day").agg(max("conc").as("max_concurrent"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }
}
