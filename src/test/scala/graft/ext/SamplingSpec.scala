package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Deterministic-sampling contracts: run-to-run stability (the whole point
  * vs `df.sample`), membership independence from partitioning, and exact
  * per-stratum quotas.
  */
class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, Sf0001)

  test("tokenQuota: greedy longest-first cut on a hand-computed fixture") {
    import spark.implicits._
    val fixture = Seq(
      (0L, "a b c", "s1", 30L),       // 3 tokens, first in s1 -> cum_before 0
      (1L, "d e", "s1", 20L),         // 2 tokens, cum_before 3 (< 4: kept whole)
      (2L, "f", "s1", 10L),           // cum_before 5 -> dropped
      (3L, "g h i j k", "s2", 50L)    // s2 starts fresh -> kept
    ).toDF("doc_id", "text", "source", "n_chars")
    val got = Sampling.tokenQuota(fixture, budgetPerSource = 4L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got === Seq((0L, "s1", 3L, 0L), (1L, "s1", 2L, 3L), (3L, "s2", 5L, 0L)))
  }

  test("shardAssign: dense per-shard positions, stable, id-partitioning") {
    import spark.implicits._
    val ids = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = Sampling.shardAssign(ids, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.map(_._1).sorted === (0L until 100L).toArray, "every id assigned once")
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted === rows.indices.map(_.toLong).toArray,
        s"shard $shard positions must be dense 0..n-1")
    }
    // reproducible: a second run (different partitioning) is identical
    val b = Sampling.shardAssign(ids.repartition(7), nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1) === b.sortBy(_._1))
  }

  test("shardAppend: new rows continue each shard exactly after the old count") {
    import spark.implicits._
    val old = (0L until 40L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val fresh = (40L until 60L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val base = Sampling.shardAssign(old, nShards = 4)
    val manifest = base.groupBy(col("shard")).agg(count(lit(1)).as("n_existing"))
    val appended = Sampling.shardAppend(fresh, manifest, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(appended.map(_._1).sorted === (40L until 60L).toArray)
    val oldCounts = base.collect().map(r => r.getInt(1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    appended.groupBy(_._2).foreach { case (shard, rows) =>
      val start = oldCounts.getOrElse(shard, 0L)
      assert(rows.map(_._3).sorted === (start until start + rows.length).toArray,
        s"shard $shard must continue densely from $start")
    }
  }

  test("mixturePlan: sqrt-temperature shares and epochs on a hand-computed fixture") {
    import spark.implicits._
    val fixture = Seq(
      (0L, "a b c d e f g h i", "s1"), // 9 tokens -> weight 3
      (1L, "a b c d", "s2")            // 4 tokens -> weight 2
    ).toDF("doc_id", "text", "source")
    // weight_sum 5; s1 share 600000 ppm, s2 400000; budget 1000 ->
    // alloc 600/400; epochs: 1e6*600/9 = 66666666, 1e6*400/4 = 100000000
    val got = Sampling.mixturePlan(fixture, totalBudget = 1000L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(got === Seq(
      ("s1", 1L, 9L, 3L, 600000L, 600L, 66666666L),
      ("s2", 1L, 4L, 2L, 400000L, 400L, 100000000L)))
  }

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(docs, 0.25).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(docs.repartition(7, col("lang")), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.sameElements(b))
    // expected fraction, loose tolerance (hash gate is expected-not-exact)
    val frac = a.length.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.35, s"fraction $frac far from 0.25")
  }

  test("hashSample(1.0) keeps everything, hashSample(0.0) keeps nothing") {
    assert(Sampling.hashSample(docs, 1.0).count() === docs.count())
    assert(Sampling.hashSample(docs, 0.0).count() === 0L)
  }

  test("weightedMix equals the per-source union of hashSamples; default drops the rest") {
    val weights = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1)
    val got = Sampling.weightedMix(docs, weights).select("doc_id")
    val expected = weights.map { case (s, f) =>
      Sampling.hashSample(docs.filter(col("source") === s), f).select("doc_id")
    }.reduce(_ unionByName _)
    assert(got.count() > 0)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // all of src0 kept (fraction 1.0); unlisted sources fully dropped
    assert(Sampling.weightedMix(docs, weights).filter(col("source") === "src0").count()
      === docs.filter(col("source") === "src0").count())
    assert(Sampling.weightedMix(docs, weights).filter(col("source") === "src9").count() === 0L)
  }

  test("splitAssign: total partition, sane fractions, growth-stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.splitAssign(docs, splits)
    val counts = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.count()
    // every row gets exactly one split; no fourth value appears
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum === total)
    assert(counts("train").toDouble / total > 0.6, s"train far from 0.8: $counts")
    // growth stability: assignments on a subset equal the full assignment
    // restricted to that subset (adding docs never moves existing ones)
    val sub = Sampling.splitAssign(docs.filter(col("doc_id") < 20), splits)
      .select("doc_id", "split")
    val full = assigned.filter(col("doc_id") < 20).select("doc_id", "split")
    assert(sub.exceptAll(full).isEmpty && full.exceptAll(sub).isEmpty)
    // degenerate one-split spec assigns everything to it
    assert(Sampling.splitAssign(docs, Seq("all" -> 1.0))
      .filter(col("split") === "all").count() === total)
  }

  test("stratifiedQuota returns exactly min(quota, stratum size) per stratum") {
    val quota = 5
    val got = Sampling.stratifiedQuota(docs, Seq("lang"), quota)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === sizes.keySet)
    got.foreach { case (lang, n) => assert(n === math.min(quota.toLong, sizes(lang))) }
    // deterministic across runs
    val again = Sampling.stratifiedQuota(docs, Seq("lang"), quota)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val first = Sampling.stratifiedQuota(docs, Seq("lang"), quota)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(again.sameElements(first))
  }

  test("percentileFloor: each group cut at its own discrete percentile") {
    import spark.implicits._
    // A = {1,2,3,4}: disc p50 = 2 → keep 2,3,4 ; B = {10,20}: disc p50 = 10 → keep both
    val rows = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 4L),
      (5L, "B", 10L), (6L, "B", 20L)).toDF("doc_id", "source", "n_chars")
    val kept = Sampling.percentileFloor(rows, p = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(2L, 3L, 4L, 5L, 6L))
  }

  test("balancedSample: every label keeps exactly min-class-count rows") {
    import spark.implicits._
    val rows = (1L to 7L).map(i => (i, if (i <= 4) 0 else 1)).toDF("vec_id", "label")
    val got = Sampling.balancedSample(rows)
    val perLabel = got.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perLabel === Map(0 -> 3L, 1 -> 3L)) // min class count = 3
    // deterministic and partitioning-independent
    val a = got.select("vec_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.balancedSample(rows.repartition(5))
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("groupKFold: every group lands wholly in one fold, all folds used") {
    val e = Tables.events(spark, Sf0001)
    val folded = Sampling.groupKFold(e, "user_id", k = 5)
    // group coherence: one fold per user
    val perUser = folded.groupBy("user_id")
      .agg(countDistinct(col("fold")).as("nf"))
      .agg(max("nf")).head().getLong(0)
    assert(perUser === 1L, "a user's rows were split across folds")
    // all k folds populated and valid
    val folds = folded.select("fold").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(folds.toSeq === Seq(0, 1, 2, 3, 4))
  }

  test("prioritySample equals the naive full-sort selection; ids unique; weights bias inclusion") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
    val k = 30
    val got = Sampling.prioritySample(docs, k, weight = col("n_chars"))
      .select("doc_id", "priority").collect().map(r => (r.getLong(0), r.getLong(1)))
    // naive: compute every priority, sort fully, take k
    val naive = docs
      .withColumn("__h", Dedup.baseHash(col("doc_id").cast("string")))
      .withColumn("p", expr("__h div greatest(n_chars, 1)"))
      .select("doc_id", "p").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, p) => (p, id) }.take(k)
    assert(got.sortBy { case (id, p) => (p, id) }.toSeq === naive.toSeq)
    assert(got.map(_._1).distinct.length === k, "sample must not repeat ids")
    // weighting bias: under a constant weight the same hash draws a DIFFERENT
    // (uniform) sample; the weighted draw must prefer longer docs on average
    val uni = Sampling.prioritySample(docs, k, weight = lit(1L))
      .select("doc_id").as[Long].collect().toSet
    val meanChars = (ids: Set[Long]) => docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .agg(avg("n_chars")).head().getDouble(0)
    assert(meanChars(got.map(_._1).toSet) > meanChars(uni),
      "n_chars-weighted sample should average longer docs than the uniform draw")
  }
}
