package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Compaction planning: the cut rule against its single-window definition,
  * bin-size invariants, and the no-global-corpus-window scale shape.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def manifest = Tables.documents(spark, Sf0001)
    .select(col("doc_id").as("file_id"), col("n_chars").as("bytes"))

  test("planBins equals the single-window cumulative cut definition") {
    val target = 5000L
    // deliberately tiny groupSize so the two-level path exercises many groups
    val got = Compaction.planBins(manifest, target, groupSize = 7L)
      .select("file_id", "bin_id")
    val w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, -1)
    val naiveDf = manifest
      .withColumn("__cum", sum(col("bytes")).over(w))
      .withColumn("bin_id", expr(s"coalesce(__cum, 0L) div $target"))
      .select("file_id", "bin_id")
    assert(got.exceptAll(naiveDf).isEmpty && naiveDf.exceptAll(got).isEmpty)
  }

  test("bins are contiguous in id order and near target size") {
    val target = 5000L
    val bins = Compaction.planBins(manifest, target)
    // contiguity: file order sorted by id visits bins in non-decreasing order
    val seq = bins.orderBy("file_id").select("bin_id").as[Long].collect()
    assert(seq.zip(seq.tail).forall { case (a, b) => a <= b }, "bins not contiguous")
    // every bin except possibly the last reaches the target before cutting:
    // bin_bytes + next file would exceed... the cut rule guarantees
    // bin_bytes >= target - (last file's bytes) for all but the final bin;
    // assert the weaker invariant that holds exactly: a bin's START is
    // aligned to the cumulative cut, so total bytes of bins 0..k-1 >= k*target
    val summary = Compaction.planSummary(manifest, target)
      .orderBy("bin_id").collect()
    val cum = summary.scanLeft(0L)((acc, r) => acc + r.getLong(2)).tail
    summary.zipWithIndex.dropRight(1).foreach { case (_, i) =>
      assert(cum(i) >= (i + 1) * target,
        s"bin $i closed before reaching the cumulative cut: ${cum(i)}")
    }
  }

  test("a file larger than the target dominates its own bin region") {
    val files = Seq((1L, 100L), (2L, 25000L), (3L, 100L), (4L, 100L))
      .toDF("file_id", "bytes")
    val got = Compaction.planBins(files, targetBytes = 10000L)
      .orderBy("file_id").select("bin_id").as[Long].collect()
    // file 2 starts in bin 0 (cum_before=100); files 3/4 start after its
    // 25000 bytes pushed the cursor past bins 1 and 2
    assert(got === Array(0L, 0L, 2L, 2L))
  }

  test("no manifest-wide sort: the only global-order window runs on the group axis") {
    val plan = Compaction.planSummary(manifest, 5000L)
      .queryExecution.executedPlan.toString
    // the within-group window sorts partition-locally (`, false`); only the
    // per-GROUP totals (manifest/groupSize rows) pass a global sort — a
    // `Sort [file_id ...], true` would mean the whole manifest serialized
    // through one ordering task (the q102/packing contract)
    assert(!"Sort \\[file_id[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"manifest-wide sort leaked in:\n$plan")
  }
}
