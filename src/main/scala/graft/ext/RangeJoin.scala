package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — point ∈ [lo, hi] as an EQUI-join.
  *
  * Spark plans a raw `p BETWEEN lo AND hi` predicate as a broadcast
  * nested-loop join: O(|points|·|intervals|) comparisons, a wall at scale.
  * The standard fix (same trick as the id-window dedup joins in [[Dedup]] /
  * [[Similarity]]): quantize the number line into fixed-width buckets,
  * explode each interval to the buckets it overlaps, bucket each point once,
  * equi-join on the bucket id, then apply the exact BETWEEN as a post-join
  * filter. Candidates per point are the intervals overlapping its bucket —
  * O(rows × bucket occupancy), shuffle-partitioned on the bucket id.
  *
  * A qualifying (point, interval) pair shares exactly one point-bucket, so
  * no dedup pass is needed. `bucketWidth` tunes the candidate factor: about
  * the typical interval width is right — much wider inflates candidates per
  * bucket, much narrower inflates the interval explosion.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose `[loCol, hiCol]`
    * contains `pointCol`. Column sets must be disjoint apart from the
    * payload you select afterwards.
    *
    * An interval spanning more than `maxBucketsPerInterval` buckets raises
    * a descriptive error instead of letting Spark's `sequence()` element
    * cap kill the job opaquely (one open-ended outlier interval would
    * otherwise try to materialize billions of bucket ids); widen
    * `bucketWidth` or raise the cap for legitimately huge intervals.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    val loB = floor(col(loCol) / bucketWidth).cast("long")
    val hiB = floor(col(hiCol) / bucketWidth).cast("long")
    // ordering matters: an INVERTED interval (lo > hi) must not reach the
    // width guard — hiB - loB is negative there, which passes `< cap`, and
    // sequence() DESCENDS for start > stop, materializing ~|loB - hiB|
    // spurious bucket ids. BETWEEN matches nothing for lo > hi, so the
    // faithful translation is an empty bucket set (explode drops the row).
    val iv = intervals
      .withColumn("__bucket",
        explode(
          when(hiB < loB, array().cast("array<long>"))
            .when(hiB - loB < lit(maxBucketsPerInterval), sequence(loB, hiB))
            .otherwise(raise_error(concat(
              lit(s"pointInInterval: interval spans more than $maxBucketsPerInterval " +
                s"buckets of width $bucketWidth: ["),
              col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"), lit("]"))))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bucket")
  }
}
