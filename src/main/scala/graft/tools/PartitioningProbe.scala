package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (not part of the driver contract): does a
  * `repartition(key).localCheckpoint()` relation keep its HashPartitioning
  * through to a downstream join/aggregation, letting EnsureRequirements
  * skip the big side's Exchange on every iterative round (guide §2.4
  * "remove shuffles outright")? Prints the join plans with and without the
  * pre-partitioned checkpoint so the Exchange count is directly readable.
  */
object PartitioningProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = (1 to 10000).map(i => (i % 997, i % 31)).toDF("v", "w")
    val score = (0 until 997).map(i => (i, i.toLong)).toDF("v", "s")

    println("=== A: plain localCheckpoint edges, join on v ===")
    val plainE = e.localCheckpoint()
    plainE.join(score, "v").groupBy("w").agg(sum("s")).explain("formatted")

    println("=== B: repartition('v').localCheckpoint edges, join on v ===")
    val partE = e.repartition(col("v")).localCheckpoint()
    println("B outputPartitioning: " +
      partE.queryExecution.executedPlan.outputPartitioning)
    partE.join(score, "v").groupBy("w").agg(sum("s")).explain("formatted")

    println("=== C: repartition(4, 'v').localCheckpoint edges, join on v ===")
    val partE4 = e.repartition(4, col("v")).localCheckpoint()
    println("C outputPartitioning: " +
      partE4.queryExecution.executedPlan.outputPartitioning)
    partE4.join(score, "v").groupBy("w").agg(sum("s")).explain("formatted")

    spark.stop()
  }
}
