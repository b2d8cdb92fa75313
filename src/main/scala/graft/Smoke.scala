package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke gate: runs `SparkEntry.entry`
  * on a fresh session (as the driver would) and prints the row count.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
