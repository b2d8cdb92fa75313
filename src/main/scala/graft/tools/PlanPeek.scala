package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side scratch main: print the physical plans of named queries for
  * plan auditing (`runMain graft.tools.PlanPeek q154_triangles ...`).
  * Not part of the driver contract.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val exec = sys.env.get("PLAN_PEEK_EXEC").contains("1")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      if (exec) df.collect() // finalize the AQE plan (ReusedExchange etc.)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
