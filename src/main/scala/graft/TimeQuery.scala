package graft
import org.apache.spark.sql.SparkSession

/** Per-TRIAL isolation timer for a handful of queries — the tool behind
  * "re-bench the flagged query on an idle box" adjudications. Unlike
  * [[Bench]] (which reports one median per query and is the driver
  * artifact), this prints EVERY trial separately so cold-vs-warm in one
  * JVM is visible: trial 1 carries codegen/JIT/first-parquet-footer
  * costs, trials 2+ are the steady state a long bench JVM actually sees.
  *
  * Usage: runMain graft.TimeQuery <name[,name...]> [sfDir] [trials]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <query[,query...]> [sfDir] [trials]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val trials = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to trials).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"query":"$name","trial":$i,"sec":$sec%.3f}""")
      }
    }
    spark.stop()
  }
}
