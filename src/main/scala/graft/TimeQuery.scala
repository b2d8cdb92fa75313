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
    require(names.nonEmpty, "no query names given")
    // All argument validation happens BEFORE the SparkSession is built: a
    // typo'd query name or a zero trial count should fail in milliseconds,
    // not after a multi-second JVM+session spin-up.
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    // explicit arg wins, then the Bench env var, then the box default
    val sfDir = args.lift(1)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    require(new java.io.File(sfDir).isDirectory, s"sfDir not a directory: $sfDir")
    val trials = args.lift(2).map { s =>
      val t = try s.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"trials must be an integer, got '$s'")
      }
      require(t >= 1, s"trials must be >= 1, got $t"); t
    }.getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
