package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: times one or more `SparkEntry.queries` by name
  * (args) against `SPARK_GRAFT_SF_DIR`, printing per-query wall seconds and,
  * with `SPARK_GRAFT_EXPLAIN=1`, the formatted physical plan. Dev tool only —
  * not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides for A/B experiments: "k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("SPARK_GRAFT_STAGES").contains("1")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val secs = (for {s <- i.submissionTime; c <- i.completionTime} yield (c - s) / 1e3)
            .getOrElse(-1.0)
          println(f"  stage ${i.stageId}%3d ${i.numTasks}%4d tasks ${secs}%7.2f s  ${i.name.takeWhile(_ != '\n').take(90)}")
        }
      })
    }
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) { println(s"==== $name plan ===="); fn(spark, sfDir).explain("formatted") }
      // time construction + count, matching Bench: some operators do eager
      // work while building (fixpoint iterations, IVF training)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
