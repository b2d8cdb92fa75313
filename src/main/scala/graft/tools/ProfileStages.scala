package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}
import graft.queries.Tables

/** Scratch stage-level profiler for the dedup pipelines (dev only). */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.fanOut(Tables.documents(spark, sfDir))
    val k = 5
    val params = Dedup.hashParams(16)
    val Mersenne31 = Dedup.Mersenne31

    val shingled = docs
      .select(col("doc_id"), TextAnalysis.normalize(col("text")).as("t"))
      .filter(length(col("t")) >= k)
      .select(col("doc_id"), Dedup.shinglesOfNorm(col("t"), k).as("sh"))

    time("shingled.count")(shingled.count())
    time("shingled sizes")(shingled.select(sum(size(col("sh")))).collect().foreach(println))

    val hs = shingled
      .select(col("doc_id"), transform(col("sh"), s => Dedup.baseHash(s) % Mersenne31).as("hs"))
    time("hs.count")(hs.select(sum(size(col("hs")))).collect())

    val withSig = hs.select(
      col("doc_id"),
      array(params.map(p =>
        array_min(transform(col("hs"), h => (lit(p.a) * h + lit(p.b)) % Mersenne31))): _*).as("sig"))
    time("withSig")(withSig.select(sum(element_at(col("sig"), 1))).collect())

    val bandBuckets = array((0 until 4).map { b =>
      md5(concat_ws(",", (0 until 4).map(r => col("sig")(b * 4 + r)): _*))
    }: _*)
    val bandRows = withSig.select(col("doc_id"), posexplode(bandBuckets).as(Seq("band", "bucket")))
    time("bandRows.count")(bandRows.count())

    val ids = array_sort(collect_list(col("doc_id")))
    val pairList = transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))), b =>
        struct(a.as("doc_a"), b.as("doc_b"))))
    val candidates = bandRows
      .groupBy("band", "bucket")
      .agg(ids.as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(pairList)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    time("candidates.count")(candidates.count())

    val sides = candidates
      .select(col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
    val paired = broadcast(sides)
      .join(shingled, Seq("doc_id"))
      .groupBy("doc_a", "doc_b")
      .agg(
        first(when(col("doc_id") === col("doc_a"), col("sh")), ignoreNulls = true).as("sh_a"),
        first(when(col("doc_id") === col("doc_b"), col("sh")), ignoreNulls = true).as("sh_b"))
    time("paired.count")(paired.count())

    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    val out = paired
      .withColumn("jaccard", round(inter / union, 4))
      .filter(col("jaccard") >= 0.5)
    time("final.count")(out.count())

    time("full q21 again")(Dedup.minhashNearDups(docs, threshold = 0.5).count())
    spark.stop()
  }
}
