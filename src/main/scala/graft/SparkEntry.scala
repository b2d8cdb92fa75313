package graft


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.JobSpec._
import graft.engine.{Unload, VersionedCatalog}
import graft.queries.ParityQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full unload pipeline (EP1) end-to-end on sf0.001 —
    * versioned catalog (snapshot + CDF window) → CDC filter → identifier-aware
    * SQL rewrite → transform → repartition sizing → JSON sink → audit
    * sidecars — then the exported rows are read back. Driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val work = graft.queries.Scratch.dir("entry")
    val catalog = VersionedCatalog(s"$work/catalog")
    val table = "main.graft.events"

    val events = graft.queries.Tables.events(spark, sfDir)
    // Author a tiny versioned history: v1 snapshot + CDF commits 1..2.
    catalog.commitSnapshot(events.filter(col("event_id") % 3 === 0), table, 1L)
    Seq(1L, 2L).foreach { v =>
      val changes = events
        .filter(col("event_id") % 3 === lit(v))
        .withColumn("_change_type",
          when(col("event_id") % 4 === 0, "update_postimage")
            .when(col("event_id") % 4 === 1, "update_preimage")
            .otherwise("insert"))
        .withColumn("_commit_timestamp", col("ts"))
      catalog.commitChanges(changes, table, v)
    }

    // Canary-envelope customer SQL (shape of unload_databricks_data_to_s3.py:411,
    // deterministic timestamp so reruns are stable).
    val sql =
      s"""SELECT 1704067200000 AS time, user_id, event_type,
         |       named_struct('value', value, 'props', props) AS user_properties
         |FROM $table""".stripMargin

    val config = JobConfig(
      tables = Seq(TableVersionRange(table, 1L, 2L)),
      dataType = Event,
      sql = sql,
      outputPath = s"$work/out",
      format = JsonFormat,
      strategy = Repartition,
      maxRecordsPerFile = 250L
    )
    Unload.run(spark, catalog, config)
    spark.read.json(s"$work/out")
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-data-pipeline extensions (dedup / similarity / text / multimodal)
    * and event analytics.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ graft.queries.EventQueries.queries ++ graft.ext.ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ graft.queries.EventQueries.oracleSql ++ graft.ext.ExtQueries.oracleSql
}
