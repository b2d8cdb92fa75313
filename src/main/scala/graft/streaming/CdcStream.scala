package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.engine.{CdcFilter, VersionedCatalog}
import graft.engine.JobSpec.DataType

/** Structured-Streaming surface over the engine's CDC layout.
  *
  * The reference consumes CDF strictly in bounded batch windows
  * (SURVEY §2.10: no streaming anywhere), because each Databricks run is a
  * scheduled export. The same layout, however, is naturally streamable: new
  * `_commit_version=N` directories appear append-only under `cdf/`, which is
  * exactly the contract of Spark's file stream source. This module is the
  * continuous analogue of the batch pipeline:
  *
  *   - [[readChanges]]: `readStream` over the CDF directory; new commits are
  *     discovered incrementally (`maxFilesPerTrigger` bounds per-batch work);
  *     the SAME [[CdcFilter]] semantics as the batch path, so EVENT vs
  *     property filtering cannot drift between modes;
  *   - [[windowedCounts]]: watermarked tumbling-window aggregation — the
  *     canonical streaming rollup with bounded state (late rows beyond the
  *     watermark are dropped, closed windows are finalized and emitted);
  *   - [[sessionize]]: gap-based sessionization as explicit keyed state via
  *     `flatMapGroupsWithState` — the streaming counterpart of the q12 batch
  *     query (same 30-minute-gap semantics over epoch-micros).
  *
  * Scale notes: the file source tracks seen files in the checkpoint log (no
  * relisting of old commits); state for sessionization is per-user O(1)
  * (last timestamp + counter); windowed aggregation state is bounded by the
  * watermark horizon. All transforms are the same Catalyst expressions the
  * batch path uses — micro-batch execution reuses the whole batch plan.
  */
object CdcStream {

  /** Streaming CDF scan: the continuous analogue of S2 + P1/P2. The schema
    * is probed from the existing commits (a file stream needs one up front).
    */
  def readChanges(
      spark: SparkSession,
      catalog: VersionedCatalog,
      table: String,
      dataType: DataType,
      mutabilityMode: Boolean = false,
      maxFilesPerTrigger: Int = 1000): DataFrame = {
    val root = catalog.cdfRoot(table)
    // probe via the catalog so a commit-less table raises the typed
    // missing-CDF signature the recovery protocol classifies on, not a raw
    // schema-inference AnalysisException
    val schema = catalog.changes(spark, table, start = 1L, end = 0L).schema
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(root)
    // single source of truth for P1/P5 semantics — the same call the batch
    // path makes, so the two modes cannot drift
    CdcFilter.filterData(raw, dataType, mutabilityMode)
  }

  /** Watermarked tumbling-window counts by `typeCol`. `tsCol` must be a
    * timestamp column; rows later than `watermarkDelay` behind the max seen
    * event time are dropped, and in Append mode a window is emitted exactly
    * once, when the watermark passes its end.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(
        col(s"window.start").as("window_start"),
        col(s"window.end").as("window_end"),
        col(typeCol),
        col("n"))

  /** Streaming exact dedup: first-seen wins on the normalized-text
    * fingerprint (same [[graft.ext.TextAnalysis.md5Fingerprint]] key as the
    * batch tier, so batch and streaming dedup cannot drift). State is
    * bounded by the watermark horizon via `dropDuplicatesWithinWatermark`:
    * a duplicate arriving within `watermarkDelay` of the original's event
    * time is dropped, and fingerprint state older than the watermark is
    * evicted — the standard unbounded-stream dedup contract.
    */
  def dedupStream(
      docs: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      textCol: String = "text"): DataFrame = {
    require(!docs.columns.contains("__fp"), "input already has the working column __fp")
    docs
      .withColumn("__fp", graft.ext.TextAnalysis.md5Fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp") // output schema matches the input (and the batch tier)
  }

  /** Continuous export: the streaming counterpart of the batch unload sink
    * (K1) — newline-delimited JSON via Spark's native file sink, which gives
    * exactly-once file output through the checkpoint's file-commit log (the
    * batch path's idempotence contract, `mode("overwrite")` + full-job
    * retry, is replaced by the sink's transactional manifest). The returned
    * query streams until stopped.
    */
  def exportStream(
      df: DataFrame,
      outputPath: String,
      checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("json")
      .option("path", outputPath)
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Append)
      .start()

  final case class Ev(user_id: Long, ts_us: Long)
  /** [[Ev]] plus the derived watermark column (public: codegen'd encoder
    * projections cannot access private classes).
    */
  final case class EvT(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  final case class SessionState(sessionId: Long, lastTsUs: Long, startTsUs: Long)
  final case class SessionAssignment(
      user_id: Long, ts_us: Long, session_id: Long, session_start_us: Long)

  /** Streaming gap-based sessionization: per-user keyed state carries
    * (current session id, last event time); an event further than `gapUs`
    * from the last one opens a new session. Same semantics as the batch q12
    * (epoch-micros, 30-minute default gap) for a per-user IN-ORDER stream:
    * events inside one micro-batch are sorted by time before state
    * application; rows older than the watermark (derived from `ts_us` with
    * `watermarkDelay` slack) are dropped before they reach state — the
    * standard late-data contract for keyed-state sessionizers (the batch
    * q12 is the backfill path for older data).
    *
    * State is bounded two ways: per-user O(1) payload, and an EVENT-time
    * timeout that evicts a user's state once the watermark passes
    * `lastTs + gap` — the exact moment the session can no longer be
    * extended, so eviction never splits or merges a session: any later
    * surviving event would have opened a new session anyway. Event-time
    * timeouts fire only when the watermark ADVANCES, so the engine
    * quiesces between data arrivals and `processAllAvailable()` terminates
    * — a processing-time timeout here would make `shouldRunAnotherBatch`
    * true forever and busy-loop empty micro-batches.
    *
    * Session identity: `session_id` is a per-user counter that restarts at
    * 1 when state is evicted, and WHETHER eviction fired between two
    * far-apart events depends on micro-batch boundaries (timeouts only
    * fire for groups without data in that batch) — so the counter is
    * stable only within one state lifetime. `session_start_us` is the
    * batch-timing-INVARIANT identity: an event more than `gapUs` after its
    * predecessor starts a session stamped with its own ts whether or not
    * the old state was evicted first, so downstream joins should key on
    * (user_id, session_start_us).
    */
  def sessionize(
      events: Dataset[Ev],
      gapUs: Long = 1800L * 1000 * 1000,
      watermarkDelay: String = "1 hour"): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    val gapMs = gapUs / 1000L
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[EvT], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(_.ts_us)
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, Long.MinValue))
            val out = sorted.map { e =>
              val fresh = st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs
              st = SessionState(
                if (fresh) st.sessionId + 1 else st.sessionId,
                e.ts_us,
                if (fresh) e.ts_us else st.startTsUs)
              SessionAssignment(userId, e.ts_us, st.sessionId, st.startTsUs)
            }
            state.update(st)
            // evict when the session can no longer be extended; Spark rejects
            // timeout timestamps at or before the current watermark, so clamp
            val target = st.lastTsUs / 1000L + gapMs
            state.setTimeoutTimestamp(math.max(target, state.getCurrentWatermarkMs + 1L))
            out.iterator
          }
      }
  }
}
