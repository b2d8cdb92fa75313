package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.JobSpec.TableVersionRange

/** Versioned-table catalog: snapshot time travel + change-data-feed reads
  * over plain Parquet — operators S1/S2 in SURVEY.md §2.1.
  *
  * The reference reads Delta tables via `VERSION AS OF` and
  * `table_changes(tbl, start, end)` (`unload_databricks_data_to_s3.py:183-200`).
  * No Delta jars ship in this environment, so the same contract is
  * re-expressed over a versioned Parquet layout:
  *
  * {{{
  *   <root>/<table>/snap/v=<version>/part-*.parquet        // full snapshots
  *   <root>/<table>/cdf/_commit_version=<v>/part-*.parquet // per-commit change rows
  * }}}
  *
  * Change files carry `_change_type` (insert | update_preimage |
  * update_postimage | delete) and `_commit_timestamp` as data columns;
  * `_commit_version` is the Hive-style partition column, so a version-range
  * read is **directory-pruned at file-listing time** — on a 1000-executor
  * cluster a `[start, end]` window never lists (let alone reads) commits
  * outside the window. This mirrors Delta's CDF file skipping with zero
  * custom readers. With Delta OSS on the cluster this object collapses to
  * `spark.read.format("delta").option("versionAsOf"|"readChangeFeed", ...)`.
  */
final case class VersionedCatalog(root: String) {

  import VersionedCatalog._

  def tablePath(table: String): String = s"$root/${table.replace('.', '/')}"
  def snapshotPath(table: String, version: Long): String = s"${tablePath(table)}/snap/v=$version"
  def cdfRoot(table: String): String = s"${tablePath(table)}/cdf"

  // ---- write side (used by tests / pipeline demos to author versions) ----

  /** Persist a full snapshot of `df` as table version `version`. */
  def commitSnapshot(df: DataFrame, table: String, version: Long): Unit =
    df.write.mode("overwrite").parquet(snapshotPath(table, version))

  /** Persist one commit's change rows. `df` must carry `_change_type` and
    * `_commit_timestamp`; `_commit_version` is materialized by the layout.
    *
    * Also upserts the table's [[manifestPath commit manifest]]: the commit
    * time is read back from the just-written directory (ONE commit's
    * footers, partition-local — never the table history), mirroring how
    * Delta appends a log entry per commit.
    */
  def commitChanges(df: DataFrame, table: String, version: Long): Unit = {
    require(df.columns.contains(CdcFilter.ChangeTypeCol), "change frame needs _change_type")
    val dir = s"${cdfRoot(table)}/_commit_version=$version"
    df.write.mode("overwrite").parquet(dir)
    val spark = df.sparkSession
    val maxTs = spark.read.parquet(dir)
      .agg(max(unix_micros(col("_commit_timestamp").cast("timestamp"))))
      .head()
    // a commit whose timestamps are all null/uncastable gets NO manifest
    // entry — the scan path excludes such commits from as-of resolution via
    // SQL null comparison, and the manifest must agree with it
    val tsUs = if (maxTs.isNullAt(0)) None else Some(maxTs.getLong(0))
    upsertManifest(spark, table, version, tsUs)
  }

  /** Tiny per-table commit manifest (JSONL: one `{"version":v,
    * "committed_at_us":t}` line per commit, rewritten on each commit —
    * tens of bytes per entry). [[versionAsOf]] resolves from this single
    * small file; without it, resolution must LIST the whole `cdf/` tree
    * and read a footer per commit — O(history) driver-side metadata work
    * on a 10k-commit table.
    */
  private def manifestPath(table: String): String = s"${tablePath(table)}/_commits.json"

  private def upsertManifest(
      spark: SparkSession, table: String, version: Long, tsUs: Option[Long]): Unit = {
    // first manifest write on a PRE-manifest catalog: backfill the older
    // commits from the cdf tree (one-time migration scan of the two
    // metadata columns) — a partial manifest would otherwise shadow the
    // tree and as-of resolution would lose the history
    val existing = readManifest(spark, table).getOrElse(backfillFromTree(spark, table, version))
    val entries = existing.filterNot(_._1 == version) ++ tsUs.map(version -> _)
    val body = entries.sortBy(_._1)
      .map { case (v, t) => s"""{"version":$v,"committed_at_us":$t}""" }
      .mkString("\n")
    val p = new Path(manifestPath(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // write-to-temp + rename: a crash mid-write must not leave a truncated
    // manifest in place (readManifest additionally treats an entry-less
    // file as absent, so even a torn rename degrades to backfill/scan,
    // never to a partial manifest shadowing the tree)
    val tmp = new Path(manifestPath(table) + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not move $tmp into place at $p")
  }

  /** Per-version max commit micros of every ALREADY-written commit except
    * `excludeVersion` (the one being committed right now — its entry is
    * supplied by the caller). Null-timestamp versions are dropped, matching
    * the scan path's null comparison.
    */
  private def backfillFromTree(
      spark: SparkSession, table: String, excludeVersion: Long): Seq[(Long, Long)] = {
    val rootPath = cdfRoot(table)
    val others = if (exists(spark, rootPath))
      listCommitVersions(spark, rootPath) - excludeVersion else Set.empty[Long]
    if (others.isEmpty) Seq.empty
    else spark.read.parquet(rootPath)
      .filter(col("_commit_version").cast("long") =!= excludeVersion)
      .groupBy(col("_commit_version").cast("long").as("v"))
      .agg(max(unix_micros(col("_commit_timestamp").cast("timestamp"))).as("t"))
      .filter(col("t").isNotNull)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
  }

  private def readManifest(spark: SparkSession, table: String): Option[Seq[(Long, Long)]] = {
    val p = new Path(manifestPath(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      val entries = body.linesIterator.flatMap {
        case ManifestLine(v, t) => Some(v.toLong -> t.toLong)
        case _ => None
      }.toSeq
        // drop legacy Long.MinValue sentinels (written by an earlier
        // manifest format for all-null-timestamp commits): the scan path
        // excludes such commits from as-of resolution, and a sentinel
        // entry would match ANY timestamp
        .filterNot(_._2 == Long.MinValue)
      // an exists-but-entry-less file (torn write, all-sentinel legacy) is
      // NOT a manifest: callers must fall back to backfill/scan rather
      // than let it shadow the commit tree
      if (entries.isEmpty) None else Some(entries)
    }
  }

  // ---- read side ----

  /** S1: full table at a pinned version (`VERSION AS OF` analogue). */
  def snapshot(spark: SparkSession, table: String, version: Long): DataFrame = {
    val p = snapshotPath(table, version)
    if (!exists(spark, p))
      throw new MissingCdfFilesException(
        s"$MissingCdfFileSignature: no snapshot for $table at version $version ($p)")
    spark.read.parquet(p)
  }

  /** S2: change rows for versions [start, end] (`table_changes` analogue).
    * Partition pruning on `_commit_version` keeps the scan proportional to
    * the window, not the table history.
    */
  def changes(spark: SparkSession, table: String, start: Long, end: Long): DataFrame = {
    val rootPath = cdfRoot(table)
    if (!exists(spark, rootPath))
      throw new MissingCdfFilesException(
        s"$MissingCdfFileSignature: no change data for $table ($rootPath)")
    val available = listCommitVersions(spark, rootPath)
    val missing = (start to end).filterNot(available.contains)
    if (missing.nonEmpty)
      throw new MissingCdfFilesException(
        s"$MissingCdfFileSignature: $table missing change files for versions ${missing.mkString(",")}")
    spark.read
      .parquet(rootPath)
      .where(col("_commit_version").between(start, end))
  }

  /** Latest committed version (max over snapshots and change commits). */
  def latestVersion(spark: SparkSession, table: String): Long = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snaps = {
      val p = new Path(tablePath(table), "snap")
      if (fs.exists(p)) fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
        case VersionDir(v) => v.toLong
      } else Seq.empty
    }
    val commits = {
      val p = new Path(cdfRoot(table))
      if (fs.exists(p)) fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
        case CommitDir(v) => v.toLong
      } else Seq.empty
    }
    (snaps ++ commits).foldLeft(0L)(math.max)
  }

  /** The reference's `fetch_data` dispatch (`unload_databricks_data_to_s3.py:196-200`):
    * `start == 0` ⇒ snapshot at `end`; else CDF window `[start, end]`.
    */
  def fetchData(spark: SparkSession, range: TableVersionRange): DataFrame =
    if (range.isSnapshot) snapshot(spark, range.table, range.end)
    else changes(spark, range.table, range.start, range.end)

  /** `TIMESTAMP AS OF` analogue (Delta's second time-travel axis; the
    * reference only pins by version): resolve `ts` to the greatest commit
    * version whose commit timestamp is <= `ts` ([[versionAsOf]]), then read
    * the greatest MATERIALIZED snapshot at or before that version —
    * checkpoint-granularity time travel. Callers needing the exact state
    * between checkpoints layer a CDF window `[snapVersion+1, resolved]` on
    * top, which is precisely the unload pipeline's range contract.
    * Throws the catalog's missing-file signature when `ts` predates every
    * commit/snapshot, so the recovery protocol treats it like any other
    * missing read.
    */
  def snapshotAsOf(spark: SparkSession, table: String, ts: java.sql.Timestamp): DataFrame = {
    val resolved = versionAsOf(spark, table, ts)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapRoot = new Path(tablePath(table), "snap")
    val snaps =
      if (fs.exists(snapRoot))
        fs.listStatus(snapRoot).toSeq.map(_.getPath.getName)
          .collect { case VersionDir(v) => v.toLong }
      else Seq.empty
    snaps.filter(_ <= resolved).sorted.lastOption match {
      case Some(v) => snapshot(spark, table, v)
      case None =>
        throw new MissingCdfFilesException(
          s"$MissingCdfFileSignature: $table has no snapshot at or before version $resolved")
    }
  }

  /** Greatest commit version with max(_commit_timestamp) <= ts. Resolves
    * from the per-table commit MANIFEST when present — one small file read,
    * O(1) in the table's data and O(#commits) only in manifest bytes — and
    * falls back to scanning the CDF layer's two metadata columns for
    * catalogs authored before the manifest existed (still never the table
    * data, but it lists the whole `cdf/` tree).
    */
  def versionAsOf(spark: SparkSession, table: String, ts: java.sql.Timestamp): Long = {
    val rootPath = cdfRoot(table)
    if (!exists(spark, rootPath))
      throw new MissingCdfFilesException(
        s"$MissingCdfFileSignature: no commit history for $table ($rootPath)")
    val tsUs = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    val resolved = readManifest(spark, table) match {
      case Some(entries) if entries.nonEmpty =>
        entries.filter(_._2 <= tsUs).map(_._1).maxOption
      case _ =>
        // the Hive-style partition column discovers as INT for small
        // versions — normalize to long before the max
        val commits = spark.read.parquet(rootPath)
          .groupBy(col("_commit_version").cast("long").as("v"))
          .agg(max(unix_micros(col("_commit_timestamp").cast("timestamp"))).as("committed_us"))
          .filter(col("committed_us") <= tsUs)
          .agg(max(col("v")))
          .head()
        if (commits.isNullAt(0)) None else Some(commits.getLong(0))
    }
    resolved.getOrElse(throw new MissingCdfFilesException(
      s"$MissingCdfFileSignature: $table has no commit at or before $ts"))
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def listCommitVersions(spark: SparkSession, rootPath: String): Set[Long] = {
    val p = new Path(rootPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath.getName).collect { case CommitDir(v) => v.toLong }.toSet
  }
}

object VersionedCatalog {
  /** Same signature strings the reference's error classifier matches on
    * (`unload_databricks_data_to_s3.py:24-25`), so the recovery protocol is
    * exercised end-to-end against this emulation.
    */
  val MissingCdfFileSignature = "DELTA_CHANGE_DATA_FILE_NOT_FOUND"
  val SparkFileNotExistSignature = "FAILED_READ_FILE.DBR_FILE_NOT_EXIST"

  final class MissingCdfFilesException(msg: String) extends RuntimeException(msg)

  private val VersionDir = "v=(\\d+)".r
  private val CommitDir = "_commit_version=(\\d+)".r
  private val ManifestLine = """\{"version":(\d+),"committed_at_us":(-?\d+)\}""".r
}
