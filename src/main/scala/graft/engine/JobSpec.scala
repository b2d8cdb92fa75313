package graft.engine

/** Job specification for the unload pipeline.
  *
  * Re-expresses the reference CLI surface (`unload_databricks_data_to_s3.py:412-459`,
  * operator O1 in SURVEY.md §2.9) as typed Scala config. Quirks fixed per SURVEY §7.4:
  * duplicate table keys are rejected (the reference's `defaultdict(list)` silently
  * appended — `unload_databricks_data_to_s3.py:163-170`), and negative / malformed
  * version ranges fail fast.
  */
object JobSpec {

  /** Inclusive version window for one table.
    * `start == 0` means "full snapshot at `end`" (S1); `start > 0` means
    * "CDF changes for versions [start, end]" (S2) — dispatch rule at
    * `unload_databricks_data_to_s3.py:196-200`.
    */
  final case class TableVersionRange(table: String, start: Long, end: Long) {
    require(start >= 0 && end >= 0, s"versions must be >= 0: $table=$start-$end")
    require(end >= start, s"end < start for $table: $start-$end")
    def isSnapshot: Boolean = start == 0L
    /** Latest-only form used by the recovery protocol (O3/O4). Mirrors the
      * reference's `_fetch_and_create_view(end, end)`: the `fetch_data`
      * dispatch then reads the CDF window `[end, end]` when `end > 0` and a
      * snapshot only when `end == 0` — NOT a snapshot at `end`.
      */
    def latestOnly: TableVersionRange = copy(start = end)
  }

  /** Amplitude data-type taxonomy (`--data_type`,
    * `unload_databricks_data_to_s3.py:420-422`). Selects CDC semantics:
    * EVENT = append-only (inserts); everything else = upsert
    * (inserts + update post-images). WAREHOUSE_PROPERTY deliberately takes
    * the property branch (only EVENT is special-cased —
    * `unload_databricks_data_to_s3.py:205-211`; SURVEY §7.4 "keep").
    */
  sealed trait DataType { def name: String }
  case object Event extends DataType { val name = "EVENT" }
  case object UserProperty extends DataType { val name = "USER_PROPERTY" }
  case object GroupProperty extends DataType { val name = "GROUP_PROPERTY" }
  case object WarehouseProperty extends DataType { val name = "WAREHOUSE_PROPERTY" }

  object DataType {
    val all: Seq[DataType] = Seq(Event, UserProperty, GroupProperty, WarehouseProperty)
    def fromName(s: String): DataType =
      all.find(_.name == s).getOrElse(throw new IllegalArgumentException(s"unknown data_type: $s"))
  }

  /** Output partition sizing strategy (R2-R4,
    * `unload_databricks_data_to_s3.py:379-392`). */
  sealed trait PartitionStrategy
  case object Repartition extends PartitionStrategy // full shuffle (RoundRobinPartitioning)
  case object Coalesce extends PartitionStrategy    // narrow merge + maxRecordsPerFile guard
  case object NoResize extends PartitionStrategy    // keep upstream partitioning

  object PartitionStrategy {
    def fromName(s: String): PartitionStrategy = s.toLowerCase match {
      case "repartition" => Repartition
      case "coalesce"    => Coalesce
      case "none" | ""   => NoResize
      case other         => throw new IllegalArgumentException(s"unknown partition strategy: $other")
    }
  }

  /** Output format (K1/K2, `unload_databricks_data_to_s3.py:399-403`). */
  sealed trait OutputFormat
  case object JsonFormat extends OutputFormat    // newline-delimited JSON, no void scrub (contract)
  case object ParquetFormat extends OutputFormat // zstd(3), void-scrubbed first

  object OutputFormat {
    def fromName(s: String): OutputFormat = s.toLowerCase match {
      case "json"    => JsonFormat
      case "parquet" => ParquetFormat
      case other     => throw new IllegalArgumentException(s"unknown format: $other")
    }
  }

  /** Full job config — the typed analogue of the reference's 12 CLI args. */
  final case class JobConfig(
      tables: Seq[TableVersionRange],
      dataType: DataType,
      sql: String,
      outputPath: String,
      format: OutputFormat = ParquetFormat,
      strategy: PartitionStrategy = NoResize,
      maxRecordsPerFile: Long = 100000L, // reference default since 2025-08-14 (<2GB/file ingest ceiling)
      targetPartitions: Option[Int] = None, // cluster-derived: skips the count() job entirely
      mutabilityMode: Boolean = false,       // P5: bypass CDC filter, keep CDF metadata columns
      runId: String = java.util.UUID.randomUUID().toString,
      // K3: when set, Unload writes the `<path>/meta` sidecar after the data
      // write, reusing the sizing count when one was paid (dead code in the
      // reference, wired opt-in here).
      writeMeta: Boolean = false
  ) {
    require(
      strategy == NoResize || maxRecordsPerFile > 0,
      s"max_records_per_file must be > 0 when a partition strategy is active (got $maxRecordsPerFile)"
    )
    require(
      tables.map(_.table).distinct.size == tables.size,
      s"duplicate table in spec: ${tables.map(_.table)}"
    )
  }

  /** Parse the reference's `table_versions_map` grammar:
    * `catalog.schema.table=start-end[,catalog.schema.table2=start-end]`
    * (`parse_table_versions_map_arg`, `unload_databricks_data_to_s3.py:155-170`).
    * Duplicate keys are an error here (reference quirk fixed, SURVEY §7.4).
    */
  def parseTableVersions(arg: String): Seq[TableVersionRange] = {
    val ranges = arg.split(",").toIndexedSeq.filter(_.nonEmpty).map { entry =>
      entry.split("=") match {
        case Array(table, range) =>
          range.split("-") match {
            case Array(s, e) => TableVersionRange(table.trim, s.trim.toLong, e.trim.toLong)
            case _ => throw new IllegalArgumentException(s"bad version range '$range' in '$entry'")
          }
        case _ => throw new IllegalArgumentException(s"bad table spec '$entry'")
      }
    }
    val dups = ranges.groupBy(_.table).collect { case (t, rs) if rs.size > 1 => t }
    require(dups.isEmpty, s"duplicate table keys: ${dups.mkString(",")}")
    ranges
  }
}
