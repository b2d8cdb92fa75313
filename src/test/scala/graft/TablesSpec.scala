package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables

/** Schema-drift regression for the [[graft.queries.Tables]] event-time
  * boundary.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * switched `events.ts` from INT64-nanos parquet to `timestamp[us]`
  * (TIMESTAMP_NTZ in Spark) once, which crashed every query doing raw `ts`
  * arithmetic at plan time. The boundary's contract: whatever the physical
  * encoding, `Tables.t(..., "events")` yields `ts: BIGINT` epoch-nanos with
  * identical values. This spec writes the SAME rows in all three encodings
  * and asserts byte-identical canonical output, so flipping the testdata
  * encoding again cannot silently break the surface.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-15T10:30:00.123456Z and a second row 1µs later; values chosen
  // to be exactly representable in micros so every encoding round-trips
  private val micros = Seq(1705314600123456L, 1705314600123457L, 1705401000000000L)

  private def canonical(dir: java.nio.file.Path, sub: String) =
    Tables.t(spark, dir.resolve(sub).toString, "events")
      .select($"event_id", $"ts").orderBy($"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("ts normalizes to identical BIGINT nanos across parquet encodings") {
    withTempDir("tables-drift") { dir =>
      // encoding 1: INT64 nanos (the original testdata generation)
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us * 1000L) }
        .toDF("event_id", "ts")
        .write.parquet(dir.resolve("nanos/events.parquet").toString)

      // encoding 2: TIMESTAMP_NTZ — parquet timestamp[us], isAdjustedToUTC
      // false (the current testdata generation)
      val ntzRows = micros.zipWithIndex.map { case (us, i) =>
        Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(ntzRows, 1),
        StructType(Seq(StructField("event_id", LongType),
          StructField("ts", TimestampNTZType))))
        .write.parquet(dir.resolve("ntz/events.parquet").toString)

      // encoding 3: tz-adjusted TIMESTAMP (isAdjustedToUTC true)
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, java.sql.Timestamp.from(
          java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS))) }
        .toDF("event_id", "ts")
        .write.parquet(dir.resolve("tz/events.parquet").toString)

      // NOTE: the "nanos" case writes a plain INT64 column, so it exercises
      // the LongType passthrough branch. The legacy parquet
      // TIMESTAMP(NANOS) + `nanosAsLong` read leg (Spark cannot WRITE that
      // encoding) is pinned by the pyarrow-generated fixture test below.
      val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) }
      for (enc <- Seq("nanos", "ntz", "tz")) {
        val df = Tables.t(spark, dir.resolve(enc).toString, "events")
        assert(df.schema("ts").dataType === LongType,
          s"$enc: ts must surface as BIGINT nanos")
        assert(canonical(dir, enc) === expected, s"$enc: values drifted")
      }
    }
  }

  test("legacy TIMESTAMP(NANOS) parquet reads through nanosAsLong as BIGINT nanos") {
    // Foreign-written fixture (tools/make_nanos_fixture.py, pyarrow, parquet
    // 2.6): the one encoding Spark can read but not write, and the one
    // TablesSpec's own three writers cannot cover. Same canonical rows as
    // the encoding matrix above, so the value assertion is shared.
    val df = Tables.t(spark, "src/test/resources/fixtures/nanos-legacy", "events")
    assert(df.schema("ts").dataType === LongType,
      "TIMESTAMP(NANOS) must surface as BIGINT nanos via nanosAsLong")
    val got = df.select($"event_id", $"ts").orderBy($"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) }
    assert(got === expected, "legacy-nanos values drifted through the boundary")
  }

  test("tsUs derives epoch-micros from the canonical column") {
    val got = Seq((1L, 1705314600123456789L)).toDF("event_id", "ts")
      .select(Tables.tsUs.as("us")).head().getLong(0)
    assert(got === 1705314600123456L)
  }

  test("unknown ts encodings fail loud at the boundary, not downstream") {
    // Round 7's failure mode: a regenerated encoding the boundary does not
    // recognize must throw HERE with one diagnosis — silently passing the
    // raw column through would defer the crash to 30 downstream call sites.
    val strDf = Seq((1L, "2024-01-15T10:30:00Z")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(strDf))
    assert(e.getMessage.contains("unsupported physical type for 'ts'"))
    assert(e.getMessage.contains("StringType"))
    val intDf = Seq((1L, 42)).toDF("event_id", "ts")
    intercept[IllegalStateException](Tables.normalizeTs(intDf))
  }

  test("tables without a ts column pass through untouched") {
    withTempDir("tables-nots") { dir =>
      Seq((1L, "a")).toDF("k", "v")
        .write.parquet(dir.resolve("part.parquet").toString)
      val df = Tables.t(spark, dir.toString, "part")
      assert(df.columns.toSeq === Seq("k", "v"))
      assert(df.count() === 1L)
    }
  }
}
