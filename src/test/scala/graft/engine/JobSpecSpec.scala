package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.JobSpec._

class JobSpecSpec extends AnyFunSuite {

  test("parseTableVersions: single table") {
    assert(parseTableVersions("cat.sch.tbl=1-2") ===
      Seq(TableVersionRange("cat.sch.tbl", 1, 2)))
  }

  test("parseTableVersions: multiple tables") {
    assert(parseTableVersions("c.s.t=1-2,c.s2.t2=11-12") ===
      Seq(TableVersionRange("c.s.t", 1, 2), TableVersionRange("c.s2.t2", 11, 12)))
  }

  test("parseTableVersions: snapshot range 0-N") {
    val Seq(r) = parseTableVersions("c.s.t=0-7")
    assert(r.isSnapshot)
    assert(r.latestOnly === TableVersionRange("c.s.t", 7, 7))
  }

  test("parseTableVersions: duplicate table keys rejected (reference quirk fixed)") {
    assertThrows[IllegalArgumentException](parseTableVersions("c.s.t=1-2,c.s.t=3-4"))
  }

  test("parseTableVersions: malformed input rejected") {
    assertThrows[IllegalArgumentException](parseTableVersions("c.s.t=1"))
    assertThrows[Exception](parseTableVersions("c.s.t"))
  }

  test("TableVersionRange: invalid ranges rejected") {
    assertThrows[IllegalArgumentException](TableVersionRange("t", 5, 3))
    assertThrows[IllegalArgumentException](TableVersionRange("t", -1, 3))
  }

  test("latestOnly keeps CDF dispatch for end > 0 and snapshot for end == 0") {
    assert(!TableVersionRange("t", 2, 9).latestOnly.isSnapshot) // [9,9] → CDF window
    assert(TableVersionRange("t", 0, 0).latestOnly.isSnapshot)
  }

  test("JobConfig: zero maxRecordsPerFile rejected when a strategy is active") {
    val tables = Seq(TableVersionRange("t", 0, 1))
    assertThrows[IllegalArgumentException](
      JobConfig(tables, Event, "select 1", "/tmp/x", strategy = Repartition, maxRecordsPerFile = 0))
    // but fine when no strategy resizes output
    JobConfig(tables, Event, "select 1", "/tmp/x", strategy = NoResize, maxRecordsPerFile = 0)
  }

  test("DataType taxonomy") {
    assert(DataType.fromName("EVENT") === Event)
    assert(DataType.fromName("WAREHOUSE_PROPERTY") === WarehouseProperty)
    assertThrows[IllegalArgumentException](DataType.fromName("nope"))
  }

  test("partition math boundary cases (reference test parity)") {
    // mirrors test/unload_databricks_data_to_s3_tests.py:30-34 (0/1/2/3 records, max 2)
    assert(Partitioning.partitionCount(0, 2) === 1) // floor at 1 (legacy repartition(0) bug fixed)
    assert(Partitioning.partitionCount(1, 2) === 1)
    assert(Partitioning.partitionCount(2, 2) === 1)
    assert(Partitioning.partitionCount(3, 2) === 2)
    assert(Partitioning.partitionCount(100000, 100000) === 1)
    assert(Partitioning.partitionCount(100001, 100000) === 2)
  }
}
