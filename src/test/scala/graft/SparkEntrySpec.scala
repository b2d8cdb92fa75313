package graft

/** Smoke coverage of the driver contract: flagship entry returns rows, every
  * declared query runs at sf0.001, and every oracle key maps to a real query.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry: full unload pipeline end-to-end returns exported rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("user_properties"))
  }

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, Sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }
}
