package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class SqlRewriteSpec extends AnyFunSuite {

  test("rewrites standalone identifier occurrences") {
    assert(SqlRewrite.substituteIdentifier(
      "select * from cat.sch.t where x > 1", "cat.sch.t", "v1") ===
      "select * from v1 where x > 1")
  }

  test("does not rewrite when the table is a prefix of a longer identifier (reference hazard)") {
    val sql = "select * from cat.sch.t2 join cat.sch.t on t2.id = t.id"
    assert(SqlRewrite.substituteIdentifier(sql, "cat.sch.t", "v1") ===
      "select * from cat.sch.t2 join v1 on t2.id = t.id")
  }

  test("does not rewrite inside string literals") {
    val sql = "select 'cat.sch.t' as src from cat.sch.t"
    assert(SqlRewrite.substituteIdentifier(sql, "cat.sch.t", "v1") ===
      "select 'cat.sch.t' as src from v1")
  }

  test("does not rewrite inside double-quoted or backticked regions") {
    assert(SqlRewrite.substituteIdentifier("""select "cat.sch.t" from cat.sch.t""", "cat.sch.t", "v1")
      === """select "cat.sch.t" from v1""")
    assert(SqlRewrite.substituteIdentifier("select `cat.sch.t.x` from cat.sch.t", "cat.sch.t", "v1")
      === "select `cat.sch.t.x` from v1")
  }

  test("handles escaped quotes inside literals") {
    val sql = "select 'it''s cat.sch.t' from cat.sch.t"
    assert(SqlRewrite.substituteIdentifier(sql, "cat.sch.t", "v1") ===
      "select 'it''s cat.sch.t' from v1")
  }

  test("matches case-insensitively like SQL identifiers") {
    assert(SqlRewrite.substituteIdentifier("select * from CAT.SCH.T", "cat.sch.t", "v1") ===
      "select * from v1")
  }

  test("rewrite applies longest table names first") {
    val sql = "select * from c.s.t join c.s.t_ext on 1=1"
    val out = SqlRewrite.rewrite(sql, Map("c.s.t" -> "v1", "c.s.t_ext" -> "v2"))
    assert(out === "select * from v1 join v2 on 1=1")
  }

  test("tempViewName is a single valid identifier") {
    val v = SqlRewrite.tempViewName("cat.sch.tbl", 123L)
    assert(v.matches("cat_sch_tbl_[0-9a-f]{8}_view_123"), v)
  }

  test("tempViewName is injective across dot/underscore-ambiguous tables") {
    val v1 = SqlRewrite.tempViewName("a.b_c", 1L)
    val v2 = SqlRewrite.tempViewName("a_b.c", 1L)
    assert(v1 !== v2)
  }

  test("backslash-escaped quotes inside literals do not derail the scanner") {
    val sql = """SELECT 'it\'s fine' AS x, * FROM cat.sch.t WHERE note = 'a\\' AND id > 0"""
    val out = SqlRewrite.substituteIdentifier(sql, "cat.sch.t", "v1")
    assert(out ===
      """SELECT 'it\'s fine' AS x, * FROM v1 WHERE note = 'a\\' AND id > 0""")
  }
}
