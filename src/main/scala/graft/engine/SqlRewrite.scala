package graft.engine

/** Identifier-aware rewriting of customer SQL to reference prepared temp views.
  *
  * The reference binds each prepared table under an epoch-suffixed, backticked
  * view name and substitutes it into the customer SQL with a naive
  * `str.replace` (`unload_databricks_data_to_s3.py:173-180, 312, 337`). That
  * corrupts the SQL when one table name is a prefix/substring of another
  * (`cat.sch.t` vs `cat.sch.t2`) and also rewrites occurrences inside string
  * literals. SURVEY §7.4 flags this as a quirk to FIX: we substitute only
  * standalone identifier occurrences and never touch quoted literals or
  * backquoted identifiers that merely contain the name.
  */
object SqlRewrite {

  /** Deterministic view name for a table + run epoch; mirrors the shape of
    * `build_temp_view_name` (`unload_databricks_data_to_s3.py:173-180`) but
    * keeps it a single valid unquoted identifier. Flattening dots to
    * underscores alone is not injective (`a.b_c` and `a_b.c` collide), so an
    * md5 prefix of the ORIGINAL dotted name is appended — distinct tables can
    * never bind to the same view within one attempt.
    */
  def tempViewName(table: String, epochMs: Long): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(table.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val tag = digest.take(4).map(b => f"$b%02x").mkString
    table.replace('.', '_') + "_" + tag + "_view_" + epochMs
  }

  private final val IdentChar = (c: Char) => c.isLetterOrDigit || c == '_' || c == '.'

  /** Replace standalone occurrences of `table` (a dotted name) with
    * `replacement`, skipping single-quoted, double-quoted and backtick-quoted
    * regions. An occurrence is standalone when not surrounded by identifier
    * characters, so `cat.sch.t` does not match inside `cat.sch.t2` or
    * `other_cat.sch.t`.
    */
  def substituteIdentifier(sql: String, table: String, replacement: String): String = {
    val out = new StringBuilder(sql.length + 16)
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        // copy quoted region verbatim. Escapes recognized: '' / "" / ``
        // doubling AND backslash escapes (\' \" \\ ...), which Spark SQL
        // string literals use by default — without the backslash case a
        // literal like 'it\'s' would close early and swallow the rest of the
        // statement into a phantom quoted region, silently disabling
        // substitution. Backticked identifiers have no backslash escapes.
        val quote = c
        out.append(c); i += 1
        var done = false
        while (i < n && !done) {
          val ch = sql.charAt(i)
          out.append(ch); i += 1
          if (ch == '\\' && quote != '`' && i < n) {
            out.append(sql.charAt(i)); i += 1 // escaped char, incl. \' \" \\
          } else if (ch == quote) {
            if (i < n && sql.charAt(i) == quote) { out.append(quote); i += 1 }
            else done = true
          }
        }
      } else if (sql.regionMatches(true, i, table, 0, table.length) &&
                 (i == 0 || !IdentChar(sql.charAt(i - 1))) &&
                 (i + table.length >= n || !IdentChar(sql.charAt(i + table.length)))) {
        out.append(replacement)
        i += table.length
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Rewrite customer SQL against a table→view binding map. Longest names
    * first so overlapping dotted prefixes can never shadow a longer match.
    */
  def rewrite(sql: String, bindings: Map[String, String]): String =
    bindings.toSeq.sortBy(-_._1.length).foldLeft(sql) { case (acc, (table, view)) =>
      substituteIdentifier(acc, table, view)
    }
}
