package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality EXPECTATIONS — the contract gate a production
  * pipeline runs before publishing a batch (dbt tests / Deequ checks /
  * Delta constraints, stated as one operator): a rule set is evaluated in
  * ONE pass and the report says, per rule, how many rows violate it. The
  * reference pipeline ships data downstream unexamined; a consumer at
  * 100 TB wants the violation report BEFORE the export lands, priced at one
  * scan, not one scan per rule.
  *
  * Two rule shapes, two honest costs:
  *   - [[Rule]] (row predicate): all rules fold into a single aggregate
  *     projection — `Σ (¬p)` per rule — so N rules cost ONE map-side-partial
  *     scan regardless of N;
  *   - [[unique]] (multi-row property): uniqueness is not a row predicate;
  *     it costs its own key-shuffled aggregate (violations = rows carrying
  *     a key that appears more than once, i.e. `Σ (cnt) − #distinct` over
  *     duplicated keys). Callers pay that shuffle only for the keys they
  *     actually gate on.
  *
  * The report is (rule, violations, n_rows) — integer-exact, so the DuckDB
  * oracle replays every rule verbatim.
  */
object Expectations {

  /** A named row-level expectation: `violated` rows are those where
    * `holds` is false OR NULL (a rule that cannot evaluate is a violation —
    * the conservative gate; wrap in `coalesce` to opt out per rule).
    */
  final case class Rule(name: String, holds: Column)

  /** Evaluate all row-level rules in one scan: one row per rule with its
    * violation count and the batch row count.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    val aggs = count(lit(1)).as("__n") +:
      rules.map(r => sum((!coalesce(r.holds, lit(false))).cast("long")).as(r.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (rule, violations, n_rows): stack()
    // over literal pairs — still one scan, the melt is row-local
    val pairs = rules.map(r => s"'${r.name}', ${r.name}").mkString(", ")
    one.select(
      expr(s"stack(${rules.size}, $pairs) AS (rule, violations)"),
      col("__n").as("n_rows"))
  }

  /** Uniqueness expectation over `keyCols`: violations = rows that share
    * their key with at least one other row (0 when the key is unique).
    * Same report schema as [[check]] so the two union cleanly.
    */
  def unique(df: DataFrame, keyCols: Seq[String], name: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(
        coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L)).as("violations"),
        sum(col("__c")).as("n_rows"))
      .select(lit(name).as("rule"), col("violations"), col("n_rows"))
  }

  /** Referential-integrity expectation: violations = child rows whose
    * `fkCol` has no match in the parent's `pkCol` (NULL foreign keys count
    * as violations — the conservative gate, [[Rule]]'s posture). The third
    * multi-row shape next to [[check]]'s row predicates and [[unique]]'s
    * key cardinality; same report schema, so all three union into one
    * expectation report.
    *
    * Scale shape: one LEFT ANTI join keyed on the FK — child key columns
    * only cross the shuffle, and a broadcast parent collapses even that
    * when the dimension is model-sized.
    */
  def referentialIntegrity(
      child: DataFrame,
      parent: DataFrame,
      fkCol: String,
      pkCol: String,
      name: String): DataFrame = {
    val orphans = child.select(col(fkCol).as("__fk"))
      .join(parent.select(col(pkCol).as("__fk")).distinct(), Seq("__fk"), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("violations"))
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans)
      .select(lit(name).as("rule"), col("violations"), col("n_rows"))
  }
}
