package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive NullType (VOID) scrub — operator P3 in SURVEY.md §2.3.
  *
  * Parquet cannot store VOID columns, so before the Parquet sink every
  * NullType field is removed at any nesting depth
  * (`_drop_nulltype_fields` / `drop_void_fields`,
  * `unload_databricks_data_to_s3.py:90-153`). Exact edge semantics preserved
  * (verified against `test/unload_databricks_data_to_s3_tests.py:36-99`):
  *
  *   - top-level VOID column, `Array[Void]`, `Map[_, Void]`: dropped entirely;
  *   - struct whose fields are all VOID: becomes a null literal (Spark cannot
  *     represent an empty struct);
  *   - nested `Array[Void]`: becomes an empty array (elements scrub to null,
  *     then null elements are filtered);
  *   - nested `Map[_, Void]`: becomes an empty map;
  *   - arrays of ANY element type lose null elements (the reference filters
  *     unconditionally) — an observable quirk we keep;
  *   - everything else passes through untouched.
  *
  * One DELIBERATE divergence (a quirk fix in the SURVEY §7.4 sense): the
  * identity fast path below returns a struct column untouched when no VOID
  * field exists anywhere inside it, which preserves NULL struct values. The
  * reference rebuilds every struct unconditionally, so a NULL struct comes
  * back as a non-null struct of NULLs in its output — a lossy artifact of
  * the rebuild, not a semantic anyone depends on. We keep the input value.
  *
  * Implementation notes (Spark-first): this is pure Catalyst expression
  * composition — `struct`/`transform`/`filter`/`map_entries`/
  * `map_from_entries` are all codegen'd higher-order functions, so the scrub
  * stays inside whole-stage codegen with zero UDFs, exactly like the
  * reference's Python HOF-lambda version (which also never left Catalyst).
  * Subtrees that can't be affected (no NullType and no ArrayType anywhere
  * below) are returned as-is so the common all-primitive schema compiles to
  * an identity projection.
  */
object VoidScrub {

  /** True when a subtree carries NO representable data at all: VOID itself,
    * or a struct whose every field is effectively void. Such shapes cannot
    * survive a Parquet write under ANY rewrite (the reference turns them
    * into an untyped NULL literal, which still fails the write with
    * "Parquet data source does not support void data type"), so the scrub
    * DROPS them like the other void shapes — a documented quirk fix, not a
    * port of the reference's crash.
    */
  private[engine] def effectivelyVoid(dt: DataType): Boolean = dt match {
    case _: NullType   => true
    case s: StructType => s.fields.forall(f => effectivelyVoid(f.dataType))
    case _             => false
  }

  /** True if scrubbing could change values/schema anywhere in this subtree.
    * Arrays always count because the reference drops null elements from every
    * array it touches.
    */
  private[engine] def needsRebuild(dt: DataType): Boolean = dt match {
    case _: NullType           => true
    case _: ArrayType          => true
    case s: StructType         => s.fields.exists(f => needsRebuild(f.dataType))
    case m: MapType            => needsRebuild(m.valueType)
    case _                     => false
  }

  /** Recursively rebuild `col` of type `dt`, pruning VOID fields.
    *
    * DELIBERATE QUIRK FIX (SURVEY §7.4 decision log): for a struct with no
    * VOID field anywhere below, the identity fast path returns the column
    * untouched, so a NULL struct value stays NULL. The reference rebuilds
    * every struct unconditionally via `F.struct(fields…)`, which turns a
    * NULL struct into a non-null struct of NULL fields — data corruption we
    * choose not to reproduce (same class of fix as the §7.4 "str.replace
    * rewrite" and "repartition(0)" entries). Structs that DO need a rebuild
    * keep the reference behavior on the rebuilt path.
    */
  private[engine] def scrubColumn(c: Column, dt: DataType): Column = dt match {
    case s: StructType =>
      val valid = s.fields.filterNot(f => effectivelyVoid(f.dataType))
      if (valid.isEmpty) lit(null) // unreachable from dropVoidFields (effectively-void structs are dropped); kept as a safe fallback for direct calls
      else if (!valid.exists(f => needsRebuild(f.dataType)) && valid.length == s.fields.length) c
      else struct(valid.map(f => scrubColumn(c.getField(f.name), f.dataType).as(f.name)).toIndexedSeq: _*)

    case a: ArrayType =>
      // scrub each element, then DROP null elements; empty arrays remain []
      val cleaned =
        if (needsRebuild(a.elementType)) transform(c, x => scrubColumn(x, a.elementType))
        else c
      filter(cleaned, x => x.isNotNull)

    case m: MapType =>
      if (m.valueType.isInstanceOf[NullType]) map_from_arrays(array(), array()) // nested Map[_,Void] ⇒ {}
      else if (!needsRebuild(m.valueType)) c
      else
        map_from_entries(
          transform(
            map_entries(c),
            kv =>
              struct(
                kv.getField("key").as("key"),
                scrubColumn(kv.getField("value"), m.valueType).as("value")
              )
          )
        )

    case _: NullType => lit(null) // leaf VOID (reached via array-element recursion)
    case _           => c
  }

  /** Drop all VOID fields from `df`, recursively. Top level: VOID,
    * `Array[Void]` and `Map[_, Void]` columns are removed outright; other
    * columns are rebuilt in place.
    */
  def dropVoidFields(df: DataFrame): DataFrame = {
    val kept = df.schema.fields.iterator.filter {
      case StructField(_, dt, _, _) if effectivelyVoid(dt)                    => false
      case StructField(_, ArrayType(_: NullType, _), _, _)                    => false
      case StructField(_, MapType(_, _: NullType, _), _, _)                   => false
      case _                                                                  => true
    }.toIndexedSeq
    if (kept.length == df.schema.fields.length && !kept.exists(f => needsRebuild(f.dataType))) df
    else df.select(kept.map(f => scrubColumn(col(f.name), f.dataType).as(f.name)): _*)
  }
}
