package graft.engine

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Port of the reference's schema-level void test
  * (`test/unload_databricks_data_to_s3_tests.py:36-99`) plus row-content
  * assertions the reference skipped, plus a ScalaCheck property over random
  * nested schemas.
  */
class VoidScrubSpec extends SparkSpec {

  private def fixture = {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("void_field", NullType),
      StructField("empty_struct", StructType(Seq(StructField("void_nested", NullType)))),
      StructField("mixed_struct", StructType(Seq(
        StructField("valid_field", StringType),
        StructField("void_field", NullType)))),
      StructField("void_array", ArrayType(NullType)),
      StructField("valid_array", ArrayType(StringType)),
      StructField("void_map", MapType(StringType, NullType)),
      StructField("valid_map", MapType(StringType, StringType))
    ))
    val rows = Seq(
      Row(1, "Alice", null, null, Row("valid_value", null), Seq.empty, Seq("item1", null, "item2"),
        Map.empty[String, String], Map("key1" -> "value1")),
      Row(2, "Bob", null, null, Row("another_value", null), Seq.empty, Seq.empty,
        Map.empty[String, String], Map.empty[String, String])
    )
    spark.createDataFrame(rows.asJava, schema)
  }

  test("reference schema semantics: top-level voids dropped, structs pruned") {
    val cleaned = VoidScrub.dropVoidFields(fixture)
    val names = cleaned.schema.fieldNames.toSeq
    assert(!names.contains("void_field"))
    assert(!names.contains("void_array"))
    assert(!names.contains("void_map"))
    // all-void struct DROPPED (quirk fix: the reference's untyped NULL
    // literal would still crash the Parquet write this scrub exists for)
    assert(!names.contains("empty_struct"))
    val mixed = cleaned.schema("mixed_struct").dataType.asInstanceOf[StructType]
    assert(mixed.fieldNames.toSeq === Seq("valid_field"))
    assert(names.contains("valid_array") && names.contains("valid_map"))
  }

  test("row contents preserved; null array elements dropped (reference quirk kept)") {
    val cleaned = VoidScrub.dropVoidFields(fixture).orderBy("id").collect()
    assert(cleaned(0).getAs[String]("name") === "Alice")
    assert(cleaned(0).getAs[Row]("mixed_struct") === Row("valid_value"))
    // the reference's unconditional F.filter drops null elements from every array
    assert(cleaned(0).getAs[Seq[String]]("valid_array") === Seq("item1", "item2"))
    assert(cleaned(0).getAs[Map[String, String]]("valid_map") === Map("key1" -> "value1"))
    assert(cleaned(1).getAs[Seq[String]]("valid_array") === Seq.empty)
  }

  test("nested Array[Void] becomes empty array; nested Map[_,Void] becomes empty map") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("s", StructType(Seq(
        StructField("av", ArrayType(NullType)),
        StructField("mv", MapType(StringType, NullType)),
        StructField("keep", IntegerType))))
    ))
    val df = spark.createDataFrame(
      Seq(Row(1, Row(Seq(null, null), Map("k" -> null), 7))).asJava, schema)
    val out = VoidScrub.dropVoidFields(df).collect()(0).getAs[Row]("s")
    assert(out.getAs[Seq[Any]]("av") === Seq.empty)
    assert(out.getAs[Map[String, Any]]("mv") === Map.empty)
    assert(out.getAs[Int]("keep") === 7)
  }

  test("frames without voids pass through as the same plan (identity fast path)") {
    val df = spark.range(5).toDF("id")
    assert(VoidScrub.dropVoidFields(df) eq df)
  }

  // --- ScalaCheck property: no VOID survives anywhere the scrub can reach ---

  private val genPrimitive: Gen[DataType] =
    Gen.oneOf(IntegerType, StringType, DoubleType, BooleanType, LongType)

  private def genDataType(depth: Int): Gen[DataType] =
    if (depth <= 0) Gen.frequency(3 -> genPrimitive, 1 -> Gen.const(NullType))
    else
      Gen.frequency(
        3 -> genPrimitive,
        1 -> Gen.const(NullType),
        2 -> Gen.lzy(genDataType(depth - 1).map(ArrayType(_))),
        2 -> Gen.lzy(genDataType(depth - 1).map(MapType(StringType, _))),
        2 -> Gen.lzy(Gen.listOfN(3, genDataType(depth - 1)).map(ts =>
          StructType(ts.zipWithIndex.map { case (t, i) => StructField(s"f$i", t) })))
      )

  /** Independent schema-level model of the scrub rules
    * (`unload_databricks_data_to_s3.py:90-153`, with the documented quirk
    * fix: effectively-void structs — all fields void, recursively — are
    * DROPPED rather than collapsed to an untyped NULL, because that NULL
    * still cannot be written to Parquet). Faithful residue otherwise: a
    * nested `Array[Void]` keeps its `array<void>` type (emptied at
    * runtime), and a nested `Map[_,Void]` becomes `map<void,void>` (the
    * `map_from_arrays(array(), array())` shape) — the reference leaves the
    * same residue.
    */
  private def effectivelyVoid(dt: DataType): Boolean = dt match {
    case _: NullType   => true
    case s: StructType => s.fields.forall(f => effectivelyVoid(f.dataType))
    case _             => false
  }

  private def model(dt: DataType): DataType = dt match {
    case s: StructType =>
      val valid = s.fields.filterNot(f => effectivelyVoid(f.dataType))
      if (valid.isEmpty) NullType
      else StructType(valid.map(f => f.copy(dataType = model(f.dataType))))
    case a: ArrayType                                  => ArrayType(model(a.elementType))
    case m: MapType if m.valueType.isInstanceOf[NullType] => MapType(NullType, NullType)
    case m: MapType                                    => MapType(m.keyType, model(m.valueType))
    case other                                         => other
  }

  private def modelTop(schema: StructType): Seq[(String, DataType)] =
    schema.fields.toSeq.collect {
      case f if !effectivelyVoid(f.dataType) &&
        !f.dataType.matchesPattern { case ArrayType(_: NullType, _) => () } &&
        !f.dataType.matchesPattern { case MapType(_, _: NullType, _) => () } =>
        f.name -> model(f.dataType)
    }

  implicit private class PatternOps(dt: DataType) {
    def matchesPattern(pf: PartialFunction[DataType, Unit]): Boolean = pf.isDefinedAt(dt)
  }

  private def sameIgnoringNullability(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      x.fields.length == y.fields.length &&
        x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && sameIgnoringNullability(f.dataType, g.dataType)
        }
    case (x: ArrayType, y: ArrayType) => sameIgnoringNullability(x.elementType, y.elementType)
    case (x: MapType, y: MapType) =>
      sameIgnoringNullability(x.keyType, y.keyType) &&
        sameIgnoringNullability(x.valueType, y.valueType)
    case _ => a == b
  }

  test("property: scrub output schema matches the reference model (random schemas)") {
    val gen = Gen.listOfN(4, genDataType(2))
    val samples = (1 to 30).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    samples.foreach { types =>
      val schema = StructType(types.zipWithIndex.map { case (t, i) => StructField(s"c$i", t) })
      val df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      val got = VoidScrub.dropVoidFields(df).schema
      val expected = modelTop(schema)
      assert(got.fields.length === expected.length, s"column set for $schema → $got")
      got.fields.zip(expected).foreach { case (f, (name, dt)) =>
        assert(f.name === name, s"column order for $schema")
        assert(sameIgnoringNullability(f.dataType, dt),
          s"column ${f.name}: got ${f.dataType}, model says $dt (input $schema)")
      }
    }
  }
}
