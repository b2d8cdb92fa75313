package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.ext.{Dedup, TextAnalysis}

/** The codegen'd expressions in graft.functions replace interpreter-only HOF
  * chains inside already-oracle-pinned queries — so their contract is exact
  * equivalence with the HOF formulation, asserted here on real data plus
  * synthetic edge cases, through BOTH the interpreted eval path and compiled
  * codegen (GenerateMutableProjection forces doGenCode).
  */
class VectorFunctionsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // ---- HOF reference formulations (what the engine used before) ----
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def hofNorm(a: org.apache.spark.sql.Column) = sqrt(hofDot(a, a))
  private def asDouble(v: org.apache.spark.sql.Column) = transform(v, _.cast("double"))

  test("vec_dot / vec_norm equal the HOF formulation on real embeddings") {
    import graft.functions.GraftFunctions.{vecDot, vecNorm}
    val e = graft.queries.Tables.embeddings(spark, sfDir).limit(200)
    val joined = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("vb")).limit(20))
    val mismatches = joined.select(
      vecDot(col("va"), col("vb")).as("cg"),
      hofDot(asDouble(col("va")), asDouble(col("vb"))).as("hof"),
      vecNorm(col("va")).as("cgn"),
      hofNorm(asDouble(col("va"))).as("hofn"))
      .filter(!(col("cg") === col("hof")) || !(col("cgn") === col("hofn")))
      .count()
    assert(mismatches === 0L)
  }

  test("vec_dot null semantics: null input, length mismatch, null element") {
    import graft.functions.GraftFunctions.vecDot
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)),   // 11.0
      Row(null, Seq(1.0)),                  // null input
      Row(Seq(1.0, 2.0), Seq(1.0)),         // length mismatch
      Row(Seq(1.0, null), Seq(1.0, 2.0)))   // null element
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(vecDot(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq === Seq(11.0, null, null, null))
  }

  test("expressions survive compiled codegen (GenerateMutableProjection)") {
    val emb = ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f))
    val emb2 = ArrayData.toArrayData(Array(2.0f, 0.5f, -1.0f))
    val toks = new GenericArrayData(Array[Any](
      UTF8String.fromString("the"), UTF8String.fromString("cat")))

    val floatArr = ArrayType(FloatType, containsNull = true)
    val dot = VecDot(
      BoundReference(0, floatArr, nullable = true),
      BoundReference(1, floatArr, nullable = true))
    val norm = VecNorm(BoundReference(0, floatArr, nullable = true))
    val strArr = ArrayType(StringType, containsNull = true)
    val m5 = Md5Longs(BoundReference(2, strArr, nullable = true), 12, 0L)
    val sim = SimHashPack(m5, 48)
    val params = Dedup.hashParams(16)
    val mh = MinHashSig(
      Md5Longs(BoundReference(2, strArr, nullable = true), 15, Dedup.Mersenne31),
      params.map(_.a), params.map(_.b), Dedup.Mersenne31)
    val shingle = CharShingles(Literal(UTF8String.fromString("abcdef"), StringType), 5)

    val sq8 = VecSq8(
      BoundReference(0, floatArr, nullable = true),
      Literal(1.0, DoubleType), Literal(3.0, DoubleType))
    val proj = GenerateMutableProjection.generate(Seq(dot, norm, m5, sim, mh, shingle, sq8))
    val out = proj(InternalRow(emb, emb2, toks))

    assert(out.getDouble(0) === (1.0 * 2.0 + 2.0 * 0.5 + 3.0 * -1.0))
    assert(out.getDouble(1) === math.sqrt(1.0 + 4.0 + 9.0))
    // interpreted eval must agree with codegen output
    assert(out.getArray(2).toLongArray().toSeq ===
      HashOps.md5Longs(toks, 12, 0L).toLongArray().toSeq)
    assert(out.getLong(3) === HashOps.simhashPack(out.getArray(2), 48))
    assert(out.getArray(4).toLongArray().toSeq ===
      HashOps.minhashSig(HashOps.md5Longs(toks, 15, Dedup.Mersenne31),
        params.map(_.a).toArray, params.map(_.b).toArray, Dedup.Mersenne31)
        .toLongArray().toSeq)
    assert(out.getArray(5).numElements() === 2) // "abcde", "bcdef"
    // vec [1,2,3] with mn=1 mx=3: floor((x-1)*255/2) = 0, 127, 255
    assert(out.getArray(6).toIntArray().toSeq === Seq(0, 127, 255))
  }

  test("md5_longs / simhash_pack / minhash_sig equal the HOF chain on documents") {
    import graft.functions.GraftFunctions.{md5Longs, minhashSig, simhashPack}
    val docs = graft.queries.Tables.documents(spark, sfDir).limit(100)
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))

    val hofTokenHashes =
      transform(col("tk"), t => conv(substring(md5(t), 1, 12), 16, 10).cast("long"))
    val tokenMismatch = toks
      .select(md5Longs(col("tk"), 12).as("cg"), hofTokenHashes.as("hof"))
      .filter(!(col("cg") === col("hof"))).count()
    assert(tokenMismatch === 0L)

    val hashed = toks.select(col("doc_id"), md5Longs(col("tk"), 12).as("th"))
    val hofSim = (0 until 48).map { b =>
      val bitSum = aggregate(col("th"), lit(0L),
        (acc, h) => acc + (shiftright(h, b) % 2L) * 2L - 1L)
      when(bitSum >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val simMismatch = hashed
      .select(simhashPack(col("th")).as("cg"), hofSim.as("hof"))
      .filter(!(col("cg") === col("hof"))).count()
    assert(simMismatch === 0L)

    val params = Dedup.hashParams(16)
    val norm = docs.select(col("doc_id"), TextAnalysis.normalize(col("text")).as("t"))
      .filter(length(col("t")) >= 5)
      .select(col("doc_id"), Dedup.shinglesOfNorm(col("t"), 5).as("sh"))
    val hofSig = array(params.map(p =>
      array_min(transform(
        transform(col("sh"), s => Dedup.baseHash(s) % Dedup.Mersenne31),
        h => (lit(p.a) * h + lit(p.b)) % Dedup.Mersenne31))): _*)
    val sigMismatch = norm.select(
      minhashSig(md5Longs(col("sh"), 15, Dedup.Mersenne31),
        params.map(_.a), params.map(_.b), Dedup.Mersenne31).as("cg"),
      hofSig.as("hof"))
      .filter(!(col("cg") === col("hof"))).count()
    assert(sigMismatch === 0L)
  }

  test("char_shingles equals distinct-transform HOF incl. short-string guard") {
    import graft.functions.GraftFunctions.charShingles
    val docs = graft.queries.Tables.documents(spark, sfDir).limit(100)
      .select(TextAnalysis.normalize(col("text")).as("t"))
      .union(spark.sql("SELECT 'abc' AS t")) // shorter than k
      .union(spark.sql("SELECT 'aaaaaaa' AS t")) // heavy duplicate shingles
    val hof = when(length(col("t")) >= 5,
      array_distinct(transform(
        sequence(lit(1), length(col("t")) - 4), i => col("t").substr(i, lit(5)))))
      .otherwise(array().cast("array<string>"))
    val mismatch = docs.select(charShingles(col("t"), 5).as("cg"), hof.as("hof"))
      .filter(!(col("cg") === col("hof"))).count()
    assert(mismatch === 0L)
  }

  test("word_ngrams / stopword_count / poly_rolling_hash equal their HOF chains") {
    import graft.functions.GraftFunctions.{polyRollingHash, stopwordCount, wordNgrams}
    val docs = graft.queries.Tables.documents(spark, sfDir).limit(100)
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))

    val hofNg = when(size(col("tk")) >= 3,
      array_distinct(transform(sequence(lit(1), size(col("tk")) - 2),
        i => concat_ws(" ", (0 until 3).map(j => element_at(col("tk"), i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))
    assert(toks.select(wordNgrams(col("tk"), 3).as("cg"), hofNg.as("hof"))
      .filter(!(col("cg") === col("hof"))).count() === 0L)

    val words = TextAnalysis.LangStopwords.head._2
    val hofStop = size(filter(col("tk"), t => t.isin(words.map(w => w: Any): _*)))
    assert(toks.select(stopwordCount(col("tk"), words).as("cg"), hofStop.as("hof"))
      .filter(!(col("cg") === col("hof"))).count() === 0L)

    val norm = docs.select(TextAnalysis.normalize(col("text")).as("t"))
      .union(spark.sql("SELECT '' AS t"))
    val hofRoll = when(length(col("t")) >= 1,
      aggregate(
        transform(sequence(lit(1), length(col("t"))),
          i => ascii(col("t").substr(i, lit(1))).cast("long")),
        lit(0L), (acc, code) => (acc * 31 + code) % 1000000007L))
      .otherwise(lit(0L))
    assert(norm.select(polyRollingHash(col("t")).as("cg"), hofRoll.as("hof"))
      .filter(!(col("cg") === col("hof"))).count() === 0L)
  }

  test("string kernels match HOF chains on randomized unicode input") {
    import graft.functions.GraftFunctions.{charShingles, md5Longs, polyRollingHash, wordNgrams}
    // fixed-seed generator: ascii, multibyte (é, 中, emoji incl. surrogate
    // pairs), whitespace runs, empties, shorter-than-k strings
    val rng = new scala.util.Random(123)
    val alphabet = "ab c\tde中文é€\u00df\ud83d\ude00 "
    val strings = (0 until 300).map { _ =>
      val len = rng.nextInt(12)
      (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    } :+ "" :+ "中中中中中中" :+ "a b  c   d"
    val df = spark.createDataFrame(
      java.util.Arrays.asList(strings.map(org.apache.spark.sql.Row(_)): _*),
      StructType(Seq(StructField("t", StringType))))

    val hofShingle = when(length(col("t")) >= 3,
      array_distinct(transform(
        sequence(lit(1), length(col("t")) - 2), i => col("t").substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))
    assert(df.select(charShingles(col("t"), 3).as("cg"), hofShingle.as("hof"))
      .filter(!(col("cg") === col("hof"))).count() === 0L)

    val toks = split(col("t"), " ")
    val hofNg = when(size(toks) >= 2,
      array_distinct(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + lit(1))))))
      .otherwise(array().cast("array<string>"))
    assert(df.select(wordNgrams(toks, 2).as("cg"), hofNg.as("hof"))
      .filter(!(col("cg") === col("hof"))).count() === 0L)

    val hofRoll = when(length(col("t")) >= 1,
      aggregate(
        transform(sequence(lit(1), length(col("t"))),
          i => ascii(col("t").substr(i, lit(1))).cast("long")),
        lit(0L), (acc, code) => (acc * 31 + code) % 1000000007L))
      .otherwise(lit(0L))
    assert(df.select(polyRollingHash(col("t")).as("cg"), hofRoll.as("hof"))
      .filter(!(col("cg") === col("hof"))).count() === 0L)

    val hofMd5 = transform(split(col("t"), " "),
      x => conv(substring(md5(x), 1, 12), 16, 10).cast("long"))
    assert(df.select(md5Longs(split(col("t"), " "), 12).as("cg"), hofMd5.as("hof"))
      .filter(!(col("cg") === col("hof"))).count() === 0L)
  }

  test("wordNgramsAll keeps multiplicity and window order (HOF parity)") {
    import graft.functions.GraftFunctions.wordNgramsAll
    val rng = new scala.util.Random(321)
    val words = Seq("a", "b", "ab", "中", "x")
    val strings = (0 until 200).map { _ =>
      (0 until rng.nextInt(8)).map(_ => words(rng.nextInt(words.length))).mkString(" ")
    } :+ "" :+ "a a a a"
    val df = spark.createDataFrame(
      java.util.Arrays.asList(strings.map(org.apache.spark.sql.Row(_)): _*),
      StructType(Seq(StructField("t", StringType))))
    val toks = split(col("t"), " ")
    // the non-distinct HOF formulation: every adjacent pair, in order
    val hofAll = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + lit(1)))))
      .otherwise(array().cast("array<string>"))
    assert(df.select(wordNgramsAll(toks, 2).as("cg"), hofAll.as("hof"))
      .filter(!(col("cg") === col("hof"))).count() === 0L)
    // "a a a a" → 3 identical bigrams survive (the distinct form keeps 1)
    import spark.implicits._
    val rep = Seq("a a a a").toDF("t")
    assert(rep.select(size(wordNgramsAll(split(col("t"), " "), 2))).head.getInt(0) === 3)
  }

  test("redactPii scrubs emails, phones, IPs with typed tokens") {
    import spark.implicits._
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "call +1 555-123-4567 or visit 192.168.0.1 ok",
      "no pii here at all").toDF("t")
    val got = df.select(graft.ext.TextAnalysis.redactPii(col("t")).as("r"))
      .as[String].collect()
    assert(got(0) === "mail <EMAIL> now")
    assert(got(1) === "call <PHONE> or visit <IP> ok")
    assert(got(2) === "no pii here at all")
  }

  test("SQL surface registers via GraftFunctions.register (same registry GraftExtensions injects)") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_norm(array(3.0D, 4.0D)) AS n,
        |       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       simhash_pack(array(5L), 48) AS s,
        |       char_shingles('abcdef', 5) AS sh
        |""".stripMargin).head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 5.0)
    assert(row.getDouble(2) === 1.0)
    // single token 5 = 0b101: bits 0,2 have sum +1 (set), all others -1 (unset)
    assert(row.getLong(3) === 5L)
    assert(row.getSeq[String](4) === Seq("abcde", "bcdef"))
  }

  test("GraftExtensions injects every registry function at session build time") {
    // exercised without a fresh JVM via the package-bridge test hook: apply
    // the injector to a registry copy and check each function landed
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    GraftFunctions.registry.foreach { case (ident, _, _) =>
      assert(!reg.functionExists(ident), s"$ident unexpectedly built-in")
    }
    org.apache.spark.sql.GraftColumnBridge.applyExtensions(new GraftExtensions, reg)
    GraftFunctions.registry.foreach { case (ident, _, _) =>
      assert(reg.functionExists(ident), s"$ident not injected by GraftExtensions")
    }
  }
}
