package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-hashing kernels for the dedup ladder.
  *
  * The HOF formulations they replace (`transform` + `aggregate` chains) are
  * interpreter-only and re-walk the token/shingle array once per hash
  * function / sketch bit — e.g. the 48-bit SimHash costs 48 interpreted
  * array passes per document. Each expression here makes ONE pass in
  * compiled code, calling the static kernels in [[HashOps]] (a static call
  * inside whole-stage codegen, like Spark's own string expressions).
  *
  * Numeric contract (oracle parity): every kernel reproduces the md5-hex /
  * affine / ±1-sum arithmetic of the HOF pipeline bit-for-bit — the DuckDB
  * oracles generated in `ExtQueries` stay valid unchanged.
  */

/** One-pass md5-derived long per array element:
  * `conv(substring(md5(s), 1, digits), 16, 10) [% mod]`.
  * Null elements map to null elements (as md5(null) does); `mod <= 0`
  * disables the modulus. Used for shingle hashes (digits=15, mod=2³¹−1)
  * and 48-bit token hashes (digits=12).
  */
case class Md5Longs(child: Expression, digits: Int, mod: Long) extends UnaryExpression {
  require(digits > 0 && digits <= 15, "digits must be in [1,15] to fit a signed long")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "md5_longs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashOps.md5Longs(v.asInstanceOf[ArrayData], digits, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashOps.md5Longs($a, $digits, ${mod}L);")

  override protected def withNewChildInternal(c: Expression): Md5Longs = copy(child = c)
}

/** One-pass SimHash: for each bit b, sum ±1 over token hashes (`+1` when
  * bit b of the hash is set), bit b of the result is set iff the sum ≥ 0.
  *
  * Exact parity with the 48-`aggregate` HOF chain, including the edge
  * cases: an EMPTY array has every per-bit sum 0 → ALL bits set; a null
  * element nulls every per-bit sum, whose `when(sum >= 0)` then takes the
  * otherwise-0 branch → sketch 0.
  */
case class SimHashPack(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 63, "bits must fit a signed long")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<long>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashOps.simhashPack(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashOps.simhashPack($a, $bits);")

  override protected def withNewChildInternal(c: Expression): SimHashPack = copy(child = c)
}

/** One-pass MinHash signature: element j is
  * `min over h of (a(j)·(h mod p) + b(j)) mod p` — parity with
  * `array_min(transform(hs, h => (a*(h%p) + b) % p))` per hash function
  * (for inputs already reduced mod p the inner mod is the identity),
  * including null handling (`array_min` skips null elements). An EMPTY (or
  * all-null) input yields a NULL signature — callers give such rows a
  * sentinel band bucket instead of filtering (a filter on a derived column
  * would be pushed below the fan-out exchange and serialize the pipeline).
  * Accepting the raw 60-bit md5 prefix lets ONE `(doc_id, hs)` projection
  * feed both the signature path and the hash-space Jaccard verify tier.
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {
  require(as.nonEmpty && as.length == bs.length, "need matching a/b parameter vectors")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<long>, got ${t.simpleString}")
  }

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def nullSafeEval(v: Any): Any =
    HashOps.minhashSig(v.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.HashOps.minhashSig($a, $aRef, $bRef, ${p}L);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** One-pass distinct character k-shingles, first-occurrence order — parity
  * with `array_distinct(transform(sequence(1, len-k+1), i => substr(t,i,k)))`
  * guarded by `length(t) >= k` (shorter input → empty array).
  */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashOps.charShingles(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.HashOps.charShingles($t, $k);")

  override protected def withNewChildInternal(c: Expression): CharShingles = copy(child = c)
}

/** One-pass distinct word n-grams (tokens joined by single spaces),
  * first-occurrence order — parity with
  * `array_distinct(transform(sequence(1, size-n+1), i => concat_ws(" ",
  * element_at(toks, i)...element_at(toks, i+n-1))))` guarded by
  * `size(toks) >= n` (fewer tokens → empty array). Null tokens are skipped
  * inside an n-gram exactly like concat_ws.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression {
  require(n >= 1, "n-gram size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = if (distinct) "word_ngrams" else "word_ngrams_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  private def op: String = if (distinct) "wordNgrams" else "wordNgramsAll"

  override def nullSafeEval(v: Any): Any =
    if (distinct) HashOps.wordNgrams(v.asInstanceOf[ArrayData], n)
    else HashOps.wordNgramsAll(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashOps.$op($a, $n);")

  override protected def withNewChildInternal(c: Expression): WordNgrams = copy(child = c)
}

/** One-pass stopword-hit count — parity with
  * `size(filter(toks, t => t.isin(words)))` (null tokens don't count).
  */
case class StopwordCount(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String]()
    words.foreach(w => set.add(UTF8String.fromString(w)))
    set
  }

  override def nullSafeEval(v: Any): Any =
    HashOps.stopwordCount(v.asInstanceOf[ArrayData], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwords", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashOps.stopwordCount($a, $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): StopwordCount = copy(child = c)
}

/** One-pass polynomial rolling hash over codepoints:
  * `acc = (acc * mult + codepoint) mod m` — parity with the
  * `aggregate(transform(sequence(1, len), i => ascii(substr(t, i, 1))), ...)`
  * HOF chain (Spark's `ascii` = first codepoint, as DuckDB's). Empty → 0.
  */
case class PolyRollingHash(child: Expression, mult: Long, mod: Long) extends UnaryExpression {
  require(mod > 1 && mult > 0, "need positive multiplier and modulus > 1")

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashOps.polyRollingHash(v.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.HashOps.polyRollingHash($t, ${mult}L, ${mod}L);")

  override protected def withNewChildInternal(c: Expression): PolyRollingHash = copy(child = c)
}

/** Every `stride`-th byte of a binary column, one pass — the deterministic
  * stand-in for a media RESIZE/downsample stage (real codecs replace the
  * kernel, not the plumbing: per-row binary in, smaller binary out, inside
  * whole-stage codegen).
  */
case class ByteStride(child: Expression, stride: Int) extends UnaryExpression {
  require(stride >= 1, "stride must be positive")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "byte_stride"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashOps.byteStride(v.asInstanceOf[Array[Byte]], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.HashOps.byteStride($b, $stride);")

  override protected def withNewChildInternal(c: Expression): ByteStride = copy(child = c)
}

/** Static kernels shared by interpreted eval and generated code. Called from
  * whole-stage-codegen'd Java via the Scala static forwarders.
  */
object HashOps {
  private val localMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First `digits` hex nibbles of md5(bytes) as an unsigned long. */
  def md5Prefix(bytes: Array[Byte], digits: Int): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < digits) {
      val b = d(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  def md5Longs(arr: ArrayData, digits: Int, mod: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Prefix(arr.getUTF8String(i).getBytes, digits)
        out(i) = if (mod > 0) h % mod else h
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def simhashPack(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L // HOF parity: null element → null sums → sketch 0
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sk = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) >= 0) sk |= 1L << b
      b += 1
    }
    sk
  }

  def minhashSig(arr: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val n = arr.numElements()
    val m = as.length
    val mins = new Array[Long](m)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i) % p
        var j = 0
        while (j < m) {
          val v = (as(j) * h + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else ArrayData.toArrayData(mins)
  }

  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= m - n) {
      // concat_ws semantics: skip null tokens, join the rest with " "
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = 0
      while (j < n) {
        if (!toks.isNullAt(i + j)) parts.add(toks.getUTF8String(i + j))
        j += 1
      }
      seen.add(UTF8String.concatWs(sep, parts.toArray(new Array[UTF8String](parts.size())): _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** All word n-grams in window order WITH multiplicity — the counting form
    * behind repetition metrics (the distinct form above serves set overlap).
    */
  def wordNgramsAll(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = 0
      while (j < n) {
        if (!toks.isNullAt(i + j)) parts.add(toks.getUTF8String(i + j))
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts.toArray(new Array[UTF8String](parts.size())): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def stopwordCount(toks: ArrayData, words: java.util.HashSet[UTF8String]): Int = {
    val m = toks.numElements()
    var c = 0
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i) && words.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def byteStride(bytes: Array[Byte], stride: Int): Array[Byte] = {
    if (stride == 1) return bytes
    val out = new Array[Byte]((bytes.length + stride - 1) / stride)
    var i = 0
    var j = 0
    while (i < bytes.length) { out(j) = bytes(i); i += stride; j += 1 }
    out
  }

  def polyRollingHash(t: UTF8String, mult: Long, mod: Long): Long = {
    val s = t.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  def charShingles(t: UTF8String, k: Int): ArrayData = {
    val n = t.numChars()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 1
    while (i <= n - k + 1) {
      seen.add(t.substringSQL(i, k))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
