package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector arithmetic over embedding columns.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * interpreter-only (`CodegenFallback`): a 64-dim dot product through HOFs
  * costs an intermediate array allocation plus ~128 boxed lambda calls PER
  * PAIR, outside whole-stage codegen. These expressions generate a tight
  * primitive loop instead, so per-pair scoring in the similarity operators
  * stays inside the codegen'd stage.
  *
  * Numeric contract (oracle parity): identical to the HOF formulation they
  * replace — elements are widened to double and accumulated SEQUENTIALLY in
  * index order, exactly like `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and
  * like DuckDB's `list_dot_product` on `DOUBLE[]`. Null semantics are also
  * identical: null input, length mismatch (zip_with pads with null) or a
  * null element each yield NULL.
  *
  * Both `array<float>` and `array<double>` inputs are accepted (per side),
  * so float embeddings never need a materialized `array<double>` copy.
  */
private[graft] trait VecArrayArg { self: Expression =>
  protected def elemGetter(arr: String, et: DataType, i: String): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
  protected def elemAt(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }
  protected def okElem(t: DataType): Boolean = t == FloatType || t == DoubleType
}

/** `vec_dot(a, b)` — Σᵢ aᵢ·bᵢ in double, sequential accumulation. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayArg {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def lt = left.dataType.asInstanceOf[ArrayType]
  private def rt = right.dataType.asInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _)) if okElem(l) && okElem(r) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double>, array<float|double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += elemAt(a, lt.elementType, i) * elemAt(b, rt.elementType, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck =
        if (lt.containsNull || rt.containsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ${elemGetter(a, lt.elementType, i)} * ${elemGetter(b, rt.elementType, i)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** `vec_norm(a)` — √(Σᵢ aᵢ²), the L2 norm, same accumulation order as
  * `sqrt(vec_dot(a, a))`.
  */
case class VecNorm(child: Expression) extends UnaryExpression with VecArrayArg {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"

  private def ct = child.dataType.asInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(e, _) if okElem(e) => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = elemAt(a, ct.elementType, i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val nullCheck =
        if (ct.containsNull)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  final double $x = ${elemGetter(a, ct.elementType, i)};
         |  $s += $x * $x;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNorm = copy(child = c)
}

/** `vec_sq8(vec, mn, mx)` — scalar 8-bit quantization codes:
  * `min(floor((xᵢ − mn) · 255 / (mx − mn)), 255)` per element (all zeros
  * when the range collapses). floor keeps the arithmetic integer-exact
  * across engines (round() half-ties differ between Spark and DuckDB).
  * The (mn, mx) pair is the per-vector reconstruction model the caller
  * stores next to the codes — 4× smaller embedding storage with one
  * codegen'd pass.
  */
case class VecSq8(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with VecArrayArg {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sq8"

  private def vt = first.dataType.asInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(e, _), DoubleType, DoubleType) if okElem(e) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<float|double>, double, double), got " +
            s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
            s"${third.dataType.simpleString})")
    }

  override def nullSafeEval(v: Any, mnA: Any, mxA: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val mn = mnA.asInstanceOf[Double]
    val mx = mxA.asInstanceOf[Double]
    val n = a.numElements()
    val out = new Array[Int](n)
    val range = mx - mn
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      if (range != 0.0) {
        val c = math.floor((elemAt(a, vt.elementType, i) - mn) * 255.0 / range)
        out(i) = math.min(c, 255.0).toInt
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, mx) =>
      s"""
         |${ev.value} = graft.functions.VecOps.sq8($v, $mn, $mx,
         |  ${vt.elementType == FloatType});
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): VecSq8 =
    copy(first = f, second = s, third = t)
}

/** Static kernels for the vector expressions (codegen call targets). */
object VecOps {
  def sq8(a: ArrayData, mn: Double, mx: Double, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Int](n)
    val range = mx - mn
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      if (range != 0.0) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val c = math.floor((x - mn) * 255.0 / range)
        out(i) = math.min(c, 255.0).toInt
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
