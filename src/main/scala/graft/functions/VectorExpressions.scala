package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
