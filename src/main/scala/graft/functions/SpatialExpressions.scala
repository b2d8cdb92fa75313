package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Space-filling-curve keys as codegen'd Catalyst expressions.
  *
  * [[HilbertIndex]] is the Hilbert-curve companion of [[graft.ext.ZOrder]]'s
  * Morton interleave: both map (x, y) to one clustering key, but the
  * Hilbert walk never makes the long diagonal jumps Morton does — every
  * consecutive d is a GRID NEIGHBOR (|Δx|+|Δy| = 1, HilbertSpec-asserted),
  * so a contiguous key range bounds a tighter tile and file min/max stats
  * prune better on both dimensions. The price is a data-dependent rotation
  * per bit, which no composition of built-ins expresses cleanly — exactly
  * the custom-Expression tier of the build contract.
  *
  * Arithmetic is the MASKED-rotation formulation (lower-bit reflect +
  * swap): every intermediate stays a non-negative long, so the q204 DuckDB
  * oracle replays the identical rounds with `//`/`%` and lateral column
  * aliases — engine-exact, unlike the classic unmasked C variant whose
  * negative intermediates lean on two's-complement `&`.
  */
object HilbertOps {
  /** Hilbert d-index of (x, y) on a 2^bits × 2^bits grid; inputs masked. */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    val full = (1L << bits) - 1
    var x = x0 & full
    var y = y0 & full
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += ((3L * rx) ^ ry) << (2 * i)
      val m = (1L << i) - 1
      val xl = x & m
      val yl = y & m
      if (ry == 0L) {
        if (rx == 1L) { x = m - yl; y = m - xl }
        else { x = yl; y = xl }
      } else { x = xl; y = yl }
      i -= 1
    }
    d
  }
}

/** `hilbert_index(x, y)` — Hilbert-curve position of (x, y) on the
  * 2^bits grid, as one codegen'd long expression.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertOps.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertOps.xy2d($x, $y, $bits);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
}
