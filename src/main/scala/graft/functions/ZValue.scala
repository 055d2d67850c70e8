package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Morton (Z-order) interleave of the low `bits` bits of two
  * non-negative longs: bit i of `a` lands at position 2i, bit i of `b`
  * at 2i+1. The standard multi-dimensional clustering key for data
  * layout: sorting a table by z(a, b) makes file-level min/max stats
  * selective on BOTH dimensions at once, so a 100 TB scan with
  * predicates on either column prunes most files — the lakehouse
  * Z-ORDER OPTIMIZE primitive, exposed as a plain codegen'd expression
  * so any write path can `.orderBy(zvalue(...))` before writing.
  *
  * Arithmetic is a fold over bit positions in plain integer ops —
  * replicated exactly by the q58 DuckDB oracle and the HOF twin
  * (SimilarityOps-style equivalence, ZValueSpec).
  */
case class ZInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zinterleave requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zinterleave"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZInterleave.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZInterleave.compute($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}

object ZInterleave {
  def compute(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
