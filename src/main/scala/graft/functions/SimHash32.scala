package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 32-bit SimHash over an array of non-negative token hashes:
  * bit i of the result is set when Σ_h (2·bit_i(h) − 1) > 0.
  *
  * Arithmetic is identical to `DedupOps.simhash32Hof` (the nested
  * `aggregate(transform(sequence(0,31), …), aggregate(hashes, …))`
  * form) — but that shape interprets 32·|hashes| lambda steps per row
  * (nested HOFs never reach codegen), which made the signature build
  * the dominant cost of the Hamming-pair suite (profiled ~1 ms/doc at
  * sf0.1). This is one O(|hashes|·32) primitive loop, codegen'd.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash32 requires ARRAY<BIGINT>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  /** Null elements: in the HOF referee (`simhash32Hof`) a null element
    * nulls every per-bit sum, `when(null > 0, …)` falls to the
    * otherwise(0) branch, and the signature collapses to 0 — the same
    * all-zero collapse SrpBands documents. Mirror that exactly (one
    * null scan up front) so native ≡ HOF holds on EVERY input, not just
    * null-free arrays (TextDedupSimSpec has the null-element case;
    * ADVICE r7: getLong on a null slot silently read 0 into the sums
    * before, which produced a DIFFERENT signature than the referee).
    */
  def compute(hashes: ArrayData): Long = {
    val sums = new Array[Int](32)
    val n = hashes.numElements()
    var k = 0
    while (k < n) {
      if (hashes.isNullAt(k)) return 0L
      k += 1
    }
    k = 0
    while (k < n) {
      val h = hashes.getLong(k)
      var i = 0
      while (i < 32) {
        // 2·bit−1: +1 when set, −1 when clear (h is non-negative, so
        // the >>/& form equals the HOF's div/mod form bit-for-bit)
        sums(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      k += 1
    }
    var out = 0L
    var i = 0
    while (i < 32) {
      if (sums(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }
}
