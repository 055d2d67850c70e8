package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native SRP-LSH band keys over a float/double vector: element t of the
  * result is table t's bucket — bitsPerTable sign bits, where global
  * hyperplane j = t*bitsPerTable + jj has ±1 components from a Knuth
  * multiplicative mix of (j, i):
  *   x = j*65537 + i;  h = (x * 2654435761) mod 2^32;
  *   component = +1 when bit 16 of h is 0, else -1
  * and bit jj is set when the (index-order, double) projection fold is
  * positive. The multiplicative mix matters: a mod-parity of a LINEAR
  * form in i (the naive choice) alternates +1/-1 with i, making every
  * hyperplane (±)the same vector — all tables collapse to ~2 giant
  * buckets and the LSH join degenerates to worse-than-all-pairs.
  * Arithmetic identical to SimilarityOps.srpBandKeys's HOF formulation
  * and to the q34 DuckDB oracle — bit-for-bit.
  *
  * Why native: the HOF version is CodegenFallback, an interpreted lambda
  * per (table × bit × dimension) per row — ~4096 dispatches per 64-dim
  * vector at q34's settings, evaluated once per JOIN SIDE. This is a
  * fused primitive loop inside whole-stage codegen; recomputing it per
  * reference is cheaper than caching the signatures at corpus scale.
  */
case class SrpBands(child: Expression, nTables: Int, bitsPerTable: Int)
    extends UnaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_srp_bands requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_srp_bands"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    SrpBands.compute(v.asInstanceOf[ArrayData], isFloat, nTables, bitsPerTable)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.SrpBands.compute($v, $isFloat, $nTables, $bitsPerTable)")

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}

object SrpBands {

  /** One pass: nTables*bitsPerTable projections, each an index-order
    * double fold (same IEEE op order as the HOF/oracle formulations).
    *
    * Null elements: the HOF formulation and the DuckDB oracle propagate a
    * null element through the fold — every projection nulls out, `> 0`
    * is never true, and all band keys collapse to 0. Mirror that here
    * (one null scan up front) so native ≡ HOF ≡ oracle holds on every
    * input, not just null-free vectors.
    */
  def compute(
      v: ArrayData, isFloat: Boolean,
      nTables: Int, bitsPerTable: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](nTables)
    var k = 0
    while (k < n) {
      if (v.isNullAt(k)) return new GenericArrayData(out) // all-zero keys
      k += 1
    }
    var t = 0
    while (t < nTables) {
      var bh = 0L
      var jj = 0
      while (jj < bitsPerTable) {
        val j = (t * bitsPerTable + jj).toLong
        var acc = 0.0
        var i = 0
        while (i < n) {
          val h = ((j * 65537L + i) * 2654435761L) % 4294967296L
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          acc += (if (((h >> 16) & 1L) == 0L) x else -x)
          i += 1
        }
        if (acc > 0) bh += (1L << jj)
        jj += 1
      }
      out(t) = bh
      t += 1
    }
    new GenericArrayData(out)
  }
}
