package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-centroid assignment: index of the centroid (squared
  * Euclidean) closest to the input vector, ties to the lowest index —
  * the IVF cell-assignment inner loop (SimilarityOps.ivfTopK).
  *
  * Why native: the previous Scala UDF put a serialization boundary
  * (catalyst → Scala Seq per row) on the one corpus-sized pass of the
  * IVF build. This expression reads ArrayData in place inside
  * whole-stage codegen; the centroid matrix rides along as a plan
  * reference object (`ctx.addReferenceObj`) — a few KB shipped once per
  * task binary, exactly like the UDF closure, but with no per-row
  * boxing. Distance loop is identical IEEE operation order to the UDF
  * it replaces (sequential index-order sum of squared diffs over
  * min(dim) elements, first-strictly-smaller wins), so assignments are
  * bit-identical.
  */
case class ArgMinCell(child: Expression, centers: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (centers.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "graft_argmin_cell requires a non-empty centroid matrix")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_argmin_cell requires ARRAY<FLOAT|DOUBLE>, got ${dt.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmin_cell"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    ArgMinCell.compute(v.asInstanceOf[ArrayData], isFloat, centers)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centers", centers, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ArgMinCell.compute($v, $isFloat, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArgMinCell = copy(child = newChild)
}

object ArgMinCell {

  /** Nearest centroid by squared Euclidean distance over the common
    * prefix of vector and centroid; first index wins ties. Element
    * reads go through ArrayData so both UnsafeArrayData (codegen) and
    * GenericArrayData (interpreted) work.
    */
  def compute(
      v: ArrayData, vFloat: Boolean, centers: Array[Array[Double]]): Int = {
    val vn = v.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val n = math.min(ctr.length, vn)
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val t = x - ctr(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}
