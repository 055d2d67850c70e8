package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine-similarity-in-micro-units over two float/double vectors:
  * round(1e6 * dot/(|a||b|)) with the exact same IEEE operation order as
  * SimilarityOps.cosineMicroHof (sequential index-order fold, double
  * arithmetic, away-from-zero half-up rounding) — so results are
  * bit-identical to the HOF version and to the DuckDB oracle.
  *
  * Why native: the HOF fold is CodegenFallback — per-element interpreted
  * lambda dispatch. On an all-pairs near-dup scan that interpretive
  * overhead dominates by ~100×; this expression is a fused primitive
  * loop inside whole-stage codegen.
  */
case class CosineMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_cosine_micro requires ARRAY<FLOAT|DOUBLE> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cosine_micro"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineMicro.compute(
      a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineMicro.compute($a, ${isFloat(left)}, " +
        s"$b, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineMicro =
    copy(left = newLeft, right = newRight)
}

object CosineMicro {

  /** Fold-order cosine micro. Element reads go through ArrayData so both
    * UnsafeArrayData (codegen path) and GenericArrayData work.
    */
  def compute(
      a: ArrayData, aFloat: Boolean,
      b: ArrayData, bFloat: Boolean): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val cos = dot / (math.sqrt(na) * math.sqrt(nb))
    val v = cos * 1000000.0
    // HALF_UP (away from zero) — matches Spark round() and DuckDB round()
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong
  }

  /** Scalar twin of [[compute]] over plain double arrays — the same
    * sequential index-order fold and HALF_UP rounding, for JVM-local
    * consumers (the grouped-MMR per-group greedy fold, which widens
    * float inputs to double exactly before calling). Kept adjacent to
    * [[compute]] so the two loops cannot drift; a spec asserts
    * equality against the expression on shared fixtures.
    */
  def computeD(a: Array[Double], b: Array[Double]): Long = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val cos = dot / (math.sqrt(na) * math.sqrt(nb))
    val v = cos * 1000000.0
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine_micro"),
    new ExpressionInfo(classOf[CosineMicro].getName, "graft_cosine_micro"),
    (children: Seq[Expression]) => CosineMicro(children(0), children(1)))
}
