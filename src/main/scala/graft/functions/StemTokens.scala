package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-token stemmer: array<string> → array<string>, each token
  * stemmed by script (Porter en / Snowball ru — movies.Analyzer's
  * `stemToken`). This is the element-wise stage of the analyzer kept as
  * a SEPARATE expression so the layered referee formulation
  * (tokenize HOF → stopword isin → stem) runs entirely inside codegen
  * too — it replaces the last scalar UDF in the engine
  * (Analyzer.scala's former `stemUdf`), removing its per-row
  * Seq[String] ser/de while preserving the referee's independence from
  * the fused [[AnalyzeText]] (the layering around the shared stem
  * kernel is what the differential spec exercises).
  */
case class StemTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_stem_tokens requires ARRAY<STRING>, got ${other.sql}")
    }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_stem_tokens"

  override protected def nullSafeEval(input: Any): Any =
    StemTokens.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StemTokens.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): StemTokens = copy(child = newChild)
}

object StemTokens {

  /** Static kernel shared by interpreted eval and generated code. Null
    * elements pass through unchanged.
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = UTF8String.fromString(
          graft.movies.Analyzer.stemToken(arr.getUTF8String(i).toString))
      i += 1
    }
    new GenericArrayData(out)
  }
}
