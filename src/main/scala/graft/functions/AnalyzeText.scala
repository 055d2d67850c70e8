package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text analyzer: lowercase → unicode tokenize →
  * en+ru stopword removal → per-script stemming (Porter en / Snowball
  * ru), identical to movies.Analyzer's Column formulation (which
  * layers a CodegenFallback `filter` HOF, an isin filter over ~115
  * literals, and the per-token StemTokens expression). This fuses the
  * pipeline into whole-stage codegen as one static call; the
  * equivalence is spec-checked over the golden ru/en corpus
  * (AnalyzeNativeSpec).
  *
  * At corpus scale the analyzer runs once per (field × document) in
  * the BM25F stats and scoring passes (Search.withAnalyzed) — it IS
  * the search hot loop, which is why this is an Expression and not a
  * UDF (SURVEY §7.2's escalation rule).
  */
case class AnalyzeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_analyze requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_analyze"

  override protected def nullSafeEval(s: Any): Any =
    AnalyzeText.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.AnalyzeText.compute($s)")

  override protected def withNewChildInternal(
      newChild: Expression): AnalyzeText = copy(child = newChild)
}

object AnalyzeText {

  // Same pattern string as Analyzer.tokenizeCol; compiled once.
  private val TokenBoundary =
    java.util.regex.Pattern.compile("[^\\p{L}\\p{Nd}']+")

  private lazy val Stop: Set[String] =
    graft.movies.Analyzer.EnglishStop ++ graft.movies.Analyzer.RussianStop

  def compute(s: UTF8String): ArrayData = {
    // Locale.ROOT: Spark's Lower is locale-independent (ASCII fast path,
    // root-locale slow path), so a default-locale lowercase here would
    // break the native ≡ Column equivalence on a tr/az-locale JVM
    // ("FILM" → "fılm"). ROOT matches Spark on ASCII and cyrillic both.
    val toks = TokenBoundary.split(
      s.toString.toLowerCase(java.util.Locale.ROOT), -1)
    val out = new java.util.ArrayList[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty && !Stop.contains(t))
        out.add(UTF8String.fromString(graft.movies.Analyzer.stemToken(t)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
