package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * multilingual-corpus prerequisite: the same text arrives from the web
  * in composed (é) and decomposed (e + U+0301) forms, which break exact
  * dedup keys, join keys, and token matching unless canonicalized.
  * NFC is defined by the Unicode standard, so java.text.Normalizer here
  * and any other engine's NFC (e.g. DuckDB's nfc_normalize — the q78
  * oracle) produce identical codepoint sequences.
  *
  * Expression (not UDF) for the usual reason (SURVEY §7.2): it runs
  * per-row on the scan path ahead of dedup keys, and a static call
  * stays inside whole-stage codegen. ASCII-only strings short-circuit:
  * Normalizer.isNormalized is O(n) with no allocation for the common
  * case (web corpora are majority-ASCII).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcNormalize.compute($s)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
