package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable polynomial hash
  * (TextOps.polyHash): fold(acc*31 + codepoint) mod 1e9+7 over the
  * string's code points.
  *
  * Why an Expression and not the higher-order-function composition:
  * the HOF version (`aggregate(transform(split(s,""), ascii), ...)`)
  * materializes a per-character array per row; this is a single tight
  * loop, stays inside whole-stage codegen (doGenCode emits a static
  * call — no iterator, no boxing), and needs no UDF serialization.
  * Same preference order as SURVEY §7.2: built-ins < Expression < UDF.
  *
  * Semantics match TextOps.polyHash for all BMP strings (ascii() in the
  * HOF version reads code points; so does this loop).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Prime: Long = 1000000007L

  /** Static helper shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Prime
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Function registration: `withExtensions(new GraftExtensions)` at
  * session build, or `GraftFunctions.register(spark)` on a live session.
  * Either way `graft_polyhash` / `graft_cosine_micro` become available
  * to SQL and `expr(...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {
  val polyHashDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_polyhash"),
    new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
    (children: Seq[Expression]) => PolyHash(children.head))

  /** `graft_shingle_hash(text, n)` — n must be an INT literal (it is a
    * structural parameter of the expression, fixed at plan time).
    */
  val shingleHashDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_hash"),
    new ExpressionInfo(classOf[ShingleHash].getName, "graft_shingle_hash"),
    (children: Seq[Expression]) => children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
        ShingleHash(children.head, n)
      case other => throw new IllegalArgumentException(
        s"graft_shingle_hash(text, n): n must be an INT literal, got $other")
    })

  private def intLit(e: Expression, fn: String, arg: String): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an INT literal, got $other")
    }

  /** `graft_srp_bands(vec, nTables, bitsPerTable)` — table/bit counts
    * are structural (plan-time) parameters.
    */
  val srpBandsDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_srp_bands"),
    new ExpressionInfo(classOf[SrpBands].getName, "graft_srp_bands"),
    (children: Seq[Expression]) => SrpBands(children.head,
      intLit(children(1), "graft_srp_bands", "nTables"),
      intLit(children(2), "graft_srp_bands", "bitsPerTable")))

  /** `graft_analyze(text)` — the fused ru/en analyzer. */
  val analyzeDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_analyze"),
    new ExpressionInfo(classOf[AnalyzeText].getName, "graft_analyze"),
    (children: Seq[Expression]) => AnalyzeText(children.head))

  /** `graft_nfc(text)` — Unicode NFC normalization. */
  val nfcDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    (children: Seq[Expression]) => NfcNormalize(children.head))

  /** `graft_stem_tokens(arr)` — per-token en/ru stemming. */
  val stemTokensDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_stem_tokens"),
    new ExpressionInfo(classOf[StemTokens].getName, "graft_stem_tokens"),
    (children: Seq[Expression]) => StemTokens(children.head))

  /** `graft_zinterleave(a, b, bits)` — bit width is structural. */
  val zInterleaveDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_zinterleave"),
    new ExpressionInfo(classOf[ZInterleave].getName, "graft_zinterleave"),
    (children: Seq[Expression]) => ZInterleave(children.head, children(1),
      intLit(children(2), "graft_zinterleave", "bits")))

  /** `graft_simhash32(array<bigint>)` — native SimHash. */
  val simHashDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash32"),
    new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
    (children: Seq[Expression]) => SimHash32(children.head))

  def descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    Seq(polyHashDescriptor, CosineMicro.descriptor, shingleHashDescriptor,
      srpBandsDescriptor, analyzeDescriptor, zInterleaveDescriptor,
      nfcDescriptor, stemTokensDescriptor, simHashDescriptor)

  def register(spark: SparkSession): Unit =
    descriptors.foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}

/** Column-API faces of the native expressions — usable without function
  * registration (the expression plugs straight into the plan).
  */
object GraftColumns {
  import org.apache.spark.sql.{Column, GraftColumnBridge => B}

  def polyHash(c: Column): Column =
    B.column(PolyHash(B.expression(c)))

  def cosineMicro(a: Column, b: Column): Column =
    B.column(CosineMicro(B.expression(a), B.expression(b)))

  def shingleHash(text: Column, n: Int): Column =
    B.column(ShingleHash(B.expression(text), n))

  def srpBands(vec: Column, nTables: Int, bitsPerTable: Int): Column =
    B.column(SrpBands(B.expression(vec), nTables, bitsPerTable))

  def simhash32(tokenHashes: Column): Column =
    B.column(SimHash32(B.expression(tokenHashes)))

  def zInterleave(a: Column, b: Column, bits: Int): Column =
    B.column(ZInterleave(B.expression(a), B.expression(b), bits))

  def analyzeText(text: Column): Column =
    B.column(AnalyzeText(B.expression(text)))

  def nfcNormalize(text: Column): Column =
    B.column(NfcNormalize(B.expression(text)))

  def stemTokens(arr: Column): Column =
    B.column(StemTokens(B.expression(arr)))

  def argMinCell(vec: Column, centers: Array[Array[Double]]): Column =
    B.column(ArgMinCell(B.expression(vec), centers))

  /** Exact BIGINT integral division (SQL `div`). `Column./` is DOUBLE true
    * division; this stays on the integer path at any magnitude, matching
    * DuckDB's `//` — required by the cross-engine determinism contract
    * wherever operands can exceed 2^53.
    */
  def longDiv(a: Column, b: Column): Column =
    B.column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      B.expression(a), B.expression(b)))

  /** Q20 fixed-point binary log of a positive BIGINT: ⌊log2(v)·2^20⌋-ish
    * via the classic normalize-then-square recurrence — the GENERAL form
    * of the A-ES sampler's −log2(u) kernel (CurationOps.weightedSampleAes
    * scaladoc): p = bitlength(v)−1, y normalized to Q30 in [2^30, 2^31),
    * then 20 square steps each emitting one fraction bit; result =
    * p·2^20 + frac. NO transcendentals — pure integer multiply / divide
    * / compare, so any engine replays every bit (the q153 oracle runs
    * the identical recurrence in SQL).
    *
    * Normalization: p ≤ 30 shifts v UP exactly; p > 30 shifts DOWN,
    * truncating below the top 31 bits — deterministic and replayed
    * identically cross-engine (documented precision: ~2^-20 relative,
    * plus sub-top-31-bit truncation for v ≥ 2^31). The variable shift
    * uses a literal power-of-two table + element_at (Spark's shift
    * functions take only literal distances).
    */
  def binLog2Q20(v: Column): Column = {
    import org.apache.spark.sql.functions._
    val q30 = 1073741824L  // 2^30
    val q31 = 2147483648L  // 2^31
    val pows: Array[Long] = Array.tabulate(63)(i => 1L << i)
    val p = (length(bin(v)) - 1).cast("long")
    val y0 = when(p <= 30L, v * element_at(typedLit(pows), (lit(31L) - p).cast("int")))
      .otherwise(longDiv(v, element_at(typedLit(pows), (p - lit(29L)).cast("int"))))
    val stepped = aggregate(
      sequence(lit(1), lit(20)),
      struct(y0.as("y"), lit(0L).as("acc")),
      (s, _) => {
        val y2 = longDiv(s.getField("y") * s.getField("y"), lit(q30))
        when(y2 >= q31,
          struct(longDiv(y2, lit(2L)).as("y"),
            (s.getField("acc") * 2L + 1L).as("acc")))
          .otherwise(
            struct(y2.as("y"), (s.getField("acc") * 2L).as("acc")))
      })
    when(v <= 0L, raise_error(concat(
      lit("binLog2Q20: need v >= 1, got "), v.cast("string"))))
      .otherwise(p * lit(1048576L) + stepped.getField("acc"))
  }
}
