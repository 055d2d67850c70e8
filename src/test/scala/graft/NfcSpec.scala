package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Unicode NFC normalization: known compositions, idempotence, and the
  * dedup-key property (composed and decomposed spellings collapse to
  * one exact-dedup key after NFC).
  */
class NfcSpec extends SparkTestBase {
  import spark.implicits._

  private val composedE = 0x00e9.toChar.toString      // é (U+00E9)
  private val decomposedE = "e" + 0x0301.toChar       // e + combining acute

  test("NFC composes decomposed sequences to standard codepoints and is " +
       "idempotent; ASCII passes through untouched") {
    val rows = Seq(
      "Caf" + decomposedE,            // -> Café (composed)
      "Caf" + composedE,              // already NFC
      "plain ascii only",
      "A" + 0x0308.toChar + 0x0307.toChar // partial composition case
    ).toDF("t")
    val got = rows.select(
        TextOps.nfcNormalize($"t").as("n"),
        TextOps.nfcNormalize(TextOps.nfcNormalize($"t")).as("nn"),
        length($"t").as("lr"), length(TextOps.nfcNormalize($"t")).as("ln"))
      .as[(String, String, Int, Int)].collect()
    assert(got(0)._1 === "Caf" + composedE)
    assert(got(1)._1 === "Caf" + composedE)
    assert(got(2)._1 === "plain ascii only")
    assert(got(3)._1 === 0x00c4.toChar.toString + 0x0307.toChar) // Ä + dot
    got.foreach { case (n, nn, _, _) => assert(n === nn, "idempotence") }
    assert(got(0)._3 === got(0)._4 + 1, "composition shortens by one")
  }

  test("NFC makes composed and decomposed spellings share one " +
       "exact-dedup key") {
    val docs = Seq(
      (1L, "Caf" + composedE + " menu"),
      (2L, "Caf" + decomposedE + " menu")
    ).toDF("doc_id", "text")
    val rawKeys = docs
      .select(graft.ops.DedupOps.exactKey($"text")).distinct().count()
    val nfcKeys = docs
      .select(graft.ops.DedupOps.exactKey(TextOps.nfcNormalize($"text")))
      .distinct().count()
    assert(rawKeys === 2, "without NFC the spellings look distinct")
    assert(nfcKeys === 1, "after NFC they share a dedup key")
  }
}
