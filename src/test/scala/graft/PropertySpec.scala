package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.movies.Analyzer
import graft.functions.PolyHash
import org.apache.spark.unsafe.types.UTF8String

/** Pure-Scala property tests (no Spark session — fast):
  * stemmer sanity, portable-hash invariants (SURVEY §5.4).
  * (The scalatest/scalacheck bridge artifact isn't in the offline
  * cache, so sampling is a small seeded driver over Gen.)
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach { a =>
        try f(a)
        catch {
          case e: Throwable =>
            throw new AssertionError(s"property failed for input: $a", e)
        }
      }
      seed = seed.next
      i += 1
    }
  }

  private val enWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)

  private val ruWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf("абвгдежзиклмнопрстуфхцчшщыьэюя".toSeq))
      .map(_.mkString)

  private val anyText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '\t', 'ё', 'я', '\'', '.')))
    .map(_.mkString)

  test("porter stemmer: never lengthens, never empties, deterministic " +
       "(NB Porter is famously not idempotent — e.g. a stripped 'e' can " +
       "expose a 'y' that then rewrites to 'i' — so that is not asserted)") {
    forAll(enWord) { w =>
      val s = Analyzer.porterStem(w)
      assert(s.length <= w.length)
      assert(s.nonEmpty)
      assert(Analyzer.porterStem(w) === s)
    }
  }

  test("russian stemmer: never lengthens, never empties (after ё→е)") {
    forAll(ruWord) { w =>
      val s = Analyzer.russianStem(w)
      assert(s.length <= w.length)
      assert(s.nonEmpty)
    }
  }

  test("stemToken routes by script and never throws on mixed text") {
    forAll(anyText) { t =>
      t.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        Analyzer.stemToken(tok) // must not throw
      }
    }
  }

  test("polyhash stays in [0, P) and differs for a 1-char suffix change") {
    forAll(enWord) { w =>
      val h = PolyHash.compute(UTF8String.fromString(w))
      assert(h >= 0 && h < PolyHash.Prime)
      val h2 = PolyHash.compute(UTF8String.fromString(w + "x"))
      assert(h2 === (h * 31 + 'x'.toInt) % PolyHash.Prime)
    }
  }
}
