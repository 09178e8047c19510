package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for the round-3 scalar kernels — pure JVM functions,
  * so these run at full ScalaCheck volume (no Spark jobs).
  */
object Round3Props extends Properties("Round3Functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200).withWorkers(1)

  // strings biased toward the interesting cases: ASCII runs, composed
  // and decomposed accents, Hangul syllables and Jamo, combining marks
  private val charGen: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", ".", ","),
    2 -> Gen.oneOf("é", "ü", "ñ", "ạ", "ώ"),
    1 -> Gen.oneOf("é", "ậ", "가", "한", "ﬁ"))
  private val strGen: Gen[String] =
    Gen.listOf(charGen).map(_.mkString)

  private def nfc(s: String): String =
    UnicodeNorm.nfc(UTF8String.fromString(s)).toString
  private def strip(s: String): String =
    UnicodeNorm.stripAccents(UTF8String.fromString(s)).toString

  property("nfc is idempotent and length-nonincreasing") =
    forAll(strGen) { s =>
      val once = nfc(s)
      nfc(once) == once && once.length <= s.length
    }

  property("nfc matches java.text.Normalizer directly") =
    forAll(strGen) { s =>
      nfc(s) == java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC)
    }

  property("stripAccents is idempotent and leaves no combining marks") =
    forAll(strGen) { s =>
      val once = strip(s)
      strip(once) == once &&
        once.codePoints().toArray.forall(cp =>
          Character.getType(cp) != Character.NON_SPACING_MARK)
    }

  property("stripAccents is canonical-form independent") =
    forAll(strGen) { s =>
      // composed and decomposed spellings of the same text strip to the
      // same bytes — the property that makes it a safe dedup/join key
      strip(nfc(s)) == strip(java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFD))
    }

  private val modGen: Gen[Long] = Gen.chooseNum(0L, MulMod61.P - 1)

  property("Affine61 constants: affine matches BigInt arithmetic") =
    forAll(modGen) { x =>
      val got = MulMod61.affine(Affine61.mixA, Affine61.mixB, x)
      got == ((BigInt(Affine61.mixA) * x + Affine61.mixB) %
        MulMod61.P).toLong && got >= 0 && got < MulMod61.P
    }

  property("affine is injective (a invertible mod p)") =
    forAll(modGen, modGen) { (x, y) =>
      x == y || MulMod61.affine(Affine61.mixA, Affine61.mixB, x) !=
        MulMod61.affine(Affine61.mixA, Affine61.mixB, y)
    }

  property("MathLn kernel = Math.log everywhere") =
    forAll(Gen.chooseNum(1e-12, 1e12)) { x =>
      MathLn(org.apache.spark.sql.catalyst.expressions.Literal(x))
        .eval(null).asInstanceOf[Double] == Math.log(x)
    }
}
