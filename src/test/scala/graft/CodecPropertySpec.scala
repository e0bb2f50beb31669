package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-11 pure codecs: the ustar round-trip
  * law over arbitrary entries, and the Luhn check-digit laws. Driver-
  * only (no Spark session needed). */
class CodecPropertySpec extends AnyFunSuite {

  private def checkProp(prop: Prop, min: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  test("ustar round-trip law: parse(recordBytes(entries)) == entries, any sizes/names") {
    import graft.sources.Tar
    val genName = for {
      n <- Gen.choose(1, 40)
      cs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('-', '_', '.')))
    } yield cs.mkString
    val genEntry = for {
      name <- genName
      size <- Gen.frequency((3, Gen.choose(0, 100)), (1, Gen.oneOf(511, 512, 513, 1024)))
      bytes <- Gen.listOfN(size, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (name, bytes.toArray)
    val prop = Prop.forAll(Gen.listOfN(5, genEntry).map(_.zipWithIndex
      .map { case ((n, b), i) => (s"$i-$n", b) })) { entries =>
      // names made unique by index prefix; parse from in-memory bytes
      val parsed = graft.sources.Tar.entriesOf("p.tar", Tar.recordBytes(entries))
      parsed.length == entries.length &&
        parsed.zip(entries).forall { case ((_, name, size, payload), (en, eb)) =>
          name == en && size == eb.length && java.util.Arrays.equals(payload, eb)
        }
    }
    checkProp(prop, 60)
  }

  test("Luhn laws: the check digit validates, every other digit fails; separators ignored") {
    import graft.functions.TextFunctions
    val genBody = Gen.listOfN(15, Gen.choose(0, 9)).map(_.mkString)
    val prop = Prop.forAll(genBody) { body =>
      val chk = TextFunctions.luhnCheckDigit(body)
      val valid = TextFunctions.luhnValid(body + chk)
      val othersFail = (0 to 9).filter(_ != chk)
        .forall(d => !TextFunctions.luhnValid(body + d))
      val spaced = body.grouped(4).mkString(" ") + " " + chk
      valid && othersFail && TextFunctions.luhnValid(spaced)
    }
    checkProp(prop, 100)
  }
}
