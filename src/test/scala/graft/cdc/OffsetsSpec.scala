package graft.cdc

/** Pos-cache serde roundtrip, mirroring the reference's only engine-logic test
  * (`/root/reference/src/library/binlog/handler_test.go:24-69`): two value
  * sets with asymmetric filename lengths (catches the length-header math),
  * plus a seeded randomized sweep and the corrupt-header zero-value rule. */
class OffsetsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("roundtrip, asymmetric name lengths (handler_test.go shape)") {
    val cases = Seq(
      ("mysql-bin.000001", 120L, 1163L),
      ("bin.9", Long.MaxValue, 0L),
      ("a-very-long-binlog-file-name-with-suffix.000042", 0L, Long.MaxValue),
      ("", 5L, 7L))
    cases.foreach { case (f, p, i) =>
      assert(Offsets.unpackPos(Offsets.packPos(f, p, i)) === ((f, p, i)))
    }
  }

  test("seeded random roundtrip sweep") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val f = scala.util.Random.javaRandomToRandom(rnd.self).alphanumeric.take(rnd.nextInt(60)).mkString
      val p = rnd.nextLong(); val i = rnd.nextLong()
      assert(Offsets.unpackPos(Offsets.packPos(f, p, i)) === ((f, p, i)))
    }
  }

  test("corrupt/short input yields the zero value, like util.go:51-56") {
    assert(Offsets.unpackPos(Array[Byte](1, 2, 3)) === (("", 0L, 0L)))
    val good = Offsets.packPos("f", 1, 2)
    val badLen = good.clone(); badLen(0) = 120.toByte // header longer than payload
    assert(Offsets.unpackPos(badLen) === (("", 0L, 0L)))
  }
}
