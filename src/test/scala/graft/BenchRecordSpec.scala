package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench record's min-pass hex-mask encoding (`Bench.hexMask`).
  * The mask is the driver artifact's only per-query provenance once the
  * full digit string no longer fits the tail budget — a silent encoding
  * bug here would corrupt attribution with every oracle still green, so
  * the bit layout (query i = bit i, first query = MSB of the first hex
  * digit, last digit zero-padded) is spec-locked with an independent
  * decoder.
  */
class BenchRecordSpec extends AnyFunSuite {

  /** Independent decode: hex mask → set of query indices with the bit set. */
  private def decode(mask: String): Set[Int] =
    mask.zipWithIndex.flatMap { case (c, g) =>
      val v = Integer.parseInt(c.toString, 16)
      (0 until 4).collect { case i if (v & (8 >> i)) != 0 => g * 4 + i }
    }.toSet

  test("one group, MSB-first bit order") {
    // queries 1 and 3 won in pass 2 → bits 0100 + 0001 = 0101 = 5
    assert(Bench.hexMask("1212", '2') === "5")
    // query 0 wins → MSB of the digit
    assert(Bench.hexMask("2111", '2') === "8")
  }

  test("last digit zero-padded when length is not a multiple of 4") {
    // "2212" → 8+4+1 = d; trailing "2" → bit 0 of its own digit = 8
    assert(Bench.hexMask("22122", '2') === "d8")
    // a lone trailing non-match still emits a digit (zero)
    assert(Bench.hexMask("11111", '2') === "00")
  }

  test("all-pass-1 string encodes to zeros; empty string to empty mask") {
    assert(Bench.hexMask("1111", '2') === "0")
    assert(Bench.hexMask("", '2') === "")
  }

  test("round-trip: decode recovers exactly the matching positions") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = 1 + rng.nextInt(120)
      val s = Array.fill(n)(('1' + rng.nextInt(3)).toChar).mkString
      for (p <- Seq('1', '2', '3')) {
        val want = s.zipWithIndex.collect { case (c, i) if c == p => i }.toSet
        val mask = Bench.hexMask(s, p)
        assert(mask.length === (n + 3) / 4, s"mask length for n=$n")
        assert(decode(mask) === want, s"round-trip for pass $p over $s")
      }
    }
  }

  test("pass-2 and pass-3 masks are disjoint and cover the non-pass-1 set") {
    val s = "1231231223113212"
    val m2 = decode(Bench.hexMask(s, '2'))
    val m3 = decode(Bench.hexMask(s, '3'))
    assert((m2 & m3).isEmpty)
    assert(m2 ++ m3 === s.zipWithIndex.collect { case (c, i) if c != '1' => i }.toSet)
  }
}
