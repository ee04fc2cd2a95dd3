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

  // ---- chooseFinalLine ladder (round-10 failure: ladder fell through
  // every rung and shipped "queries":{} — no per-query trend at all) ----

  /** Realistic mkRecord: mirrors main's finalRecord field layout and
    * telemetry lengths (lean ~90 chars, full ~130) so the spec exercises
    * the same character budget the driver sees.
    */
  private def mkRecord(fmt: Double => String, prov: String, qs: String,
      lean: Boolean): String = {
    val tele =
      if (lean) """"pass1_total":152.3,"pass2_total":231.8,"pass3_total":78.7,"load_avg":[9.6,11.9],"clean_ref_total":70.8,"clean_ref_nq":155"""
      else """"pass1_total":152.312,"pass2_total":231.841,"pass3_total":78.702,"gc_ms":48231,"codegen_compiles":412,"load_avg":[9.61,11.92],"clean_ref_total":70.8,"clean_ref_nq":155"""
    s"""{"metric":"total","value":462.855,"unit":"sec",$tele,$prov"queries":$qs,"sf":"sf0.1"}"""
  }

  private def syntheticResults(n: Int, time: Int => Double): Seq[(String, Double)] =
    (0 until n).map(i => f"q${i}%03d_some_query_name" -> time(i))

  private def queriesMap(line: String): Map[String, Double] = {
    val qs = line.split("\"queries\":", 2)(1)
    val body = qs.substring(1, qs.indexOf('}'))
    if (body.isEmpty) Map.empty
    else body.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.drop(1).dropRight(1) -> v.toDouble
    }.toMap
  }

  test("round-10 regression: 101 queries all >= 2s still yields per-query entries") {
    // All slower than the 0.2/0.5/1/2 floors (all kept -> overflow) and
    // all below the 5s floor (none kept -> empty): exactly the gap the
    // round-10 single-rung floor fell through. The adaptive rung must
    // keep the slowest K that fit.
    val rs = syntheticResults(101, i => 2.0 + (i % 30) * 0.1)
    val prov = s""""min_pass2_hex":"${"a5" * 13}","min_pass3_hex":"${"5a" * 13}","""
    val line = Bench.chooseFinalLine(rs, mkRecord, """"min_pass":"123",""", prov,
      """"min_pass_wins":[18,34,49],""")
    assert(line.length <= 1900, s"guard: ${line.length}")
    val qs = queriesMap(line)
    assert(qs.nonEmpty, "per-query map must never be empty")
    // absence must read as "< floor": every kept entry >= queries_floor,
    // and kept + omitted covers all queries
    val floor = line.split("\"queries_floor\":", 2)(1).split(",")(0).toDouble
    assert(qs.values.forall(_ >= floor))
    val omitted = line.split("\"queries_omitted\":", 2)(1).split(",|\\}")(0).toInt
    assert(qs.size + omitted === rs.size)
    // the kept set is the SLOWEST K — no faster query displaced a slower one
    val keptMin = qs.values.min
    val droppedMax = rs.filterNot(r => qs.contains(r._1)).map(_._2).max
    assert(droppedMax <= keptMin)
  }

  test("small result sets still take the full-precision rung") {
    val rs = syntheticResults(8, i => 0.5 + i * 0.25)
    val line = Bench.chooseFinalLine(rs, mkRecord, """"min_pass":"11111111",""",
      """"min_pass2_hex":"00","""", """"min_pass_wins":[8,0],""")
    assert(line.contains("\"min_pass\":"))
    assert(queriesMap(line).size === 8)
  }

  test("fixed floor rungs fire before the adaptive rung when they fit") {
    // 101 queries, 6 slow (>= 1s), the rest fast (~0.05s): the 0.2s floor
    // rung fits and must win (queries_floor is one of the fixed rungs).
    val rs = syntheticResults(101, i => if (i < 6) 1.5 + i else 0.05)
    val prov = s""""min_pass2_hex":"${"a5" * 13}","""
    val line = Bench.chooseFinalLine(rs, mkRecord,
      s""""min_pass":"${"1" * 101}",""", prov, """"min_pass_wins":[101,0],""")
    assert(line.length <= 1900)
    val qs = queriesMap(line)
    if (line.contains("\"queries_floor\":")) {
      val floor = line.split("\"queries_floor\":", 2)(1).split(",")(0).toDouble
      assert(Set(0.2, 0.5, 1.0, 2.0, 5.0).contains(floor), s"fixed rung, got $floor")
      assert(qs.size >= 6)
    } else assert(qs.size === 101) // an even earlier (full-map) rung fit
  }

  test("pathological guard still parses (backstop)") {
    val rs = syntheticResults(101, _ => 3.0)
    val line = Bench.chooseFinalLine(rs, mkRecord, """"min_pass":"1",""",
      """"min_pass2_hex":"0","""", """"min_pass_wins":[101],""", guard = 10)
    assert(line.contains("\"queries\":{}"))
  }

  // ---- q_enc full-coverage channel (round-15 verdict #1: the floor
  // rungs omitted 167/187 timings; the base36 string carries them all) ----

  test("encodeCs: fixed width, alphabetical order, zero floor, saturation cap") {
    val rs = Seq("b" -> 1.234, "a" -> 0.0, "c" -> 500.0, "d" -> 0.009)
    val enc = Bench.encodeCs(rs)
    assert(enc === "000" + "03f" + "zzz" + "001")
  }

  test("decodeCs round-trips every min time to centisecond precision") {
    val rng = new scala.util.Random(7)
    val rs = (0 until 187).map(i => f"q$i%03d" -> rng.nextDouble() * 12)
    val dec = Bench.decodeCs(Bench.encodeCs(rs))
    val want = rs.sortBy(_._1).map(_._2)
    assert(dec.length === 187)
    for ((d, w) <- dec.zip(want))
      assert(math.abs(d - w) <= 0.005 + 1e-9, s"$d vs $w")
  }

  test("q_enc rides the final record at the 187-query surface within the guard") {
    val rs = syntheticResults(187, i => 0.1 + (i % 40) * 0.07)
    val qenc =
      s""""q_enc":"${Bench.encodeCs(rs)}","q_enc_doc":"min centisec b36 w3 alpha","""
    // q_enc sits before the provenance field, exactly as main composes it
    def mk(fmt: Double => String, prov: String, qs: String, lean: Boolean) =
      mkRecord(fmt, qenc + prov, qs, lean)
    val prov = s""""min_pass2_hex":"${"a5" * 24}","""
    val line = Bench.chooseFinalLine(rs, mk, s""""min_pass":"${"1" * 187}",""",
      prov, """"min_pass_wins":[187,0],""")
    assert(line.length <= 1900, s"guard: ${line.length}")
    val enc = line.split("\"q_enc\":\"", 2)(1).split("\"")(0)
    assert(enc.length === 187 * 3, "q_enc must cover every query untruncated")
    val dec = Bench.decodeCs(enc)
    val want = rs.sortBy(_._1).map(_._2)
    for ((d, w) <- dec.zip(want)) assert(math.abs(d - w) <= 0.005 + 1e-9)
    // the floor map still rides beside it (human-readable slowest-K view)
    assert(queriesMap(line).nonEmpty)
  }

  test("encodeDs: width-2 decisecond fallback round-trips at 0.1 s; saturates at zz") {
    val rs = Seq("b" -> 1.24, "a" -> 0.0, "c" -> 500.0, "d" -> 0.04)
    assert(Bench.encodeDs(rs) === "00" + "0c" + "zz" + "00")
    val rng = new scala.util.Random(11)
    val many = (0 until 400).map(i => f"q$i%03d" -> rng.nextDouble() * 12)
    val dec = Bench.decodeDs(Bench.encodeDs(many))
    val want = many.sortBy(_._1).map(_._2)
    assert(dec.length === 400)
    for ((d, w) <- dec.zip(want))
      assert(math.abs(d - w) <= 0.05 + 1e-9, s"$d vs $w")
    // the fallback exists because of growth: at 400 queries the w2
    // string (800 chars) still leaves guard room the w3 one (1200)
    // would not
    assert(Bench.encodeDs(many).length === 800)
  }

  test("clean-host reference constants track the live query surface") {
    // CleanRefTotal/CleanRefQueries are hand-maintained measurement
    // constants stamped into every bench record; if the query surface
    // grows or shrinks without re-measuring the clean band, the record
    // would silently carry a stale normalization baseline (ADVICE r12).
    // This pin makes surface drift a compile-visible test failure.
    assert(SparkEntry.queries.size == Bench.CleanRefQueries,
      s"query surface is ${SparkEntry.queries.size} but Bench.CleanRefQueries " +
        s"= ${Bench.CleanRefQueries}: re-measure the clean band on a quiet " +
        s"host and update CleanRefTotal/CleanRefQueries together")
  }
}
