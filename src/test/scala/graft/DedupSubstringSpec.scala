package graft

import graft.operators.DedupOps

/** [[DedupOps.exactSubstringSpans]] — exact boundaries, maximality, the
  * occurrence cap, and the fixture that motivates the operator: a planted
  * 60-token verbatim splice that [[DedupOps.dupSpanPairs]]' winnowing
  * sampling provably misses (every fingerprint of the run is
  * boilerplate-capped) while the exact-gram path reports it with exact
  * start positions and length.
  */
class DedupSubstringSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // 60 distinct tokens — every 20-gram of the run is unique within it, so
  // the only shared grams between two docs embedding the run are the 41
  // aligned ones and the span coalesces to a single diagonal island.
  private val run: Seq[String] = (1 to 60).map(i => s"r$i")

  private def spans(corpus: org.apache.spark.sql.DataFrame, maxOcc: Int = DedupOps.DefaultMaxBucket) =
    DedupOps.exactSubstringSpans(corpus, maxOcc = maxOcc)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("finds a planted 60-token splice with exact 1-based boundaries") {
    val a = ((1 to 10).map(i => s"ua$i") ++ run ++ (1 to 5).map(i => s"uaz$i")).mkString(" ")
    val b = ((1 to 5).map(i => s"ub$i") ++ run ++ (1 to 3).map(i => s"ubz$i")).mkString(" ")
    // run starts at token 11 of A and token 6 of B; 41 aligned 20-grams
    // coalesce to one maximal span of 41 + 20 - 1 = 60 tokens
    assert(spans(docs((1L, a), (2L, b))) == Seq((1L, 2L, 11L, 6L, 60L)))
  }

  test("the span is maximal, not extended past the splice ends") {
    // shared run flanked by DIFFERENT tokens on each side in each doc: the
    // reported length must be exactly the run, never bleeding into flanks
    val a = (Seq("left1") ++ run ++ Seq("right1")).mkString(" ")
    val b = (Seq("left2") ++ run ++ Seq("right2")).mkString(" ")
    assert(spans(docs((1L, a), (2L, b))) == Seq((1L, 2L, 2L, 2L, 60L)))
  }

  test("winnowing-miss fixture: dupSpanPairs is blind, exactSubstringSpans is exact") {
    // Every 3-shingle of the run is planted verbatim as 65 three-token
    // filler docs. Winnowing on a <4-shingle doc deterministically selects
    // its minimum (only) shingle hash, so each run shingle's fingerprint
    // posting holds 65 filler docs + A + B = 67 > 64 = DefaultMaxBucket and
    // is dropped; A and B share NO surviving fingerprint (their flank
    // shingles are unique, postings of 1). The 20-token grams of the run,
    // by contrast, occur exactly twice corpus-wide (fillers are 3 tokens —
    // no 20-grams) and sail under the occurrence cap.
    val a = ((1 to 10).map(i => s"ua$i") ++ run ++ (1 to 5).map(i => s"uaz$i")).mkString(" ")
    val b = ((1 to 5).map(i => s"ub$i") ++ run ++ (1 to 3).map(i => s"ubz$i")).mkString(" ")
    val fillers = for {
      s <- 0 until 58 // 3-shingles of the 60-token run
      c <- 0 until 65
    } yield (1000L + s * 65 + c, run.slice(s, s + 3).mkString(" "))
    val corpus = docs((fillers :+ (1L -> a) :+ (2L -> b)): _*)

    // winnowing-based span detection finds NOTHING — even at minShared=1
    assert(DedupOps.dupSpanPairs(corpus, minShared = 1).isEmpty)
    // the exact-substring path reports the one true span, boundaries intact
    assert(spans(corpus) == Seq((1L, 2L, 11L, 6L, 60L)))
  }

  test("occurrence cap drops corpus-wide boilerplate grams; uncapped finds them") {
    // the same 25-token block in 70 docs: every gram occurs 70 > 64 times
    val block = (1 to 25).map(i => s"bp$i").mkString(" ")
    val corpus = docs((1L to 70L).map(i => (i, block)): _*)
    assert(spans(corpus).isEmpty)
    // maxOcc <= 0 disables the cap: all 70*69/2 pairs report the full block
    assert(spans(corpus, maxOcc = 0).size == 70 * 69 / 2)
    assert(spans(corpus, maxOcc = 0).forall { case (_, _, pa, pb, len) =>
      pa == 1L && pb == 1L && len == 25L })
  }

  test("cross-document only: a doc repeating its own span pairs with nothing") {
    val text = (run ++ Seq("gap1", "gap2") ++ run).mkString(" ")
    assert(spans(docs((1L, text))).isEmpty)
  }

  test("one span per occurrence: a doc containing the run twice yields two diagonals") {
    val a = run.mkString(" ")
    val b = (run ++ Seq("mid1", "mid2", "mid3") ++ run).mkString(" ")
    val got = spans(docs((1L, a), (2L, b)))
    assert(got == Seq((1L, 2L, 1L, 1L, 60L), (1L, 2L, 1L, 64L, 60L)))
  }

  test("plantedSpliceCorpus: splice for id%10==7 with >=63 tokens, skipped below") {
    val long7 = (1 to 70).map(i => s"w$i").mkString(" ")
    val short17 = (1 to 40).map(i => s"v$i").mkString(" ")
    val got = DedupOps.plantedSpliceCorpus(docs((7L, long7), (17L, short17), (8L, long7)))
      .as[(Long, String)].collect().toMap
    // max id 17 -> step 18, splice family at +4*18 = +72
    assert(got.keySet == Set(7L, 17L, 8L, 79L))
    val expected = ((1 to 10).map(i => s"zqa7x$i") ++
      (4 to 63).map(i => s"w$i") ++ (1 to 5).map(i => s"zqb7x$i")).mkString(" ")
    assert(got(79L) == expected)
  }

  test("declared shape: splice corpus spans include each planted (parent, splice) pair") {
    val base = docs(
      (7L, (1 to 70).map(i => s"p7w$i").mkString(" ")),
      (27L, (1 to 66).map(i => s"p27w$i").mkString(" ")),
      (3L, (1 to 80).map(i => s"p3w$i").mkString(" ")))
    val got = spans(DedupOps.plantedSpliceCorpus(base))
    // splice run = parent tokens 4..63, landing at splice position 11
    // max id 27 -> step 28, splices at id + 4*28 = +112
    assert(got == Seq((7L, 119L, 4L, 11L, 60L), (27L, 139L, 4L, 11L, 60L)))
  }

  test("substringStrike: the splice doc loses exactly the span; the parent keeps everything") {
    val parent = (1 to 70).map(i => s"p7w$i")
    val base = docs((7L, parent.mkString(" ")))
    val got = DedupOps.substringStrike(DedupOps.plantedSpliceCorpus(base))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the parent (lower id) is canonical: nothing struck, text intact
    assert(got(7L) == ((70L, 0L, md5(parent.mkString(" ")))))
    // the splice doc: 10 filler + span(60) + 5 filler; tokens 11..70 struck
    val fill = (1 to 10).map(i => s"zqa7x$i") ++ (1 to 5).map(i => s"zqb7x$i")
    // max id 7 -> step 8, splice at 7 + 4*8 = 39
    assert(got(39L) == ((75L, 60L, md5(fill.mkString(" ")))))
  }

  test("substringStrike: overlapping strikes from two partners merge by position") {
    // doc 30 embeds run tokens 1..40 at pos 1 via partner 10, and run
    // tokens 21..60 at pos 21 via partner 20 — the union strikes 1..60
    val d10 = (run.slice(0, 40) ++ (1 to 20).map(i => s"x$i")).mkString(" ")
    val d20 = ((1 to 20).map(i => s"y$i") ++ run.slice(20, 60)).mkString(" ")
    val d30 = (run ++ (1 to 20).map(i => s"z$i")).mkString(" ")
    val got = DedupOps.substringStrike(docs((10L, d10), (20L, d20), (30L, d30)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 10 is globally canonical; doc 20 loses the exactly-20-token
    // overlap it shares with doc 10 (run tokens 21..40)
    assert(got(10L)._2 == 0L)
    assert(got(20L) == ((60L, 20L)))
    assert(got(30L) == ((80L, 60L)))
  }
}
