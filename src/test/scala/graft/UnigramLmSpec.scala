package graft

import graft.operators.TextOps

/** [[TextOps.unigramLm]] — hand-computed EM fixpoints under the integer
  * sixteenth-bit log2 cost model, and determinism. Every expected table
  * below was independently derived with the DuckDB mirror of the unrolled
  * EM chain (the q_unigram_lm oracle), so these pins are cross-engine.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(text: String) = Seq(text).toDF("text")

  private def table(text: String, rounds: Int = 2): Seq[(String, Long, Long)] =
    TextOps.unigramLm(corpus(text), rounds = rounds)
      .as[(String, Long, Long)].collect().toSeq

  test("trivial fixpoint: a single repeated word becomes its own sole piece") {
    // round 1: cost(ab)=24 < cost(a)+cost(b)=48, so "ab" wins the argmin;
    // round 2 vocab is {ab} alone, N=cnt=4 -> surprisal 0
    assert(table("ab ab ab ab") == Seq(("ab", 4L, 0L)))
  }

  test("frequent pieces and a rarer whole word coexist in the fixpoint") {
    assert(table("abcd abcd ab ab ab ab ab cd cd cd cd cd") ==
      Seq(("ab", 5L, 20L), ("cd", 5L, 20L), ("abcd", 2L, 40L)))
  }

  test("a word longer than maxPieceLen splits along frequent-piece boundaries") {
    // "abcdef" (6 > maxPieceLen=4 chars) cannot be a piece; the argmin
    // cuts it abcd|ef, folding its mass into the frequent pieces' counts
    assert(table("abcdef abcdef abcdef " +
      "abcd abcd abcd abcd abcd abcd abcd abcd abcd ef ef ef ef ef ef ef ef ef") ==
      Seq(("abcd", 12L, 16L), ("ef", 12L, 16L)))
  }

  test("log costs keep a rare word whole when its chars are no cheaper") {
    // rare's chars (a, e unique to it) are as rare as the word itself, so
    // one 50-sixteenth-bit piece beats four; the LINEAR N div cnt
    // surrogate would have collapsed both words to chars here
    assert(table("word word word word word word word word rare") ==
      Seq(("word", 8L, 2L), ("rare", 1L, 50L)))
  }

  test("deterministic: repeated training yields the identical piece table") {
    val text = "merge sort merge sort partition merge chunk sort sort"
    val a = table(text)
    val b = table(text)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("rounds=1 is a valid (possibly different) fixpoint prefix, also deterministic") {
    val text = "abcd abcd ab ab ab ab ab cd cd cd cd cd"
    val one = table(text, rounds = 1)
    assert(one == table(text, rounds = 1))
    // round-1 M-step already drops never-used seed pieces: only pieces
    // with positive use count remain
    assert(one.forall(_._2 > 0))
  }
}
