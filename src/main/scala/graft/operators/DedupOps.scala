package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StableHash

/** Document deduplication — the #1 LLM-training-pipeline operation, and the
  * north-star generalization of the reference's sort-unique pipeline (its
  * only dedup is an incidental filename-set check, `Server.java:262-263`).
  *
  * Four strategies, each shuffle-bucketed — NOTHING here is all-pairs:
  *
  *  - [[exactDedup]]: hash-groupBy on a content fingerprint. One shuffle of
  *    (hash, id) pairs; at 100 TB this is the cheapest possible dedup — the
  *    shuffle carries 16-byte keys, not documents.
  *  - [[minhashBandPairs]]: MinHash + LSH banding. Shuffles are keyed on
  *    (band, band-signature) buckets, so candidate generation is
  *    O(sum of bucket sizes squared) — with b bands of r rows, a pair of
  *    docs with shingle-Jaccard s collides in at least one band with
  *    probability 1 - (1 - s^r)^b (here b=4, r=2: s=0.9 → 0.93, s=0.5 →
  *    0.66, s=0.2 → 0.15), while unrelated docs almost never share a
  *    60-bit band signature. The quadratic term only applies per-bucket;
  *    hot buckets (boilerplate shingles) are the skew risk and AQE skew
  *    handling plus a bucket-size cutoff are the standard mitigations.
  *  - [[simhash]]: per-document 16-bit sign-aggregated token-hash sketch;
  *    near-identical docs get identical (or Hamming-close) sketches. One
  *    explode + one groupBy(doc) with map-side partial sums.
  *  - [[jaccardPairs]]: exact n-gram Jaccard via an inverted shingle index
  *    (join on shingle, count intersections) — the verify step downstream
  *    of candidate generation. Scale: shuffle is keyed on shingles;
  *    stop-shingle cutoff (drop shingles in > F docs) bounds bucket fan-out
  *    exactly like the minhash hot-bucket cutoff.
  *
  * The driver's test corpus has no natural duplicates, so the declared
  * queries run these operators over [[plantedCorpus]], which unions in
  * deterministic exact and near copies — both engines (Spark and the DuckDB
  * oracle) construct the identical corpus, so results stay hash-comparable.
  */
object DedupOps {

  /** `documents` plus planted duplicates: an exact copy of every 10th doc
    * (id + 100000) and a near copy (one appended token, id + 200000) of
    * every doc ≡ 5 (mod 10).
    */
  def plantedCorpus(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), col(textCol))
    base
      .unionByName(docs.filter(col(idCol) % 10 === 0)
        .select((col(idCol) + 100000).as(idCol), col(textCol)))
      .unionByName(docs.filter(col(idCol) % 10 === 5)
        .select((col(idCol) + 200000).as(idCol), concat(col(textCol), lit(" graftdup")).as(textCol)))
  }

  /** Exact dedup: group by md5 of the normalized token stream, keep the
    * minimum id as the group representative. Output one row per distinct
    * content: (keep_id, n_copies, fp_md5).
    */
  def exactDedup(corpus: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    corpus
      .select(col(idCol), md5(concat_ws(" ", TextOps.tokens(col(textCol)))).as("fp_md5"))
      .groupBy(col("fp_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("fp_md5"))
      .orderBy(col("keep_id"))

  /** MinHash signature rows: one row per (doc, minhash_i) via explode +
    * min-aggregate — the explode keeps tokenization to once per document
    * (computing each of the `numHashes` mins over a repeated shingle
    * expression would re-tokenize per hash).
    */
  private def minhashSigs(corpus: DataFrame, idCol: String, textCol: String, numHashes: Int): DataFrame = {
    val sh = corpus.select(
      col(idCol),
      explode(array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), 3))).as("sh"))
    val aggs = (0 until numHashes).map(i => min(StableHash.seeded(col("sh"), i)).as(s"s$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: signature of `numHashes` min-hashes over
    * distinct word 3-shingles, split into `bands` bands of `numHashes/bands`
    * rows; docs sharing any band signature become a candidate pair. Output:
    * (id_a, id_b, n_shared_bands), id_a < id_b.
    */
  def minhashBandPairs(
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 8,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigs = minhashSigs(corpus, idCol, textCol, numHashes)
    val bandKeys = (0 until bands).map { b =>
      concat_ws(":", lit(b) +: (0 until r).map(j => col(s"s${b * r + j}")): _*)
    }
    val bandRows = sigs.select(col(idCol), explode(array(bandKeys: _*)).as("bkey"))
    bandRows.alias("a")
      .join(bandRows.alias("b"),
        col("a.bkey") === col("b.bkey") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash: per-document `bits`-bit sketch. Each token votes ±1 on every
    * bit of its 60-bit stable hash; the sketch bit is the vote's sign.
    * `keep_id` = min id among docs sharing a sketch — identical-sketch
    * grouping is the dedup step (Hamming-ball grouping would add banded
    * joins over bit slices, same LSH shape as [[minhashBandPairs]]).
    */
  def simhash(corpus: DataFrame, idCol: String = "doc_id", textCol: String = "text", bits: Int = 16): DataFrame = {
    val tok = corpus
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col(idCol), StableHash.hash60(col("tok")).as("h"))
    val votes = (0 until bits).map(k => sum(expr(s"(shiftright(h, $k) & 1) * 2 - 1")).as(s"b$k"))
    val sketch = (0 until bits)
      .map(k => when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce(_ + _)
    tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), sketch.as("simhash"))
      .withColumn("keep_id", min(col(idCol)).over(Window.partitionBy(col("simhash"))))
      .orderBy(col(idCol))
  }

  /** Exact n-gram (word 3-shingle) Jaccard over an inverted index: explode
    * distinct shingles, self-join on the shingle, count intersections, and
    * emit pairs with similarity ≥ `thresholdBp` basis points. Never
    * all-pairs: only docs sharing ≥1 shingle meet in the join.
    */
  def jaccardPairs(
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      thresholdBp: Int = 8000,
      maxDocFreq: Int = 0): DataFrame = {
    val s = corpus.select(
      col(idCol),
      array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), 3)).as("shs"))
    // no size(shs) > 0 pre-filter: explode already drops empty arrays, and
    // a pushed-down filter would re-evaluate the whole tokenize+shingle
    // tree once more per row at the scan
    val allInv = s.select(col(idCol), size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    // Stop-shingle cutoff: a shingle present in d documents contributes
    // O(d^2) join pairs, so boilerplate shingles dominate cost at scale.
    // Dropping shingles with doc-freq > maxDocFreq bounds the per-bucket
    // fan-out; it UNDERcounts intersections for the affected pairs, which
    // only lowers recall for pairs glued together by boilerplate — the
    // standard trade. 0 = disabled (exact), as the declared query uses.
    val inv =
      if (maxDocFreq <= 0) allInv
      else allInv
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .filter(col("df") <= maxDocFreq).drop("df")
    inv.alias("a")
      .join(inv.alias("b"),
        col("a.sh") === col("b.sh") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .select(
        col("id_a"), col("id_b"),
        TextOps.roundBp(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jac_bp"))
      .filter(col("jac_bp") >= thresholdBp)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The production near-dup pipeline: MinHash-LSH candidate generation
    * ([[minhashBandPairs]]) followed by exact-Jaccard verification of ONLY
    * the candidates. At scale this is the shape that survives: candidate
    * count is governed by the banding curve (not corpus size squared), and
    * the verify join touches 2 rows per candidate pair. Output:
    * (id_a, id_b, jac_bp) for verified pairs ≥ `thresholdBp`.
    */
  def verifiedNearDups(
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 8,
      bands: Int = 4,
      thresholdBp: Int = 8000): DataFrame = {
    val cands = minhashBandPairs(corpus, idCol, textCol, numHashes, bands)
      .select(col("id_a"), col("id_b"))
    val shs = corpus.select(
      col(idCol),
      array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), 3)).as("shs"))
    cands
      .join(shs.select(col(idCol).as("id_a"), col("shs").as("shs_a")), "id_a")
      .join(shs.select(col(idCol).as("id_b"), col("shs").as("shs_b")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        TextOps.roundBp(
          size(array_intersect(col("shs_a"), col("shs_b"))).cast("double") /
            size(array_union(col("shs_a"), col("shs_b"))).cast("double")).as("jac_bp"))
      .filter(col("jac_bp") >= thresholdBp)
      .orderBy(col("id_a"), col("id_b"))
  }
}
