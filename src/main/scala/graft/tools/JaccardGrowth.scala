package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{DedupOps, TextOps}

/** Growth-law probe for [[DedupOps.jaccardPairs]]' pairing volume — the
  * quantitative answer to "does the hot-posting cap flatten the candidate
  * growth past the cap?". For a scale-factor directory it reports the
  * postings-length census of the exact 3-shingle inverted index over
  * [[DedupOps.plantedCorpus]]:
  *
  *  - `n_shingles` distinct shingles, split into singleton (unpairable),
  *    kept (2..cap docs) and dropped (> cap docs) postings;
  *  - `sum_pairs` — Σ |ds|·(|ds|−1)/2 over KEPT postings: exactly the
  *    in-array candidate pairs the operator generates (its cost driver);
  *  - `capped_pairs` — what the sum would be if dropped postings were
  *    truncated to the cap instead (the hypothetical no-drop ceiling);
  *  - `uncapped_pairs` — the sum with no cap at all (what a capless
  *    implementation would pay).
  *
  * Run at 1×/30×/100× replication ([[ScaleGen]]) the three numbers tell
  * the story: `uncapped_pairs` grows super-linearly as hot postings
  * lengthen, while `sum_pairs` flattens toward `n_kept · cap²/2` once the
  * hottest postings cross the cap — the measured form of the scaladoc's
  * boundedness argument.
  *
  * Two replication regimes matter and they stress DIFFERENT axes:
  * [[ScaleGen]] suffixes replica tokens, so replicas' shingles are
  * disjoint — postings MULTIPLY but never lengthen (keyed-data growth;
  * the cap stays idle and pairing volume grows linearly). The `rep=N`
  * mode instead unions N key-shifted copies WITHOUT suffixing —
  * boilerplate growth, where every posting lengthens ×N and an uncapped
  * pairing would grow ×N²; this is the regime the cap exists for.
  *
  * Usage: `runMain graft.tools.JaccardGrowth <sfDir> [maxDocFreq=64] [rep=1]`
  */
object JaccardGrowth {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JaccardGrowth <sfDir> [maxDocFreq] [rep]")
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toInt else DedupOps.DefaultMaxBucket
    val rep = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    val docs = (0 until rep)
      .map(r => docs0.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val corpus = DedupOps.plantedCorpus(docs)
    val lens = corpus
      .select(col("doc_id"),
        explode(array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3))).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("d"))
      .select(col("d")).persist()
    val row = lens.agg(
      count(lit(1)).as("n_shingles"),
      sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_singleton"),
      sum(when(col("d") > 1 && col("d") <= cap, 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("d") > cap, 1L).otherwise(0L)).as("n_dropped"),
      max(col("d")).as("max_posting"),
      sum(when(col("d") > 1 && col("d") <= cap, expr("(d * (d - 1)) div 2"))
        .otherwise(0L)).as("sum_pairs"),
      sum(when(col("d") > 1,
        expr(s"(least(d, $cap) * (least(d, $cap) - 1)) div 2"))
        .otherwise(0L)).as("capped_pairs"),
      sum(when(col("d") > 1, expr("(d * (d - 1)) div 2"))
        .otherwise(0L)).as("uncapped_pairs")).head()
    lens.unpersist(blocking = false)
    println(s"""{"dir":"$dir","cap":$cap,"n_shingles":${row.getLong(0)},""" +
      s""""n_singleton":${row.getLong(1)},"n_kept":${row.getLong(2)},""" +
      s""""n_dropped":${row.getLong(3)},"max_posting":${row.getLong(4)},""" +
      s""""sum_pairs":${row.getLong(5)},"capped_pairs":${row.getLong(6)},""" +
      s""""uncapped_pairs":${row.getLong(7)}}""")
    spark.stop()
  }
}
