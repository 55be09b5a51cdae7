package graft.tools

import graft.GraftSession
import graft.operators.DedupOps

/** Measure the jaccardPairs postings-key trade (raw shingle string vs
  * codegen'd xxhash64) at a chosen scale directory — the round-6 verdict's
  * "revisit at the new scale" item. At sf0.1 the hash LOST (hashing cost >
  * shuffle savings); this records whether shuffle IO dominates yet at 10×.
  *
  * Protocol mirrors graft.Bench: noop-format write so every exchange runs,
  * warm-up pass at sf0.001, two timed passes per variant interleaved
  * (A B A B) so neither variant systematically benefits from a warmer JVM,
  * per-variant min.
  *
  * Usage: `runMain graft.tools.HashTradeCheck [dataDir] [outFile]`.
  */
object HashTradeCheck {

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale10"
    val out = if (args.length > 1) args(1) else "HASH_trade.txt"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(dataDir: String, hashed: Boolean): Double = {
      val docs = spark.read.parquet(s"$dataDir/documents.parquet")
      val t0 = System.nanoTime()
      DedupOps.jaccardPairs(docs,
        maxDocFreq = DedupOps.DefaultMaxBucket, hashPostingsKey = hashed)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    Seq(false, true).foreach(run("/root/testdata/sf0.001", _)) // warm-up
    val times = (1 to 2).flatMap(_ =>
      Seq("string" -> run(dir, false), "xxhash64" -> run(dir, true)))
    val best = times.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val verdict =
      if (best("xxhash64") < best("string") * 0.95) "xxhash64 WINS"
      else if (best("string") < best("xxhash64") * 0.95) "string key WINS"
      else "TIE (within 5%)"
    val report =
      s"""jaccardPairs postings-key trade @ $dir
         |passes (interleaved): ${times.map { case (k, v) => f"$k=$v%.2f" }.mkString(", ")}
         |min string=${f"${best("string")}%.2f"}s  min xxhash64=${f"${best("xxhash64")}%.2f"}s
         |$verdict
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out), report.getBytes("UTF-8"))
    println(report)
    spark.stop()
  }
}
