package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{DedupOps, TextOps}

/** Stage-attributed profile of the [[DedupOps.jaccardPairs]] pipeline — the
  * diagnostic harness behind the 100× scale investigation (the 10× decade
  * measured 1.68×, the 100× decade ~30×; partition-count A/B ruled OUT
  * `initialPartitionNum` as the cause). Times each sub-pipeline separately
  * (shingle explode → postings aggregation → full pair generation) and
  * prints per-stage executor time, spill, and shuffle volumes from the
  * listener bus, so a super-linear decade is attributable to a STAGE, not
  * a query.
  *
  * Usage: `runMain graft.tools.JaccardProfile <sfDir>`
  */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        println(f"[stage ${sc.stageInfo.stageId}%3d] tasks=${sc.stageInfo.numTasks}%4d " +
          f"exec=${m.executorRunTime / 1000.0}%8.1fs " +
          f"spillMem=${m.memoryBytesSpilled / 1e9}%6.2fG " +
          f"spillDisk=${m.diskBytesSpilled / 1e9}%6.2fG " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e9}%6.2fG " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e9}%6.2fG  " +
          sc.stageInfo.name.takeWhile(_ != '\n').take(60))
      }
    })
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = DedupOps.plantedCorpus(docs)
    val s = corpus.select(col("doc_id"),
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("shs"))
    val inv = s.select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    timed("A shingle explode (scan CPU)")(
      inv.write.format("noop").mode("overwrite").save())
    val postings = inv.groupBy(col("sh"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("id"), col("n")))).as("ds"))
    timed("B postings collect_list agg")(
      postings.write.format("noop").mode("overwrite").save())
    timed("C full jaccardPairs")(
      DedupOps.jaccardPairs(corpus, maxDocFreq = DedupOps.DefaultMaxBucket)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
