package graft.tools

import graft.GraftSession
import graft.sources.TextIntIO

/** CLI mirroring the reference's client (`Client.java:20-34`): submit a
  * "sort this file" job and get back the sorted output path.
  *
  * Usage: SortFileApp <input.txt> <output> [chunkBytes] [--single-file]
  *
  * `chunkBytes` maps the reference's `chunkSize` knob (`Client.java:21`) to
  * `spark.sql.files.maxPartitionBytes`. The reference's `mergeJobs` fan-in
  * knob has no analog: Spark's sort needs exactly one shuffle round, so the
  * merge-tree arity it controls (`Server.java:300`) does not exist here.
  * Default output is TeraSort-style part files (scale path); `--single-file`
  * writes the reference's exact single-file format.
  */
object SortFileApp {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: SortFileApp <input.txt> <output> [chunkBytes] [--single-file]")
      sys.exit(2)
    }
    val Array(in, out) = args.take(2)
    val chunkBytes = args.drop(2).find(_.forall(_.isDigit)).map(_.toLong)
    val single = args.contains("--single-file")
    val builder = GraftSession.builder(appName = "graft-sortfile")
    chunkBytes.foreach(b => builder.config("spark.sql.files.maxPartitionBytes", b.toString))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = TextIntIO.read(spark, in)
    if (single) TextIntIO.writeSingleFile(df, out)
    else TextIntIO.writePartitioned(df, out)
    // job statistics — the reference prints elapsed + task stats
    // (`ServerHandler.java:66-75`); Spark task metrics live in the UI/listeners.
    println(s"Processed File: $out (${(System.nanoTime() - t0) / 1000000} ms elapsed)")
    spark.stop()
  }
}
