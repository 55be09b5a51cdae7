package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — the driver's per-round BENCH_r{N}.json source.
  *
  * Executes every declared query with a `noop`-format write (NOT `count()`:
  * Catalyst's `EliminateSorts` removes an `orderBy` under an aggregate, so a
  * count-based harness would skip the very sorts this engine exists to
  * measure — the full physical plan, range shuffle + sort included, only runs
  * when every row is consumed by a sink). A warm-up pass at sf0.001 absorbs
  * JVM/codegen warm-up so the first timed query isn't charged ~7 s of JIT.
  * Failures are never swallowed: a failed query reports `-1` and the error
  * goes to stderr.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(name: String, dir: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Left(e.getClass.getSimpleName)
      }
    }

    // optional comma-separated subset for isolated profiling runs; the
    // driver sets no filter and measures everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Warm-up at the smallest SF: JIT + codegen caches, not data volume.
    names.foreach(execute(_, "/root/testdata/sf0.001"))
    // Two timed passes, per-query MIN: single-pass numbers on a shared box
    // randomly attribute multi-second contention spikes to whichever query
    // was running; the min of two runs is the standard suppression.
    val pass1 = names.map(n => n -> execute(n, sfDir)).toMap
    val pass2 = names.map(n => n -> execute(n, sfDir)).toMap
    val results = names.map { n =>
      n -> ((pass1(n), pass2(n)) match {
        case (Right(a), Right(b)) => Right(math.min(a, b))
        case (Left(e), _) => Left(e)
        case (_, Left(e)) => Left(e)
      })
    }

    val qs = results.map {
      case (k, Right(v)) => s"\"$k\":$v"
      case (k, Left(_)) => s"\"$k\":-1"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(err)) => s"\"$k\":\"$err\"" }
    val total = results.collect { case (_, Right(v)) => v }.sum
    val errJson = if (failed.isEmpty) "" else s""","errors":${failed.mkString("{", ",", "}")}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}"""
    println(json)
    // stdout tails get clipped by log capture once the query map grows past
    // ~70 entries — the full artifact always lands on disk as well.
    //
    // PROTOCOL (the single source of claimed numbers): the on-disk artifact
    // records BOTH raw passes next to the min, plus the run mode — "suite"
    // (every declared query, interference included) vs "subset"
    // (SPARK_GRAFT_BENCH_ONLY, the solo protocol). Any number quoted in a
    // commit message or doc must cite this artifact, mode included; a solo
    // subset number and a suite number are DIFFERENT measurements and the
    // artifact now keeps them distinguishable instead of letting a solo
    // claim silently stand in for the suite result.
    val mode = if (only.isDefined) "subset" else "suite"
    def secOrNull(e: Either[String, Double]): String =
      e.fold(_ => "-1", _.toString)
    val passes = names.map(n =>
      s""""$n":[${secOrNull(pass1(n))},${secOrNull(pass2(n))}]""")
      .mkString("{", ",", "}")
    val fullJson = json.dropRight(1) + s""","mode":"$mode","passes":$passes}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile), fullJson.getBytes("UTF-8"))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
