package graft.tools

import org.apache.spark.sql.SparkSession

/** Executed-plan inspector for declared queries — the round-audit loop's
  * "is there a duplicate scan / missed exchange reuse here?" question,
  * answered mechanically instead of by eyeballing `.explain` dumps.
  *
  * Usage: `PlanProbe <sfDir> <q1,q2,...> [full]`
  *
  * Runs each named query to completion (adaptive plans finalize only on
  * execution — the PlanSpec lesson), then prints one summary line per
  * query: counts of parquet scans, shuffle exchanges, reused exchanges/
  * subqueries, broadcast exchanges, sort-merge joins, and
  * whole-stage-codegen spans, plus the scan file names. `full` dumps the
  * whole executed plan after each summary.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val full = args.length > 2 && args(2) == "full"
    val spark = graft.GraftSession
      .builder(master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
        shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // collect() on the SAME frame, not a write (a write spawns its own
      // QueryExecution, leaving this one un-executed with
      // isFinalPlan=false): adaptive plans only finalize — and reuse
      // only materializes — on execution (the PlanSpec pattern)
      df.collect()
      // an executed AdaptiveSparkPlan prints BOTH the final plan and an
      // "== Initial Plan ==" section — count nodes only in the final part,
      // or every pre-reuse subtree double-counts
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val lines = p.linesIterator.toSeq
      def c(s: String) = lines.count(_.contains(s))
      val scans = lines.filter(_.contains("Scan parquet"))
        .map(_.replaceAll(".*Scan parquet ", "").takeWhile(_ != '[')).groupBy(identity)
        .map { case (k, v) => s"$k×${v.size}" }.toSeq.sorted.mkString(" ")
      println(s"[planprobe] $n scans=${c("Scan parquet")} " +
        s"shuffles=${c("Exchange hashpartitioning") + c("Exchange rangepartitioning")} " +
        s"reusedExch=${c("ReusedExchange")} reusedSubq=${c("ReusedSubquery")} " +
        s"bcast=${c("BroadcastExchange")} smj=${c("SortMergeJoin")} " +
        s"codegenSpans=${c("WholeStageCodegen")} :: $scans")
      if (full) println(p)
    }
    spark.stop()
  }
}
