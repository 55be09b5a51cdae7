package graft.tools

import org.apache.spark.sql.DataFrame

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
  *
  * The counting logic lives in [[PlanProbe.budget]] so PlanBudgetSpec can
  * PIN the counts for the expensive declared queries — the r14 sweep
  * found three redundant-pipeline shapes (5→3 lineitem scans, a duplicate
  * tokenize pass, 24→18 corpus scans) and the ×100 ReuseExchange failure
  * by running this tool BY HAND; a budget a spec asserts fails in CI the
  * day a renamed column before an exchange or a new pushdown-
  * de-canonicalized consumer regresses the plan, not a round later.
  */
object PlanProbe {

  /** Budget-relevant node counts of ONE executed plan. `scanFiles` maps
    * each scanned parquet file name (e.g. "lineitem.parquet") to how many
    * separate scan nodes read it — the duplicate-pipeline smell.
    */
  final case class Budget(
      scans: Int,
      shuffles: Int,
      reusedExch: Int,
      reusedSubq: Int,
      bcast: Int,
      smj: Int,
      codegenSpans: Int,
      scanFiles: Map[String, Int]) {
    override def toString: String = {
      val files = scanFiles.toSeq.sorted.map { case (k, v) => s"$k×$v" }.mkString(" ")
      s"scans=$scans shuffles=$shuffles reusedExch=$reusedExch " +
        s"reusedSubq=$reusedSubq bcast=$bcast smj=$smj codegenSpans=$codegenSpans :: $files"
    }
  }

  /** Executes `df` (collect — a write spawns its OWN QueryExecution,
    * leaving this one un-executed with isFinalPlan=false; adaptive plans
    * only finalize — and reuse only materializes — on execution, the
    * PlanSpec pattern) and counts nodes in the FINAL adaptive plan. An
    * executed AdaptiveSparkPlan prints BOTH the final plan and an
    * "== Initial Plan ==" section — nodes are counted only in the final
    * part, or every pre-reuse subtree double-counts.
    */
  def budget(df: DataFrame): Budget = {
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val lines = p.linesIterator.toSeq
    def c(s: String) = lines.count(_.contains(s))
    // a ReusedExchange line EMBEDS the reused exchange's description
    // ("ReusedExchange [...], Exchange hashpartitioning(...)"), so counting
    // Exchange/BroadcastExchange substrings over all lines would tally each
    // reuse reference as a real exchange — exclude those lines first
    val real = lines.filterNot(_.contains("ReusedExchange"))
    def cx(s: String) = real.count(_.contains(s))
    val files = lines.filter(_.contains("Scan parquet"))
      .map(_.replaceAll(".*Scan parquet ", "").takeWhile(_ != '['))
      .map(f => f.split('/').lastOption.getOrElse(f))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    Budget(
      scans = c("Scan parquet"),
      shuffles = cx("Exchange hashpartitioning") + cx("Exchange rangepartitioning"),
      reusedExch = c("ReusedExchange"),
      reusedSubq = c("ReusedSubquery"),
      bcast = cx("BroadcastExchange"),
      smj = c("SortMergeJoin"),
      codegenSpans = c("WholeStageCodegen"),
      scanFiles = files)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    // "all" sweeps every declared query — the per-round snapshot artifact
    val names =
      if (args(1) == "all") graft.SparkEntry.queries.keys.toSeq.sorted.toArray
      else args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val full = args.length > 2 && args(2) == "full"
    val spark = graft.GraftSession
      .builder(master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
        shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(s"[planprobe] $n ${budget(df)}")
      if (full) println(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head)
    }
    spark.stop()
  }
}
