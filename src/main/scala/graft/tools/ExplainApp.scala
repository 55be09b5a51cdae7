package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dev utility: print the formatted plan of a declared query.
  * `runMain graft.tools.ExplainApp <sfDir> <queryName>`.
  */
object ExplainApp {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder().getOrCreate()
    println(graft.SparkEntry.queries(args(1))(spark, args(0))
      .queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
