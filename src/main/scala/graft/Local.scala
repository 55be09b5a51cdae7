package graft

import java.util.Arrays

import org.apache.spark.sql.DataFrame

/** Driver-side re-emission of SMALL final results.
  *
  * Iterative pipelines must persist each round's state (or replay rounds
  * 1..k-1 once per consumer), but a lazy frame handed back to the caller can
  * never be unpersisted — the cache leaks for the session lifetime (at 100 TB
  * that evicts useful cache or OOMs executors). When the RESULT is tiny
  * (top-k, a 1-row census, the argmax rows of an aggregate), the fix is to
  * finish the job eagerly: collect the result — the same O(1)-ish exchange as
  * [[graft.operators.SortOps]]' min/max bound fetch — release every cached
  * input, and hand the caller a driver-local literal frame with the identical
  * schema and row order.
  *
  * Never use this on anything data-sized; callers keep that invariant
  * (every use site is ≤ k rows or 1 row by construction).
  */
object Local {

  /** Collect `df` (must be small) and re-emit it as a local literal frame
    * with the same schema and row order.
    */
  def localized(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(Arrays.asList(rows: _*), df.schema)
  }
}
