package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sort operators — the reference engine's entire query surface, Spark-first.
  *
  * The reference computes a total-order sort as: chunked scan
  * (`ServerHandler.java:43-52`) → per-chunk in-memory sort
  * (`NodeHandler.java:77`) → multi-round k-way merge (`Server.java:290-405`,
  * `NodeHandler.java:204-290`). On Spark the whole pipeline is one declarative
  * `orderBy`: Catalyst plans `Sort(global=true)` as a range-partitioning
  * exchange (sampled split points) followed by per-partition sort — the
  * TeraSort shape. The merge *tree* disappears: one shuffle round replaces
  * `ceil(log_mergeNumber(numChunks))` merge rounds, and spill-merge inside
  * `UnsafeExternalSorter` does the per-partition k-way merging with a real
  * priority queue (the reference uses an O(k) linear scan per element,
  * `NodeHandler.java:247-257`).
  *
  * Scale: range partitioning keeps every partition independently sorted and
  * lexicographically ordered across partitions, so a 100 TB sort never
  * single-threads; the output is globally ordered as (partition index, row
  * index) without any final merge. Skewed keys are handled by AQE; sampling
  * for range bounds is O(partitions), not O(rows).
  */
object SortOps {

  /** Total-order sort — the reference's `sortFile` (`ServerHandler.java:23-80`).
    * One range-shuffle + per-partition sort; no driver-side merging.
    */
  def totalSort(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.orderBy(keys: _*)

  /** Per-partition sorted runs — the reference's map phase (`sortChunk`,
    * `NodeHandler.java:37-117`). Rows are bucketed by a deterministic run id
    * (the analog of the chunk number) and sorted within each run; no global
    * shuffle ordering is imposed beyond the run id itself.
    *
    * `runId` must be a deterministic expression over the row (NOT
    * `spark_partition_id()`) so results are reproducible and oracle-checkable.
    */
  def sortedRuns(df: DataFrame, runId: Column, keys: Seq[Column]): DataFrame =
    df.withColumn("run_id", runId)
      .repartition(col("run_id"))
      .sortWithinPartitions(col("run_id") +: keys: _*)

  /** TeraSort decomposition: range-partition on the run id, then sort within
    * each partition. Because partitions cover disjoint ascending key ranges,
    * the concatenation of partitions in index order IS the total order — the
    * reference needs `log_k(n)` merge rounds to get there
    * (`Server.java:293-297,400`); this needs zero. This is exactly how
    * Catalyst executes `orderBy`, written out as its two physical halves.
    */
  def rangeSortedRuns(df: DataFrame, runId: Column, keys: Seq[Column]): DataFrame =
    df.withColumn("run_id", runId)
      .repartitionByRange(col("run_id"))
      .sortWithinPartitions(col("run_id") +: keys: _*)

  /** K-way merge of sorted runs — the reference's reduce phase
    * (`mergeSortedChunks`, `NodeHandler.java:204-290`). A merge of sorted runs
    * is exactly a duplicate-preserving sorted union-all, so: union the runs and
    * let the range-shuffle sort re-establish the total order. Spark needs no
    * multi-round merge tree (`Server.java:290-405`): fan-in is bounded by the
    * shuffle, not by an RPC parameter.
    */
  def mergeRuns(runs: Seq[DataFrame], keys: Seq[Column]): DataFrame =
    runs.reduce(_ unionByName _).orderBy(keys: _*)

  /** Top-k: the natural generalization of the reference's full sort. Catalyst
    * plans `TakeOrderedAndProject` — per-partition heap of k then a k-sized
    * driver merge; no full shuffle at any scale.
    */
  def topK(df: DataFrame, k: Int, keys: Seq[Column]): DataFrame =
    df.orderBy(keys: _*).limit(k)

  /** Per-chunk statistics — the reference's job-statistics surface
    * (`Server.java:29-48`, `ServerHandler.java:66-75`) recast over data: row
    * counts per deterministic bucket (the analog of per-chunk task counters).
    * Partial aggregation makes this one light shuffle of `numBuckets` rows per
    * mapper regardless of input size.
    */
  def chunkStats(df: DataFrame, bucket: Column): DataFrame =
    df.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("bucket"))
}
