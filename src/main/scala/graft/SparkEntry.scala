package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SortOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` has a matching DuckDB oracle in `oracleSql`; column
  * names and aliases are kept identical on both sides (the driver sorts
  * columns by name before hashing). Every query has a deterministic total
  * output order (ties broken by the table's unique key) or is an
  * order-insensitive aggregate with an explicit ORDER BY.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** lineitem's unique key is (l_orderkey, l_linenumber) — used as tie-break
    * everywhere (FIXTURES.md §3).
    */
  private val liKeys = Seq("l_extendedprice", "l_orderkey", "l_linenumber")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_sort_total")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1/O6/O7 — total-order sort, the reference's entire query surface
    // (`ServerHandler.java:23-80`): one range-shuffle + partition sort.
    "q_sort_total" -> ((s, dir) => {
      SortOps.totalSort(t(s, dir, "lineitem"), liKeys.map(col))
    }),
    // O5 — per-chunk sorted runs (`sortChunk`, `NodeHandler.java:37-117`),
    // TeraSort-decomposed: deterministic run id, range partition, sort within.
    "q_sort_runs" -> ((s, dir) => {
      SortOps.rangeSortedRuns(
        t(s, dir, "lineitem"),
        pmod(col("l_orderkey"), lit(16)).as("run_id"),
        liKeys.map(col))
    }),
    // O6 — k-way merge of sorted runs ≡ duplicate-preserving sorted union-all
    // (`mergeSortedChunks`, `NodeHandler.java:204-290`).
    "q_merge_union" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val runs = (0 until 4).map(i => li.filter(pmod(col("l_orderkey"), lit(4)) === i))
      SortOps.mergeRuns(runs, liKeys.map(col))
    }),
    // O1 generalization — top-k (`TakeOrderedAndProject`: per-partition heap,
    // k-sized driver merge; no full shuffle).
    "q_topk" -> ((s, dir) => {
      SortOps.topK(
        t(s, dir, "lineitem"), 100,
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")))
    }),
    // O13 — per-chunk task statistics recast as per-bucket row counts
    // (`Server.java:29-48`).
    "q_chunk_stats" -> ((s, dir) => {
      SortOps.chunkStats(t(s, dir, "lineitem"), pmod(col("l_orderkey"), lit(16)))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_sort_total" ->
      "SELECT * FROM lineitem ORDER BY l_extendedprice, l_orderkey, l_linenumber",
    "q_sort_runs" ->
      ("SELECT *, l_orderkey % 16 AS run_id FROM lineitem " +
        "ORDER BY run_id, l_extendedprice, l_orderkey, l_linenumber"),
    "q_merge_union" ->
      ("SELECT * FROM (" +
        "SELECT * FROM lineitem WHERE l_orderkey % 4 = 0 UNION ALL " +
        "SELECT * FROM lineitem WHERE l_orderkey % 4 = 1 UNION ALL " +
        "SELECT * FROM lineitem WHERE l_orderkey % 4 = 2 UNION ALL " +
        "SELECT * FROM lineitem WHERE l_orderkey % 4 = 3) " +
        "ORDER BY l_extendedprice, l_orderkey, l_linenumber"),
    "q_topk" ->
      ("SELECT * FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"),
    "q_chunk_stats" ->
      ("SELECT l_orderkey % 16 AS bucket, CAST(count(*) AS BIGINT) AS n_rows " +
        "FROM lineitem GROUP BY bucket ORDER BY bucket"),
  )
}
