package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.operators.{EventOps, SortOps}

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

    // --- Relational support ops (SURVEY §2.2: absent in the reference,
    // --- added as the engine's general query surface) -------------------

    // Filter + projection; both reach the parquet scan (PushedFilters /
    // pruned ReadSchema — verified via explain in PlanSpec).
    "q_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    // Hash aggregation with map-side partial agg (TPC-H Q1 shape). Double
    // sums rounded identically on both sides for stable hash compare.
    "q_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // Shuffle join on the fact keys + broadcast of the small dim (nation):
    // the 100 TB shape — never shuffle the small side.
    "q_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_totalprice"))
        .orderBy(col("n_name"), col("o_orderpriority"))
    }),
    // Window functions: top-3 lineitems per supplier by price, fully
    // tie-broken → deterministic.
    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_suppkey"), col("rn"))
    }),
    // Distinct = hash aggregation without aggregates.
    "q_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .dropDuplicates()
        .orderBy(col("l_partkey"), col("l_suppkey"))
    }),

    // --- Time-series / events (north star; EventOps) --------------------

    "q_events_hourly" -> ((s, dir) =>
      EventOps.tumblingAgg(t(s, dir, "events"), "hour")),
    "q_events_sessions" -> ((s, dir) =>
      EventOps.sessionStats(t(s, dir, "events"), gapSeconds = 1800)),
    "q_events_json" -> ((s, dir) =>
      EventOps.jsonFieldStats(t(s, dir, "events"), "k")),
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
    "q_filter_project" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_discount > 0.05 " +
        "ORDER BY l_orderkey, l_linenumber"),
    "q_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base_price, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
        "round(avg(l_discount), 6) AS avg_disc, " +
        "CAST(count(*) AS BIGINT) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
    "q_join" ->
      ("SELECT n_name, o_orderpriority, " +
        "CAST(count(*) AS BIGINT) AS n_orders, " +
        "round(sum(o_totalprice), 2) AS sum_totalprice " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name, o_orderpriority ORDER BY n_name, o_orderpriority"),
    "q_window" ->
      ("SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice FROM (" +
        "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, " +
        "row_number() OVER (PARTITION BY l_suppkey " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn " +
        "FROM lineitem) WHERE rn <= 3 ORDER BY l_suppkey, rn"),
    "q_distinct" ->
      ("SELECT DISTINCT l_partkey, l_suppkey FROM lineitem " +
        "ORDER BY l_partkey, l_suppkey"),
    "q_events_hourly" ->
      ("SELECT date_trunc('hour', ts) AS bucket, event_type, " +
        "CAST(count(*) AS BIGINT) AS n_events, " +
        "round(sum(value), 2) AS sum_value " +
        "FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type"),
    "q_events_sessions" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS us, " +
        "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev " +
        "FROM events), " +
        "s AS (SELECT user_id, CASE WHEN prev IS NULL OR us - prev > 1800000000 " +
        "THEN 1 ELSE 0 END AS is_new FROM e) " +
        "SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, " +
        "CAST(count(*) AS BIGINT) AS n_events " +
        "FROM s GROUP BY user_id ORDER BY user_id"),
    "q_events_json" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        "CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 4) AS avg_k FROM (" +
        "SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k " +
        "FROM events) GROUP BY event_type ORDER BY event_type"),
  )
}
