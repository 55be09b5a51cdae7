package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * A `groupBy(key)` over a skewed key distribution sends every row of the
  * hot key to ONE reducer. Salting splits each key into `salts` sub-keys
  * for a parallel partial aggregate, then a cheap final aggregate over
  * `salts` rows per key re-combines. Spark's map-side partial aggregation
  * already does this implicitly per mapper; explicit salting is the tool
  * for when the REDUCE side is the bottleneck (hot key >> one executor's
  * share — the AQE skew-join analog for aggregations; AQE re-plans joins
  * and shuffle partition sizes, not single hot aggregation keys).
  *
  * Only algebraic aggregates survive the split: sums/counts re-add, min/max
  * re-extremize, avg = recombined sum / recombined count. Holistic
  * aggregates (exact median, percentiles) need different machinery
  * (sketches).
  */
object SkewOps {

  /** Salted equivalent of `df.groupBy(keys).agg(sum(e1) as a1, ...,
    * count(*) as n_rows)`: phase 1 groups on (keys, salt = hash(row) mod
    * `salts`), phase 2 re-aggregates the `salts` partial rows per key.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[(String, Column)],
      salts: Int = 16): DataFrame = {
    // Salt must be content-INDEPENDENT: a hash of the row would map every
    // copy of a hot key's identical rows to one bucket. The salt never
    // reaches the result (phase 2 re-combines all partials per key), so a
    // nondeterministic row number is safe — only the partial grouping
    // varies, not the recombined sums/counts.
    val salt = pmod(monotonically_increasing_id(), lit(salts.toLong)).as("__salt")
    val partials = sums.map { case (a, e) => sum(e).as(s"__p_$a") } :+
      count(lit(1)).as("__p_n")
    val finals = sums.map { case (a, _) => sum(col(s"__p_$a")).as(a) } :+
      sum(col("__p_n")).as("n_rows")
    df.groupBy((keys.map(col) :+ salt): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted shuffle join — the hot-key mitigation when the SMALL side is
    * still too big to broadcast (AQE's skew-join splits oversized shuffle
    * partitions, but a single hot KEY whose rows exceed one partition still
    * lands on one reducer; salting splits the key itself).
    *
    * The fact (big, skewed) side gets a random salt in [0, salts); the dim
    * side is replicated `salts` times (explode of a literal range) so every
    * (key, salt) pair finds its dim row. The join is then an equi-join on
    * (key, salt): the hot key's rows spread over `salts` reducers. Cost:
    * dim shuffle volume x salts — the classic trade, worth it only for the
    * skewed keys (a production variant salts ONLY keys above a frequency
    * threshold; here every key is salted to keep the demo oracle-exact).
    *
    * Deterministic for the oracle because the salt never reaches the
    * result — it only routes rows; the joined output is identical to the
    * unsalted join (oracle = the plain SQL join).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val repDim = dim.withColumn(
      "__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact
      .join(repDim, saltedFact(factKey) === repDim(dimKey) &&
        saltedFact("__salt") === repDim("__salt"))
      .drop("__salt")
  }
}
