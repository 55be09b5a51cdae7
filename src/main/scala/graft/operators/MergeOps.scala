package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC / upsert application — the MERGE INTO shape (Delta/Iceberg's "apply
  * changes" path) on plain DataFrames. The reference has no mutation surface
  * at all (its one output is write-once, `ServerHandler.java:79`); this is
  * the operator that turns the engine's batch tables into maintainable ones.
  *
  * Change rows carry an `op` column: `D` deletes the key, `U`/`I` replace
  * or insert the full row (whole-row upsert — the common CDC contract).
  * Semantics: a key present in `changes` is OWNED by the change (base row
  * dropped); non-delete changes contribute their payload. Keys may appear
  * once per batch (the caller dedupes multi-change batches to
  * last-writer-wins first — one `row_number` over (key, change order)).
  *
  * Shape at 100 TB: one LEFT ANTI hash join of base against the (small)
  * change-key set plus a union — both co-partitioned on the key, no
  * windows over base, no driver state. With the change side under the
  * broadcast threshold the anti-join never shuffles base at all —
  * exactly how a nightly CDC batch against a huge table should plan.
  */
object MergeOps {

  def applyChanges(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val dataCols = base.columns
    require(changes.columns.contains("op"), "changes need an op column (D/U/I)")
    val survivors = base.join(changes.select(col(key)), Seq(key), "left_anti")
    val applied = changes.filter(col("op") =!= "D")
      .select(dataCols.map(col): _*)
    survivors.unionByName(applied)
  }

  /** Incremental maintenance of a JOIN view under inserts — the join-view
    * complement of [[EventOps.rollupState]]/[[EventOps.mergeRollupStates]]
    * (which maintain AGGREGATE views). The algebra is the classic delta
    * rule: with inserts ΔA and ΔB,
    *
    *   Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * so a 100 TB materialized join is NEVER recomputed when a day's batch
    * lands: the three delta legs each join a SMALL delta against one side
    * (broadcast when the delta fits, shuffle of the delta only otherwise —
    * the big sides are probed, not reshuffled into each other), and the
    * maintained view is the old view plus the delta rows by append.
    * Insert-only by contract: deletes/updates need multiplicity-counted
    * views (the [[applyChanges]] CDC path handles whole-row upserts on base
    * tables; composing the two is the production pattern).
    *
    * Inputs must share the join column names in `keys` (rename before the
    * call). Equality `viewOf(A∪ΔA, B∪ΔB) == maintain(viewOf(A,B), deltas)`
    * is the IVM contract — oracle-verified by `q_ivm_join` against a
    * from-scratch DuckDB join of the full tables, and spec-pinned for
    * arbitrary splits including empty deltas.
    */
  def deltaJoin(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** Apply [[deltaJoin]]'s delta to the existing materialization: pure
    * append — the view is never scanned, let alone recomputed.
    */
  def maintainJoinView(view: DataFrame, delta: DataFrame): DataFrame =
    view.unionByName(delta)
}
