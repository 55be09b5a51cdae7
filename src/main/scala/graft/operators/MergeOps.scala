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
}
