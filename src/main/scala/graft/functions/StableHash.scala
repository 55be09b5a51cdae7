package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * The dedup/fingerprint operators need a hash that any SQL engine can
  * reproduce so the driver's DuckDB oracle can verify them bit-for-bit.
  * MD5 is the lowest common denominator: both Spark and DuckDB implement the
  * standard algorithm, so `first 15 hex chars → 60-bit non-negative long` is
  * identical on both sides:
  *
  *   Spark:  conv(substr(md5(x), 1, 15), 16, 10) :: long
  *   DuckDB: ('0x' || substr(md5(x), 1, 15)) :: BIGINT
  *
  * Scale note: md5 is ~5-10x slower than xxhash64. At 100 TB, swap
  * [[hash60]] for `xxhash64(...)` (same fan-out, Spark-only bit pattern) —
  * the operators are parameterized on the hash only through this object, and
  * nothing downstream depends on the bit pattern, only on determinism.
  */
object StableHash {

  /** 60-bit non-negative hash of a string column, reproducible in DuckDB. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL fragment computing the same value as [[hash60]]. */
  def hash60Sql(e: String): String =
    s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** Seeded variant — independent hash families for minhash
    * (h_i(x) = hash60(x + "#" + i)).
    */
  def seeded(c: Column, seed: Int): Column =
    hash60(concat(c, lit(s"#$seed")))

  /** DuckDB SQL fragment matching [[seeded]]. */
  def seededSql(e: String, seed: Int): String =
    hash60Sql(s"$e || '#$seed'")
}
