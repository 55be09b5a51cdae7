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

  /** JVM-side evaluation of [[hash60]] — the same md5 / first-15-hex /
    * base-16 value computed without a Column, for driver- and
    * executor-side code (the streaming two-level snapshot's supercenter
    * stride) that must agree bit-for-bit with both SQL sides.
    */
  def hash60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Seeded variant — independent hash families for minhash
    * (h_i(x) = hash60(x + "#" + i)). Costs one md5 PER SEED; when a value
    * needs many family members (minhash signatures), prefer one [[hash60]]
    * + [[familyOf]] affine derivations.
    */
  def seeded(c: Column, seed: Int): Column =
    hash60(concat(c, lit(s"#$seed")))

  /** DuckDB SQL fragment matching [[seeded]]. */
  def seededSql(e: String, seed: Int): String =
    hash60Sql(s"$e || '#$seed'")

  /** 2^61 - 1 (Mersenne prime) — the modulus of the affine family. */
  val M61: Long = (1L << 61) - 1

  // fixed odd 31-bit multipliers + offsets < M61; 8 family members
  private val FamA = Array(
    0x4F1BBCDDL, 0x2545F491L, 0x5851F42DL, 0x14057B7FL,
    0x6C078965L, 0x5DEECE67L, 0x41C64E6DL, 0x6AC690C5L)
  private val FamB = Array(
    0x3C6EF35FL, 0x1F123BB5L, 0x27D4EB2FL, 0x165667B1L,
    0x45EBCA6BL, 0x2E1B2139L, 0x61C88647L, 0x32DB0A4BL)
  private val FamC = Array.tabulate(8)(i => 1442695040888963407L + 97531L * i)

  /** i-th member of a 2-universal hash family derived from ONE md5: the
    * 60-bit [[hash60]] value `h` splits into 30-bit halves (lo, hi) and
    * maps to `(A_i*lo + B_i*hi + C_i) mod (2^61-1)`. Every product stays
    * below 2^61 and the sum below 2^63, so the arithmetic is exact in
    * Spark longs AND DuckDB's checked BIGINT — no 128-bit tricks, no
    * overflow, identical values. Derivation is ~free next to md5 — the
    * switch from 8 [[seeded]] md5 calls per shingle to 1 md5 + 8 affine
    * maps measured (sf0.1, local[8], min of 2): q_dedup_minhash
    * 3.72→1.68 s, q_dedup_verified 3.38→1.81 s, q_dedup_clusters
    * 4.83→3.29 s, with the md5-free control q_doc_fingerprints unchanged.
    */
  def familyOf(h: Column, i: Int): Column = {
    val lo = h.bitwiseAND(lit((1L << 30) - 1))
    val hi = shiftright(h, 30)
    (lit(FamA(i)) * lo + lit(FamB(i)) * hi + lit(FamC(i))) % lit(M61)
  }

  /** DuckDB SQL fragment matching [[familyOf]] (`hExpr` must be a plain
    * column/CTE reference — it is spliced twice).
    */
  def familyOfSql(hExpr: String, i: Int): String =
    s"((${FamA(i)} * (($hExpr) & ${(1L << 30) - 1}) + " +
      s"${FamB(i)} * (($hExpr) >> 30) + ${FamC(i)}) % $M61)"
}
