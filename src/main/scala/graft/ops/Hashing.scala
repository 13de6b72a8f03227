package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-neutral deterministic hashing.
  *
  * Both Spark and the DuckDB oracle derive a 60-bit integer from the first 15
  * hex chars of md5 — md5 is identical everywhere, and 15 hex digits < 2^60
  * always fit a signed 64-bit int, so `conv(hex,16,10)` (Spark) and
  * `CAST('0x'||hex AS BIGINT)` (DuckDB) agree exactly. We intentionally do NOT
  * use Spark's `hash`/`xxhash64` (murmur/xxh seeds differ across engines).
  *
  * All codegen'd — no UDF in these paths. Since round 4 the column form is
  * the native [[graft.functions.Hash60]] expression (bit-identical to the
  * `conv(substring(md5(c),1,15),16,10)` chain it replaced, but computed
  * straight off the digest bytes with no hex-string round trip); the SQL
  * oracles keep the original formula, which is exactly the equivalence the
  * driver's hash gate re-proves on every query.
  */
object Hashing {

  /** 60-bit non-negative hash of a string column (native expression;
    * value identical to `conv(substring(md5(c), 1, 15), 16, 10)`).
    */
  def h60(c: Column): Column =
    graft.functions.Hash60Kernel.h60(c)

  /** Seeded family: h60 of "<seed>:<value>" — the seeded permutations for
    * MinHash / hyperplane components for LSH.
    */
  def h60(seed: Int, c: Column): Column =
    h60(concat_ws(":", lit(seed.toString), c))

  /** Prime modulus for the universal-hash permutation family (< 2^30, so
    * (P-1)*(P-1)+(P-1) stays well inside a signed 64-bit int — no overflow in
    * either Spark or DuckDB integer math).
    */
  val P: Long = 1073741789L

  /** Driver-side md5-derived constant in [1, P-1] — used to materialize the
    * permutation family (a_j, b_j) deterministically so a SQL oracle can
    * inline the identical constants.
    */
  def constant(tag: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tag.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % (P - 1) + 1
  }

  /** MinHash permutation family: h_j(x) = (x * a_j + b_j) mod P over a base
    * hash already reduced mod P. One md5 per value total, instead of one per
    * (value, permutation).
    */
  def permutations(n: Int): Seq[(Long, Long)] =
    (0 until n).map(j => (constant(s"a:$j"), constant(s"b:$j")))

  /** Base hash reduced into the permutation domain. */
  def h60modP(c: Column): Column = h60(c) % P
}
