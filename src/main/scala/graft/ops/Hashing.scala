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
  * All codegen'd built-ins — no UDF in these paths.
  */
object Hashing {

  /** 60-bit non-negative hash of a string column. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded family: h60 of "<seed>:<value>" — the seeded permutations for
    * MinHash / hyperplane components for LSH.
    */
  def h60(seed: Int, c: Column): Column =
    h60(concat_ws(":", lit(seed.toString), c))
}
