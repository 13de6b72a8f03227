package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Payload tiering — the reference's size-guard ladder (reference
  * `queries.go:33-47`): if the serialized notification is >= the limit
  * (8000 bytes for Postgres NOTIFY), first drop `previous`; if still over,
  * drop `payload` too, leaving an id-only event that a downstream fallback
  * lookup re-hydrates (see [[Fallback]]).
  *
  * The ladder is pure per-row projection (no shuffle); `octet_length` over the
  * already-serialized columns keeps it inside whole-stage codegen.
  */
object Tiering {

  /** Reference NOTIFY ceiling (reference `queries.go:33,41`). */
  val NotifyLimit = 8000

  /** Serialized size of the full notification envelope. */
  def notifSize(payload: Column, previous: Column): Column =
    octet_length(concat_ws("", payload, previous))

  /** Applies the two-step ladder. Returns (payload', previous', tier) columns:
    * tier 0 = intact, 1 = previous dropped, 2 = payload dropped (id-only).
    * Drop order — `previous` before `payload` — is load-bearing (reference
    * `queries.go:35-46`).
    */
  def ladder(df: DataFrame, payload: String, previous: String,
             limit: Int = NotifyLimit): DataFrame = {
    val p = col(payload)
    val v = col(previous)
    val fullSize = notifSize(p, v)
    val noPrevSize = octet_length(coalesce(p, lit("")))
    val tier = when(fullSize < limit, 0)
      .when(noPrevSize < limit, 1)
      .otherwise(2)
    df.withColumn("tier", tier)
      .withColumn(payload, when(col("tier") === 2, lit(null: String)).otherwise(p))
      .withColumn(previous, when(col("tier") >= 1, lit(null: String)).otherwise(v))
  }
}
