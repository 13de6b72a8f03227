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

  /** Serialized size of the FULL notification text — the splice model of the
    * reference's `length(notification::text)` check (`queries.go:33`, which
    * measures the whole JSON: envelope keys included, not just the documents):
    * the envelope (schema/table/op/id, serialized by the caller, e.g.
    * `to_json(struct(...))`) plus `,"payload":<payload>` (11 separator bytes)
    * and `,"previous":<previous>` (12) for each document PRESENT — a null
    * document contributes nothing, exactly like a JSON field omitted on
    * re-serialization after a drop rung.
    */
  def notifSize(payload: Column, previous: Column,
                envelope: Column = lit("{}")): Column =
    octet_length(envelope) +
      when(payload.isNull, lit(0)).otherwise(octet_length(payload) + lit(11)) +
      when(previous.isNull, lit(0)).otherwise(octet_length(previous) + lit(12))

  /** Applies the two-step ladder. Returns (payload', previous', tier) columns:
    * tier 0 = intact, 1 = previous dropped, 2 = payload dropped (id-only).
    * Drop order — `previous` before `payload` — is load-bearing (reference
    * `queries.go:35-46`), and each rung re-measures the notification WITHOUT
    * the dropped document, exactly like the reference re-serializes between
    * rungs. Envelope bytes always count: at the true 8000-byte line an
    * accounting of payload+previous alone would tier slightly later than the
    * reference.
    */
  def ladder(df: DataFrame, payload: String, previous: String,
             limit: Int = NotifyLimit, envelope: Column = lit("{}")): DataFrame = {
    val p = col(payload)
    val v = col(previous)
    val fullSize = notifSize(p, v, envelope)
    val noPrevSize = notifSize(p, lit(null).cast("string"), envelope)
    val tier = when(fullSize < limit, 0)
      .when(noPrevSize < limit, 1)
      .otherwise(2)
    df.withColumn("tier", tier)
      .withColumn(payload, when(col("tier") === 2, lit(null: String)).otherwise(p))
      .withColumn(previous, when(col("tier") >= 1, lit(null: String)).otherwise(v))
  }
}
