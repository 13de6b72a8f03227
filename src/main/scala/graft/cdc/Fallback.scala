package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fallback row lookup — the reference's point enrichment for tiered-out
  * events (reference `server.go:194-212, 243-248`): when an event arrives with
  * `payload == nil && id != ""`, re-fetch the full row from the base table by
  * id and splice it in.
  *
  * Spark-first shape: a stream-static LEFT broadcast equi-join against the
  * base table, restricted to the rows that actually need it, followed by
  * `coalesce(payload, base_payload)`. Catalyst pushes the `payload IS NULL`
  * restriction so only the starved rows pay the join; with a broadcast hint
  * the base side never shuffles — exactly the "late materialization" the
  * reference hand-rolls with a per-event SELECT.
  */
object Fallback {

  /** @param events  frame with columns (id, payload, ...)
    * @param base    base table keyed by `idCol` providing `payloadCol`
    */
  def rehydrate(events: DataFrame, base: DataFrame,
                idCol: String, payloadCol: String): DataFrame = {
    val lookup = base.select(col(idCol), col(payloadCol).as("__base_payload"))
    events
      .join(broadcast(lookup), Seq(idCol), "left")
      .withColumn(payloadCol, coalesce(col(payloadCol), col("__base_payload")))
      .drop("__base_payload")
  }
}
