package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fallback row lookup — the reference's point enrichment for tiered-out
  * events (reference `server.go:194-212, 243-248`): when an event arrives with
  * `payload == nil && id != ""`, re-fetch the full row from the base table by
  * id and splice it in.
  *
  * Scale shape: the reference issues a point SELECT *only* for starved events,
  * so the Spark plan must too — filter the starved slice out first
  * (`payload IS NULL AND id IS NOT NULL`, the exact guard of
  * `server.go:243-248`), equi-join ONLY that slice against the base table, and
  * union the intact rows back untouched. The base table is fact-sized in
  * general (it is the table being captured), so it is NOT broadcast by
  * default: a shuffle join on the id key scales with the starved slice, which
  * tiering keeps small. Pass `broadcastBase = true` only when the base is a
  * genuine dimension table.
  *
  * Known trade: the split + union references the upstream subtree twice, so
  * its narrow work evaluates once per branch (Spark reuses the shuffle
  * exchange, not projections). The alternative — one left join with the
  * starved guard in the join condition — evaluates upstream once but
  * shuffles EVERY event row on the id key; at capture scale the duplicated
  * narrow CPU is far cheaper than shuffling the full fact, which is why the
  * split shape wins. Corollary: `events` must be DETERMINISTIC — a
  * nondeterministic upstream column (rand(), monotonically_increasing_id)
  * could evaluate the guard differently per branch, dropping or duplicating
  * rows; cache/checkpoint such inputs first.
  */
object Fallback {

  /** @param events        frame with columns (id, payload, ...)
    * @param base          base table keyed by `idCol` providing `payloadCol`
    * @param broadcastBase hint the base side as broadcastable — only for
    *                      genuinely dim-sized base tables
    */
  def rehydrate(events: DataFrame, base: DataFrame,
                idCol: String, payloadCol: String,
                broadcastBase: Boolean = false): DataFrame = {
    val outCols = events.columns.map(col).toSeq
    val starvedGuard = col(payloadCol).isNull && col(idCol).isNotNull
    val starved = events.filter(starvedGuard)
    val intact = events.filter(!starvedGuard)
    val lookup = base.select(col(idCol), col(payloadCol).as("__base_payload"))
    val rehydrated = starved
      .join(if (broadcastBase) broadcast(lookup) else lookup, Seq(idCol), "left")
      .withColumn(payloadCol, col("__base_payload"))
      .select(outCols: _*)
    intact.unionByName(rehydrated)
  }
}
