package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Normalizes the driver `events` table into the reference's CDC event model
  * (reference `pqstream.proto:26-47`): envelope `(op, id)` + `payload` +
  * reconstructed `previous` OLD-row image.
  *
  * The reference obtains `previous` from the Postgres trigger's OLD record
  * (reference `queries.go:22-24`); over an ordered event log the equivalent is
  * a per-key `lag()` window — shuffle-partitioned by the key, so at 100 TB the
  * state for one key never leaves one task.
  */
object EventLog {

  /** event_type -> Operation enum analog (reference `pqstream.proto:18-24`).
    * TRUNCATE completes the proto's op domain: the reference declares it but
    * never produces it — its trigger only fires on INSERT/UPDATE/DELETE
    * (`queries.go:58-60`) — and the testdata has no truncate events either,
    * so the branch is dormant there exactly as in the reference. UNKNOWN=0
    * is the proto's unparseable-op default; here every event_type maps to a
    * defined op (the remaining types are update-shaped), so UNKNOWN is
    * unreachable by construction rather than silently produced.
    */
  val opCol = when(col("event_type") === "signup", "INSERT")
    .when(col("event_type") === "error", "DELETE")
    .when(col("event_type") === "truncate", "TRUNCATE")
    .otherwise("UPDATE")

  private val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** Adds `prev_props` = previous payload image for the same user_id,
    * in (ts, event_id) order — RawEvent.previous (reference
    * `pqstream.proto:33`) reconstructed via lag().
    */
  def withPrev(events: DataFrame): DataFrame =
    events.withColumn("prev_props", lag("props", 1).over(byUser))

  /** Full normalized CDC frame with op + previous image. */
  def normalize(events: DataFrame): DataFrame =
    withPrev(events).withColumn("op", opCol)
}
