package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCHEMA-DRIFT detection over dynamic JSON payloads — the
  * operational sibling of the batch key census (`cdc_key_inventory` /
  * `cdc_type_census`): the reference's documents are arbitrary JSON
  * (schema-on-read, SURVEY §1.2), so the first sign a producer changed its
  * payload contract is a KEY nobody has seen before. A consumer wants that
  * as an ALERT the moment it lands, not as a diff between two offline
  * census runs.
  *
  * Spark-first decomposition: the JSON walk runs OUTSIDE the state handler
  * as a codegen'd projection (`json_object_keys` + explode — the same
  * kernel the batch census uses), so the stateful stage sees narrow
  * (group, key, event_id) rows and its state is exactly ONE LONG per
  * distinct (group, key): the first event id that carried it. First-writer
  * -wins per key — the `DedupStream.candidates` shape with a composite
  * key — so an alert fires exactly once per novel key, on the micro-batch
  * where it first appears.
  *
  * Scale: state rows = live vocabulary of (group, key) pairs — bounded by
  * the payload schema, not the stream (a 100 TB/day feed with 40 keys per
  * type holds a few hundred state rows). `stateTtl` turns the census into
  * a sliding one for unbounded group spaces: an expired key re-alerts on
  * next sight — the deliberate trade (bounded state) the dedup stages'
  * TTL makes, documented there.
  *
  * `SchemaDriftSpec` pins replay parity: on an id-ordered replay the
  * alert set equals the batch first-seen query (`cdc_key_first_seen`)
  * row-for-row, and a key alerts exactly once across micro-batches.
  */
object SchemaDrift {

  case class KeyRow(group: String, key: String, event_id: Long)
  case class KeyAlert(group: String, key: String, first_event_id: Long)

  /** Codegen'd key explosion for a (group, event_id, doc) frame — doc a
    * JSON object column. Pure narrow stage; the only shuffle in the
    * operator is the keyed-state exchange after it.
    */
  def keyRows(df: DataFrame): Dataset[KeyRow] = {
    import df.sparkSession.implicits._
    df.select(col("group"),
        explode(json_object_keys(col("doc"))).as("key"),
        col("event_id"))
      .as[KeyRow]
  }

  /** TYPE-drift rows — the second drift mode: a producer keeping the key
    * but CHANGING ITS VALUE TYPE (the "amount" that was a number and is
    * suddenly a string — silent downstream cast poison). Same Variant
    * walk as the batch type census (`cdc_type_census`): one lateral
    * `variant_explode` per doc, the value's Variant schema folded to the
    * six JSON type labels, and the composite `key:vtype` fed through the
    * SAME first-sight state as [[keyRows]] — a novel (key, type) PAIR
    * alerts, so both a brand-new key and a type flip on an old key
    * surface as one alert each. State stays bounded by the payload's
    * (key × type) vocabulary.
    */
  def typeRows(df: DataFrame): Dataset[KeyRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    val st = schema_of_variant(col("value"))
    val label = when(st.startsWith("OBJECT"), "object")
      .when(st.startsWith("ARRAY"), "array")
      .when(st === "VOID", "null")
      .when(st === "STRING", "string")
      .when(st === "BOOLEAN", "bool")
      .otherwise("number") // BIGINT / DECIMAL(p,s) / DOUBLE
    df.select(col("group"), col("event_id"), col("doc"))
      .lateralJoin(spark.tvf.variant_explode(parse_json(col("doc").outer())))
      .select(col("group"),
        concat(col("key"), lit(":"), label).as("key"),
        col("event_id"))
      .as[KeyRow]
  }

  /** First-sight alerts: one [[KeyAlert]] per (group, key) lifetime (or
    * per TTL window), carrying the smallest event id of the micro-batch
    * that introduced it — on id-ordered replay, the global first id.
    */
  def alerts(rows: Dataset[KeyRow],
             stateTtl: Option[String] = None): Dataset[KeyAlert] = {
    import rows.sparkSession.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    rows.groupByKey(r => (r.group, r.key))
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (gk: (String, String), rs: Iterator[KeyRow], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            // known key: consume silently; TTL re-arms so a key stays
            // "known" as long as it keeps appearing within the window
            stateTtl.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else {
            val first = rs.map(_.event_id).min
            state.update(first)
            stateTtl.foreach(state.setTimeoutDuration)
            Iterator.single(KeyAlert(gk._1, gk._2, first))
          }
      }
  }
}
