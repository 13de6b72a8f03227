package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dead-letter routing for malformed payloads.
  *
  * The reference terminates the whole event loop on one unparseable
  * notification (`server.go:270-272` — handleEvent error kills HandleEvents,
  * then the daemon dies via log.Fatalln). A pipeline at 100 TB cannot die per
  * bad row: we split the frame into (good, dead) on JSON parseability and let
  * the dead letters flow to their own sink with a reason column.
  */
object DeadLetter {

  /** A payload is good when it parses AND carries every top-level field the
    * schema declares (try_parse_json alone would pass well-formed JSON of a
    * completely different shape; from_json can't be used for this — it is
    * PERMISSIVE and returns a struct of nulls, not null). Null payloads are
    * NOT dead letters (the reference's id-only tiered events are legitimate —
    * `queries.go:41-46`).
    */
  def isParseable(jsonCol: Column, schema: StructType): Column = {
    val hasAllKeys = schema.fieldNames
      .map(f => array_contains(json_object_keys(jsonCol), f))
      .reduceOption(_ && _).getOrElse(lit(true))
    // json_object_keys yields NULL for malformed/non-object input; coalesce
    // so the predicate is boolean (a NULL would drop the row from BOTH sides)
    jsonCol.isNull || coalesce(try_parse_json(jsonCol).isNotNull && hasAllKeys, lit(false))
  }

  /** @return (good rows, dead-lettered rows with a `reason` column) */
  def split(df: DataFrame, jsonCol: String, schema: StructType): (DataFrame, DataFrame) = {
    val ok = isParseable(col(jsonCol), schema)
    val good = df.filter(ok)
    val dead = df.filter(!ok)
      .withColumn("reason",
        concat(lit(s"malformed or nonconforming $jsonCol: "), col(jsonCol)))
    (good, dead)
  }
}
