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

  /** A payload is parseable when try_parse_json yields a non-null variant
    * (from_json is PERMISSIVE — it returns a struct of nulls for malformed
    * input, not null). Null payloads are NOT dead letters (the reference's
    * id-only tiered events are legitimate — `queries.go:41-46`).
    */
  def isParseable(jsonCol: Column, schema: StructType): Column =
    jsonCol.isNull || try_parse_json(jsonCol).isNotNull

  /** @return (good rows, dead-lettered rows with a `reason` column) */
  def split(df: DataFrame, jsonCol: String, schema: StructType): (DataFrame, DataFrame) = {
    val ok = isParseable(col(jsonCol), schema)
    val good = df.filter(ok)
    val dead = df.filter(!ok)
      .withColumn("reason", concat(lit(s"unparseable $jsonCol: "), col(jsonCol)))
    (good, dead)
  }
}
