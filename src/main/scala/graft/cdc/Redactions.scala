package graft.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.{JsonRedactColumn, Redact}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Field redaction — pqstream's negative projection (reference
  * `redactions.go:12, 33-52`): a config map `schema -> table -> [fields]`;
  * events whose (schema, table) match have the listed fields deleted from
  * `payload` and `previous` before any downstream stage.
  *
  * Scale note: the redaction map is tiny configuration — it is compiled into
  * the expression tree (codegen reference objects, the per-task equivalent of
  * a broadcast variable), never joined. The JSON surgery itself is the native
  * [[graft.functions.JsonRedact]] Catalyst expression, so redaction stays
  * inside the surrounding whole-stage-codegen span (a UDF would split it).
  */
object Redactions {

  type FieldRedactions = Map[String, Map[String, Seq[String]]]

  /** Decode the reference's JSON config format (reference
    * `redactions.go:15-22`, README.md:68-74):
    * `{"public": {"users": ["password", "email"]}}`.
    */
  def decode(json: String): FieldRedactions = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    root.properties().asScala.map { s =>
      s.getKey -> s.getValue.properties().asScala.map { t =>
        t.getKey -> t.getValue.asScala.map(_.asText()).toSeq
      }.toMap
    }.toMap
  }

  /** Remove `fields` from a JSON-string payload (kernel re-export; see
    * [[graft.functions.Redact.redactJson]]).
    */
  def redactJson(payload: String, fields: Seq[String]): String =
    Redact.redactJson(payload, fields)

  /** Column form: redact `fields` out of `payload` when `matches` holds
    * (the (schema, table) lookup of reference `redactions.go:38-44`).
    */
  def redact(payload: Column, matches: Column, fields: Seq[String]): Column =
    when(matches, JsonRedactColumn(payload, fields)).otherwise(payload)

  /** Variant twin of [[redact]] — same conditional application, natively over
    * a VariantType payload column (no JSON text round-trip).
    */
  def redactVariant(payload: Column, matches: Column, fields: Seq[String]): Column =
    when(matches, graft.functions.VariantRedact.variant_redact(payload, fields: _*))
      .otherwise(payload)

  /** Drive redaction from a decoded config map end-to-end (reference
    * `server.go:225` wiring + `redactions.go:38-44` lookup): each
    * (schema, table) entry contributes one branch of a CASE chain testing the
    * envelope columns against the entry's literals and applying its field
    * list. Rows matching no entry pass through byte-identical. Entries are
    * ordered deterministically; in the reference the map keys are unique so
    * at most one branch can match and order is semantics-free.
    */
  def applyMap(payload: Column, schemaCol: Column, tableCol: Column,
               redactions: FieldRedactions): Column = {
    val entries = for {
      (s, tables) <- redactions.toSeq.sortBy(_._1)
      (t, fields) <- tables.toSeq.sortBy(_._1)
    } yield (s, t, fields)
    entries.foldRight(payload) { case ((s, t, fields), acc) =>
      when(schemaCol === lit(s) && tableCol === lit(t),
        JsonRedactColumn(payload, fields)).otherwise(acc)
    }
  }
}
