package graft.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.functions.MergePatch
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Field redaction — pqstream's negative projection (reference
  * `redactions.go:12, 33-52`): a config map `schema -> table -> [fields]`;
  * events whose (schema, table) match have the listed fields deleted from
  * `payload` and `previous` before any downstream stage.
  *
  * Scale note: the redaction map is tiny configuration — it is closed over by
  * the expression (equivalent to a broadcast variable), never joined.
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

  // shared: ObjectMapper is heavyweight and readTree is thread-safe — a
  // per-row instance on the redaction hot path would dominate the UDF cost
  private val mapper = new ObjectMapper()

  /** Remove `fields` from a JSON-string payload. Rows are only rewritten when
    * a field is actually present; untouched payloads pass through byte-identical.
    */
  def redactJson(payload: String, fields: Seq[String]): String = {
    if (payload == null) return null
    val node = mapper.readTree(payload)
    if (!node.isObject) return payload
    val obj = node.asInstanceOf[ObjectNode]
    val hit = fields.exists(obj.has)
    if (!hit) payload else {
      fields.foreach(obj.remove)
      MergePatch.render(obj)
    }
  }

  private def redactUdf(fields: Seq[String]) =
    udf((payload: String) => redactJson(payload, fields))

  /** Column form: redact `fields` out of `payload` when `matches` holds
    * (the (schema, table) lookup of reference `redactions.go:38-44`).
    */
  def redact(payload: Column, matches: Column, fields: Seq[String]): Column =
    when(matches, redactUdf(fields)(payload)).otherwise(payload)
}
