package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for field redaction (reference
  * `redactions.go:33-52`) — replaces the v1 Jackson UDF so the `cdc_pipeline`
  * projection stays inside one whole-stage-codegen span (a UDF splits it, the
  * same defect the merge-patch expression exists to avoid).
  *
  * The field list is compile-time configuration (the decoded redaction map is
  * tiny), so it is part of the expression node, not a child: codegen embeds it
  * as a referenced constant — the per-task equivalent of a broadcast variable.
  *
  * Null payload stays null (unlike merge patch there is no null-means-`{}`
  * rule here: the reference skips events without a payload).
  *
  * Malformed JSON THROWS (ANSI-style), deliberately: for a redaction
  * function, failing open (passthrough) leaks the very fields it exists to
  * drop, and failing closed (null/`{}`) silently loses data. The engine's
  * malformed-row policy is [[graft.cdc.DeadLetter]]: partition bad rows out
  * BEFORE the redaction projection, exactly where the reference would have
  * died on unmarshal (`server.go:219-222` — its whole daemon terminates; we
  * quarantine instead).
  */
case class JsonRedact(child: Expression, fields: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "json_redact"

  @transient private lazy val fieldsArr: Array[String] = fields.toArray

  // StringType ONLY (no NullType): nullSafeCodeGen emits the child's java
  // type into the redactUtf8 call, and a NullType child (java Object) would
  // not compile — cast a null literal to string first if you need one
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"json_redact expects a string payload, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Redact.redactUtf8(input.asInstanceOf[UTF8String], fieldsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarder call, same pattern as JsonMergePatch (never MODULE$ on
    // the forwarder class); the field array rides along as a reference object
    val fieldsRef = ctx.addReferenceObj("redactFields", fieldsArr, "java.lang.String[]")
    val cls = Redact.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.redactUtf8($c, $fieldsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[JsonRedact]] — a companion-less object so scalac emits static
  * forwarders the generated Java can call directly.
  */
object Redact {

  // shared: ObjectMapper is heavyweight and readTree is thread-safe — a
  // per-row instance on the redaction hot path would dominate the cost
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Remove `fields` from a JSON-string payload. Rows are only rewritten when
    * a field is actually present; untouched payloads pass through
    * byte-identical (reference `redactions.go:38-48` mutates in place — the
    * observable contract is "non-matching rows unchanged").
    */
  def redactJson(payload: String, fields: Seq[String]): String = {
    if (payload == null) return null
    val node = mapper.readTree(payload)
    if (!node.isObject) return payload
    val obj = node.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val hit = fields.exists(obj.has)
    if (!hit) payload else {
      fields.foreach(obj.remove)
      MergePatch.render(obj)
    }
  }

  /** Entry point for generated code and nullSafeEval (input known non-null). */
  def redactUtf8(payload: UTF8String, fields: Array[String]): UTF8String = {
    val s = payload.toString
    val out = redactJson(s, scala.collection.immutable.ArraySeq.unsafeWrapArray(fields))
    if (out eq s) payload // no hit: pass the original bytes through untouched
    else UTF8String.fromString(out)
  }
}

object JsonRedactColumn {
  /** Column API over the native expression. */
  def apply(payload: Column, fields: Seq[String]): Column =
    Bridge.column(JsonRedact(Bridge.expression(payload), fields))
}
