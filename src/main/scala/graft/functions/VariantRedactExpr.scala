package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantBuilder, VariantUtil}
import org.apache.spark.unsafe.types.VariantVal

/** Field redaction computed natively over the Variant binary format — the
  * Variant twin of [[JsonRedact]] (reference `redactions.go:33-52`): drops
  * the named top-level fields from an OBJECT value by rebuilding it with
  * `VariantBuilder`, no JSON text anywhere. Non-object values and objects
  * containing none of the fields pass through UNTOUCHED (the same
  * byte-identical-passthrough contract as the string expression). Null
  * payload stays null — the reference skips events without a payload.
  */
object VariantRedact {

  /** Static entry point shared by eval and generated code. */
  def redactVariant(v: VariantVal, fields: Array[String]): VariantVal = {
    val variant = new Variant(v.getValue, v.getMetadata)
    if (variant.getType != VariantUtil.Type.OBJECT) return v
    var hit = false
    var j = 0
    while (j < fields.length && !hit) {
      if (variant.getFieldByKey(fields(j)) != null) hit = true
      j += 1
    }
    if (!hit) return v // byte-identical passthrough on no-match
    val b = new VariantBuilder(false)
    val start = b.getWritePos
    val entries = new java.util.ArrayList[VariantBuilder.FieldEntry]()
    var i = 0
    while (i < variant.objectSize()) {
      val f = variant.getFieldAtIndex(i)
      if (!fields.contains(f.key)) {
        entries.add(new VariantBuilder.FieldEntry(f.key, b.addKey(f.key), b.getWritePos - start))
        b.appendVariant(f.value)
      }
      i += 1
    }
    b.finishWritingObject(start, entries)
    val r = b.result()
    new VariantVal(r.getValue, r.getMetadata)
  }

  /** Column API: `variant_redact(payload_v, "field", ...)`. */
  def variant_redact(payload: Column, fields: String*): Column =
    Bridge.column(VariantRedactExpr(Bridge.expression(payload), fields))
}

case class VariantRedactExpr(child: Expression, fields: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = VariantType
  override def prettyName: String = "variant_redact"

  @transient private lazy val fieldsArr: Array[String] = fields.toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == VariantType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"variant_redact expects a variant payload, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    VariantRedact.redactVariant(input.asInstanceOf[VariantVal], fieldsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fieldsRef = ctx.addReferenceObj("redactFields", fieldsArr, "java.lang.String[]")
    val cls = VariantRedact.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.redactVariant($c, $fieldsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VariantRedactExpr {
  /** SQL registration mirror of GraftExtensions (for ad-hoc sessions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "variant_redact", exprs => {
        val fields = exprs.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"variant_redact field names must be non-null string literals, got $other")
        }
        VariantRedactExpr(exprs.head, fields)
      }, "scala_udf")
}
