package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions entry point: makes the engine's custom functions
  * available to ANY session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the idiomatic way to
  * ship Catalyst extensions in a library (no imperative register() call needed
  * in user code; works from pure-SQL clients like Thrift server too).
  *
  * Only functions live here: the engine deliberately has zero custom
  * optimizer `Rule`s or `SparkStrategy`s to inject (SURVEY §4 — the reference
  * has no plan rewrites to port, and every operator composes from built-ins
  * that Catalyst already optimizes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Arity guard shared by every builder: a wrong-arity SQL call must surface
    * as a clear IllegalArgumentException naming the expected signature, not
    * an IndexOutOfBoundsException from `exprs(1)`.
    */
  private def requireArity(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      n: Int, signature: String): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$signature expects $n argument(s), got ${exprs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("json_merge_patch"),
      new ExpressionInfo(
        classOf[functions.JsonMergePatch].getName,
        null,
        "json_merge_patch",
        "json_merge_patch(curr, prev) - RFC 7386 merge patch transforming curr into prev (reference pqstream.proto:45; null documents mean {})",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity(exprs, 2, "json_merge_patch(curr, prev)")
        functions.JsonMergePatch(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("json_redact"),
      new ExpressionInfo(
        classOf[functions.JsonRedact].getName,
        null,
        "json_redact",
        "json_redact(payload, field, ...) - remove the named fields from a JSON object payload (reference redactions.go:33-52); field names must be string literals",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length < 2) throw new IllegalArgumentException(
          "json_redact requires a payload and at least one field name " +
            s"(got ${exprs.length} argument(s))")
        // fields are configuration, not data: demand foldable string literals
        // so they can compile into the expression (codegen reference objects)
        val fields = exprs.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"json_redact field names must be non-null string literals, got $other")
        }
        functions.JsonRedact(exprs.head, fields)
      }))
    ext.injectFunction((
      FunctionIdentifier("variant_merge_patch"),
      new ExpressionInfo(
        classOf[functions.VariantMergePatchExpr].getName,
        null,
        "variant_merge_patch",
        "variant_merge_patch(curr, prev) - RFC 7386 merge patch computed natively over VARIANT values (no JSON text round-trip); null documents mean {}",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity(exprs, 2, "variant_merge_patch(curr, prev)")
        functions.VariantMergePatchExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("variant_redact"),
      new ExpressionInfo(
        classOf[functions.VariantRedactExpr].getName,
        null,
        "variant_redact",
        "variant_redact(payload, field, ...) - remove the named fields from a VARIANT object natively (reference redactions.go:33-52); field names must be string literals",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length < 2) throw new IllegalArgumentException(
          "variant_redact requires a payload and at least one field name " +
            s"(got ${exprs.length} argument(s))")
        val fields = exprs.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"variant_redact field names must be non-null string literals, got $other")
        }
        functions.VariantRedactExpr(exprs.head, fields)
      }))
    ext.injectFunction((
      FunctionIdentifier("h60"),
      new ExpressionInfo(
        classOf[functions.Hash60].getName,
        null,
        "h60",
        "h60(str) - engine-neutral 60-bit md5 hash (first 15 hex digits of md5 as a non-negative bigint)",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity(exprs, 1, "h60(str)")
        functions.Hash60(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[functions.DoubleDot].getName,
        null,
        "vec_dot",
        "vec_dot(a, b) - dot product of two dense array<double> vectors (null on length mismatch)",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity(exprs, 2, "vec_dot(a, b)")
        functions.DoubleDot(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_bigrams"),
      new ExpressionInfo(
        classOf[functions.WordBigrams].getName,
        null,
        "word_bigrams",
        "word_bigrams(str) - array of space-joined consecutive word pairs (split on single spaces, empties kept)",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity(exprs, 1, "word_bigrams(str)")
        functions.WordBigrams(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(
        classOf[functions.CosineSim].getName,
        null,
        "vec_cosine",
        "vec_cosine(a, b) - cosine similarity of two dense array<double> vectors (null on length mismatch)",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity(exprs, 2, "vec_cosine(a, b)")
        functions.CosineSim(exprs(0), exprs(1))
      }))
  }
}
