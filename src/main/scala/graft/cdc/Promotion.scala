package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key MATERIALIZATION — the action half of the promotion advisor
  * (`cdc_key_promotion` ranks payload keys by coverage and majority
  * type; this turns the top of that ranking into typed columns). The
  * schema-on-read → schema-on-write bridge: downstream consumers stop
  * paying the per-query JSON walk for the keys everybody reads, while
  * the long tail stays in the payload untouched.
  *
  * Type mapping is the JSON-label narrowing every such bridge makes:
  * `number` promotes as DOUBLE (JSON numbers are doubles in the generic
  * case — a pipeline that KNOWS a key is integral casts after
  * inspection), `string` as STRING, `bool` as BOOLEAN; `object`/`array`
  * keys stay VariantType (structure is not a scalar column). A value
  * whose runtime type disagrees with the promoted type lands NULL in
  * the typed column (Variant cast semantics) — exactly the quarantine
  * behavior the advisor's MAJORITY label implies for the minority rows,
  * and the spec pins it on a planted number/string flip.
  *
  * Shape at 100 TB: one `parse_json` per row + k `variant_get`
  * projections — a pure narrow stage, no shuffle, whole-stage codegen;
  * the promoted frame is what gets archived/bucketed so the walk is
  * paid exactly once.
  */
object Promotion {

  /** Spark cast target for an advisor vtype label. */
  def sparkTypeFor(vtype: String): Option[String] = vtype match {
    case "number" => Some("double")
    case "string" => Some("string")
    case "bool"   => Some("boolean")
    case _        => None // object/array/null: keep Variant
  }

  /** Add one typed column per (key, vtype) advisor row to `docs`
    * (`docCol` = the JSON payload column). Column name = the key.
    */
  def materialize(docs: DataFrame, docCol: String,
                  keys: Seq[(String, String)]): DataFrame = {
    val v: Column = parse_json(col(docCol))
    keys.foldLeft(docs) { case (df, (key, vtype)) =>
      df.withColumn(key, sparkTypeFor(vtype) match {
        case Some(t) => try_variant_get(v, s"$$.$key", t)
        case None    => variant_get(v, s"$$.$key", "variant")
      })
    }
  }
}
