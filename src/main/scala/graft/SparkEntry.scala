package graft

import graft.cdc.{EventLog, Fallback, Redactions, Tiering}
import graft.functions.MergePatch
import graft.ops.{BloomMembership, Curation, Dedup, Multimodal, Relational, Similarity, Skew, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is an operator demonstration from SURVEY §2 (CDC set =
  * reference fidelity; ops_* = the scale-out analytical set); `oracleSql` holds
  * the DuckDB-equivalent ANSI SQL over the same parquet tables with matching
  * output column names.
  */
object SparkEntry {

  /** Flagship: the reference's whole `handleEvent` path (filter → redact →
    * tier → merge-patch changes → fallback, reference `server.go:214-255`)
    * composed as one declarative plan — see [[cdcPipeline]].
    */
  def entry(spark: SparkSession): DataFrame =
    cdcPipeline(spark, "/root/testdata/sf0.001")

  // ===== CDC operator set (reference fidelity) =====

  private def cdcChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    EventLog.normalize(ev)
      .filter(col("op") === "UPDATE" && col("prev_props").isNotNull)
      .select(
        col("event_id"), col("user_id"), col("props"), col("prev_props"),
        MergePatch.json_merge_patch(col("props"), col("prev_props")).as("changes"))
  }

  /** T1 exercised on NESTED, heterogeneous documents — the reference's model
    * is schema-on-read over arbitrary `protobuf.Struct` payloads
    * (`pqstream.proto:32-33,44-46`), but the flat `{"k":int}` testdata never
    * drives the recursion. Docs are synthesized deterministically from driver
    * columns (the withPlantedPii trick), nine cases keyed on event_id % 9:
    * identical docs (empty patch), top-level scalar change, NESTED-object
    * change (recursion descends, unchanged sibling omitted), key added in new
    * (patch deletes via null, RFC 7386), key removed in new (pre-update value
    * resurfaces), explicit-null vs value (the null-vs-absent edge,
    * SURVEY §7.4 #3), and the ARRAY edges — RFC 7386 treats arrays as atomic
    * values that replace WHOLESALE, never element-merge: array changed
    * (whole prev array in the patch), array identical (empty patch), and
    * scalar-vs-array type change (prev array replaces the scalar). The
    * oracle constructs the expected patch per case from independently
    * hand-derived RFC semantics.
    */
  private def cdcChangesNested(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val base = ev.selectExpr(
      "event_id",
      "CAST(event_id % 9 AS INT) AS m",
      "CAST(event_id % 10 AS STRING) AS a",
      "CAST(user_id % 3 AS STRING) AS x",
      "CAST(user_id % 5 AS STRING) AS y")
    val doc = expr(
      """concat('{"a":', a, ',"meta":{"x":', x, ',"y":', y, '}',
        |  CASE WHEN m = 3 THEN ',"tag":"t"' WHEN m = 5 THEN ',"n":null'
        |       WHEN m = 6 THEN concat(',"arr":[', a, ']')
        |       WHEN m = 7 THEN concat(',"arr":[', a, ',', x, ']')
        |       WHEN m = 8 THEN concat(',"v":', a)
        |       ELSE '' END,
        |  '}')""".stripMargin)
    val prevDoc = expr(
      """CASE
        |  WHEN m = 1 THEN concat('{"a":', CAST(CAST(a AS INT) + 1 AS STRING),
        |    ',"meta":{"x":', x, ',"y":', y, '}}')
        |  WHEN m = 2 THEN concat('{"a":', a, ',"meta":{"x":',
        |    CAST(CAST(x AS INT) + 1 AS STRING), ',"y":', y, '}}')
        |  WHEN m = 4 THEN concat('{"a":', a, ',"meta":{"x":', x, ',"y":', y,
        |    '},"extra":"old"}')
        |  WHEN m = 5 THEN concat('{"a":', a, ',"meta":{"x":', x, ',"y":', y,
        |    '},"n":', y, '}')
        |  WHEN m = 6 THEN concat('{"a":', a, ',"meta":{"x":', x, ',"y":', y,
        |    '},"arr":[', a, ',', x, ']}')
        |  WHEN m = 7 THEN concat('{"a":', a, ',"meta":{"x":', x, ',"y":', y,
        |    '},"arr":[', a, ',', x, ']}')
        |  WHEN m = 8 THEN concat('{"a":', a, ',"meta":{"x":', x, ',"y":', y,
        |    '},"v":[', a, ']}')
        |  ELSE concat('{"a":', a, ',"meta":{"x":', x, ',"y":', y, '}}')
        |END""".stripMargin)
    base
      .withColumn("doc", doc)
      .withColumn("prev_doc", prevDoc)
      .select(col("event_id"), col("doc"), col("prev_doc"),
        MergePatch.json_merge_patch(col("doc"), col("prev_doc")).as("changes"))
  }

  private def cdcPrevImage(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    EventLog.normalize(ev)
      .select(col("event_id"), col("user_id"), col("op"), col("props"), col("prev_props"))
  }

  /** Point-in-time erasure SEMANTICS in batch — the oracle-expressible twin
    * of the streaming state erasure ([[graft.streaming.StateErasure]] /
    * `ErasingPrevImageProcessor`): the erased entity's rows at or below the
    * tombstone cutoff are gone, its first post-cutoff event sees
    * `previous = null` (first-sight), every other user's prev-image chain
    * is untouched, and null-key rows survive (the `<=>` null-proofing the
    * archive erasure also guarantees). Target/cutoff are scalar one-row
    * witnesses broadcast into the filter — no collect.
    */
  private def cdcEraseReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = EventLog.normalize(Tables.load(spark, sfDir, "events"))
      .select(col("event_id"), col("ts"), col("user_id"), col("op"), col("props"))
    val witness = ev.agg(min(col("user_id")).as("tgt"),
      expr("max(event_id) div 2").as("cutoff"))
    val survivors = ev.crossJoin(broadcast(witness))
      .filter(!(col("user_id") <=> col("tgt") && col("event_id") <= col("cutoff")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    survivors.select(col("event_id"), col("user_id"), col("op"),
      lag(col("props"), 1).over(w).as("previous"))
  }

  private def cdcTableFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    // unanchored substring match — Go RE2 MatchString semantics (F1/F2)
    ev.filter(col("event_type").rlike("sign|pur"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
  }

  private def cdcRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val matches = col("event_type") === "purchase"
    ev.select(col("event_id"), col("event_type"),
      Redactions.redact(col("props"), matches, Seq("k")).as("props_redacted"))
  }

  /** P1 driven end-to-end from the decoded reference-format config
    * (reference `cmd/pqsd/main.go:74-83` decode + `redactions.go:38-44`
    * two-level lookup): schema is the constant "public" (the reference
    * watches one pg schema, `queries.go:7`), table analog = event_type.
    * The `other.signup` entry must NOT fire — its schema doesn't match —
    * which pins the lookup's both-levels-must-match semantics.
    */
  private def cdcRedactMap(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val config = """{"public":{"purchase":["k"],"error":["k"]},"other":{"signup":["k"]}}"""
    val redactions = Redactions.decode(config)
    // schema rides as a real column, not a bare literal: lit === lit would
    // log a trivially-true-predicate warning per branch on every run (the
    // attribute folds to the same constant after resolution — same plan)
    ev.withColumn("schema", lit("public"))
      .select(col("event_id"), col("event_type"),
        Redactions.applyMap(col("props"), col("schema"), col("event_type"), redactions)
          .as("props_redacted"))
  }

  /** Tiering demo: synthetic payload/previous sizes that actually cross the
    * ladder's thresholds (the real 8000-byte NOTIFY limit never trips on this
    * data; semantics — drop `previous` first, then `payload` — are identical).
    * Accounting measures the WHOLE notification like `queries.go:33`: the
    * schema/table/id envelope rides along, and the limit (85) is tuned so all
    * three rungs occur under the full-text measure.
    */
  private def cdcTieredFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val withSizes = ev.select(
      col("event_id"),
      expr("repeat(props, int(event_id % 5))").as("payload"),
      expr("repeat(props, int((event_id + 2) % 4))").as("previous"))
    val envelope = to_json(struct(
      lit("public").as("schema"), lit("events").as("table"), col("event_id").as("id")))
    Tiering.ladder(withSizes, "payload", "previous", limit = 85, envelope = envelope)
  }

  private def cdcTiering(spark: SparkSession, sfDir: String): DataFrame =
    cdcTieredFrame(spark, sfDir)
      .select(col("event_id"), col("tier"), col("payload"), col("previous"))

  private def cdcFallbackJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val starved = cdcTieredFrame(spark, sfDir).select(col("event_id"), col("tier"), col("payload"))
    val base = ev.select(col("event_id"), col("props").as("payload"))
    Fallback.rehydrate(starved, base, "event_id", "payload")
      .select(col("event_id"), col("tier"), col("payload"))
  }

  /** T2 JSON decode/encode: from_json the payload into typed columns, then
    * to_json back (reference `server.go:219-222` + sink marshalling).
    */
  private def cdcJsonDecode(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .withColumn("props_norm", to_json(struct(col("k"))))
  }

  /** Spark 4 Variant payload handling — parse_json + variant_get, the native
    * analog of the reference's protobuf.Struct payloads (SURVEY §1.5).
    */
  private def cdcVariantGet(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.select(
      col("event_id"),
      variant_get(parse_json(col("props")), "$.k", "int").as("k"))
  }

  /** Set ops: users who both purchased and hit an error (INTERSECT). */
  private def opsSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.filter(col("event_type") === "purchase").select(col("user_id")).distinct()
      .intersect(ev.filter(col("event_type") === "error").select(col("user_id")).distinct())
  }

  /** EXCEPT ALL — bag (multiset) difference, the set-op semantics
    * `intersect`/`except` can't express: each view "cancels" one click, so a
    * user with 5 clicks and 3 views survives with multiplicity 2. Spark
    * plans this as a signed-count aggregation + replicate (one shuffle on
    * the key, no join); the trailing groupBy collapses the replicated rows
    * to (user, n_excess) so the output is deterministic and
    * multiplicity-preserving.
    */
  private def opsExceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.filter(col("event_type") === "click").select(col("user_id"))
      .exceptAll(ev.filter(col("event_type") === "view").select(col("user_id")))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_excess"))
  }

  /** Per-key JSON value-TYPE census over dynamic payloads — the schema
    * half of schema-on-read (`pqstream.proto:32-33`: payloads are arbitrary
    * `protobuf.Struct` documents; an engine consuming them needs to know,
    * per key, WHICH types actually occur before it can plan typed reads).
    * Complements [[cdcKeyInventory]] (key names) with value types.
    *
    * Type drift is synthesized deterministically from driver columns (same
    * pattern as the key census): key `v` cycles through number / string /
    * bool / object / array / null by `event_id % 6`, mirrored in the oracle.
    * The census uses Spark 4's Variant path — `variant_explode` over
    * `parse_json` yields (key, variant value) pairs without the
    * literal-path restriction of `variant_get`, and `schema_of_variant`
    * names each value's type; labels are normalized to engine-neutral
    * {number,string,bool,object,array,null}. One narrow scan + one
    * partial-agg shuffle of (key, label) pairs — at 100 TB the cost is the
    * per-row variant parse, which is the price schema-on-read always pays
    * exactly once.
    */
  private def cdcTypeCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val k = get_json_object(col("props"), "$.k")
    val m = col("event_id") % 6
    val vJson = when(m === 0, k)
      .when(m === 1, concat(lit("\""), k, lit("\"")))
      .when(m === 2, lit("true"))
      .when(m === 3, concat(lit("{\"n\":"), k, lit("}")))
      .when(m === 4, concat(lit("["), k, lit("]")))
      .otherwise(lit("null"))
    val doc = concat(lit("{\"k\":"), k, lit(",\"v\":"), vJson, lit("}"))
    val st = schema_of_variant(col("value"))
    val label = when(st.startsWith("OBJECT"), "object")
      .when(st.startsWith("ARRAY"), "array")
      .when(st === "VOID", "null")
      .when(st === "STRING", "string")
      .when(st === "BOOLEAN", "bool")
      .otherwise("number") // BIGINT / DECIMAL(p,s) / DOUBLE
    // variant_explode is a table-valued generator; the lateral join goes
    // through the Dataset lateralJoin + spark.tvf API — side-effect free,
    // unlike the previous fixed-name temp view (merely PLANNING the query
    // mutated the session catalog, and two concurrent calls on one session
    // raced on the view name)
    ev.withColumn("doc", doc).select(col("doc"))
      .lateralJoin(spark.tvf.variant_explode(parse_json(col("doc").outer())))
      .select(col("key"), label.as("vtype"))
      .groupBy(col("key"), col("vtype"))
      .agg(count(lit(1)).as("n"))
  }

  /** TYPE first-seen inventory — [[cdcTypeCensus]]'s drift ground truth
    * (the streaming twin is [[graft.streaming.SchemaDrift.typeRows]] →
    * `alerts`, replay-pinned in `SchemaDriftSpec`): when did each
    * (key, value-type) PAIR first appear — a type flip on an old key is a
    * new pair, which is exactly what a downstream consumer needs to hear
    * about before its casts start poisoning.
    */
  private def cdcTypeFirstSeen(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val k = get_json_object(col("props"), "$.k")
    val m = col("event_id") % 6
    val vJson = when(m === 0, k)
      .when(m === 1, concat(lit("\""), k, lit("\"")))
      .when(m === 2, lit("true"))
      .when(m === 3, concat(lit("{\"n\":"), k, lit("}")))
      .when(m === 4, concat(lit("["), k, lit("]")))
      .otherwise(lit("null"))
    val doc = concat(lit("{\"k\":"), k, lit(",\"v\":"), vJson, lit("}"))
    val st = schema_of_variant(col("value"))
    val label = when(st.startsWith("OBJECT"), "object")
      .when(st.startsWith("ARRAY"), "array")
      .when(st === "VOID", "null")
      .when(st === "STRING", "string")
      .when(st === "BOOLEAN", "bool")
      .otherwise("number")
    ev.withColumn("doc", doc).select(col("event_id"), col("doc"))
      .lateralJoin(spark.tvf.variant_explode(parse_json(col("doc").outer())))
      .select(col("event_id"), col("key"), label.as("vtype"))
      .groupBy(col("key"), col("vtype"))
      .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n"))
  }

  /** HLL sketch aggregation — approx_count_distinct per event type, made
    * ORACLE-CHECKABLE (r8; it was the inventory's one rows-only check from
    * r1–r7). Raw sketch values can't cross engines (DuckDB's HLL is a
    * different implementation), but Spark's HLL++ is merge-order-INSENSITIVE
    * (register state is a max — commutative and associative), so the
    * sketch's error against the exact count is deterministic for a given
    * dataset. The query emits the exact count plus the sketch's
    * within-10%-bound verdict; the oracle recomputes the exact side and pins
    * the verdict literally TRUE — a hash match now PROVES the sketch met
    * its error bound, which a rows-only check never could.
    *
    * Why 10% and not 5% for an rsd-0.02 sketch: 5% is ~2.5σ — deterministic
    * per dataset but legitimately exceedable by a regenerated fixture or a
    * new scale factor (~1% per group), which would read as a correctness
    * failure when nothing is wrong. 10% (5σ) cannot trip on any realistic
    * fixture while still failing loudly on an actually-broken sketch (an
    * implementation bug misses by multiples, not sigmas).
    */
  private def opsApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx_users") - col("exact_users")) * 10 <= col("exact_users"))
          .as("within_10pct"))
  }

  /** GK quantile sketch with its rank-error bound ORACLE-GATED — the
    * fourth sketch family (HLL, CMS, Misra-Gries, now quantiles), checked
    * the same way as the HLL gate: the sketch value itself can't cross
    * engines, but its CONTRACT can. `approx_percentile(value, 0.5, acc)`
    * guarantees the returned element's rank is within n/acc of the target
    * rank; the query recomputes that element's exact rank RANGE (ties
    * matter: any rank in [count(<v)+1, count(<=v)] is the element's) and
    * pins that the target lies inside the range widened by n/acc. The
    * verdict is TRUE by the algorithm's deterministic guarantee — not
    * probabilistically like a sigma bound — so the oracle pin can never
    * false-fail on a regenerated fixture. Integer arithmetic throughout
    * (multiplied through by 2·acc) so the comparison is hash-exact.
    */
  private def opsQuantileSketch(spark: SparkSession, sfDir: String): DataFrame =
    quantileBoundCheck(
      Tables.load(spark, sfDir, "events").select(col("event_type"), col("value")))

  /** The bound-check core on any (event_type, value) frame — separated so
    * the spec can drive it with tie-hostile corpora (a group that is 50%
    * one value exercises the rank-RANGE form; a naive single-rank check
    * would false-fail there).
    */
  private[graft] def quantileBoundCheck(ev: DataFrame, acc: Int = 100): DataFrame = {
    val ap = ev.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, 0.5D, $acc)").as("ap"),
        count(lit(1)).as("n"))
    ev.join(ap, "event_type")
      .groupBy(col("event_type"), col("n"))
      .agg(
        sum(when(col("value") <= col("ap"), 1L).otherwise(0L)).as("le"),
        sum(when(col("value") < col("ap"), 1L).otherwise(0L)).as("lt"))
      // Spark's QuantileSummaries anchors on target rank T = ceil(q·n)
      // (measured empirically: the returned element sits up to exactly
      // ε·n = n/acc BELOW it, fractional slack included) — so the check is
      // T ∈ [lt+1 − n/acc, le + n/acc] in EXACT integers, multiplied
      // through by 2·acc with 2T = n + n%2:
      .select(col("event_type"), col("n"),
        ((lit(2L * acc) * (col("lt") + 1L) - lit(2L) * col("n") <=
            lit(acc.toLong) * (col("n") + col("n") % 2L)) &&
         (lit(acc.toLong) * (col("n") + col("n") % 2L) <=
            lit(2L * acc) * col("le") + lit(2L) * col("n")))
          .as("within_rank_bound"))
  }

  /** The CC AUDIT as an oracle-gated query: [[graft.ops.Dedup
    * .auditComponents]]'s invariant counts over the real phash near-dup
    * graph, emitted as one row next to the graph's vertex/component
    * census. The oracle recomputes vertices and components independently
    * (the recursive-CTE closure) and pins violations = 0 — so the audit
    * harness that stands in for the oracle at x100 (where the CTE OOMs,
    * `graft.CcAudit`) is itself hash-verified against that oracle at every
    * scale the oracle CAN reach. Idempotence is deliberately not in the
    * query (it would double the closure cost in the bench); the spec and
    * the x100 run carry it.
    */
  private def opsCcAudit(spark: SparkSession, sfDir: String): DataFrame = {
    // sizedCoalesce: pairs/labels are candidate-graph-sized (hundreds of
    // rows here) yet checkpoint at the session parallelism — the audit's
    // join/agg cascade would schedule cores-wide micro-stages per check
    val pairs = Tables.sizedCoalesce(Multimodal.imagePhashPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint())
    val cc = Tables.sizedCoalesce(
      graft.ops.Dedup.connectedComponents(pairs).localCheckpoint())
    val a = graft.ops.Dedup.auditComponents(pairs, cc)
    import spark.implicits._
    Seq((a("vertices"), a("components"),
      a("dup_labels") + a("unlabeled") + a("edge_inconsistent") +
        a("non_min_root") + a("star_min_violation") +
        a("spurious_labels") + a("count_identity_violation")))
      .toDF("vertices", "components", "violations")
  }

  /** Schema-on-read key census: which JSON keys exist per table/type, and
    * how often — the introspection pass a CDC consumer runs to detect schema
    * drift in dynamic payloads (the reference's documents are arbitrary
    * `protobuf.Struct`s, `pqstream.proto:32-33`; nothing declares their
    * shape). Drift is synthesized deterministically on top of the flat
    * testdata props — each event type carries an extra key — mirrored
    * verbatim in the oracle. One narrow explode of `json_object_keys` + a
    * partial agg: the census never materializes payload values, only key
    * names, so it scans 100 TB at column-projection cost.
    */
  private def cdcKeyInventory(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val doc = concat(
      lit("{\"k\":"), get_json_object(col("props"), "$.k"),
      when(col("event_type") === "purchase", lit(",\"amount\":1")).otherwise(lit("")),
      when(col("event_type") === "error", lit(",\"code\":1")).otherwise(lit("")),
      when(col("event_type") === "signup", lit(",\"plan\":\"p\"")).otherwise(lit("")),
      lit("}"))
    ev.select(col("event_type"), explode(json_object_keys(doc)).as("key"))
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("n"))
  }

  /** Key FIRST-SEEN inventory — the batch ground truth for schema-drift
    * detection ([[graft.streaming.SchemaDrift]] is the online form, pinned
    * row-for-row against this query on replay): when did each (type, key)
    * pair first appear in the log? Same synthesized heterogeneous-payload
    * fixture as [[cdcKeyInventory]]; min(event_id) instead of a count.
    */
  private def cdcKeyFirstSeen(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val doc = concat(
      lit("{\"k\":"), get_json_object(col("props"), "$.k"),
      when(col("event_type") === "purchase", lit(",\"amount\":1")).otherwise(lit("")),
      when(col("event_type") === "error", lit(",\"code\":1")).otherwise(lit("")),
      when(col("event_type") === "signup", lit(",\"plan\":\"p\"")).otherwise(lit("")),
      lit("}"))
    ev.select(col("event_type"), col("event_id"),
        explode(json_object_keys(doc)).as("key"))
      .groupBy(col("event_type"), col("key"))
      .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n"))
  }

  /** Hot-key promotion ADVISOR — the schema-on-read → schema-on-write
    * bridge real consumers build by hand: which payload keys are
    * ubiquitous enough to deserve typed columns? Per key: doc coverage
    * (count + exact permille), the MAJORITY value-type label (the batch
    * type census's Variant walk — a key that's number in 99% of docs and
    * string in 1% promotes as number with a quarantine for the rest),
    * and the promotion rank (coverage desc, key asc). Same synthesized
    * heterogeneous-payload fixture as [[cdcKeyInventory]]. The
    * MATERIALIZATION half — actually producing the typed columns from
    * this advice — is [[graft.cdc.Promotion.materialize]], spec-gated
    * (its output shape is data-dependent, the advisor's is not).
    *
    * Shape at 100 TB: one Variant lateral walk (the type census's cost,
    * paid once), partial-agged to key × type-label cardinality; every
    * window here moves key-cardinality rows, never the corpus.
    */
  private def cdcKeyPromotion(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val doc = concat(
      lit("{\"k\":"), get_json_object(col("props"), "$.k"),
      when(col("event_type") === "purchase", lit(",\"amount\":1")).otherwise(lit("")),
      when(col("event_type") === "error", lit(",\"code\":1")).otherwise(lit("")),
      when(col("event_type") === "signup", lit(",\"plan\":\"p\"")).otherwise(lit("")),
      lit("}"))
    val kv = ev.select(col("event_id"), doc.as("doc"))
      .lateralJoin(spark.tvf.variant_explode(parse_json(col("doc").outer())))
    val st = schema_of_variant(col("value"))
    val label = when(st.startsWith("OBJECT"), "object")
      .when(st.startsWith("ARRAY"), "array")
      .when(st === "VOID", "null")
      .when(st === "STRING", "string")
      .when(st === "BOOLEAN", "bool")
      .otherwise("number")
    val byLabel = kv.select(col("key"), label.as("vtype"))
      .groupBy(col("key"), col("vtype")).agg(count(lit(1)).as("n"))
    val wMaj = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("n").desc, col("vtype"))
    val majority = byLabel.withColumn("rk", row_number().over(wMaj))
      .filter(col("rk") === 1).select(col("key"), col("vtype"))
    val censusByKey = kv.groupBy(col("key")).agg(count(lit(1)).as("n_docs"))
    val tot = ev.agg(count(lit(1)).as("total")) // one-row scalar broadcast
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_docs").desc, col("key"))
    censusByKey.join(majority, "key")
      .crossJoin(broadcast(tot))
      .select(col("key"), col("n_docs"),
        expr("n_docs * 1000 div total").as("coverage_permille"),
        col("vtype"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
  }

  /** SCD2 (slowly-changing-dimension type 2) materialization from the change
    * log — the canonical CDC-consumer build: each change becomes a validity
    * interval [valid_from, valid_to) per key, closed by the NEXT change
    * (`lead()`), open (null valid_to) for the current version. This is what
    * "populating other systems" (reference `README.md:3`) usually means for a
    * warehouse: one window shuffle on the key, then the dimension is
    * range-joinable by (key, as-of-time) forever after.
    */
  private def cdcScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(
      col("event_id"), col("user_id"), col("props"),
      col("ts").as("valid_from"),
      lead(col("ts"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time (PIT) join — the canonical SCD2 consumer: each purchase
    * fact is enriched with the dimension version that was valid AT the fact's
    * timestamp (`valid_from <= ts < valid_to`, open current version matches
    * everything after its start). Training-data pipelines need exactly this
    * to avoid feature leakage: the feature row must be the one that existed
    * at label time, not the current one.
    *
    * Shape: equi-join on the entity key with the interval predicate as a
    * join residual — the fact shuffles ONCE on `user_id`; versions of one key
    * are colocated, and because an SCD2 dimension is slowly changing,
    * versions-per-key is bounded, so the residual scan per key is small. (For
    * a high-churn dimension the scalable escalation is the
    * [[graft.ops.Relational.rangeJoinBinned]] time-bucket shape or the
    * [[graft.ops.Relational.asofLastOrder]] union+running-last — same
    * semantics, no per-key version list.) Intervals partition each key's
    * timeline, so exactly one version matches every fact — pinned by the
    * row-count equality with the purchase count in the oracle check.
    */
  private def cdcPitJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = cdcScd2(spark, sfDir).select(
      col("user_id"), col("event_id").as("ver_event_id"),
      col("props").as("ver_props"), col("valid_from"), col("valid_to"))
    val facts = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("f_user"), col("ts"))
    facts.join(dim,
        col("f_user") === col("user_id") &&
        col("valid_from") <= col("ts") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("ver_event_id"), col("ver_props"), col("valid_from"))
  }

  /** Latest-snapshot materialization: collapse the change log to current
    * table state (one row per key) — the other canonical CDC consumer. Shape
    * matters at 100 TB: this is a PARTIAL AGGREGATION (`max` over a
    * lexicographic (ts, event_id, props) struct), so each map partition ships
    * ONE candidate row per key instead of the full history a
    * row_number-window formulation would shuffle. Struct-max is the same
    * trick the as-of join's dim-reduction uses.
    */
  private def cdcSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("props"))).as("s"))
      .select(col("user_id"), col("s.ts").as("ts"),
        col("s.event_id").as("event_id"), col("s.props").as("props"))
  }

  /** Incremental aggregate maintenance — the third canonical CDC consumer
    * beside SCD2 and the snapshot: a downstream daily rollup kept fresh by
    * merging a delta instead of recomputing the world. The base aggregate
    * (events before the refresh horizon — in production, yesterday's
    * materialized rollup read back from storage) merges with the delta
    * aggregate (events since) through one re-aggregation: counts and exact
    * decimal sums are associative, so merge = groupBy + sum over the UNION of
    * partial states. At 100 TB the delta is a day against years of history —
    * the refresh costs O(delta + affected groups), not O(history); the oracle
    * is the full recompute, which is exactly the invariant incremental view
    * maintenance must preserve.
    */
  private def cdcAggRefresh(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("cents", (col("value").cast("decimal(18,2)") * 100).cast("long"))
    val horizon = lit("2024-01-15").cast("timestamp")
    def rollup(part: DataFrame): DataFrame =
      part.groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val base = rollup(ev.filter(col("ts") < horizon))   // the stored rollup
    val delta = rollup(ev.filter(col("ts") >= horizon)) // the new day's events
    base.unionByName(delta)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
  }

  private def cdcOpCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    EventLog.normalize(ev)
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** The composed corpus filter re-expressed as ONE SQL string over the
    * SQL-registered native functions (`h60`, `word_bigrams`) — proving the
    * `spark.sql.extensions=graft.GraftExtensions` surface end-to-end through
    * the driver harness: a pure-SQL client (spark-sql shell, Thrift server)
    * can run the engine's flagship curation pipeline with zero Scala
    * imports. Same gates, same shingle construction as
    * [[graft.ops.Curation.corpusFilter]]; the DuckDB oracle is shared
    * verbatim ([[corpusFilterOracle]]), so the two front ends are pinned to
    * identical semantics. Plan shape matches the DataFrame form: in-row
    * gates on the scan, one content-hash window, broadcast-hinted anti join.
    */
  private def opsSqlCorpusFilter(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(
      s"""WITH docs AS (SELECT * FROM parquet.`$sfDir/documents.parquet`),
         |tok AS (SELECT doc_id, split(text, ' ') AS t FROM docs),
         |sh AS (
         |  SELECT doc_id, explode(array_distinct(zip_with(
         |      slice(t, 1, size(t) - 2),
         |      zip_with(slice(t, 2, size(t) - 2), slice(t, 3, size(t) - 2),
         |        (b, c) -> concat(b, ' ', c)),
         |      (a, bc) -> concat(a, ' ', bc)))) AS shingle
         |  FROM tok WHERE size(t) >= 3),
         |hv AS (SELECT doc_id, h60(shingle) AS h FROM sh),
         |bench AS (SELECT DISTINCT h FROM hv WHERE doc_id < 5),
         |contaminated AS (
         |  SELECT DISTINCT hv.doc_id FROM hv JOIN bench ON hv.h = bench.h
         |  WHERE hv.doc_id >= 5),
         |gated AS (
         |  SELECT doc_id, lang, text FROM docs
         |  WHERE doc_id >= 5 AND lang IN ('en', 'de', 'fr', 'es', 'zh')
         |    AND size(split(text, ' ')) >= 2
         |    AND (1.0 - CAST(size(array_distinct(word_bigrams(text))) AS DOUBLE)
         |          / CAST(size(word_bigrams(text)) AS DOUBLE)) <= 0.2),
         |keep AS (
         |  SELECT doc_id, lang FROM (
         |    SELECT doc_id, lang,
         |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM gated) WHERE rn = 1)
         |SELECT /*+ BROADCAST(c) */ k.doc_id, k.lang
         |FROM keep k LEFT ANTI JOIN contaminated c ON k.doc_id = c.doc_id""".stripMargin)

  /** The WHOLE reference event path composed end-to-end in one declarative
    * plan — `handleEvent` (reference `server.go:214-255`) as Spark stages:
    * capture+prev-image (S1, lag), subscriber filter (F2, unanchored rlike),
    * redaction (P1), size-tier ladder (S2, limit scaled to this data's
    * payload sizes so tiers actually occur), UPDATE merge-patch (T1, computed
    * BEFORE fallback exactly like the reference), and fallback rehydration
    * (E1 — structurally present; this data never starves payloads, the
    * dedicated cdc_fallback_join query exercises that path with tripping
    * sizes). One narrow pipeline over one window shuffle + a broadcast join:
    * Catalyst fuses what the reference runs as per-event Go control flow.
    */
  private def cdcPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val norm = EventLog.normalize(ev) // lag() BEFORE the subscriber filter (F2 is post-capture)
    val filtered = norm.filter(col("event_type").rlike("p")) // signup|purchase, unanchored
    val isSignup = col("event_type") === "signup"
    val redacted = filtered
      .withColumn("payload", Redactions.redact(col("props"), isSignup, Seq("k")))
      .withColumn("previous", Redactions.redact(col("prev_props"), isSignup, Seq("k")))
    val envelope = to_json(struct(
      lit("public").as("schema"), lit("events").as("table"),
      col("op").as("op"), col("event_id").as("id")))
    val tiered = Tiering.ladder(redacted, "payload", "previous", limit = 95, envelope = envelope)
    val withChanges = tiered.withColumn("changes",
      when(col("op") === "UPDATE",
        MergePatch.json_merge_patch(col("payload"), col("previous")))
        .otherwise(lit(null: String)))
    val base = ev.select(col("event_id"), col("props"))
    Fallback.rehydrate(
        withChanges.select(col("event_id"), col("user_id"), col("op"), col("tier"),
          col("payload"), col("previous"), col("changes")),
        base.withColumnRenamed("props", "payload"), "event_id", "payload")
  }

  /** The flagship pipeline re-run with Spark 4 VariantType as the payload
    * carrier — the native analog of the reference's schema-on-read
    * `protobuf.Struct` payloads (reference `pqstream.proto:32-33`).
    * Documents live as Variant BETWEEN stages and serialize exactly where
    * bytes matter — redaction config application and the NOTIFY size ladder
    * operate on the wire form, just as the reference round-trips its Struct
    * through jsonpb at those points (`server.go:220,258`) — then re-parse.
    * Variant serialization is canonical (no whitespace), so the tier ladder
    * measures normalized wire bytes (`{"k":69}`, not the source text's
    * `{"k": 69}`); that is arguably MORE faithful than cdc_pipeline's
    * source-text accounting (the reference measures its own re-serialized
    * notification, `queries.go:33`), and the oracle mirrors it. The output
    * proves redact → tier → patch → fallback compose on Variant: payload
    * and changes re-serialized FROM Variant values after rehydration, and
    * k_new typed-extracted with variant_get post-fallback.
    */
  private def cdcVariantPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val norm = EventLog.normalize(ev)
    val filtered = norm.filter(col("event_type").rlike("p"))
    val isSignup = col("event_type") === "signup"
    // documents → Variant once, at capture
    val v = filtered
      .withColumn("payload_v", parse_json(col("props")))
      .withColumn("previous_v", parse_json(col("prev_props")))
    // redaction applied NATIVELY on the Variant values (variant_redact
    // rebuilds the binary object minus the configured fields — no JSON
    // text round-trip; parity with the string path pinned in RedactionsSpec)
    val redacted = v
      .withColumn("payload_v",
        Redactions.redactVariant(col("payload_v"), isSignup, Seq("k")))
      .withColumn("previous_v",
        Redactions.redactVariant(col("previous_v"), isSignup, Seq("k")))
    val envelope = to_json(struct(
      lit("public").as("schema"), lit("events").as("table"),
      col("op").as("op"), col("event_id").as("id")))
    // the ladder measures the canonical wire form of the Variant documents
    val serialized = redacted
      .withColumn("payload", to_json(col("payload_v")))
      .withColumn("previous", to_json(col("previous_v")))
    // limit 98 (vs cdc_pipeline's 95): canonical-form notification sizes on
    // this data cluster at 86-87 (no previous) and 96-99 (both documents);
    // 98 splits the two-document cluster, so tier-0 AND tier-1 rows occur
    // alongside all three patch shapes — 95 would shed nearly every
    // previous image and leave only delete-patches
    val tiered = Tiering.ladder(serialized, "payload", "previous", limit = 98, envelope = envelope)
    val withChanges = tiered
      // tier drops applied to the VARIANT columns in lockstep with the
      // serialized ones the ladder nulls, then the patch computed NATIVELY
      // over the Variant values (graft.functions.VariantMergePatch — no
      // JSON text round-trip in the changes stage; parity with the string
      // expression pinned by VariantMergePatchSpec)
      .withColumn("payload_v",
        when(col("tier") === 2, lit(null).cast("variant")).otherwise(col("payload_v")))
      .withColumn("previous_v",
        when(col("tier") >= 1, lit(null).cast("variant")).otherwise(col("previous_v")))
      .withColumn("changes_v",
        when(col("op") === "UPDATE",
          graft.functions.VariantMergePatch.variant_merge_patch(
            col("payload_v"), col("previous_v"))))
    val base = ev.select(col("event_id"), parse_json(col("props")).as("payload_v"))
    Fallback.rehydrate(
        withChanges.select(col("event_id"), col("user_id"), col("op"), col("tier"),
          col("payload_v"), col("previous"), col("changes_v")),
        base, "event_id", "payload_v")
      .select(col("event_id"), col("user_id"), col("op"), col("tier"),
        to_json(col("payload_v")).as("payload"),
        col("previous"),
        to_json(col("changes_v")).as("changes"),
        variant_get(col("payload_v"), "$.k", "int").as("k_new"))
  }

  // ===== query registry =====

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CDC / reference-fidelity set
    "cdc_pipeline"      -> (cdcPipeline _),
    "cdc_variant_pipeline" -> (cdcVariantPipeline _),
    "cdc_changes"       -> (cdcChanges _),
    "cdc_changes_nested" -> (cdcChangesNested _),
    "cdc_prev_image"    -> (cdcPrevImage _),
    "cdc_erase_replay"  -> (cdcEraseReplay _),
    "cdc_table_filter"  -> (cdcTableFilter _),
    "cdc_redact"        -> (cdcRedact _),
    "cdc_redact_map"    -> (cdcRedactMap _),
    "cdc_tiering"       -> (cdcTiering _),
    "cdc_fallback_join" -> (cdcFallbackJoin _),
    "cdc_op_counts"     -> (cdcOpCounts _),
    "cdc_scd2"          -> (cdcScd2 _),
    "cdc_pit_join"      -> (cdcPitJoin _),
    "cdc_snapshot"      -> (cdcSnapshot _),
    "cdc_agg_refresh"   -> (cdcAggRefresh _),
    "cdc_json_decode"   -> (cdcJsonDecode _),
    "cdc_variant_get"   -> (cdcVariantGet _),
    "ops_sessionize"    -> ((s: SparkSession, d: String) => Relational.sessionize(s, d)),
    "ops_set_ops"         -> (opsSetOps _),
    "ops_except_all"      -> (opsExceptAll _),
    "ops_approx_distinct" -> (opsApproxDistinct _),
    "ops_quantile_sketch" -> (opsQuantileSketch _),
    "cdc_type_census"     -> (cdcTypeCensus _),
    // relational set
    "q1_pricing"            -> (Relational.pricingSummary _),
    "ops_star_join_agg"     -> (Relational.starJoinAgg _),
    "ops_top_customers"     -> (Relational.topCustomersPerNation _),
    "ops_regression"        -> (Relational.regressionStats _),
    "ops_rollup"            -> (Relational.rollupCounts _),
    "ops_cube"              -> (Relational.cubeCounts _),
    "ops_anti_join"         -> (Relational.customersWithoutOrders _),
    "ops_semi_join"         -> (Relational.customersWithOrders _),
    "ops_pivot"             -> (Relational.pivotDailyTypes _),
    "ops_histogram"         -> (Relational.docLengthHistogram _),
    "ops_scalar_subquery"   -> (Relational.partsAboveMeanPrice _),
    "ops_order_count_dist"  -> (Relational.orderCountDistribution _),
    "cdc_key_inventory"     -> (cdcKeyInventory _),
    "cdc_key_first_seen"    -> (cdcKeyFirstSeen _),
    "cdc_type_first_seen"   -> (cdcTypeFirstSeen _),
    "cdc_generic_roundtrip" -> (graft.streaming.GenericRoundtrip.stagedGenericCapture _),
    "cdc_key_promotion"     -> (cdcKeyPromotion _),
    "ops_funnel"            -> (Relational.funnel _),
    "ops_window_funnel"     -> (Relational.windowFunnel _),
    "ops_cohort_retention"  -> (Relational.cohortRetention _),
    "ops_mad_outliers"      -> (Relational.madOutliers _),
    "ops_full_outer"        -> (Relational.reconcileHourly _),
    "ops_dau_wau"           -> (Relational.dauWau _),
    "ops_cum_users"         -> (Relational.cumulativeUsers _),
    "ops_revenue_share"     -> (Relational.revenueShare _),
    "ops_transition_matrix" -> (Relational.transitionMatrix _),
    "ops_unpivot"           -> (Relational.unpivotSegmentMetrics _),
    "ops_grouping_sets"     -> (Relational.groupingSetsCounts _),
    "ops_rank_suite"        -> (Relational.rankSuite _),
    "ops_gap_fill"          -> (Relational.gapFillDaily _),
    "ops_ffill"             -> (Relational.forwardFill _),
    "ops_corr_subquery"     -> (Relational.smallQuantityRevenue _),
    "ops_q21_waiting"       -> (Relational.soleProblemSuppliers _),
    "ops_q20_dominant_supp" -> (Relational.dominantPartSuppliers _),
    "ops_q2_min_cost"       -> (Relational.minCostSuppliers _),
    "ops_q11_important_stock" -> (Relational.importantStock _),
    "ops_q16_supplier_cnt"  -> (Relational.supplierRelationCount _),
    "ops_q22_idle_rich"     -> (Relational.idleRichCustomers _),
    "ops_q4_late_orders"    -> (Relational.latePriorityCensus _),
    "ops_q3_ship_priority"  -> (Relational.shippingPriority _),
    "ops_q5_local_volume"   -> (Relational.localSupplierVolume _),
    "ops_q7_trade_volume"   -> (Relational.tradeVolume _),
    "ops_q8_market_share"   -> (Relational.marketShare _),
    "ops_q9_profit"         -> (Relational.profitByNation _),
    "ops_q10_returns"       -> (Relational.returnedItems _),
    "ops_q12_priority_lanes" -> (Relational.priorityLanes _),
    "ops_q6_forecast"       -> (Relational.forecastRevenue _),
    "ops_benford"           -> (Relational.benfordAudit _),
    "ops_drawdown"          -> (Relational.maxDrawdown _),
    "ops_q19_disjuncts"     -> (Relational.discountedRevenue _),
    "ops_q14_promo"         -> (Relational.promoShare _),
    "ops_q15_top_supplier"  -> (Relational.topRevenueSupplier _),
    "ops_q18_large_orders"  -> ((s: SparkSession, d: String) => Relational.largeQuantityOrders(s, d)),
    "ops_dq_audit"          -> (Relational.dqAudit _),
    "ops_moving_avg"        -> (Relational.movingAgg _),
    "ops_asof_join"         -> (Relational.asofLastOrder _),
    "ops_range_join"        -> (Relational.rangeJoinBinned _),
    "ops_salted_join"       -> ((s: SparkSession, d: String) => Skew.saltedSegmentRevenue(s, d)),
    "ops_event_windows"     -> (Relational.eventWindows _),
    "ops_hourly_counts"     -> (Relational.hourlyEventCounts _),
    "ops_gini"              -> (Relational.giniConcentration _),
    "ops_ks_test"           -> ((s: SparkSession, d: String) => Relational.ksTest(s, d)),
    "ops_seasonal"          -> (Relational.seasonalDecompose _),
    "ops_chi2"              -> (Relational.chi2Association _),
    "ops_autocorr"          -> ((s: SparkSession, d: String) => Relational.autocorrelation(s, d)),
    "ops_cusum"             -> (Relational.cusumChangepoint _),
    // dedup set
    "ops_dedup_keys"    -> (Dedup.dedupKeys _),
    "ops_dedup_content" -> (Dedup.dedupContent _),
    "ops_dedup_minhash" -> ((s: SparkSession, d: String) => Dedup.minhashCandidates(s, d)),
    "ops_dedup_verify"  -> ((s: SparkSession, d: String) => Dedup.dedupVerify(s, d)),
    "ops_edit_verify"   -> ((s: SparkSession, d: String) => Dedup.editVerify(s, d)),
    "ops_dedup_cc"      -> (Dedup.dedupCc _),
    "ops_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "ops_substring_dup" -> ((s: SparkSession, d: String) => Dedup.substringDup(s, d)),
    "ops_content_chunks" -> ((s: SparkSession, d: String) => Dedup.contentChunks(s, d)),
    "ops_cross_split"    -> ((s: SparkSession, d: String) => Dedup.crossSplitLeaks(s, d)),
    "ops_containment"   -> ((s: SparkSession, d: String) => Dedup.containment(s, d)),
    "ops_pagerank"      -> (Dedup.pagerank _),
    "ops_triangles"     -> (Dedup.triangles _),
    "ops_lsh_calib"     -> ((s: SparkSession, d: String) => Dedup.lshCalibration(s, d)),
    "ops_incr_dedup"    -> (Dedup.incrementalDedup _),
    "ops_dedup_keep_best" -> (Dedup.dedupKeepBest _),
    "ops_simhash"       -> (Dedup.simhash _),
    "ops_simhash_pairs" -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
    // similarity set
    "ops_sim_topk"    -> ((s: SparkSession, d: String) => Similarity.topK(s, d)),
    "ops_hybrid_rrf"  -> ((s: SparkSession, d: String) => Similarity.hybridRrf(s, d)),
    "ops_sim_ivf"     -> ((s: SparkSession, d: String) => Similarity.ivfTopK(s, d)),
    "ops_sim_pq"      -> ((s: SparkSession, d: String) => Similarity.pqTopK(s, d)),
    "ops_sim_pq_trained" -> ((s: SparkSession, d: String) => Similarity.pqTopKTrained(s, d)),
    "ops_sim_pq_served" -> ((s: SparkSession, d: String) => Similarity.pqTopKServed(s, d)),
    "ops_sim_pq_batch" -> ((s: SparkSession, d: String) => Similarity.pqTopKServedBatch(s, d)),
    "ops_sim_ivfpq"   -> ((s: SparkSession, d: String) => Similarity.pqTopKIvf(s, d)),
    "ops_sim_ivfpq_batch" -> ((s: SparkSession, d: String) => Similarity.pqTopKIvfBatch(s, d)),
    "ops_sim_recall"  -> ((s: SparkSession, d: String) => Similarity.annRecall(s, d)),
    "ops_ivf_calib"   -> ((s: SparkSession, d: String) => Similarity.ivfCalib(s, d)),
    "ops_sim_ivfpq_trained" -> ((s: SparkSession, d: String) => Similarity.pqTopKIvfTrained(s, d)),
    "ops_sim_ivfpq_trained_batch" -> ((s: SparkSession, d: String) => Similarity.pqTopKIvfTrainedBatch(s, d)),
    "ops_ivf_calib_trained" -> ((s: SparkSession, d: String) => Similarity.ivfCalib(s, d, trained = true)),
    "ops_sim_ivfpq_res" -> ((s: SparkSession, d: String) => Similarity.pqTopKIvfRes(s, d)),
    "ops_sim_ivfpq_res_batch" -> ((s: SparkSession, d: String) => Similarity.pqTopKIvfResBatch(s, d)),
    "ops_ivf_choose" -> ((s: SparkSession, d: String) => Similarity.ivfChoose(s, d)),
    "ops_sim_opq"    -> ((s: SparkSession, d: String) => Similarity.opqTopK(s, d)),
    "ops_sim_recall_opq" -> ((s: SparkSession, d: String) => Similarity.annRecallOpq(s, d)),
    "ops_opq_balance" -> ((s: SparkSession, d: String) => Similarity.opqBalance(s, d)),
    "ops_ann_lsh"     -> ((s: SparkSession, d: String) => Similarity.nearDupPairs(s, d)),
    "ops_embed_cluster" -> (Similarity.embedClusters _),
    "ops_semdedup"    -> ((s: SparkSession, d: String) => Similarity.semDedup(s, d)),
    "ops_embed_quant" -> (Similarity.quantizeInt8 _),
    "ops_embed_gram"  -> (Similarity.embedGram _),
    // text analysis set
    "ops_text_stats"    -> (TextStats.corpusStats _),
    "ops_lang_id"       -> (TextStats.langId _),
    "ops_text_quality"  -> (TextStats.qualityScore _),
    "ops_quality_logit" -> (TextStats.qualityLogit _),
    "ops_quality_distilled" -> ((s: SparkSession, d: String) =>
      graft.ops.QualityModel.scoreDistilled(graft.ops.QualityModel.Published, s, d)),
    "ops_token_counts"  -> (TextStats.tokenCounts _),
    "ops_fingerprints"  -> ((s: SparkSession, d: String) => TextStats.fingerprints(s, d)),
    "ops_winnowing"     -> ((s: SparkSession, d: String) => TextStats.winnowing(s, d)),
    "ops_bpe_merge"     -> ((s: SparkSession, d: String) => TextStats.bpeMerges(s, d)),
    "ops_bpe_encode"    -> ((s: SparkSession, d: String) => TextStats.bpeEncode(s, d)),
    "ops_kn_lm"         -> ((s: SparkSession, d: String) => TextStats.knBigramLm(s, d)),
    "ops_kn_perplexity" -> (TextStats.knPerplexity _),
    "ops_term_drift"    -> ((s: SparkSession, d: String) => TextStats.termDrift(s, d)),
    "ops_quantiles"     -> (TextStats.lengthQuantiles _),
    "ops_text_search"   -> ((s: SparkSession, d: String) => TextStats.textSearch(s, d)),
    "ops_bigram_lm"     -> (TextStats.bigramFamiliarity _),
    "ops_tfidf_terms"   -> ((s: SparkSession, d: String) => TextStats.tfidfTopTerms(s, d)),
    "ops_cms_freq"      -> (TextStats.cmsFrequency _),
    "ops_kmv_overlap"   -> ((s: SparkSession, d: String) => TextStats.kmvDumpOverlap(s, d)),
    "ops_skipgram_pmi"  -> ((s: SparkSession, d: String) => TextStats.skipgramPmi(s, d)),
    "ops_bm25"          -> ((s: SparkSession, d: String) => TextStats.bm25Search(s, d)),
    "ops_entropy"       -> (TextStats.tokenEntropy _),
    "ops_heavy_hitters" -> ((s: SparkSession, d: String) => TextStats.heavyHitters(s, d)),
    "ops_group_heavy_hitters" -> ((s: SparkSession, d: String) => TextStats.groupHeavyHitters(s, d)),
    "ops_bpe_pairs"     -> (TextStats.bpePairStats _),
    // curation set
    "ops_pii_scan"   -> (Curation.piiScan _),
    "ops_doc_sample" -> ((s: SparkSession, d: String) => Curation.hashSample(s, d)),
    "ops_vocab"      -> ((s: SparkSession, d: String) => Curation.vocabulary(s, d)),
    "ops_repetition" -> (Curation.repetitionScore _),
    "ops_filter_attrib" -> (Curation.filterAttribution _),
    "ops_train_prep"    -> ((s: SparkSession, d: String) => Curation.trainPrep(s, d)),
    "ops_decontaminate" -> ((s: SparkSession, d: String) => Curation.decontaminate(s, d)),
    "ops_strat_sample"  -> ((s: SparkSession, d: String) => Curation.stratifiedSample(s, d)),
    "ops_corpus_filter" -> ((s: SparkSession, d: String) => Curation.corpusFilter(s, d)),
    "ops_sql_corpus_filter" -> (opsSqlCorpusFilter _),
    "ops_seq_pack"      -> ((s: SparkSession, d: String) => Curation.seqPack(s, d)),
    "ops_doc_chunk"       -> ((s: SparkSession, d: String) => Curation.chunkDocs(s, d)),
    "ops_weighted_sample" -> (Curation.weightedSample _),
    "ops_group_sample"    -> ((s: SparkSession, d: String) => Curation.groupSample(s, d)),
    "ops_line_dedup"      -> ((s: SparkSession, d: String) => Curation.lineDedup(s, d)),
    "ops_quality_mix"     -> ((s: SparkSession, d: String) => Curation.qualityMix(s, d)),
    "ops_shuffle_shards"  -> ((s: SparkSession, d: String) => Curation.shuffleShards(s, d)),
    "ops_domain_mix"      -> (Curation.domainMix _),
    "ops_url_dedup"       -> (Curation.urlDedup _),
    "ops_pref_pairs"      -> (Curation.prefPairs _),
    "ops_quality_curve"   -> ((s: SparkSession, d: String) => Curation.qualityCurve(s, d)),
    "ops_quality_choose"  -> ((s: SparkSession, d: String) => Curation.qualityChoose(s, d)),
    "ops_mix_solve"       -> ((s: SparkSession, d: String) => Curation.mixSolve(s, d)),
    "ops_train_prep_measured" -> ((s: SparkSession, d: String) => Curation.trainPrepMeasured(s, d)),
    "ops_span_corrupt"    -> ((s: SparkSession, d: String) => Curation.spanCorruption(s, d)),
    // multimodal set
    "ops_media_meta"   -> (Multimodal.mediaMeta _),
    "ops_media_dedup"  -> (Multimodal.mediaDedupManifest _),
    "ops_media_frames" -> ((s: SparkSession, d: String) => Multimodal.frameSample(s, d)),
    // real codecs: encode→decode round-trip through javax.imageio /
    // javax.sound.sampled; oracle recomputes the decoded content in SQL
    "ops_png_decode"   -> ((s: SparkSession, d: String) => Multimodal.pngDecodeDf(s, d).toDF()),
    "ops_wav_decode"   -> ((s: SparkSession, d: String) => Multimodal.wavDecodeDf(s, d).toDF()),
    "ops_png_resize"   -> ((s: SparkSession, d: String) => Multimodal.pngThumbFeatures(s, d).toDF()),
    "ops_image_phash"  -> ((s: SparkSession, d: String) => Multimodal.imagePhashPairs(s, d)),
    "ops_audio_fp"     -> ((s: SparkSession, d: String) => Multimodal.wavFingerprintDf(s, d).toDF()),
    "ops_audio_pairs"  -> ((s: SparkSession, d: String) => Multimodal.audioFpPairs(s, d)),
    "ops_gif_frames"   -> ((s: SparkSession, d: String) => Multimodal.gifFramesDf(s, d).toDF()),
    "ops_gif_phash"    -> ((s: SparkSession, d: String) => Multimodal.gifPhashDf(s, d).toDF()),
    "ops_phash_cc"     -> (Multimodal.imagePhashClusters _),
    // storage layout
    "ops_zorder"       -> (graft.sources.Layout.zorderStats _),
    "ops_bucket_join"  -> (graft.sources.Layout.bucketedJoinRevenue _),
    "ops_erase_entity" -> (graft.sources.Layout.eraseEntityAudit _),
    "ops_erase_batch"  -> (graft.sources.Layout.eraseEntitiesAudit _),
    "ops_json_source"  -> (graft.sources.TextFormats.jsonEventIngest _),
    "ops_csv_source"   -> (graft.sources.TextFormats.csvEventIngest _),
    "ops_gz_source"    -> (graft.sources.TextFormats.gzJsonEventIngest _),
    "ops_gz_staged"    -> (graft.sources.TextFormats.stagedGzEventIngest _),
    "ops_orc_source"   -> (graft.sources.TextFormats.orcEventIngest _),
    "ops_cc_audit"     -> (opsCcAudit _),
    // bloom-membership set: exact compositions of the Bloom build/probe pair
    "ops_bloom_prune"  -> (BloomMembership.bloomPrune _),
    "ops_bloom_novel"  -> (BloomMembership.bloomNovel _),
  )

  // ===== DuckDB oracles =====

  /** Oracle SQL lives in [[graft.oracles]] (one object per domain:
    * CDC / relational-events / documents-LLM) so this contract file stays
    * readable; the key set is asserted disjoint at class-init time.
    */
  def oracleSql: Map[String, String] = {
    val parts = Seq(oracles.CdcOracles.sql, oracles.OpsOracles.sql, oracles.TextOracles.sql)
    val merged = parts.reduce(_ ++ _)
    require(merged.size == parts.map(_.size).sum,
      "oracle key collision across domain objects")
    merged
  }
}
