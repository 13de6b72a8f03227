package graft.oracles

/** DuckDB oracle SQL for the CDC operator set (reference-fidelity queries
  * `cdc_*`). Extracted from SparkEntry so the contract file stays readable;
  * key set and strings are unchanged. Shared fragments: [[OracleFrags]].
  */
private[graft] object CdcOracles {
  import OracleFrags._

  val sql: Map[String, String] = Map(
    "cdc_pipeline" ->
      s"""WITH n AS (
         |  SELECT event_id, user_id, event_type, props,
         |    LAG(props) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_props,
         |    $opCase AS op
         |  FROM events),
         |f AS (SELECT * FROM n WHERE regexp_matches(event_type, 'p')),
         |r AS (
         |  SELECT event_id, user_id, op, props,
         |    CASE WHEN event_type = 'signup' THEN '{}' ELSE props END AS payload0,
         |    CASE WHEN event_type = 'signup'
         |         THEN CASE WHEN prev_props IS NULL THEN NULL ELSE '{}' END
         |         ELSE prev_props END AS previous0
         |  FROM f),
         |-- full-notification accounting (queries.go:33): envelope bytes +
         |-- ,"payload":<p> (11) + ,"previous":<v> (12), null document = 0
         |t AS (
         |  SELECT event_id, user_id, op, props,
         |    CASE WHEN strlen('{"schema":"public","table":"events","op":"' || op || '","id":' || CAST(event_id AS VARCHAR) || '}')
         |              + CASE WHEN payload0 IS NULL THEN 0 ELSE 11 + strlen(payload0) END
         |              + CASE WHEN previous0 IS NULL THEN 0 ELSE 12 + strlen(previous0) END < 95 THEN 0
         |         WHEN strlen('{"schema":"public","table":"events","op":"' || op || '","id":' || CAST(event_id AS VARCHAR) || '}')
         |              + CASE WHEN payload0 IS NULL THEN 0 ELSE 11 + strlen(payload0) END < 95 THEN 1
         |         ELSE 2 END AS tier,
         |    payload0, previous0
         |  FROM r),
         |t2 AS (
         |  SELECT event_id, user_id, op, tier, props,
         |    CASE WHEN tier = 2 THEN NULL ELSE payload0 END AS payload,
         |    CASE WHEN tier >= 1 THEN NULL ELSE previous0 END AS previous
         |  FROM t)
         |-- COALESCE = the fallback rehydration stage (changes is computed on
         |-- the PRE-fallback payload, reference order server.go:235-248)
         |SELECT event_id, user_id, op, tier,
         |  COALESCE(t2.payload, props) AS payload, previous,
         |  CASE WHEN op <> 'UPDATE' THEN NULL
         |       WHEN COALESCE(CAST(json_extract(t2.payload, '$$.k') AS VARCHAR), 'X')
         |          = COALESCE(CAST(json_extract(previous, '$$.k') AS VARCHAR), 'X') THEN '{}'
         |       WHEN json_extract(previous, '$$.k') IS NULL THEN '{"k":null}'
         |       ELSE '{"k":' || CAST(json_extract(previous, '$$.k') AS VARCHAR) || '}' END AS changes
         |FROM t2""".stripMargin,
    // twin of SparkEntry.cdcVariantPipeline — cdc_pipeline's stage math over
    // the CANONICAL wire form (Variant serialization strips whitespace:
    // '{"k":69}', not the source '{"k": 69}'), so every strlen below
    // measures the normalized document and the final payload/changes are
    // reconstructed in normalized form. k_new = the post-fallback typed
    // extraction (variant_get on the Spark side).
    "cdc_variant_pipeline" ->
      s"""WITH n0 AS (
         |  SELECT event_id, ts, user_id, event_type,
         |    '{"k":' || CAST(json_extract(props, '$$.k') AS VARCHAR) || '}' AS propsn
         |  FROM events),
         |n AS (
         |  SELECT event_id, user_id, event_type, propsn,
         |    LAG(propsn) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prevn,
         |    $opCase AS op
         |  FROM n0),
         |f AS (SELECT * FROM n WHERE regexp_matches(event_type, 'p')),
         |r AS (
         |  SELECT event_id, user_id, op, propsn,
         |    CASE WHEN event_type = 'signup' THEN '{}' ELSE propsn END AS payload0,
         |    CASE WHEN event_type = 'signup'
         |         THEN CASE WHEN prevn IS NULL THEN NULL ELSE '{}' END
         |         ELSE prevn END AS previous0
         |  FROM f),
         |t AS (
         |  SELECT event_id, user_id, op, propsn,
         |    CASE WHEN strlen('{"schema":"public","table":"events","op":"' || op || '","id":' || CAST(event_id AS VARCHAR) || '}')
         |              + CASE WHEN payload0 IS NULL THEN 0 ELSE 11 + strlen(payload0) END
         |              + CASE WHEN previous0 IS NULL THEN 0 ELSE 12 + strlen(previous0) END < 98 THEN 0
         |         WHEN strlen('{"schema":"public","table":"events","op":"' || op || '","id":' || CAST(event_id AS VARCHAR) || '}')
         |              + CASE WHEN payload0 IS NULL THEN 0 ELSE 11 + strlen(payload0) END < 98 THEN 1
         |         ELSE 2 END AS tier,
         |    payload0, previous0
         |  FROM r),
         |t2 AS (
         |  SELECT event_id, user_id, op, tier, propsn,
         |    CASE WHEN tier = 2 THEN NULL ELSE payload0 END AS payload,
         |    CASE WHEN tier >= 1 THEN NULL ELSE previous0 END AS previous
         |  FROM t)
         |SELECT event_id, user_id, op, tier,
         |  COALESCE(t2.payload, propsn) AS payload, previous,
         |  CASE WHEN op <> 'UPDATE' THEN NULL
         |       WHEN COALESCE(CAST(json_extract(t2.payload, '$$.k') AS VARCHAR), 'X')
         |          = COALESCE(CAST(json_extract(previous, '$$.k') AS VARCHAR), 'X') THEN '{}'
         |       WHEN json_extract(previous, '$$.k') IS NULL THEN '{"k":null}'
         |       ELSE '{"k":' || CAST(json_extract(previous, '$$.k') AS VARCHAR) || '}' END AS changes,
         |  CAST(json_extract(COALESCE(t2.payload, propsn), '$$.k') AS INT) AS k_new
         |FROM t2""".stripMargin,
    "cdc_json_decode" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k,
        |  '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) || '}' AS props_norm
        |FROM events""".stripMargin,
    "cdc_variant_get" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k FROM events",
    "cdc_changes" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, props,
        |         LAG(props) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_props
        |  FROM events)
        |SELECT event_id, user_id, props, prev_props,
        |  CASE WHEN COALESCE(CAST(json_extract(props, '$.k') AS VARCHAR), 'X')
        |          = COALESCE(CAST(json_extract(prev_props, '$.k') AS VARCHAR), 'X') THEN '{}'
        |       WHEN json_extract(prev_props, '$.k') IS NULL THEN '{"k":null}'
        |       ELSE '{"k":' || CAST(json_extract(prev_props, '$.k') AS VARCHAR) || '}' END AS changes
        |FROM e
        |WHERE event_type NOT IN ('signup', 'error') AND prev_props IS NOT NULL""".stripMargin,
    "cdc_changes_nested" ->
      """WITH b AS (
        |  SELECT event_id, CAST(event_id % 9 AS INT) AS m,
        |    CAST(event_id % 10 AS VARCHAR) AS a,
        |    CAST(user_id % 3 AS VARCHAR) AS x,
        |    CAST(user_id % 5 AS VARCHAR) AS y
        |  FROM events)
        |SELECT event_id,
        |  '{"a":' || a || ',"meta":{"x":' || x || ',"y":' || y || '}' ||
        |    CASE WHEN m = 3 THEN ',"tag":"t"' WHEN m = 5 THEN ',"n":null'
        |         WHEN m = 6 THEN ',"arr":[' || a || ']'
        |         WHEN m = 7 THEN ',"arr":[' || a || ',' || x || ']'
        |         WHEN m = 8 THEN ',"v":' || a
        |         ELSE '' END
        |    || '}' AS doc,
        |  CASE
        |    WHEN m = 1 THEN '{"a":' || CAST(CAST(a AS INT) + 1 AS VARCHAR)
        |      || ',"meta":{"x":' || x || ',"y":' || y || '}}'
        |    WHEN m = 2 THEN '{"a":' || a || ',"meta":{"x":'
        |      || CAST(CAST(x AS INT) + 1 AS VARCHAR) || ',"y":' || y || '}}'
        |    WHEN m = 4 THEN '{"a":' || a || ',"meta":{"x":' || x || ',"y":' || y
        |      || '},"extra":"old"}'
        |    WHEN m = 5 THEN '{"a":' || a || ',"meta":{"x":' || x || ',"y":' || y
        |      || '},"n":' || y || '}'
        |    WHEN m = 6 THEN '{"a":' || a || ',"meta":{"x":' || x || ',"y":' || y
        |      || '},"arr":[' || a || ',' || x || ']}'
        |    WHEN m = 7 THEN '{"a":' || a || ',"meta":{"x":' || x || ',"y":' || y
        |      || '},"arr":[' || a || ',' || x || ']}'
        |    WHEN m = 8 THEN '{"a":' || a || ',"meta":{"x":' || x || ',"y":' || y
        |      || '},"v":[' || a || ']}'
        |    ELSE '{"a":' || a || ',"meta":{"x":' || x || ',"y":' || y || '}}'
        |  END AS prev_doc,
        |  -- expected RFC 7386 patch per case, derived by hand (new -> old):
        |  -- identical = {}; changed key = pre-update value; nested change
        |  -- recurses and omits the unchanged sibling; key only in new
        |  -- deletes via null; key only in old resurfaces; explicit null in
        |  -- new vs value in old = the value; arrays replace WHOLESALE
        |  -- (changed array = whole prev array; identical array = omitted;
        |  -- scalar-vs-array = prev array verbatim) — never element-merged
        |  CASE
        |    WHEN m = 0 THEN '{}'
        |    WHEN m = 1 THEN '{"a":' || CAST(CAST(a AS INT) + 1 AS VARCHAR) || '}'
        |    WHEN m = 2 THEN '{"meta":{"x":' || CAST(CAST(x AS INT) + 1 AS VARCHAR) || '}}'
        |    WHEN m = 3 THEN '{"tag":null}'
        |    WHEN m = 4 THEN '{"extra":"old"}'
        |    WHEN m = 6 THEN '{"arr":[' || a || ',' || x || ']}'
        |    WHEN m = 7 THEN '{}'
        |    WHEN m = 8 THEN '{"v":[' || a || ']}'
        |    ELSE '{"n":' || y || '}'
        |  END AS changes
        |FROM b""".stripMargin,
    "cdc_prev_image" ->
      s"""SELECT event_id, user_id, $opCase AS op, props,
         |  LAG(props) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_props
         |FROM events""".stripMargin,
    // point-in-time erasure semantics: the erased entity's rows at or
    // below the cutoff vanish, its first post-cutoff event has
    // previous = NULL (first-sight — the lag window runs over SURVIVORS),
    // null-key rows survive (IS NOT DISTINCT FROM is the <=> analog)
    "cdc_erase_replay" ->
      s"""WITH s AS (SELECT MIN(user_id) AS tgt, MAX(event_id) // 2 AS cutoff FROM events)
         |SELECT event_id, user_id, $opCase AS op,
         |  LAG(props) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS previous
         |FROM events, s
         |WHERE NOT (user_id IS NOT DISTINCT FROM tgt AND event_id <= cutoff)""".stripMargin,
    "cdc_table_filter" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE regexp_matches(event_type, 'sign|pur')",
    "cdc_redact" ->
      "SELECT event_id, event_type, CASE WHEN event_type = 'purchase' THEN '{}' ELSE props END AS props_redacted FROM events",
    "cdc_redact_map" ->
      "SELECT event_id, event_type, CASE WHEN event_type IN ('purchase', 'error') THEN '{}' ELSE props END AS props_redacted FROM events",
    "cdc_tiering" ->
      """WITH sized AS (
        |  SELECT event_id,
        |         repeat(props, CAST(event_id % 5 AS INT)) AS payload0,
        |         repeat(props, CAST((event_id + 2) % 4 AS INT)) AS previous0,
        |         strlen('{"schema":"public","table":"events","id":' || CAST(event_id AS VARCHAR) || '}') AS env
        |  FROM events),
        |t AS (
        |  SELECT event_id, payload0, previous0,
        |    CASE WHEN env + 11 + strlen(payload0) + 12 + strlen(previous0) < 85 THEN 0
        |         WHEN env + 11 + strlen(payload0) < 85 THEN 1
        |         ELSE 2 END AS tier
        |  FROM sized)
        |SELECT event_id, tier,
        |  CASE WHEN tier = 2 THEN NULL ELSE payload0 END AS payload,
        |  CASE WHEN tier >= 1 THEN NULL ELSE previous0 END AS previous
        |FROM t""".stripMargin,
    "cdc_fallback_join" ->
      """WITH sized AS (
        |  SELECT event_id, props,
        |         repeat(props, CAST(event_id % 5 AS INT)) AS payload0,
        |         repeat(props, CAST((event_id + 2) % 4 AS INT)) AS previous0,
        |         strlen('{"schema":"public","table":"events","id":' || CAST(event_id AS VARCHAR) || '}') AS env
        |  FROM events),
        |t AS (
        |  SELECT event_id, props, payload0,
        |    CASE WHEN env + 11 + strlen(payload0) + 12 + strlen(previous0) < 85 THEN 0
        |         WHEN env + 11 + strlen(payload0) < 85 THEN 1
        |         ELSE 2 END AS tier
        |  FROM sized)
        |SELECT event_id, tier,
        |  CASE WHEN tier = 2 THEN props ELSE payload0 END AS payload
        |FROM t""".stripMargin,
    "cdc_scd2" ->
      """SELECT event_id, user_id, props, ts AS valid_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM events""".stripMargin,
    "cdc_pit_join" ->
      """WITH dim AS (
        |  SELECT user_id, event_id AS ver_event_id, props AS ver_props, ts AS valid_from,
        |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM events),
        |f AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, f.ts, d.ver_event_id, d.ver_props, d.valid_from
        |FROM f JOIN dim d ON f.user_id = d.user_id AND d.valid_from <= f.ts
        |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)""".stripMargin,
    "cdc_snapshot" ->
      """WITH m AS (
        |  SELECT user_id, max({'ts': ts, 'event_id': event_id, 'props': props}) AS s
        |  FROM events GROUP BY user_id)
        |SELECT user_id, s.ts AS ts, s.event_id AS event_id, s.props AS props FROM m""".stripMargin,
    // full recompute: exactly the invariant the incremental merge must preserve,
    "cdc_agg_refresh" ->
      """SELECT date_trunc('day', ts) AS day, event_type, COUNT(1) AS n,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "cdc_op_counts" ->
      s"""SELECT $opCase AS op, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1""".stripMargin,
    "cdc_key_inventory" ->
      """WITH d AS (
        |  SELECT event_type,
        |    '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) ||
        |    CASE WHEN event_type = 'purchase' THEN ',"amount":1' ELSE '' END ||
        |    CASE WHEN event_type = 'error' THEN ',"code":1' ELSE '' END ||
        |    CASE WHEN event_type = 'signup' THEN ',"plan":"p"' ELSE '' END ||
        |    '}' AS doc
        |  FROM events)
        |SELECT event_type, k AS key, COUNT(*) AS n
        |FROM (SELECT event_type, unnest(json_keys(doc)) AS k FROM d)
        |GROUP BY event_type, k""".stripMargin,
    // drift ground truth: when did each (type, key) first appear —
    // the batch twin SchemaDrift.alerts is replay-pinned against
    "cdc_key_first_seen" ->
      """WITH d AS (
        |  SELECT event_type, event_id,
        |    '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) ||
        |    CASE WHEN event_type = 'purchase' THEN ',"amount":1' ELSE '' END ||
        |    CASE WHEN event_type = 'error' THEN ',"code":1' ELSE '' END ||
        |    CASE WHEN event_type = 'signup' THEN ',"plan":"p"' ELSE '' END ||
        |    '}' AS doc
        |  FROM events)
        |SELECT event_type, k AS key,
        |  CAST(MIN(event_id) AS BIGINT) AS first_event_id, COUNT(*) AS n
        |FROM (SELECT event_type, event_id, unnest(json_keys(doc)) AS k FROM d)
        |GROUP BY event_type, k""".stripMargin,
    // twin of [[graft.streaming.GenericRoundtrip.stagedGenericCapture]]:
    // the raw table IS the truth the live generic capture must round-trip
    // (exactly-once delivery, byte-exact escape round-trip of the nested
    // props document, the full column set folded — n_keys = 5)
    "cdc_generic_roundtrip" ->
      """SELECT event_id, user_id, event_type, props,
        |  CAST(5 AS BIGINT) AS n_keys
        |FROM events""".stripMargin,
    // twin of [[graft.SparkEntry.cdcKeyPromotion]]: coverage census,
    // majority type label (DuckDB json_type folded to the six JSON
    // labels), and the promotion rank
    "cdc_key_promotion" ->
      """WITH d AS (
        |  SELECT event_id,
        |    '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) ||
        |    CASE WHEN event_type = 'purchase' THEN ',"amount":1' ELSE '' END ||
        |    CASE WHEN event_type = 'error' THEN ',"code":1' ELSE '' END ||
        |    CASE WHEN event_type = 'signup' THEN ',"plan":"p"' ELSE '' END ||
        |    '}' AS doc
        |  FROM events),
        |kv AS (SELECT event_id, doc, unnest(json_keys(doc)) AS key FROM d),
        |lab AS (SELECT key,
        |    CASE WHEN json_type(doc, '$.' || key)
        |           IN ('UBIGINT', 'BIGINT', 'DOUBLE', 'HUGEINT') THEN 'number'
        |         WHEN json_type(doc, '$.' || key) = 'VARCHAR' THEN 'string'
        |         WHEN json_type(doc, '$.' || key) = 'BOOLEAN' THEN 'bool'
        |         WHEN json_type(doc, '$.' || key) = 'OBJECT' THEN 'object'
        |         WHEN json_type(doc, '$.' || key) = 'ARRAY' THEN 'array'
        |         ELSE 'null' END AS vtype
        |  FROM kv),
        |pl AS (SELECT key, vtype, COUNT(*) AS n FROM lab GROUP BY 1, 2),
        |mj AS (SELECT key, vtype FROM (
        |    SELECT key, vtype,
        |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY n DESC, vtype) AS rk
        |    FROM pl) WHERE rk = 1),
        |c AS (SELECT key, COUNT(*) AS n_docs FROM kv GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS total FROM events)
        |SELECT c.key, CAST(c.n_docs AS BIGINT) AS n_docs,
        |  CAST(c.n_docs * 1000 // tot.total AS BIGINT) AS coverage_permille,
        |  mj.vtype,
        |  CAST(ROW_NUMBER() OVER (ORDER BY c.n_docs DESC, c.key) AS BIGINT) AS rnk
        |FROM c JOIN mj ON c.key = mj.key, tot""".stripMargin,
    "cdc_type_census" ->
      """WITH d AS (
        |  SELECT
        |    '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) || ',"v":' ||
        |    CASE WHEN event_id % 6 = 0 THEN CAST(json_extract(props, '$.k') AS VARCHAR)
        |         WHEN event_id % 6 = 1 THEN '"' || CAST(json_extract(props, '$.k') AS VARCHAR) || '"'
        |         WHEN event_id % 6 = 2 THEN 'true'
        |         WHEN event_id % 6 = 3 THEN '{"n":' || CAST(json_extract(props, '$.k') AS VARCHAR) || '}'
        |         WHEN event_id % 6 = 4 THEN '[' || CAST(json_extract(props, '$.k') AS VARCHAR) || ']'
        |         ELSE 'null' END || '}' AS doc
        |  FROM events),
        |kv AS (SELECT doc, unnest(json_keys(doc)) AS key FROM d),
        |typed AS (SELECT key, json_type(doc::JSON, '$.' || key) AS jt FROM kv)
        |SELECT key,
        |  CASE WHEN jt IS NULL OR jt = 'NULL' THEN 'null'
        |       WHEN jt = 'OBJECT' THEN 'object'
        |       WHEN jt = 'ARRAY' THEN 'array'
        |       WHEN jt = 'VARCHAR' THEN 'string'
        |       WHEN jt = 'BOOLEAN' THEN 'bool'
        |       ELSE 'number' END AS vtype,
        |  COUNT(*) AS n
        |FROM typed GROUP BY key, vtype""".stripMargin,
    // type-drift ground truth: first sight of each (key, vtype) PAIR —
    // a type flip on an old key is a new pair (streaming twin:
    // SchemaDrift.typeRows -> alerts, replay-pinned)
    "cdc_type_first_seen" ->
      """WITH d AS (
        |  SELECT event_id,
        |    '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) || ',"v":' ||
        |    CASE WHEN event_id % 6 = 0 THEN CAST(json_extract(props, '$.k') AS VARCHAR)
        |         WHEN event_id % 6 = 1 THEN '"' || CAST(json_extract(props, '$.k') AS VARCHAR) || '"'
        |         WHEN event_id % 6 = 2 THEN 'true'
        |         WHEN event_id % 6 = 3 THEN '{"n":' || CAST(json_extract(props, '$.k') AS VARCHAR) || '}'
        |         WHEN event_id % 6 = 4 THEN '[' || CAST(json_extract(props, '$.k') AS VARCHAR) || ']'
        |         ELSE 'null' END || '}' AS doc
        |  FROM events),
        |kv AS (SELECT event_id, doc, unnest(json_keys(doc)) AS key FROM d),
        |typed AS (SELECT event_id, key, json_type(doc::JSON, '$.' || key) AS jt FROM kv)
        |SELECT key,
        |  CASE WHEN jt IS NULL OR jt = 'NULL' THEN 'null'
        |       WHEN jt = 'OBJECT' THEN 'object'
        |       WHEN jt = 'ARRAY' THEN 'array'
        |       WHEN jt = 'VARCHAR' THEN 'string'
        |       WHEN jt = 'BOOLEAN' THEN 'bool'
        |       ELSE 'number' END AS vtype,
        |  CAST(MIN(event_id) AS BIGINT) AS first_event_id,
        |  COUNT(*) AS n
        |FROM typed GROUP BY key, vtype""".stripMargin,
  )
}
