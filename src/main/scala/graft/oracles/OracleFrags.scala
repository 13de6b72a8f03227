package graft.oracles

import graft.ops.{Curation, Similarity, TextStats}

/** Shared DuckDB SQL fragments for the oracle strings — each is the SQL
  * twin of a Scala-side operator helper and must move in lockstep with it
  * (the Scaladoc on each fragment names its Scala counterpart).
  */
private[graft] object OracleFrags {

  /** Shared SQL fragments for the oracle strings. Mirrors
    * [[graft.cdc.EventLog.opCol]] branch for branch (incl. the dormant
    * TRUNCATE — `CdcStreamSpec` pins the Scala mappings to each other, this
    * copy must move with them).
    */
  val opCase =
    "CASE WHEN event_type = 'signup' THEN 'INSERT' WHEN event_type = 'error' THEN 'DELETE' " +
      "WHEN event_type = 'truncate' THEN 'TRUNCATE' ELSE 'UPDATE' END"

  val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  /** 60-bit md5 hash — DuckDB twin of [[graft.ops.Hashing.h60]]. */
  def h60sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** BM25 scoring CTE chain ending in `c(doc_id, c_micro)` — DuckDB twin of
    * [[graft.ops.TextStats.bm25Search]], shared by `ops_bm25` and
    * `ops_hybrid_rrf` so the formula (k1 = 1.2, b = 0.75, micro-unit
    * snapping) and term list can never fork between the two oracles.
    * `exclude` mirrors bm25Search's query-doc exclusion: the doc leaves the
    * SEARCHABLE corpus, so n_docs / t_tokens / df shift with it. Float
    * literals are e-notation so DuckDB parses them as DOUBLE (a bare 1.2 is
    * DECIMAL and would change the promotion path); per-term contributions
    * snap to integer micro-units before the per-doc sum, exactly like the
    * Spark side, so no float ever accumulates.
    */
  def bm25Cte(exclude: Option[Long]): String = {
    val corpus = exclude.map(id => s" WHERE doc_id <> $id").getOrElse("")
    val terms = TextStats.searchTerms.map(t => s"'$t'").mkString(", ")
    s"""d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |      FROM documents$corpus),
       |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
       |       FROM (SELECT doc_id, unnest(tk) AS tok FROM d)
       |       WHERE tok IN ($terms)
       |       GROUP BY doc_id, tok),
       |dft AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
       |dl AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM d),
       |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |                 CAST(SUM(len(tk)) AS DOUBLE) AS t_tokens FROM d),
       |c AS (
       |  SELECT doc_id,
       |    CAST(round(ln(1.0e0 + (n_docs - df + 0.5e0) / (df + 0.5e0)) * tf * 2.2e0
       |      / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / (t_tokens / n_docs)))
       |      * 1000000.0e0) AS BIGINT) AS c_micro
       |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats)""".stripMargin
  }

  /** Per-doc bigram-LM score CTE chain — DuckDB twin of
    * [[graft.ops.TextStats.bigramFamiliarity]], shared by `ops_bigram_lm`
    * and `ops_quality_mix` so the score definition can never fork.
    */
  val bigramScoreCte: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |b AS (SELECT doc_id,
       |        unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg
       |      FROM t WHERE len(tk) >= 2),
       |h AS (SELECT doc_id, ${h60sql("bg")} AS h FROM b),
       |c AS (SELECT h, COUNT(*) AS cnt FROM h GROUP BY h),
       |score AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(cnt) AS BIGINT) AS sum_freq,
       |    CAST(SUM(cnt) // COUNT(*) AS BIGINT) AS avg_freq
       |  FROM h JOIN c USING (h) GROUP BY doc_id)""".stripMargin

  /** DuckDB twin of the composed corpus filter — shared verbatim by
    * `ops_corpus_filter` (DataFrame form) and `ops_sql_corpus_filter` (the
    * pure-SQL form over the registered native functions): one oracle, two
    * front ends, so the two can never drift apart silently.
    */
  lazy val corpusFilterOracle: String =
    s"""WITH $shinglesCte,
       |hv AS (SELECT doc_id, ${h60sql("shingle")} AS h FROM sh),
       |bench AS (SELECT DISTINCT h FROM hv WHERE doc_id < 5),
       |contaminated AS (
       |  SELECT DISTINCT hv.doc_id FROM hv JOIN bench ON hv.h = bench.h
       |  WHERE hv.doc_id >= 5),
       |filt AS (
       |  SELECT doc_id, lang, text,
       |    string_split(text, ' ') AS t
       |  FROM documents
       |  WHERE doc_id >= 5 AND lang IN ('en', 'de', 'fr', 'es', 'zh')
       |    AND len(string_split(text, ' ')) >= 2),
       |gated AS (
       |  SELECT doc_id, lang, text FROM filt
       |  WHERE (1.0 - CAST(len(list_distinct(list_transform(range(1, len(t)),
       |          i -> t[i] || ' ' || t[i+1]))) AS DOUBLE)
       |        / CAST(len(t) - 1 AS DOUBLE)) <= 0.2),
       |keep AS (
       |  SELECT doc_id, lang FROM gated
       |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
       |SELECT k.doc_id, k.lang FROM keep k
       |WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = k.doc_id)""".stripMargin

  /** Bit-interleave SQL — DuckDB twin of [[graft.sources.Layout.zValue]]. */
  def zInterleaveSql(a: String, b: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** Ordered-fold dot product of two DOUBLE lists — DuckDB twin of
    * [[graft.ops.Similarity.dot]].
    */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, ${Similarity.Dim + 1}), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}))"

  val shinglesCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |         unnest(list_distinct(list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      |       FROM toks WHERE len(t) >= 3)""".stripMargin

  /** MinHash band-bucket candidate pairs as CTEs ending in `cands` — shared
    * by the ops_dedup_minhash oracle and the ops_dedup_verify composition.
    * Expects `sh` from [[shinglesCte]] in scope.
    */
  def minhashCandsCte: String = {
    val perms = graft.ops.Hashing.permutations(16).zipWithIndex
      .map { case ((a, b), j) => s"($j, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
      .mkString(", ")
    s"""perm(j, a, b) AS (VALUES $perms),
       |hs AS (SELECT doc_id, ${h60sql("shingle")} % ${graft.ops.Hashing.P} AS h0 FROM sh),
       |mh AS (
       |  SELECT doc_id, j, MIN((h0 * a + b) % ${graft.ops.Hashing.P}) AS m
       |  FROM hs CROSS JOIN perm
       |  GROUP BY doc_id, j),
       |bands AS (
       |  SELECT doc_id, j // 2 AS band_id, string_agg(CAST(m AS VARCHAR), '-' ORDER BY j) AS sig
       |  FROM mh GROUP BY doc_id, j // 2),
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** SimHash fingerprints as CTEs ending in `fp(doc_id, simhash)` — shared by
    * the ops_simhash oracle and the ops_simhash_pairs banding composition.
    */
  lazy val simhashCte =
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |hh AS (SELECT doc_id, ${h60sql("tok")} AS h FROM toks),
       |votes AS (
       |  SELECT doc_id, j,
       |    SUM(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM hh CROSS JOIN range(60) AS r(j)
       |  GROUP BY doc_id, j),
       |fp AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id)""".stripMargin

  /** DuckDB literal for a constant double list. */
  def listLit(xs: Array[Double]): String =
    xs.map(x => s"CAST($x AS DOUBLE)").mkString("list_value(", ", ", ")")

  def lshBucketSql(v: String, table: Int, numPlanes: Int): String =
    Similarity.planes(table * numPlanes, numPlanes).zipWithIndex.map { case (plane, p) =>
      s"(CASE WHEN ${dotSql(v, listLit(plane))} > 0 THEN CAST(${1L << p} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
