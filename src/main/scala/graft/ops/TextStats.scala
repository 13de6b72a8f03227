package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` table: per-language corpus stats,
  * marker-word language ID, quality scoring, regex token counting, and
  * winnowing-style rolling-hash fingerprints.
  *
  * All numeric outputs are integer counts or divisions of integers (a single
  * deterministic double op), so every query here is oracle-exact.
  */
object TextStats {

  /** Per-language corpus statistics. */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame = {
    // scan→partial-agg shape: fan-out is pure exchange tax (Tables.loadPlain)
    val docs = Tables.loadPlain(spark, sfDir, "documents")
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_tokens")).as("sum_tokens"),
        round(sum(col("n_chars")).cast("double") / sum(col("n_tokens")).cast("double"), 6)
          .as("chars_per_token"))
  }

  /** Tiny deterministic marker-word lists for language ID. The heuristic —
    * argmax over per-language stopword hits — is the standard n-gram/stopword
    * trick; lists are intentionally small and inline (broadcast-sized config,
    * like the reference's redaction map).
    */
  val markers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "to",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que", "es" -> "y",
    "fr" -> "le", "fr" -> "les", "fr" -> "et", "fr" -> "des", "fr" -> "un",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ein",
    "zh" -> "de5", "zh" -> "shi4", "zh" -> "le5", "zh" -> "zai4", "zh" -> "he2")

  /** Language ID: count marker hits per candidate language, pick the argmax
    * (ties broken by language code; docs with zero hits -> 'und').
    *
    * Shape note (kept after measuring the alternative): explode + broadcast
    * join stays in whole-stage codegen and only the marker HITS — a small
    * fraction of the token stream — ever reach the two doc_id shuffles. A
    * fully-narrow higher-order-function rewrite (filter per language over the
    * token array) benched 1.8x slower at sf0.1 because lambda evaluation is
    * interpreted; the codegen'd join wins at every scale.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val m = markers.toDF("cand_lang", "marker")
    val toks = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
    val hits = toks.join(broadcast(m), col("tok") === col("marker"))
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("n_hits"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("n_hits").desc, col("cand_lang"))
    val best = hits.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("doc_id"), col("cand_lang"), col("n_hits"))
    docs.select(col("doc_id"), col("lang"))
      .join(best, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("lang"),
        coalesce(col("cand_lang"), lit("und")).as("pred_lang"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Quality scoring: token count, type-token ratio, stopword ratio, mean
    * token length — the length/punct/stopword-ratio family of heuristics.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val en = markers.filter(_._1 == "en").map(_._2)
    // narrow per-row stats over the token array (no explode, no shuffle):
    // a per-document score must never pay a token-stream shuffle at scale
    val toks = split(lower(col("text")), " ")
    docs
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_types"),
        size(filter(toks, t => t.isin(en: _*))).cast("long").as("n_stop"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("tok_chars"))
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6).as("ttr"),
        round(col("n_stop").cast("double") / col("n_tokens").cast("double"), 6).as("stopword_ratio"),
        round(col("tok_chars").cast("double") / col("n_tokens").cast("double"), 6).as("mean_tok_len"))
  }

  /** Logistic quality scoring with FIXED weights — the SCORING half of a
    * fastText-style quality classifier (the FineWeb/CCNet pattern: train a
    * tiny linear model offline, ship its weights, score the whole corpus
    * with one narrow pass; training + distillation-to-integers live in
    * [[QualityModel]], because learned float weights can't cross engines —
    * published integer weights can). Kept INTEGER-RATIONAL end to end, the
    * PMI discipline: features are per-mille integer ratios, the score is
    * one integer dot product, and `keep ⇔ z > 0 ⇔ σ(z) > 1/2` because the
    * logistic is monotone — so the decision and the ranking are bit-exact
    * in any engine, with none of the exp() libm risk.
    *
    * Shape at 100 TB: same as [[qualityScore]] — per-row token-array
    * arithmetic, no explode, no shuffle, nothing but a scan.
    */
  def qualityLogit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val en = markers.filter(_._1 == "en").map(_._2)
    val toks = split(lower(col("text")), " ")
    docs
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_types"),
        size(filter(toks, t => t.isin(en: _*))).cast("long").as("n_stop"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("tok_chars"))
      .select(col("doc_id"),
        expr("n_types * 1000 div n_tokens").as("ttr_milli"),
        expr("n_stop * 1000 div n_tokens").as("stop_milli"),
        expr("tok_chars * 1000 div n_tokens").as("mlen_milli"),
        col("n_tokens"))
      // w·x in micro-units: diversity + stopword density + a capped length
      // reward − distance from the ~4.5-char natural-language mean token
      // length − bias. Weights are the PUBLISHED MODEL, not magic: swap in
      // a retrained LangModel's (rounded) weights without touching the plan.
      .select(col("doc_id"),
        (col("ttr_milli") * 1000L + col("stop_milli") * 3000L +
          least(col("n_tokens"), lit(500L)) * 800L -
          abs(col("mlen_milli") - 4500L) * 40L - 600000L).as("logit_micro"))
      .select(col("doc_id"), col("logit_micro"),
        (col("logit_micro") > 0L).as("keep"))
  }

  /** BPE-ish regex token counting: alpha runs, digit runs, and single
    * non-alnum marks counted separately (pattern kept in the RE2/Java common
    * subset — SURVEY §7.4 #2).
    */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    // pure per-row projection: fan-out is pure exchange tax (Tables.loadPlain)
    val docs = Tables.loadPlain(spark, sfDir, "documents")
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit("[a-zA-Z]+")).cast("long").as("n_alpha"),
      regexp_count(col("text"), lit("[0-9]+")).cast("long").as("n_num"),
      regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).cast("long").as("n_other"))
  }

  /** Per-stratum length quartiles — the corpus-profiling summary every
    * curation pass starts from (length cutoffs are set off these). Exact
    * `percentile` (sort-based, interpolated), not the t-digest sketch:
    * quartile fractions are dyadic (1/4, 1/2, 3/4), so the interpolation
    * arithmetic over integer lengths is bit-exact in ANY engine — hash-
    * matchable against the oracle, where a sketch could never be. Partial
    * aggregation still applies (percentile's buffer merges across
    * partitions); the shuffle carries per-group buffers, not rows.
    */
  def lengthQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    docs.groupBy(col("lang")).agg(
      expr("percentile(n_chars, 0.25)").as("q25"),
      expr("percentile(n_chars, 0.5)").as("q50"),
      expr("percentile(n_chars, 0.75)").as("q75"),
      count(lit(1)).as("n"))
  }

  /** Winnowing-style document fingerprints: hash each token, take the min
    * hash over every sliding window of `w` consecutive tokens, keep the
    * distinct minima. Standard rolling-hash fingerprinting for near-dup /
    * plagiarism detection; per-doc window => partition-local, scales linearly.
    */
  def fingerprints(spark: SparkSession, sfDir: String, w: Int = 5): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // the sliding min is per-document, so compute it in-row over the hashed
    // token array (slice-min per window) instead of a partitionBy(doc_id)
    // window — that window shape shuffles+sorts the entire token stream; this
    // one is a narrow map and the only shuffle left is the final distinct()
    val toks = split(col("text"), " ")
    docs
      .filter(size(toks) >= w)
      .withColumn("hs", transform(toks, t => Hashing.h60(t)))
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("hs")) - lit(w - 1)),
          i => array_min(slice(col("hs"), i, lit(w)))))).as("fp"))
  }

  /** Full winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — the MOSS
    * fingerprinter; PAPERS.md): hash every word k-gram, slide a window of
    * `w` consecutive gram hashes, and select each window's MINIMUM hash,
    * breaking ties by the RIGHTMOST position — the rule that makes selection
    * local (two documents sharing a run of ≥ w+k-1 words are guaranteed to
    * select at least one common (position-independent) fingerprint, the
    * paper's detection guarantee). Unlike [[fingerprints]] (the positionless
    * window-min sketch), this keeps positions, so matches can be LOCATED,
    * not just detected — the plagiarism/provenance use case.
    *
    * Shape: selection is entirely IN-ROW (gram hashes, per-window min, and
    * the rightmost-argmin all via codegen'd higher-order functions over the
    * token array) — a narrow map stage; the only shuffle is whatever the
    * consumer does with the fingerprints. The DuckDB oracle computes the
    * same selection RELATIONALLY (explode grams, range self-join, window
    * rank) — two independent algorithm shapes agreeing cell-for-cell.
    */
  def winnowing(spark: SparkSession, sfDir: String, k: Int = 3, w: Int = 4): DataFrame =
    winnowingDf(Tables.load(spark, sfDir, "documents"), k, w)

  /** Core of [[winnowing]] over any (doc_id, text) frame — exposed so the
    * detection guarantee (shared run of ≥ w+k-1 words ⇒ shared
    * fingerprint) is property-testable on arbitrary inputs (`PropertySpec`).
    */
  def winnowingDf(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val toks = split(col("text"), " ")
    docs.filter(size(toks) >= w + k - 1)
      .withColumn("t", toks)
      .withColumn("hs", transform(sequence(lit(1), size(col("t")) - (k - 1)),
        i => Hashing.h60(concat_ws(" ",
          (0 until k).map(o => element_at(col("t"), i + o)): _*))))
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("hs")) - (w - 1)), { j =>
          val mn = array_min(slice(col("hs"), j, lit(w)))
          struct(
            array_max(filter(sequence(j, j + (w - 1)),
              p => element_at(col("hs"), p) === mn)).cast("long").as("pos"),
            mn.as("fp"))
        }))).as("s"))
      .select(col("doc_id"), col("s.pos"), col("s.fp"))
  }

  /** Query terms for [[textSearch]] — mid-frequency corpus tokens so the
    * conjunction is selective but non-empty at every SF.
    */
  val searchTerms: Seq[String] = Seq("join", "filter", "stream")

  /** Conjunctive keyword search (every term must appear), ranked by total
    * term frequency — the query side of an inverted text index.
    *
    * Shape: a coarse substring prefilter (`contains` of every term) runs at
    * the scan, so only plausible documents are tokenized at all — it may
    * overmatch ("joins" contains "join"), never undermatch, and the exact
    * whole-token check downstream restores precision. Hits are filtered to
    * the query terms IN-ROW before any shuffle (only query-term postings
    * cross the wire — at 100 TB this is the posting-list fetch of a prebuilt
    * index, whose build is exactly the [[Curation.vocabulary]] shape), then
    * one partial-agg pass per doc counts tf and distinct matched terms;
    * AND-semantics = distinct-count == n_terms. Top-k is
    * TakeOrderedAndProject (per-partition heaps, no global sort) with a
    * `doc_id` tie-break so the cut line is deterministic.
    */
  def textSearch(spark: SparkSession, sfDir: String,
                 terms: Seq[String] = searchTerms, k: Int = 20): DataFrame = {
    // selective prefilter→partial-agg: fan-out would exchange the whole
    // corpus to parallelize a scan the contains() prefilter already guts
    val docs = Tables.loadPlain(spark, sfDir, "documents")
    val prefilter = terms.map(t => col("text").contains(t)).reduce(_ && _)
    docs.filter(prefilter)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("tok")).as("n_terms"),
           count(lit(1)).cast("long").as("tf"))
      .filter(col("n_terms") === terms.size)
      .select(col("doc_id"), col("tf"))
      .orderBy(col("tf").desc, col("doc_id"))
      .limit(k)
  }

  /** Corpus-familiarity score — an unsmoothed bigram-LM proxy: each document
    * scored by the mean corpus frequency of its word bigrams (fluent /
    * in-distribution text reuses corpus-common bigrams; gibberish and
    * boilerplate-with-rare-joins score low). Integer math only (`sum div
    * count`), so the score is hash-exact in any engine — a real LM would sum
    * log-probs, whose floating accumulation is engine-ordered.
    *
    * Shape: ONE scan — bigrams fold in-row ([[Curation.bigramsOf]]) and are
    * reduced to 8-byte hashes before anything shuffles; corpus counts come
    * from a whole-partition window over the bigram hash (one shuffle) instead
    * of a self-join, which would recompute the scan+explode subtree for the
    * count side; then one partial-agg shuffle per doc. The window keys on the
    * full 60-bit hash (high cardinality), but a genuinely degenerate corpus
    * (one bigram dominating) skews that partition — at that extreme, switch
    * to the [[Curation.lineDedup]] shape: a df-capped count table joined back
    * (AQE can split a skewed join; it cannot split a window partition).
    */
  def bigramFamiliarity(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val bg = docs
      .select(col("doc_id"), explode(Curation.bigramsOf(col("text"))).as("bg"))
      .select(col("doc_id"), Hashing.h60(col("bg")).as("h"))
    bg.withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
           sum(col("cnt")).as("sum_freq"))
      .withColumn("avg_freq", expr("sum_freq div n_bigrams"))
  }

  /** Count-Min sketch probe terms — fixed so the oracle can replicate the
    * probe set; mix of corpus-common and absent terms exercises both the
    * collision over-count and the zero path.
    */
  val cmsProbeTerms: Seq[String] =
    Seq("the", "data", "spark", "table", "row", "fast", "merge", "key",
      "value", "hash", "zzz_absent_term")

  val CmsDepth = 4
  val CmsWidth = 1024

  /** Count-Min frequency sketch over the corpus term stream, probed against
    * exact counts. Chosen over Misra-Gries deliberately: CM counters are
    * SUMS, so partial aggregation merges in any order to the same matrix —
    * the sketch is bit-exact and hash-checkable against a sequential oracle,
    * where MG's counter-eviction is merge-order-dependent and could only
    * ever be rows-only-checked (same reasoning as the HLL entry, inverted).
    *
    * Shape at 100 TB: the sketch is d×w = 4096 cells BY CONSTRUCTION,
    * independent of corpus size — the d-per-token explode collapses to
    * ≤ 4096 rows per map partition via partial agg before the one shuffle,
    * and the counter table is the rare join side that is LEGITIMATELY
    * broadcastable at any scale (unlike the corpus-derived agg outputs the
    * merge-hinted joins guard against). Estimates are one-sided:
    * cms_est >= exact_cnt always, equality when no bucket collision in some
    * row — both visible in the output.
    */
  def cmsFrequency(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val terms = docs.select(explode(split(col("text"), " ")).as("term"))
    def buckets = posexplode(array((0 until CmsDepth).map(j =>
      Hashing.h60(j, col("term")) % CmsWidth): _*)).as(Seq("j", "b"))
    val cells = terms.select(buckets)
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("cnt"))
    val probe = cmsProbeTerms.toDF("term").select(col("term"), buckets)
    val est = probe
      .join(broadcast(cells), Seq("j", "b"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    val exact = terms.filter(col("term").isin(cmsProbeTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
    est.join(exact, Seq("term"), "left")
      .select(col("term"), coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
        col("cms_est"))
  }

  /** KMV overlap between two "dumps" of the corpus — the cross-crawl
    * question every recurring ingest asks BEFORE paying for a dedup join:
    * how much of dump B is already in dump A? Two deterministic overlapping
    * dumps (doc_id mod-3 split: A = residues {0,1}, B = {1,2} — residue 1
    * shared), one [[graft.functions.KMinValues]] bottom-k sketch per dump
    * over `xxhash64(text)`, cardinalities and the θ-cut intersection
    * estimated from 2·k longs.
    *
    * Shape at 100 TB: ONE scan per dump, k longs per map partition riding
    * each shuffle (partial-agg merge = the union sketch), estimates
    * combined driver-side from two k-long arrays — the exact-join
    * alternative shuffles both dumps by content hash. The exact recompute
    * below exists for the GATE (and is the sf-scale oracle's arithmetic);
    * the production path is the sketch alone.
    *
    * Gate: exact counts cross-engine-hashed, plus `within_bounds` — the
    * 5σ KMV contract (σ/|S| ≈ 1/√(k-2); intersection adds the binomial
    * θ-cut term) — literally TRUE in the oracle, same discipline as the
    * HLL and GK gates. At sf0.01 (500 docs < k) the sketch is in its
    * exact regime; sf0.1 (5000 docs, dumps > k) estimates for real.
    * `KMinValuesSpec` pins content equality to the brute-force bottom-k,
    * merge-invariance under repartitioning, and estimation error at 40×k.
    */
  def kmvDumpOverlap(spark: SparkSession, sfDir: String, k: Int = 1024): DataFrame = {
    import spark.implicits._
    import graft.functions.KMinValues
    val docs = Tables.load(spark, sfDir, "documents")
    val kmv = KMinValues.sketch(k)
    def dumpSketch(cond: org.apache.spark.sql.Column): KMinValues.Buf =
      docs.filter(cond).select(xxhash64(col("text")).as("h"))
        .agg(kmv(col("h"))).as[Array[Long]].head() // k longs — bounded scalar witness
    val inA = col("doc_id") % 3 <= 1
    val inB = col("doc_id") % 3 >= 1
    val skA = dumpSketch(inA)
    val skB = dumpSketch(inB)
    val estA = KMinValues.estimateDistinct(skA, k)
    val estB = KMinValues.estimateDistinct(skB, k)
    val (estUnion, estInter) = KMinValues.estimateOverlap(skA, skB, k)
    // exact recompute at distinct-TEXT grain (set semantics — a text
    // appearing in both dumps under different doc_ids is one shared item)
    val ex = docs.groupBy(col("text"))
      .agg(max(when(inA, 1).otherwise(0)).as("in_a"),
           max(when(inB, 1).otherwise(0)).as("in_b"))
      .agg(sum(col("in_a")).cast("long").as("a"),
           sum(col("in_b")).cast("long").as("b"),
           sum(col("in_a") * col("in_b")).cast("long").as("i"))
      .head()
    val (exactA, exactB, exactInter) = (ex.getLong(0), ex.getLong(1), ex.getLong(2))
    val exactUnion = exactA + exactB - exactInter
    val tolCard = 5.0 / math.sqrt((k - 2).toDouble)
    def okCard(est: Double, exact: Long): Boolean =
      math.abs(est - exact) <= tolCard * exact
    // θ-cut binomial term: common-below-θ ~ Binomial(k, ρ), so the
    // intersection estimate carries 5·√(ρ(1-ρ)/k)·|A∪B| on top of the
    // union's own cardinality error
    val rho = exactInter.toDouble / exactUnion
    val tolInter = 5.0 * math.sqrt(rho * (1 - rho) / k) * exactUnion +
      tolCard * exactInter
    val within = okCard(estA, exactA) && okCard(estB, exactB) &&
      okCard(estUnion, exactUnion) && math.abs(estInter - exactInter) <= tolInter
    Seq((exactA, exactB, exactInter, within))
      .toDF("exact_a", "exact_b", "exact_inter", "within_bounds")
  }

  /** Corpus word-association mining: skip-gram co-occurrence counts within a
    * ±`window` token distance, scored by a PMI-proxy kept RATIONAL —
    * cxy·T·1000 div (cx·cy), the argument of the PMI log as a milli-scaled
    * integer (log is monotone, so ranking by the ratio IS ranking by PMI,
    * with none of the cross-engine libm risk). The standard collocation /
    * phrase-mining pass before tokenizer or vocab training.
    *
    * Shape: pair generation is IN-ROW (transform over the token array against
    * its own sliced tail — no position explode, no positional self-join), so
    * nothing token-shaped shuffles until the (x, y) partial agg. Unigram
    * counts come from one more partial agg of the same scan; the two lookups
    * of the vocab-sized count table are merge-hinted SHUFFLE joins — the
    * vocabulary of a 100 TB corpus is itself corpus-sized, and broadcasting a
    * corpus-derived aggregate is the scale trap the line-dedup membership
    * join documents. Total token count rides as the one-row broadcast. Output
    * is top-k by (ratio, x, y) via TakeOrderedAndProject; the min-count floor
    * kills the noise pairs that dominate raw PMI.
    */
  def skipgramPmi(spark: SparkSession, sfDir: String, window: Int = 2,
                  minPairCount: Int = 5, k: Int = 50): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val t = split(col("text"), " ")
    val pairs = flatten(transform(t, (x, i) =>
      transform(slice(t, i + lit(2), lit(window)), y =>
        struct(x.as("x"), y.as("y")))))
    val pc = docs.select(explode(pairs).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("cxy"))
    val uni = docs.select(explode(t).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val tot = docs.agg(sum(size(t).cast("long")).as("t_tokens"))
    pc.filter(col("cxy") >= minPairCount)
      .join(uni.select(col("w").as("x"), col("cw").as("cx")).hint("merge"), Seq("x"))
      .join(uni.select(col("w").as("y"), col("cw").as("cy")).hint("merge"), Seq("y"))
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("cxy"), col("cx"), col("cy"),
        expr("""CAST(CAST(cxy AS DECIMAL(38,0)) * t_tokens * 1000
               |     div (CAST(cx AS DECIMAL(38,0)) * cy) AS BIGINT)""".stripMargin)
          .as("pmi_ratio_milli"))
      .orderBy(col("pmi_ratio_milli").desc, col("x"), col("y"))
      .limit(k)
  }

  /** BM25-ranked DISJUNCTIVE search over [[searchTerms]] (any term matches,
    * unlike [[textSearch]]'s conjunction) — the ranking function actual
    * retrieval stacks use, with the standard k1 = 1.2, b = 0.75. Hash-exact
    * across engines: each (doc, term) contribution is computed once in double
    * (exact integer inputs, identical operation sequence) and SNAPPED to an
    * integer micro-unit; the per-doc score is then an INTEGER sum — immune to
    * the engine-ordered float accumulation that makes naive BM25
    * unverifiable (same discipline as [[graft.ops.Relational.regressionStats]]:
    * exact sums, floats only in a final deterministic formula — here the
    * float step is per-term, so the sum must be integer instead).
    *
    * Shape: term postings are filtered IN-ROW before any shuffle (only
    * query-term hits travel — the posting-fetch shape of [[textSearch]]);
    * document length joins back from a narrow per-doc projection of the same
    * scan; df (≤ |terms| rows) and the corpus length stats (one row) ride as
    * broadcasts. Top-k is TakeOrderedAndProject with doc_id tie-break.
    */
  def bm25Search(spark: SparkSession, sfDir: String,
                 terms: Seq[String] = searchTerms, k: Int = 20,
                 exclude: Option[Long] = None): DataFrame = {
    // `exclude` drops a query document from the SEARCHABLE corpus (so the
    // corpus stats n_docs / t_tokens / df shift with it — the document is
    // not retrievable, so it must not weigh the ranking either); used by
    // [[graft.ops.Similarity.hybridRrf]] where doc 0 plays the query role.
    val docs = exclude.foldLeft(Tables.load(spark, sfDir, "documents"))(
      (d, id) => d.filter(col("doc_id") =!= id))
    val toks = split(lower(col("text")), " ")
    val tf = docs.select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
    val dl = docs.select(col("doc_id"), size(toks).cast("double").as("dl"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(size(toks).cast("long")).cast("double").as("t_tokens"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / (col("t_tokens") / col("n_docs")))
    val contrib = idf * col("tf") * lit(2.2) / denom
    tf.join(broadcast(dft), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round(contrib * lit(1e6)).cast("long").as("c_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-document token-distribution Shannon entropy — the information-
    * density quality signal (low entropy = repetitive boilerplate / keyword
    * stuffing; high = diverse text). H = ln(n) − (Σ c·ln c)/n over the token
    * counts c. Floats ARE involved (ln), but the accumulation is made
    * engine-exact by folding LEFT-TO-RIGHT over the SORTED count list in
    * both engines — identical addend sequence, identical partial sums, so
    * the rounded output hash-matches (equal counts yield equal addends, so
    * ties in the sort order cannot perturb the sum).
    *
    * Shape: one (doc, token-hash) partial agg — the only token-shaped
    * shuffle — then counts collapse to a per-doc sorted array (bounded by
    * per-doc vocabulary, not corpus vocabulary) and the fold is in-row.
    * Token identity is not needed after the count agg, so the shuffle
    * carries 8-byte hashes ([[bigramFamiliarity]]'s trick).
    */
  def tokenEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), Hashing.h60(col("tok")).as("h"))
      .groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
           count(lit(1)).as("n_types"),
           sort_array(collect_list(col("c").cast("double"))).as("cs"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(
          log(col("n_tokens").cast("double")) -
            aggregate(col("cs"), lit(0.0), (acc, c) => acc + c * log(c)) /
              col("n_tokens").cast("double"),
          6).as("entropy"))
  }

  /** Per-document top-k terms by TF-IDF (tf * ln(N/df)) — the classic
    * keyword/topic extraction pass over a corpus.
    *
    * Shape: tf is one partial-agg shuffle on (doc, term); df is a COUNT
    * window over term on the tf table — (doc, term) is already distinct, and
    * the window (same trick as [[bigramFamiliarity]]) costs one shuffle
    * WITHOUT the self-join that would recompute the scan+tokenize+agg
    * subtree for the count side (plan-audited: 2 scans, not 3). N rides in
    * as a one-row broadcast (the intentional scalar-subquery shape).
    * Ranking orders on the ROUNDED score
    * (the value the oracle hash-checks) with a term tie-break, so rank is
    * exactly as cross-engine-deterministic as the score column itself —
    * ranking on the raw double would let two analytically-equal scores
    * computed by different libm paths (e.g. 2·ln10 vs ln100) flip order
    * between engines while both outputs round identically.
    */
  def tfidfTopTerms(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 6))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rnk", row_number().over(byDoc))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("term"),
        col("tf"), col("df"), col("tfidf"))
  }

  /** Heavy hitters — tokens with frequency above n/`capacity` — via the
    * sketch-then-verify two-pass that makes a Misra–Gries summary
    * DETERMINISTIC end to end: pass 1 reduces the corpus to one capacity-m
    * summary (plus the exact token total, riding the same aggregation), whose
    * keys are a GUARANTEED superset of every true heavy hitter
    * ([[graft.functions.MisraGries]]: anything above n/(m+1) survives any
    * merge order); pass 2 re-counts ONLY the ≤ m candidate tokens exactly
    * (broadcast filter join — the shuffle carries ≤ m keys, never the
    * domain) and keeps those exceeding the threshold. Merge-order
    * sensitivity lives only in which NON-heavy keys pad the candidate set,
    * and the exact pass discards precisely those — so the output
    * hash-matches a plain GROUP BY / HAVING oracle while never aggregating
    * the full domain: at 100 TB, pass 1 ships capacity-m maps per partition
    * and pass 2 ships ≤ m counter rows, vs. a full-vocabulary shuffle for
    * the naive form.
    */
  /** BPE pair statistics — the counting pass of byte-pair-encoding tokenizer
    * training: corpus-wide frequencies of adjacent character pairs inside
    * words, weighted by word frequency. The scale move is TYPES VS TOKENS:
    * the corpus reduces to its vocabulary FIRST (distinct word + count — a
    * partial agg whose output grows by Heaps' law, sublinearly in corpus
    * size), and the character-pair explode runs in-row over each TYPE once,
    * weighted by its count — at 100 TB the token stream is trillions of
    * rows but the type table is millions, and the pair census shuffles
    * types. Exploding pairs from every token occurrence — the naive form —
    * does 1000× the generator work for identical output. Each BPE merge
    * iteration re-runs exactly this pass over the re-segmented vocab.
    */
  def bpePairStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .filter(length(col("tok")) >= 2)
    vocab
      .select(col("n"),
        explode(expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
          .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_positions"), sum(col("n")).as("pair_count"))
  }

  /** BPE merge TRAINING LOOP (Sennrich et al. 2016, PAPERS.md) — the step
    * [[bpePairStats]] only scores once, iterated: each round selects the
    * corpus-weighted top adjacent symbol pair (deterministic tie-break:
    * count desc, pair asc) and APPLIES it to the vocabulary by replacing
    * the pair with a fresh single-symbol marker (chr(round) — outside the
    * corpus alphabet, so merged symbols can never collide with text and
    * distinct types stay distinct). Emits one row per round: the merge
    * rule, its selection count, and the number of corpus occurrences it
    * actually collapsed (= Σ type_freq × length shrinkage — `replace` is
    * left-to-right non-overlapping in both engines, so application counts
    * are engine-exact even on runs like "aaa").
    *
    * Scale shape — the textbook BPE trick: the loop runs on the TYPE
    * vocabulary (Heaps-law sublinear in corpus size), never the corpus;
    * per round = one partial-agg pair count + a ONE-ROW broadcast of the
    * winner + a narrow replace map. `localCheckpoint` between rounds keeps
    * the plan flat (the CC-loop discipline) instead of 2^rounds lineage
    * replication.
    */
  def bpeMerges(spark: SparkSession, sfDir: String, rounds: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .filter(length(col("tok")) >= 2)
      .localCheckpoint()
    val perRound = (1 to rounds).map { r =>
      val marker = (0x0 + r).toChar.toString
      // a prior round can collapse a 2-char type to the 1-char marker;
      // sequence(1, length-1) on those is sequence(1, 0) = the DESCENDING
      // [1, 0], which would emit two spurious single-char "pairs" — DuckDB's
      // range(1, length) is simply empty there, so the per-round >= 2 guard
      // keeps both engines on the same pair universe (round 0's vocab
      // filter only covers the first iteration)
      val top = vocab
        .filter(length(col("tok")) >= 2)
        .select(col("n"),
          explode(expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
            .as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("pair")).limit(1)
      val applied = vocab.join(broadcast(top))
        .select(col("tok"), col("n"), col("pair"), col("pair_count"),
          call_function("replace", col("tok"), col("pair"), lit(marker)).as("tok2"))
        .localCheckpoint()
      vocab = applied.select(col("tok2").as("tok"), col("n"))
      applied.agg(
          first(col("pair")).as("pair"), first(col("pair_count")).as("pair_count"),
          sum(col("n") * (length(col("tok")) - length(col("tok2"))).cast("long"))
            .as("n_applications"))
        .select(lit(r.toLong).as("merge_rank"), col("pair"), col("pair_count"),
          col("n_applications"))
    }
    perRound.reduce(_ unionByName _)
  }

  /** Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
    * 1998, PAPERS.md) — the smoothing the count-based [[bm25Search]]-era
    * stack actually shipped, and still the baseline perplexity filter for
    * corpus quality scoring. With absolute discount D = 3/4:
    *
    *   P_KN(w2|w1) = max(c12 − D, 0)/c1  +  D·N1+(w1·)/c1 · N1+(·w2)/T
    *
    * where N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
    * left contexts of w2 (the "how promiscuous is this word" continuation
    * count that makes KN famous), T = distinct bigram types. Everything is
    * a COUNT, so with D = 3/4 the whole expression is one exact rational:
    *   numer = T·max(4·c12 − 3, 0) + 3·N1+(w1·)·N1+(·w2),  denom = 4·c1·T
    * and `p_kn_micro = (numer · 1e6) DIV denom` is engine-exact. The
    * T·c12·1e6 product can clear int64 at large corpora, so the final
    * scaling runs in decimal(38,0) — the [[Dedup.pagerankDf]] guard
    * discipline, cast back to BIGINT only at the output contract.
    *
    * Scale shape: the classic count-LM pipeline — one corpus pass explodes
    * bigrams into a partial-agg count, then three TYPE-level aggregations
    * (left-context totals, continuation counts both directions, the
    * type-count scalar as a one-row broadcast) joined back on their own
    * grouping keys. No corpus-sized shuffle after the first count; vocab
    * tables follow Heaps' law.
    */
  def knBigramLm(spark: SparkSession, sfDir: String, minCount: Int = 10): DataFrame =
    knScoredTable(Tables.load(spark, sfDir, "documents"), minCount)
      .select(col("w1"), col("w2"), col("c12"),
        expr("CAST((c12 * 1000000) DIV c1 AS BIGINT)").as("p_mle_micro"),
        expr("CAST((numer * 1000000) DIV denom AS BIGINT)").as("p_kn_micro"))

  /** Shared KN scoring core: the bigram-type table with the exact rational
    * (numer, denom) per type. [[knBigramLm]] reads the micro-prob contract
    * from it; [[knPerplexity]] consumes the UNfiltered table (a
    * training-corpus bigram always has c12 >= 1, so scoring never misses).
    * `minCount` prunes the JOIN INPUT, not just the output: the LM
    * statistics (c1, continuation counts, type count) always aggregate the
    * full type table — they define the model — but a reporting cut like
    * knBigramLm's default 10 keeps only ~the head of the Zipf curve, so
    * filtering the left side before the three joins shuffles a fraction of
    * the types (results identical: the filter is on a left-side column, so
    * it commutes with the equi-joins).
    */
  private def knScoredTable(docs: DataFrame, minCount: Int = 1): DataFrame = {
    val bg = graft.functions.WordBigramsKernel.bigrams(col("text"))
    // the bigram-type table feeds FOUR consumers (the joined counts, both
    // continuation aggregations, and the type-count scalar) — checkpoint it
    // so the corpus is scanned ONCE, not once per consumer; the table itself
    // is Heaps-law (type-sized), safe to materialize
    val c12 = graft.Tables.sizedCoalesce(docs.select(explode(bg).as("b"))
      .select(substring_index(col("b"), " ", 1).as("w1"),
        substring_index(col("b"), " ", -1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint())
    val left = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p_w1"))
    val right = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1p_w2"))
    val types = c12.agg(count(lit(1)).as("t_types"))
    (if (minCount > 1) c12.filter(col("c12") >= minCount) else c12)
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .join(broadcast(types))
      // the FACTORS enter decimal before multiplying: t_types·c12 alone can
      // clear int64 at the corpus scale this targets, and a BIGINT-evaluated
      // numerator would wrap silently (non-ANSI) where DuckDB auto-promotes
      // to HUGEINT — casting only the result would guard nothing
      .withColumn("numer",
        col("t_types").cast("decimal(38,0)") * greatest(col("c12") * 4 - 3, lit(0L)) +
          col("n1p_w1").cast("decimal(38,0)") * col("n1p_w2") * 3L)
      .withColumn("denom",
        col("c1").cast("decimal(38,0)") * col("t_types") * 4L)
  }

  /** Per-document perplexity under the trained KN bigram LM ([[knBigramLm]]
    * at minCount = 1) — the standard LM-based quality filter: boilerplate
    * and templated text scores low (its bigrams are corpus-frequent),
    * keyword-stuffed noise scores high. Scoring the training corpus means
    * every bigram occurrence HITS the type table (c12 >= 1 by definition),
    * so no backoff branch and no OOV sentinel is ever needed.
    *
    * Numerics: each occurrence's negative log-prob is ln(denom) − ln(numer)
    * over the LM's exact integers — no micro-truncation, no ln(0) risk
    * (numer >= 3·N1+·N1+ >= 3). Floats enter only at the two ln calls; the
    * per-doc accumulation is engine-exact via the [[tokenEntropy]]
    * discipline — a LEFT fold over the SORTED addend list, identical
    * sequence in both engines — and ppl = exp(mean) is one final float op,
    * rounded to 6.
    *
    * Scale shape: the LM table is type-sized (Heaps-law); scoring is ONE
    * corpus bigram explode shuffled against it on (w1, w2) — the standard
    * LM-scoring join — then a per-doc partial agg whose collected list is
    * bounded by document length, never corpus size.
    */
  def knPerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val lm = knScoredTable(docs)
      .select(col("w1"), col("w2"),
        (log(col("denom").cast("double")) - log(col("numer").cast("double"))).as("nll"))
    val bg = graft.functions.WordBigramsKernel.bigrams(col("text"))
    docs.select(col("doc_id"), explode(bg).as("b"))
      .select(col("doc_id"), substring_index(col("b"), " ", 1).as("w1"),
        substring_index(col("b"), " ", -1).as("w2"))
      .join(lm, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(col("nll"))).as("ls"))
      .select(col("doc_id"), col("n_bigrams"),
        round(exp(aggregate(col("ls"), lit(0.0), (a, x) => a + x) /
          col("n_bigrams").cast("double")), 6).as("ppl"))
  }

  /** BPE ENCODE — applies the merge table [[bpeMerges]] trains to the
    * corpus, the consumer side of the tokenizer loop: each learned pair is
    * replaced (in merge order — later merges may reference earlier markers)
    * and the per-document symbol count before/after reports the achieved
    * compression, the number a tokenizer-budget planner actually needs.
    *
    * Scale shape: training runs on the type vocabulary (Heaps-sublinear);
    * the learned rules pivot into ONE broadcast row, and encoding is a
    * single narrow corpus pass (token explode → nested codegen'd `replace`
    * chain) into a per-doc partial agg. All-integer outputs plus one
    * rounded ratio — engine-exact.
    */
  def bpeEncode(spark: SparkSession, sfDir: String, rounds: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val rules = bpeMerges(spark, sfDir, rounds)
      .agg(max(when(col("merge_rank") === 1, col("pair"))).as("p1"),
        (2 to rounds).map(r =>
          max(when(col("merge_rank") === r, col("pair"))).as(s"p$r")): _*)
    val applied = (1 to rounds).foldLeft(col("tok")) { (c, r) =>
      call_function("replace", c, col(s"p$r"), lit((0x0 + r).toChar.toString))
    }
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .join(broadcast(rules))
      .select(col("doc_id"), col("tok"), applied.as("enc"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("tok")).cast("long")).as("n_symbols_raw"),
        sum(length(col("enc")).cast("long")).as("n_symbols_bpe"))
      .select(col("doc_id"), col("n_tokens"), col("n_symbols_raw"), col("n_symbols_bpe"),
        round(col("n_symbols_raw").cast("double") / col("n_symbols_bpe").cast("double"), 6)
          .as("compression"))
  }

  /** Term-level distribution drift between two corpus halves — the
    * train/validation contamination-and-shift check run before committing a
    * split: documents are assigned to halves by seeded content-free hash
    * (so the split is reproducible and unbiased), and every term with
    * enough mass gets a 2×2 chi-square statistic against the halves'
    * token totals. A clean random split should show no extreme scores; a
    * term that concentrates in one half flags leakage or topical drift.
    * (The numeric-column analog over events is `ops_ks_test`; this is the
    * categorical/vocabulary side.)
    *
    * Shape: ONE corpus pass explodes tokens into a partial-agg per-term
    * count (conditional sums give both halves in the same aggregation);
    * the per-term table is checkpointed for its two consumers (the
    * half totals reduce FROM it, not from a second corpus scan), and the
    * totals ride back as a one-row broadcast. Chi-square is double math in
    * a pinned operand order, rounded to 6 — the same float discipline as
    * every ratio output here.
    */
  def termDrift(spark: SparkSession, sfDir: String, minCount: Int = 20): DataFrame = {
    // scan→partial-agg shape: fan-out is pure exchange tax (Tables.loadPlain)
    val docs = Tables.loadPlain(spark, sfDir, "documents")
    val inA = Hashing.h60(concat(lit("drift:"), col("doc_id").cast("string"))) % 2 === 0
    val perAll = docs
      .select(inA.as("in_a"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
      .localCheckpoint()
      // type-sized two-consumer frame: sizedCoalesce kills the cores-wide
      // rescan stages (same rationale as knScoredTable's c12)
      .transform(graft.Tables.sizedCoalesce(_))
    val tot = perAll.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    val ea = (col("n_a") + col("n_b")).cast("double") * col("t_a") /
      (col("t_a") + col("t_b")).cast("double")
    val eb = (col("n_a") + col("n_b")).cast("double") * col("t_b") /
      (col("t_a") + col("t_b")).cast("double")
    perAll.filter(col("n_a") + col("n_b") >= minCount)
      .join(broadcast(tot))
      .select(col("term"), col("n_a"), col("n_b"),
        round(pow(col("n_a").cast("double") - ea, 2) / ea +
          pow(col("n_b").cast("double") - eb, 2) / eb, 6).as("chi2"))
  }

  def heavyHitters(spark: SparkSession, sfDir: String,
                   capacity: Int = 64): DataFrame = {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val mg = graft.functions.MisraGries.sketch(capacity)
    val cands = toks
      .agg(mg(col("tok")).as("sk"), count(lit(1)).as("n_total"))
      .select(explode(map_keys(col("sk"))).as("tok"), col("n_total"))
    toks.join(broadcast(cands), "tok")
      .groupBy(col("tok"), col("n_total"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * capacity > col("n_total"))
      .select(col("tok"), col("n"))
  }

  /** [[heavyHitters]] PER GROUP — "top domains per language"-class
    * monitoring, the grain real curation dashboards want. Same
    * sketch-then-verify discipline, with the Misra–Gries summary keyed by
    * the group column: pass 1 is one groupBy whose partial aggregation
    * ships a capacity-m map per (partition, group) — never the per-group
    * vocabulary; pass 2 re-counts only the ≤ m candidates of each group
    * exactly behind a broadcast of (group, candidate) pairs (≤ groups × m
    * rows however large the corpus), and keeps those above that GROUP's
    * n/capacity threshold. The MG superset guarantee is per summary, so it
    * holds per group independently — a group's heavy hitter can never be
    * crowded out by another group's traffic, which is exactly the failure
    * mode of running the global sketch and post-filtering by group.
    */
  def groupHeavyHitters(spark: SparkSession, sfDir: String,
                        capacity: Int = 32): DataFrame =
    groupHeavyHittersDf(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok")),
      capacity)

  /** Core of [[groupHeavyHitters]] over (source, tok) rows — the spec
    * drives adversarial per-group fixtures through this.
    */
  def groupHeavyHittersDf(toks: DataFrame, capacity: Int = 32): DataFrame = {
    val mg = graft.functions.MisraGries.sketch(capacity)
    val cands = toks
      .groupBy(col("source"))
      .agg(mg(col("tok")).as("sk"), count(lit(1)).as("n_total"))
      .select(col("source"), explode(map_keys(col("sk"))).as("tok"), col("n_total"))
    toks.join(broadcast(cands), Seq("source", "tok"))
      .groupBy(col("source"), col("tok"), col("n_total"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * capacity > col("n_total"))
      .select(col("source"), col("tok"), col("n"))
  }
}
