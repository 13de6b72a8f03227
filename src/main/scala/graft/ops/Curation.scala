package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation operators over `documents` — the filter/sample/
  * vocabulary stages a 100 TB corpus pipeline runs between ingest and
  * training (C4/Gopher-style quality filtering is the public background).
  *
  * Patterns are kept in the RE2/Java/DuckDB-common regex subset (SURVEY §7.4
  * #2: no backrefs, no lookahead) so the oracle matches character-for-
  * character.
  */
object Curation {

  /** Common-subset PII patterns. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
  val PhoneRe = "[0-9][0-9][0-9][-.][0-9][0-9][0-9][-.][0-9][0-9][0-9][0-9]"

  /** The corpus text is synthetic bag-of-words with no PII, so the demo
    * deterministically plants contacts in a slice of docs (derived purely from
    * driver-table columns — the oracle plants the identical ones). Real
    * pipelines obviously skip this.
    */
  def withPlantedPii(docs: DataFrame): DataFrame =
    docs.withColumn("text2",
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact: user"), col("doc_id"), lit("@example.com")))
      .when(col("doc_id") % 11 === 0,
        concat(col("text"), lit(" tel 555-01"), (col("doc_id") % 10).cast("string"),
          lit(".9876")))
      .otherwise(col("text")))

  /** PII scan + redaction: per-doc match counts and a redacted text — the
    * content-level analog of the reference's field-level redaction (P1,
    * redactions.go:33-52): drop-before-downstream, applied in one narrow
    * codegen'd projection (regexp_count/replace), no shuffle.
    */
  def piiScan(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = withPlantedPii(Tables.load(spark, sfDir, "documents"))
    docs.select(
      col("doc_id"),
      regexp_count(col("text2"), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(col("text2"), lit(PhoneRe)).cast("long").as("n_phone"),
      regexp_replace(regexp_replace(col("text2"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("redacted"))
  }

  /** Deterministic hash sampling: keep ~pct% of docs by a seeded content-free
    * hash of the key — reproducible across engines and runs (rand() is not),
    * stratification-friendly (hash is uniform within any stratum), and
    * pushdown-friendly (a single narrow filter on the scan).
    */
  def hashSample(spark: SparkSession, sfDir: String, pct: Int = 10): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    docs
      .filter(Hashing.h60(concat(lit("sample:"), col("doc_id"))) % 100 < pct)
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  /** Vocabulary building: global top-k tokens by frequency. Partial agg
    * shrinks the shuffle to distinct-tokens-per-partition; top-k is
    * TakeOrderedAndProject (per-partition heaps, never a global sort).
    * Deterministic tie-break on the token itself.
    */
  def vocabulary(spark: SparkSession, sfDir: String, k: Int = 100): DataFrame = {
    // scan→partial-agg shape: fan-out is pure exchange tax (Tables.loadPlain)
    val docs = Tables.loadPlain(spark, sfDir, "documents")
    docs.select(explode(split(lower(col("text")), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)
  }

  /** Stratified sampling — per-stratum keep rates, i.e. the data-mixing
    * weights step of corpus assembly (upsample scarce languages, downsample
    * dominant ones). The rate map is tiny configuration compiled into a CASE
    * chain over the stratum column (broadcast-equivalent, like the redaction
    * map); membership is the same seeded content-free hash as [[hashSample]],
    * so the sample is reproducible across engines/runs and the whole operator
    * is ONE scan-level filter — no shuffle, no rand().
    */
  def stratifiedSample(spark: SparkSession, sfDir: String,
                       rates: Map[String, Int] = Map("en" -> 20, "zh" -> 60),
                       defaultPct: Int = 40): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val pct = rates.toSeq.sortBy(_._1).foldRight(lit(defaultPct): Column) {
      case ((l, p), acc) => when(col("lang") === l, lit(p)).otherwise(acc)
    }
    docs
      .filter(Hashing.h60(concat(lit("strat:"), col("doc_id"))) % 100 < pct)
      .select(col("doc_id"), col("lang"))
  }

  /** Quality-mixed sampling — the DoReMi/quality-mixing composition: bucket
    * documents by corpus-familiarity quartile
    * ([[TextStats.bigramFamiliarity]] score) and keep each bucket at its own
    * rate (upsampling high-quality text, thinning the low tail) with the
    * same seeded content-free hash as the other samplers — reproducible at
    * any parallelism. Quartile boundaries are EXACT percentiles of the
    * integer score (dyadic fractions — bit-exact cross-engine, the
    * `ops_quantiles` argument) and ride back as a ONE-ROW broadcast; the
    * bucket assignment and keep decision are then in-row, so the mix step
    * adds zero shuffles beyond the score computation itself.
    */
  def qualityMix(spark: SparkSession, sfDir: String,
                 ratesPermille: Seq[Int] = Seq(250, 500, 750, 1000)): DataFrame = {
    require(ratesPermille.length == 4)
    // permille-resolution mean (sum*1000 div n): the integer avg_freq is too
    // coarse for quartiles — mass points make p25 == p50 and empty buckets
    val scores = TextStats.bigramFamiliarity(spark, sfDir)
      .withColumn("freq_permille", expr("sum_freq * 1000 div n_bigrams"))
    val bounds = scores.agg(
      expr("percentile(freq_permille, 0.25)").as("p25"),
      expr("percentile(freq_permille, 0.5)").as("p50"),
      expr("percentile(freq_permille, 0.75)").as("p75"))
    val bucket = when(col("freq_permille") <= col("p25"), 0L)
      .when(col("freq_permille") <= col("p50"), 1L)
      .when(col("freq_permille") <= col("p75"), 2L)
      .otherwise(3L)
    val rate = ratesPermille.zipWithIndex.foldRight(lit(ratesPermille.last): Column) {
      case ((p, i), acc) => when(col("bucket") === i.toLong, lit(p)).otherwise(acc)
    }
    scores.join(broadcast(bounds))
      .withColumn("bucket", bucket)
      .filter(Hashing.h60(concat(lit("qmix:"), col("doc_id"))) % 1000 < rate)
      .select(col("doc_id"), col("bucket"), col("freq_permille"))
  }

  /** Sequence packing — assign documents to fixed-token-budget training bins
    * per language: bin = exclusive-prefix token sum over a deterministic
    * order, integer-divided by the budget (first-fit-in-order packing; a doc
    * is never split, so a bin can overshoot by at most one doc — the standard
    * approximation when exact bin packing isn't worth a sequential pass).
    *
    * Two-level prefix sum so parallelism is NOT capped at the language count
    * (a per-lang window = ~5 sorted single-partition streams at ANY data
    * size — the round-2 straggler): each language splits into `shards`
    * deterministic slices (`doc_id % shards`), the heavy exclusive prefix
    * sum runs per (lang, shard) — lang×shards-way parallel — and each
    * shard's bins are offset by the exclusive prefix TOTAL of earlier shards
    * (a lang×shards-row aggregate — trivially small at any corpus size —
    * broadcast back). Packing order is (lang, shard, doc_id): a different
    * deterministic order than one global per-lang stream, equally valid for
    * training bins and exactly reproduced by the oracle.
    */
  def seqPack(spark: SparkSession, sfDir: String, budget: Int = 2048,
              shards: Int = 8): DataFrame =
    // the (lang, shard) window repartitions immediately: a doc_id fan-out
    // exchange ahead of it is discarded work at ANY scale
    seqPackDf(Tables.loadPlain(spark, sfDir, "documents"), budget, shards)

  /** DataFrame-level core of [[seqPack]] over any (doc_id, lang, text)
    * frame — also the packing stage of the composed [[trainPrep]] pipeline.
    */
  def seqPackDf(docs: DataFrame, budget: Int = 2048,
                shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      col("doc_id"), col("lang"),
      (col("doc_id") % shards).as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // heavy level: shard-local exclusive prefix sum (the 100 TB work),
    // partitioned (lang, shard) — parallel within each language
    val wLocal = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("local_prev",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    // light level: exclusive prefix of the per-shard totals — `shards` rows
    // per language, so the per-lang window here is over a handful of rows
    val wShard = Window.partitionBy(col("lang")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tokens")).as("shard_total"))
      .withColumn("shard_offset", coalesce(sum(col("shard_total")).over(wShard), lit(0L)))
      .select(col("lang"), col("shard"), col("shard_offset"))
    local
      .join(broadcast(offsets), Seq("lang", "shard"))
      // integer `div`, not double /: exact at any magnitude
      .withColumn("bin", expr(s"(shard_offset + local_prev) div $budget"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin"))
  }

  /** Benchmark decontamination — the train/test-overlap scan every serious
    * LLM corpus pipeline runs before training: find corpus documents sharing
    * any word n-gram with the evaluation set, so contaminated docs can be
    * dropped (n-gram-overlap decontamination, the GPT-3/PaLM-style published
    * procedure). Here the "benchmark" is the deterministic slice doc_id <
    * benchDocs so the oracle can reproduce it; a real run points `bench` at
    * the eval-set texts.
    *
    * Scale shape: the benchmark shingle set is SMALL by construction (eval
    * sets are a few thousand items) — aggregated to distinct hashes and
    * broadcast, so the corpus side is ONE scan + a broadcast hash join (no
    * shuffle) followed by one partial-agg groupBy. Counting DISTINCT matched
    * shingles per doc keeps the metric stable under repeated shingles.
    */
  def decontaminate(spark: SparkSession, sfDir: String, benchDocs: Long = 5): DataFrame =
    contaminatedHits(Tables.load(spark, sfDir, "documents"), benchDocs)
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("h")).as("n_hits"))

  /** (doc_id, h) rows for corpus shingles colliding with the benchmark set —
    * the shared build side of [[decontaminate]] (which counts hits) and
    * [[corpusFilter]] (which only needs the distinct ids, skipping the
    * count-distinct buffers).
    */
  private def contaminatedHits(docs: DataFrame, benchDocs: Long): DataFrame = {
    val sh = Dedup.shingles(docs)
      .select(col("doc_id"), Hashing.h60(col("shingle")).as("h"))
    val bench = sh.filter(col("doc_id") < benchDocs).select(col("h")).distinct()
    sh.filter(col("doc_id") >= benchDocs).join(broadcast(bench), "h")
  }

  /** The composed curation pipeline — the LLM-side flagship, the analog of
    * `cdc_pipeline` for corpus assembly: one declarative plan keeps a doc iff
    * it (a) is in an allowed language, (b) passes the Gopher-style repetition
    * gate, (c) is the canonical copy of its exact-content group (lowest
    * doc_id per md5), and (d) shares no n-gram with the benchmark slice.
    *
    * Plan shape: narrow quality exprs fold in-row on the scan; exact-dedup
    * keep is ONE window shuffle on the content hash (`row_number`, no join);
    * contamination is a LEFT ANTI join against the (small, broadcastable)
    * contaminated-id set. Catalyst fuses the whole thing the way the per-doc
    * Go/Python curation scripts this replaces cannot.
    */
  def corpusFilter(spark: SparkSession, sfDir: String,
                   langs: Seq[String] = Seq("en", "de", "fr", "es", "zh"),
                   maxDupRatio: Double = 0.2, benchDocs: Long = 5): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = size(split(col("text"), " "))
    val bg = bigramsOf(col("text"))
    val dupRatio = lit(1.0) -
      size(array_distinct(bg)).cast("double") / size(bg).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val contaminated = contaminatedHits(docs, benchDocs).select(col("doc_id")).distinct()
    docs
      .filter(col("doc_id") >= benchDocs && col("lang").isin(langs: _*) &&
        n >= 2 && dupRatio <= maxDupRatio)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      // the contaminated set is an aggregate output Catalyst can't always
      // size-estimate under the broadcast threshold — pin the hint (it is
      // bounded by benchmark overlap, small by construction)
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"))
  }

  /** Word-bigram array of a text column — the Gopher repetition gate's unit,
    * shared by [[repetitionScore]] and [[corpusFilter]] so the standalone
    * signal and the composed flagship can never desynchronize.
    */
  private[ops] def bigramsOf(textCol: Column): Column =
    // native since round 4 — bit-identical to
    // zip_with(slice(split(t," "),1,n-1), slice(...,2,n-1), concat):
    // see functions/WordBigramsExpr.scala for the tokenization contract
    graft.functions.WordBigramsKernel.bigrams(textCol)

  /** Document chunking — split each document into fixed-token windows with
    * overlap (stride < window), the standard context-length prep before
    * tokenization/embedding: chunk starts at 0, stride, 2·stride, … while
    * inside the doc; a doc shorter than the window yields one (short) chunk;
    * docs are never merged across boundaries.
    *
    * Scale shape: `sequence()` + explode computes the starts IN-ROW — the
    * fan-out is ceil(n_tokens/stride) rows per doc with no shuffle at all,
    * and the chunk text is a slice of the already-split token array (no
    * re-tokenization per chunk). At 100 TB this is a pure map stage that
    * chains straight into the embedding/tokenizer stage behind it.
    */
  def chunkDocs(spark: SparkSession, sfDir: String,
                window: Int = 50, stride: Int = 40): DataFrame = {
    require(stride > 0 && window >= stride, "overlapping fixed windows need 0 < stride <= window")
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(stride))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_idx"),
        // slice is 1-based; a trailing partial window is kept (real pipelines
        // pad or drop it at tokenization — policy, not chunking)
        slice(col("t"), col("start") + 1, lit(window)).as("chunk"))
      .select(
        col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_hash"))
  }

  /** Weighted (importance) sampling: keep probability proportional to a
    * per-row weight — here document length capped at 100 % — instead of the
    * uniform rate of [[hashSample]]. Same seeded content-free hash, so the
    * draw is reproducible and consistent under re-runs; weight and threshold
    * are integer permille math (no float boundary to drift across engines).
    * Still ONE scan-level filter: weight comes from the row itself, so the
    * operator is shuffle-free at any corpus size.
    */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // permille weight: 2 per character, capped at 1000 (docs >= 500 chars
    // are always kept) — longer docs are likelier survivors
    val weight = least(col("n_chars") * 2, lit(1000L))
    docs
      .filter(Hashing.h60(concat(lit("wsamp:"), col("doc_id"))) % 1000 < weight)
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  /** Fixed-SIZE per-group sampling — exactly min(k, |group|) docs per
    * language — the reservoir-sample complement to the rate-based
    * [[stratifiedSample]] (a rate can't promise "give me exactly 50 eval
    * docs per language"). Deterministic reservoir: rank by the seeded
    * content-free hash (a uniform random permutation within each group,
    * reproducible across engines/runs) and keep the first k. One window
    * shuffle on the group key; at 100 TB group count × k bounds the output,
    * and heavy groups cost their row count in the one sort — the same
    * shape as any top-k-per-group.
    */
  def groupSample(spark: SparkSession, sfDir: String, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
    val w = Window.partitionBy(col("lang"))
      .orderBy(Hashing.h60(concat(lit("gsamp:"), col("doc_id"))), col("doc_id"))
    docs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
  }

  /** Line-level dedup (CCNet/RefinedWeb-style boilerplate removal): split
    * each document into fixed-length token lines, drop every line whose hash
    * appears in more than `maxDf` distinct documents (headers, footers,
    * navigation chrome — the content that repeats ACROSS pages), and emit
    * each surviving document's kept-line signature. Operates on hashes end to
    * end — line text never shuffles.
    *
    * Scale shape: line splitting is in-row (`sequence()` + explode, the
    * [[chunkDocs]] fan-out); the line-frequency table is built with one
    * partial-agg distinct count; membership is a SHUFFLE join on the line
    * hash — deliberately not a broadcast, because at 100 TB the
    * repeated-line set is corpus-sized (every boilerplate line on the web),
    * exactly the case where a broadcast assumption falls over. Reassembly is
    * one groupBy on doc_id. A doc whose every line is boilerplate drops out
    * entirely (inner join) — the correct curation outcome.
    *
    * Known trade: the `lines` explode evaluates once per consumer (the df
    * census and the join probe have structurally different exchange
    * subtrees, so runtime exchange reuse cannot apply) — the narrow in-row
    * split is recomputed rather than materialized. The single-evaluation
    * alternative, a `collect_set(doc_id)` window over line_hash, buffers
    * every occurrence of a boilerplate line in one partition — blowing up on
    * exactly the skew this operator exists to remove.
    */
  def lineDedup(spark: SparkSession, sfDir: String,
                lineLen: Int = 10, maxDf: Int = 1): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val t = split(col("text"), " ")
    val lines = docs
      .select(col("doc_id"), t.as("t"),
        explode(sequence(lit(0), size(t) - 1, lit(lineLen))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / lineLen).cast("long").as("line_idx"),
        Hashing.h60(array_join(slice(col("t"), col("start") + 1, lit(lineLen)), " "))
          .as("line_hash"))
    val lineDf = lines.groupBy(col("line_hash"))
      .agg(count_distinct(col("doc_id")).as("df"))
    // merge hint: with df <= maxDf the kept set is the UNIQUE lines — nearly
    // the whole line table — so Catalyst's size guess (an agg output it can't
    // estimate) must not pick broadcast; both sides shuffle on the line hash
    lines.join(lineDf.filter(col("df") <= maxDf).hint("merge"), "line_hash")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("line_idx"), col("line_hash")))),
            x => x.getField("line_hash").cast("string")))).as("kept_sig"))
  }

  /** Deterministic training-order shuffle: the "global random shuffle" every
    * training run needs, done the way 100 TB allows — not ONE global sort
    * (a single-partition window is a non-starter) but hash-sharding: shard =
    * seeded content-free hash mod `shards`, position = rank within the shard
    * by the same hash. The hash is a reproducible uniform permutation, so
    * (shard, pos) is a deterministic shuffled order any reader can replay;
    * parallelism is `shards`-way regardless of corpus size, and each shard's
    * window sort carries ~n/shards rows. Readers stream shards in index
    * order — the standard sharded-shuffle contract of training-data loaders.
    */
  def shuffleShards(spark: SparkSession, sfDir: String, shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Hashing.h60(concat(lit("shuf:"), col("doc_id")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), (h % shards).as("shard"), h.as("h"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Gopher-style repetition signal: fraction of duplicate word bigrams per
    * document — high values flag boilerplate/spam. Computed in-row over the
    * token array (narrow, zero shuffle): duplicated-bigram ratio =
    * 1 - distinct/total.
    */
  def repetitionScore(spark: SparkSession, sfDir: String): DataFrame = {
    val n = size(split(col("text"), " "))
    val bigrams = bigramsOf(col("text"))
    Tables.load(spark, sfDir, "documents")
      .filter(n >= 2)
      .select(
        col("doc_id"),
        size(bigrams).cast("long").as("n_bigrams"),
        size(array_distinct(bigrams)).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_bigrams"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("dup_bigram_ratio"))
  }

  /** Filter attribution — the observability side of a Gopher/MassiveText
    * quality gate: instead of silently dropping documents, score every doc
    * against the full rule set and report the HISTOGRAM OF RULE-FAILURE
    * COMBINATIONS (bitmask → doc count). In a real pipeline this is the
    * artifact you read before committing a gate: which rules kill how much
    * data, and which co-fire (a spam doc failing repetition usually also
    * fails the stopword rule — visible here, invisible in per-rule totals).
    *
    * Rules (bit set = FAILED; all thresholds exact integer
    * cross-multiplications, no float division to diverge between engines):
    *   bit 0 — word count outside [20, 2000]
    *   bit 1 — mean word length outside [3, 12]  (sum_chars vs 3n / 12n)
    *   bit 2 — symbol ratio > 10%               (10 * n_sym > n_chars)
    *   bit 3 — no common stopword present
    *   bit 4 — duplicate-bigram ratio > 20%     (5 * n_dup > n_bigrams)
    *
    * The base corpus is clean synthetic text, so — same discipline as
    * `ops_dq_audit` — deterministic violating docs are added (each
    * derived from a `% prime` slice of the base, replayed identically in the
    * oracle), proving every rule and several multi-rule combinations fire:
    * symbol-spiked (bit 2), a 2200-word spam repeat (bits 0+3+4), a tiny doc
    * (0+3), a long-word repeat (1+3+4), and an `a a a …` doc (1+4).
    *
    * Scale shape: every rule is an in-row fold over the token array — one
    * scan, one partial agg on a key whose cardinality is ≤ 2^5 regardless of
    * corpus size. Planting is an in-row conditional explode riding the one
    * scan — pure map fan-out. Zero joins.
    */
  def filterAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    // planted violators ride the SAME scan as the base rows: each doc emits
    // its original text plus any slice-conditional variants via an in-row
    // conditional array + explode (a 5-way filter-union would re-scan the
    // corpus six times; this is one scan, pure map fan-out)
    val variants = array(
      col("text"),
      when(col("doc_id") % 97 === 0, concat(col("text"),
        expr("repeat(' #$%!', CAST((length(text) div 20) + 1 AS INT))"))),
      when(col("doc_id") % 89 === 0, trim(expr("repeat('spam ham ', 1100)"))),
      when(col("doc_id") % 83 === 0, lit("tiny doc")),
      when(col("doc_id") % 79 === 0,
        trim(expr("repeat('pneumonoultramicroscopicsilicovolcanoconiosis ', 30)"))),
      when(col("doc_id") % 73 === 0, trim(expr("repeat('a ', 40)"))))
    val all = docs.select(
      explode(filter(variants, v => v.isNotNull)).as("text"))
    all.select(ruleBitmask(col("text")).as("bitmask"))
      .groupBy(col("bitmask"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("bitmask"), bit_count(col("bitmask")).cast("long").as("n_rules_failed"),
        col("n_docs"))
  }

  /** The composed training-data-prep pipeline — the library's stages chained
    * as ONE declarative plan, the way a real pre-training run would consume
    * them: quality gate (the [[ruleBitmask]] five-rule screen, all rules
    * pass) → exact content dedup (keep lowest doc_id per md5) → fixed-budget
    * sequence packing ([[seqPackDf]]'s two-level prefix sum) → the per-
    * (lang, bin) block manifest a loader would read.
    *
    * The point is the COMPOSITION property: every stage is in-row or
    * partial-agg shaped, so Catalyst fuses the gate into the dedup window's
    * scan, the pack consumes the dedup output without re-materializing, and
    * the whole prep of a 100 TB corpus is one lineage — no intermediate
    * tables, no driver round-trips, one job. Output is block-grain (bins ×
    * langs), thousands of rows at any corpus size.
    */
  def trainPrep(spark: SparkSession, sfDir: String, budget: Int = 2048,
                shards: Int = 8): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val clean = docs.filter(ruleBitmask(col("text")) === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = clean
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    seqPackDf(deduped, budget, shards)
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }

  /** Training-mixture allocation — the domain-reweighting step every LLM
    * data pipeline runs between curation and packing (the Pile / DoReMi
    * shape: per-domain target weights → per-domain sampling rates): given
    * measured token mass per domain (here `lang`) and a target weight
    * vector, compute each domain's token budget under a half-corpus
    * training target, its sampling rate, and its epoch count (> 1 = the
    * domain is up-sampled, i.e. repeated).
    *
    * Numerics: the budget split is EXACT integer math — `(total * w) DIV
    * 200` fuses the half-budget and the percent split into one integer
    * floor-division, so engines can't diverge on intermediate floats; only
    * the final rate/epoch ratios are doubles, rounded to 6 like every ratio
    * output here. Scale shape: one partial-agg groupBy over the corpus
    * (domain cardinality is tiny), total rides back as a ONE-ROW broadcast —
    * no second corpus pass, no driver collect.
    */
  def domainMix(spark: SparkSession, sfDir: String): DataFrame = {
    val weight = coalesce(element_at(
      map(lit("en"), lit(40L), lit("zh"), lit(20L), lit("de"), lit(15L),
        lit("fr"), lit(15L), lit("es"), lit(10L)), col("lang")), lit(0L))
    val per = perLangTokens(spark, sfDir)
    val tot = per.agg(sum(col("n_tokens")).as("tot"))
    per.join(broadcast(tot))
      .withColumn("weight", weight)
      // domains outside the target mixture are DROPPED, not carried at
      // weight 0 — the oracle's inner join on the weight table does the
      // same, so both engines agree on the row universe if `documents`
      // ever grows a sixth lang (and no 0-rate row can ever surface)
      .filter(col("weight") > 0)
      .withColumn("target_tokens", expr("(tot * weight) DIV 200"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_tokens"),
        round(least(lit(1.0),
          col("target_tokens").cast("double") / col("n_tokens").cast("double")), 6)
          .as("sample_rate"),
        round(col("target_tokens").cast("double") / col("n_tokens").cast("double"), 6)
          .as("epochs"))
  }

  /** URL-keyed dedup with canonicalization — the CommonCrawl-style first
    * dedup pass: the same page arrives under scheme/case variants, tracking
    * parameters, trailing slashes, and fragments, so raw-URL grouping
    * under-merges. Canonical form = lowercase, scheme and `www.` stripped,
    * `utm_*` tracking parameters removed (non-tracking params like `id=`
    * are KEPT — the two-step regex removes a tracking param whether or not
    * another parameter follows it), fragment dropped, trailing slash
    * trimmed. URLs are synthesized deterministically from driver columns
    * (same discipline as the planted-PII set): id-keyed variants guarantee
    * every canonicalization rule fires, and (source, lang, doc_id % 40)
    * page keys guarantee genuine cross-doc collisions.
    *
    * Scale shape: canonicalization is a pure codegen'd map (a regex chain);
    * the group-collapse is ONE hash groupBy on the canonical key with
    * partial aggregation — the exact-dedup plan, keyed by URL instead of
    * content hash. All regexes are RE2-safe (no lookaround/backrefs), so
    * the DuckDB oracle applies the identical patterns with the 'g' flag.
    */
  def urlDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // regex-chain projection folds into the scan, then one partial-agg
    // groupBy: fan-out is pure exchange tax (Tables.loadPlain)
    val docs = Tables.loadPlain(spark, sfDir, "documents")
    val url = concat(
      when(col("doc_id") % 3 === 1, lit("HTTP://")).otherwise(lit("https://")),
      when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit(".example.com/"), col("lang"),
      lit("/page-"), (col("doc_id") % 40).cast("string"),
      when(col("doc_id") % 2 === 1 && col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 2 === 0 && col("doc_id") % 4 === 0,
        lit("?id=7&utm_source=feed&utm_campaign=x"))
        .when(col("doc_id") % 2 === 0, lit("?utm_source=feed&utm_campaign=x"))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit("")))
    val canon = Seq[Column => Column](
      lower,
      regexp_replace(_, "#.*", ""),            // fragment
      regexp_replace(_, "utm_[^&#]*&", ""),    // tracking param with a successor
      regexp_replace(_, "[?&]utm_[^&#]*", ""), // trailing tracking param(s)
      regexp_replace(_, "^https?://", ""),     // scheme
      regexp_replace(_, "^www\\.", ""),        // host alias
      regexp_replace(_, "/$", "")              // trailing slash
    ).foldLeft(url)((c, f) => f(c))
    docs.select(col("doc_id"), canon.as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_doc_id"))
  }

  /** Preference-pair construction — the data side of RLHF/DPO reward
    * modeling: within each stratum (lang), rank documents by a quality
    * score and pair the k-th BEST with the k-th WORST, so every pair has
    * the widest margin available at its rank and a stratum of n docs
    * yields floor(n/2) candidate pairs; tied-score pairs are dropped (a
    * preference pair with no margin teaches nothing). Score = bigram
    * uniqueness in integer micro-units — `(n_distinct_bigrams * 1e6) DIV
    * n_bigrams` — exact in any engine, no float ranking anywhere.
    *
    * Scale shape: two window ranks over the same (lang) partitioning (one
    * shuffle, the second window reuses it) and a self-join ON (lang, k) —
    * pair construction never crosses strata, so the join key is as
    * selective as the stratification. Deterministic ties: (score, doc_id)
    * total order on both ends.
    */
  def prefPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = bigramsOf(col("text"))
    val s = Tables.load(spark, sfDir, "documents")
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), col("lang"),
        size(array_distinct(bg)).cast("long").as("nd"),
        size(bg).cast("long").as("nb"))
      .withColumn("score_micro", expr("(nd * 1000000) DIV nb"))
      .select(col("doc_id"), col("lang"), col("score_micro"))
    val top = s.withColumn("k", row_number().over(
      Window.partitionBy(col("lang")).orderBy(col("score_micro").desc, col("doc_id"))))
    val bot = s.withColumn("k", row_number().over(
      Window.partitionBy(col("lang")).orderBy(col("score_micro").asc, col("doc_id").desc)))
    val n = s.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    top.select(col("lang"), col("k"), col("doc_id").as("chosen_doc"),
        col("score_micro").as("chosen_score"))
      .join(bot.select(col("lang"), col("k"), col("doc_id").as("rejected_doc"),
        col("score_micro").as("rejected_score")), Seq("lang", "k"))
      .join(broadcast(n), Seq("lang"))
      .filter(col("k") * 2 <= col("n") && col("chosen_score") > col("rejected_score"))
      .select(col("lang"), col("k").cast("long").as("k"), col("chosen_doc"),
        col("rejected_doc"),
        (col("chosen_score") - col("rejected_score")).as("margin_micro"))
  }

  /** T5-style span-corruption instance layout — the pretraining
    * instance-construction step: deterministic mask spans on a seeded grid
    * (offset = h60(doc_id) mod `stride`, one `spanLen`-token span per
    * `stride` tokens), emitted as one row per span with its position. The
    * grid guarantees non-overlap by construction (stride > spanLen), so
    * instance accounting (inputs length = n - masked + spans sentinels;
    * targets length = masked + spans sentinels) is exact without the
    * sequential skip-scan a random-span sampler needs — and stays
    * hash-checkable. Per-doc span enumeration is IN-ROW (`sequence` +
    * explode): a narrow map over the corpus, zero shuffle.
    */
  def spanCorruption(spark: SparkSession, sfDir: String,
                     stride: Int = 20, spanLen: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = size(split(col("text"), " ")).cast("long")
    docs
      .select(col("doc_id"), n.as("n_tokens"),
        (graft.ops.Hashing.h60(col("doc_id").cast("string")) % stride + 1).as("off"))
      .filter(col("off") + (spanLen - 1) <= col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("off"),
        explode(sequence(lit(0L),
          expr(s"(n_tokens - off - ${spanLen - 1}) DIV $stride"))).as("span_idx"))
      .select(col("doc_id"), col("n_tokens"), col("span_idx"),
        (col("off") + col("span_idx") * stride).as("start"),
        lit(spanLen.toLong).as("span_len"))
  }

  /** The five-rule quality bitmask of [[filterAttribution]] as one Column
    * expression over the text (bit set = FAILED; see the rule table there).
    * Shared by the attribution histogram and the composed training-prep
    * pipeline's gate ([[trainPrep]]); codegen's common-subexpression
    * elimination keeps the repeated token-array derivations single-pass.
    */
  private[graft] def ruleBitmask(text: Column): Column = {
    val toks = split(text, " ")
    val nw = size(toks).cast("long")
    val nc = length(translate(text, " ", "")).cast("long")
    val nsym = (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast("long")
    val tlen = length(text).cast("long")
    val hasStop = arrays_overlap(toks,
      array(Seq("the", "and", "of", "to", "a").map(lit): _*))
    val bg = bigramsOf(text)
    val nb = size(bg).cast("long")
    val nd = size(array_distinct(bg)).cast("long")
    when(nw < 20 || nw > 2000, 1L).otherwise(0L) +
      when(nc < nw * 3 || nc > nw * 12, 2L).otherwise(0L) +
      when(nsym * 10 > tlen, 4L).otherwise(0L) +
      when(!hasStop, 8L).otherwise(0L) +
      when((nb - nd) * 5 > nb, 16L).otherwise(0L)
  }

  // ===== measure→DECIDE for the curation knobs — the `ivfChoose`
  // discipline applied to quality gating and mix assembly: the curve is a
  // hash-gated query, the decision a bounded-arithmetic read of it =====

  /** Default z_int threshold grid for [[qualityCurve]] — spans the
    * published distilled model's score range on the fixture family
    * (p10 ≈ −21M, median ≈ 27M, p90 ≈ 116M at sf0.01), in the model's own
    * integer units so the curve is scale-invariant arithmetic.
    */
  val QualityGrid: Seq[Long] = Seq(
    -100000000L, -20000000L, 0L, 20000000L, 50000000L, 100000000L, 150000000L)

  /** The quality-gate YIELD CURVE — how a deployment actually picks its
    * keep threshold: for each candidate threshold, how many documents the
    * published distilled model ([[QualityModel.scoreDistilled]], the
    * hash-green integer scorer) would keep at `z_int > t`, and the yield
    * in permille. ONE corpus pass, one partial aggregation producing a
    * single row of |grid| conditional counts (exploded against the
    * threshold literal in-plan — no per-threshold rescan, no driver math),
    * every output an exact integer behind the DuckDB hash gate: a model
    * or featurizer regression that moves the curve fails correctness.
    */
  def qualityCurve(spark: SparkSession, sfDir: String,
                   grid: Seq[Long] = QualityGrid): DataFrame = {
    require(grid.nonEmpty && grid == grid.sorted && grid.distinct == grid,
      s"grid must be ascending distinct thresholds: $grid")
    val scores = QualityModel.scoreDistilled(QualityModel.Published, spark, sfDir)
    val one = scores.agg(
      count(lit(1)).as("n_total"),
      array(grid.map(t =>
        sum(when(col("z_int") > lit(t), 1L).otherwise(0L))): _*).as("ks"))
    one.select(col("n_total"),
        explode(arrays_zip(typedLit(grid).as("t"), col("ks").as("k"))).as("z"))
      // an EMPTY corpus yields zero rows (matching the oracle's cross join
      // against an empty score CTE), not |grid| rows of null arithmetic
      .filter(col("n_total") > 0L)
      .select(col("z.t").as("threshold"), col("z.k").as("n_kept"),
        col("n_total"),
        expr("z.k * 1000 DIV n_total").as("yield_permille"))
  }

  /** Close the measure→decide loop over [[qualityCurve]]: the HIGHEST
    * threshold (strictest gate — quality maximized) whose yield still
    * meets `yieldTargetPermille`, read off the hash-gated curve (the
    * decision is a |grid|-row argmax of exact integers — planning
    * metadata, the `ivfChoose` posture). A target no grid threshold meets
    * fails LOUDLY naming the best achievable yield: a pipeline must relax
    * the gate or grow the corpus, not silently under-fill its token
    * budget. One row: (threshold, n_kept, n_total, yield_permille).
    */
  def qualityChoose(spark: SparkSession, sfDir: String,
                    yieldTargetPermille: Long = 500L,
                    grid: Seq[Long] = QualityGrid): DataFrame = {
    import spark.implicits._
    require(yieldTargetPermille >= 1L && yieldTargetPermille <= 1000L,
      s"yieldTargetPermille must be in [1, 1000]: $yieldTargetPermille")
    val curve = qualityCurve(spark, sfDir, grid).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    require(curve.nonEmpty,
      "the corpus is empty — no yield curve exists to choose from")
    val eligible = curve.filter(_._4 >= yieldTargetPermille)
    require(eligible.nonEmpty, {
      val best = curve.maxBy(_._4)
      s"no grid threshold meets yield ${yieldTargetPermille}‰ " +
        s"(best: ${best._4}‰ at threshold ${best._1}) — lower the target, " +
        "extend the grid downward, or grow the corpus"
    })
    Seq(eligible.maxBy(_._1))
      .toDF("threshold", "n_kept", "n_total", "yield_permille")
  }

  /** Default target mix for [[mixSolve]] — permille weights over the
    * fixture's language domains (sums to 1000).
    */
  val MixWeightsPermille: Seq[(String, Long)] = Seq(
    "en" -> 400L, "zh" -> 200L, "de" -> 150L, "fr" -> 150L, "es" -> 100L)

  /** The FEASIBLE-mix solver — the decision step [[domainMix]] measures
    * toward: the LARGEST corpus achievable at the target weights WITHOUT
    * repeating data (epochs ≤ 1, the single-epoch regime large-scale
    * pretraining favors). Water-filling: the binding domain is the one
    * whose inventory runs out first at its weight —
    * `feasible = min_d floor(n_tokens_d · 1000 / w_d)` total tokens — and
    * every domain then contributes `take_d = floor(w_d · feasible / 1000)`
    * at sampling rate `floor(take_d · 1000 / n_tokens_d)` permille. All
    * exact integer arithmetic (overflow headroom: tokens·1000 at x100 ≈
    * 6·10¹¹), one partial aggregation over the corpus + one 5-row min —
    * the whole decision sits behind the hash gate. Output per domain:
    * (lang, n_docs, n_tokens, weight_permille, feasible_tokens,
    * take_tokens, rate_permille, binding).
    */
  def mixSolve(spark: SparkSession, sfDir: String,
               weights: Seq[(String, Long)] = MixWeightsPermille): DataFrame = {
    import spark.implicits._
    require(weights.nonEmpty && weights.forall(_._2 > 0L),
      s"weights must be positive permille values: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate domains in weights: ${weights.map(_._1).mkString(", ")}")
    // the water-filling identities (feasible = the total corpus size,
    // Σtake_d ≈ feasible) only hold for a true permille distribution
    require(weights.map(_._2).sum == 1000L,
      s"weights must sum to 1000 permille, got ${weights.map(_._2).sum}: $weights")
    // ONE corpus pass; everything after the per-domain aggregate is exact
    // integer arithmetic on a frame bounded by the domain count — the
    // ivfChoose planning-metadata posture (overflow headroom: tokens·1000
    // ≈ 6·10¹¹ at x100, weight·feasible ≈ 6·10¹⁴ — both well in-range)
    val per = perLangTokens(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a target domain with NO inventory makes the mix infeasible at ANY
    // size (its weight can never be met without repetition) — fail LOUDLY
    // like qualityChoose, never report a mix that silently omits it
    val missing = weights.map(_._1).filterNot(per.map(_._1).toSet)
    require(missing.isEmpty,
      s"target domains with no corpus inventory: ${missing.mkString(", ")} — " +
        "the mix is infeasible at any size; drop them from the target or fix the feed")
    waterFill(per, weights)
      .toDF("lang", "n_docs", "n_tokens", "weight_permille",
        "feasible_tokens", "take_tokens", "rate_permille", "binding")
  }

  /** The water-filling core shared by [[mixSolve]] (strict: the caller has
    * already refused missing domains) and [[trainPrepMeasured]] (adaptive:
    * domains the cleaning emptied simply drop out — running the SAME
    * arithmetic over the present domains realizes the target weights
    * renormalized among survivors, with no separate renormalization step).
    * Exact integer arithmetic over a frame bounded by the domain count.
    */
  private def waterFill(per: Seq[(String, Long, Long)],
                        weights: Seq[(String, Long)])
      : Seq[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    val wmap = weights.toMap
    val present = per.filter(t => wmap.contains(t._1))
    require(present.nonEmpty, "no target domain has any inventory")
    val caps = present.map { case (l, _, nt) => l -> nt * 1000L / wmap(l) }.toMap
    val feasible = caps.values.min
    present.sortBy(_._1).map { case (l, nd, nt) =>
      val take = wmap(l) * feasible / 1000L
      (l, nd, nt, wmap(l), feasible, take, take * 1000L / nt,
        if (caps(l) == feasible) 1L else 0L)
    }
  }

  /** Per-domain inventory — ONE aggregation shared by the measurement
    * query ([[domainMix]]) and the decision ([[mixSolve]]): the two must
    * count tokens the same way or the decision silently de-couples from
    * the curve it is documented to read.
    */
  private[graft] def perLangTokens(spark: SparkSession, sfDir: String): DataFrame =
    perLangTokensOf(Tables.load(spark, sfDir, "documents"))

  private def perLangTokensOf(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))

  /** The MEASURED training-prep pipeline — [[trainPrep]]'s composition
    * with every knob CHOSEN BY MEASUREMENT instead of configured, the
    * capstone of the measure→decide family:
    *
    *  1. GATE at t* = [[qualityChoose]]'s threshold (the strictest
    *     distilled gate whose yield meets the floor), applied IN-ROW on
    *     the corpus scan ([[QualityModel.gateDocs]] — one featurizer, one
    *     z expression shared with the scorer; no join back).
    *  2. DEDUP exact content (keep lowest doc_id per md5).
    *  3. MIX at the rates the water-fill derives from the CLEANED
    *     inventory — what actually survived gating+dedup, not the raw
    *     feed; domains the cleaning emptied drop out (the same
    *     arithmetic realizes the target renormalized among survivors —
    *     the adaptive posture a composed pipeline wants, vs standalone
    *     [[mixSolve]]'s loud refusal). Membership is the deterministic
    *     seeded hash (`mixsel:`), reproducible across engines and runs.
    *  4. PACK into fixed-token bins ([[seqPackDf]]) → the (lang, bin)
    *     block manifest a loader reads.
    *
    * Decision cost: the curve (one scan + |grid|-count agg) and the
    * cleaned inventory (one agg over the gated lineage) are bounded
    * planning metadata; the apply pass is ONE declarative lineage. Two
    * passes total over the corpus — the measure-then-apply shape every
    * real pipeline has.
    */
  def trainPrepMeasured(spark: SparkSession, sfDir: String,
                        yieldTargetPermille: Long = 300L,
                        weights: Seq[(String, Long)] = MixWeightsPermille,
                        budget: Int = 2048, shards: Int = 8): DataFrame = {
    val tStar = qualityChoose(spark, sfDir, yieldTargetPermille)
      .collect().head.getLong(0)
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val gated = QualityModel.gateDocs(QualityModel.Published, docs, tStar)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = gated
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val inv = perLangTokensOf(deduped).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rates: Seq[(String, Long)] =
      waterFill(inv, weights).map(t => t._1 -> t._7)
    val rateMap = map(rates.flatMap { case (l, r) => Seq(lit(l), lit(r)) }: _*)
    val mixed = deduped
      .filter(coalesce(element_at(rateMap, col("lang")), lit(0L)) >
        Hashing.h60(concat(lit("mixsel:"), col("doc_id"))) % 1000)
    seqPackDf(mixed, budget, shards)
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }
}
