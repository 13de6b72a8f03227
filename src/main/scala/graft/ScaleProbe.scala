package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth probe: measures the heavy document/event queries at 1× and
  * 10× (and optionally more) the sf0.1 data, to turn the plan-audit's
  * "amortizes with data size" claims into measured curves (BASELINE.md
  * round 5) — e.g. the CC loop's fixed per-round job overhead, and the
  * pair queries' bucket-local (not quadratic) candidate growth.
  *
  * Scaled data is synthesized DETERMINISTICALLY from the base tables so the
  * corpus looks statistically like the original, just bigger — not a
  * pathological duplication corpus:
  *
  *  - documents: copy i suffixes every token with `_cp<i>` — shingle/bigram
  *    spaces of different copies are DISJOINT, so each copy reproduces the
  *    original near-dup structure with zero cross-copy candidate pairs
  *    (10× data ⇒ 10× groups of the same size profile, which is what real
  *    corpus growth looks like; naive replication would instead make every
  *    doc a 10-way exact dup — a different, quadratic-ish workload);
  *  - events: copy i shifts user_id (disjoint user populations with the
  *    original per-user timelines) and event_id (uniqueness); `ts` keeps
  *    whatever physical layout the driver files currently use (raw nanos
  *    long historically, micros-native since the mid-round-5 driver
  *    regeneration) — [[Tables.load]] branches on the loaded type, and the
  *    micros layout is DuckDB-readable, so event oracles can hash-check
  *    scaled dirs too (BASELINE addendum V);
  *  - embeddings: passed through UNCHANGED (lexical corpus grows f×, the
  *    vector index trails a batch refresh), enabling retrieval probes.
  *
  * Output: one JSON line per (factor, query), min-of-2 seconds, plus a
  * generation line per factor. Dirs are cached under /tmp and reused.
  */
object ScaleProbe {

  val probeQueries: Seq[String] = Seq(
    "ops_dedup_minhash", "ops_dedup_verify", "ops_ngram_jaccard",
    "ops_dedup_cc", "ops_simhash_pairs", "ops_bigram_lm",
    "ops_corpus_filter", "ops_line_dedup",
    "ops_cohort_retention", "ops_dau_wau",
    // round-5 heavies: containment shares the jaccard inverted index (its
    // curve should track ops_ngram_jaccard), skipgram pairs are in-row +
    // two vocab merge joins, entropy is a pure partial-agg scan shape
    "ops_containment", "ops_skipgram_pmi", "ops_entropy",
    // late-round-5 heavies: triangles (wedge join over oriented LSH edges),
    // lsh_calib (truth postings + candidate full outer), incr_dedup (band
    // index probe), bpe_pairs (types-vs-tokens — its curve should be the
    // FLATTEST: vocab grows by Heaps' law, sublinear in corpus size)
    "ops_triangles", "ops_lsh_calib", "ops_incr_dedup", "ops_bpe_pairs",
    // the multi-join family over the f× fact blowup (fixed dims, f× order
    // history — temporal growth): every join edge is either a broadcast of
    // a FIXED-size dim slice or a key shuffle of both facts, so the curves
    // should be ~linear; bucket_join's rep-1 write is the one-time layout
    // cost, its min-of-2 the steady-state co-located join
    "ops_q5_local_volume", "ops_q7_trade_volume", "ops_q9_profit",
    "ops_q12_priority_lanes", "ops_q21_waiting", "ops_bucket_join")

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // many-query session: size the codegen cache for the inventory (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // optional args = query-name filter over the FULL registry (the same
    // contract as graft.Bench — any declared query can be probed, not just
    // the curated default list); unknown names are an error, not a silent
    // empty run
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val selected: Seq[String] = if (args.nonEmpty) args.toSeq else probeQueries

    // which table families the selected queries need: generation is the
    // expensive step (a 100× token-suffixed document corpus costs minutes a
    // join-only probe shouldn't pay), so it is driven by the selection —
    // queries outside the curated list conservatively generate everything.
    // SPARK_GRAFT_SCALE_TABLES=docs|tpch|auto remains as a manual override.
    val tpchQueries = Set("ops_q5_local_volume", "ops_q7_trade_volume",
      "ops_q9_profit", "ops_q12_priority_lanes", "ops_q21_waiting",
      "ops_bucket_join")
    val families = sys.env.getOrElse("SPARK_GRAFT_SCALE_TABLES", "auto") match {
      case "auto" =>
        (if (selected.exists(q => !tpchQueries(q))) Set("docs") else Set[String]()) ++
          (if (selected.exists(q => tpchQueries(q) || !probeQueries.contains(q))) Set("tpch") else Set())
      case one => Set(one)
    }
    // a family only counts as generated when its LAST-written table's Spark
    // job COMMITTED (_SUCCESS present) — a bare directory left by an
    // interrupted write must regenerate, not poison the cache (generate
    // writes events last; generateTpch writes lineitem last; the embeddings
    // pass-through copy has its own marker so a cached pre-embeddings dir
    // gains it without re-running the expensive doc/event blowup)
    def committed(dir: String, lastTable: String): Boolean =
      new java.io.File(s"$dir/$lastTable.parquet/_SUCCESS").exists()
    factors.foreach { f =>
      val dir = s"$outRoot/x$f"
      if (families("docs") && !committed(dir, "events")) {
        val t0 = System.nanoTime()
        generate(spark, baseDir, dir, f)
        println(s"""{"metric":"scale_gen","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}}""")
      }
      if (families("docs") && !committed(dir, "embeddings")) {
        // SPARK_GRAFT_SCALE_VECTORS=grow swaps the pass-through for the f×
        // sign-mask blowup; pair it with a non-default SPARK_GRAFT_SCALE_DIR
        // so the cached lag-mode dirs stay valid for the retrieval probes
        if (sys.env.get("SPARK_GRAFT_SCALE_VECTORS").contains("grow"))
          growEmbeddings(spark, baseDir, dir, f)
        else copyEmbeddings(spark, baseDir, dir)
      }
      // the relational family arrived later than the doc/event one — cached
      // dirs from earlier sessions regenerate just the missing tables
      if (families("tpch") && !committed(dir, "lineitem")) {
        val t0 = System.nanoTime()
        generateTpch(spark, baseDir, dir, f)
        println(s"""{"metric":"scale_gen_tpch","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}}""")
      }
    }
    factors.foreach { f =>
      val dir = s"$outRoot/x$f"
      selected.foreach { name =>
        val fn = SparkEntry.queries(name)
        val secs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(s"""{"metric":"scale_probe","factor":$f,"query":"$name","sec":$secs}""")
      }
    }
    spark.stop()
  }

  /** Deterministic f× blowup of documents + events into `dir`. */
  def generate(spark: SparkSession, baseDir: String, dir: String, f: Int): Unit = {
    // raw read preserves the driver files' physical ts layout into the
    // scaled dir (nanosAsLong only fires when the source actually IS
    // TIMESTAMP(NANOS); micros-native sources read — and re-write — as
    // plain timestamps)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val ev = spark.read.parquet(s"$baseDir/events.parquet")
    val docCopies = (0 until f).map { i =>
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"_cp$i"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
        .withColumn("n_chars", length(col("text")))
    }
    docCopies.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val evCopies = (0 until f).map { i =>
      if (i == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 10000000L))
    }
    evCopies.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Embeddings pass through UNCHANGED (the realistic lag mode: the lexical
    * corpus grows f× while the vector index trails behind a batch refresh)
    * so retrieval compositions over documents ⊕ embeddings — ops_hybrid_rrf
    * in particular — can be probed and hash-checked on scaled dirs; the
    * blowup's shifted doc_ids (base + i·1e7) never collide with vec_ids, so
    * only copy 0 is dense-rankable, exactly the lag scenario. A separate
    * fill-in step (not part of [[generate]]) so cached pre-embeddings dirs
    * gain the cheap copy WITHOUT re-running the multi-minute doc/event
    * blowup — the same regenerate-just-the-missing-tables pattern as the
    * tpch branch.
    */
  def copyEmbeddings(spark: SparkSession, baseDir: String, dir: String): Unit =
    spark.read.parquet(s"$baseDir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  /** Opt-in f× VECTOR blowup (`SPARK_GRAFT_SCALE_VECTORS=grow`) — the vector
    * analog of the token-suffix document trick: copy c multiplies every
    * vector by a c-seeded ±1 sign mask. A fixed mask is an isometry of the
    * dot product (mask²=1), so every intra-copy cosine — cluster structure,
    * near-dup pairs, centroid geometry — is preserved EXACTLY, while
    * cross-copy cosines decorrelate (independent sign patterns ≈ random
    * projections), giving f disjoint semantic spaces: the right workload
    * model for probing [[graft.ops.Similarity.semDedup]]'s in-bucket cost
    * growth, where naive identical copies would instead mark 100% of the
    * corpus duplicate. Copy 0 keeps the identity mask, so the base rows ride
    * through unchanged. Pair with a non-default `SPARK_GRAFT_SCALE_DIR` so
    * the cached lag-mode dirs keep their index-lags-corpus premise.
    */
  def growEmbeddings(spark: SparkSession, baseDir: String, dir: String, f: Int): Unit = {
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val copies = (0 until f).map { c =>
      if (c == 0) base
      else base
        .withColumn("vec_id", col("vec_id") + lit(c.toLong * 1000000L))
        .withColumn("embedding",
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, k) => when(
              graft.ops.Hashing.h60(concat_ws(":", lit(c.toString), k.cast("string"))) % 2 === 0,
              x).otherwise(-x)))
    }
    copies.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** Deterministic f× blowup of the relational star: dims stay FIXED (the
    * realistic growth mode — fact history accumulates over a slowly-growing
    * entity base), orders/lineitem replicate with copy i shifting the order
    * key into a disjoint range while keeping o_custkey / l_suppkey /
    * l_partkey — every customer gets f× the order history, FK integrity
    * preserved, join selectivities unchanged. Dates repeat rather than
    * extend, so date-sliced queries see f× rows inside the same windows —
    * exactly the per-window density growth a bigger cluster faces.
    */
  def generateTpch(spark: SparkSession, baseDir: String, dir: String, f: Int): Unit = {
    for (t <- Seq("region", "nation", "supplier", "part", "customer"))
      spark.read.parquet(s"$baseDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val shift = 1000000000L // far above any base orderkey at these SFs
    val o = spark.read.parquet(s"$baseDir/orders.parquet")
    (0 until f).map { i =>
      if (i == 0) o
      else o.withColumn("o_orderkey", col("o_orderkey") + lit(i * shift))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
    (0 until f).map { i =>
      if (i == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + lit(i * shift))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }
}
