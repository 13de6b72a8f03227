package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-format ingestion — the non-parquet half of the source story. The
  * reference's events ARE json text on the wire (NOTIFY payloads,
  * `queries.go:33`), and a 100 TB pipeline inevitably ingests JSON-lines
  * drops (app logs, API exports) alongside its columnar archive. The rules
  * that survive at scale, encoded here and proven by the oracle:
  *
  *  - **Explicit schema, never inference.** `spark.read.json` without a
  *    schema runs a full extra pass over 100 TB just to guess types, and
  *    guesses differently per drop. The schema is declared once; readers
  *    are a pure map stage.
  *  - **Corrupt rows are data, not exceptions.** PERMISSIVE mode with a
  *    named corrupt-record column quarantines undecodable lines into the
  *    same dead-letter discipline as the CDC path (`cdc/DeadLetter.scala`)
  *    — one bad line in a billion must neither kill the job (FAILFAST)
  *    nor vanish silently (DROPMALFORMED).
  *  - **Format must not change answers.** The declared query aggregates the
  *    JSON round-trip of the events table and is hash-checked against the
  *    DuckDB oracle computed from the PARQUET original — bit-equal money
  *    sums across a text serialization boundary.
  */
object TextFormats {

  /** Cheap content fingerprint of the source events table: row count + max
    * event id, both answered from parquet footer statistics (no data scan).
    * Folded into every drop cache's `_DROP_READY` marker so the cache keys
    * on the DATA, not just the directory path — a regenerated testdata dir
    * at the same path invalidates and rebuilds instead of silently serving
    * stale rows to the format oracles.
    */
  private[graft] def eventsFingerprint(spark: SparkSession, sfDir: String): String = {
    val r = graft.Tables.load(spark, sfDir, "events")
      .agg(count(lit(1)).as("n"), max(col("event_id")).as("m")).head()
    s"${r.getLong(0)}:${r.get(1)}"
  }

  /** Committed-marker cache discipline shared by the four drops: rebuild
    * when the marker is missing (first run / interrupted prior write) OR
    * its recorded fingerprint no longer matches the source table.
    */
  private[graft] def ensureDrop(spark: SparkSession, dir: String, fingerprint: String)
                        (build: org.apache.hadoop.fs.FileSystem => Unit): String = {
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_DROP_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val recorded =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      }
    if (!recorded.contains(fingerprint)) {
      val root = new org.apache.hadoop.fs.Path(dir)
      if (fs.exists(root)) fs.delete(root, true) // stale or interrupted
      build(fs)
      val out = fs.create(marker)
      try out.write(fingerprint.getBytes("UTF-8")) finally out.close()
    }
    dir
  }

  /** Explicit wire schema for the JSON event drop. `value` stays DOUBLE on
    * the wire (the driver parquet's type) and is money-cast only at
    * aggregation time, like every other query; the corrupt-record column
    * must be declared nullable-string IN the schema for PERMISSIVE capture.
    */
  val eventWireSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("_bad", StringType)))

  /** One-time JSON-lines conversion of the events table, cached per source
    * dir with the same committed-marker discipline as the bucketed layout
    * ([[Layout.ensureBucketed]]): the first invocation writes the drop plus
    * a deterministic file of three undecodable lines (the fixture a real
    * ingest inevitably contains); later invocations read the cache.
    */
  def ensureJsonDrop(spark: SparkSession, sfDir: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_json_" +
      Integer.toHexString(sfDir.hashCode).takeRight(8)
    ensureDrop(spark, dir, eventsFingerprint(spark, sfDir)) { fs =>
      graft.Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").json(dir)
      // three deterministic corrupt lines, each SYNTACTICALLY undecodable
      // (truncated object, bare text, dangling comma), each yielding
      // exactly one quarantined row. Measured reader semantics the
      // fixture deliberately keeps simple (pinned in TextFormatsSpec):
      // a wrong-TYPED field ALSO quarantines the row (raw record in the
      // corrupt column) while SIBLING fields survive as partial results —
      // so a dead-letter consumer can both see the original line and
      // salvage what parsed; and a top-level ARRAY explodes into one row
      // per element rather than one corrupt row. Corrupt lines adjacent
      // to each other can interact through parser resync, so the fixture
      // separates its defects one per line.
      val bad = fs.create(new org.apache.hadoop.fs.Path(dir, "part-corrupt.json"))
      bad.write("{\"event_id\": 1, \"user_id\"\nnot json at all\n{\"event_id\": 1,,}\n"
        .getBytes("UTF-8"))
      bad.close()
    }
  }

  /** Declared query: ingest the JSON drop with the explicit schema, split
    * decoded rows from quarantined ones, and aggregate per event type —
    * counts, exact money sums, distinct users — with the quarantine
    * reported as a `_corrupt` row of the same shape (n = lines captured,
    * null aggregates). The oracle computes the identical aggregate from the
    * parquet original plus the constant quarantine row: a hash match proves
    * the text round-trip changed nothing and the bad lines all landed in
    * the dead-letter row instead of poisoning a group.
    */
  def jsonEventIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read
      .schema(eventWireSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(ensureJsonDrop(spark, sfDir))
    eventAggregate(raw)
  }

  /** The shared ingest aggregate: decoded rows grouped per event type with
    * exact money sums, the quarantine as one `_corrupt` row.
    */
  private def eventAggregate(raw: DataFrame): DataFrame =
    raw.groupBy(
        when(col("_bad").isNotNull, lit("_corrupt"))
          .otherwise(col("event_type")).as("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_bad").isNull, col("value").cast("decimal(18,2)")))
          .cast("double").as("sum_value"),
        countDistinct(when(col("_bad").isNull, col("user_id"))).as("n_users"))

  /** One-time CSV conversion of the events table plus an RFC 4180 hostile
    * part: three VALID rows exercising the quoting edge cases every real
    * drop eventually contains — an embedded separator (`"a,b"`), a doubled
    * quote (`"say ""hi"""`), an embedded NEWLINE inside a quoted field —
    * and three undecodable lines. The hostile-valid rows carry sentinel
    * event types and constant money values, so the oracle pins them as
    * exact constant groups: a hash match proves the decoder handled each
    * quoting case, not merely survived it.
    *
    * Fixture subtlety worth knowing before trusting PERMISSIVE CSV at
    * 100 TB: with `spark.sql.csv.parser.columnPruning` (default ON) the
    * parser only materializes the columns the query touches, so an
    * ARITY-LONG row whose parsed prefix is clean is NOT flagged corrupt
    * unless some touched column fails — quarantine judgments can differ
    * between `select(*)` and a pruned projection. Each planted bad line
    * therefore fails IN a column every consumer touches (unparseable
    * numerics, arity-short), keeping the dead-letter count
    * projection-invariant.
    */
  def ensureCsvDrop(spark: SparkSession, sfDir: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_csv_" +
      Integer.toHexString(sfDir.hashCode).takeRight(8)
    ensureDrop(spark, dir, eventsFingerprint(spark, sfDir)) { fs =>
      graft.Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        // writer shares the reader's RFC 4180 convention (escape = doubled
        // quote) — Spark's default backslash escaping would round-trip only
        // while no value happens to need quoting, then silently corrupt the
        // first fixture value containing a quote or comma
        .write.mode("overwrite").option("escape", "\"").csv(dir)
      val bad = fs.create(new org.apache.hadoop.fs.Path(dir, "part-hostile.csv"))
      bad.write((
        "7000001,999001,\"a,b\",1.5\n" +
        "7000002,999002,\"say \"\"hi\"\"\",2.25\n" +
        "7000003,999003,\"line\nbreak\",3.75\n" +
        "7000004,yy,typebad,9.99\n" +
        "only_one_field\n" +
        "1,2,3,notanumber,5\n").getBytes("UTF-8"))
      bad.close()
    }
  }

  /** Declared query: the CSV twin of [[jsonEventIngest]] — same explicit
    * schema, same PERMISSIVE dead-letter discipline, same aggregate, and
    * the oracle again reads the parquet original (plus the hostile
    * constants): format must not change answers.
    *
    * Two CSV-specific scale notes, both deliberate here:
    *  - `multiLine=true` is REQUIRED for RFC 4180 embedded newlines, and it
    *    makes each FILE one parse unit (no intra-file split points). A drop
    *    that guarantees newline-free fields should leave it false and keep
    *    per-line parallel splitting — at 100 TB that is the difference
    *    between one task per 128 MB split and one per file.
    *  - `escape="` selects RFC 4180 doubled-quote escaping (Spark's default
    *    is backslash, which silently mis-reads standard CSV exports).
    */
  def csvEventIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read
      .schema(eventWireSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(ensureCsvDrop(spark, sfDir))
    eventAggregate(raw)
  }

  /** GZIP copy of the JSON drop — the compressed form most real log drops
    * arrive in. Spark decompresses `.gz` transparently, but gzip is NOT
    * SPLITTABLE: each file is one task regardless of size, so a drop of
    * four 25 GB gzip files runs four tasks where the uncompressed drop
    * would run ~800 — at 100 TB the ingest must either re-chunk upstream
    * (many small gz files), use a splittable codec (bzip2, or zstd via
    * seekable frames), or pay one decompress-repartition pass first.
    * `TextFormatsSpec` pins the contract: one input partition per gz file,
    * and byte-identical aggregates to the uncompressed read.
    */
  def ensureGzJsonDrop(spark: SparkSession, sfDir: String): String = {
    val src = ensureJsonDrop(spark, sfDir) // refreshes the json drop first
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gz_" +
      Integer.toHexString(sfDir.hashCode).takeRight(8)
    ensureDrop(spark, dir, eventsFingerprint(spark, sfDir)) { fs =>
      val root = new org.apache.hadoop.fs.Path(dir)
      fs.mkdirs(root)
      val parts = fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .filter(s => s.getPath.getName.endsWith(".json"))
      parts.foreach { p =>
        val in = fs.open(p.getPath)
        val out = new java.util.zip.GZIPOutputStream(
          fs.create(new org.apache.hadoop.fs.Path(dir, p.getPath.getName + ".gz")))
        try {
          val buf = new Array[Byte](65536)
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        } finally { in.close(); out.close() }
      }
    }
  }

  /** Declared query: the gzip'd drop through the identical reader and
    * aggregate — compression must not change answers either, so the oracle
    * is [[jsonEventIngest]]'s verbatim.
    */
  def gzJsonEventIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read
      .schema(eventWireSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(ensureGzJsonDrop(spark, sfDir))
    eventAggregate(raw)
  }

  /** One-time ORC conversion of the events table — the OTHER columnar
    * format a lakehouse inherits (Hive estates standardized on ORC the way
    * Spark ones did on parquet). No dead-letter axis here (columnar files
    * are typed at write); the axis that matters is that the engine's
    * scan-level machinery carries over: predicate pushdown and column
    * pruning must reach the ORC reader exactly as they do the parquet one
    * (`TextFormatsSpec` pins PushedFilters on the ORC scan).
    */
  def ensureOrcDrop(spark: SparkSession, sfDir: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_orc_" +
      Integer.toHexString(sfDir.hashCode).takeRight(8)
    ensureDrop(spark, dir, eventsFingerprint(spark, sfDir)) { _ =>
      graft.Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").orc(dir)
    }
  }

  /** Declared query: filtered aggregate over the ORC round-trip — the
    * filter exists to ride the scan (pushdown proven in the spec), and the
    * oracle computes the identical aggregate from the parquet original:
    * columnar-to-columnar conversion must change neither answers nor the
    * scan-level optimization story.
    */
  def orcEventIngest(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.orc(ensureOrcDrop(spark, sfDir))
      .filter(col("value") >= 100.0)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** The splittable-ingest ESCAPE HATCH for gzip drops — the operator the
    * [[ensureGzJsonDrop]] scaladoc's trade analysis calls for: one
    * decompress-repartition pass that converts a non-splittable gz landing
    * into zstd parquet staging, after which every downstream scan is
    * splittable, columnar-pruned, and stats-filtered.
    *
    * Cost model (why this pays at 100 TB):
    *  - The staging pass itself CANNOT beat one-task-per-gz-file on the
    *    read side (gzip streams have no split points — that is the problem
    *    being escaped); it pays that cost exactly ONCE, decoding with the
    *    same explicit-schema PERMISSIVE discipline so corrupt lines land in
    *    the staging table as `_bad` rows, not exceptions mid-conversion.
    *  - The write side re-chunks to `targetPartitions` zstd parquet files
    *    (zstd ≈ gzip's ratio at several× the decode speed, and parquet row
    *    groups are independently scannable), so a 4×25 GB gz drop that ran
    *    4 tasks forever runs 4 slow tasks once and ~800 (`targetPartitions`
    *    or size/maxPartitionBytes) thereafter.
    *  - Break-even is therefore at the SECOND full read of the drop — any
    *    pipeline that aggregates, joins, or dedups the same landing more
    *    than once (i.e. all of them) should stage first. A drop read
    *    exactly once end-to-end can skip staging and eat the file-grain
    *    parallelism ceiling on its single pass.
    *
    * Returns `stagingDir`. `TextFormatsSpec` pins: staged file count =
    * `targetPartitions` > gz file count, per-file scan parallelism once
    * packing is neutralized, and byte-identical aggregates across the
    * gz → staged boundary.
    */
  def stageGzDrop(spark: SparkSession, gzDir: String, stagingDir: String,
                  targetPartitions: Int = 0): String = {
    val parts =
      if (targetPartitions > 0) targetPartitions
      else spark.sparkContext.defaultParallelism
    spark.read
      .schema(eventWireSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(gzDir)
      .repartition(parts)
      .write.mode("overwrite")
      .option("compression", "zstd")
      .parquet(stagingDir)
    stagingDir
  }

  /** Declared query: the same event aggregate through the FULL staging
    * path — gz landing → [[stageGzDrop]] → zstd parquet → aggregate. The
    * oracle is the gz/json drop's verbatim (parquet original + constant
    * quarantine row): a hash match proves the decompress-repartition pass
    * changed nothing, including the dead-letter rows' survival as data
    * across the staging boundary. The staging is cached under the same
    * content-fingerprint discipline as the drops themselves.
    */
  def stagedGzEventIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val gz = ensureGzJsonDrop(spark, sfDir)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gzstage_" +
      Integer.toHexString(sfDir.hashCode).takeRight(8)
    ensureDrop(spark, dir, eventsFingerprint(spark, sfDir)) { _ =>
      stageGzDrop(spark, gz, s"$dir/data", targetPartitions = 8)
    }
    eventAggregate(spark.read.parquet(s"$dir/data"))
  }

  /** STREAMING ingestion of a landing directory — how a crawl actually
    * arrives: shards land as JSON-lines files in object storage and the
    * pipeline picks each up exactly once. Spark's file streaming source
    * tracks seen files in the checkpoint (the exactly-once unit is the
    * FILE), so a restart neither re-reads old shards nor misses ones that
    * landed while down; the same explicit schema + PERMISSIVE dead-letter
    * discipline as the batch readers applies per arriving file, and the
    * decoded stream feeds any downstream stage — the online dedup stack
    * ([[graft.streaming.DedupStream]]) being the canonical consumer:
    * landing-dir → decode → dedup-as-it-lands with no glue.
    *
    * `maxFilesPerTrigger` is the ingest throttle (a backlog of thousands
    * of shards otherwise becomes one giant first batch); corrupt lines
    * stay IN the stream as `_bad`-carrying rows so a dead-letter sink can
    * subscribe to them like any other consumer.
    */
  def jsonDropStream(spark: SparkSession, dir: String,
                     maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(eventWireSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(dir)
}
