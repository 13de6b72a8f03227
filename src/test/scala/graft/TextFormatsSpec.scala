package graft

import graft.sources.TextFormats
import org.apache.spark.sql.functions._

/** Pins the JSON-ingest contract: what quarantines, what is leniently
  * nulled, and that the text round-trip preserves every aggregate the
  * oracle checks (the oracle itself proves parity; these tests pin the
  * SEMANTICS a pipeline must know when it trusts PERMISSIVE mode).
  */
class TextFormatsSpec extends SparkSuite {

  test("the three planted corrupt lines quarantine as one _corrupt row of n=3") {
    val out = TextFormats.jsonEventIngest(spark, sf)
      .filter(col("event_type") === "_corrupt").collect()
    assert(out.length == 1, out.mkString(","))
    assert(out(0).getLong(1) == 3L)
    assert(out(0).isNullAt(2), "corrupt row must not carry a money sum")
    assert(out(0).getLong(3) == 0L)
  }

  test("csv ingest: RFC 4180 edge rows decode as exact groups; the corrupt lines quarantine") {
    val out = TextFormats.csvEventIngest(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3))))
      .toMap
    // each quoting edge case must arrive as its OWN group with the exact
    // planted money value — decoded, not merely survived
    assert(out("a,b") == ((1L, Some(1.5), 1L)), s"embedded separator: ${out.get("a,b")}")
    assert(out("say \"hi\"") == ((1L, Some(2.25), 1L)),
      s"doubled quote: ${out.get("say \"hi\"")}")
    assert(out("line\nbreak") == ((1L, Some(3.75), 1L)),
      s"embedded newline: ${out.get("line\nbreak")}")
    assert(out("_corrupt") == ((3L, None, 0L)), s"quarantine: ${out.get("_corrupt")}")
  }

  test("gzip drop: transparent decompression, identical aggregates, one task per gz file") {
    val plain = TextFormats.jsonEventIngest(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val gz = TextFormats.gzJsonEventIngest(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    assert(gz == plain, "compression changed answers")
    // the non-splittable contract, made visible: every gz file is exactly
    // one input partition no matter how Spark would split uncompressed text
    val dir = TextFormats.ensureGzJsonDrop(spark, sf)
    val nFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".gz"))
    val nParts = spark.read.schema(TextFormats.eventWireSchema)
      .json(dir).rdd.getNumPartitions
    assert(nFiles > 0 && nParts == nFiles,
      s"expected 1 partition per gz file: $nParts partitions for $nFiles files")
  }

  test("gz staging: splittable parquet, parallelism past the file-count ceiling, parity") {
    val gzDir = TextFormats.ensureGzJsonDrop(spark, sf)
    val nGz = new java.io.File(gzDir).listFiles().count(_.getName.endsWith(".gz"))
    val staging = java.nio.file.Files.createTempDirectory("gz_staging").toString + "/events"
    val target = nGz * 4 // the escape: 4x the gz drop's parallelism ceiling
    TextFormats.stageGzDrop(spark, gzDir, staging, targetPartitions = target)
    // the staged layout physically carries the parallelism: target zstd
    // parquet files, each an independently scannable unit
    val staged = new java.io.File(staging).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(staged == target && staged > nGz,
      s"staging wrote $staged files for target $target (gz drop has $nGz)")
    // with size-packing neutralized (tiny fixture files would otherwise
    // bin-pack into one task), the scan actually RUNS wider than the gz
    // drop's one-task-per-file ceiling
    val saved = spark.conf.getOption("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", (64L << 20).toString)
    try {
      val nParts = spark.read.parquet(staging).rdd.getNumPartitions
      assert(nParts > nGz, s"staged scan ran $nParts tasks, gz ceiling is $nGz")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.files.openCostInBytes", v)
      case None    => spark.conf.unset("spark.sql.files.openCostInBytes")
    }
    // the decompress-repartition pass changed no answers: same PERMISSIVE
    // aggregate, same _corrupt quarantine, across the staging boundary
    val viaGz = TextFormats.gzJsonEventIngest(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val viaStaged = spark.read.parquet(staging)
      .groupBy(when(col("_bad").isNotNull, lit("_corrupt"))
        .otherwise(col("event_type")).as("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_bad").isNull, col("value").cast("decimal(18,2)")))
          .cast("double").as("sum_value"),
        countDistinct(when(col("_bad").isNull, col("user_id"))).as("n_users"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaStaged == viaGz, "staging changed answers")
  }

  test("orc round-trip: predicate pushdown reaches the ORC scan like the parquet one") {
    val df = TextFormats.orcEventIngest(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Format: ORC") || p.contains("Scan orc"), s"not an ORC scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(value,100.0)"),
      s"value filter not pushed to the ORC scan:\n$p")
    // column pruning: the scan must read only the four touched columns
    assert(p.contains("ReadSchema: struct<user_id:bigint,event_type:string,value:double>")
      || p.contains("ReadSchema: struct<event_id"),
      s"scan reads more than the projection needs:\n$p")
  }

  test("streaming drop directory: each landed file ingested exactly once; corrupt rows ride along") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drop_stream")
    def land(name: String, lines: String): Unit =
      java.nio.file.Files.write(dir.resolve(name), lines.getBytes("UTF-8"))
    land("shard-0.json",
      "{\"event_id\": 1, \"user_id\": 10, \"event_type\": \"click\", \"value\": 1.5}\n" +
      "{\"event_id\": 2, \"user_id\": 11, \"event_type\": \"view\", \"value\": 2.5}\n")
    val q = TextFormats.jsonDropStream(spark, dir.toString)
      .writeStream.format("memory").queryName("drop_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("drop_stream_out").count() == 2)
      // a shard landing LATER (with one corrupt line) arrives incrementally;
      // the first shard is not re-read (file-grain exactly-once)
      land("shard-1.json",
        "{\"event_id\": 3, \"user_id\": 12, \"event_type\": \"click\", \"value\": 3.5}\n" +
        "not json at all\n")
      q.processAllAvailable()
      val rows = spark.table("drop_stream_out").collect()
      assert(rows.length == 4, s"expected 2+2 rows, got ${rows.length}")
      assert(rows.count(r => !r.isNullAt(r.fieldIndex("_bad"))) == 1,
        "the corrupt line must ride the stream as a dead-letter row")
      // the decoded stream composes with the online dedup stack unchanged:
      // same schema contract as every batch reader
      assert(spark.table("drop_stream_out").schema.fieldNames.toSeq ==
        TextFormats.eventWireSchema.fieldNames.toSeq)
    } finally q.stop()
  }

  test("drop cache invalidates when the source table changes under the same path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tf_invalidate").toString
    def writeEvents(n: Long): Unit =
      (0L until n).map(i => (i, new java.sql.Timestamp(1000L * (i + 1)), i % 3,
          "click", 5.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def decoded(drop: String): Long =
      spark.read.schema(TextFormats.eventWireSchema)
        .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_bad")
        .json(drop).filter("_bad is null")
        // count a DATA column: a query touching only the corrupt-record
        // column is disallowed on raw json reads
        .agg(count(col("event_id"))).head().getLong(0)
    writeEvents(5)
    assert(decoded(TextFormats.ensureJsonDrop(spark, dir)) == 5L)
    // REGENERATE the source in place — same path, different content: the
    // path-keyed cache of r8 would silently keep serving the 5-row drop
    writeEvents(9)
    assert(decoded(TextFormats.ensureJsonDrop(spark, dir)) == 9L,
      "stale drop served after in-place source regeneration")
    // unchanged source → cache hit (marker fingerprint matches, no rebuild):
    // the marker's mtime must not move on the third call
    val marker = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_json_" +
        Integer.toHexString(dir.hashCode).takeRight(8), "_DROP_READY")
    val mtime = marker.lastModified()
    assert(decoded(TextFormats.ensureJsonDrop(spark, dir)) == 9L)
    assert(marker.lastModified() == mtime, "cache rebuilt without a source change")
  }

  test("a wrong-TYPED field quarantines the row AND keeps siblings as partial results") {
    // the measured semantics the fixture comment documents, pinned so a
    // Spark upgrade that changes them is caught here, not by a drifting
    // oracle: the raw line lands in the corrupt column (dead-letter sees
    // the original) while parseable siblings survive (salvageable)
    val dir = java.nio.file.Files.createTempDirectory("graft_json_leniency")
    java.nio.file.Files.write(dir.resolve("drop.json"),
      "{\"event_id\": true, \"user_id\": 7, \"event_type\": \"click\", \"value\": 1.5}\n"
        .getBytes("UTF-8"))
    val rows = spark.read.schema(TextFormats.eventWireSchema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_bad")
      .json(dir.toString).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.isNullAt(r.fieldIndex("event_id")), "mistyped field must be nulled")
    assert(!r.isNullAt(r.fieldIndex("_bad")), "row must be quarantined with its raw line")
    assert(r.getLong(r.fieldIndex("user_id")) == 7L, "siblings must survive")
  }
}
