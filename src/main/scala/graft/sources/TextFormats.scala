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
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_DROP_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val root = new org.apache.hadoop.fs.Path(dir)
      if (fs.exists(root)) fs.delete(root, true) // interrupted prior write
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
      fs.create(marker).close()
    }
    dir
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
    raw.groupBy(
        when(col("_bad").isNotNull, lit("_corrupt"))
          .otherwise(col("event_type")).as("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_bad").isNull, col("value").cast("decimal(18,2)")))
          .cast("double").as("sum_value"),
        countDistinct(when(col("_bad").isNull, col("user_id"))).as("n_users"))
  }
}
