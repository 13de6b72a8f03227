package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout
  * (`/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`, see
  * /root/repo/TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has shipped in two physical layouts: TIMESTAMP(NANOS)
    // (read as a raw-nanos long under nanosAsLong, then converted — also the
    // layout ScaleProbe's blowup dirs keep for DuckDB-comparability) and
    // TIMESTAMP(MICROS) (reads as a timestamp directly). Branch on the type
    // actually loaded and normalize both to the session TimestampType so
    // every downstream query sees one ts type regardless of layout; under
    // the UTC session zone the NTZ→LTZ cast is wall-clock identity.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      // a long-typed ts is ONLY ever nanosAsLong's rendering of
      // TIMESTAMP(NANOS) — a hypothetical raw-micros-as-long layout would
      // silently come out 1000x too small here, so any NEW long-shaped
      // layout must extend this match, not reuse the nanos branch
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        // micros-native; NTZ→LTZ cast is wall-clock identity under the UTC
        // session zone every entry point sets
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case other =>
        // fail fast: the driver has changed this file's physical layout
        // before (nanos→micros mid-round-5) — a third layout must be looked
        // at, not guessed at
        throw new IllegalStateException(
          s"events.ts has unrecognized physical type $other — inspect the parquet and extend Tables.load")
    } else df
  }
}
