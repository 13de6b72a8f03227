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
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    } else df
  }
}
