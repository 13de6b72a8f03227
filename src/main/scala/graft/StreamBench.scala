package graft

import graft.streaming.{CdcSource, CdcStream}
import org.apache.spark.sql.SparkSession

/** Streaming-pipeline throughput probe: drives the `events` table through the
  * custom micro-batch CDC source + the stateful prev-image pipeline
  * (`CdcStream.withPrevState`, merge-patch included) and reports events/sec —
  * the measurable counterpart to the reference's (unpublished) throughput,
  * whose design ceiling is a single event-loop goroutine fed by Postgres
  * NOTIFY (reference `server.go:258-281`; SURVEY §6).
  *
  * Usage: runMain graft.StreamBench [sfDir]  → one JSON line.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // stage the log into the in-memory feed (bench fixture, not the operator)
    val rows = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "props")
      .as[CdcStream.RawChange].collect()

    def drain(feedName: String, conf: Map[String, String] = Map.empty,
              pipe: org.apache.spark.sql.Dataset[CdcStream.RawChange] =>
                org.apache.spark.sql.Dataset[CdcStream.CdcEvent] =
                CdcStream.withPrevState(_)): Double = {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        CdcSource.FeedRegistry.get(feedName).append(rows: _*)
        val raw = spark.readStream.format("graft.streaming.CdcSourceProvider")
          .option("feed", feedName).option("numPartitions", cpus).load()
        val events = pipe(raw.as[CdcStream.RawChange])
        val q = events.writeStream.format("noop").outputMode("append").start()
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        q.stop()
        sec
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val coldSec = drain("bench_cold") // includes stream init + codegen warmup
    val warmSec = drain("bench_warm")
    println(s"""{"metric":"cdc_stream_throughput","events":${rows.length},"cold_sec":$coldSec,"warm_sec":$warmSec,"events_per_sec":${(rows.length / warmSec).toLong},"sf":"$sfDir"}""")

    // state-store knob probes (r2 found the keyed state shuffle, not the
    // source, caps throughput): RocksDB provider vs the default HDFS-backed
    // in-memory map, and 4x state partitions — measured either way, a
    // recorded "no win" is a result too
    val rocksSec = drain("bench_rocks", Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    println(s"""{"metric":"cdc_stream_throughput_rocksdb","events":${rows.length},"warm_sec":$rocksSec,"events_per_sec":${(rows.length / rocksSec).toLong},"sf":"$sfDir"}""")
    val partsSec = drain("bench_parts4x", Map(
      "spark.sql.shuffle.partitions" -> (cpus.toInt * 4).toString))
    println(s"""{"metric":"cdc_stream_throughput_parts4x","events":${rows.length},"warm_sec":$partsSec,"events_per_sec":${(rows.length / partsSec).toLong},"sf":"$sfDir"}""")
    // the Spark 4 transformWithState port (parity-pinned in CdcStreamSpec),
    // measured against the classic path; requires the RocksDB provider, so
    // its fair comparison line is cdc_stream_throughput_rocksdb above
    val twsSec = drain("bench_tws", Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      ds => CdcStream.withPrevStateTws(ds))
    println(s"""{"metric":"cdc_stream_throughput_tws","events":${rows.length},"warm_sec":$twsSec,"events_per_sec":${(rows.length / twsSec).toLong},"sf":"$sfDir"}""")

    // second line: the same drain through the PRODUCTION path — Derby-backed
    // JDBC feed, streaming partition readers (JdbcRowReader), id-range
    // parallelism — quantifying the JDBC reader against the in-memory ceiling
    val url = "jdbc:derby:memory:streambench;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE events (event_id BIGINT PRIMARY KEY, ts TIMESTAMP, " +
          "user_id BIGINT, event_type VARCHAR(32), props VARCHAR(500))")
      val ps = conn.prepareStatement("INSERT INTO events VALUES (?, ?, ?, ?, ?)")
      rows.foreach { r =>
        ps.setLong(1, r.event_id); ps.setTimestamp(2, r.ts); ps.setLong(3, r.user_id)
        ps.setString(4, r.event_type); ps.setString(5, r.props); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    val rawJdbc = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("jdbcUrl", url).option("jdbcTable", "events")
      .option("numPartitions", cpus).load()
    val qj = CdcStream.withPrevState(rawJdbc.as[CdcStream.RawChange])
      .writeStream.format("noop").outputMode("append").start()
    val tj = System.nanoTime()
    qj.processAllAvailable()
    val jdbcSec = (System.nanoTime() - tj) / 1e9
    qj.stop()
    println(s"""{"metric":"cdc_stream_throughput_jdbc","events":${rows.length},"warm_sec":$jdbcSec,"events_per_sec":${(rows.length / jdbcSec).toLong},"sf":"$sfDir"}""")
    spark.stop()
  }
}
