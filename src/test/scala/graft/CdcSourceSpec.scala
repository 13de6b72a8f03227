package graft

import graft.streaming.{CdcSource, CdcStream}
import graft.streaming.CdcStream.RawChange
import java.sql.Timestamp

/** End-to-end drive of the custom DataSource V2 micro-batch CDC source:
  * readStream through the provider class, poll across batches, exactly-once
  * offsets, and composition with the stateful prev-image pipeline.
  */
class CdcSourceSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("polls new rows per micro-batch, no duplicates, parallel range partitions") {
    val feed = CdcSource.FeedRegistry.get("spec1")
    val df = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("feed", "spec1").option("numPartitions", "3").load()
    val q = df.writeStream.format("memory").queryName("src_out").outputMode("append").start()
    try {
      feed.append(
        RawChange(1, t(0), 1, "signup", """{"k":1}"""),
        RawChange(2, t(1), 2, "purchase", """{"k":2}"""))
      q.processAllAvailable()
      assert(spark.table("src_out").count() == 2)

      feed.append(
        RawChange(3, t(2), 1, "view", """{"k":3}"""),
        RawChange(4, t(3), 2, "error", """{"k":4}"""),
        RawChange(5, t(4), 3, "click", """{"k":5}"""))
      q.processAllAvailable()
      val rows = spark.table("src_out").orderBy("event_id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      // re-process with nothing new: offset must not regress or re-emit
      q.processAllAvailable()
      assert(spark.table("src_out").count() == 5)
    } finally q.stop()
  }

  test("restart from checkpoint resumes after the committed offset (exactly-once)") {
    val feed = CdcSource.FeedRegistry.get("spec3")
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("cdc_out").toString
    def start() = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("feed", "spec3").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    try {
      feed.append(
        RawChange(1, t(0), 1, "signup", """{"k":1}"""),
        RawChange(2, t(1), 1, "purchase", """{"k":2}"""))
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
    } finally q1.stop()

    // rows arriving while the query is DOWN must be delivered exactly once
    // after restart (the reference silently drops these — SURVEY §1.3)
    feed.append(RawChange(3, t(2), 1, "view", """{"k":3}"""))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val ids = spark.read.parquet(out).orderBy("event_id").collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 2L, 3L), s"expected exactly-once delivery across restart, got $ids")
    } finally q2.stop()
  }

  test("maxIdsPerTrigger: a backlog drains in bounded bites, exactly once") {
    import spark.implicits._
    val feed = CdcSource.FeedRegistry.get("spec_admission")
    // a 100-row "downtime backlog" present BEFORE the query starts — the
    // shape that, uncapped, becomes one giant first micro-batch
    (0L until 100L).foreach(i =>
      feed.append(RawChange(i, t(i), i % 5, "click", s"""{"k":$i}""")))
    val q = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("feed", "spec_admission").option("numPartitions", "2")
      .option("maxIdsPerTrigger", "30").load()
      .writeStream.format("memory").queryName("src_capped")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // exactly-once over the whole backlog: the cap moves batch
      // boundaries, never delivery
      val ids = spark.table("src_capped").select("event_id").as[Long].collect()
      assert(ids.sorted.toSeq == (0L until 100L), s"delivery broken: ${ids.length} rows")
      // and it really was bitten up: >= ceil(100/30) = 4 batches, none
      // above the cap (first batch spans (-1, 29] = 31 ids — the range is
      // exclusive-start, so allow cap+1 rows)
      val progs = q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
        .recentProgress.filter(_.numInputRows > 0)
      assert(progs.length >= 4, s"backlog not capped: ${progs.length} batches")
      assert(progs.forall(_.numInputRows <= 31),
        s"a batch overflowed the cap: ${progs.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("composes with the stateful CDC pipeline end to end") {
    val feed = CdcSource.FeedRegistry.get("spec2")
    val raw = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("feed", "spec2").load()
    val events = CdcStream.withPrevState(raw.as[RawChange])
    val q = events.writeStream.format("memory").queryName("src_cdc").outputMode("append").start()
    try {
      feed.append(RawChange(1, t(0), 9, "signup", """{"k":1}"""))
      q.processAllAvailable()
      feed.append(RawChange(2, t(1), 9, "purchase", """{"k":7}"""))
      q.processAllAvailable()
      val rows = spark.table("src_cdc").orderBy("event_id").collect()
      assert(rows.length == 2)
      assert(rows(1).getAs[String]("changes") == """{"k":1}""")
    } finally q.stop()
  }

  test("maxBytesPerTrigger: fat-payload backlog drains in byte-bounded bites, exactly once") {
    import spark.implicits._
    val feed = CdcSource.FeedRegistry.get("spec_bytecap")
    // ~1 KB payloads: an id cap sized for normal rows would admit MBs here;
    // the byte budget sizes the bite from the pending head's mean row size
    val pad = "x" * 1000
    (0L until 100L).foreach(i =>
      feed.append(RawChange(i, t(i), i % 5, "click", s"""{"pad":"$pad"}""")))
    val q = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("feed", "spec_bytecap").option("numPartitions", "2")
      .option("maxBytesPerTrigger", "5200").load()
      .writeStream.format("memory").queryName("src_bytecap")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("src_bytecap").select("event_id").as[Long].collect()
      assert(ids.sorted.toSeq == (0L until 100L), s"delivery broken: ${ids.length} rows")
      // ~1043 B/row against a 5200 B budget ≈ 4-5 ids per bite (+1 on the
      // exclusive-start first batch)
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      assert(progs.length >= 15, s"byte cap did not bite: ${progs.length} batches")
      assert(progs.forall(_.numInputRows <= 6),
        s"a batch overflowed the byte budget: ${progs.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("Trigger.AvailableNow: drains the backlog in capped bites, then stops at the recorded tail") {
    import spark.implicits._
    val feed = CdcSource.FeedRegistry.get("spec_availnow")
    (0L until 100L).foreach(i =>
      feed.append(RawChange(i, t(i), i % 5, "click", s"""{"k":$i}""")))
    val q = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("feed", "spec_availnow").option("numPartitions", "2")
      .option("maxIdsPerTrigger", "30").load()
      .writeStream.format("memory").queryName("src_availnow")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    // bounded-drain-then-STOP: the query terminates on its own once the
    // tail recorded at prepare time is reached — the scheduled-backfill
    // contract (no operator intervention, no manual stop)
    assert(q.awaitTermination(120000), "AvailableNow query must stop by itself")
    val ids = spark.table("src_availnow").select("event_id").as[Long].collect()
    assert(ids.sorted.toSeq == (0L until 100L), s"delivery broken: ${ids.length} rows")
    val progs = q.recentProgress.filter(_.numInputRows > 0)
    assert(progs.length >= 4, s"backlog not drained in bites: ${progs.length} batches")
    assert(progs.forall(_.numInputRows <= 31),
      s"a bite overflowed the cap: ${progs.map(_.numInputRows).toSeq}")
    // rows landing after the drain belong to the NEXT scheduled run
    feed.append(RawChange(100L, t(100), 0L, "click", """{"k":100}"""))
    assert(spark.table("src_availnow").count() == 100L,
      "a stopped AvailableNow query must not deliver post-tail rows")
  }
}
