package graft

import graft.streaming.{CdcSource, CdcStream, StateErasure, StateMigration}
import org.apache.spark.sql.SparkSession

/** GDPR erasure of DURABLE STREAMING STATE at scale — the r11 operator's
  * cost curve: build a transformWithState prev-image checkpoint holding
  * ~N/2 keys (synthetic feed, RocksDB, accumulated in waves like a live
  * capture), then erase a 10k-entity backlog and measure BOTH deployment
  * shapes:
  *
  *  - '''in-place''' ([[CdcStream.withPrevStateTwsErasing]] on the SAME
  *    checkpoint): the erased keys here are exactly the users of the next
  *    wave (recurring keys — the sentinel-free case), so the measured
  *    micro-batch carries one event per erased key; an identically-sized
  *    NO-ERASURE control wave runs first, and the difference is the
  *    in-place erasure cost itself — which must be ~zero, because only
  *    the touched keys' entries change and the non-erased millions sleep;
  *  - '''offline rewrite''' ([[StateErasure.erasePrevImageStateTws]] →
  *    fresh checkpoint via the erasing initial-state resume): read every
  *    state row, anti-join, re-seed — scales with TOTAL key count, the
  *    price of the layout rewrite and the reason in-place is the default
  *    recommendation for the tws path.
  *
  * Usage: runMain graft.EraseScaleBench [nEvents] [nErased] [waves]
  * (defaults 2,000,000 events / ~1M keys / 10,000 erased / 4 waves).
  * One JSON line per phase; erasure is VERIFIED, not assumed (state-reader
  * spot check in-place, exact count offline).
  */
object EraseScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nErased = args.lift(1).map(_.toInt).getOrElse(10000)
    val waves = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val users = math.max(1L, n / 2)
    val feedName = "erase_scale_feed"
    val feed = CdcSource.SyntheticRegistry.get(feedName, users)
    def src(startAfter: Long = -1L) = {
      val r = spark.readStream.format("graft.streaming.CdcSourceProvider")
        .option("synthetic", feedName).option("syntheticUsers", users.toString)
        .option("numPartitions", cpus)
      (if (startAfter >= 0) r.option("startAfterId", startAfter.toString) else r)
        .load().as[CdcStream.RawChange]
    }

    // ===== stage: the checkpoint every shape erases from =====
    val chk = java.nio.file.Files.createTempDirectory("erase_scale_chk").toString
    locally {
      val q = CdcStream.withPrevStateTws(src())
        .writeStream.format("noop")
        .option("checkpointLocation", chk).outputMode("append").start()
      val t0 = System.nanoTime()
      (1 to waves).foreach { w => feed.advanceTo(n / waves * w - 1); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      val rows = StateMigration.readPrevImageStateTws(spark, chk).count()
      println(s"""{"metric":"erase_scale_stage","events":$n,"state_rows":$rows,"sec":$sec}""")
      require(rows == users, s"staging built $rows of $users keys")
    }

    // ===== control: one nErased-event wave, NO erasure =====
    locally {
      val q = CdcStream.withPrevStateTws(src())
        .writeStream.format("noop")
        .option("checkpointLocation", chk).outputMode("append").start()
      val t0 = System.nanoTime()
      feed.advanceTo(n + nErased - 1); q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(s"""{"metric":"erase_scale_control_wave","events":$nErased,"sec":$sec}""")
    }

    // ===== shape 1: in-place on the existing checkpoint =====
    // erased = exactly the users of the NEXT wave's ids (recurring keys);
    // cutoff below the wave so the new rows flow first-sight
    locally {
      val waveIds = (n + nErased) until (n + 2L * nErased)
      val erased: Map[Long, Long] =
        waveIds.map(id => (id % users) -> (n + nErased - 1)).toMap
      val q = CdcStream.withPrevStateTwsErasing(src(), erased)
        .writeStream.format("noop")
        .option("checkpointLocation", chk).outputMode("append").start()
      val t0 = System.nanoTime()
      feed.advanceTo(n + 2L * nErased - 1); q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      // verify on a sample: each erased key's durable state must be the
      // NEW payload (k = waveId % 997), never the pre-erasure one
      val sample = waveIds.take(50).map(id => (id % users, s"""{"k": ${id % 997}}""")).toMap
      val got = StateMigration.readPrevImageStateTws(spark, chk)
        .filter(r => sample.contains(r._1)).collect().toMap
      require(got == sample, s"in-place erasure left stale payloads: ${got.size} checked")
      println(s"""{"metric":"erase_scale_inplace","state_rows":$users,"erased":${erased.size},"sec":$sec}""")
    }

    // ===== shape 2: offline rewrite to a fresh checkpoint =====
    locally {
      val stride = math.max(1L, users / nErased)
      // distinct keys, none of them the single driver row's user
      val driverId = n + 2L * nErased
      val erased2: Map[Long, Long] = (0 until nErased)
        .map(i => (i * stride) -> driverId)
        .filterNot(_._1 == driverId % users).toMap
      val chkB = java.nio.file.Files.createTempDirectory("erase_scale_chk_b").toString
      val t0 = System.nanoTime()
      val stE = StateErasure.erasePrevImageStateTws(spark, chk, erased2.keySet)
      // fresh checkpoint: the source must resume AFTER everything the old
      // query consumed (the migration offset-handoff discipline), or batch
      // 0 would re-ingest the whole history instead of seeding state
      val q = CdcStream.withPrevStateTwsErasingFrom(
          src(startAfter = n + 2L * nErased - 1), erased2, stE)
        .writeStream.format("noop")
        .option("checkpointLocation", chkB).outputMode("append").start()
      feed.advanceTo(driverId); q.processAllAvailable() // batch 0 persists the seed
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      val after = StateMigration.readPrevImageStateTws(spark, chkB).count()
      val want = users - erased2.size
      require(after == want, s"offline rewrite left $after rows, want $want")
      println(s"""{"metric":"erase_scale_offline","state_rows_before":$users,"erased":${erased2.size},"state_rows_after":$after,"sec":$sec}""")
    }
    spark.stop()
  }
}
