package graft

import graft.streaming.{CdcStream, WindowSketches}
import graft.streaming.CdcStream.RawChange
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Misra–Gries inside streaming windows: the PODS'12 mergeable-summary
  * guarantee must survive Spark's streaming aggregation state (partial
  * buffers merged into the store at every micro-batch) — pinned against
  * exact per-window batch counts on a replay of the real fixture.
  */
class WindowSketchesSpec extends SparkSuite {
  import spark.implicits._

  test("per-window summaries honor the sketch guarantee against exact batch counts") {
    implicit val sqlCtx = spark.sqlContext
    val capacity = 16
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "props")
      .as[RawChange].collect().sortBy(_.event_id).toSeq
    assert(ev.nonEmpty)
    val (w1, w2) = ev.splitAt(ev.length / 2)
    val in = MemoryStream[RawChange]
    val q = WindowSketches.windowedHeavyHitters(in.toDS().toDF(),
        tsCol = "ts", keyCol = "user_id",
        windowDur = "1 hour", watermark = "0 seconds", capacity = capacity)
      .writeStream.format("memory").queryName("ws_out")
      .outputMode("append").start()
    val got = try {
      in.addData(w1: _*); q.processAllAvailable()
      in.addData(w2: _*); q.processAllAvailable()
      // close every window: advance the watermark past the fixture's max ts
      in.addData(RawChange(Long.MaxValue,
        new java.sql.Timestamp(ev.map(_.ts.getTime).max + 24L * 3600 * 1000),
        0L, "flush", "{}"))
      q.processAllAvailable()
      spark.table("ws_out")
        .select(col("window.start").as("ws"), col("heavy"), col("n"))
        .collect()
        .map(r => (r.getTimestamp(0),
          r.getMap[String, Long](1).toMap, r.getLong(2))).toSeq
    } finally q.stop()
    // exact ground truth per hour window from the same rows (batch)
    val exact = ev.groupBy(r => r.ts.getTime / 3600000L)
      .map { case (h, rs) =>
        new java.sql.Timestamp(h * 3600000L) ->
          rs.groupBy(_.user_id.toString).map { case (u, g) => u -> g.size.toLong }
      }
    val emitted = got.filter { case (ws, _, _) => exact.contains(ws) }
    assert(emitted.nonEmpty, s"no fixture windows emitted: ${got.take(3)}")
    // window completeness: every emitted fixture window carries its exact n
    emitted.foreach { case (ws, heavy, n) =>
      val truth = exact(ws)
      assert(n == truth.values.sum, s"window $ws lost rows: $n vs ${truth.values.sum}")
      assert(heavy.size <= capacity, s"window $ws summary over capacity: ${heavy.size}")
      val bound = truth.values.sum / (capacity + 1L)
      truth.foreach { case (u, tc) =>
        if (tc > bound)
          assert(heavy.contains(u),
            s"window $ws: true heavy hitter $u (count $tc > $bound) missing")
      }
      heavy.foreach { case (u, est) =>
        val tc = truth.getOrElse(u, 0L)
        assert(est <= tc && tc <= est + bound,
          s"window $ws: estimate $est for $u violates bound (true $tc, slack $bound)")
      }
    }
  }

  test("online cusum: alarms match the scalar reference fold; resets; two-sided; batch-split invariant") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.WindowSketches.{CusumAlert, SeriesPoint}
    val (mu0, k, h) = (100L, 5L, 30L)
    // level 100 → upward shift to 120 at t=20 → back → downward dip to 70
    // at t=45; deterministic, integer
    val series = (0L until 60L).map { t =>
      val x = if (t >= 20 && t < 30) 120L else if (t >= 45 && t < 52) 70L else 100L
      SeriesPoint("m", t, x + (t % 3) - 1) // ±1 jitter, mean-preserving
    }
    // scalar reference fold — the textbook recursion, independently coded
    def reference(ps: Seq[SeriesPoint]): Seq[CusumAlert] = {
      var (sp, sn) = (0L, 0L)
      val out = Seq.newBuilder[CusumAlert]
      ps.sortBy(_.seq).foreach { p =>
        sp = math.max(0L, sp + (p.x - mu0 - k)); sn = math.max(0L, sn + (mu0 - p.x - k))
        if (sp > h) { out += CusumAlert("m", p.seq, 1, sp); sp = 0L }
        if (sn > h) { out += CusumAlert("m", p.seq, -1, sn); sn = 0L }
      }
      out.result()
    }
    val want = reference(series)
    assert(want.exists(_.side == 1) && want.exists(_.side == -1),
      s"fixture must trip both sides: $want")
    // streamed in three arbitrary batch splits — the state must make the
    // fold batch-boundary invariant
    val in = MemoryStream[SeriesPoint]
    val q = graft.streaming.WindowSketches.cusumAlerts(in.toDS(), mu0, k, h)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    val got = try {
      in.addData(series.take(25): _*); q.processAllAvailable()
      in.addData(series.slice(25, 48): _*); q.processAllAvailable()
      in.addData(series.drop(48): _*); q.processAllAvailable()
      spark.table("cusum_out").as[CusumAlert].collect().toSeq.sortBy(_.seq)
    } finally q.stop()
    assert(got == want, s"streamed alarms diverged:\n got $got\nwant $want")
  }

  test("windowed profile: HLL and GK bounds hold per emitted window") {
    implicit val sqlCtx = spark.sqlContext
    val acc = 100
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "props")
      .as[RawChange].collect().sortBy(_.event_id).toSeq
    val in = MemoryStream[RawChange]
    // value proxy: user_id as the numeric column (RawChange carries no
    // value; the bound math only needs SOME numeric distribution)
    val q = WindowSketches.windowedProfile(
        in.toDS().toDF().withColumn("v", col("user_id").cast("double")),
        tsCol = "ts", idCol = "user_id", valCol = "v",
        windowDur = "1 hour", watermark = "0 seconds", accuracy = acc)
      .writeStream.format("memory").queryName("wp_out")
      .outputMode("append").start()
    val got = try {
      in.addData(ev: _*); q.processAllAvailable()
      in.addData(RawChange(Long.MaxValue,
        new java.sql.Timestamp(ev.map(_.ts.getTime).max + 24L * 3600 * 1000),
        0L, "flush", "{}"))
      q.processAllAvailable()
      spark.table("wp_out")
        .select(col("window.start").as("ws"), col("n"), col("approx_ids"),
          col("p50"), col("sd"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
        .toSeq
    } finally q.stop()
    val byWindow = ev.groupBy(r => r.ts.getTime / 3600000L)
      .map { case (h, rs) => new java.sql.Timestamp(h * 3600000L) -> rs }
    val emitted = got.filter { case (ws, _, _, _, _) => byWindow.contains(ws) }
    assert(emitted.nonEmpty)
    emitted.foreach { case (ws, n, approxIds, p50, sd) =>
      val rs = byWindow(ws)
      // the dispersion column is an exact mergeable moment, not a sketch
      val m = rs.map(_.user_id.toDouble).sum / rs.size
      val exactSd = math.sqrt(rs.map(r => (r.user_id - m) * (r.user_id - m)).sum / rs.size)
      assert(math.abs(sd - exactSd) <= 1e-6 * math.max(1.0, exactSd),
        s"$ws: sd $sd vs exact $exactSd")
      assert(n == rs.size.toLong, s"$ws: n $n vs ${rs.size}")
      val exactIds = rs.map(_.user_id).distinct.size.toLong
      assert(math.abs(approxIds - exactIds) * 10 <= math.max(exactIds, 1L),
        s"$ws: HLL $approxIds vs exact $exactIds beyond 10%")
      // GK rank bound, rank-range form (ties legal): target T = ceil(n/2)
      // within [count(<p50)+1 - n/acc, count(<=p50) + n/acc], exact
      // integers via 2T = n + n%2 (same formula as quantileBoundCheck)
      val vals = rs.map(_.user_id.toDouble)
      val le = vals.count(_ <= p50).toLong
      val lt = vals.count(_ < p50).toLong
      val t2 = n + n % 2
      val ok = 2L * acc * (lt + 1) - 2 * n <= acc * t2 &&
        acc * t2 <= 2L * acc * le + 2 * n
      assert(ok, s"$ws: p50 $p50 violates rank bound (lt $lt, le $le, n $n)")
    }
  }

  test("auto-calibrated cusum: planted shift pages, stable series doesn't, split-invariant") {
    implicit val sqlCtx = spark.sqlContext
    import WindowSketches.{CusumAlert, SeriesPoint}
    // deterministic ±3 jitter; the shifted series jumps 100 → 140 at t=30
    def jitter(t: Long): Long = (t % 7) - 3
    val shifted = (0L until 45L).map(t =>
      SeriesPoint("shifted", t, (if (t >= 30) 140L else 100L) + jitter(t)))
    val stable = (0L until 45L).map(t => SeriesPoint("stable", t, 100L + jitter(t)))
    // interleave groups so every micro-batch carries both series
    val series = (shifted ++ stable).sortBy(p => (p.seq, p.group))
    // scalar reference: calibrate on the first 20 obs per group with the
    // SAME derivation, then the independently-coded Page fold
    def reference(ps: Seq[SeriesPoint]): Seq[CusumAlert] = {
      val (warm, rest) = ps.sortBy(_.seq).splitAt(20)
      val cal = WindowSketches.calibrate(warm.map(_.x))
      var (sp, sn) = (0L, 0L)
      val out = Seq.newBuilder[CusumAlert]
      rest.foreach { p =>
        sp = math.max(0L, sp + (p.x - cal.mu0 - cal.k))
        sn = math.max(0L, sn + (cal.mu0 - p.x - cal.k))
        if (sp > cal.h) { out += CusumAlert(p.group, p.seq, 1, sp); sp = 0L }
        if (sn > cal.h) { out += CusumAlert(p.group, p.seq, -1, sn); sn = 0L }
      }
      out.result()
    }
    val want = (reference(shifted) ++ reference(stable)).sortBy(a => (a.group, a.seq))
    // the behavioral contract, asserted independently of the fold: the
    // planted shift pages (and not before it lands), the stable twin never
    assert(want.exists(a => a.group == "shifted" && a.side == 1 && a.seq >= 30),
      s"planted shift must page: $want")
    assert(!want.exists(a => a.group == "shifted" && a.seq < 30), s"paged early: $want")
    assert(!want.exists(_.group == "stable"), s"stable series paged: $want")
    // streamed in three arbitrary splits: calibration set and alarms must
    // be batch-boundary invariant
    val in = MemoryStream[SeriesPoint]
    val q = WindowSketches.autoCusumAlerts(in.toDS(), warmup = 20)
      .writeStream.format("memory").queryName("auto_cusum_out")
      .outputMode("append").start()
    val got = try {
      in.addData(series.take(17): _*); q.processAllAvailable()
      in.addData(series.slice(17, 66): _*); q.processAllAvailable()
      in.addData(series.drop(66): _*); q.processAllAvailable()
      spark.table("auto_cusum_out").as[CusumAlert].collect()
        .toSeq.sortBy(a => (a.group, a.seq))
    } finally q.stop()
    assert(got == want, s"auto-cusum diverged:\n got $got\nwant $want")
  }

  test("kmv novelty monitor: exact regime, telescoping, micro-batch merge-invariance") {
    implicit val sqlCtx = spark.sqlContext
    import WindowSketches.{HashRow, NoveltyPoint}
    // deterministic 64-bit fingerprints (any injective scramble works —
    // estimator ACCURACY is KMinValuesSpec's job; here we pin semantics)
    def fp(id: Long): Long = scala.util.hashing.byteswap64(id)
    def wave(r: Range): Seq[HashRow] = r.map(i => HashRow("docs", fp(i.toLong)))
    val waves = Seq(wave(0 until 1000), wave(500 until 1500), wave(0 until 500))

    def run(k: Int, batches: Seq[Seq[HashRow]]): Seq[NoveltyPoint] = {
      val in = MemoryStream[HashRow]
      val name = s"kmv_nov_${k}_${batches.length}"
      val q = WindowSketches.kmvNovelty(in.toDS(), k)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[NoveltyPoint].collect().toSeq
      } finally q.stop()
    }

    // exact regime (k > all-time distinct): per-batch novelty is EXACT —
    // 1000 new, then 500 new of 1000 arriving, then 0 new of 500 re-sent
    val pts = run(2048, waves)
    assert(pts.map(_.n_rows) == Seq(1000L, 1000L, 500L))
    assert(pts.map(_.est_novel) == Seq(1000.0, 500.0, 0.0), s"novelty: $pts")
    assert(pts.map(_.est_after) == Seq(1000.0, 1500.0, 1500.0))
    // telescoping: deltas sum to the all-time estimate by construction
    assert(pts.map(_.est_novel).sum == pts.last.est_after)

    // estimation regime (k = 64 << 1500 distinct): however the stream is
    // micro-batched, the state sketch — hence every estimate derived from
    // it — lands bit-identical (KMV is a set function)
    val oneShot = run(64, Seq(waves.flatten))
    val split = run(64, waves)
    assert(oneShot.last.est_after == split.last.est_after,
      s"micro-batching changed the sketch: ${oneShot.last} vs ${split.last}")
    assert(math.abs(split.map(_.est_novel).sum - split.last.est_after) < 1e-9)
    assert(split.map(_.seq) == Seq(0L, 1L, 2L), "per-group batch ordinal")
  }

  test("sliding novelty: an item re-sent after its window expired counts novel again") {
    implicit val sqlCtx = spark.sqlContext
    import WindowSketches.{HashRow, NoveltyPoint, SlidingNoveltyPoint}
    def fp(id: Long): Long = scala.util.hashing.byteswap64(id)
    def wave(r: Range): Seq[HashRow] = r.map(i => HashRow("docs", fp(i.toLong)))
    // A, B, C fresh; D re-sends A's items — 3 batches after they were seen
    val batches = Seq(wave(0 until 100), wave(100 until 200),
      wave(200 until 300), wave(0 until 100))

    val in = MemoryStream[HashRow]
    val q = WindowSketches.kmvNoveltySliding(in.toDS(), windows = 2, k = 2048)
      .writeStream.format("memory").queryName("slide_nov")
      .outputMode("append").start()
    val slide = try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table("slide_nov").as[SlidingNoveltyPoint].collect().toSeq.sortBy(_.seq)
    } finally q.stop()
    // exact regime: ring of {B, C} at batch D -> A's 100 items are novel
    // again vs the 2-batch horizon
    assert(slide.map(_.est_novel) == Seq(100.0, 100.0, 100.0, 100.0),
      s"sliding novelty: $slide")
    assert(slide.map(_.est_recent) == Seq(0.0, 100.0, 200.0, 200.0))

    // the all-time twin disagrees on D — by design
    val in2 = MemoryStream[HashRow]
    val q2 = WindowSketches.kmvNovelty(in2.toDS(), k = 2048)
      .writeStream.format("memory").queryName("alltime_nov")
      .outputMode("append").start()
    val allTime = try {
      batches.foreach { b => in2.addData(b: _*); q2.processAllAvailable() }
      spark.table("alltime_nov").as[NoveltyPoint].collect().toSeq.sortBy(_.seq)
    } finally q2.stop()
    assert(allTime.map(_.est_novel) == Seq(100.0, 100.0, 100.0, 0.0),
      s"all-time twin: $allTime")
  }

  test("event-time novelty: windows close by watermark, compared against their predecessor") {
    implicit val sqlCtx = spark.sqlContext
    import WindowSketches.{TimedHashRow, EventWindowNovelty}
    def fp(id: Long): Long = scala.util.hashing.byteswap64(id)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:10:00").getTime
    val hour = 3600000L
    def at(h: Int) = new java.sql.Timestamp(base + h * hour)
    def wave(h: Int, r: Range) = r.map(i => TimedHashRow("crawl", at(h), fp(i.toLong)))
    val in = MemoryStream[TimedHashRow]
    val q = WindowSketches.kmvNoveltyByEventTime(in.toDS(), windowMs = hour, k = 2048)
      .writeStream.format("memory").queryName("evt_nov")
      .outputMode("append").start()
    val got = try {
      // hour 0 and hour 1 share half their content; hour 3 re-sends hour
      // 0's — with a GAP at hour 2, so it has NO predecessor
      in.addData(wave(0, 0 until 100) ++ wave(1, 50 until 150): _*)
      q.processAllAvailable()
      in.addData(wave(3, 0 until 100): _*); q.processAllAvailable()
      // two flush ticks: the watermark advances between batches
      in.addData(TimedHashRow("crawl", at(10), fp(999999L))); q.processAllAvailable()
      in.addData(TimedHashRow("crawl", at(11), fp(999998L))); q.processAllAvailable()
      // a row later than its (already-final) window must drop silently
      in.addData(TimedHashRow("crawl", at(0), fp(777777L))); q.processAllAvailable()
      spark.table("evt_nov").as[EventWindowNovelty].collect().toSeq
        .sortBy(_.window_start.getTime)
    } finally q.stop()
    val hours = got.map(p => (p.window_start.getTime - (base - 600000L)) / hour)
    assert(hours.take(3) == Seq(0L, 1L, 3L), s"windows finalized: $got")
    // exact regime: hour 0 all novel (no predecessor), hour 1 introduces
    // its 50 fresh ids over hour 0, hour 3 all novel (gap = no predecessor)
    assert(got(0).n_rows == 100 && got(0).est_window == 100.0 &&
      got(0).est_novel_vs_prev == 100.0, s"h0: ${got(0)}")
    assert(got(1).n_rows == 100 && got(1).est_novel_vs_prev == 50.0, s"h1: ${got(1)}")
    assert(got(2).n_rows == 100 && got(2).est_novel_vs_prev == 100.0, s"h3: ${got(2)}")
    // the late at(0) row neither re-emitted hour 0 nor opened a window
    assert(got.count(_.window_start.getTime == base - 600000L) == 1)
  }

  test("novelty collapse pages end to end: kmvNovelty -> cusumAlerts") {
    implicit val sqlCtx = spark.sqlContext
    import WindowSketches.{HashRow, NoveltyPoint, SeriesPoint, CusumAlert}
    def fp(id: Long): Long = scala.util.hashing.byteswap64(id)
    // a crawler delivering 200 genuinely-new pages per batch for 25
    // batches, then wedging and re-fetching batch 1's pages forever
    def fresh(b: Int) = (0 until 200).map(i => HashRow("crawl", fp(b * 200L + i)))
    val healthy = (0 until 25).map(fresh)
    val wedged = (25 until 40).map(_ => fresh(0))
    // the stable twin keeps delivering new pages — must never page
    val stable = (0 until 40).map(fresh)

    def noveltyPoints(batches: Seq[Seq[HashRow]]): Seq[NoveltyPoint] = {
      val in = MemoryStream[HashRow]
      val name = s"nov_e2e_${batches.hashCode.abs}"
      val q = WindowSketches.kmvNovelty(in.toDS(), k = 2048)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[NoveltyPoint].collect().toSeq.sortBy(_.seq)
      } finally q.stop()
    }
    def alarms(points: Seq[NoveltyPoint]): Seq[CusumAlert] = {
      val in = MemoryStream[NoveltyPoint]
      val name = s"nov_cusum_${points.hashCode.abs}"
      // μ₀ = the healthy 200-new-per-batch rate; k = 20 slack absorbs
      // estimation noise (KMV at k=2048 over ≤5000 distinct is ~±3%)
      val q = WindowSketches.cusumAlerts(
          WindowSketches.noveltySeries(in.toDS()), mu0 = 200L, k = 20L, h = 300L)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        // telemetry replayed in two chunks — the Monitor.healthAlerts shape
        points.grouped(17).foreach { c => in.addData(c: _*); q.processAllAvailable() }
        spark.table(name).as[CusumAlert].collect().toSeq.sortBy(_.seq)
      } finally q.stop()
    }

    val collapsed = alarms(noveltyPoints(healthy ++ wedged))
    assert(collapsed.nonEmpty, "novelty collapse never paged")
    assert(collapsed.head.side == -1, s"collapse must page DOWNWARD: ${collapsed.head}")
    assert(collapsed.head.seq >= 25, s"paged before the wedge: ${collapsed.head}")
    assert(collapsed.head.seq <= 28, s"paged too slowly: ${collapsed.head}")
    assert(alarms(noveltyPoints(stable)).isEmpty, "stable crawler paged")
  }
}
