package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sketches inside streaming windows — the composition the mergeable-
  * summary design exists FOR (Agarwal et al., PODS'12: a summary mergeable
  * under arbitrary combine trees is exactly a summary that can live in
  * streaming aggregation state, where Spark merges per-partition partial
  * buffers into the store's running buffer at every micro-batch).
  *
  * [[windowedHeavyHitters]] runs the capacity-m Misra–Gries summary
  * ([[graft.functions.MisraGries]]) per watermarked event-time window:
  * the state per (window, group) is ONE capacity-m map — constant-size
  * regardless of how many events or distinct keys the window sees — and
  * the window closes (Append mode) with the summary carrying the sketch's
  * full guarantee: every key with true in-window frequency > n/(m+1) is
  * present, each estimate undercounts by at most n/(m+1).
  *
  * What this buys at 100 TB/day: "top talkers per 5-minute window" with
  * per-window state of a few KB, no per-key state rows, no second pass —
  * the batch path's exact-recount discipline
  * ([[graft.ops.TextStats.heavyHitters]]) trades a rescan for
  * determinism below the guarantee line; a closed streaming window cannot
  * be rescanned, so the online form ships the summary itself and the
  * consumer applies the θ-threshold the capacity was sized for
  * (m ≥ 1/θ ⇒ everything above θ·n is in the map).
  *
  * `WindowSketchesSpec` pins the guarantee against exact per-window batch
  * counts on a replay of the real fixture: presence of every true heavy
  * hitter, the undercount bound on every estimate, the capacity bound,
  * and window completeness.
  */
object WindowSketches {

  /** Heavy-hitter summary per (event-time window[, extra group columns]).
    *
    * @param df        streaming frame with `tsCol` (timestamp) and `keyCol`
    * @param windowDur tumbling window duration, e.g. "1 minute"
    * @param watermark lateness bound; the window emits once it passes
    * @param capacity  sketch capacity m — size as 1/θ for a θ·n threshold
    * @param groupCols extra grouping columns next to the window (e.g.
    *                  event_type), so each group gets its own summary
    */
  def windowedHeavyHitters(df: DataFrame, tsCol: String, keyCol: String,
                           windowDur: String = "1 minute",
                           watermark: String = "2 minutes",
                           capacity: Int = graft.functions.MisraGries.DefaultCapacity,
                           groupCols: Seq[String] = Seq.empty): DataFrame = {
    val mg = graft.functions.MisraGries.sketch(capacity)
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur) +: groupCols.map(col): _*)
      .agg(
        mg(col(keyCol).cast("string")).as("heavy"),
        count(lit(1)).as("n"))
  }

  /** Per-window DATA PROFILE from the other two mergeable sketches the
    * engine gates in batch (HLL for distincts, GK for quantiles — both
    * Spark builtins whose aggregation buffers merge associatively, hence
    * streaming-state safe like the MG summary above): row count, distinct
    * cardinality of `idCol` (±2% rsd class), and the median of `valCol`
    * (rank error ≤ n/accuracy). The streaming twin of what
    * `ops_approx_distinct` + `ops_quantile_sketch` pin in batch;
    * `WindowSketchesSpec` pins the same bounds per emitted window.
    *
    * This is observability OF THE DATA (vs [[Monitor]]'s observability of
    * the queries): per-window cardinality and quantile drift is how a
    * pipeline notices a producer melt-down — a constant-size summary per
    * window, no per-key state.
    */
  def windowedProfile(df: DataFrame, tsCol: String, idCol: String,
                      valCol: String,
                      windowDur: String = "1 minute",
                      watermark: String = "2 minutes",
                      accuracy: Int = 100,
                      groupCols: Seq[String] = Seq.empty): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur) +: groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col(idCol), 0.02).as("approx_ids"),
        expr(s"approx_percentile($valCol, 0.5D, $accuracy)").as("p50"),
        // the fourth profile column: within-window dispersion (an exact
        // mergeable moment — (n, Σx, Σx²) buffers — not a sketch). Feeds
        // [[autoCusumAlerts]]' σ-scaled calibration and catches
        // variance-only regime changes the median hides
        stddev_pop(col(valCol)).as("sd"))

  /** One observation of a per-group series — e.g. a window's row count or
    * median off [[windowedProfile]]'s output. `seq` orders observations
    * within a micro-batch (window start epoch, day index, …).
    */
  case class SeriesPoint(group: String, seq: Long, x: Long)
  /** A level-shift alarm: the side that fired (+1 up / -1 down), the
    * statistic at the crossing, and the observation that tripped it.
    */
  case class CusumAlert(group: String, seq: Long, side: Int, stat: Long)
  /** Page's two one-sided statistics — the entire per-group state. */
  case class CusumState(sPos: Long, sNeg: Long)

  /** ONLINE CUSUM (Page 1954) over a per-group series — the streaming
    * twin of the batch retrospective changepoint (`ops_cusum`): the batch
    * form scans the COMPLETE series for the argmax of the centered
    * cumulative sum (it needs the global total, so it cannot run online);
    * the online form carries Page's one-sided statistics
    * `S⁺ = max(0, S⁺ + (x − μ₀ − k))`, `S⁻ = max(0, S⁻ + (μ₀ − x − k))`
    * and alarms when either crosses `h`, then resets that side — the
    * classic quickest-detection sequential test. All-integer arithmetic
    * (μ₀, k, h in the series' own units), so replay is hash-exact and the
    * spec can pin alarms against a scalar reference fold.
    *
    * State per group: two longs — constant, forever. Within-batch order
    * is by `seq` (window outputs of one micro-batch arrive unordered);
    * across batches the watermark discipline of the upstream window agg
    * already delivers windows in order. Compose:
    * `windowedProfile(...)` → map to [[SeriesPoint]] (`seq` = window
    * start epoch, `x` = n or p50-scaled) → `cusumAlerts` — data-health
    * paging on cardinality or latency-distribution shifts, end to end
    * inside the engine.
    */
  /** Calibration derived from a reference prefix of the series — the
    * textbook CUSUM tuning (μ₀ = reference median, k = σ/2 for optimal
    * detection of a 1σ shift, h = 5σ for the standard ARL trade), made a
    * value so [[autoCusumAlerts]] state and specs can inspect it.
    */
  case class CusumParams(mu0: Long, k: Long, h: Long)
  /** Auto-calibrating state: observations collected during warmup, then
    * the frozen params and Page's two statistics.
    */
  case class AutoCusumState(obs: Seq[Long], params: Option[CusumParams],
                            sPos: Long, sNeg: Long)

  /** Derive (μ₀, k, h) from a reference sample: μ₀ = lower median
    * (robust to cold-start outliers — the first trigger of a Spark query
    * IS one), σ = population stddev, k = max(1, ⌈kSigma·σ⌉),
    * h = max(1, ⌈hSigma·σ⌉). Deterministic in the sample, so replay and
    * micro-batch splits calibrate identically.
    */
  def calibrate(obs: Seq[Long], kSigma: Double = 0.5,
                hSigma: Double = 5.0): CusumParams = {
    require(obs.nonEmpty, "calibration needs at least one observation")
    val sorted = obs.sorted
    val mu0 = sorted((sorted.size - 1) / 2)
    val mean = obs.map(_.toDouble).sum / obs.size
    val sigma = math.sqrt(obs.map(x => (x - mean) * (x - mean)).sum / obs.size)
    CusumParams(mu0,
      math.max(1L, math.ceil(kSigma * sigma).toLong),
      math.max(1L, math.ceil(hSigma * sigma).toLong))
  }

  /** [[cusumAlerts]] WITHOUT hand-picked parameters — the deploy-without-
    * thinking form of data-health paging: the first `warmup` observations
    * per group (in `seq` order) form the reference window, (μ₀, k, h)
    * freeze from it via [[calibrate]], and Page's test runs from the next
    * observation on. Alarms are suppressed during warmup (no test exists
    * yet); a group whose series never reaches `warmup` observations never
    * alarms — size warmup to the series' cadence.
    *
    * A ZERO-VARIANCE reference (constant series) calibrates to
    * k = h = 1: any deviation beyond ±1 unit pages on the next
    * observation — the correct quickest-detection behavior for a series
    * that never moved; scale the series' units (e.g. feed p50·1000) if
    * unit-level jitter is expected but absent from the reference window.
    *
    * State per group: the warmup sample while calibrating (bounded by
    * `warmup`), then params + two longs forever. Batch-split invariant
    * exactly like [[cusumAlerts]]: the calibration set is the first
    * `warmup` points in seq order no matter how micro-batches cut the
    * series (`WindowSketchesSpec` pins it). Also runs on a BATCH dataset
    * (one group = one fold) — [[Monitor.healthAlerts]] uses that to page
    * on the engine's own telemetry ring.
    */
  def autoCusumAlerts(points: Dataset[SeriesPoint], warmup: Int = 20,
                      kSigma: Double = 0.5, hSigma: Double = 5.0,
                      stateTtl: Option[String] = None): Dataset[CusumAlert] = {
    import points.sparkSession.implicits._
    require(warmup >= 1, s"warmup must be >= 1, got $warmup")
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (g: String, rows: Iterator[SeriesPoint], state: GroupState[AutoCusumState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = if (state.exists) state.get
                     else AutoCusumState(Vector.empty, None, 0L, 0L)
            val out = Vector.newBuilder[CusumAlert]
            rows.toSeq.sortBy(_.seq).foreach { p =>
              st.params match {
                case None =>
                  val obs = st.obs :+ p.x
                  st =
                    if (obs.size >= warmup)
                      AutoCusumState(Vector.empty,
                        Some(calibrate(obs, kSigma, hSigma)), 0L, 0L)
                    else st.copy(obs = obs)
                case Some(ps) =>
                  var sPos = math.max(0L, st.sPos + (p.x - ps.mu0 - ps.k))
                  var sNeg = math.max(0L, st.sNeg + (ps.mu0 - p.x - ps.k))
                  if (sPos > ps.h) { out += CusumAlert(g, p.seq, 1, sPos); sPos = 0L }
                  if (sNeg > ps.h) { out += CusumAlert(g, p.seq, -1, sNeg); sNeg = 0L }
                  st = st.copy(sPos = sPos, sNeg = sNeg)
              }
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  def cusumAlerts(points: Dataset[SeriesPoint], mu0: Long, k: Long, h: Long,
                  stateTtl: Option[String] = None): Dataset[CusumAlert] = {
    import points.sparkSession.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (g: String, rows: Iterator[SeriesPoint], state: GroupState[CusumState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = if (state.exists) state.get else CusumState(0L, 0L)
            val out = Vector.newBuilder[CusumAlert]
            rows.toSeq.sortBy(_.seq).foreach { p =>
              var sPos = math.max(0L, st.sPos + (p.x - mu0 - k))
              var sNeg = math.max(0L, st.sNeg + (mu0 - p.x - k))
              if (sPos > h) { out += CusumAlert(g, p.seq, 1, sPos); sPos = 0L }
              if (sNeg > h) { out += CusumAlert(g, p.seq, -1, sNeg); sNeg = 0L }
              st = CusumState(sPos, sNeg)
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** One arrival for the novelty monitor: a per-group content hash
    * (`xxhash64(text)` upstream — the same fingerprint the batch overlap
    * estimator sketches).
    */
  case class HashRow(group: String, h: Long)
  /** Per-(group, micro-batch) novelty report: the group's batch ordinal
    * (`seq` — the ready-made [[SeriesPoint]] ordering for downstream
    * paging), rows seen, estimated all-time distinct before/after, and
    * the estimated NOVEL distinct this batch introduced (the telescoped
    * delta).
    */
  case class NoveltyPoint(group: String, seq: Long, n_rows: Long,
                          est_before: Double, est_after: Double,
                          est_novel: Double)
  /** kmvNovelty's per-group state: the all-time sketch + batch counter. */
  case class NoveltyState(sk: Array[Long], batches: Long)

  /** ONLINE corpus-novelty monitor — [[graft.ops.TextStats.kmvDumpOverlap]]
    * asked continuously: how much of what is arriving NOW has the stream
    * already seen? State per group is one k-minimum-values sketch
    * ([[graft.functions.KMinValues]]) — k longs FOREVER, regardless of how
    * many billions of documents pass. This is the deliberate other end of
    * the dedup trade: [[DedupStream]] keeps per-item state because it must
    * say WHICH arrivals are duplicates; the monitor only says HOW MANY are
    * novel, at ~10⁻⁶ of the state.
    *
    * Per micro-batch and group: fold the batch's hashes into a batch
    * sketch (O(1) per row after warm-up — the reject fast path), merge
    * into the state sketch, emit the estimated distinct before/after and
    * their delta. Two exact invariants make this verifiable rather than
    * merely plausible (`WindowSketchesSpec`):
    *
    *   - merge-invariance: the final state sketch is BIT-EXACT the batch
    *     sketch of the whole history, however the stream was micro-batched
    *     (KMV is a set function — same reason the batch estimator's
    *     partial aggregation is safe);
    *   - telescoping: est_novel sums to est_after exactly, so per-batch
    *     novelty deltas can never drift from the all-time estimate.
    *
    * `est_novel / n_rows` fed into [[cusumAlerts]] pages on novelty
    * collapse — the stuck-crawler-refetching-the-same-pages signature —
    * closing the loop with the data-health family above.
    */
  def kmvNovelty(rows: Dataset[HashRow],
                 k: Int = graft.functions.KMinValues.DefaultK)
      : Dataset[NoveltyPoint] = {
    import rows.sparkSession.implicits._
    import graft.functions.KMinValues
    val agg = new KMinValues.Sketch(k)
    rows.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[HashRow], state: GroupState[NoveltyState]) =>
          var n = 0L
          var batch = agg.zero
          it.foreach { r => n += 1; batch = agg.reduce(batch, r.h) }
          val prev = state.getOption.getOrElse(NoveltyState(agg.zero, 0L))
          val after = agg.merge(prev.sk, batch)
          state.update(NoveltyState(after, prev.batches + 1))
          val eb = KMinValues.estimateDistinct(prev.sk, k)
          val ea = KMinValues.estimateDistinct(after, k)
          Iterator.single(NoveltyPoint(g, prev.batches, n, eb, ea, ea - eb))
      }
  }

  /** Sliding-window novelty report: distinct estimate over the previous
    * `windows` batches, and the arrivals novel vs THAT horizon. */
  case class SlidingNoveltyPoint(group: String, seq: Long, n_rows: Long,
                                 est_recent: Double, est_novel: Double)
  /** Ring of the last N per-batch sketches (newest last) + batch counter. */
  case class SlidingNoveltyState(ring: Seq[Array[Long]], batches: Long)

  /** SLIDING novelty — "novel vs the last N batches", where [[kmvNovelty]]
    * is "novel vs all time". KMV supports no deletion, so the window is a
    * RING of per-batch sketches merged on demand (merge IS the sketch of
    * the union, so N small sketches answer any suffix-window question);
    * state per group = N × k longs, still row-count-free. An item re-sent
    * after its window expired counts novel AGAIN — the recency semantics
    * a re-crawl monitor wants (the all-time monitor would call a monthly
    * re-crawl 0% novel forever; this one distinguishes "new content" from
    * "content we saw this window").
    *
    * Deliberate contract: windows are MICRO-BATCHES (processing-time
    * grain, like trigger-based rates) — batch boundaries define the
    * horizon, so unlike [[kmvNovelty]]'s all-time estimates this report
    * is trigger-cadence-dependent by design; the event-time alternative
    * is [[windowedProfile]]'s watermarked `approx_count_distinct`.
    */
  def kmvNoveltySliding(rows: Dataset[HashRow], windows: Int = 24,
                        k: Int = graft.functions.KMinValues.DefaultK)
      : Dataset[SlidingNoveltyPoint] = {
    require(windows >= 1, s"windows must be >= 1, got $windows")
    import rows.sparkSession.implicits._
    import graft.functions.KMinValues
    val agg = new KMinValues.Sketch(k)
    rows.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[HashRow], state: GroupState[SlidingNoveltyState]) =>
          var n = 0L
          var batch = agg.zero
          it.foreach { r => n += 1; batch = agg.reduce(batch, r.h) }
          val prev = state.getOption.getOrElse(SlidingNoveltyState(Nil, 0L))
          val recent = prev.ring.foldLeft(agg.zero)(agg.merge)
          val eRecent = KMinValues.estimateDistinct(recent, k)
          val eWith = KMinValues.estimateDistinct(agg.merge(recent, batch), k)
          state.update(SlidingNoveltyState(
            (prev.ring :+ batch).takeRight(windows), prev.batches + 1))
          Iterator.single(SlidingNoveltyPoint(
            g, prev.batches, n, eRecent, eWith - eRecent))
      }
  }

  /** One arrival for the event-time novelty monitor. */
  case class TimedHashRow(group: String, ts: java.sql.Timestamp, h: Long)
  /** Finalized event-time window: rows, distinct estimate, and the
    * estimate of content NOVEL vs the immediately preceding window. */
  case class EventWindowNovelty(group: String, window_start: java.sql.Timestamp,
                                n_rows: Long, est_window: Double,
                                est_novel_vs_prev: Double)
  /** Per-window ledger: (start, sketch, rows, emitted). */
  case class EvtNovState(wins: Seq[(Long, Array[Long], Long, Boolean)])

  /** EVENT-TIME novelty — the recency horizon defined by the DATA, not
    * the trigger cadence ([[kmvNoveltySliding]]'s documented limitation):
    * arrivals fold into tumbling event-time windows of `windowMs`, each
    * window FINALIZES when the watermark passes its end (late rows inside
    * the lateness bound land in their window whichever micro-batch they
    * arrive in; rows later than an emitted window drop — standard
    * watermark semantics), and the finalized report compares the window
    * against its PREDECESSOR's sketch: `est_novel_vs_prev` is the content
    * this window introduced over the previous one — the cross-window
    * question a watermarked aggregation cannot ask (aggregation state is
    * per-window; the comparison needs two windows side by side, which is
    * exactly what the per-group ledger here holds). State per group:
    * open windows + one finalized predecessor, each k longs — bounded by
    * lateness, not stream length.
    */
  def kmvNoveltyByEventTime(rows: Dataset[TimedHashRow], windowMs: Long,
                            watermark: String = "0 seconds",
                            k: Int = graft.functions.KMinValues.DefaultK)
      : Dataset[EventWindowNovelty] = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    import rows.sparkSession.implicits._
    import graft.functions.KMinValues
    val agg = new KMinValues.Sketch(k)
    rows.toDF().withWatermark("ts", watermark).as[TimedHashRow]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[TimedHashRow], state: GroupState[EvtNovState]) =>
          var wins = state.getOption.getOrElse(EvtNovState(Nil)).wins
            .map(w => (w._1, w._2, w._3, w._4)).toVector
          def idx(start: Long): Int = wins.indexWhere(_._1 == start)
          val wm = state.getCurrentWatermarkMs()
          it.foreach { r =>
            val start = r.ts.getTime - Math.floorMod(r.ts.getTime, windowMs)
            // rows later than the watermark's window drop, standard
            // semantics (their window is already final — or never opened)
            if (start + windowMs > wm) {
              val i = idx(start)
              if (i >= 0) {
                val w = wins(i)
                wins = wins.updated(i, (w._1, agg.reduce(w._2, r.h), w._3 + 1, w._4))
              } else wins = (wins :+ ((start, agg.reduce(agg.zero, r.h), 1L, false)))
            }
          }
          // finalize closed windows in event-time order, each against its
          // immediate predecessor (gap ⇒ no predecessor ⇒ all novel)
          val out = Vector.newBuilder[EventWindowNovelty]
          wins = wins.sortBy(_._1)
          wins.zipWithIndex.foreach { case (w, i) =>
            if (!w._4 && w._1 + windowMs <= wm) {
              val prev = wins.lift(i - 1)
                .filter(p => p._1 == w._1 - windowMs && p._4).map(_._2)
                .getOrElse(agg.zero)
              val eP = KMinValues.estimateDistinct(prev, k)
              val eU = KMinValues.estimateDistinct(agg.merge(prev, w._2), k)
              out += EventWindowNovelty(g, new java.sql.Timestamp(w._1),
                w._3, KMinValues.estimateDistinct(w._2, k), eU - eP)
              wins = wins.updated(i, (w._1, w._2, w._3, true))
            }
          }
          // evict emitted windows that can no longer serve as a predecessor
          val keepFrom = wm - 2 * windowMs
          state.update(EvtNovState(wins.filter(w => !w._4 || w._1 >= keepFrom)))
          out.result().iterator
      }
  }

  /** The paging composition, ready-made: [[kmvNovelty]]'s per-batch NOVEL
    * estimate as a [[SeriesPoint]] series (x = est_novel, ordered by the
    * group's batch ordinal) — feed to [[cusumAlerts]] /
    * [[autoCusumAlerts]] to page on novelty collapse, the
    * stuck-crawler-refetching-the-same-pages signature.
    * `WindowSketchesSpec` runs the loop end to end: planted collapse
    * pages, the stable twin never does.
    */
  def noveltySeries(points: Dataset[NoveltyPoint]): Dataset[SeriesPoint] = {
    import points.sparkSession.implicits._
    points.map(p => SeriesPoint(p.group, p.seq, math.round(p.est_novel)))
  }
}
