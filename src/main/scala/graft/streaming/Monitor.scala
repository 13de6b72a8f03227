package graft.streaming

import java.util.concurrent.{ConcurrentLinkedDeque, ConcurrentLinkedQueue, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability — the operational telemetry the reference never
  * grew (its event loop carries a "will likely buffer after benchmarking"
  * TODO at `server.go:291` and ships no metrics at all): a
  * `StreamingQueryListener` that aggregates every query's progress into a
  * bounded in-memory ring, queryable as a DataFrame next to the data it
  * describes.
  *
  * What a production operator of THIS engine needs per micro-batch, all
  * from Spark's own progress events (no instrumentation in the operators):
  * input rows + rates, trigger duration (the latency budget), and state
  * rows/bytes per stateful operator (the number every retention/TTL
  * decision in this repo — prev-image TTL, dedup bucket eviction,
  * StateScaleBench's heap-vs-RocksDB crossover — is ABOUT). The listener
  * is driver-side by construction (progress events are driver objects);
  * the ring bound keeps a months-long query from accumulating unbounded
  * history — `capacity` batches ≈ the monitoring window, older entries
  * drop oldest-first.
  *
  * Shape: attach once per session ([[attach]]), read [[Monitor.Listener
  * .snapshot]] anywhere (a tiny localized frame — rows = retained
  * progress entries, never the stream itself), detach via [[detach]].
  *
  * Durability: the ring dies with the driver — exactly when post-mortem
  * telemetry matters most — so [[attach]] takes an optional parquet
  * `sink`. Entries are spooled and appended in small batches (every
  * `flushEvery` events, plus on [[detach]]/[[Listener.flush]]), so the
  * steady-state cost is one tiny single-partition write per few hundred
  * micro-batches, off the record path AND off the listener bus (writes run
  * on a dedicated flush thread — the bus is one shared async thread for
  * all queries, and a write stalling it would delay every listener). A
  * crash loses at most the unflushed tail — the bounded-staleness trade
  * every metrics pipeline makes; a per-event write would put a Spark job
  * on every micro-batch of every query.
  */
object Monitor {

  /** One micro-batch's operational record. `stateRows`/`stateBytes` sum
    * over the query's stateful operators; -1 duration = the field was
    * absent (continuous mode reports no per-trigger breakdown).
    */
  case class Progress(query: String, runId: String, batchId: Long,
                      timestamp: String, numInputRows: Long,
                      inputRowsPerSec: Double, processedRowsPerSec: Double,
                      triggerMs: Long, stateRows: Long, stateBytes: Long)

  final class Listener(capacity: Int = 1024,
                       sink: Option[String] = None,
                       flushEvery: Int = 256) extends StreamingQueryListener {
    private val ring = new ConcurrentLinkedDeque[Progress]()
    // element count tracked separately: ConcurrentLinkedDeque.size() is
    // O(n) (it walks the nodes), which would make every progress event pay
    // a full-ring traversal just to decide whether to trim
    private val count = new AtomicInteger(0)
    private val pending = new ConcurrentLinkedQueue[Progress]()
    private val pendingCount = new AtomicInteger(0)
    // Sink writes run here, NOT on the listener-bus thread: the bus is one
    // shared async thread for every query's events, so a slow parquet
    // write inline would stall progress delivery session-wide (and a flush
    // racing session shutdown would throw from the listener callback).
    // Created LAZILY and only on the sink path: a sink-less listener (the
    // common in-memory-ring use) must not cost a thread, and a session
    // that attaches repeatedly without detaching must not accumulate
    // idle flusher threads.
    private[this] val flusherRef =
      new java.util.concurrent.atomic.AtomicReference[java.util.concurrent.ExecutorService]()
    private def flusher: java.util.concurrent.ExecutorService = {
      val cur = flusherRef.get()
      if (cur != null) cur
      else {
        val fresh = Executors.newSingleThreadExecutor { r =>
          val t = new Thread(r, "graft-monitor-flush"); t.setDaemon(true); t
        }
        if (flusherRef.compareAndSet(null, fresh)) fresh
        else { fresh.shutdown(); flusherRef.get() }
      }
    }
    @volatile private[Monitor] var session: SparkSession = _

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      // idle-reap: when the LAST streaming query of the session ends, the
      // flusher thread has nothing left to serve — drain the spool and
      // release it (it re-creates lazily if another query starts). This
      // keeps a never-detached sink-ful listener from pinning a thread
      // for the session's lifetime.
      val s = session
      if (s != null && s.streams.active.isEmpty) {
        val f = flusherRef.getAndSet(null)
        if (f != null) {
          f.execute(() => flush())
          f.shutdown()
        }
      }
    }

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val states = Option(p.stateOperators).map(_.toSeq).getOrElse(Seq.empty)
      val rec = Progress(
        Option(p.name).getOrElse(""),
        p.runId.toString,
        p.batchId,
        p.timestamp,
        p.numInputRows,
        zeroIfNaN(p.inputRowsPerSecond),
        zeroIfNaN(p.processedRowsPerSecond),
        Option(p.durationMs)
          .flatMap(m => Option(m.get("triggerExecution"))).map(_.toLong).getOrElse(-1L),
        states.map(_.numRowsTotal).sum,
        states.map(_.memoryUsedBytes).sum)
      ring.addLast(rec)
      if (count.incrementAndGet() > capacity) {
        if (ring.pollFirst() != null) count.decrementAndGet()
      }
      if (sink.isDefined) {
        pending.add(rec)
        if (pendingCount.incrementAndGet() >= flushEvery) {
          // hand the write to the dedicated thread; the bus callback
          // returns immediately. Rejected-after-shutdown just leaves the
          // spool for the detach-time flush.
          try flusher.execute(() => flush())
          catch { case _: java.util.concurrent.RejectedExecutionException => }
        }
      }
    }

    private def zeroIfNaN(d: Double): Double = if (d.isNaN) 0.0 else d

    /** The retained window as a frame — join it, window it, alert on it
      * like any other table. Tiny by construction (≤ capacity rows).
      */
    def snapshot(spark: SparkSession): DataFrame = {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      ring.iterator().asScala.toSeq.toDF()
    }

    /** Append every spooled entry to the sink. Synchronized so a
      * threshold-triggered flush racing a detach-time flush can't write a
      * record twice; drains the spool first, then writes once — one tiny
      * single-partition file per flush, readable with a plain
      * `spark.read.parquet(sink)` from ANY later session (the post-mortem
      * path the in-memory ring cannot serve).
      */
    def flush(): Unit = sink.foreach { path =>
      synchronized {
        val drained = Vector.newBuilder[Progress]
        var r = pending.poll()
        while (r != null) { pendingCount.decrementAndGet(); drained += r; r = pending.poll() }
        val rows = drained.result()
        val s = session
        // isStopped guard: a threshold flush can race session shutdown;
        // skipping (rather than throwing) loses only the unflushed tail —
        // the same bounded-staleness trade a crash already implies
        if (rows.nonEmpty && s != null && !s.sparkContext.isStopped) {
          import s.implicits._
          try rows.toDF().coalesce(1).write.mode(SaveMode.Append).parquet(path)
          catch {
            case e: Exception if s.sparkContext.isStopped => () // lost race
          }
        }
      }
    }

    private[Monitor] def shutdown(): Unit = {
      // do NOT force the lazy executor just to stop it — a sink-less (or
      // never-flushed) listener has no thread to reap
      val f = flusherRef.getAndSet(null)
      if (f != null) {
        f.shutdown()
        f.awaitTermination(10, TimeUnit.SECONDS)
      }
    }
  }

  /** Attach a fresh listener to the session's stream manager. `sink`: an
    * optional parquet directory to persist progress into (see class note).
    */
  def attach(spark: SparkSession, capacity: Int = 1024,
             sink: Option[String] = None, flushEvery: Int = 256): Listener = {
    val l = new Listener(capacity, sink, flushEvery)
    l.session = spark
    spark.streams.addListener(l)
    l
  }

  /** SELF-MONITORING: the engine paging on its own degradation — the
    * telemetry ring fed through the auto-calibrated CUSUM
    * ([[WindowSketches.autoCusumAlerts]]). Each query contributes two
    * per-batch series: `<query>|trigger_ms` (the latency budget — a
    * drifting host or a growing state store shows up here first; the r9
    * closing bench documented exactly this signature, found by hand) and
    * `<query>|state_bytes` (leak detection: state that should be
    * TTL-bounded but only grows). The first `warmup` batches of each
    * series calibrate (μ₀ = median, so the cold-start outlier batch
    * doesn't skew the center), then any sustained shift pages.
    *
    * Pure batch composition over the snapshot/sink frame — call it
    * periodically, or point it at a persisted sink from ANY session for
    * post-mortems. Continuous-mode entries (trigger duration -1) are
    * excluded from the latency series rather than poisoning it.
    */
  def healthAlerts(telemetry: DataFrame, warmup: Int = 20,
                   kSigma: Double = 0.5, hSigma: Double = 5.0)
      : org.apache.spark.sql.Dataset[WindowSketches.CusumAlert] = {
    import org.apache.spark.sql.functions._
    val spark = telemetry.sparkSession
    import spark.implicits._
    val trig = telemetry.filter(col("triggerMs") >= 0L)
      .select(concat(col("query"), lit("|trigger_ms")).as("group"),
        col("batchId").as("seq"), col("triggerMs").as("x"))
    val state = telemetry.filter(col("stateBytes") > 0L)
      .select(concat(col("query"), lit("|state_bytes")).as("group"),
        col("batchId").as("seq"), col("stateBytes").as("x"))
    WindowSketches.autoCusumAlerts(
      trig.unionByName(state).as[WindowSketches.SeriesPoint],
      warmup, kSigma, hSigma)
  }

  /** [[healthAlerts]] straight off a live listener's ring. */
  def healthAlerts(l: Listener, spark: SparkSession)
      : org.apache.spark.sql.Dataset[WindowSketches.CusumAlert] =
    healthAlerts(l.snapshot(spark))

  /** Detach and flush any spooled telemetry to the sink. The final flush
    * is synchronous on the caller's thread (after draining any in-flight
    * async flush), so the sink is complete when this returns.
    */
  def detach(spark: SparkSession, l: Listener): Unit = {
    spark.streams.removeListener(l)
    l.shutdown()
    l.flush()
  }
}
