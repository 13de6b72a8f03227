package graft.streaming

import java.util.concurrent.ConcurrentLinkedDeque

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  final class Listener(capacity: Int = 1024) extends StreamingQueryListener {
    private val ring = new ConcurrentLinkedDeque[Progress]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val states = Option(p.stateOperators).map(_.toSeq).getOrElse(Seq.empty)
      ring.addLast(Progress(
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
        states.map(_.memoryUsedBytes).sum))
      while (ring.size() > capacity) ring.pollFirst()
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
  }

  /** Attach a fresh listener to the session's stream manager. */
  def attach(spark: SparkSession, capacity: Int = 1024): Listener = {
    val l = new Listener(capacity)
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: Listener): Unit =
    spark.streams.removeListener(l)
}
