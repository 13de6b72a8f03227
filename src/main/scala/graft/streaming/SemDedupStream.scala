package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online SEMANTIC near-dup detection — the embedding-space sibling of
  * [[DedupStream]], mirroring batch SemDeDup ([[Similarity.semDedupDf]])
  * the way `DedupStream.verifiedCandidates` mirrors `Dedup.dedupVerifyDf`:
  *
  *  1. **Assignment is the batch expression verbatim**: nearest centroid by
  *     fused-kernel cosine over a one-row broadcast of the (static)
  *     centroid set — a stream-static broadcast join, pure projection on
  *     the stream side, no stream-side shuffle before the keyed state.
  *  2. **Cluster state = the exemplar set under the SAME `clusterCap`
  *     discipline**: the first `cap` members (by vec_id — the replay
  *     contract orders micro-batch arrivals in-handler, so with id-ordered
  *     replay the set equals the batch window's `rn <= cap` lowest-id
  *     exemplars); members join the set dropped or not, exactly like the
  *     batch window.
  *  3. **Judgment is the batch predicate bit-for-bit**: dropped iff a
  *     SMALLER-id exemplar clears `round(cos, 6) >= tau`, with cosine
  *     replicated from the [[graft.functions.VectorExprs.cosine]] kernel's
  *     sequential accumulation (`ab/sqrt(aa*bb)`) and the round via
  *     `BigDecimal.valueOf` HALF_UP — the same double-rounding Spark's
  *     `Round` performs. `SemDedupStreamSpec` pins row-for-row equality of
  *     (vec_id, bucket, kept) against `semDedupDf` on a corpus replay.
  *
  * Scale: state per cluster is `cap` embedding vectors (cap × dim doubles —
  * the bounded-row contract the batch cap exists for); `stateTtl` bounds
  * cluster count over unbounded streams. The greedy chain is order-
  * dependent by definition, so the in-handler sort on vec_id is semantics,
  * not overhead.
  */
object SemDedupStream {

  case class VecRow(bucket: Long, vec_id: Long, v: Seq[Double])
  case class Exemplar(vec_id: Long, v: Seq[Double])
  case class ClusterState(ex: Seq[Exemplar])
  case class Judged(vec_id: Long, bucket: Long, kept: Boolean)

  /** Batch-verbatim nearest-centroid assignment of a streaming (vec_id, v)
    * frame against a STATIC centroid row (one-row frame with a `cents`
    * array of (cid, cv) structs — the shape [[Similarity.semDedupDf]]
    * builds). Broadcast stream-static join: legal in append streams and a
    * pure narrow stage.
    */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.join(broadcast(cents))
      .withColumn("bucket",
        element_at(array_sort(transform(col("cents"),
          c => struct((-Similarity.cosine(col("v"), c("cv"))).as("neg"),
            c("cid").as("cid")))), 1)("cid"))
      .select(col("bucket"), col("vec_id"), col("v"))

  /** The batch centroid row for a static embeddings frame — `nlist`
    * lowest-id vectors, identical to [[Similarity.semDedupDf]]'s.
    */
  def centroids(e: DataFrame, nlist: Int = 16): DataFrame =
    e.filter(col("vec_id") < nlist)
      .agg(sort_array(collect_list(struct(col("vec_id").as("cid"), col("v").as("cv"))))
        .as("cents"))

  def judged(assigned: Dataset[VecRow], tau: Double = 0.4, clusterCap: Int = 256,
             stateTtl: Option[String] = None): Dataset[Judged] = {
    import assigned.sparkSession.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    assigned.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (bucket: Long, rows: Iterator[VecRow], state: GroupState[ClusterState]) =>
          onCluster(bucket, rows, state, stateTtl, tau, clusterCap)
      }
  }

  /** [[judged]] seeded with MIGRATED cluster state
    * ([[StateMigration.readSemDedupState]]): relocating the semantic-dedup
    * store keeps its exemplar sets, so resumed judgments stay consistent
    * with history (a fresh store would re-admit every vector whose
    * exemplar was lost).
    */
  def judgedFrom(assigned: Dataset[VecRow], initial: Dataset[(Long, ClusterState)],
                 tau: Double = 0.4, clusterCap: Int = 256,
                 stateTtl: Option[String] = None): Dataset[Judged] = {
    import assigned.sparkSession.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    assigned.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, timeout,
        initial.groupByKey(_._1).mapValues(_._2)) {
        (bucket: Long, rows: Iterator[VecRow], state: GroupState[ClusterState]) =>
          onCluster(bucket, rows, state, stateTtl, tau, clusterCap)
      }
  }

  /** Spark 4 `transformWithState` twin of [[judged]] — the exemplar set as
    * a native `ListState[Exemplar]`: RocksDB holds one entry per exemplar
    * VECTOR (the classic path rewrites the whole cluster's serialized
    * vector list on every enrollment — the heaviest blob of any store
    * here, cap × dim doubles), enrollment is an O(1) list append, and the
    * greedy scan iterates entries in insertion order = the vec_id order
    * the in-handler sort enforces. The cap rides a ValueState counter.
    * Semantics identical to [[onCluster]] by construction; parity pinned
    * in `SemDedupStreamSpec`.
    */
  class ClusterProcessor(tau: Double, clusterCap: Int,
                         ttl: Option[java.time.Duration] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, VecRow, Judged, ClusterState] {
    import org.apache.spark.sql.streaming.{ListState, TimerValues, TimeMode, TTLConfig, ValueState}
    @transient private var ex: ListState[Exemplar] = _
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: TimeMode): Unit = {
      val ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
      ex = getHandle.getListState[Exemplar]("exemplars",
        org.apache.spark.sql.Encoders.product[Exemplar], ttlConf)
      count = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong, ttlConf)
    }
    override def handleInitialState(bucket: Long, initial: ClusterState,
                                    timerValues: TimerValues): Unit = {
      initial.ex.foreach(ex.appendValue)
      count.update(initial.ex.size.toLong)
    }
    override def handleInputRows(bucket: Long, rows: Iterator[VecRow],
                                 timerValues: TimerValues): Iterator[Judged] = {
      val rs = rows.toSeq.sortBy(_.vec_id)
      // one read of the current entries; within-batch enrollments append
      // to the local view AND the state list
      var cur = ex.get().toVector
      // with TTL, list entries expire per-entry while the counter's TTL is
      // refreshed by every update below — a counter-led cap would stay
      // pinned at clusterCap forever after the exemplars expired. The live
      // entry count is authoritative (and free: `cur` is already read).
      var n = if (ttl.isDefined) cur.size.toLong
              else if (count.exists()) count.get() else cur.size.toLong
      val out = rs.map { r =>
        val dropped = cur.exists(e =>
          e.vec_id < r.vec_id && round6(cosine(e.v, r.v)) >= tau)
        if (n < clusterCap) {
          val e = Exemplar(r.vec_id, r.v)
          ex.appendValue(e)
          cur = cur :+ e
          n += 1L
        }
        Judged(r.vec_id, bucket, !dropped)
      }
      count.update(n)
      out.iterator
    }
  }

  /** [[judged]] on transformWithState — see [[ClusterProcessor]]. */
  def judgedTws(assigned: Dataset[VecRow], tau: Double = 0.4,
                clusterCap: Int = 256,
                ttl: Option[java.time.Duration] = None): Dataset[Judged] = {
    import assigned.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    assigned.groupByKey(_.bucket)
      .transformWithState(new ClusterProcessor(tau, clusterCap, ttl), mode,
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** [[judgedTws]] seeded with a migrated classic-layout store
    * ([[StateMigration.readSemDedupState]]) — the blob-to-entries
    * conversion is the `handleInitialState` hook.
    */
  def judgedTwsFrom(assigned: Dataset[VecRow],
                    initial: Dataset[(Long, ClusterState)],
                    tau: Double = 0.4, clusterCap: Int = 256,
                    ttl: Option[java.time.Duration] = None): Dataset[Judged] = {
    import assigned.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    assigned.groupByKey(_.bucket)
      .transformWithState(new ClusterProcessor(tau, clusterCap, ttl), mode,
        org.apache.spark.sql.streaming.OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
  }

  // ===== PQ-screened exemplar state (5 bytes/exemplar + rerank cost) =====

  /** Exemplar compressed to its trained-PQ form: the 8 codeword ids
    * ([[graft.ops.PqModel]] — 5 logical bytes) plus the exemplar's own
    * quantization error ‖en − recon(en)‖ (the soundness radius the ADC
    * pre-screen needs). ~24 bytes vs cap × dim × 8 for the raw-vector
    * exemplar — the state-size story `StreamBench` measures.
    */
  case class PqExemplar(vec_id: Long, codes: Seq[Int], err: Double)

  /** Driver/executor-side trained-PQ kernels over [[graft.ops.PqModel]]'s
    * published integers — plain-double arithmetic (no cross-engine oracle
    * here; the contract is SOUNDNESS of the screen, pinned by the parity
    * spec against the raw-vector path).
    */
  private[graft] object PqScreen {
    import graft.ops.PqModel
    lazy val books: Array[Array[Array[Double]]] =
      PqModel.Micros.map(_.map(_.map(_ / 1e6)))

    /** Normalized copy, or null for a zero vector (screen then defers to
      * the exact path, whose NaN-cosine never drops — parity either way).
      */
    def normalize(v: Seq[Double]): Array[Double] = {
      val a = v.toArray
      var ss = 0.0; var i = 0
      while (i < a.length) { ss += a(i) * a(i); i += 1 }
      if (ss == 0.0) return null
      val n = math.sqrt(ss); i = 0
      val out = new Array[Double](a.length)
      while (i < a.length) { out(i) = a(i) / n; i += 1 }
      out
    }

    /** L2² between one subspace of `x` and codeword (mi, cid). */
    private def subL2(x: Array[Double], mi: Int, cid: Int): Double = {
      val cw = books(mi)(cid)
      var s = 0.0; var j = 0
      while (j < PqModel.Sub) {
        val d = x(mi * PqModel.Sub + j) - cw(j); s += d * d; j += 1
      }
      s
    }

    def encode(en: Array[Double]): Array[Int] =
      Array.tabulate(PqModel.M) { mi =>
        var best = 0; var bestD = Double.MaxValue; var cid = 0
        while (cid < PqModel.Ksub) {
          val d = subL2(en, mi, cid)
          if (d < bestD) { bestD = d; best = cid }
          cid += 1
        }
        best
      }

    /** ADC = exact L2² between a normalized vector and an exemplar's
      * RECONSTRUCTION (per-subspace codeword concatenation).
      */
    def adc(rn: Array[Double], codes: Seq[Int]): Double = {
      var s = 0.0; var mi = 0
      while (mi < PqModel.M) { s += subL2(rn, mi, codes(mi)); mi += 1 }
      s
    }

    /** Soundness margin for the screen: the bound is on TRUE cosine of
      * normalized vectors; the decided value is round6 of the sequential
      * kernel over RAW vectors. Kernel float error at dim 64 is ≲1e-10 and
      * round6 moves ≤5e-7; 1e-4 dominates both with room to spare, at the
      * price of exact-checking pairs within 1e-4 of tau — the right trade,
      * a screen must never flip a judgment.
      */
    val Margin = 1e-4

    /** True iff cos(e, r) < tau PROVABLY, from codes alone: by triangle
      * inequality ‖en−rn‖ ≥ ‖recon(e)−rn‖ − ‖en−recon(e)‖ = √adc − err,
      * and for unit vectors cos = 1 − ‖en−rn‖²/2, so cos ≤ 1 − (√adc −
      * err)²/2 whenever √adc > err. A skipped pair would have failed the
      * exact check too — judgments cannot change, only costs.
      */
    def provablyBelow(rn: Array[Double], e: PqExemplar, tau: Double): Boolean = {
      if (rn == null) return false
      val a = math.sqrt(adc(rn, e.codes)) - e.err
      a > 0.0 && 1.0 - a * a / 2.0 < tau - Margin
    }
  }

  /** [[ClusterProcessor]] with PQ-SCREENED exemplar state — the 100 TB
    * posture for the semantic gate: RocksDB holds [[PqExemplar]] entries
    * (~24 bytes) instead of raw cap × dim vectors, the ADC pre-screen
    * settles most pairs from codes alone, and only the survivors pay
    * `fetchVec` — a POINT READ of the exemplar's raw vector (in production
    * a vector-store/row-store lookup keyed by vec_id; the bench wires a
    * broadcast map, the deployment wires its KV client) — before the SAME
    * exact round6-cosine decides. Judgments are identical to the raw-state
    * path by the screen's soundness bound ([[PqScreen.provablyBelow]]);
    * `SemDedupStreamSpec` pins row-for-row equality.
    */
  class PqClusterProcessor(tau: Double, clusterCap: Int,
                           fetchVec: Long => Seq[Double],
                           ttl: Option[java.time.Duration] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, VecRow, Judged] {
    import org.apache.spark.sql.streaming.{ListState, TimerValues, TimeMode, TTLConfig, ValueState}
    @transient private var ex: ListState[PqExemplar] = _
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: TimeMode): Unit = {
      val ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
      ex = getHandle.getListState[PqExemplar]("pq_exemplars",
        org.apache.spark.sql.Encoders.product[PqExemplar], ttlConf)
      count = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong, ttlConf)
    }
    override def handleInputRows(bucket: Long, rows: Iterator[VecRow],
                                 timerValues: TimerValues): Iterator[Judged] = {
      val rs = rows.toSeq.sortBy(_.vec_id)
      var cur = ex.get().toVector
      var n = if (ttl.isDefined) cur.size.toLong
              else if (count.exists()) count.get() else cur.size.toLong
      val out = rs.map { r =>
        val rn = PqScreen.normalize(r.v)
        val dropped = cur.exists { e =>
          e.vec_id < r.vec_id && !PqScreen.provablyBelow(rn, e, tau) &&
            round6(cosine(fetchVec(e.vec_id), r.v)) >= tau
        }
        if (n < clusterCap) {
          val e =
            if (rn == null)
              // zero vector: no reconstruction is meaningful — infinite
              // radius forces every probe to the exact path, whose NaN
              // cosine never drops (same as the raw-state path)
              PqExemplar(r.vec_id, Seq.fill(graft.ops.PqModel.M)(0), Double.PositiveInfinity)
            else {
              val codes = PqScreen.encode(rn)
              PqExemplar(r.vec_id, codes.toSeq, math.sqrt(PqScreen.adc(rn, codes)))
            }
          ex.appendValue(e)
          cur = cur :+ e
          n += 1L
        }
        Judged(r.vec_id, bucket, !dropped)
      }
      count.update(n)
      out.iterator
    }
  }

  /** [[judgedTws]] with PQ-screened state — see [[PqClusterProcessor]]. */
  def judgedPqTws(assigned: Dataset[VecRow], fetchVec: Long => Seq[Double],
                  tau: Double = 0.4, clusterCap: Int = 256,
                  ttl: Option[java.time.Duration] = None): Dataset[Judged] = {
    import assigned.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    assigned.groupByKey(_.bucket)
      .transformWithState(new PqClusterProcessor(tau, clusterCap, fetchVec, ttl),
        mode, org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Sequential-accumulation cosine — bit-parity with the fused
    * [[graft.functions.VectorExprs]] kernel (`ab/sqrt(aa*bb)`, one pass).
    */
  private[graft] def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i)
      i += 1
    }
    ab / math.sqrt(aa * bb)
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private[graft] def onCluster(bucket: Long, rows: Iterator[VecRow],
                               state: GroupState[ClusterState],
                               stateTtl: Option[String], tau: Double,
                               clusterCap: Int): Iterator[Judged] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // id order inside the batch: the greedy chain's semantics (a member
      // is judged only against SMALLER ids), not an optimization
      val rs = rows.toSeq.sortBy(_.vec_id)
      var ex = if (state.exists) state.get.ex else Vector.empty[Exemplar]
      val out = rs.map { r =>
        val dropped = ex.exists(e =>
          e.vec_id < r.vec_id && round6(cosine(e.v, r.v)) >= tau)
        if (ex.size < clusterCap) ex = ex :+ Exemplar(r.vec_id, r.v)
        Judged(r.vec_id, bucket, !dropped)
      }
      state.update(ClusterState(ex))
      stateTtl.foreach(state.setTimeoutDuration)
      out.iterator
    }
}
