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
