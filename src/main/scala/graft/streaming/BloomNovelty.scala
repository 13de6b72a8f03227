package graft.streaming

import graft.functions.{Bloom, BloomKernel}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE novelty classification with CONSTANT state — the streaming face
  * of [[graft.ops.BloomMembership.bloomNovel]]'s routing contract, and the
  * cheap gate in front of the exact online dedup family: every arriving
  * document is tagged `definitely_new` (its content hash was NOT seen
  * before — exact, the Bloom no-false-negatives contract) or `maybe_seen`
  * (seen, or the ~fpp false-positive sliver — route THESE, and only these,
  * into [[DedupStream]]'s exact per-key state). The exact dedup stores
  * grow with distinct keys; this gate's state never grows at all.
  *
  * Sharding IS the partitioning: the 64-bit content hash's top `shardBits`
  * pick the shard, each shard holds an independent fixed-size Bloom over
  * exactly its own keys, and the groupByKey on the shard id is the
  * operator's only shuffle. A single global filter would serialize every
  * document through one task and rewrite one giant state row per batch;
  * 2^shardBits shards spread both, and the per-shard filter stays a few
  * hundred KB whatever the history. 256 shards × 1 MiB ≈ 256 MiB of state
  * for ~10⁹ distinct keys at ~1% fpp — the "gate a 100 TB crawl with
  * constant memory" posture ([[Bloom.forExpected]] sizes per shard for
  * expectedKeys / 2^shardBits).
  *
  * Determinism: within a micro-batch each shard classifies in (doc_id, h)
  * order, classify-THEN-insert, so for a stream delivered in nondecreasing
  * doc_id order (the engine-wide monotone-id contract) the output is
  * INVARIANT under micro-batch split points and equal to the one-pass
  * batch fold ([[batchTagged]]) — `BloomNoveltySpec` pins both. Duplicate
  * content in one batch tags the second copy `maybe_seen`, exactly as if
  * the copies had arrived in different batches.
  *
  * Erasure posture, by construction: state holds ONLY irreversible 64-bit
  * content hashes — no payload, no user ids, nothing attributable — so the
  * per-entity erasure recipes have nothing to reach here (a Bloom cannot
  * delete; full reset = drop the checkpoint and re-warm from the exact
  * stores, which ARE erasable).
  */
object BloomNovelty {

  case class Keyed(shard: Int, h: Long, doc_id: Long)
  case class Tagged(doc_id: Long, h: Long, definitely_new: Boolean)

  /** (shard, content-hash, doc_id) rows — one per document, all in-row
    * (no shuffle until the shard groupByKey).
    */
  def keyed(docs: DataFrame, shardBits: Int = 8): Dataset[Keyed] = {
    // lower bound 1: a 0-bit shard would shift by 64, which Java's >>> masks
    // to a shift of 0 — garbage shards, not one shard. One shard = bits 1
    // with both shards landing on the same filter size anyway.
    require(shardBits >= 1 && shardBits <= 16, s"shardBits in [1,16], got $shardBits")
    import docs.sparkSession.implicits._
    docs.select(
      expr(s"cast(shiftrightunsigned(xxhash64(text), ${64 - shardBits}) as int)")
        .as("shard"),
      xxhash64(col("text")).as("h"),
      col("doc_id")).as[Keyed]
  }

  /** The stateful gate: per shard, classify-then-insert against the
    * shard's Bloom. `p` sizes ONE shard's filter (expected keys per shard,
    * not total).
    */
  def tagged(keyed: Dataset[Keyed], p: Bloom.Params): Dataset[Tagged] = {
    import keyed.sparkSession.implicits._
    keyed.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: Int, rows: Iterator[Keyed], state: GroupState[Array[Long]]) =>
          onShard(rows, state, p)
      }
  }

  private[graft] def onShard(rows: Iterator[Keyed],
                             state: GroupState[Array[Long]],
                             p: Bloom.Params): Iterator[Tagged] = {
    val bits =
      if (state.exists) state.get else new Array[Long](p.numBits >>> 6)
    val out = rows.toSeq.sortBy(r => (r.doc_id, r.h)).map { r =>
      val fresh = !BloomKernel.mightContain(bits, p.numHashes, r.h)
      BloomKernel.insert(bits, p.numHashes, r.h)
      Tagged(r.doc_id, r.h, fresh)
    }
    state.update(bits)
    out.iterator
  }

  /** [[tagged]] on transformWithState — completing the dual-API matrix the
    * dedup and prev-image stores keep (classic checkpoints migrate per
    * [[StateMigration]]'s discipline; here the state is one Array[Long]
    * value per shard, nothing per-key to migrate). Parity with the classic
    * path is spec-pinned.
    */
  class ShardProcessor(p: Bloom.Params)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Int, Keyed, Tagged] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var bloom: ValueState[Array[Long]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bloom = getHandle.getValueState[Array[Long]]("bloom",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
        TTLConfig.NONE)
    override def handleInputRows(key: Int, rows: Iterator[Keyed],
                                 timerValues: TimerValues): Iterator[Tagged] = {
      val bits =
        if (bloom.exists()) bloom.get() else new Array[Long](p.numBits >>> 6)
      val out = rows.toSeq.sortBy(r => (r.doc_id, r.h)).map { r =>
        val fresh = !BloomKernel.mightContain(bits, p.numHashes, r.h)
        BloomKernel.insert(bits, p.numHashes, r.h)
        Tagged(r.doc_id, r.h, fresh)
      }
      bloom.update(bits)
      out.iterator
    }
  }

  /** The gate on the modern stateful API. */
  def taggedTws(keyed: Dataset[Keyed], p: Bloom.Params): Dataset[Tagged] = {
    import keyed.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    keyed.groupByKey(_.shard)
      .transformWithState(new ShardProcessor(p), TimeMode.None(), OutputMode.Append())
  }

  /** The one-pass batch twin the spec pins the stream against: the same
    * per-shard classify-then-insert fold in (doc_id, h) order, driver-side
    * (spec scale only).
    */
  private[graft] def batchTagged(keyedRows: Seq[Keyed],
                                 p: Bloom.Params): Seq[Tagged] = {
    val byShard = scala.collection.mutable.Map.empty[Int, Array[Long]]
    keyedRows.sortBy(r => (r.doc_id, r.h)).map { r =>
      val bits = byShard.getOrElseUpdate(r.shard, new Array[Long](p.numBits >>> 6))
      val fresh = !BloomKernel.mightContain(bits, p.numHashes, r.h)
      BloomKernel.insert(bits, p.numHashes, r.h)
      Tagged(r.doc_id, r.h, fresh)
    }
  }
}
