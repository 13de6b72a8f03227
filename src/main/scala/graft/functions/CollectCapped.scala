package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** `collect_list` with a HARD BUFFER BOUND — the aggregation the
  * inverted-index df cut actually wants ([[graft.ops.Dedup.cappedPostings]]).
  *
  * A posting-list build must drop keys whose document frequency exceeds the
  * df cap, and the drop has to bind the AGGREGATION BUFFER, not just the
  * output row: with plain `collect_list` + a filter above it, a corpus-wide
  * stop-shingle (license header, boilerplate) collects every doc id into
  * one unspillable in-memory array before the row is discarded — at 10^9
  * matching docs that is a multi-GB single-group buffer and a task OOM.
  * This aggregator stops appending at `cap + 1` elements, so the worst-case
  * buffer is (cap + 1) longs REGARDLESS of the key's true frequency; the
  * `size <= cap` filter above it then reads the cap+1 sentinel length as
  * "over cap, drop".
  *
  * Determinism: for keys within the cap nothing is ever truncated, so the
  * collected SET equals plain collect_list's under any partitioning or
  * merge order (callers sort for a canonical order). Truncation only occurs
  * on keys the caller drops, so merge-order nondeterminism is unobservable.
  *
  * Why this shape over a count-first semi-join (the other way to bound the
  * buffer): the join needs a second pass over the keyed rows and a sort of
  * the probe side under sort-merge — measured 2.3× slower on the x100
  * corpus (BASELINE.md r8) — while the capped aggregation keeps the
  * original one-shuffle ObjectHashAggregate plan and pays only the bound
  * it enforces.
  */
object CollectCapped {

  class Agg(cap: Int) extends Aggregator[Long, ArrayBuffer[Long], Seq[Long]] {
    // buffers live as objects inside ObjectHashAggregate's map; the encoder
    // below is only exercised on spill/shuffle of partial buffers
    override def zero: ArrayBuffer[Long] = ArrayBuffer.empty

    override def reduce(b: ArrayBuffer[Long], x: Long): ArrayBuffer[Long] = {
      if (b.length <= cap) b += x
      b
    }

    override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
      val room = cap + 1 - a.length
      if (room >= b.length) a ++= b
      else if (room > 0) a ++= b.view.take(room)
      a
    }

    override def finish(b: ArrayBuffer[Long]): Seq[Long] = b.toSeq

    override def bufferEncoder: Encoder[ArrayBuffer[Long]] =
      ExpressionEncoder[ArrayBuffer[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Column-level entry: `collect(cap)(col("doc_id"))`. */
  def collect(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new Agg(cap))

  /** [[Agg]] over (id, payload) PAIRS — the carry-the-metadata variant:
    * posting lists that collect `(doc_id, n_sh)` structs let the pair
    * stage read both documents' set sizes OFF THE PAIR ITSELF, instead of
    * joining the exploded pair frame back against a per-doc size table
    * twice (two shuffles of the largest frame in the query). Same hard
    * buffer bound, same determinism argument — the extra long per element
    * widens the bounded buffer, never unbounds it.
    */
  class PairAgg(cap: Int)
      extends Aggregator[(Long, Long), ArrayBuffer[(Long, Long)], Seq[(Long, Long)]] {
    override def zero: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty

    override def reduce(b: ArrayBuffer[(Long, Long)], x: (Long, Long)): ArrayBuffer[(Long, Long)] = {
      if (b.length <= cap) b += x
      b
    }

    override def merge(a: ArrayBuffer[(Long, Long)],
                       b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
      val room = cap + 1 - a.length
      if (room >= b.length) a ++= b
      else if (room > 0) a ++= b.view.take(room)
      a
    }

    override def finish(b: ArrayBuffer[(Long, Long)]): Seq[(Long, Long)] = b.toSeq

    override def bufferEncoder: Encoder[ArrayBuffer[(Long, Long)]] =
      ExpressionEncoder[ArrayBuffer[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Column-level entry: `collectPairs(cap)(col("doc_id"), col("n_sh"))` →
    * array<struct<_1, _2>> sorted by the caller (struct order = id order,
    * ids are distinct).
    */
  def collectPairs(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new PairAgg(cap))
}
