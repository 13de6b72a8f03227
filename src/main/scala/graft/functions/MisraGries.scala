package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed `Aggregator` — the
  * mergeable heavy-hitter sketch (Agarwal et al., "Mergeable Summaries",
  * PODS'12; original algorithm Misra & Gries 1982). A capacity-`m` summary
  * scanned over n items guarantees, REGARDLESS of partitioning or merge
  * order:
  *
  *   - every item with true frequency > n/(m+1) is present in the summary;
  *   - each reported estimate is an undercount by at most n/(m+1):
  *     `est <= true <= est + n/(m+1)`.
  *
  * So to surface everything above a θ·n threshold, size `m >= 1/θ`. The
  * SURVIVING-ITEM SET below the guarantee line can vary with merge order —
  * which is why the production query ([[graft.ops.TextStats.heavyHitters]])
  * uses this sketch only to produce a candidate superset and re-counts the
  * ≤ m candidates exactly in a second broadcast-filtered pass: the final
  * output is then deterministic (the guarantee makes every true heavy
  * hitter a candidate; the exact pass discards the rest), and the full
  * domain is never shuffled.
  *
  * `reduce` is the textbook step: increment a tracked key, adopt an
  * untracked key into spare capacity, else decrement ALL counters (the
  * shared-decrement trick, amortized O(1) via the decrement pool). `merge`
  * adds counters then subtracts the (m+1)-th largest count from every
  * survivor — the PODS'12 merge that preserves the error bound under
  * arbitrary combine trees, which is exactly what Spark's partial
  * aggregation does with map-side combine: one capacity-m map per partition
  * rides the shuffle, never the domain.
  */
object MisraGries {

  final val DefaultCapacity = 64

  /** (tracked counters, spare decrement pool is implicit in counts). */
  type Buf = Map[String, Long]

  class Summary(m: Int) extends Aggregator[String, Buf, Map[String, Long]] {
    override def zero: Buf = Map.empty

    override def reduce(b: Buf, key: String): Buf =
      b.get(key) match {
        case Some(c)            => b.updated(key, c + 1)
        case None if b.size < m => b.updated(key, 1L)
        case None               =>
          // decrement-all: drop zeroed counters; the arriving key is
          // consumed by the same decrement (its would-be 1 becomes 0)
          b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
      }

    override def merge(a: Buf, b: Buf): Buf = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val sum = b.foldLeft(a) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (sum.size <= m) sum
      else {
        // subtract the (m+1)-th largest count from everyone; survivors are
        // the at-most-m keys still positive (PODS'12 Lemma: error adds)
        val cut = sum.valuesIterator.toArray.sortBy(-_).apply(m)
        sum.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
      }
    }

    override def finish(r: Buf): Map[String, Long] = r

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Untyped-column form for `df.agg(...)`, via the standard
    * Aggregator→UDAF bridge.
    */
  def sketch(capacity: Int = DefaultCapacity)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new Summary(capacity))
}
