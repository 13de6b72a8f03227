package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values (bottom-k) distinct-value sketch as a typed
  * `Aggregator` — the mergeable synopsis behind theta sketches (Bar-Yossef
  * et al. RANDOM'02; Beyer et al. SIGMOD'07 "On Synopses for Distinct
  * Value Estimation"; Dasgupta et al. "Theta sketch framework" 2016). The
  * summary of a set is its k smallest DISTINCT 64-bit hash values; that
  * one invariant buys the whole operator family:
  *
  *   - **cardinality**: the kth minimum of n uniform hashes sits near
  *     k/n of the hash range, so `|S| ≈ (k-1)/r_k` with r_k the kth
  *     minimum as a fraction of the range ((k-1), not k, makes the
  *     estimator unbiased — SIGMOD'07 §3.1); relative std error
  *     ≈ 1/√(k-2).
  *   - **union**: merge-and-keep-k-smallest IS the sketch of the union
  *     (same invariant), under ANY combine tree — which is exactly what
  *     Spark's partial aggregation does with the map-side combine, so a
  *     100 TB dump reduces to k longs per partition riding the shuffle.
  *   - **intersection**: cut both sketches at θ = the union sketch's kth
  *     minimum; below θ each sketch is a full inventory of its set's
  *     hashes in [0, θ), so `|{v < θ in A} ∩ {v < θ in B}| / k` estimates
  *     the Jaccard-via-θ fraction and `ρ · |A∪B|` the intersection — the
  *     cross-dump overlap question ("how much of crawl N+1 is already in
  *     crawl N") answered WITHOUT a join: one scan per dump, ever.
  *
  * The buffer is a sorted ascending Array[Long] of at most k SIGN-FLIPPED
  * hashes (`h ^ Long.MinValue`, so signed order = unsigned hash order —
  * flip done by the caller or [[Sketch.reduce]]'s contract below takes raw
  * hashes and flips internally). Inserts dedup via binary search; once
  * full, anything ≥ the current max short-circuits in O(1), so a scan
  * costs O(1) per rejected row and O(k) per accepted one — accepted rows
  * number ~k·ln(n/k) over a whole scan.
  *
  * `KMinValuesSpec` pins merge-invariance (any repartitioning, same
  * sketch — it's a deterministic set function), the exact regime
  * (n ≤ k → estimates are exact), and estimation-regime error against
  * planted ground truth at 40× k.
  */
object KMinValues {

  final val DefaultK = 1024

  /** Sorted ascending, distinct, length ≤ k, values sign-flipped. */
  type Buf = Array[Long]

  private final val TwoPow64 = math.pow(2.0, 64)

  /** Fraction of the unsigned 64-bit hash range below flipped value `s`. */
  @inline def frac(s: Long): Double = s.toDouble / TwoPow64 + 0.5

  class Sketch(k: Int) extends Aggregator[Long, Buf, Buf] {
    require(k >= 16, s"k must be >= 16, got $k")

    override def zero: Buf = Array.emptyLongArray

    override def reduce(b: Buf, rawHash: Long): Buf = {
      val s = rawHash ^ Long.MinValue // unsigned order as signed
      if (b.length == k && s >= b(k - 1)) return b // O(1) fast path
      val i = java.util.Arrays.binarySearch(b, s)
      if (i >= 0) return b // distinct-values sketch: dups are one value
      val at = -i - 1
      val grown = if (b.length < k) b.length + 1 else k
      val out = new Array[Long](grown)
      System.arraycopy(b, 0, out, 0, at)
      out(at) = s
      System.arraycopy(b, at, out, at + 1, grown - at - 1)
      out
    }

    override def merge(a: Buf, b: Buf): Buf = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      // sorted-merge keeping k smallest distinct — the union sketch
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(r: Buf): Buf = r

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  }

  /** Untyped-column form for `df.agg(...)` over an xxhash64 column. */
  def sketch(k: Int = DefaultK): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new Sketch(k))

  /** Distinct-count estimate. n ≤ k ⇒ the sketch IS the distinct set and
    * the estimate is exact by construction.
    */
  def estimateDistinct(sk: Buf, k: Int): Double =
    if (sk.length < k) sk.length.toDouble
    else {
      // frac() can be exactly 0.0 only for the degenerate kth minimum of
      // raw hash 0 (flipped Long.MinValue) — a representable, if planted,
      // input. Clamp the denominator to one ulp of the hash range so the
      // estimate stays finite instead of Infinity.
      val f = math.max(frac(sk(k - 1)), 1.0 / TwoPow64)
      (k - 1).toDouble / f
    }

  /** (|A∪B| estimate, |A∩B| estimate) from two sketches built with the
    * same k and hash. θ-cut: combine to the union sketch, count common
    * values below its kth minimum.
    */
  def estimateOverlap(a: Buf, b: Buf, k: Int): (Double, Double) = {
    val union = new Sketch(k).merge(a, b)
    val dUnion = estimateDistinct(union, k)
    if (union.isEmpty) return (0.0, 0.0)
    val cut = union(union.length - 1) // θ as a flipped value (inclusive)
    var i = 0; var j = 0; var common = 0
    while (i < a.length && j < b.length && a(i) <= cut && b(j) <= cut) {
      if (a(i) == b(j)) { common += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val rho = common.toDouble / union.length
    (dUnion, rho * dUnion)
  }
}
