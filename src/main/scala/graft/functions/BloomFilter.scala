package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter membership (Bloom, CACM 1970) as the house pair of a typed
  * mergeable [[Aggregator]] (build) and a native codegen'd Catalyst
  * expression (probe) — the semi-join-reduction primitive behind runtime
  * join filters (Spark's own `spark.sql.optimizer.runtime.bloomFilter.*`
  * applies the same construction inside equi-join planning; this family
  * exposes it as a first-class operator for the shapes the optimizer can't
  * see: cross-corpus membership against a PREVIOUS snapshot's key set,
  * novelty classification, dim-subset pruning ahead of a non-equi
  * composition).
  *
  * Scale shape: the filter is a fixed `Array[Long]` of 2^b bits sized from
  * the expected build-side cardinality ([[Bloom.forExpected]]); build is one
  * scan with map-side partial aggregation (word-wise OR is associative and
  * commutative, so ANY combine tree — including Spark's partial/final split
  * — yields the bit-identical filter of the inserted set); probe is a
  * per-row O(numHashes) bit test inside whole-stage codegen, no shuffle, no
  * join. The contract that makes exact composition possible: NO false
  * negatives, ever — a key that was inserted always probes true, so
  * "probe=false ⇒ definitely absent" can skip the verification join
  * entirely and only the ~fpp false-positive sliver pays the exact
  * anti-join. At 100 TB that is the difference between shuffling the whole
  * incoming batch by content hash and shuffling ~1% of it.
  *
  * Bit addressing uses Kirsch–Mitzenmacher double hashing (ESA'06): two
  * splitmix64-finalized hashes h1, h2 (h2 forced odd) generate the k probe
  * positions as h1 + i·h2 masked into a power-of-two bit space — full
  * avalanche per hash, no per-probe rehash.
  *
  * `BloomSpec` pins: no-false-negatives over adversarial and random keys
  * under any partitioning, bit-identical merge-invariance (agg == serial
  * insert), the fpp sizing contract at 2x theory, empty-build semantics
  * (everything probes false), interpreted == codegen'd probe, and the two
  * query compositions against plain exact joins.
  */
object Bloom {

  /** Bloom parameters: numBits is always a power of two >= 64. */
  final case class Params(numBits: Int, numHashes: Int)

  /** Size for `n` expected distinct keys at false-positive rate `fpp`:
    * m = -n·ln p / (ln 2)^2 rounded UP to a power of two (the mask-indexing
    * contract), k = (m/n)·ln 2 clamped to [1, 16]. The pow-2 round-up only
    * ever lowers the realized fpp below the ask.
    *
    * REFUSES asks above 2^30 bits (128 MiB) instead of silently clamping —
    * a clamped filter would quietly run at a far worse fpp than requested,
    * exactly the no-silent-caps failure mode. Past that size a single
    * driver-held filter is the wrong tool: shard the key space (the
    * [[graft.streaming.BloomNovelty]] gate's `shardBits` design — each
    * shard sizes independently) or raise `fpp`.
    */
  def forExpected(n: Long, fpp: Double = 0.01): Params = {
    require(n >= 0, s"expected cardinality must be >= 0, got $n")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2.0)
    val ideal = math.ceil(-n.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    require(ideal <= (1L << 30),
      s"a Bloom filter for n=$n at fpp=$fpp needs $ideal bits (> 2^30 / " +
        "128 MiB) — shard the key space (BloomNovelty-style shardBits, one " +
        "independently-sized filter per shard) or accept a higher fpp " +
        "instead of a silently-degraded filter")
    var m = 64L
    while (m < ideal) m <<= 1
    val k = math.max(1, math.min(16, math.round(m.toDouble / math.max(1L, n) * ln2).toInt))
    Params(m.toInt, k)
  }

  /** Per-GENERATION params for a rotating gate
    * ([[graft.streaming.BloomNovelty.Rotation]]): with `retired` + 1
    * generations probed as an OR, the union bound gives realized fpp ≤
    * Σ per-generation fpp, so each generation is sized for
    * `fpp / (retired + 1)` over its `maxInserts` capacity — the asked fpp
    * holds no matter how long the stream runs.
    */
  def forRotation(maxInserts: Long, fpp: Double, retired: Int): Params = {
    require(retired >= 1, s"retired generations must be >= 1, got $retired")
    forExpected(maxInserts, fpp / (retired + 1))
  }

  /** Untyped-column build form for `df.agg(...)` over a LONG key column
    * (pre-hash strings with `xxhash64`/[[Hash60]] — any 64-bit map works,
    * the probe only promises no false negatives over the SAME key values).
    */
  def agg(p: Params): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new Agg(p.numBits, p.numHashes))

  /** Probe column: true iff `key` MIGHT be in the filter (false ⇒ definitely
    * not inserted). `bits` rides into generated code as a reference object —
    * one shared array per executor, not per row.
    */
  def mightContain(key: Column, bits: Array[Long], p: Params): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key), bits, p.numHashes))

  /** Build aggregator: buffer = the bit words. `zero` is the empty array
    * (not a zeroed full-size one) so untouched groups cost nothing and the
    * merge of two empties stays empty; first reduce allocates.
    */
  class Agg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1,16], got $numHashes")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      val w = if (b.isEmpty) new Array[Long](numBits >>> 6) else b
      BloomKernel.insert(w, numHashes, key)
      w
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}

/** Native probe expression — boolean membership test against a fixed bit
  * array carried as an expression parameter (NOT a child: the filter is a
  * build-time constant, exactly like the planted literal in Spark's own
  * `BloomFilterMightContain` after subquery execution). An EMPTY bits array
  * (the aggregator's zero — a 0-row build side) probes false for every key:
  * the filter of the empty set contains nothing.
  */
case class BloomMightContain(child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint key, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    BloomKernel.mightContain(bits, numHashes, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val cls = BloomKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.mightContain($ref, $numHashes, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[BloomMightContain]] / [[Bloom.Agg]] — companion-less object
  * so scalac emits static forwarders the generated Java calls directly
  * (same pattern as [[Hash60Kernel]]).
  */
object BloomKernel {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def insert(bits: Array[Long], numHashes: Int, key: Long): Unit = {
    val mask = (bits.length << 6) - 1 // numBits is a power of two
    var h = mix(key)
    val d = mix(key ^ 0xC2B2AE3D27D4EB4FL) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = (h & mask).toInt
      bits(idx >>> 6) |= 1L << (idx & 63)
      h += d
      i += 1
    }
  }

  def mightContain(bits: Array[Long], numHashes: Int, key: Long): Boolean = {
    if (bits.length == 0) return false
    val mask = (bits.length << 6) - 1
    var h = mix(key)
    val d = mix(key ^ 0xC2B2AE3D27D4EB4FL) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = (h & mask).toInt
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      h += d
      i += 1
    }
    true
  }
}
