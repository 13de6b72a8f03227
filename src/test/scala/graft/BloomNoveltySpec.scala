package graft

import graft.functions.Bloom
import graft.streaming.BloomNovelty
import graft.streaming.BloomNovelty.{Keyed, Tagged}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The constant-state novelty gate: definitely_new is EXACT (never claimed
  * for previously-seen content), output is invariant under micro-batch
  * split points for a monotone-id stream, and the state never grows.
  */
class BloomNoveltySpec extends SparkSuite {
  import BloomNoveltySpec.D

  // per-shard params sized small so spec-scale corpora still exercise
  // multi-word filters
  private val p = Bloom.forExpected(512, 0.01)

  private def docSeq: Seq[D] = {
    val real = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(40).collect()
      .map(r => D(r.getLong(0), r.getString(1))).toSeq
    // plant exact repeats LATER in id order (content seen again must tag
    // maybe_seen), ids above the real ones to keep the monotone contract
    real ++ real.take(10).zipWithIndex.map { case (d, i) =>
      D(100000L + i, d.text)
    }
  }

  private def runSplits(splits: Seq[Seq[D]]): Seq[Tagged] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[D]
    val name = s"bloom_novelty_${System.nanoTime()}"
    val q = BloomNovelty.tagged(
        BloomNovelty.keyed(input.toDS().toDF(), shardBits = 4), p)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Tagged].collect().toSeq.sortBy(t => (t.doc_id, t.h))
    } finally q.stop()
  }

  test("stream == one-pass batch fold; repeats always maybe_seen; invariant under splits") {
    val docs = docSeq
    import spark.implicits._
    val keyedRows = BloomNovelty.keyed(docs.toDF(), shardBits = 4).collect().toSeq
    val expect = BloomNovelty.batchTagged(keyedRows, p).sortBy(t => (t.doc_id, t.h))

    val oneBatch = runSplits(Seq(docs))
    val threeBatches = runSplits(Seq(docs.take(15), docs.slice(15, 41), docs.drop(41)))
    assert(oneBatch == expect, "single-batch stream diverged from the batch fold")
    assert(threeBatches == expect, "classification changed with micro-batch split points")

    // the exactness contract: a planted repeat is NEVER definitely_new
    val repeats = oneBatch.filter(_.doc_id >= 100000L)
    assert(repeats.size == 10)
    assert(repeats.forall(!_.definitely_new),
      "previously-seen content tagged definitely_new — false negative in the filter")
    // and the gate is not degenerate: first-time docs are overwhelmingly new
    val firstSeen = oneBatch.filter(_.doc_id < 100000L)
    assert(firstSeen.count(_.definitely_new) >= firstSeen.size - 2,
      "first-time docs mostly tagged maybe_seen — fpp or sharding is off")
  }

  test("transformWithState twin == classic path across the same splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // transformWithState requires the RocksDB state store
    val RocksKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(RocksKey)
    spark.conf.set(RocksKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = docSeq
      val input = MemoryStream[BloomNoveltySpec.D]
      val name = s"bloom_novelty_tws_${System.nanoTime()}"
      val q = BloomNovelty.taggedTws(
          BloomNovelty.keyed(input.toDS().toDF(), shardBits = 4), p)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val tws = try {
        Seq(docs.take(20), docs.drop(20)).foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        }
        spark.table(name).as[Tagged].collect().toSeq.sortBy(t => (t.doc_id, t.h))
      } finally q.stop()
      val classic = runSplits(Seq(docs.take(20), docs.drop(20)))
      assert(tws == classic, "tws and classic novelty gates diverged")
    } finally {
      prior.fold(spark.conf.unset(RocksKey))(spark.conf.set(RocksKey, _))
    }
  }

  test("within-batch duplicate content: second copy tags maybe_seen (sequential semantics)") {
    val twice = Seq(D(1L, "alpha beta gamma delta epsilon"), D(2L, "alpha beta gamma delta epsilon"))
    val got = runSplits(Seq(twice))
    assert(got.map(_.definitely_new) == Seq(true, false))
  }

  test("state is the fixed per-shard word count regardless of history") {
    import spark.implicits._
    val keyedRows = BloomNovelty.keyed(docSeq.toDF(), shardBits = 4).collect().toSeq
    // drive the handler directly twice: the state array length never changes
    val grouped = keyedRows.groupBy(_.shard)
    grouped.foreach { case (_, rows) =>
      val st = new TestGroupState[BloomNovelty.GateState]
      BloomNovelty.onShard(rows.iterator, st, p).toSeq // drain
      assert(st.value.get.active.length == p.numBits >>> 6)
      assert(st.value.get.retired.isEmpty, "non-rotating gate grew a generation")
      BloomNovelty.onShard(rows.iterator, st, p).toSeq
      assert(st.value.get.active.length == p.numBits >>> 6)
      assert(st.value.get.retired.isEmpty)
    }
  }

  test("r14 legacy checkpoint migrates: bits carry over exactly, counter seeded from occupancy") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val docs = docSeq
    val (wave1, wave2) = docs.splitAt(25)
    // wave 1 through the r14 LAYOUT: per-shard state = the bare bit array
    // (this inline handler replicates the pre-rotation fold verbatim)
    val chk = java.nio.file.Files.createTempDirectory("bloom_legacy_chk").toString
    val in1 = MemoryStream[D]
    // locals only: the handler closure ships to tasks and must not drag
    // the (non-serializable) suite in via a field reference
    val nb = p.numBits; val nh = p.numHashes
    val q1 = BloomNovelty.keyed(in1.toDS().toDF(), shardBits = 4)
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: Int, rows: Iterator[Keyed], st: GroupState[Array[Long]]) =>
          val bits = if (st.exists) st.get else new Array[Long](nb >>> 6)
          val out = rows.toSeq.sortBy(r => (r.doc_id, r.h)).map { r =>
            val fresh = !graft.functions.BloomKernel.mightContain(bits, nh, r.h)
            graft.functions.BloomKernel.insert(bits, nh, r.h)
            Tagged(r.doc_id, r.h, fresh)
          }
          st.update(bits)
          out.iterator
      }
      .writeStream.format("memory").queryName("bloom_legacy")
      .option("checkpointLocation", chk).outputMode("append").start()
    try { in1.addData(wave1: _*); q1.processAllAvailable() } finally q1.stop()

    // migrate and resume wave 2 on the NEW layout
    val legacy = graft.streaming.StateMigration.readNoveltyStateLegacy(spark, chk)
    assert(legacy.count() > 0, "wave 1 built no gate state")
    val migrated = graft.streaming.StateMigration.migrateNoveltyState(legacy, p)
    val in2 = MemoryStream[D]
    val name = s"bloom_mig_${System.nanoTime()}"
    val q2 = BloomNovelty.taggedFrom(
        BloomNovelty.keyed(in2.toDS().toDF(), shardBits = 4), p, migrated)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val resumed = try {
      in2.addData(wave2: _*); q2.processAllAvailable()
      spark.table(name).as[Tagged].collect().toSeq.sortBy(t => (t.doc_id, t.h))
    } finally q2.stop()
    // wave-2 classifications equal the uninterrupted fold's tail —
    // migrated bits are the SAME bits, so judgments are exact, not close
    val keyedAll = BloomNovelty.keyed(docs.toDF(), shardBits = 4).collect().toSeq
    val wave2Ids = wave2.map(_.doc_id).toSet
    val expect = BloomNovelty.batchTagged(keyedAll, p)
      .filter(t => wave2Ids(t.doc_id)).sortBy(t => (t.doc_id, t.h))
    assert(resumed == expect, "migrated gate diverged from the uninterrupted fold")
    assert(resumed.exists(!_.definitely_new),
      "wave 2 must re-see wave-1 content through the migrated bits")

    // the tws half of the migration matrix: the SAME migrated state
    // resumed on transformWithState must classify identically
    val RocksKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(RocksKey)
    spark.conf.set(RocksKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in3 = MemoryStream[D]
      val nameT = s"bloom_mig_tws_${System.nanoTime()}"
      val q3 = BloomNovelty.taggedTwsFrom(
          BloomNovelty.keyed(in3.toDS().toDF(), shardBits = 4), p, migrated)
        .writeStream.format("memory").queryName(nameT)
        .outputMode("append").start()
      val resumedTws = try {
        in3.addData(wave2: _*); q3.processAllAvailable()
        spark.table(nameT).as[Tagged].collect().toSeq.sortBy(t => (t.doc_id, t.h))
      } finally q3.stop()
      assert(resumedTws == expect, "tws-resumed migrated gate diverged")
    } finally prior.fold(spark.conf.unset(RocksKey))(spark.conf.set(RocksKey, _))

    // the occupancy seed: estimate within 15% of the true distinct count
    val pEst = Bloom.forExpected(1024, 0.01)
    val bits = new Array[Long](pEst.numBits >>> 6)
    val n = 300
    (0 until n).foreach(i =>
      graft.functions.BloomKernel.insert(bits, pEst.numHashes,
        scala.util.hashing.byteswap64(i.toLong)))
    val est = BloomNovelty.estimateInserted(bits, pEst.numHashes)
    assert(math.abs(est - n) <= n * 0.15,
      s"occupancy estimate $est too far from true $n")
  }

  // ---- generational rotation: the unbounded-flow fpp contract ----

  /** One-shard key at a deterministic distinct hash per id. */
  private def key1(id: Long): Keyed =
    Keyed(0, scala.util.hashing.byteswap64(id), id)

  private val RotCap = 256L
  private val RotKeep = 2
  private val rot = BloomNovelty.Rotation(RotCap, RotKeep)
  private val rotP = Bloom.forRotation(RotCap, 0.01, RotKeep)

  test("rotation: fpp stays <= ask past sized capacity; without it, it climbs") {
    // drive 16x the active capacity through ONE shard — far past the point
    // a fixed filter's realized fpp exceeds its ask
    val n = RotCap * 16
    val st = new TestGroupState[BloomNovelty.GateState]
    BloomNovelty.onShard((0L until n).map(key1).iterator, st, rotP, rot).toSeq
    val g = st.value.get
    assert(g.retired.size == RotKeep, "rotation never retired a generation")
    // realized fpp on keys NEVER inserted: probe the final generations
    // directly (classification would insert and perturb the measurement)
    def present(h: Long): Boolean =
      graft.functions.BloomKernel.mightContain(g.active, rotP.numHashes, h) ||
        g.retired.exists(r =>
          graft.functions.BloomKernel.mightContain(r, rotP.numHashes, h))
    val probes = (1000000L until 1010000L).map(scala.util.hashing.byteswap64)
    val fp = probes.count(present).toDouble / probes.size
    assert(fp <= 0.01, f"rotating gate realized fpp $fp%.4f > 0.01 ask")

    // the motivation: the SAME flow into a non-rotating filter sized for
    // RotCap overshoots its ask (saturation) — this is what rotation fixes
    val stFixed = new TestGroupState[BloomNovelty.GateState]
    val pFixed = Bloom.forExpected(RotCap, 0.01)
    BloomNovelty.onShard((0L until n).map(key1).iterator, stFixed, pFixed).toSeq
    val gf = stFixed.value.get
    val fpFixed = probes.count(h => graft.functions.BloomKernel
      .mightContain(gf.active, pFixed.numHashes, h)).toDouble / probes.size
    assert(fpFixed > 0.01,
      f"saturated fixed filter read $fpFixed%.4f — the wave is too small to show saturation")
  }

  test("rotation: no false negatives within the retention window") {
    val n = RotCap * 16
    val st = new TestGroupState[BloomNovelty.GateState]
    BloomNovelty.onShard((0L until n).map(key1).iterator, st, rotP, rot).toSeq
    // the last retired*maxInserts distinct inserts are all retained: replaying
    // them must classify maybe_seen (fresh=false), exactly per the contract
    val windowStart = n - RotCap * RotKeep
    val replay = (windowStart until n).map(i => key1(i).copy(doc_id = n + i))
    val out = BloomNovelty.onShard(replay.iterator, st, rotP, rot).toSeq
    assert(out.nonEmpty && out.forall(!_.definitely_new),
      "a key inserted within the retention window tagged definitely_new — false negative")
  }

  test("rotation: state is bounded at retired+1 generations forever") {
    val st = new TestGroupState[BloomNovelty.GateState]
    (0 until 40).foreach { w =>
      val rows = (w * RotCap until (w + 1) * RotCap).map(i => key1(i.toLong))
      BloomNovelty.onShard(rows.iterator, st, rotP, rot).toSeq
      val g = st.value.get
      assert(g.retired.size <= RotKeep)
      assert(g.active.length == rotP.numBits >>> 6)
      assert(g.retired.forall(_.length == rotP.numBits >>> 6))
    }
  }

  test("rotation: stream == batch fold, invariant under splits, both APIs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // shrink capacity so spec-scale docs cross a rotation boundary
    val tinyRot = BloomNovelty.Rotation(3, 1)
    val tinyP = Bloom.forRotation(3, 0.01, 1)
    val docs = docSeq
    val keyedRows = BloomNovelty.keyed(docs.toDF(), shardBits = 4).collect().toSeq
    val expect = BloomNovelty.batchTagged(keyedRows, tinyP, tinyRot)
      .sortBy(t => (t.doc_id, t.h))
    // sanity: the fixture actually rotates at this capacity
    assert(keyedRows.groupBy(_.shard).values.exists(_.map(_.h).distinct.size > 3))

    def run(mk: org.apache.spark.sql.Dataset[Keyed] => org.apache.spark.sql.Dataset[Tagged],
            splits: Seq[Seq[D]]): Seq[Tagged] = {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[D]
      val name = s"bloom_rot_${System.nanoTime()}"
      val q = mk(BloomNovelty.keyed(input.toDS().toDF(), shardBits = 4))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[Tagged].collect().toSeq.sortBy(t => (t.doc_id, t.h))
      } finally q.stop()
    }
    val classic1 = run(BloomNovelty.tagged(_, tinyP, tinyRot), Seq(docs))
    val classic3 = run(BloomNovelty.tagged(_, tinyP, tinyRot),
      Seq(docs.take(15), docs.slice(15, 41), docs.drop(41)))
    assert(classic1 == expect, "rotating single-batch stream diverged from the batch fold")
    assert(classic3 == expect, "rotating classification changed with split points")

    val RocksKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(RocksKey)
    spark.conf.set(RocksKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tws = run(BloomNovelty.taggedTws(_, tinyP, tinyRot),
        Seq(docs.take(20), docs.drop(20)))
      assert(tws == expect, "rotating tws gate diverged from the batch fold")
    } finally prior.fold(spark.conf.unset(RocksKey))(spark.conf.set(RocksKey, _))
  }
}

object BloomNoveltySpec {
  /** Top-level so Spark can derive an Encoder (inner classes can't). */
  case class D(doc_id: Long, text: String)
}

/** Minimal GroupState stub for driving handlers directly (update/get only —
  * the novelty handler uses no timeouts or watermarks).
  */
private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = None
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(s: S): Unit = value = Some(s)
  override def remove(): Unit = value = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
