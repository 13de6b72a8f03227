package graft

import org.apache.spark.sql.SparkSession

/** Bloom-novelty-gate state-at-scale probe: the gate's claim is CONSTANT
  * state — 2^shardBits fixed filters however many keys flow through — so
  * the numbers that must hold are (a) warm per-row cost flat across waves
  * of NEW keys (the filters fill; nothing grows), and (b) the all-seen
  * replay wave no slower than the all-new waves (the probe-hit path pays
  * the same k bit-tests). State bytes are exact by construction:
  * shards × numBits/8 — printed per point, never measured, because there
  * is nothing data-dependent to measure.
  *
  * Usage: `runMain graft.BloomGateScaleBench [shardsCsv] [keysPerWave]
  * [waves]` → one JSON line per shard count: the warm all-new wave, the
  * all-seen replay wave, and the fixed state size.
  */
object BloomGateScaleBench {

  def main(args: Array[String]): Unit = {
    val shardsList = args.headOption.getOrElse("8,32,256")
      .split(",").map(_.trim.toInt).toSeq
    val keysPerWave = args.lift(1).map(_.toInt).getOrElse(500000)
    val waves = args.lift(2).map(_.toInt).getOrElse(4)

    val spark = SparkSession.builder()
      .master("local[32]").appName("bloom-gate-scale-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    shardsList.foreach { shards =>
      val shardBits = Integer.numberOfTrailingZeros(shards)
      require(1 << shardBits == shards, s"shard count must be a power of two: $shards")
      // size each shard for its slice of the TOTAL key flow at 1%
      val p = graft.functions.Bloom.forExpected(
        math.max(1024L, keysPerWave.toLong * waves / shards), 0.01)
      def keyedRow(globalId: Long): graft.streaming.BloomNovelty.Keyed = {
        val h = scala.util.hashing.byteswap64(globalId)
        graft.streaming.BloomNovelty.Keyed((h >>> (64 - shardBits)).toInt, h, globalId)
      }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.BloomNovelty.Keyed]
      val q = graft.streaming.BloomNovelty.tagged(in.toDS(), p)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"bloom_gate_$shards").toString)
        .start()
      var lastNewSec = 0.0
      var replaySec = 0.0
      try {
        (0 until waves).foreach { w =>
          // every wave is entirely NEW keys: ids continue monotonically
          val rows = (0 until keysPerWave)
            .map(i => keyedRow(w.toLong * keysPerWave + i))
          val t0 = System.nanoTime()
          in.addData(rows)
          q.processAllAvailable()
          lastNewSec = (System.nanoTime() - t0) / 1e9
        }
        // the all-seen path: wave 0's hashes again (fresh doc ids keep the
        // monotone contract; classification depends only on the hash)
        val replay = (0 until keysPerWave)
          .map(i => keyedRow(i.toLong).copy(
            doc_id = waves.toLong * keysPerWave + i))
        val t0 = System.nanoTime()
        in.addData(replay)
        q.processAllAvailable()
        replaySec = (System.nanoTime() - t0) / 1e9
      } finally q.stop()
      val stateBytes = shards.toLong * (p.numBits >> 3)
      println(s"""{"metric":"bloom_gate_scale","shards":$shards,"keys_per_wave":$keysPerWave,"waves":$waves,"warm_new_wave_sec":$lastNewSec,"new_keys_per_sec":${(keysPerWave / lastNewSec).toLong},"replay_wave_sec":$replaySec,"replay_keys_per_sec":${(keysPerWave / replaySec).toLong},"state_bytes":$stateBytes}""")
    }

    // ROTATION wave: the same flow into a gate whose per-shard ACTIVE
    // capacity is deliberately ~1/4 of its key share, so every shard
    // rotates several times mid-run. The claims: throughput stays in the
    // fixed-gate's class on every wave (rotation is an O(arrays) pointer
    // shuffle, not a rebuild), and state is exactly (retired+1) fixed
    // filters per shard however far past sized capacity the stream runs.
    {
      val shards = 32
      val shardBits = Integer.numberOfTrailingZeros(shards)
      val retired = 2
      val perShardFlow = math.max(1024L, keysPerWave.toLong * waves / shards)
      val cap = math.max(1024L, perShardFlow / 4) // ~4 rotations per shard
      val rot = graft.streaming.BloomNovelty.Rotation(cap, retired)
      val p = graft.functions.Bloom.forRotation(cap, 0.01, retired)
      def keyedRow(globalId: Long): graft.streaming.BloomNovelty.Keyed = {
        val h = scala.util.hashing.byteswap64(globalId)
        graft.streaming.BloomNovelty.Keyed((h >>> (64 - shardBits)).toInt, h, globalId)
      }
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.BloomNovelty.Keyed]
      val q = graft.streaming.BloomNovelty.tagged(in.toDS(), p, rot)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("bloom_gate_rot").toString)
        .start()
      val waveSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
      try {
        (0 until waves).foreach { w =>
          val rows = (0 until keysPerWave)
            .map(i => keyedRow(w.toLong * keysPerWave + i))
          val t0 = System.nanoTime()
          in.addData(rows)
          q.processAllAvailable()
          waveSecs += (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      val stateBytes = shards.toLong * (retired + 1) * (p.numBits >> 3)
      val per = waveSecs.map(s => (keysPerWave / s).toLong)
      println(s"""{"metric":"bloom_gate_rotation","shards":$shards,"active_capacity":$cap,"retired":$retired,"keys_per_wave":$keysPerWave,"waves":$waves,"wave_keys_per_sec":[${per.mkString(",")}],"warm_new_wave_sec":${waveSecs.last},"state_bytes":$stateBytes}""")
    }
    spark.stop()
  }
}
