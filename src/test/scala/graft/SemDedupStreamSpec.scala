package graft

import graft.ops.Similarity
import graft.streaming.SemDedupStream
import graft.streaming.SemDedupStream.{Judged, VecRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Online semantic dedup vs batch SemDeDup: the same corpus (embeddings +
  * planted semantic clones, the `Similarity.semDedup` fixture) replayed as
  * a stream in vec_id order must reproduce the batch (vec_id, bucket,
  * kept) table row for row — assignment expression, exemplar-cap
  * discipline, and the rounded-cosine greedy predicate all bit-parity.
  */
class SemDedupStreamSpec extends SparkSuite {

  test("streamed semantic judgments equal batch semDedupDf row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val planted = base.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("v"), x => x * lit(2.0)).as("v"))
    val corpus = base.unionAll(planted)

    val batch = Similarity.semDedupDf(corpus)
      .select(col("vec_id"), col("bucket"), col("kept"))
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, b, k) => id -> (b, k) }.toMap

    val cents = SemDedupStream.centroids(corpus)
    val rows = corpus.as[(Long, Seq[Double])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Seq[Double])]
    val assigned = SemDedupStream.assign(
      input.toDS().toDF("vec_id", "v"), cents).as[VecRow]
    val q = SemDedupStream.judged(assigned)
      .writeStream.format("memory").queryName("semdedup_stream")
      .outputMode("append").start()
    try {
      input.addData(rows.take(rows.length / 2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2): _*)
      q.processAllAvailable()
      val streamed = spark.table("semdedup_stream").as[Judged].collect()
      assert(streamed.length == batch.size,
        s"${streamed.length} streamed vs ${batch.size} batch rows")
      streamed.foreach { j =>
        val (b, k) = batch(j.vec_id)
        assert(j.bucket == b, s"vec ${j.vec_id}: bucket ${j.bucket} != batch $b")
        assert(j.kept == k, s"vec ${j.vec_id}: kept ${j.kept} != batch $k")
      }
      // the fixture must exercise real drops (planted clones read cos 1.0)
      assert(streamed.exists(!_.kept), "no drops — fixture degenerate")
    } finally q.stop()
  }

  test("transformWithState twin: judgments equal classic on RocksDB; classic store migrates in") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val RocksKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(RocksKey)
    spark.conf.set(RocksKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Tables.load(spark, sf, "embeddings")
        .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      val planted = base.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("v"), x => x * lit(2.0)).as("v"))
      val corpus = base.unionAll(planted)
      val cents = SemDedupStream.centroids(corpus)
      val rows = corpus.as[(Long, Seq[Double])].collect().sortBy(_._1)
      def assigned(in: MemoryStream[(Long, Seq[Double])]) =
        SemDedupStream.assign(in.toDS().toDF("vec_id", "v"), cents).as[VecRow]
      val batch = Similarity.semDedupDf(corpus)
        .select(col("vec_id"), col("bucket"), col("kept"))
        .as[(Long, Long, Boolean)].collect()
        .map { case (id, b, k) => Judged(id, b, k) }.toSet
      // full replay on the TWS path (ListState entry per exemplar vector)
      val in = MemoryStream[(Long, Seq[Double])]
      val q = SemDedupStream.judgedTws(assigned(in))
        .writeStream.format("memory").queryName("sem_tws")
        .outputMode("append").start()
      val tws = try {
        in.addData(rows.take(rows.length / 2): _*); q.processAllAvailable()
        in.addData(rows.drop(rows.length / 2): _*); q.processAllAvailable()
        spark.table("sem_tws").as[Judged].collect().toSet
      } finally q.stop()
      assert(tws == batch, s"TWS judgments diverged: ${(tws -- batch).take(5)}")
      // classic wave-1 store migrates into the per-entry layout
      val (wave1, wave2) = rows.splitAt(rows.length / 2)
      val chk = java.nio.file.Files.createTempDirectory("sem_tws_mig").toString
      val in1 = MemoryStream[(Long, Seq[Double])]
      val q1 = SemDedupStream.judged(assigned(in1))
        .writeStream.format("memory").queryName("sem_tws_mig_a")
        .option("checkpointLocation", chk).outputMode("append").start()
      try { in1.addData(wave1: _*); q1.processAllAvailable() } finally q1.stop()
      val st = graft.streaming.StateMigration.readSemDedupState(spark, chk)
      val in2 = MemoryStream[(Long, Seq[Double])]
      val q2 = SemDedupStream.judgedTwsFrom(assigned(in2), st)
        .writeStream.format("memory").queryName("sem_tws_mig_b")
        .outputMode("append").start()
      val resumed = try {
        in2.addData(wave2: _*); q2.processAllAvailable()
        spark.table("sem_tws_mig_b").as[Judged].collect().toSet
      } finally q2.stop()
      val wave2Ids = wave2.map(_._1).toSet
      assert(resumed == batch.filter(j => wave2Ids(j.vec_id)),
        s"classic→TWS semantic migration diverged: ${resumed.take(5)}")
    } finally prior match {
      case Some(v) => spark.conf.set(RocksKey, v)
      case None    => spark.conf.unset(RocksKey)
    }
  }

  test("PQ-screened state: judgments equal the raw-vector path; the screen actually screens") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val RocksKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(RocksKey)
    spark.conf.set(RocksKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Tables.load(spark, sf, "embeddings")
        .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      val planted = base.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("v"), x => x * lit(2.0)).as("v"))
      val corpus = base.unionAll(planted)
      val cents = SemDedupStream.centroids(corpus)
      val rows = corpus.as[(Long, Seq[Double])].collect().sortBy(_._1)
      // the deployment's vector-store point read, modeled as a broadcast
      // map; the accumulator counts how many pairs actually paid it
      val byId = rows.toMap
      val fetches = spark.sparkContext.longAccumulator("pq_fetches")
      val fetch: Long => Seq[Double] = id => { fetches.add(1L); byId(id) }
      def assigned(in: MemoryStream[(Long, Seq[Double])]) =
        SemDedupStream.assign(in.toDS().toDF("vec_id", "v"), cents).as[VecRow]
      val batch = Similarity.semDedupDf(corpus)
        .select(col("vec_id"), col("bucket"), col("kept"))
        .as[(Long, Long, Boolean)].collect()
        .map { case (id, b, k) => Judged(id, b, k) }.toSet

      val in = MemoryStream[(Long, Seq[Double])]
      val q = SemDedupStream.judgedPqTws(assigned(in), fetch)
        .writeStream.format("memory").queryName("sem_pq_tws")
        .outputMode("append").start()
      val pq = try {
        in.addData(rows.take(rows.length / 2): _*); q.processAllAvailable()
        in.addData(rows.drop(rows.length / 2): _*); q.processAllAvailable()
        spark.table("sem_pq_tws").as[Judged].collect().toSet
      } finally q.stop()
      // judgments unchanged — ADC only pre-screens, exact cosine decides
      assert(pq == batch, s"PQ-screened judgments diverged: ${(pq -- batch).take(5)}")
      assert(pq.exists(!_.kept), "no drops — fixture degenerate")
      // and the screen is doing work: with random-vector clusters most
      // pairs are provably below tau from codes alone, so the exact
      // fetches must be well under the pair count the raw path evaluates
      val pairBound = rows.size.toLong * 16L // loose floor: >= pairs per cluster chain
      assert(fetches.value > 0, "no fetch ever — planted clones must reach the exact check")
      assert(fetches.value < pairBound,
        s"screen ineffective: ${fetches.value} fetches vs ~$pairBound pair budget")
    } finally prior match {
      case Some(v) => spark.conf.set(RocksKey, v)
      case None    => spark.conf.unset(RocksKey)
    }
  }

  test("cluster-state migration: relocated exemplar store keeps judging history") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StateMigration
    val base = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val planted = base.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("v"), x => x * lit(2.0)).as("v"))
    val corpus = base.unionAll(planted)
    val cents = SemDedupStream.centroids(corpus)
    val rows = corpus.as[(Long, Seq[Double])].collect().sortBy(_._1)
    val (wave1, wave2) = rows.splitAt(rows.length / 2)
    def assigned(in: MemoryStream[(Long, Seq[Double])]) =
      SemDedupStream.assign(in.toDS().toDF("vec_id", "v"), cents).as[VecRow]
    // old store: wave 1 checkpointed
    val chk = java.nio.file.Files.createTempDirectory("sem_mig_chk").toString
    val in1 = MemoryStream[(Long, Seq[Double])]
    val q1 = SemDedupStream.judged(assigned(in1))
      .writeStream.format("memory").queryName("sem_mig_a")
      .option("checkpointLocation", chk).outputMode("append").start()
    try { in1.addData(wave1: _*); q1.processAllAvailable() } finally q1.stop()
    // migrate + resume; wave-2 judgments must equal the uninterrupted run's
    val st = StateMigration.readSemDedupState(spark, chk)
    assert(st.count() > 0, "wave 1 built no cluster state")
    val in2 = MemoryStream[(Long, Seq[Double])]
    val q2 = SemDedupStream.judgedFrom(assigned(in2), st)
      .writeStream.format("memory").queryName("sem_mig_b")
      .outputMode("append").start()
    val resumed = try {
      in2.addData(wave2: _*); q2.processAllAvailable()
      spark.table("sem_mig_b").as[Judged].collect().toSet
    } finally q2.stop()
    val batch = Similarity.semDedupDf(corpus)
      .select(col("vec_id"), col("bucket"), col("kept"))
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, b, k) => Judged(id, b, k) }.toSet
    val wave2Ids = wave2.map(_._1).toSet
    assert(resumed == batch.filter(j => wave2Ids(j.vec_id)),
      s"relocated semantic store diverged: ${resumed.take(5)}")
    assert(resumed.exists(!_.kept), "wave 2 must exercise drops against wave-1 exemplars")
  }

  test("TWS TTL: expired exemplars re-admit enrollment (cap counts live entries)") {
    // the TTL drift scenario: ListState entries expire per-entry while the
    // counter ValueState is refreshed every batch — a counter-led cap
    // would pin the cluster at clusterCap forever after its exemplars
    // expired. The fix derives the cap from the live entries (free: the
    // greedy scan reads them anyway).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val RocksKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(RocksKey)
    spark.conf.set(RocksKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def vec(i: Int) = Seq.tabulate(4)(j => if (j == i) 1.0 else 0.0)
      val in = MemoryStream[VecRow]
      val q = SemDedupStream.judgedTws(in.toDS(), tau = 0.4, clusterCap = 2,
          ttl = Some(java.time.Duration.ofSeconds(3)))
        .writeStream.format("memory").queryName("sem_ttl")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
        .outputMode("append").start()
      try {
        // batch 1: two orthogonal exemplars fill the cap
        in.addData(VecRow(7L, 1L, vec(0)), VecRow(7L, 2L, vec(1)))
        awaitSourceOffset(q, 0)
        Thread.sleep(2000)
        // batch 2: cap full — row 3 is judged but not enrolled; this batch
        // refreshes the old counter's TTL (the drift setup: entries will
        // expire while the counter survives)
        in.addData(VecRow(7L, 3L, vec(2))); awaitSourceOffset(q, 1)
        Thread.sleep(2500) // exemplars 1,2 expired (age ≥ 4.5 s); counter alive
        // the store is empty again — enrollment must re-admit
        in.addData(VecRow(7L, 4L, vec(3))); awaitSourceOffset(q, 2)
        // a clone of row 4 must be DROPPED — the proof row 4 enrolled
        in.addData(VecRow(7L, 5L, vec(3))); awaitSourceOffset(q, 3)
        val got = spark.table("sem_ttl").as[Judged].collect()
          .map(j => j.vec_id -> j.kept).toMap
        assert(got(4L), "row 4 arrived into an expired cluster and must be kept")
        assert(!got(5L),
          s"row 5 clones row 4; dropping it proves re-enrollment after expiry (got $got)")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(RocksKey, v)
      case None    => spark.conf.unset(RocksKey)
    }
  }
}
