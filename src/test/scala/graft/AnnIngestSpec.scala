package graft

import java.nio.file.Files

import graft.ops.{CodesSnapshot, Similarity}
import graft.streaming.AnnIngest
import org.apache.spark.sql.functions._

/** The stream-driven index-maintenance loop ([[graft.streaming.AnnIngest]]):
  * newly landed corpus files trigger delta-only, snapshot-committed growth
  * of the standing codes artifacts. Pins: the artifact grows by exactly the
  * NEW ids per batch (and by zero when a landing re-delivers known ids —
  * the left-anti is the idempotence); post-ingest serving equals a
  * from-scratch build of the grown corpus; the ledger records the growth
  * batch-keyed; and every ingest commit is a snapshot (a concurrent reader
  * binds to pre- or post-growth in full).
  */
class AnnIngestSpec extends SparkSuite {

  private def growableCorpus(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix).toString
    Tables.load(spark, sf, "embeddings").write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("new corpus files grow the artifact delta-only; re-landed ids add zero; ledger is batch-keyed") {
    val dir = growableCorpus("ann_ingest")
    val ckpt = Files.createTempDirectory("ann_ingest_ckpt").toString
    val ledger = Files.createTempDirectory("ann_ingest_ledger").toString + "/ledger"
    val base = Tables.load(spark, sf, "embeddings")
    val baseN = base.count()

    val q = AnnIngest.ingest(spark, dir, ckpt, ledgerDir = Some(ledger))
    try {
      // batch 0: the initial files — already encoded by the pre-stream
      // catch-up, so the refresh adds nothing
      q.processAllAvailable()
      val name = s"graft_artifacts.${Similarity.codesShortKind(dir, Similarity.CodesKind.Sampled)}"
      assert(spark.table(name).count() == baseN)
      val root = Similarity.artifactLoc(spark, name.split('.').last)
      val vAfterCatchup = CodesSnapshot.current(spark, root).get.version

      // growth: a genuinely new slice lands as one file
      val delta = base.filter(col("vec_id") % 11 === 0)
        .select((col("vec_id") + 500000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(3.0f)).as("embedding"))
      val deltaN = delta.count()
      delta.write.mode("append").parquet(s"$dir/embeddings.parquet")
      q.processAllAvailable()
      assert(spark.table(name).count() == baseN + deltaN,
        "ingest did not grow the artifact by exactly the delta")
      // growth was ONE snapshot commit — a reader binds to before or after
      assert(CodesSnapshot.current(spark, root).get.version == vAfterCatchup + 1)

      // idempotence: the same ids land AGAIN (an upstream re-delivery) —
      // the left-anti drops them all, artifact and snapshot unchanged
      delta.write.mode("append").parquet(s"$dir/embeddings.parquet")
      q.processAllAvailable()
      assert(spark.table(name).count() == baseN + deltaN,
        "a re-delivered landing duplicated codes rows")
      assert(CodesSnapshot.current(spark, root).get.version == vAfterCatchup + 1,
        "a zero-growth batch must not publish a new snapshot")

      // the ledger: batch-keyed growth audit — one zero row (initial
      // catch-up batch), one delta row, one zero row (re-delivery)
      val led = AnnIngest.ledger(spark, ledger)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1)
      assert(led.map(_._2).forall(_ == Similarity.CodesKind.Sampled))
      assert(led.map(_._3).toSeq == Seq(0L, deltaN, 0L),
        s"ledger growth trail diverged: ${led.toSeq}")

      // post-ingest serving parity: the grown artifact answers exactly as a
      // from-scratch build of the grown corpus would
      val dir2 = Files.createTempDirectory("ann_ingest_scratch").toString
      spark.read.parquet(s"$dir/embeddings.parquet")
        .write.parquet(s"$dir2/embeddings.parquet")
      val scratch = Similarity.ensurePqCodes(spark, dir2)
      val a = spark.table(name).collect().map(_.toSeq).toSet
      val b = spark.table(scratch).collect().map(_.toSeq).toSet
      assert(a == b, "ingested artifact diverged from the from-scratch build")
    } finally q.stop()
  }

  test("ledger on a not-yet-written dir is a quiet empty frame; unknown layout refused") {
    val empty = AnnIngest.ledger(spark,
      Files.createTempDirectory("ann_ingest_nl").toString + "/never")
    assert(empty.isEmpty && empty.columns.toSeq ==
      Seq("batch_id", "layout", "rows_added"))
    // a PRE-CREATED but batch-less dir (a mount/temp path made up front) is
    // the same quiet empty state, not a parquet schema-inference crash
    val premade = AnnIngest.ledger(spark,
      Files.createTempDirectory("ann_ingest_premade").toString)
    assert(premade.isEmpty && premade.columns.toSeq ==
      Seq("batch_id", "layout", "rows_added"))
    intercept[IllegalArgumentException] {
      AnnIngest.ingest(spark, growableCorpus("ann_ingest_bad"),
        Files.createTempDirectory("ann_ingest_bad_ckpt").toString,
        layouts = Seq("nope"))
    }
  }
}
