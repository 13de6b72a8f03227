package graft

import java.nio.file.Files

import graft.ops.Similarity
import graft.streaming.AnnServe
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stream-driven ANN serving loop ([[graft.streaming.AnnServe]]):
  * each micro-batch of query ids must produce exactly the hash-green batch
  * serve's answers, routed to its own batch-keyed output partition — the
  * online endpoint is the same plan the oracle gates, fed by a stream.
  */
class AnnServeSpec extends SparkSuite {

  test("micro-batches serve exactly the batch-serve answers, keyed by batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Long]
    val out = Files.createTempDirectory("ann_serve_out").toString
    val ckpt = Files.createTempDirectory("ann_serve_ckpt").toString
    val q = AnnServe.serve(spark, sf,
      input.toDF().select(col("value").as("query_id")), out, ckpt)
    try {
      input.addData(0L, 1L)
      q.processAllAvailable()
      input.addData(3L, 2L, 3L) // duplicate + unordered: the loop dedupes
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        // batch_id is a DISCOVERED partition column — inference types it int
        .select(col("batch_id").cast("long"), col("query_id"), col("vec_id"), col("cos_sim"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      // batch routing: each query's rows live in the micro-batch that
      // carried it, nowhere else
      val byBatch = got.groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      assert(byBatch.keySet.size == 2, s"expected 2 served batches: $byBatch")
      val (b0, b1) = (byBatch.keySet.min, byBatch.keySet.max)
      assert(byBatch(b0) == Set(0L, 1L) && byBatch(b1) == Set(2L, 3L),
        s"queries routed to the wrong micro-batch: $byBatch")
      // answers: per query, the set of (neighbor, score) equals the
      // single-query serve (the oracle-gated plan)
      for (qid <- Seq(0L, 1L, 2L, 3L)) {
        val expect = Similarity.pqTopKServed(spark, sf, queryId = qid)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
        val served = got.filter(_._2 == qid).map(t => (t._3, t._4)).toSet
        assert(served == expect, s"stream-served answers for query $qid diverged")
      }
    } finally q.stop()
  }

  test("the trained-IVF layout plugs into the same loop: answers == the trained batch serve") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Long]
    val out = Files.createTempDirectory("ann_serve_t_out").toString
    val ckpt = Files.createTempDirectory("ann_serve_t_ckpt").toString
    val q = AnnServe.serve(spark, sf,
      input.toDF().select(col("value").as("query_id")), out, ckpt,
      layout = AnnServe.IvfTrained())
    try {
      input.addData(0L, 2L)
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select(col("query_id"), col("vec_id"), col("cos_sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val expect = Similarity.pqTopKIvfTrainedBatch(spark, sf, Seq(0L, 2L))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expect,
        s"trained-layout stream serve diverged from the batch serve:\n$got\nvs\n$expect")
    } finally q.stop()
  }
}
