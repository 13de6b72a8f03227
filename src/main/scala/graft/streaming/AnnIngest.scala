package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-driven INDEX MAINTENANCE — the ingest half of the online ANN
  * deployment ([[AnnServe]] is the query half): the corpus directory is
  * watched as a Structured Streaming file source, and every micro-batch of
  * newly landed embedding files triggers a DELTA-ONLY refresh of the
  * standing codes artifacts ([[graft.ops.Similarity.refreshPqCodes]] and
  * friends — left-anti against the current snapshot's ids, encode the
  * delta, stage as appended files, publish by ONE atomic manifest commit).
  * A serve concurrent with an ingest batch therefore sees the pre-growth
  * artifact in full or the grown one in full, never a torn mix — the
  * snapshot contract doing double duty as the stream's isolation.
  *
  * Exactly-once without a sink transaction: the file source's checkpoint
  * gives each FILE to exactly one micro-batch, and the refresh itself is
  * idempotent by construction — replayed rows (failure between refresh and
  * offset commit) are dropped by the left-anti, so a re-run of the same
  * batch appends nothing. The observability ledger IS batch-keyed
  * (`batch_id=<n>` overwrite, [[AnnServe]]'s discipline), so its rows
  * can't duplicate either.
  *
  * At 100 TB the per-batch cost is one anti-join on vec_id (5-byte codes
  * side) plus the delta encode — the corpus is never re-encoded, and the
  * artifacts' list partitioning is append-stable (frozen published
  * centroids for the trained/residual layouts; monotone ids for the
  * sampled one). Compaction debt from many small refreshes is the normal
  * [[graft.ops.Similarity.compactPqCodes]] maintenance.
  */
object AnnIngest {

  private def refreshOf(spark: SparkSession, sfDir: String,
                        kind: String): Long = kind match {
    case Similarity.CodesKind.Sampled  => Similarity.refreshPqCodes(spark, sfDir)
    case Similarity.CodesKind.Trained  => Similarity.refreshPqCodesTrained(spark, sfDir)
    case Similarity.CodesKind.Residual => Similarity.refreshPqCodesRes(spark, sfDir)
    case other => throw new IllegalArgumentException(s"unknown codes kind: $other")
  }

  /** Start the ingest loop over `sfDir`'s embeddings directory. `layouts`
    * names the codes kinds to keep fresh (each is ensured BEFORE the
    * stream starts — an ingest loop must never pay a corpus-wide first
    * build inside a micro-batch). `ledgerDir`, when set, receives one
    * `batch_id=<n>` parquet of (layout, rows_added) per non-empty batch.
    * `maxFilesPerTrigger` is the admission knob — how many newly landed
    * corpus files one refresh absorbs.
    */
  def ingest(spark: SparkSession, sfDir: String, checkpointDir: String,
             layouts: Seq[String] = Seq(Similarity.CodesKind.Sampled),
             ledgerDir: Option[String] = None,
             maxFilesPerTrigger: Int = 16): StreamingQuery = {
    require(layouts.nonEmpty, "ingest needs at least one codes layout")
    layouts.foreach(refreshOf(spark, sfDir, _)) // ensure + catch-up, pre-stream
    val schema = graft.Tables.load(spark, sfDir, "embeddings").schema
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$sfDir/embeddings.parquet")
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // the batch frame itself only GATES the work (its files are the
        // growth); the refresh reads the corpus as it now lies and grows
        // each artifact by exactly the ids its snapshot lacks
        if (!batch.isEmpty) {
          val added = layouts.map(k => k -> refreshOf(spark, sfDir, k))
          ledgerDir.foreach { dir =>
            // FIRST completion wins: on a crash-replay (failure between
            // the refresh's snapshot commit and the offset commit) the
            // re-run's refreshes return 0 — overwriting would replace the
            // true growth with zeros, corrupting the audit. A batch dir
            // that already exists keeps its first-written truth. Residual
            // window: a crash between the refresh commit and this write
            // records that batch's growth as 0 on replay — the ARTIFACT
            // is exact either way (the ledger is observability, not the
            // source of truth; reconcile against Similarity.codesHistory)
            val bdir = new org.apache.hadoop.fs.Path(s"$dir/batch_id=$batchId")
            val fs = bdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(bdir)) {
              import spark.implicits._
              added.toDF("layout", "rows_added")
                .write.mode("overwrite").parquet(bdir.toString)
            }
          }
        }
        ()
      }
      .start()
  }

  /** The ingest ledger read back — (batch_id, layout, rows_added), the
    * growth audit a deployment alarms on (a stuck-at-zero ingest while the
    * corpus grows = a broken feed). Quiet empty frame before the first
    * non-empty batch lands.
    */
  def ledger(spark: SparkSession, ledgerDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // quiet empty when the dir is absent OR exists but holds no batch yet
    // (a pre-created mount/temp dir before the first non-empty batch) —
    // schema inference over a parquet-less dir would crash instead
    val hasBatches = fs.exists(root) && fs.listStatus(root)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    if (!hasBatches) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField("batch_id", LongType), StructField("layout", StringType),
        StructField("rows_added", LongType))))
    } else
      spark.read.parquet(ledgerDir)
        .select(col("batch_id").cast("long").as("batch_id"),
          col("layout"), col("rows_added"))
  }
}
