package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) as opaque `binary`
  * columns + typed metadata, with decode / feature-extraction as a
  * per-partition batch operator.
  *
  * The container has no media codecs, so `decodeStub` is a clearly-marked
  * deterministic FAKE decoder — but the Spark-side plumbing is real: binary
  * column schema, case-class encoders, `mapPartitions` batching (the Scala
  * analog of a vectorized/mapInPandas decode stage: one decoder instance per
  * partition, rows streamed through it), and metadata columns computed with
  * codegen'd expressions so scans can prune/push down on them without touching
  * the blob bytes.
  */
object Multimodal {

  /** A media row: id + opaque payload + container-level metadata. */
  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  /** Decoded features (here: deterministic fakes standing in for real
    * width/height/duration extracted by a codec).
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                           n_frames: Int, checksum: String)

  /** Builds a media table from `documents` by treating the UTF-8 text bytes as
    * the blob — same shape a real ingest would produce from image files.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"))
  }

  /** ===== STUB DECODER =====
    * Stands in for a real codec (libpng/ffmpeg/...). Deterministic pure
    * function of the bytes so tests and oracles are stable. The partition
    * iterator shape is the real contract: a production decoder would
    * initialize native state once per partition here.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // per-partition "codec init" would go here
    rows.map { r =>
      val n = r.media.length.toLong
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = n,
        width = ((n * 7919) % 1024).toInt,
        height = ((n * 104729) % 768).toInt,
        n_frames = (n % 30).toInt + 1,
        checksum = java.security.MessageDigest.getInstance("MD5")
          .digest(r.media).map(b => f"$b%02x").mkString)
    }
  }

  /** Distributed decode: one decoder per partition, rows streamed through. */
  def decode(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions(decodeStub)
  }

  /** A resized media row: target dims + the re-encoded (stub) payload. */
  case class ResizedRow(doc_id: Long, width: Int, height: Int, media: Array[Byte])

  /** ===== STUB RESIZE =====
    * Stands in for a decode→scale→re-encode kernel. The deterministic fake
    * "re-encode" truncates/pads the blob to a size proportional to the target
    * area, so output size scales like a real thumbnail. Same per-partition
    * batch contract as [[decodeStub]]: codec state initializes once per
    * partition, blobs never leave the task that read them (narrow — the
    * resize of 100 TB of media is shuffle-free).
    */
  def resizeStub(target: (Int, Int))(rows: Iterator[MediaRow]): Iterator[ResizedRow] = {
    val (tw, th) = target
    rows.map { r =>
      val n = math.max(1, (tw.toLong * th / 64).toInt)
      val out = java.util.Arrays.copyOf(r.media, n) // truncate or zero-pad
      ResizedRow(r.doc_id, tw, th, out)
    }
  }

  /** Distributed resize to a fixed thumbnail size. */
  def resize(spark: SparkSession, sfDir: String,
             width: Int = 64, height: Int = 64): Dataset[ResizedRow] = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions(resizeStub((width, height)))
  }

  /** Frame sampling for video rows: one output row per sampled frame — the
    * explode-per-media batch shape a real pipeline uses to fan a container out
    * into frame work items (then decoded per partition like [[decodeStub]]).
    * Frame count and the 10 fps clock come from the STUB "container header"
    * (deterministic functions of the bytes); the per-frame content hash is a
    * deterministic fake standing in for the decoded frame's digest. The
    * explode stays narrow and codegen'd: at 100 TB this multiplies rows
    * WITHOUT shuffling the blob — the blob is reduced to its md5 before the
    * explode, so frame rows carry only 32-byte strings.
    */
  def frameSample(spark: SparkSession, sfDir: String, stride: Int = 4): DataFrame = {
    mediaTable(spark, sfDir)
      .filter(col("media_type") === "video/mp4")
      .select(col("doc_id"), md5(col("media")).as("chk"),
        (octet_length(col("media")).cast("long") % 30 + 1).cast("int").as("n_frames"))
      .select(col("doc_id"), col("chk"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * 100L).as("frame_ms"), // 10 fps stub clock
        md5(concat(col("chk"), lit(":"), col("frame_idx").cast("string"))).as("frame_hash"))
  }

  /** Content-addressable dedup manifest — the storage-side primitive of a
    * multimodal lake: blobs keyed by digest, with reference counts, unique
    * bytes, and the savings a CAS layout banks by storing each distinct
    * blob once. The digest is computed MAP-SIDE (codegen'd md5 over the
    * binary column) and only (type, digest, length) ever shuffles — the
    * blob bytes stay in the task that read them, so the manifest of 100 TB
    * of media moves kilobytes per partition. This is the upload-dedup /
    * garbage-collection table every content store maintains.
    */
  def mediaDedupManifest(spark: SparkSession, sfDir: String): DataFrame = {
    mediaTable(spark, sfDir)
      .select(col("media_type"), md5(col("media")).as("digest"),
        octet_length(col("media")).cast("long").as("n_bytes"))
      .groupBy(col("media_type"), col("digest"))
      .agg(count(lit(1)).as("ref_count"), max(col("n_bytes")).as("n_bytes"))
      .select(col("media_type"), col("digest"), col("ref_count"), col("n_bytes"),
        ((col("ref_count") - 1) * col("n_bytes")).as("saved_bytes"))
  }

  /** Metadata-only query — expression-level equivalent of the stub decoder's
    * integer metadata, kept in whole-stage codegen (no decode of the blob
    * beyond octet_length/md5) so it is oracle-checkable and scan-friendly.
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    mediaTable(spark, sfDir).select(
      col("doc_id"),
      col("media_type"),
      octet_length(col("media")).cast("long").as("n_bytes"),
      ((octet_length(col("media")).cast("long") * 7919) % 1024).cast("int").as("width"),
      ((octet_length(col("media")).cast("long") * 104729) % 768).cast("int").as("height"),
      md5(col("media")).as("checksum"))
  }
}
