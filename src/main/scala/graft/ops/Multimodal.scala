package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) as opaque `binary`
  * columns + typed metadata, with decode / feature-extraction as a
  * per-partition batch operator.
  *
  * Three paths are REAL end-to-end with zero extra dependencies: PNG via
  * javax.imageio, WAV PCM via javax.sound.sampled, and animated GIF via
  * ImageIO's sequence API (the multi-FRAME container — frame-indexed
  * seek-and-decode, the video pipeline's core access pattern, on a real
  * format) — genuine encode→decode round-trips whose decoded
  * pixels/samples/frames are oracle-checked. `decodeStub`/`resizeStub`
  * remain as clearly-marked deterministic FAKES standing in only for
  * ffmpeg-class containers (H.264 etc.) — and even there the Spark-side
  * plumbing is real: binary
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

  // ===== REAL CODECS (no stubs) =====
  // Two genuine end-to-end media paths with zero new dependencies:
  //  * PNG via javax.imageio — a real third-party codec (zlib/DEFLATE
  //    decompression, filter reconstruction, real container parsing);
  //  * WAV PCM via javax.sound.sampled — real RIFF container + PCM frames.
  // Blobs are synthesized at ingest as REAL encoded files whose *content*
  // (pixels / samples) is a closed-form function of doc_id, so a SQL oracle
  // can verify the decoded values without any codec: if ImageIO's DEFLATE
  // round-trip or the RIFF frame math were wrong anywhere, the hash check
  // fails. The encoded byte stream itself is codec-version-dependent (PNG
  // encoders choose filters/compression freely), so oracles check decoded
  // content, never blob bytes.

  /** Deterministic image geometry/content for doc `id` (shared with the
    * DuckDB oracle, which recomputes these in SQL): w,h in [8,24), gray
    * value at (x,y) = (id*31 + 7x + 13y) mod 256.
    */
  def pngWidth(id: Long): Int = 8 + (id % 16).toInt
  def pngHeight(id: Long): Int = 8 + ((id / 16) % 16).toInt
  def pngGray(id: Long, x: Int, y: Int): Int = ((id * 31 + 7L * x + 13L * y) % 256).toInt

  /** Real PNG encode — one ImageIO encoder per partition, blobs produced in
    * the task that will store them (narrow, shuffle-free, same contract a
    * production ingest uses).
    */
  def pngEncode(ids: Iterator[Long]): Iterator[MediaRow] = {
    // in-memory ImageIO streams: the default file-backed stream cache
    // creates (and fsyncs) a temp FILE per encode/decode — measured 21x
    // cost at 10x rows on the resize path before this (superlinear from
    // tmpfs contention across 32 threads); with the cache off the codec
    // curves are ~linear
    javax.imageio.ImageIO.setUseCache(false)
    ids.map { id =>
      val (w, h) = (pngWidth(id), pngHeight(id))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, pngGray(id, x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(id, bos.toByteArray, "image/png")
    }
  }

  /** An images table of REAL PNG files, one per document id. */
  def pngTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long].mapPartitions(pngEncode)
  }

  /** Columns derived from REAL decoded pixels (not the blob envelope):
    * dimensions as reported by the decoder, the sum over every decoded gray
    * value, and the first/last pixel values.
    */
  case class PngFeatures(doc_id: Long, width: Int, height: Int,
                         pixel_sum: Long, px_first: Int, px_last: Int)

  /** Real PNG decode — javax.imageio parses the container, inflates the
    * DEFLATE stream, and reconstructs scanline filters; every output column
    * comes from the decoded raster. Per-partition batch contract as above.
    */
  def pngDecode(rows: Iterator[MediaRow]): Iterator[PngFeatures] = {
    javax.imageio.ImageIO.setUseCache(false) // see pngEncode
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      require(img != null, s"PNG decode failed for doc ${r.doc_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      PngFeatures(r.doc_id, w, h, sum,
        raster.getSample(0, 0, 0), raster.getSample(w - 1, h - 1, 0))
    }
  }

  /** Distributed real-PNG decode: encode → decode round-trip through the
    * actual codec, oracle-checked cell-for-cell against the closed-form
    * pixel model.
    */
  def pngDecodeDf(spark: SparkSession, sfDir: String): Dataset[PngFeatures] = {
    import spark.implicits._
    pngTable(spark, sfDir).mapPartitions(pngDecode)
  }

  /** Real thumbnail pass: decode the PNG, scale to `tw`×`th` by
    * nearest-neighbor — dst(x,y) = src(x·w div tw, y·h div th), chosen over
    * Graphics2D interpolation because it is exactly reproducible in SQL —
    * and RE-ENCODE through the codec. Two genuine codec passes per blob,
    * still narrow: blobs never leave the task that read them.
    */
  def pngResizeEncode(tw: Int, th: Int)(rows: Iterator[MediaRow]): Iterator[MediaRow] = {
    javax.imageio.ImageIO.setUseCache(false) // see pngEncode
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      require(img != null, s"PNG decode failed for doc ${r.doc_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      val src = img.getRaster
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val dst = out.getRaster
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) {
          dst.setSample(x, y, 0, src.getSample(x * w / tw, y * h / th, 0))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      MediaRow(r.doc_id, bos.toByteArray, "image/png")
    }
  }

  /** Real 8×8 (default) thumbnails of the real PNG table. */
  def pngThumbs(spark: SparkSession, sfDir: String,
                tw: Int = 8, th: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    pngTable(spark, sfDir).mapPartitions(pngResizeEncode(tw, th))
  }

  /** encode → decode → scale → re-encode → decode: features of the REAL
    * thumbnail bytes, oracle-checked against the closed-form
    * nearest-neighbor pixel model.
    */
  def pngThumbFeatures(spark: SparkSession, sfDir: String,
                       tw: Int = 8, th: Int = 8): Dataset[PngFeatures] = {
    import spark.implicits._
    pngThumbs(spark, sfDir, tw, th).mapPartitions(pngDecode)
  }

  /** 56-bit dHash perceptual fingerprint of a REAL decoded PNG: the codec
    * decodes the blob, an 8×8 nearest-neighbor thumbnail is sampled from
    * the raster (the [[pngResizeEncode]] model — dst(x,y) = src(x·w div 8,
    * y·h div 8)), and bit y·7+x is set iff thumb(x+1,y) > thumb(x,y) — the
    * standard gradient-sign hash that survives re-encoding, resizing, and
    * mild brightness shifts. 56 bits (7 horizontal gradients × 8 rows)
    * keeps the value in a positive BIGINT, the [[Hashing.h60]] discipline.
    */
  case class PhashRow(doc_id: Long, phash: Long)

  def pngPhash(rows: Iterator[MediaRow]): Iterator[PhashRow] = {
    javax.imageio.ImageIO.setUseCache(false) // see pngEncode
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      require(img != null, s"PNG decode failed for doc ${r.doc_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      def thumb(x: Int, y: Int): Int = raster.getSample(x * w / 8, y * h / 8, 0)
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 7) {
          if (thumb(x + 1, y) > thumb(x, y)) hash |= 1L << (y * 7 + x)
          x += 1
        }
        y += 1
      }
      PhashRow(r.doc_id, hash)
    }
  }

  /** Perceptual fingerprints of the real PNG table — codec in the loop. */
  def pngPhashDf(spark: SparkSession, sfDir: String): Dataset[PhashRow] = {
    import spark.implicits._
    pngTable(spark, sfDir).mapPartitions(pngPhash)
  }

  /** Image near-duplicate graph over the perceptual hash — the multimodal
    * capstone: real codec → dHash → Hamming banding. Two scale rules, both
    * measured:
    *
    *  1. Candidate generation runs on DISTINCT fingerprints: identical
    *     images (the dominant dup mode — re-crawls, mirrors, the viral
    *     thumbnail) collapse to ONE class row BEFORE banding, so bucket
    *     membership and the pair explosion scale with fingerprint
    *     diversity, never copy count (naive per-doc banding of this corpus
    *     explodes 15M candidates at sf0.1 — measured 14 s vs 1.3 s).
    *  2. The OUTPUT is the non-redundant factorization, never the full
    *     quadratic pair set: every member of a class carries the exact same
    *     phash, so (a) within a class, the star (class rep = min doc_id →
    *     member, Hamming 0) carries the complete information of the
    *     C(n,2) identical pairs, and (b) across classes, ONE rep-level pair
    *     carries the Hamming of every member cross pair. A viral image with
    *     10⁶ copies emits 10⁶ − 1 star rows, not 5·10¹¹ pairs — and unlike
    *     [[Dedup.cappedPairs]]' star FALLBACK this factorization is
    *     LOSSLESS: the full pair set is exactly recoverable (and
    *     [[Dedup.connectedComponents]] consumes the graph as-is).
    *
    * 4 bands × 14 bits: by pigeonhole any class pair within `maxHamming` =
    * 3 agrees on at least one full band, so banding misses nothing at the
    * threshold and the brute-force-over-classes oracle matches exactly.
    * `bucketCap` stars a degenerate band bucket (the house skew rule) —
    * cap-invariant at test SF.
    */
  def imagePhashPairs(spark: SparkSession, sfDir: String,
                      maxHamming: Int = 3, bucketCap: Int = 10000): DataFrame = {
    val bandBits = 14
    val mask = (1L << bandBits) - 1
    // doc-sized but 16 B/row; two consumers (class table + the star join)
    // — checkpoint so the codec pass runs once. The decode materializes at
    // full parallelism; the checkpointed RESULT is then sizedCoalesce'd so
    // the class/band/census micro-frames stop scheduling cores-wide stages
    val fp = graft.Tables.sizedCoalesce(
      pngPhashDf(spark, sfDir).toDF().localCheckpoint())
    val classes = fp.groupBy(col("phash")).agg(min(col("doc_id")).as("rep"))
    val bands = (0 until 56 / bandBits).map { b =>
      struct(lit(b).as("band_id"),
        shiftright(col("phash"), b * bandBits).bitwiseAND(mask).as("key"))
    }
    // census-first bucket pairs (Dedup.bucketedCappedPairs): class rows are
    // diversity-bounded already, but the census shape removes even that
    // O(diversity) collected row for degenerate buckets — the struct member
    // orders by rep (first field), so pair ids and the star hub stay
    // deterministic
    val classPairs = Dedup.bucketedCappedPairs(
        classes.select(col("rep"), col("phash"), explode(array(bands: _*)).as("band"))
          .select(col("band.band_id").as("band_id"), col("band.key").as("key"),
            struct(col("rep"), col("phash")).as("m")),
        Seq("band_id", "key"), bucketCap)
      .select(col("p.doc_a.rep").as("doc_a"), col("p.doc_b.rep").as("doc_b"),
        bit_count(col("p.doc_a.phash").bitwiseXOR(col("p.doc_b.phash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // class-level: bounded by fingerprint diversity, not corpus
    val within = fp.join(classes, "phash")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    classPairs.unionAll(within)
  }

  // ===== animated GIF: the multi-FRAME (video-class) codec path, REAL =====
  // ffmpeg-class containers stay environmental (no native codecs here), but
  // the JDK ships a genuine multi-frame media codec: animated GIF via
  // ImageIO's sequence writer/reader. That makes frame-sampling — the video
  // pipeline's core op — runnable against a REAL container: encode N full
  // frames per doc, decode every k-th by index without materializing the
  // rest. Same closed-form pixel model family as PNG, extended by a frame
  // term (shared with the oracle).

  def gifNumFrames(id: Long): Int = 2 + (id % 7).toInt
  def gifWidth(id: Long): Int = 8 + (id % 8).toInt
  val GifHeight = 8
  def gifGray(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + 29L * f + 7L * x + 13L * y) % 256).toInt

  /** Explicit identity 256-gray palette: GIF is indexed color, and writing
    * TYPE_BYTE_INDEXED over this palette makes the round trip LOSSLESS by
    * construction (index i ⇔ gray i) — no writer-side quantization to
    * second-guess.
    */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Real animated-GIF encode: one ImageIO sequence writer per partition
    * (the per-partition codec-state contract), full frames per doc.
    */
  def gifEncode(ids: Iterator[Long]): Iterator[MediaRow] = {
    javax.imageio.ImageIO.setUseCache(false) // see pngEncode
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    ids.map { id =>
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val (w, h) = (gifWidth(id), GifHeight)
      var f = 0
      while (f < gifNumFrames(id)) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, gifGray(id, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
      ios.close()
      MediaRow(id, bos.toByteArray, "image/gif")
    }
  }

  /** A media table of REAL animated GIFs, one per document id. */
  def gifTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long].mapPartitions(gifEncode)
  }

  case class GifFrameRow(doc_id: Long, frame_idx: Int, width: Int, gray_sum: Long)

  /** Real frame sampling over the animated container: the reader indexes
    * frames (`getNumImages`/`read(i)`), so every k-th frame is decoded
    * WITHOUT materializing the ones in between — the seek-and-decode shape
    * an ffmpeg-backed video path uses, proven here on a real container.
    */
  def gifFrameSample(stride: Int)(rows: Iterator[MediaRow]): Iterator[GifFrameRow] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.flatMap { r =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.media))
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      val out = (0 until n by stride).map { f =>
        val img = reader.read(f)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        GifFrameRow(r.doc_id, f, img.getWidth, sum)
      }
      reader.dispose(); iis.close()
      out
    }
  }

  /** Sampled frames (stride 2) of the real GIF table — multi-frame codec in
    * the loop, oracle-checked against the closed-form frame model.
    */
  def gifFramesDf(spark: SparkSession, sfDir: String, stride: Int = 2): Dataset[GifFrameRow] = {
    import spark.implicits._
    gifTable(spark, sfDir).mapPartitions(gifFrameSample(stride))
  }

  /** Per-frame 56-bit dHash over the REAL decoded GIF frames — the video
    * fingerprint table, completing fingerprint symmetry across all three
    * modalities (image [[pngPhash]], audio [[wavFingerprint]], video here):
    * each sampled frame gets the same gradient-sign hash the image path
    * uses (8×8 nearest-neighbor thumb; height is already 8, so thumb row y
    * maps to raster row y), and a video near-dup candidate is two docs
    * agreeing on (frame_idx, phash) — the per-frame-hash-sequence matching
    * standard video fingerprinting uses, served by the SAME class-collapse
    * + Hamming-banding machinery as the stills ([[imagePhashPairs]]).
    */
  case class GifPhashRow(doc_id: Long, frame_idx: Int, phash: Long)

  def gifPhash(stride: Int)(rows: Iterator[MediaRow]): Iterator[GifPhashRow] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.flatMap { r =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.media))
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      val out = (0 until n by stride).map { f =>
        val img = reader.read(f)
        val w = img.getWidth
        def thumb(x: Int, y: Int): Int = img.getRGB(x * w / 8, y) & 0xff
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 7) {
            if (thumb(x + 1, y) > thumb(x, y)) hash |= 1L << (y * 7 + x)
            x += 1
          }
          y += 1
        }
        GifPhashRow(r.doc_id, f, hash)
      }
      reader.dispose(); iis.close()
      out
    }
  }

  /** Frame fingerprints of the real GIF table — video codec in the loop. */
  def gifPhashDf(spark: SparkSession, sfDir: String, stride: Int = 2): Dataset[GifPhashRow] = {
    import spark.implicits._
    gifTable(spark, sfDir).mapPartitions(gifPhash(stride))
  }

  /** Connected components over the image near-dup graph — executing the
    * composition the star factorization promises ([[imagePhashPairs]]
    * scaladoc: "connectedComponents consumes the graph as-is"): clusters of
    * visually identical/near images straight from the star+cross pair
    * output, via the same star-alternation CC loop the text dedup path uses.
    */
  def imagePhashClusters(spark: SparkSession, sfDir: String): org.apache.spark.sql.DataFrame =
    graft.ops.Dedup.connectedComponents(
      imagePhashPairs(spark, sfDir).select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("comp"))

  /** Deterministic PCM content for doc `id` (shared with the oracle):
    * 64 + id%64 mono 16-bit frames at 8 kHz, sample i =
    * ((id*131 + 17i) mod 65536) - 32768.
    */
  val WavRate = 8000
  def wavFrames(id: Long): Int = 64 + (id % 64).toInt
  def wavSample(id: Long, i: Int): Int = ((id * 131 + 17L * i) % 65536).toInt - 32768

  /** Real WAV encode: a canonical 44-byte RIFF/WAVE header + 16-bit
    * little-endian PCM mono frames — a genuine .wav file any player opens.
    */
  def wavEncode(ids: Iterator[Long]): Iterator[MediaRow] = {
    ids.map { id =>
      val n = wavFrames(id)
      val dataLen = n * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)               // PCM
        .putShort(1)               // mono
        .putInt(WavRate)
        .putInt(WavRate * 2)       // byte rate
        .putShort(2)               // block align
        .putShort(16)              // bits/sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) { bb.putShort(wavSample(id, i).toShort); i += 1 }
      MediaRow(id, bb.array(), "audio/wav")
    }
  }

  /** An audio table of REAL WAV files, one per document id. */
  def wavTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long].mapPartitions(wavEncode)
  }

  /** Columns from REAL decoded audio: frame count and rate as reported by
    * the javax.sound codec, plus sum/max over every decoded signed sample.
    */
  case class WavFeatures(doc_id: Long, n_frames: Long, sample_rate: Int,
                         amp_sum: Long, amp_max: Int)

  /** Real WAV decode — javax.sound.sampled parses the RIFF container and
    * exposes typed PCM frames; sample values are re-assembled from the
    * decoder's output bytes per its reported AudioFormat (not assumed LE).
    */
  def wavDecode(rows: Iterator[MediaRow]): Iterator[WavFeatures] = {
    rows.map { r =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.media))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected format for doc ${r.doc_id}: $fmt")
      val pcm = ais.readAllBytes()
      ais.close()
      var sum = 0L; var max = Int.MinValue
      var i = 0
      while (i + 1 < pcm.length) {
        val (lo, hi) = if (fmt.isBigEndian) (pcm(i + 1), pcm(i)) else (pcm(i), pcm(i + 1))
        val s = (hi.toInt << 8) | (lo.toInt & 0xff)
        sum += s; if (s > max) max = s
        i += 2
      }
      WavFeatures(r.doc_id, pcm.length / 2L, fmt.getSampleRate.toInt, sum, max)
    }
  }

  /** Distributed real-WAV decode, oracle-checked against the closed-form
    * sample model.
    */
  def wavDecodeDf(spark: SparkSession, sfDir: String): Dataset[WavFeatures] = {
    import spark.implicits._
    wavTable(spark, sfDir).mapPartitions(wavDecode)
  }

  /** 31-bit acoustic fingerprint of a REAL decoded WAV — the audio analog
    * of [[pngPhash]], closing the same loop (real codec → content hash):
    * the decoded signal is split into 32 time bands (band of sample i =
    * i·32 div n — every band non-empty since n ≥ 64), band loudness =
    * Σ|sample|, and bit f is set iff loudness rises from band f to f+1 —
    * the energy-envelope gradient sign, the core of Haitsma-Kalker/
    * Chromaprint-family audio hashing (robust to gain scaling, which
    * preserves every comparison; 31 bits stays a positive BIGINT). Near-dup
    * pairing on it is the proven Hamming-banding machinery
    * ([[imagePhashPairs]], `Dedup.simhashPairs`) — the fingerprint is the
    * codec-coupled piece, so that is what the oracle pins.
    */
  case class AudioFpRow(doc_id: Long, n_frames: Long, afp: Long)

  def wavFingerprint(rows: Iterator[MediaRow]): Iterator[AudioFpRow] = {
    rows.map { r =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.media))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected format for doc ${r.doc_id}: $fmt")
      val pcm = ais.readAllBytes()
      ais.close()
      val n = pcm.length / 2
      val energy = new Array[Long](32)
      var i = 0
      while (i + 1 < pcm.length) {
        val (lo, hi) = if (fmt.isBigEndian) (pcm(i + 1), pcm(i)) else (pcm(i), pcm(i + 1))
        val s = (hi.toInt << 8) | (lo.toInt & 0xff)
        energy((i / 2) * 32 / n) += math.abs(s)
        i += 2
      }
      var afp = 0L
      var f = 0
      while (f < 31) {
        if (energy(f + 1) > energy(f)) afp |= 1L << f
        f += 1
      }
      AudioFpRow(r.doc_id, n.toLong, afp)
    }
  }

  /** Acoustic fingerprints of the real WAV table — codec in the loop. */
  def wavFingerprintDf(spark: SparkSession, sfDir: String): Dataset[AudioFpRow] = {
    import spark.implicits._
    wavTable(spark, sfDir).mapPartitions(wavFingerprint)
  }

  /** Audio near-duplicate graph over the acoustic fingerprint — the audio
    * twin of [[imagePhashPairs]], same two scale rules (band DISTINCT
    * fingerprints after exact-dup class collapse; emit the LOSSLESS star
    * factorization, never the quadratic pair set — scaladoc there). The
    * synthetic corpus makes the class collapse do real work: ~82 distinct
    * fingerprints over 500 docs, so naive per-doc banding would
    * quadratically re-derive what one class row carries. 4 bands over the
    * 31 bits (8+8+8+7) — by pigeonhole lossless at `maxHamming` 3.
    */
  def audioFpPairs(spark: SparkSession, sfDir: String,
                   maxHamming: Int = 3, bucketCap: Int = 10000): DataFrame = {
    val bandBits = 8
    val mask = (1L << bandBits) - 1
    // decode at full parallelism, then sizedCoalesce the 16 B/row result
    // (same micro-stage rationale as imagePhashPairs' fp)
    val fp = graft.Tables.sizedCoalesce(wavFingerprintDf(spark, sfDir).toDF()
      .select(col("doc_id"), col("afp")).localCheckpoint())
    val classes = fp.groupBy(col("afp")).agg(min(col("doc_id")).as("rep"))
    val bands = (0 until 4).map { b =>
      struct(lit(b).as("band_id"),
        shiftright(col("afp"), b * bandBits).bitwiseAND(mask).as("key"))
    }
    // census-first bucket pairs — same shape and rationale as
    // imagePhashPairs' classPairs
    val classPairs = Dedup.bucketedCappedPairs(
        classes.select(col("rep"), col("afp"), explode(array(bands: _*)).as("band"))
          .select(col("band.band_id").as("band_id"), col("band.key").as("key"),
            struct(col("rep"), col("afp")).as("m")),
        Seq("band_id", "key"), bucketCap)
      .select(col("p.doc_a.rep").as("doc_a"), col("p.doc_b.rep").as("doc_b"),
        bit_count(col("p.doc_a.afp").bitwiseXOR(col("p.doc_b.afp")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val within = fp.join(classes, "afp")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    classPairs.unionAll(within)
  }
}
