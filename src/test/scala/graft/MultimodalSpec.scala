package graft

import graft.ops.Multimodal

/** The stub decoder's plumbing contract: binary in, typed features out,
  * deterministic, and consistent with the expression-level metadata query.
  */
class MultimodalSpec extends SparkSuite {

  test("decode produces one feature row per media row, deterministic") {
    val feats = Multimodal.decode(spark, sf).collect()
    assert(feats.length == 500)
    val again = Multimodal.decode(spark, sf).collect()
    assert(feats.map(_.checksum).sorted.sameElements(again.map(_.checksum).sorted))
  }

  test("stub features agree with the expression-level metadata query") {
    import org.apache.spark.sql.functions._
    val meta = Multimodal.mediaMeta(spark, sf)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("checksum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getString(3))).toMap
    Multimodal.decode(spark, sf).collect().foreach { f =>
      val (nb, w, ck) = meta(f.doc_id)
      assert(f.n_bytes == nb && f.width == w && f.checksum == ck)
    }
  }

  test("resize: one output per media row, target dims, size proportional to area") {
    val out = Multimodal.resize(spark, sf, 64, 64).collect()
    assert(out.length == 500)
    assert(out.forall(r => r.width == 64 && r.height == 64))
    assert(out.forall(_.media.length == 64 * 64 / 64))
    val big = Multimodal.resize(spark, sf, 128, 128).collect()
    assert(big.forall(_.media.length == 128 * 128 / 64))
  }

  test("real PNG codec: javax.imageio round-trip recovers every pixel") {
    // the blobs are REAL PNG files (magic bytes prove a genuine container,
    // not our own serialization) ...
    val blobs = Multimodal.pngTable(spark, sf).collect()
    assert(blobs.length == 500)
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    blobs.foreach(b => assert(b.media.take(8).sameElements(magic), s"doc ${b.doc_id} not a PNG"))
    // ... and the decoded raster matches the closed-form pixel model
    Multimodal.pngDecodeDf(spark, sf).collect().foreach { f =>
      assert(f.width == Multimodal.pngWidth(f.doc_id))
      assert(f.height == Multimodal.pngHeight(f.doc_id))
      val want = (for (y <- 0 until f.height; x <- 0 until f.width)
        yield Multimodal.pngGray(f.doc_id, x, y).toLong).sum
      assert(f.pixel_sum == want, s"doc ${f.doc_id}: pixel_sum ${f.pixel_sum} != $want")
      assert(f.px_first == Multimodal.pngGray(f.doc_id, 0, 0))
      assert(f.px_last == Multimodal.pngGray(f.doc_id, f.width - 1, f.height - 1))
    }
  }

  test("real PNG resize: thumbnails are real PNGs with nearest-neighbor pixels") {
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val thumbs = Multimodal.pngThumbs(spark, sf, 8, 8).collect()
    assert(thumbs.length == 500)
    thumbs.foreach(t => assert(t.media.take(8).sameElements(magic)))
    Multimodal.pngThumbFeatures(spark, sf, 8, 8).collect().foreach { f =>
      assert(f.width == 8 && f.height == 8)
      val (w, h) = (Multimodal.pngWidth(f.doc_id), Multimodal.pngHeight(f.doc_id))
      val want = (for (y <- 0 until 8; x <- 0 until 8)
        yield Multimodal.pngGray(f.doc_id, x * w / 8, y * h / 8).toLong).sum
      assert(f.pixel_sum == want, s"doc ${f.doc_id}: ${f.pixel_sum} != $want")
    }
  }

  test("phash: resize-invariant through a second real codec pass; model-exact; dup classes collide") {
    import spark.implicits._
    // dHash of the original == dHash of its real 8×8 thumbnail (thumb of an
    // 8×8 image is the identity map) — the perceptual property that makes
    // the hash a near-dup key, proven through TWO encode→decode passes
    val direct = Multimodal.pngPhashDf(spark, sf).collect()
      .map(r => r.doc_id -> r.phash).toMap
    val viaThumb = Multimodal.pngTable(spark, sf)
      .mapPartitions(Multimodal.pngResizeEncode(8, 8))
      .mapPartitions(Multimodal.pngPhash).collect()
    assert(viaThumb.length == 500)
    viaThumb.foreach(r => assert(direct(r.doc_id) == r.phash,
      s"doc ${r.doc_id}: phash not resize-invariant"))
    // closed-form model agreement (the oracle's computation, in Scala)
    direct.foreach { case (id, got) =>
      val (w, h) = (Multimodal.pngWidth(id), Multimodal.pngHeight(id))
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 7)
        if (Multimodal.pngGray(id, (x + 1) * w / 8, y * h / 8) >
            Multimodal.pngGray(id, x * w / 8, y * h / 8)) want |= 1L << (y * 7 + x)
      assert(got == want, s"doc $id: phash $got != model $want")
      assert(got >= 0L, "56-bit hash must stay a positive BIGINT")
    }
    // identical pixel functions (id ≡ id' mod 256) must collide exactly
    direct.collect { case (id, ph) if id >= 256 && direct.contains(id - 256) =>
      assert(ph == direct(id - 256), s"dup class $id broken")
    }
  }

  test("audio fingerprint: model-exact through the real codec; gain-invariance of the comparison core") {
    import spark.implicits._
    val got = Multimodal.wavFingerprintDf(spark, sf).collect()
    assert(got.length == 500)
    got.foreach { r =>
      val n = Multimodal.wavFrames(r.doc_id)
      assert(r.n_frames == n.toLong, s"doc ${r.doc_id}: codec frame count drifted")
      // closed-form model agreement (the oracle's computation, in Scala)
      val e = new Array[Long](32)
      (0 until n).foreach(i => e(i * 32 / n) += math.abs(Multimodal.wavSample(r.doc_id, i)))
      var want = 0L
      (0 until 31).foreach(f => if (e(f + 1) > e(f)) want |= 1L << f)
      assert(r.afp == want, s"doc ${r.doc_id}: afp ${r.afp} != model $want")
      assert(r.afp >= 0L, "31-bit fingerprint must stay a positive BIGINT")
      // gain invariance — the perceptual property: scaling every band
      // loudness preserves every rising-edge comparison, hence the hash
      var scaled = 0L
      (0 until 31).foreach(f => if (3 * e(f + 1) > 3 * e(f)) scaled |= 1L << f)
      assert(scaled == want)
    }
    // the corpus must exercise both edge directions (hash isn't degenerate;
    // the structured synthetic PCM yields ~80 distinct hashes on 500 docs)
    assert(got.exists(_.afp != 0L) && got.map(_.afp).distinct.length > 50)
  }

  test("animated GIF: real multi-frame container — per-pixel round trip, indexed sampling") {
    val blobs = Multimodal.gifTable(spark, sf).collect()
    assert(blobs.length == 500)
    blobs.foreach(b =>
      assert(new String(b.media.take(3), "US-ASCII") == "GIF", s"doc ${b.doc_id}: not a GIF"))
    // decode EVERY frame of every doc pixel-for-pixel against the model —
    // proves the indexed identity-gray palette makes the container lossless
    blobs.foreach { r =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.media))
      reader.setInput(iis)
      assert(reader.getNumImages(true) == Multimodal.gifNumFrames(r.doc_id),
        s"doc ${r.doc_id}: frame count drifted")
      for (f <- 0 until Multimodal.gifNumFrames(r.doc_id)) {
        val img = reader.read(f)
        assert(img.getWidth == Multimodal.gifWidth(r.doc_id) &&
          img.getHeight == Multimodal.GifHeight)
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
          assert((img.getRGB(x, y) & 0xff) == Multimodal.gifGray(r.doc_id, f, x, y),
            s"doc ${r.doc_id} frame $f pixel ($x,$y)")
      }
      reader.dispose(); iis.close()
    }
    // stride-2 sampling: exactly the even frame indices, ceil(n/2) rows/doc
    val rows = Multimodal.gifFramesDf(spark, sf).collect()
    val byDoc = rows.groupBy(_.doc_id)
    assert(byDoc.size == 500)
    byDoc.foreach { case (id, rs) =>
      val n = Multimodal.gifNumFrames(id)
      assert(rs.map(_.frame_idx).sorted.toSeq == (0 until n by 2).toSeq,
        s"doc $id: sampled frames ${rs.map(_.frame_idx).toSeq}")
    }
    // per-frame dHash (the video fingerprint): model-exact through the codec
    val ph = Multimodal.gifPhashDf(spark, sf).collect()
    assert(ph.length == rows.length)
    ph.foreach { p =>
      val w = Multimodal.gifWidth(p.doc_id)
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 7)
        if (Multimodal.gifGray(p.doc_id, p.frame_idx, (x + 1) * w / 8, y) >
            Multimodal.gifGray(p.doc_id, p.frame_idx, x * w / 8, y)) want |= 1L << (y * 7 + x)
      assert(p.phash == want, s"doc ${p.doc_id} frame ${p.frame_idx}")
    }
  }

  test("real WAV codec: javax.sound round-trip recovers every PCM sample") {
    val blobs = Multimodal.wavTable(spark, sf).collect()
    assert(blobs.length == 500)
    blobs.foreach { b =>
      assert(new String(b.media.take(4), "US-ASCII") == "RIFF")
      assert(new String(b.media.slice(8, 12), "US-ASCII") == "WAVE")
      assert(b.media.length == 44 + 2 * Multimodal.wavFrames(b.doc_id))
    }
    Multimodal.wavDecodeDf(spark, sf).collect().foreach { f =>
      val n = Multimodal.wavFrames(f.doc_id)
      assert(f.n_frames == n && f.sample_rate == Multimodal.WavRate)
      val samples = (0 until n).map(i => Multimodal.wavSample(f.doc_id, i))
      assert(f.amp_sum == samples.map(_.toLong).sum)
      assert(f.amp_max == samples.max)
    }
  }

  test("frame sampling: stride-4 indices bounded by the stub frame count") {
    import org.apache.spark.sql.functions._
    val frames = Multimodal.frameSample(spark, sf).collect()
    assert(frames.nonEmpty)
    val nFrames = Multimodal.decode(spark, sf).collect()
      .map(f => f.doc_id -> f.n_frames).toMap
    frames.foreach { r =>
      val idx = r.getAs[Long]("frame_idx")
      assert(idx % 4 == 0)
      assert(idx < nFrames(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("frame_ms") == idx * 100)
    }
    // every video doc appears (stride samples at least frame 0)
    assert(frames.map(_.getAs[Long]("doc_id")).distinct.length ==
      nFrames.count { case (id, _) => id % 3 == 2 })
  }
}
