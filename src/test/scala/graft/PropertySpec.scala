package graft

import graft.cdc.Tiering
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the operator kernels whose correctness the
  * DuckDB oracle only samples: the tiering ladder (every size combination,
  * not just the boundary sweep the reference tests — `server_test.go:189-222`)
  * and in-bucket pair generation (vs. a brute-force spec).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  test("misra-gries: guarantee holds under every partitioning (merge-order stress)") {
    val mg = graft.functions.MisraGries.sketch(8)
    // 3 planted heavies far above n/(m+1) drowned in 2000 distinct singletons
    val heavies = Seq("alpha", "beta", "gamma")
    val stream = heavies.flatMap(h => Seq.fill(1000)(h)) ++
      (0 until 2000).map(i => s"noise_$i")
    val n = stream.size.toLong       // 5000; err bound n/(m+1) = 555
    val err = n / 9
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7, 32)) {
      val df = stream.toDF("tok").repartition(parts)
      val sk = df.agg(mg(col("tok"))).collect()(0).getAs[Map[String, Long]](0)
      assert(sk.size <= 8, s"capacity exceeded: ${sk.size}")
      heavies.foreach(h => assert(sk.contains(h),
        s"$parts partitions: heavy '$h' (freq 1000 > $err) missing — guarantee broken"))
      sk.foreach { case (k, est) =>
        val t = exact(k)
        assert(est <= t && t <= est + err,
          s"$parts partitions: '$k' est $est outside [${t - err}, $t]")
      }
    }
  }

  test("collect-capped: buffer bound + in-cap exactness under every merge tree") {
    // the df-cut aggregation's two promises, property-checked over random
    // inputs and random PARTITIONINGS (merge order is Spark's to choose):
    //  1. no buffer — partial or merged — ever exceeds cap+1 elements;
    //  2. keys within the cap collect the exact multiset a full
    //     collect_list would (truncation is unobservable below the cut).
    val gen = for {
      cap <- Gen.choose(1, 8)
      xs <- Gen.listOf(Gen.choose(0L, 50L))
      cuts <- Gen.listOfN(3, Gen.choose(0, math.max(xs.size, 1)))
    } yield (cap, xs, cuts)
    check(Prop.forAll(gen) { case (cap, xs, cuts) =>
      val agg = new graft.functions.CollectCapped.Agg(cap)
      // split xs at random cut points into partitions, reduce each, then
      // merge left-to-right (arbitrary tree shapes reduce to this by the
      // associativity the bound must survive)
      val bounds = (cuts.sorted :+ xs.size).distinct
      val parts = (0 +: bounds).zip(bounds).map { case (a, b) => xs.slice(a, b) }
        .filter(_.nonEmpty)
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val partialOk = bufs.forall(_.length <= cap + 1)
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      val mergedOk = merged.length <= cap + 1
      val exactOk = xs.size > cap || merged.sorted == xs.sorted
      partialOk && mergedOk && exactOk
    })
  }

  test("per-group heavy hitters: one group's heavy survives another group's bulk, any partitioning") {
    // group A plants ONE heavy over 300 distinct noise keys; group B is
    // 20000 rows of bulk on 50 other keys. A GLOBAL capacity-16 sketch is
    // dominated by B's keys and would evict A's heavy before the verify
    // pass ever saw it; the per-group summary must keep it regardless of
    // how Spark partitions (merge-order stress), and the exact pass must
    // discard every padded candidate so the output equals the plain
    // per-group GROUP BY / HAVING twin.
    val aRows = Seq.fill(500)("hot_a") ++ (0 until 300).map(i => s"a_noise_$i")
    val bRows = (0 until 50).flatMap(i => Seq.fill(400)(s"b_bulk_$i"))
    val rows = aRows.map(("A", _)) ++ bRows.map(("B", _))
    val exact: Set[(String, String, Long)] = {
      val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2))
      byGroup.flatMap { case (g, toks) =>
        val n = toks.size.toLong
        toks.groupBy(identity).collect {
          case (t, occ) if occ.size.toLong * 16 > n => (g, t, occ.size.toLong)
        }
      }.toSet
    }
    assert(exact.contains(("A", "hot_a", 500L)), "fixture broken: planted heavy not heavy")
    for (parts <- Seq(1, 8, 32)) {
      val got = graft.ops.TextStats.groupHeavyHittersDf(
          rows.toDF("source", "tok").repartition(parts))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == exact, s"$parts partitions: per-group output diverged from the exact twin")
    }
  }

  test("misra-gries: exact (and partitioning-invariant) when distinct keys fit capacity") {
    val mg = graft.functions.MisraGries.sketch(64)
    val stream = (0 until 3000).map(i => s"k${i % 20}")
    for (parts <- Seq(1, 13)) {
      val sk = stream.toDF("tok").repartition(parts)
        .agg(mg(col("tok"))).collect()(0).getAs[Map[String, Long]](0)
      assert(sk.size == 20)
      assert(sk.values.forall(_ == 150L), s"counts drifted: $sk")
    }
  }

  test("png codec: arbitrary grayscale images survive the decode path losslessly") {
    import graft.ops.Multimodal
    val dims = Gen.choose(1, 40)
    // arbitrary pixel content (not the corpus's closed-form model): encode
    // with ImageIO directly, decode through Multimodal.pngDecode — any
    // filter/compression choice the encoder makes must be invisible
    check(Prop.forAll(dims, dims, Gen.choose(0L, 1L << 40)) { (w, h, seed) =>
      def px(x: Int, y: Int): Int = (((seed + x) * 2654435761L + y * 40503L) % 256).toInt & 0xff
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val f = Multimodal.pngDecode(
        Iterator(Multimodal.MediaRow(1L, bos.toByteArray, "image/png"))).next()
      val want = (for (y <- 0 until h; x <- 0 until w) yield px(x, y).toLong).sum
      f.width == w && f.height == h && f.pixel_sum == want &&
        f.px_first == px(0, 0) && f.px_last == px(w - 1, h - 1)
    })
  }

  test("wav codec: arbitrary PCM (incl. extremes) survives the decode path losslessly") {
    import graft.ops.Multimodal
    val lens = Gen.choose(1, 300)
    check(Prop.forAll(lens, Gen.choose(0L, 1L << 40)) { (n, seed) =>
      // arbitrary samples hitting the signed-16-bit extremes
      def samp(i: Int): Int =
        if (i == 0) -32768 else if (i == n - 1 && n > 1) 32767
        else ((seed * 6364136223846793005L + i * 1442695040888963407L) % 65536).toInt match {
          case v if v < -32768 => v + 65536
          case v if v > 32767  => v - 65536
          case v => v
        }
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(n * 2)
      (0 until n).foreach(i => bb.putShort(samp(i).toShort))
      val f = Multimodal.wavDecode(
        Iterator(Multimodal.MediaRow(1L, bb.array(), "audio/wav"))).next()
      f.n_frames == n && f.sample_rate == 8000 &&
        f.amp_sum == (0 until n).map(samp(_).toLong).sum &&
        f.amp_max == (0 until n).map(samp).max
    })
  }

  test("tiering ladder: invariants hold for ALL size combinations") {
    val sizes = Gen.choose(0, 40)
    check(Prop.forAll(sizes, sizes, Gen.choose(1, 120), Gen.choose(0, 50)) { (np, nv, limit, ne) =>
      val df = Seq(("x" * np, "y" * nv)).toDF("payload", "previous")
      val r = Tiering.ladder(df, "payload", "previous", limit,
        envelope = lit("e" * ne)).collect()(0)
      val tier = r.getAs[Int]("tier")
      val pay = Option(r.getAs[String]("payload"))
      val prev = Option(r.getAs[String]("previous"))
      // full-notification splice model: envelope + ,"payload": (11) +
      // ,"previous": (12); both documents are non-null strings here
      val full = ne + 11 + np + 12 + nv
      val noPrev = ne + 11 + np
      // tier matches the ladder arithmetic (>= semantics, queries.go:33)
      (tier == (if (full < limit) 0 else if (noPrev < limit) 1 else 2)) &&
      // previous is dropped before payload, never the reverse
      (!pay.isEmpty || prev.isEmpty) &&
      // tier 0 passes both through byte-identical
      ((tier != 0) || (pay.contains("x" * np) && prev.contains("y" * nv))) &&
      // tier 1 keeps exactly the payload
      ((tier != 1) || (pay.contains("x" * np) && prev.isEmpty)) &&
      // tier 2 is id-only
      ((tier != 2) || (pay.isEmpty && prev.isEmpty))
    })
  }

  test("pairsOf: emits exactly the ordered unique pairs of a sorted id list") {
    val ids = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 50L)))
    check(Prop.forAll(ids) { raw =>
      val sorted = raw.distinct.sorted
      val df = Seq(Tuple1(sorted)).toDF("ids")
      val got = df.select(explode(Dedup.pairsOf(col("ids"))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        a <- sorted; b <- sorted if a < b
      } yield (a, b)).toSet
      got == want
    })
  }

  test("cappedPairs: all pairs within the cap; star (hub + connectivity) beyond it") {
    val ids = Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 50L)))
    val caps = Gen.chooseNum(2, 8)
    check(Prop.forAll(ids, caps) { (raw, cap) =>
      val sorted = raw.distinct.sorted
      sorted.length < 2 || {
        val df = Seq(Tuple1(sorted)).toDF("ids")
        val got = df.select(explode(Dedup.cappedPairs(col("ids"), cap)).as("p"))
          .select(col("p.doc_a"), col("p.doc_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        if (sorted.length <= cap) {
          // identical to pairsOf
          got == (for { a <- sorted; b <- sorted if a < b } yield (a, b)).toSet
        } else {
          // star: O(c) pairs, every member connected to the hub
          got == sorted.tail.map(b => (sorted.head, b)).toSet
        }
      }
    })
  }

  test("windowFunnel fold matches a reference fold over randomized event histories") {
    // one bulk job per seed: hundreds of generated users exercise the greedy
    // chain (missing steps, out-of-order steps, deadline expiry, irrelevant
    // noise, multiple candidates per step) against an imperative reference
    val dayMicros = 86400L * 1000000L
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val types = Seq("signup", "click", "purchase", "view", "error")
      var eid = 0L
      val rows = (0 until 300).flatMap { user =>
        (0 until rnd.nextInt(13)).map { _ =>
          eid += 1
          // ts over 3 days so the 1-day deadline bites for many users
          (eid, user.toLong, rnd.nextLong(3L * dayMicros).abs, types(rnd.nextInt(types.length)))
        }
      }
      val refLevels: Map[Long, Long] = rows.groupBy(_._2).map { case (u, evs) =>
        var t1, t2, t3 = Option.empty[Long]
        evs.sortBy(e => (e._3, e._1)).foreach { case (_, _, ts, tpe) =>
          val (p1, p2) = (t1, t2) // pre-update snapshot, like the Column fold
          if (p1.isEmpty && tpe == "signup") t1 = Some(ts)
          if (t2.isEmpty && p1.nonEmpty && tpe == "click" &&
              ts > p1.get && ts <= p1.get + dayMicros) t2 = Some(ts)
          if (t3.isEmpty && p2.nonEmpty && tpe == "purchase" &&
              ts > p2.get && ts <= p1.get + dayMicros) t3 = Some(ts)
        }
        u -> (if (t3.nonEmpty) 3L else if (t2.nonEmpty) 2L else if (t1.nonEmpty) 1L else 0L)
      }
      val want = refLevels.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val df = rows.toDF("event_id", "user_id", "us", "event_type")
        .withColumn("ts", expr("timestamp_micros(us)"))
      val got = graft.ops.Relational.windowFunnelDf(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed $seed: got $got want $want")
    }
  }

  test("native Hash60 is bit-identical to the conv(substring(md5)) chain, incl. codegen") {
    // the native expression replaced the built-in chain in EVERY hashing hot
    // path; a single differing bit would silently break every dedup oracle
    val rnd = new scala.util.Random(11)
    val strs = Seq("", "a", "qmix:123", "sample:0", "日本語 テスト", "x" * 500) ++
      (0 until 300).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString +
        (if (rnd.nextBoolean()) " αβγ→" else ""))
    val df = strs.toDF("s")
    val cmp = df.select(
      graft.ops.Hashing.h60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("builtin"))
    assert(cmp.filter(col("native") =!= col("builtin")).count() == 0)
    // and the expression stays inside whole-stage codegen (hard failure mode)
    TestSpark.withCodegenOnly {
      assert(cmp.filter(col("native") =!= col("builtin")).count() == 0)
    }
    assert(cmp.filter(col("native") < 0).count() == 0, "h60 must be non-negative")
  }

  test("native dot/cosine are bit-identical to the higher-order chains, incl. codegen") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(80)
      (Seq.fill(n)(rnd.nextDouble() * 20 - 10), Seq.fill(n)(rnd.nextDouble() * 20 - 10))
    }
    val df = rows.toDF("a", "b")
    def oldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val cmp = df.select(
      graft.functions.VectorExprs.dot(col("a"), col("b")).as("nd"),
      oldDot(col("a"), col("b")).as("od"),
      graft.functions.VectorExprs.cosine(col("a"), col("b")).as("nc"),
      (oldDot(col("a"), col("b")) /
        sqrt(oldDot(col("a"), col("a")) * oldDot(col("b"), col("b")))).as("oc"))
    def check(): Unit = {
      // exact bit equality — no tolerance: the fusion must be IEEE-neutral
      assert(cmp.filter(col("nd") =!= col("od")).count() == 0)
      assert(cmp.filter(col("nc") =!= col("oc")).count() == 0)
    }
    check()
    TestSpark.withCodegenOnly { check() }
    // length mismatch yields null, matching the zip_with null-padding chain
    val mm = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(graft.functions.VectorExprs.dot(col("a"), col("b")).as("d"))
    assert(mm.filter(col("d").isNull).count() == 1)
    // a null ELEMENT yields null too — `aggregate` folds acc + null to null,
    // so a sparse array must not silently read the hole as 0.0
    val sparse = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](null, 2.0)))
      .toDF("a", "b")
    def sparseNulls() = sparse.select(
      graft.functions.VectorExprs.dot(col("a"), col("b")).as("d"),
      graft.functions.VectorExprs.cosine(col("a"), col("b")).as("c"))
      .filter(col("d").isNull && col("c").isNull).count()
    assert(sparseNulls() == 2)
    TestSpark.withCodegenOnly { assert(sparseNulls() == 2) }
  }

  test("native l2sq_micro is bit-identical to the floor(aggregate(zip_with)) chain, incl. codegen") {
    // the kernel of every PQ encode argmin / ADC / IVF routing — one
    // differing bit would shift a codeword id and fail the hash gate
    val rnd = new scala.util.Random(19)
    val rows = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(80)
      (Seq.fill(n)(rnd.nextDouble() * 4 - 2), Seq.fill(n)(rnd.nextDouble() * 4 - 2))
    }
    val df = rows.toDF("a", "b")
    def oldL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      floor(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, d) => acc + d) * 1e6).cast("long")
    val cmp = df.select(
      graft.functions.VectorExprs.l2sqMicro(col("a"), col("b")).as("nl"),
      oldL2(col("a"), col("b")).as("ol"))
    def check(): Unit =
      assert(cmp.filter(col("nl") =!= col("ol")).count() == 0)
    check()
    TestSpark.withCodegenOnly { check() }
    // length mismatch and null elements yield null, matching the chain
    val edge = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
      .select(graft.functions.VectorExprs.l2sqMicro(col("a"), col("b")).as("l"))
    assert(edge.filter(col("l").isNull).count() == 2)
    // the encode argmin rewrite: array_min over (d, cid) structs IS the
    // ascending sort's head — pinned on ties (equal d, distinct cid)
    val tie = Seq(Tuple1(Seq((5L, 2), (3L, 7), (3L, 4), (9L, 0)))).toDF("xs")
      .select(
        array_min(col("xs")).as("mn"),
        element_at(array_sort(col("xs")), 1).as("hd"))
    assert(tie.filter(col("mn") =!= col("hd")).count() == 0)
  }

  test("native vec_div_scalar / vec_sub are bit-identical to their HOF chains, incl. codegen") {
    // the normalize head of every PQ/IVF/OPQ serve and the residual
    // subtract — one differing bit shifts a codeword id downstream
    val rnd = new scala.util.Random(23)
    val rows = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(80)
      (Seq.fill(n)(rnd.nextDouble() * 4 - 2), Seq.fill(n)(rnd.nextDouble() * 4 - 2),
        rnd.nextDouble() * 3 + 0.1)
    }
    val df = rows.toDF("a", "b", "s")
    val cmp = df.select(
      graft.functions.VectorExprs.divScalar(col("a"), col("s")).as("nd"),
      transform(col("a"), x => x / col("s")).as("od"),
      graft.functions.VectorExprs.sub(col("a"), col("b")).as("ns"),
      zip_with(col("a"), col("b"), (x, c) => x - c).as("os"))
    def check(): Unit = {
      assert(cmp.filter(not(col("nd") === col("od"))).count() == 0)
      assert(cmp.filter(not(col("ns") === col("os"))).count() == 0)
    }
    check()
    TestSpark.withCodegenOnly { check() }
    // null algebra pinned against the chains themselves: null scalar ⇒ array
    // of null elements (NOT a null array); null element stays null; length
    // mismatch null-pads the shorter side (zip_with)
    val edge = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0),
        null: java.lang.Double),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](4.0, 5.0, 6.0),
        java.lang.Double.valueOf(2.0)))
      .toDF("a", "b", "s")
    val ecmp = edge.select(
      graft.functions.VectorExprs.divScalar(col("a"), col("s")).as("nd"),
      transform(col("a"), x => x / col("s")).as("od"),
      graft.functions.VectorExprs.sub(col("a"), col("b")).as("ns"),
      zip_with(col("a"), col("b"), (x, c) => x - c).as("os"))
    // <=> : null-safe top-level compare; inner nulls compare by ordering,
    // so arrays with matching null slots read equal
    def echeck(): Unit =
      assert(ecmp.filter(not(col("nd") <=> col("od")) ||
          not(col("ns") <=> col("os"))).count() == 0,
        ecmp.collect().mkString("; "))
    echeck()
    TestSpark.withCodegenOnly { echeck() }
  }

  test("native word_bigrams is element-identical to the zip_with chain, incl. codegen") {
    val rnd = new scala.util.Random(17)
    val words = Seq("a", "bb", "ccc", "", "αβ", "日本", "x-y", "z'z")
    val strs = Seq("", " ", "  ", "a", "a b", "a  b", " a b ", "a b c d") ++
      (0 until 300).map(_ => (0 until rnd.nextInt(12))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val df = strs.toDF("s")
    def oldForm(c: org.apache.spark.sql.Column) = {
      val t = split(c, " ")
      val n = size(t)
      zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b))
    }
    val cmp = df.select(
      graft.functions.WordBigramsKernel.bigrams(col("s")).as("nb"),
      oldForm(col("s")).as("ob"))
    def check(): Unit =
      assert(cmp.filter(not(col("nb") === col("ob"))).count() == 0,
        cmp.filter(not(col("nb") === col("ob"))).collect().take(3).mkString("; "))
    check()
    TestSpark.withCodegenOnly { check() }
  }

  test("zValue interleave is a bijection on the quantized grid") {
    val bits = 8
    val rnd = new scala.util.Random(7)
    val pairs = (Seq((0L, 0L), (255L, 255L), (0L, 255L), (255L, 0L)) ++
      (0 until 500).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))).distinct
    val got = pairs.toDF("a", "b")
      .withColumn("z", graft.sources.Layout.zValue(col("a"), col("b"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z >= 0 && z < (1L << (2 * bits)))
      // de-interleave recovers both inputs exactly
      val da = (0 until bits).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val db = (0 until bits).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(da == a && db == b, s"($a,$b) -> $z -> ($da,$db)")
    }
    assert(got.map(_._3).distinct.length == pairs.length, "z values must be distinct")
  }

  test("winnowing: a shared run of >= w+k-1 words guarantees a shared fingerprint") {
    // the SIGMOD 2003 detection guarantee, exercised on random corpora: two
    // documents with independent random words around a common (w+k-1)-word
    // run MUST select at least one common fingerprint VALUE (positions may
    // differ — the guarantee is position-independent)
    val word = Gen.choose(0, 49).map(i => s"w$i")
    val words = (n: Int) => Gen.listOfN(n, word)
    val gen = for {
      runLen <- Gen.choose(6, 10) // w + k - 1 = 6 with defaults (k=3, w=4)
      run    <- words(runLen)
      pre1   <- Gen.choose(0, 8).flatMap(words)
      suf1   <- Gen.choose(0, 8).flatMap(words)
      pre2   <- Gen.choose(0, 8).flatMap(words)
      suf2   <- Gen.choose(0, 8).flatMap(words)
    } yield (
      (pre1 ++ run ++ suf1).mkString(" "),
      (pre2 ++ run ++ suf2).mkString(" "))
    check(Prop.forAll(gen) { case (a, b) =>
      val rows = graft.ops.TextStats.winnowingDf(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text")).collect()
      val f1 = rows.filter(_.getLong(0) == 1L).map(_.getLong(2)).toSet
      val f2 = rows.filter(_.getLong(0) == 2L).map(_.getLong(2)).toSet
      f1.intersect(f2).nonEmpty
    })
  }

  test("isSafeIdent: accepts exactly dot-joined ASCII identifier segments") {
    import graft.streaming.JdbcFeed.isSafeIdent
    assert(isSafeIdent("events") && isSafeIdent("app.events") && isSafeIdent("_x.y_2"))
    for (bad <- Seq("", ".", "a.", ".a", "a..b", "a b", "a;b", "a'b", "1abc", "a.1b", "evénts"))
      assert(!isSafeIdent(bad), s"must reject '$bad'")
  }
}
