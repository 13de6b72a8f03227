package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bloom, BloomKernel}
import graft.ops.{BloomMembership, Relational}

/** Contract pins for the Bloom build/probe family and its two exact query
  * compositions. The load-bearing property is NO FALSE NEGATIVES — both
  * queries settle probe=false rows without verification, so a single false
  * negative is a wrong answer, not a performance blip.
  */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  test("agg is bit-identical to serial insert under any partitioning; no false negatives") {
    val keys = (0 until 10000).map(i => BloomKernel.mix(i.toLong * 2654435761L + 7L))
    val p = Bloom.forExpected(10000, 0.01)
    val serial = new Array[Long](p.numBits >>> 6)
    keys.foreach(k => BloomKernel.insert(serial, p.numHashes, k))
    for (parts <- Seq(1, 3, 8)) {
      val bits = keys.toDF("k").repartition(parts)
        .agg(Bloom.agg(p)(col("k"))).as[Array[Long]].head()
      assert(bits.sameElements(serial), s"merge drift at $parts partitions")
    }
    // the contract: every inserted key probes true, always
    assert(keys.forall(k => BloomKernel.mightContain(serial, p.numHashes, k)))
  }

  test("realized fpp respects the sizing ask (2x headroom over theory)") {
    val n = 1 << 15
    val p = Bloom.forExpected(n.toLong, 0.01)
    val bits = new Array[Long](p.numBits >>> 6)
    (0 until n).foreach(i => BloomKernel.insert(bits, p.numHashes, i.toLong))
    val fp = (n until 2 * n).count(i => BloomKernel.mightContain(bits, p.numHashes, i.toLong))
    val rate = fp.toDouble / n
    assert(rate <= 0.02, s"fpp $rate exceeds 2x the 1% ask")
  }

  test("oversized ask refuses loudly instead of silently clamping the fpp") {
    // 10^10 keys at 1% needs ~10^11 bits — a clamped 2^30-bit filter would
    // run at a fpp orders worse than asked; the sizing must refuse
    val e = intercept[IllegalArgumentException] {
      Bloom.forExpected(10_000_000_000L, 0.01)
    }
    assert(e.getMessage.contains("shard the key space"))
    // the largest representable ask still sizes (2^30 bits exactly)
    assert(Bloom.forExpected((1L << 30) / 2, 0.5).numBits <= (1 << 30))
  }

  test("empty build side: aggregator zero rides through and everything probes false") {
    val p = Bloom.forExpected(100, 0.01)
    val bits = spark.emptyDataset[Long].toDF("k")
      .agg(Bloom.agg(p)(col("k"))).as[Array[Long]].head()
    assert(bits.isEmpty)
    val probed = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue).toDF("k")
      .select(Bloom.mightContain(col("k"), bits, p).as("m")).as[Boolean].collect()
    assert(probed.forall(_ == false))
  }

  test("probe expression: forced codegen == kernel, inserted keys all true") {
    val p = Bloom.forExpected(1000, 0.01)
    val bits = new Array[Long](p.numBits >>> 6)
    val inserted = (0L until 3000L by 3).toArray
    inserted.foreach(k => BloomKernel.insert(bits, p.numHashes, k))
    val rows = TestSpark.withCodegenOnly {
      (0 until 3000).map(_.toLong).toDF("k")
        .select(col("k"), Bloom.mightContain(col("k"), bits, p).as("m"))
        .collect().toSeq
    }
    rows.foreach { r =>
      assert(r.getBoolean(1) == BloomKernel.mightContain(bits, p.numHashes, r.getLong(0)))
    }
    val got = rows.filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    assert(inserted.forall(got.contains), "codegen'd probe dropped an inserted key")
  }

  test("bloomPrune == the plain exact join it accelerates; the probe actually prunes") {
    val got = BloomMembership.bloomPrune(spark, sf)
      .orderBy("p_brand").collect().map(_.toSeq).toSeq
    val li = Tables.load(spark, sf, "lineitem")
    val dim = Tables.load(spark, sf, "part").filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_brand"))
    val expect = li.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        (sum(Relational.money(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - Relational.money(col("l_discount")))) * 10000)
          .cast("long").as("rev_bp"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand").collect().map(_.toSeq).toSeq
    assert(got == expect)

    // pruning sanity at data scale: the probe passes every matching row
    // (no false negatives) but not the whole table
    val p = Bloom.forExpected(dim.count(), 0.01)
    val bits = dim.agg(Bloom.agg(p)(col("p_partkey"))).as[Array[Long]].head()
    val total = li.count()
    val passed = li.filter(Bloom.mightContain(col("l_partkey"), bits, p)).count()
    val matching = li.join(dim, col("l_partkey") === col("p_partkey")).count()
    assert(passed >= matching, "probe dropped a matching fact row")
    assert(passed < total, "probe pruned nothing — sizing or hashing is off")
  }

  test("bloomNovel == the exact novelty recompute") {
    val got = BloomMembership.bloomNovel(spark, sf)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val sh = graft.ops.Dedup.shingles(Tables.load(spark, sf, "documents"))
    val corpus = sh.filter(col("doc_id") % 10 =!= 0).select(col("shingle")).distinct()
    val batch = sh.filter(col("doc_id") % 10 === 0)
    val novel = batch.join(corpus, Seq("shingle"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    val expect = batch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == expect)
    // non-degenerate on the fixture: both routes must carry rows
    assert(got.nonEmpty)
    assert(got.exists(r => r(2).asInstanceOf[Long] > 0L), "no novel shingles — fixture degenerate")
    assert(got.exists(r => r(2).asInstanceOf[Long] < r(1).asInstanceOf[Long]),
      "no seen shingles — the verify branch never ran")
  }
}
