package graft

import graft.functions.KMinValues
import org.apache.spark.sql.functions._

class KMinValuesSpec extends SparkSuite {
  import spark.implicits._

  private val K = 256
  private def kmv = KMinValues.sketch(K)

  /** Brute-force ground truth: the k smallest distinct sign-flipped values. */
  private def bruteBottomK(hashes: Seq[Long], k: Int): Array[Long] =
    hashes.map(_ ^ Long.MinValue).distinct.sorted.take(k).toArray

  private def hashesOf(ids: Seq[Long]): Seq[Long] = {
    val df = ids.toDF("id").select(xxhash64(col("id")).as("h"))
    df.as[Long].collect().toSeq
  }

  test("sketch content equals brute-force bottom-k distinct, duplicates ignored") {
    val ids = (0L until 5000L) ++ (0L until 1000L) // heavy duplication
    val df = ids.toDF("id").select(xxhash64(col("id")).as("h"))
    val sk = df.agg(kmv(col("h"))).as[Array[Long]].head()
    assert(sk.toSeq == bruteBottomK(hashesOf((0L until 5000L)), K).toSeq,
      "sketch must be exactly the k smallest distinct flipped hashes")
  }

  test("merge-invariance: any repartitioning yields the identical sketch") {
    val df = (0L until 20000L).toDF("id").select(xxhash64(col("id")).as("h"))
    val sketches = Seq(1, 7, 32).map(n =>
      df.repartition(n).agg(kmv(col("h"))).as[Array[Long]].head().toSeq)
    assert(sketches.distinct.size == 1,
      "KMV is a set function — partitioning must not change it")
  }

  test("exact regime: n <= k makes every estimate exact") {
    val a = hashesOf(0L until 150L)
    val b = hashesOf(100L until 250L)
    val agg = new KMinValues.Sketch(K)
    val skA = a.foldLeft(agg.zero)(agg.reduce)
    val skB = b.foldLeft(agg.zero)(agg.reduce)
    assert(KMinValues.estimateDistinct(skA, K) == 150.0)
    val (u, i) = KMinValues.estimateOverlap(skA, skB, K)
    assert(u == 250.0 && i == 50.0, s"exact regime broke: union=$u inter=$i")
  }

  test("estimation regime at 40x k: cardinality and theta-cut overlap within 5 sigma") {
    // planted truth: |A| = 30000, |B| = 30000, |A∩B| = 15000, |A∪B| = 45000
    val a = hashesOf(0L until 30000L)
    val b = hashesOf(15000L until 45000L)
    val agg = new KMinValues.Sketch(K)
    def build(h: Seq[Long]) = h.grouped(1000).map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge) // exercise the merge path while building
    val (skA, skB) = (build(a), build(b))
    val tol = 5.0 / math.sqrt((K - 2).toDouble)
    val estA = KMinValues.estimateDistinct(skA, K)
    assert(math.abs(estA - 30000) <= tol * 30000, s"|A| est $estA")
    val (estU, estI) = KMinValues.estimateOverlap(skA, skB, K)
    assert(math.abs(estU - 45000) <= tol * 45000, s"|A∪B| est $estU")
    val rho = 15000.0 / 45000.0
    val tolI = 5.0 * math.sqrt(rho * (1 - rho) / K) * 45000 + tol * 15000
    assert(math.abs(estI - 15000) <= tolI, s"|A∩B| est $estI (tol $tolI)")
  }

  test("ops_kmv_overlap query: exact columns + bound verdict on the fixture") {
    val out = graft.ops.TextStats.kmvDumpOverlap(spark, sf).collect().head
    // mod-3 dump split over 500 all-distinct texts: residue counts are
    // |{0,1}| and |{1,2}| thirds with residue 1 shared
    val n = Tables.load(spark, sf, "documents").count()
    val perRes = (0 to 2).map(r => Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 3 === r).count())
    assert(out.getLong(0) == perRes(0) + perRes(1), "exact_a")
    assert(out.getLong(1) == perRes(1) + perRes(2), "exact_b")
    assert(out.getLong(2) == perRes(1), "exact_inter")
    assert(out.getBoolean(3), "within_bounds must hold")
    assert(n == perRes.sum)
  }
}
