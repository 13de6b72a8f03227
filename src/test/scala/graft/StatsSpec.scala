package graft

import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-5 statistics operators (Gini, KS,
  * seasonal decomposition, chi-square cells, containment, skip-gram PMI,
  * BM25). The DuckDB hash-equivalence is the driver's gate; these pin the
  * properties the statistics must satisfy BY CONSTRUCTION, so a refactor
  * that keeps the oracle in lockstep but breaks the math still fails fast.
  */
class StatsSpec extends SparkSuite {

  test("ops_gini: coefficient in [0, 1) micro-units; region census complete") {
    val rows = SparkEntry.queries("ops_gini")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_micro")
      assert(g >= 0L && g < 1000000L, s"${r.getString(0)}: gini $g out of range")
    }
    // every customer with >= 1 order is counted exactly once across regions
    val totalCustomers = Tables.load(spark, sf, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == totalCustomers)
  }

  test("ops_ks_test: D is a valid rational statistic") {
    val r = SparkEntry.queries("ops_ks_test")(spark, sf).collect()
    assert(r.length == 1)
    val (n1, n2) = (r(0).getAs[Long]("n1"), r(0).getAs[Long]("n2"))
    val dNum = r(0).getAs[Long]("d_num")
    val dMicro = r(0).getAs[Long]("d_micro")
    assert(n1 > 0 && n2 > 0)
    assert(dNum > 0 && dNum <= n1 * n2, "0 < D <= 1 as a fraction of n1*n2")
    assert(dMicro == dNum * 1000000L / (n1 * n2))
  }

  test("ops_seasonal: residual identity holds; profile constant per hour") {
    val out = SparkEntry.queries("ops_seasonal")(spark, sf)
    val badIdentity = out
      .filter(col("residual_milli") =!= col("cnt") * 1000 - col("seasonal_milli"))
      .count()
    assert(badIdentity == 0)
    // one seasonal value per hour-of-day, whatever the day
    val perHod = out.groupBy(col("hod"))
      .agg(countDistinct(col("seasonal_milli")).as("nvals"))
      .filter(col("nvals") =!= 1).count()
    assert(perHod == 0)
  }

  test("ops_chi2: margins reconcile; zero cells iff o*N == r*c") {
    val rows = SparkEntry.queries("ops_chi2")(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("o")).sum
    assert(n == Tables.load(spark, sf, "events").count())
    // expected counts per event_type sum back to the row margin within
    // per-cell truncation (integer div drops < 1 micro-unit per cell)
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val r = cells.map(_.getAs[Long]("o")).sum
      val expSum = cells.map(_.getAs[Long]("exp_micro")).sum
      assert(math.abs(expSum - r * 1000000L) <= cells.length,
        s"row-margin drift beyond truncation: $expSum vs ${r * 1000000L}")
    }
    rows.foreach(r => assert(r.getAs[Long]("chi2_micro") >= 0L))
  }

  test("ops_containment: ratios in (0,1]; threshold respected; asymmetry real") {
    val rows = SparkEntry.queries("ops_containment")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ca, cb) = (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"))
      assert(ca > 0 && ca <= 1.0 && cb > 0 && cb <= 1.0)
      assert(math.max(ca, cb) >= 0.5 - 1e-9)
    }
  }

  test("ops_skipgram_pmi: counts consistent; output ranked") {
    val rows = SparkEntry.queries("ops_skipgram_pmi")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cxy, cx, cy) = (r.getAs[Long]("cxy"), r.getAs[Long]("cx"), r.getAs[Long]("cy"))
      assert(cxy >= 5, "min-count floor")
      // each x occurrence emits at most `window` pairs, each y occurrence
      // absorbs at most `window` — cxy is bounded by both
      assert(cxy <= 2 * math.min(cx, cy), s"pair count $cxy exceeds 2*min($cx,$cy)")
    }
    val scores = rows.map(_.getAs[Long]("pmi_ratio_milli"))
    assert(scores.sameElements(scores.sorted.reverse), "descending by ratio")
  }

  test("ops_autocorr: one row per lag, coefficients bounded, pair counts shrink") {
    val rows = SparkEntry.queries("ops_autocorr")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (1L to 7L))
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9, s"lag ${r.getLong(0)}: acf $acf")
    }
    // lag k has exactly (n_days - k) pairs
    val ns = rows.sortBy(_.getAs[Long]("lag")).map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b == a - 1 })
  }

  test("ops_cusum: statistic matches a driver-side replay of the series") {
    val r = SparkEntry.queries("ops_cusum")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    // replay: daily counts -> n-scaled centered cumsum -> argmax
    val daily = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("day")).collect()
    val n = daily.length.toLong
    val t = daily.map(_.getAs[Long]("x")).sum
    var cum = 0L; var best = 0L; var bestDay: java.sql.Timestamp = null
    daily.zipWithIndex.foreach { case (d, i) =>
      cum += d.getAs[Long]("x")
      val s = math.abs(n * cum - (i + 1) * t)
      if (s > best) { best = s; bestDay = d.getAs[java.sql.Timestamp]("day") }
    }
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("total_events") == t)
    assert(math.abs(row.getAs[Long]("s_scaled")) == best)
    assert(row.getAs[java.sql.Timestamp]("change_day") == bestDay)
  }

  test("ops_entropy: bounded by ln(n_types); types never exceed tokens") {
    val rows = SparkEntry.queries("ops_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"))
      val h = r.getAs[Double]("entropy")
      assert(nTyp <= nTok)
      assert(h >= -1e-9, s"doc ${r.getLong(0)}: negative entropy $h")
      // 1e-6 slack: the output is rounded to 6 dp, so a uniform-distribution
      // doc can sit up to half an ulp-of-rounding above the exact bound
      assert(h <= math.log(nTyp.toDouble) + 1e-6,
        s"doc ${r.getLong(0)}: entropy $h exceeds ln($nTyp)")
    }
  }

  test("ops_bm25: ranked; every hit contains a query term; n_terms bounded") {
    val out = SparkEntry.queries("ops_bm25")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Long]("score_micro"))
    assert(scores.sameElements(scores.sorted.reverse))
    rows.foreach(r => assert(r.getAs[Long]("n_terms") >= 1 && r.getAs[Long]("n_terms") <= 3))
    val docs = Tables.load(spark, sf, "documents")
    val nonMatching = out.join(docs, "doc_id")
      .filter(!col("text").contains("join") && !col("text").contains("filter") &&
              !col("text").contains("stream"))
      .count()
    assert(nonMatching == 0)
  }

  test("ops_embed_gram: PSD, symmetric-complete, and the driver-side PCA half closes the loop") {
    import breeze.linalg.{DenseMatrix, eigSym}
    val d = graft.ops.Similarity.Dim
    val rows = SparkEntry.queries("ops_embed_gram")(spark, sf).collect()
    assert(rows.length == d * (d + 1) / 2, "upper triangle incomplete")
    val g = DenseMatrix.zeros[Double](d, d)
    rows.foreach { r =>
      val (i, j, s) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toDouble)
      g(i, j) = s; g(j, i) = s
    }
    // the exact-integer Gram of real vectors is PSD; doubles add only fp noise
    val es = eigSym(g)
    val evs = es.eigenvalues.toArray
    assert(evs.min >= -1e-6 * evs.max, s"not PSD: min eig ${evs.min}")
    // spectral reconstruction: V diag(l) V^T must reproduce the matrix —
    // this is the projection math a PCA consumer would broadcast
    val recon = es.eigenvectors * breeze.linalg.diag(es.eigenvalues) * es.eigenvectors.t
    val maxErr = breeze.linalg.max(breeze.numerics.abs(recon - g))
    assert(maxErr < 1e-6 * evs.max, s"spectral reconstruction off by $maxErr")
    // trace identity ties the distributed sum to the spectrum
    val trace = (0 until d).map(i => g(i, i)).sum
    assert(math.abs(trace - evs.sum) < 1e-6 * trace.max(1.0))
  }
}
