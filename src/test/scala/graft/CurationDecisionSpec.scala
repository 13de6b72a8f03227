package graft

import graft.ops.Curation

/** The curation measure→decide steps ([[Curation.qualityCurve]] /
  * [[Curation.qualityChoose]] / [[Curation.mixSolve]]) — the `ivfChoose`
  * discipline applied to quality gating and mix assembly. The VALUES are
  * hash-gated (DuckDB oracles); these pins cover the decision contracts:
  * monotonicity, the strictest-eligible-gate choice, loud unreachable
  * targets, and the water-filling invariants.
  */
class CurationDecisionSpec extends SparkSuite {

  test("qualityCurve: yield is non-increasing in the threshold; totals constant") {
    val rows = Curation.qualityCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.length == Curation.QualityGrid.length)
    assert(rows.map(_._3).distinct.length == 1, "n_total varied across grid rows")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"kept count rose with a stricter threshold: $a -> $b")
    }
  }

  test("qualityChoose: the HIGHEST threshold meeting the floor; unreachable fails loudly") {
    val row = Curation.qualityChoose(spark, sf, yieldTargetPermille = 500L)
      .collect().head
    val curve = Curation.qualityCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val expect = curve.filter(_._2 >= 500L).map(_._1).max
    assert(row.getLong(0) == expect,
      s"chose ${row.getLong(0)}, strictest eligible is $expect")
    assert(row.getLong(3) >= 500L)
    // a stricter threshold than the chosen one must be under the floor
    curve.filter(_._1 > expect).foreach { case (t, y) =>
      assert(y < 500L, s"threshold $t also met the floor but was not chosen")
    }
    // a grid of only impossibly strict gates cannot meet any floor
    val e = intercept[IllegalArgumentException](
      Curation.qualityChoose(spark, sf, yieldTargetPermille = 500L,
        grid = Seq(400000000L)).collect())
    assert(e.getMessage.contains("best:"), e.getMessage)
  }

  test("mixSolve: water-filling invariants — binding domain, rates <= 1000, proportions within floor error") {
    val rows = Curation.mixSolve(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.map(_._1).sorted.toSeq ==
      Curation.MixWeightsPermille.map(_._1).sorted)
    val feasible = rows.head._4
    assert(rows.forall(_._4 == feasible), "feasible_tokens differed per row")
    // epochs <= 1 everywhere: nobody is asked for more than their inventory
    rows.foreach { case (l, nt, _, _, take, rate, _) =>
      assert(take <= nt, s"$l asked for $take of $nt tokens (epochs > 1)")
      assert(rate >= 0L && rate <= 1000L, s"$l rate $rate out of range")
    }
    // at least one binding domain, and it is (one of) the minimum-cap rows —
    // its take is its whole inventory up to the two floor divisions
    val binding = rows.filter(_._7 == 1L)
    assert(binding.nonEmpty, "no binding domain")
    binding.foreach { case (l, nt, wp, _, take, _, _) =>
      assert(nt - take <= (nt / wp) + 1000L,
        s"binding domain $l leaves more than floor slack: take=$take of $nt")
    }
    // the realized mix matches the target weights up to floor error:
    // take_d = floor(w_d * feasible / 1000) exactly
    rows.foreach { case (l, _, wp, feas, take, _, _) =>
      assert(take == wp * feas / 1000L, s"$l take diverged from w*S/1000")
    }
  }

  test("trainPrepMeasured: adaptive mix — an absent target domain drops out instead of crashing the pipeline") {
    // standalone mixSolve REFUSES an absent domain (the strict decision
    // contract); the composed pipeline ADAPTS: cleaning may empty a
    // domain, and the water-fill over survivors realizes the target
    // renormalized among them
    val out = Curation.trainPrepMeasured(spark, sf,
        weights = Seq("en" -> 500L, "xx" -> 500L))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty, "pipeline emptied instead of adapting")
    assert(out.map(_._1).distinct.toSeq == Seq("en"),
      s"absent domain leaked into the manifest: ${out.map(_._1).distinct.toSeq}")
    // block manifest sanity: every bin's tokens within budget + one-doc
    // overshoot (first-fit-in-order packing's documented approximation);
    // sf0.001 docs are < 600 tokens so the slack bound is generous
    out.foreach { case (l, _, toks) =>
      assert(toks <= 2048L + 600L, s"bin overshot the budget+doc bound: $l $toks")
    }
  }

  test("mixSolve: a target domain with no inventory fails loudly; malformed weights refused") {
    // 'xx' has zero corpus inventory — the mix is infeasible at ANY size,
    // and reporting a mix that silently omits it would be wrong
    val e = intercept[IllegalArgumentException](
      Curation.mixSolve(spark, sf, weights = Seq(
        "en" -> 400L, "zh" -> 200L, "de" -> 150L, "fr" -> 150L,
        "es" -> 50L, "xx" -> 50L)).collect())
    assert(e.getMessage.contains("xx"), e.getMessage)
    // duplicates and non-permille sums are refused before any corpus work
    intercept[IllegalArgumentException](
      Curation.mixSolve(spark, sf, weights = Seq("en" -> 400L, "en" -> 600L)))
    intercept[IllegalArgumentException](
      Curation.mixSolve(spark, sf, weights = Seq("en" -> 400L, "zh" -> 100L)))
  }
}
