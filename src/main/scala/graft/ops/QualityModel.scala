package graft.ops

import graft.Tables
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the learn-then-deploy loop of the
  * fastText/FineWeb-edu pattern (Joulin et al. 2016; FineWeb's edu
  * classifier): cheap engineered features into a linear model, trained on
  * labels PRODUCED ELSEWHERE (human raters, an LLM judge, a hand rule —
  * here [[TextStats.qualityLogit]]'s keep decision stands in as the
  * deterministic label source so the spec can pin exact recovery), then
  * DISTILLED to integer weights and deployed as the bit-exact one-pass
  * scoring shape qualityLogit already proves cross-engine.
  *
  * Why engineered features and not bag-of-words: measured on this corpus,
  * L1-normalized hashed bag-of-words tops out near the majority class
  * (~68% holdout) for a rule defined on document STATISTICS — token
  * diversity, stopword density, length — because those are nearly
  * orthogonal to which words appear. The four features the rule actually
  * reads recover it exactly (holdout 1.0, and the learned weight ratios
  * reproduce the rule's 1 : 3 : 0.8 : −0.04). `QualityModelSpec` pins the
  * honest negative next to the positive.
  *
  * Shape at 100 TB: training is driver-coordinated L-BFGS over a SAMPLE
  * (fastText-class models train on 10⁴–10⁶ rows); featurization and
  * scoring are narrow per-row passes over the full corpus — and the
  * DISTILLED deployment drops MLlib entirely: four integer multiplies per
  * row, bit-exact in any engine, rankable and thresholdable with no libm.
  */
object QualityModel {

  final val FeatureCols: Array[String] = Array("ttr", "stp", "len_cap", "mlen_dev")

  case class Trained(model: LogisticRegressionModel)

  /** Integer deployment form: `keep ⇔ bias + Σ wᵢ·xᵢ > 0` (positive
    * scaling preserves the logistic decision, so integers lose nothing
    * but sub-ulp boundary cases — measured in the spec).
    */
  case class Distilled(weights: Array[Long], bias: Long)

  /** The PUBLISHED model — `train ∘ distill` run once on the sf0.01
    * fixture (round 10) and frozen as constants, the way a fastText
    * `.bin` or the FineWeb-edu classifier checkpoint ships: training is
    * an offline event, the artifact is data. This is what makes the
    * trained path oracle-gateable (`ops_quality_distilled`): the QUERY's
    * contract is "score exactly per the published weights" — integer
    * arithmetic DuckDB replicates literally — while `QualityModelSpec`
    * separately proves the TRAINING still produces weights of this shape
    * on the current fixture (ratio pins), so a regenerated fixture can
    * never invalidate the published artifact's determinism, only date it.
    * Weight ratios vs the labeling rule's 1 : 3 : 0.8 : −0.04 — here
    * 0.333 : 1 : 0.275 : −0.0174 ≡ 1 : 3.0 : 0.825 : −0.052 (the mlen
    * weight runs slightly hot: the fit trades it against the correlated
    * length cap, the usual collinearity wobble of a linear fit).
    */
  val Published: Distilled =
    Distilled(Array(333382L, 1000000L, 275039L, -17393L), -200518862L)

  /** The four engineered per-mille features as EXACT integers, one narrow
    * pass, carrying through the caller's `keep` columns — the shared
    * featurizer behind training ([[features]]), scoring
    * ([[scoreDistilled]]), and in-row gating ([[gateDocs]]): one body, so
    * a featurizer tweak can never de-couple the model from its gate.
    */
  private def intFeatures(docs: DataFrame, keep: Seq[String]): DataFrame = {
    val en = TextStats.markers.filter(_._1 == "en").map(_._2)
    val toks = split(lower(col("text")), " ")
    docs.select(keep.map(col) ++ Seq(
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_types"),
        size(filter(toks, t => t.isin(en: _*))).cast("long").as("n_stop"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("tok_chars")): _*)
      .select(keep.map(col) ++ Seq(
        expr("n_types * 1000 div n_tokens").as("ttr"),
        expr("n_stop * 1000 div n_tokens").as("stp"),
        least(col("n_tokens"), lit(500L)).as("len_cap"),
        abs(expr("tok_chars * 1000 div n_tokens") - 4500L).as("mlen_dev")): _*)
  }

  /** A distilled model's integer z-score over [[intFeatures]] columns. */
  private def zOf(d: Distilled): org.apache.spark.sql.Column =
    FeatureCols.zip(d.weights).map { case (c, w) =>
      col(c).cast("long") * lit(w)
    }.reduce(_ + _) + lit(d.bias)

  /** The four engineered per-mille features, one narrow pass — the same
    * integer statistics [[TextStats.qualityLogit]] scores (doubles here
    * only because MLlib vectors are doubles; values are integral).
    */
  def features(docs: DataFrame): DataFrame = {
    val f = intFeatures(docs, Seq("doc_id"))
      .select(col("doc_id"),
        col("ttr").cast("double").as("ttr"),
        col("stp").cast("double").as("stp"),
        col("len_cap").cast("double").as("len_cap"),
        col("mlen_dev").cast("double").as("mlen_dev"))
    new VectorAssembler().setInputCols(FeatureCols).setOutputCol("features")
      .transform(f)
  }

  /** IN-ROW quality gate at a chosen threshold, keeping the document
    * columns — the composition form ([[Curation.trainPrepMeasured]]):
    * the gate rides the one corpus scan, no join back to a scored frame.
    * Same integers as [[scoreDistilled]] by construction (one featurizer,
    * one z expression).
    */
  def gateDocs(d: Distilled, docs: DataFrame, threshold: Long): DataFrame =
    intFeatures(docs, Seq("doc_id", "lang", "text"))
      .filter(zOf(d) > threshold)
      .select(col("doc_id"), col("lang"), col("text"))

  /** Train on `labels` = (doc_id, label ∈ {0.0, 1.0}) over the
    * `doc_id % 5 != holdoutResidue` slice. Reproducible up to float
    * tolerance, not bit-exactly: no RNG in the split, but MLlib's
    * treeAggregate gradient sums are partitioning-dependent floating
    * point, so re-fits on differently-partitioned (but identical) data
    * agree only to within L-BFGS convergence tolerance — the spec pins
    * weight RATIOS, and [[Published]] is a frozen artifact, not a value
    * any re-run is expected to regenerate bit-for-bit.
    */
  def train(spark: SparkSession, sfDir: String, labels: DataFrame,
            holdoutResidue: Int = 0): Trained = {
    val data = features(Tables.load(spark, sfDir, "documents"))
      .join(labels, "doc_id")
      .filter(col("doc_id") % 5 =!= holdoutResidue)
    val lr = new LogisticRegression()
      .setMaxIter(200).setRegParam(0.0)
      .setLabelCol("label").setFeaturesCol("features")
    Trained(lr.fit(data))
  }

  /** Labels from the hand rule — the stand-in label source. A real
    * pipeline passes its own (doc_id, label) frame to [[train]].
    */
  def ruleLabels(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.qualityLogit(spark, sfDir)
      .select(col("doc_id"), col("keep").cast("double").as("label"))

  /** Distributed float scoring pass: (doc_id, prediction). */
  def predict(t: Trained, spark: SparkSession, sfDir: String): DataFrame =
    t.model.transform(features(Tables.load(spark, sfDir, "documents")))
      .select(col("doc_id"), col("prediction"))

  /** Round the learned float weights to the integer deployment form,
    * scaled so the largest weight carries `precision` digits — the
    * decision is invariant under the (positive) scale, so only sub-ulp
    * boundary docs can flip.
    */
  def distill(t: Trained, precision: Long = 1000000L): Distilled = {
    val c = t.model.coefficients.toArray
    val s = precision.toDouble / c.map(math.abs).max
    Distilled(c.map(w => math.round(w * s)), math.round(t.model.intercept * s))
  }

  /** The distilled model's scoring pass: pure integer arithmetic over the
    * same features — [[TextStats.qualityLogit]]'s deployment shape with
    * LEARNED weights. (doc_id, z_int, keep).
    */
  def scoreDistilled(d: Distilled, spark: SparkSession, sfDir: String): DataFrame = {
    val z = zOf(d)
    intFeatures(Tables.load(spark, sfDir, "documents"), Seq("doc_id"))
      .select(col("doc_id"), z.as("z_int"), (z > 0L).as("keep"))
  }
}
