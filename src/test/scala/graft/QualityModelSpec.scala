package graft

import graft.ops.{QualityModel, TextStats}
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSuite {

  test("trained quality classifier recovers the labeling rule; distilled integers deploy it") {
    val labels = QualityModel.ruleLabels(spark, sf)
    val t = QualityModel.train(spark, sf, labels)
    val preds = QualityModel.predict(t, spark, sf).join(labels, "doc_id").cache()

    // exact recovery on the held-out slice: the rule is linear in the
    // four features, so a clean fit generalizes perfectly (measured 1.0;
    // floored at 0.98 against future fixture regeneration)
    val hold = preds.filter(col("doc_id") % 5 === 0)
      .agg(avg(when(col("label") === col("prediction"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(hold >= 0.98, s"holdout accuracy $hold")

    // the learned weights are the RULE's weights up to scale: ratios to
    // the first coefficient reproduce 1 : 3 : 0.8 : -0.04
    val c = t.model.coefficients.toArray
    val ratios = c.map(_ / c(0))
    val want = Array(1.0, 3.0, 0.8, -0.04)
    ratios.zip(want).foreach { case (r, w) =>
      assert(math.abs(r - w) <= 0.25 * math.abs(w) + 0.01,
        s"weight ratios off: ${ratios.mkString(",")}")
    }

    // distillation: integer weights reproduce the float decisions (the
    // deployment path is TextStats.qualityLogit's bit-exact shape)
    val d = QualityModel.distill(t)
    val agree = QualityModel.scoreDistilled(d, spark, sf)
      .join(preds, "doc_id")
      .agg(avg(when(col("keep") === (col("prediction") > 0.5), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(agree >= 0.99, s"distilled agreement $agree")

    // determinism: no RNG anywhere — retraining reproduces every decision
    val preds2 = QualityModel.predict(QualityModel.train(spark, sf, labels), spark, sf)
    assert(preds.select("doc_id", "prediction").exceptAll(preds2).isEmpty,
      "retraining on identical data changed predictions")
    preds.unpersist()
  }

  test("honest negative: bag-of-words features cannot see document statistics") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.{HashingTF, Normalizer}
    val labels = QualityModel.ruleLabels(spark, sf)
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("words"))
      .join(labels, "doc_id")
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf")
      .setNumFeatures(4096).transform(docs)
    val feats = new Normalizer().setInputCol("tf").setOutputCol("features")
      .setP(1.0).transform(tf)
    val m = new LogisticRegression().setMaxIter(200).setRegParam(0.0)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(feats.filter(col("doc_id") % 5 =!= 0))
    val hold = m.transform(feats.filter(col("doc_id") % 5 === 0))
      .agg(avg(when(col("label") === col("prediction"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    // a rule over token diversity/density/length is near-orthogonal to
    // WHICH words appear: holdout sits near the majority class (~0.68
    // measured vs 0.75 keep share), far from the engineered features'
    // 1.0 — the measured reason QualityModel.features exists
    assert(hold <= 0.9, s"bag-of-words unexpectedly recovered the rule: $hold")
  }
}
