package graft

import graft.ops.{PqModel, Similarity}
import org.apache.spark.sql.functions._

/** The published PQ artifact's contracts: bit-for-bit retraining
  * reproducibility, strict distortion improvement over the sampled init it
  * started from (Lloyd descends monotonically — a literal truth on the
  * training corpus, not a statistical hope), and the deployed query's
  * recall floor.
  */
class PqModelSpec extends SparkSuite {

  private val trainDir = "/root/testdata/sf0.01" // the corpus PqTrain ran on

  private def normalizedVecs: Array[Array[Double]] =
    Tables.load(spark, trainDir, "embeddings")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .orderBy("vec_id").collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }

  test("retraining on the committed corpus reproduces the artifact bit-for-bit") {
    val re = PqTrain.train(normalizedVecs, PqModel.M, PqModel.Ksub, 5)
    assert(re.length == PqModel.M)
    (0 until PqModel.M).foreach { mi =>
      (0 until PqModel.Ksub).foreach { cid =>
        assert(re(mi)(cid).sameElements(PqModel.Micros(mi)(cid)),
          s"codeword ($mi, $cid) drifted — PqModel.scala is stale or training is nondeterministic")
      }
    }
  }

  test("distributed twin: bit-for-bit train() on 1/7/31-part layouts, == committed artifact") {
    import spark.implicits._
    val ds = Tables.load(spark, trainDir, "embeddings")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val n = math.sqrt(v.map(x => x * x).sum); (id, v.map(_ / n))
      }
    val want = PqTrain.train(normalizedVecs, PqModel.M, PqModel.Ksub, 5)
    Seq(1, 7, 31).foreach { parts =>
      val got = PqTrain.trainDistributed(ds.repartition(parts),
        PqModel.M, PqModel.Ksub, 5)
      (0 until PqModel.M).foreach { mi =>
        (0 until PqModel.Ksub).foreach { cid =>
          assert(got(mi)(cid).sameElements(want(mi)(cid)),
            s"($mi, $cid) differs from the driver loop at $parts partitions — " +
              "the exact-sum recurrence leaked an order dependence")
          assert(got(mi)(cid).sameElements(PqModel.Micros(mi)(cid)),
            s"($mi, $cid) differs from the committed artifact at $parts partitions")
        }
      }
    }
  }

  test("distributed twin refuses a corpus slice missing the seed ids") {
    import spark.implicits._
    val ds = Tables.load(spark, trainDir, "embeddings")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .filter(_._1 >= 3L) // drops seeds 0..2 — a sliced corpus, not a gap bug
    val e = intercept[IllegalArgumentException] {
      PqTrain.trainDistributed(ds, PqModel.M, PqModel.Ksub, 1)
    }
    assert(e.getMessage.contains("sampled init"),
      s"wrong failure shape: ${e.getMessage}")
  }

  test("trained codebooks strictly beat the sampled init on total distortion") {
    val vecs = normalizedVecs
    val sub = PqModel.Sub
    def distortion(books: Array[Array[Array[Double]]]): Double =
      vecs.map { v =>
        (0 until PqModel.M).map { mi =>
          val s = v.slice(mi * sub, mi * sub + sub)
          books(mi).map(c =>
            s.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum).min
        }.sum
      }.sum
    val sampled = (0 until PqModel.M).map { mi =>
      (0 until PqModel.Ksub).map(cid =>
        vecs(cid).slice(mi * sub, mi * sub + sub)).toArray
    }.toArray
    val trained = PqModel.Micros.map(_.map(_.map(_ / 1e6)))
    val (ds, dt) = (distortion(sampled), distortion(trained))
    assert(dt < ds,
      s"trained distortion $dt not below sampled init $ds — training did nothing")
  }

  test("ops_sim_pq_trained: sorted/bounded output with the recall floor") {
    val pq = SparkEntry.queries("ops_sim_pq_trained")(spark, sf).collect()
    assert(pq.length == 10)
    val sims = pq.map(_.getAs[Double]("cos_sim"))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(!pq.map(_.getAs[Long]("vec_id")).contains(0L))
    val exact = SparkEntry.queries("ops_sim_topk")(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val hit = pq.map(_.getAs[Long]("vec_id")).count(exact)
    assert(hit >= 8, s"trained-PQ recall@10 collapsed: $hit/10")
  }
}
