package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** OFFLINE trainer for the published PQ codebooks ([[graft.ops.PqModel]]) —
  * the QualityModel pattern applied to ANN: learned float centroids never
  * cross engines, the distilled integer-micro codewords do. Per subspace,
  * plain Lloyd over the NORMALIZED subvectors: init = the sampled quantizer
  * (the first ksub vectors — the same init `pqTopK` serves with), argmin by
  * (L2, cid), empty clusters keep their centroid, fixed iteration count.
  * The fold here is driver-side and index-ordered so retraining on the same
  * corpus reproduces the artifact bit-for-bit; at a 100 TB training corpus
  * the same loop runs distributed (in-row argmin assignment +
  * [[graft.ops.Similarity.VectorMean]] partial-agg means) — what ships
  * either way is the frozen integer artifact, which is what the engines
  * compare on.
  *
  * Usage: `runMain graft.PqTrain [sfDir] [outFile]` — writes the
  * `graft.ops.PqModel` source (default /tmp/PqModel.scala); review and
  * commit it like any published model.
  */
object PqTrain {

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** The training loop, callable so `PqModelSpec` can re-derive the
    * committed artifact from the fixture and pin bit-for-bit
    * reproducibility. `vecs` must be NORMALIZED, in vec_id order.
    */
  def train(vecs: Array[Array[Double]], m: Int, ksub: Int,
            iters: Int): Array[Array[Array[Long]]] = {
    val sub = vecs.head.length / m
    val books: Array[Array[Array[Double]]] = (0 until m).map { mi =>
      val subs = vecs.map(_.slice(mi * sub, mi * sub + sub))
      var cents = (0 until ksub).map(subs(_)).toArray
      (0 until iters).foreach { _ =>
        val assign = subs.map { s =>
          var best = 0; var bd = l2(s, cents(0)); var c = 1
          while (c < ksub) { val d = l2(s, cents(c)); if (d < bd) { bd = d; best = c }; c += 1 }
          best
        }
        cents = (0 until ksub).map { c =>
          val members = subs.indices.filter(assign(_) == c)
          if (members.isEmpty) cents(c)
          else {
            val acc = new Array[Double](sub)
            members.foreach { i => var j = 0; while (j < sub) { acc(j) += subs(i)(j); j += 1 } }
            acc.map(_ / members.size)
          }
        }.toArray
      }
      cents
    }.toArray
    books.map(_.map(_.map(x => math.floor(x * 1e6).toLong)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/PqModel.scala")
    val (m, ksub, iters) = (8, 32, 5)
    val dim = graft.ops.Similarity.Dim
    val sub = dim / m

    val spark = SparkSession.builder()
      .master("local[4]").appName("pq-train")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // normalized vectors, driver-collected in vec_id order (the training
    // corpus is the bounded published-model fixture; the distributed twin
    // of this loop is assignment + VectorMean at corpus scale)
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), graft.ops.Similarity.toDouble(col("embedding")).as("v"))
      .orderBy("vec_id").collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }

    val micros = train(vecs, m, ksub, iters)
    val body = micros.map(book =>
      book.map(cw => cw.mkString("Array(", "L, ", "L)"))
        .mkString("    Array(\n      ", ",\n      ", ")"))
      .mkString("  val Micros: Array[Array[Array[Long]]] = Array(\n", ",\n", ")\n")
    val src =
      s"""package graft.ops
         |
         |/** PUBLISHED product-quantization codebooks — trained offline by
         |  * [[graft.PqTrain]] (per-subspace Lloyd, $iters iterations, init =
         |  * the sampled quantizer) on the $sfDir embeddings and DISTILLED to
         |  * integer micro-units: the learned floats never cross engines, these
         |  * integers do (the QualityModel discipline). Regenerate with
         |  * `runMain graft.PqTrain` after retraining; the artifact is data —
         |  * review the diff like a model update, not a code change.
         |  */
         |object PqModel {
         |  val M = $m
         |  val Ksub = $ksub
         |  val Sub = $sub
         |$body}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"""{"metric":"pq_train","subspaces":$m,"ksub":$ksub,"iters":$iters,"out":"$out"}""")
    spark.stop()
  }
}
