package graft

import org.apache.spark.sql.SparkSession

/** Novelty-monitor state-at-scale probe: throughput of
  * [[graft.streaming.WindowSketches.kmvNovelty]] as the GROUP count —
  * the only thing its state grows with — scales from tens to hundreds
  * of thousands (state = k longs per group: 8 KB each at k=1024, so
  * 200k groups ≈ 1.6 GB spread over the state store; per-ROW cost is
  * what must stay flat). Usage:
  * `runMain graft.NoveltyScaleBench [groupsCsv] [docsPerWave] [waves]`
  * → one JSON line per group count (wave 1 cold-enrolls every group;
  * the reported number is the warm last wave).
  */
object NoveltyScaleBench {

  def main(args: Array[String]): Unit = {
    val groupsList = args.headOption.getOrElse("20,2000,200000")
      .split(",").map(_.trim.toInt).toSeq
    val docsPerWave = args.lift(1).map(_.toInt).getOrElse(200000)
    val waves = args.lift(2).map(_.toInt).getOrElse(3)

    val spark = SparkSession.builder()
      .master("local[32]").appName("novelty-scale-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    groupsList.foreach { nGroups =>
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.WindowSketches.HashRow]
      val q = graft.streaming.WindowSketches.kmvNovelty(in.toDS())
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"nov_scale_$nGroups").toString)
        .start()
      var lastSec = 0.0
      try {
        (0 until waves).foreach { w =>
          val rows = (0 until docsPerWave).map { i =>
            graft.streaming.WindowSketches.HashRow(
              "g" + (i % nGroups),
              scala.util.hashing.byteswap64(w.toLong * docsPerWave + i))
          }
          val t0 = System.nanoTime()
          in.addData(rows)
          q.processAllAvailable()
          lastSec = (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      println(s"""{"metric":"novelty_scale","groups":$nGroups,"docs_per_wave":$docsPerWave,"waves":$waves,"warm_wave_sec":$lastSec,"docs_per_sec":${(docsPerWave / lastSec).toLong}}""")
    }
    spark.stop()
  }
}
