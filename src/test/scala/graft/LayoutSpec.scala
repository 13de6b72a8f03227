package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Proves the archive layout's pruning claims from the physical plan: a
  * (day, op) filter over the partitioned event archive must become directory
  * pruning (PartitionFilters selecting a fraction of the files), and the
  * partition columns must never appear as post-scan data filters.
  */
class LayoutSpec extends SparkSuite {

  private lazy val archive: String = {
    val dir = java.nio.file.Files.createTempDirectory("event_archive").toString
    val ev = graft.cdc.EventLog.normalize(Tables.load(spark, sf, "events"))
      .select(col("event_id"), col("ts"), col("user_id"), col("op"), col("props"))
    Layout.writeEventArchive(ev, dir)
    dir
  }

  test("day+op filter prunes partitions at the file index, not post-scan") {
    val slice = Layout.readDayOp(spark, archive, "2024-01-02", "INSERT")
    val scan = slice.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    // both predicates are partition filters...
    val pf = scan.partitionFilters.mkString(";")
    assert(pf.contains("day") && pf.contains("op"), s"partition filters missing: $pf")
    // ...and neither survives as a data filter on row contents
    val df = scan.dataFilters.mkString(";")
    assert(!df.contains("day") && !df.contains("op"), s"partition cols leaked into data filters: $df")

    // the file index actually selected a strict subset of the archive
    val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.length).sum
    val total = scan.relation.location.listFiles(Nil, Nil).map(_.files.length).sum
    assert(selected < total, s"no files pruned: $selected of $total")
    assert(selected >= 1, "slice selected no files at all")

    // and the slice still returns the right rows
    val rows = slice.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("op") == "INSERT"))
  }

  test("archive writes one file per (day, op) directory — no small-file explosion") {
    val leafDirs = new java.io.File(archive).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles().filter(_.isDirectory))
    assert(leafDirs.nonEmpty)
    leafDirs.foreach { d =>
      val parts = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts == 1, s"${d.getName} has $parts files; repartition should yield 1")
    }
  }
}
