package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the captured event log — the write side of the 100 TB
  * story. The reference streams events onward and keeps nothing
  * (`README.md:3` "populating other systems"); the system being populated
  * has to choose a layout, and at scale the layout IS the query plan:
  *
  *  - **Hive-style partition columns** (`day=.../ op=...`) turn time- and
  *    op-bounded scans into directory pruning — the storage-layer analog of
  *    the reference's install-time table pruning (F1, `server.go:160-162`):
  *    filtered data is never read, the strongest pushdown there is.
  *  - **In-file ordering** (`sortWithinPartitions` on the entity key) gives
  *    every parquet row group tight min/max key stats, so point lookups
  *    (the E1 fallback shape) skip row groups inside the files a partition
  *    scan selects.
  *  - Partition columns must be LOW cardinality (a day × a 5-value op enum =
  *    bounded directories); the entity key goes into the in-file sort, never
  *    the directory tree — a `user_id=` layout would mean millions of tiny
  *    files and a dead file index at 100 TB.
  *
  * `LayoutSpec` proves the pruning from the physical plan (PartitionFilters +
  * selected file count) rather than trusting the prose.
  */
object Layout {

  /** Write the event log partitioned by (day, op) with per-file ordering on
    * (user_id, ts). One shuffle to coalesce each partition's data into few
    * files (`repartition` on the partition columns), then a task-local sort —
    * the standard compaction-friendly CDC archive layout.
    */
  def writeEventArchive(events: DataFrame, path: String,
                        filesPerPartition: Int = 1): Unit =
    events
      .withColumn("day", to_date(col("ts")))
      .repartition(col("day"), col("op"))
      .sortWithinPartitions(col("user_id"), col("ts"))
      .write
      .partitionBy("day", "op")
      .mode("overwrite")
      .parquet(path)

  /** Read one day's slice of one op — the probe whose plan must show
    * directory pruning (PartitionFilters), not a full-archive scan.
    */
  def readDayOp(spark: SparkSession, path: String, day: String, op: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("day") === lit(day).cast("date") && col("op") === op)
}
