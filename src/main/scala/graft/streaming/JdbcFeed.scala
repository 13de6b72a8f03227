package graft.streaming

import java.sql.DriverManager
import graft.streaming.CdcStream.RawChange

/** JDBC-backed [[CdcSource.ChangeFeed]] — the production shape of the CDC
  * poller (the north star's "Structured Streaming + JDBC source for CDC").
  *
  * Two query shapes, both mirroring the reference:
  *  - `latestId` — one `MAX(id)` probe per trigger, driver-side (the analog of
  *    the NOTIFY wake-up, reference `server.go:258-272`, as a pull);
  *  - `fetch` — the ranged `WHERE event_id > ? AND event_id <= ?` scan
  *    (the id-keyed query shape of the reference's fallback lookup,
  *    `queries.go:62-64`), executed EXECUTOR-side in the partition reader:
  *    each [[CdcSource.IdRangePartition]] opens its own short-lived
  *    connection, so a large backlog is fetched by N readers in parallel and
  *    no connection object ever needs to be serialized.
  *
  * Range bounds are bound as prepared-statement parameters. The table name
  * cannot be a parameter, so it is validated against a strict identifier
  * whitelist instead — the reference Sprintf's the table name into SQL
  * unchecked (`server.go:196`), a noted injection surface we don't copy.
  *
  * Tested against in-process Derby (in `JdbcFeedSpec`) — any JDBC database
  * with a monotone id column works; zero Derby-specific SQL here.
  *
  * Visibility caveat (the classic id-polling CDC pitfall): `MAX(event_id)`
  * assumes ids become VISIBLE in order. Under concurrent writers a
  * transaction holding a smaller id can commit after a larger id was already
  * polled past, and a plain `(lastOffset, latest]` scan then never fetches
  * that row. The reference's NOTIFY transport dodges this (notifications
  * fire on commit) at the price of at-most-once delivery. HARDENED here via
  * the source's `rescanWindow` option ([[CdcSource.CdcMicroBatchStream]]):
  * each batch re-fetches a trailing id window below its start offset, and
  * [[CdcStream.dedupeReplays]] restores exactly-once downstream. Size the
  * window to the id-allocation burst a transaction can straddle (ids issued
  * per max-transaction-duration); for append-only single-writer logs the
  * monotone assumption holds and `rescanWindow = 0` keeps the source
  * exactly-once by itself.
  */
final class JdbcFeed(url: String, table: String) extends CdcSource.ChangeFeed {
  require(JdbcFeed.isSafeIdent(table), s"unsafe table identifier: $table")

  override def latestId(): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT MAX(event_id) FROM $table")
      if (rs.next() && rs.getObject(1) != null) rs.getLong(1) else -1L
    } finally conn.close()
  }

  override def fetch(fromExclusive: Long, toInclusive: Long): Seq[RawChange] = {
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        s"SELECT event_id, ts, user_id, event_type, props FROM $table" +
          " WHERE event_id > ? AND event_id <= ? ORDER BY event_id")
      ps.setLong(1, fromExclusive)
      ps.setLong(2, toInclusive)
      val rs = ps.executeQuery()
      val buf = scala.collection.mutable.ArrayBuffer.empty[RawChange]
      while (rs.next()) {
        buf += RawChange(rs.getLong(1), rs.getTimestamp(2), rs.getLong(3),
          rs.getString(4), rs.getString(5))
      }
      buf.toSeq
    } finally conn.close()
  }
}

object JdbcFeed {
  private val IdentRe = "^[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*$".r
  /** ASCII identifier segments joined by single dots (schema qualification);
    * no leading/trailing/doubled dots, no quoting, no unicode.
    */
  def isSafeIdent(s: String): Boolean = IdentRe.matches(s)
}

/** Executor-side STREAMING partition reader over the ranged fetch — rows are
  * pulled straight off the ResultSet into the scan, never buffered: an
  * initial-backlog partition (offset -1 on an existing table) can span
  * millions of rows, and a Seq-materializing fetch would hold them all in
  * heap before emitting the first one. `setFetchSize` keeps the driver
  * cursor-based too (on Postgres that additionally needs autocommit off,
  * set below; Derby ignores it harmlessly).
  */
final class JdbcRowReader(spec: CdcSource.JdbcSpec, fromExclusive: Long, toInclusive: Long)
    extends org.apache.spark.sql.connector.read.PartitionReader[
      org.apache.spark.sql.catalyst.InternalRow] {

  private val conn = {
    val c = DriverManager.getConnection(spec.url)
    c.setAutoCommit(false)
    c
  }
  private val rs = {
    val ps = conn.prepareStatement(
      s"SELECT event_id, ts, user_id, event_type, props FROM ${spec.table}" +
        " WHERE event_id > ? AND event_id <= ? ORDER BY event_id")
    ps.setFetchSize(1000)
    ps.setLong(1, fromExclusive)
    ps.setLong(2, toInclusive)
    ps.executeQuery()
  }

  override def next(): Boolean = rs.next()
  override def get(): org.apache.spark.sql.catalyst.InternalRow =
    CdcSource.toInternalRow(RawChange(rs.getLong(1), rs.getTimestamp(2),
      rs.getLong(3), rs.getString(4), rs.getString(5)))
  override def close(): Unit = {
    // autocommit is off, so even the read opened a transaction — end it
    // first (Derby refuses to close a connection mid-transaction)
    try conn.rollback() catch { case _: Throwable => () }
    conn.close()
  }
}

/** Live catalog discovery — the reference's `information_schema.tables`
  * enumeration with install-time regexp pruning (reference `queries.go:4-9`
  * consumed at `server.go:149-166`): tables that don't match the regexp never
  * get a trigger, so filtered data is NEVER PRODUCED — source-side pruning,
  * the strongest predicate pushdown there is (SURVEY §4). Here: a table with
  * no feed never has a streaming query polling it.
  *
  * Uses JDBC `DatabaseMetaData.getTables` rather than literal
  * `information_schema` SQL so the same code runs against Postgres, Derby, or
  * anything else with a JDBC driver.
  */
object CdcCatalog {

  /** Enumerate base tables in `schemaPattern` and keep those whose TABLE
    * name matches `tableRegexp` — UNANCHORED, the Go RE2 `MatchString`
    * substring semantics of the reference (`server.go:160-162`), same as
    * every F1/F2 filter here. Returned names are SCHEMA-QUALIFIED
    * (`schema.table`): feeds must pin the discovered schema explicitly —
    * a bare name would resolve through the connection's search path and
    * could silently capture a same-named table in another schema.
    */
  def discoverTables(url: String, schemaPattern: String, tableRegexp: String): Seq[String] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, schemaPattern, "%", Array("TABLE"))
      val names = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (rs.next()) names += ((rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME")))
      val re = tableRegexp.r
      names.toSeq.collect {
        case (s, t) if re.findFirstIn(t).isDefined => s"$s.$t"
      }.sorted
    } finally conn.close()
  }

  /** Install-time pruning composed end-to-end: one [[CdcSource.JdbcSpec]] per
    * surviving table (the analog of per-table trigger install,
    * `server.go:168-172`). Errors out on zero matches exactly like the
    * reference (`server.go:143-145`).
    */
  def install(url: String, schemaPattern: String, tableRegexp: String): Seq[CdcSource.JdbcSpec] = {
    val tables = discoverTables(url, schemaPattern, tableRegexp)
    require(tables.nonEmpty,
      s"no tables match regexp '$tableRegexp' (reference server.go:143-145 errors here too)")
    tables.map(t => CdcSource.JdbcSpec(url, t))
  }

  /** The daemon composition (reference `cmd/pqsd/main.go:95-109`): every
    * installed table captured into ONE event stream, each row carrying its
    * source table in the envelope (`pqstream.proto:39` — the `table` field
    * every downstream filter keys on). One DSv2 source per table unioned into
    * a single streaming DataFrame: each source keeps its own offsets in the
    * shared checkpoint, so the union stays exactly-once per table, and a busy
    * table cannot starve a quiet one inside a trigger (each source plans its
    * own partitions).
    *
    * Scale note: each trigger issues one driver-side `MAX(id)` probe per
    * table. Hundreds of tables are fine (cheap indexed probes); at thousands,
    * shard tables across several queries (the fan-out model already runs one
    * query per subscriber) or switch the feeds to a shared control/changelog
    * table so one probe covers all tables.
    */
  def readAll(spark: org.apache.spark.sql.SparkSession,
              specs: Seq[CdcSource.FeedSpec],
              numPartitions: Int = 4,
              rescanWindow: Long = 0L): org.apache.spark.sql.DataFrame =
    readAllFrom(spark, specs, specs.map(_ => -1L), numPartitions, rescanWindow)

  /** [[readAll]] with a PER-TABLE migration resume handle — the multi-source
    * counterpart of the single-feed `startAfterId` option. `startAfterIds`
    * pairs positionally with `specs` (source ordinal i in the union = specs
    * (i) — the order [[StateMigration.committedOffsets]] returns), so each
    * table resumes at ITS OWN committed position: per-table id spaces are
    * independent, and a shared scalar handle would re-deliver on tables
    * behind it and lose events on tables ahead of it.
    */
  def readAllFrom(spark: org.apache.spark.sql.SparkSession,
                  specs: Seq[CdcSource.FeedSpec],
                  startAfterIds: Seq[Long],
                  numPartitions: Int = 4,
                  rescanWindow: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(specs.nonEmpty, "readAll needs at least one feed")
    require(startAfterIds.length == specs.length,
      s"${specs.length} feeds but ${startAfterIds.length} resume offsets — " +
        "each source needs exactly one (pair specs with " +
        "StateMigration.committedOffsets in the original order)")
    import org.apache.spark.sql.functions.lit
    specs.zip(startAfterIds).map { case (s, after) =>
      val reader = spark.readStream.format("graft.streaming.CdcSourceProvider")
        .option("numPartitions", numPartitions.toString)
        .option("rescanWindow", rescanWindow.toString)
        .option("startAfterId", after.toString)
      val (withSpec, label) = s match {
        case j: CdcSource.JdbcSpec =>
          (reader.option("jdbcUrl", j.url).option("jdbcTable", j.table), j.table)
        case m: CdcSource.MemorySpec => (reader.option("feed", m.name), m.name)
        case y: CdcSource.SyntheticSpec =>
          (reader.option("synthetic", y.name)
             .option("syntheticUsers", y.numUsers.toString), y.name)
      }
      withSpec.load().withColumn("table", lit(label))
    }.reduce(_ unionByName _)
  }

  /** Multi-table batch BOOTSTRAP → stream handoff — [[Graft.bootstrap]]'s
    * contract extended to a whole capture set: one partitioned JDBC
    * snapshot per table (each up to ITS OWN `MAX(event_id)` cutoff,
    * unioned with the `table` envelope column the daemon path attaches)
    * plus the [[readAllFrom]] union starting each table exactly after its
    * cutoff. Per-table cutoffs matter for the same reason per-table
    * migration offsets do: id spaces are independent, and one shared
    * cutoff would re-deliver on tables behind it and lose history on
    * tables ahead of it. Same `overlap` visibility hedge, applied per
    * table.
    */
  def bootstrapAll(spark: org.apache.spark.sql.SparkSession,
                   specs: Seq[CdcSource.JdbcSpec],
                   numPartitions: Int = 4,
                   overlap: Long = 0L)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(specs.nonEmpty, "bootstrapAll needs at least one feed")
    import org.apache.spark.sql.functions.lit
    val cutoffs = specs.map(s => new JdbcFeed(s.url, s.table).latestId())
    val snapshots = specs.zip(cutoffs).map { case (s, cutoff) =>
      val snap =
        if (cutoff < 0L)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            CdcSource.schema)
        else spark.read.format("jdbc")
          .option("url", s.url)
          .option("dbtable",
            s"(SELECT event_id, ts, user_id, event_type, props FROM ${s.table}" +
              s" WHERE event_id <= $cutoff) snap")
          .option("partitionColumn", "event_id")
          .option("lowerBound", "0")
          .option("upperBound", math.max(cutoff, 1L).toString)
          .option("numPartitions", numPartitions.toString)
          .load()
      snap.withColumn("table", lit(s.table))
    }
    val tail = readAllFrom(spark, specs,
      cutoffs.map(c => math.max(c - overlap, -1L)), numPartitions)
    (snapshots.reduce(_ unionByName _), tail)
  }

  /** Checkpoint-migration resume of a multi-table capture: read the old
    * [[readAll]] checkpoint's per-source committed offsets and rebuild the
    * union with each table starting after its own position — exactly-once
    * across the cut-over, per table. `specs` MUST be the same feeds in the
    * same order as the query that wrote `oldCheckpointDir` (the offset log
    * records positions by source ordinal, not by name).
    */
  def resumeAll(spark: org.apache.spark.sql.SparkSession,
                specs: Seq[CdcSource.FeedSpec],
                oldCheckpointDir: String,
                numPartitions: Int = 4,
                rescanWindow: Long = 0L): org.apache.spark.sql.DataFrame = {
    val offs = StateMigration.committedOffsets(spark, oldCheckpointDir)
    require(offs.length == specs.length,
      s"old checkpoint has ${offs.length} sources but ${specs.length} feeds " +
        "were given — resume must list exactly the original tables in order")
    readAllFrom(spark, specs, offs, numPartitions, rescanWindow)
  }
}
