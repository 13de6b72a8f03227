package graft.streaming

import graft.cdc.Redactions
import graft.functions.MergePatch
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, StatefulProcessorWithInitialState, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** Live-mode CDC pipeline: the reference's event loop (`server.go:258-281`)
  * re-expressed as Structured Streaming.
  *
  *  - prev-image tracking: the reference gets OLD from the Postgres trigger
  *    (`queries.go:22-24`); a live stream instead keeps the last payload per
  *    key in `flatMapGroupsWithState` — state is partitioned by the group key,
  *    so at 100 TB each key's state lives on exactly one executor and the
  *    shuffle is the same one the aggregation would need anyway.
  *  - `changes`: RFC 7386 merge patch on UPDATE (`server.go:235-241`).
  *  - fan-out: the reference's subscriber loop (`server.go:249-253`) blocks on
  *    the slowest client; here each subscriber is its own streaming query
  *    (own checkpoint + offsets), so a slow or failing sink never
  *    back-pressures or force-replays the others.
  *
  * State eviction: pass a `stateTtl` so unbounded key spaces (SURVEY §7.4 #6)
  * expire idle per-key state instead of growing forever.
  */
object CdcStream {

  case class RawChange(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, props: String)

  case class CdcEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      op: String, payload: String, previous: String, changes: String)

  /** Matches [[graft.cdc.EventLog.opCol]]. TRUNCATE is declared-but-dormant,
    * same as the reference (`pqstream.proto:23` vs `queries.go:58-60`).
    */
  def opOf(eventType: String): String = eventType match {
    case "signup"   => "INSERT"
    case "error"    => "DELETE"
    case "truncate" => "TRUNCATE"
    case _          => "UPDATE"
  }

  /** Multi-table capture row: [[RawChange]] plus the source-table envelope
    * field (`pqstream.proto:39`) that [[CdcCatalog.readAll]] attaches.
    */
  case class TableRawChange(table: String, event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String, props: String)

  case class TableCdcEvent(table: String, event_id: Long, ts: java.sql.Timestamp,
                           user_id: Long, op: String, payload: String,
                           previous: String, changes: String)

  /** Shared per-key micro-batch fold: order rows, thread the prev-image
    * through, emit CDC events; returns the events and the final image. Both
    * stateful APIs — classic `flatMapGroupsWithState` and Spark 4
    * `transformWithState` — delegate here, so their semantics cannot drift.
    *
    * Within a micro-batch, rows apply in event order (null ts sorts first —
    * one bad row must not kill the query, cf. DeadLetter). FULL-PRECISION
    * micros, same formula as CdcSource.toInternalRow: getTime alone
    * truncates to millis, so two events in the same millisecond but
    * different microseconds could order differently here than in the batch
    * path (EventLog orders by full-precision ts).
    */
  private def foldChanges(rows: Iterator[RawChange],
                          prev0: Option[String]): (Seq[CdcEvent], Option[String]) = {
    val ordered = rows.toSeq.sortBy(r =>
      (if (r.ts == null) Long.MinValue
       else r.ts.getTime / 1000 * 1000000L + r.ts.getNanos / 1000,
       r.event_id))
    var prev: Option[String] = prev0
    val out = ordered.map { r =>
      val op = opOf(r.event_type)
      val changes =
        if (op == "UPDATE" && prev.isDefined)
          MergePatch.createMergePatch(r.props, prev.get)
        else null
      val ev = CdcEvent(r.event_id, r.ts, r.user_id, op, r.props,
        prev.orNull, changes)
      prev = Some(r.props)
      ev
    }
    (out, prev)
  }

  private def processGroup(
      userId: Long, rows: Iterator[RawChange],
      state: GroupState[String]): Iterator[CdcEvent] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val (out, prev) = foldChanges(rows, state.getOption)
    prev.foreach(state.update)
    out.iterator
  }

  /** Streaming (or batch) Dataset of raw changes -> CDC events with
    * previous-image + changes, keyed state per user.
    */
  def withPrevState(ds: Dataset[RawChange],
                    stateTtl: Option[String] = None): Dataset[CdcEvent] = {
    import ds.sparkSession.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (k: Long, rows: Iterator[RawChange], state: GroupState[String]) =>
          val out = processGroup(k, rows, state)
          // re-arm the TTL only while state EXISTS: setting a timeout after
          // remove() writes the entry back and the key re-fires forever —
          // eviction would never actually shrink the store
          if (state.exists) stateTtl.foreach(state.setTimeoutDuration)
          out
      }
  }

  /** Stateless fan-out-only subscriber pipeline — the LOW-LATENCY delivery
    * path. A tail-the-database subscriber that doesn't need `previous` /
    * `changes` diffs (the common `pqs` CLI use: watch inserts scroll by) is
    * exempt from the stateful micro-batch machinery entirely: regexp-scoped
    * redaction + op mapping + the jsonpb Event envelope are ONE narrow
    * codegen'd projection, so a micro-batch costs task-launch + scan — no
    * shuffle, no state-store commit, no prev-image WAL. DELETEs omit
    * `payload` (the reference ships `previous` there, which this path by
    * design does not track; jsonpb omits the absent field). With no
    * stateful operator the query also QUALIFIES for async progress
    * tracking (`spark.sql.streaming.asyncProgressTrackingEnabled`), taking
    * the offset-log fsync off the batch critical path — delivery weakens
    * to at-least-once, which is still STRONGER than the reference push
    * path's at-most-once. `StreamBench.latencyProbe("stateless*")`
    * measures this floor; BASELINE.md records it against the stateful
    * pipeline's.
    */
  def statelessEvents(ds: Dataset[RawChange],
                      redactions: Redactions.FieldRedactions = Map.empty,
                      schema: String = "public",
                      table: String = "events"): DataFrame = {
    val op = when(col("event_type") === "signup", lit("INSERT"))
      .when(col("event_type") === "error", lit("DELETE"))
      .when(col("event_type") === "truncate", lit("TRUNCATE"))
      .otherwise(lit("UPDATE"))
    val payload = when(op === "DELETE", lit(null).cast("string"))
      .otherwise(Redactions.applyMap(col("props"), lit(schema), lit(table), redactions))
    ds.toDF().select(col("event_id"), col("ts"),
      Listen.eventJson(lit(schema), lit(table), op, col("event_id"),
        payload, lit(null).cast("string")).as("event"))
  }

  /** Spark 4 `transformWithState` port of the prev-image tracker — the
    * modern stateful API (SPARK-46815): explicit named `ValueState` with
    * native TTL instead of timeout callbacks, RocksDB-backed. Semantics are
    * IDENTICAL to [[withPrevState]] by construction (both fold through
    * [[foldChanges]]); `CdcStreamSpec` replays the same input through both
    * and asserts row-for-row parity. State TTL here is declarative
    * (`TTLConfig` per state variable, requires `TimeMode.ProcessingTime`)
    * versus the classic path's manual re-arm — the per-key partitioning and
    * 100 TB posture are unchanged: state lives with its shuffle key.
    */
  class PrevImageProcessor(ttl: Option[java.time.Duration] = None)
      extends StatefulProcessorWithInitialState[Long, RawChange, CdcEvent, String] {
    @transient private var prevState: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      prevState = getHandle.getValueState[String]("prev",
        org.apache.spark.sql.Encoders.STRING,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    /** Migration hook ([[StateMigration]]): each (user_id, prev) row read
      * from an old checkpoint lands here before the first batch. A query
      * started WITHOUT initial state never calls it — one class serves
      * both [[withPrevStateTws]] and [[withPrevStateTwsFrom]], so the two
      * paths cannot drift.
      */
    override def handleInitialState(key: Long, initial: String,
                                    timerValues: TimerValues): Unit =
      prevState.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[RawChange],
                                 timerValues: TimerValues): Iterator[CdcEvent] = {
      val p0 = if (prevState.exists()) Some(prevState.get()) else None
      val (out, p1) = foldChanges(rows, p0)
      p1.foreach(prevState.update)
      out.iterator
    }
  }

  /** [[withPrevState]] via [[PrevImageProcessor]]. TTL requires processing-
    * time semantics; without one the query runs in `TimeMode.None`.
    */
  def withPrevStateTws(ds: Dataset[RawChange],
                       ttl: Option[java.time.Duration] = None): Dataset[CdcEvent] = {
    import ds.sparkSession.implicits._
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(_.user_id)
      .transformWithState(new PrevImageProcessor(ttl), mode, OutputMode.Append())
  }

  /** Erasure-aware twin of [[PrevImageProcessor]] — GDPR erasure REACHING
    * STREAMING STATE (the r10 verdict's top gap: archive tombstones,
    * `Layout.eraseEntities`, cannot touch the prev-image payload a
    * checkpoint holds durably for an erased user). `erased` is the
    * broadcast erasure set the archive already writes — (user_id →
    * cutoff event_id), see [[StateErasure.erasureSet]] — shipped in the
    * processor closure (bounded by erasure-request count, not key count).
    *
    * Per erased key, ON FIRST ENCOUNTER after the erasure: the "prev"
    * payload state is cleared, so the next genuine event emits
    * `previous = null` (first-sight semantics — erasure is point-in-time,
    * the entity returning later is new data). A second state variable
    * ("erasedAt", the cutoff already applied) makes the clear
    * RESTART-IDEMPOTENT: a query bounced with the same erasure config
    * must not re-clear state a post-erasure event legitimately rebuilt.
    * Input rows at `event_id <= cutoff` are DROPPED — the same
    * point-in-time guard the archive's tombstone anti-join applies
    * ([[graft.sources.Layout.appendArchiveBatch]]), so a replayed
    * pre-erasure batch cannot resurrect the payload through the state
    * path either; this is the end-to-end composition with
    * [[dedupeReplays]]' replay discipline the tombstone contract needs.
    *
    * A key held in state but NEVER seen again would otherwise keep its
    * payload forever (handlers only fire for keys with input) —
    * [[StateErasure.eraseSentinels]] closes that: one synthetic command
    * row per erased key (event_id = cutoff, so the row itself is dropped
    * by the cutoff guard after forcing the handler invocation).
    *
    * State-var layout stays backward-compatible with
    * [[PrevImageProcessor]] ("prev" unchanged; "erasedAt" is additive),
    * so an EXISTING checkpoint resumes under this processor with no
    * migration — the targeted-removal deployment shape.
    */
  class ErasingPrevImageProcessor(erased: Map[Long, Long],
                                  ttl: Option[java.time.Duration] = None)
      extends StatefulProcessorWithInitialState[Long, RawChange, CdcEvent, String] {
    @transient private var prevState: ValueState[String] = _
    @transient private var erasedAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      prevState = getHandle.getValueState[String]("prev",
        org.apache.spark.sql.Encoders.STRING,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
      // deliberately TTL-free: the erasure receipt must outlive idle-state
      // eviction, or a bounced query would re-clear a rebuilt payload
      erasedAt = getHandle.getValueState[Long]("erasedAt",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Fresh-checkpoint resume (migration + erasure in one step): erased
      * keys are not seeded, and their receipt is stamped so later
      * restarts stay idempotent.
      */
    override def handleInitialState(key: Long, initial: String,
                                    timerValues: TimerValues): Unit =
      erased.get(key) match {
        case Some(cutoff) => erasedAt.update(cutoff)
        case None         => prevState.update(initial)
      }

    override def handleInputRows(key: Long, rows: Iterator[RawChange],
                                 timerValues: TimerValues): Iterator[CdcEvent] = {
      // sentinels are commands, never data — dropped unconditionally, so a
      // stray one (erasure config trimmed between restarts) can't fold a
      // null payload into the image
      val data = rows.filter(_.event_type != "erase")
      val live = erased.get(key) match {
        case Some(cutoff) =>
          val applied = erasedAt.exists() && erasedAt.get() >= cutoff
          if (!applied) { prevState.clear(); erasedAt.update(cutoff) }
          data.filter(_.event_id > cutoff)
        case None => data
      }
      val p0 = if (prevState.exists()) Some(prevState.get()) else None
      val (out, p1) = foldChanges(live, p0)
      p1.foreach(prevState.update)
      out.iterator
    }
  }

  /** [[withPrevStateTws]] under the erasure-aware processor — resume an
    * EXISTING checkpoint with this (same source, same checkpoint dir) to
    * apply targeted key removal in place; see [[StateErasure]] for the
    * full recipe including the sentinel injection.
    */
  def withPrevStateTwsErasing(ds: Dataset[RawChange], erased: Map[Long, Long],
                              ttl: Option[java.time.Duration] = None): Dataset[CdcEvent] = {
    import ds.sparkSession.implicits._
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(_.user_id)
      .transformWithState(new ErasingPrevImageProcessor(erased, ttl), mode,
        OutputMode.Append())
  }

  /** Fresh-checkpoint twin of [[withPrevStateTwsErasing]]: migrated
    * initial state with the erasure applied at seed time.
    */
  def withPrevStateTwsErasingFrom(ds: Dataset[RawChange], erased: Map[Long, Long],
                                  initial: Dataset[(Long, String)],
                                  ttl: Option[java.time.Duration] = None): Dataset[CdcEvent] = {
    import ds.sparkSession.implicits._
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(_.user_id)
      .transformWithState(new ErasingPrevImageProcessor(erased, ttl), mode,
        OutputMode.Append(), initial.groupByKey(_._1).mapValues(_._2))
  }

  /** [[withPrevStateTws]] seeded with migrated state — the RESUME side of a
    * flatMapGroupsWithState → transformWithState checkpoint migration.
    * Same [[PrevImageProcessor]] as the normal path, with its migration
    * hook activated by the initial-state overload.
    */
  def withPrevStateTwsFrom(ds: Dataset[RawChange],
                           initial: Dataset[(Long, String)],
                           ttl: Option[java.time.Duration] = None): Dataset[CdcEvent] = {
    import ds.sparkSession.implicits._
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(_.user_id)
      .transformWithState(new PrevImageProcessor(ttl), mode,
        OutputMode.Append(), initial.groupByKey(_._1).mapValues(_._2))
  }

  /** [[withPrevState]] seeded with migrated state — the reverse (rollback)
    * direction: transformWithState → flatMapGroupsWithState.
    */
  def withPrevStateFrom(ds: Dataset[RawChange],
                        initial: Dataset[(Long, String)],
                        stateTtl: Option[String] = None): Dataset[CdcEvent] = {
    import ds.sparkSession.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout,
        initial.groupByKey(_._1).mapValues(_._2)) {
        (k: Long, rows: Iterator[RawChange], state: GroupState[String]) =>
          val out = processGroup(k, rows, state)
          if (state.exists) stateTtl.foreach(state.setTimeoutDuration)
          out
      }
  }

  /** By-table twin of [[PrevImageProcessor]] — the RE-KEY target:
    * single-table state migrated under a (table, user_id) key (see
    * [[StateMigration.withTableKey]]).
    */
  class PrevImageProcessorByTableWithInit
      extends StatefulProcessorWithInitialState[(String, Long), TableRawChange,
        TableCdcEvent, String] {
    @transient private var prevState: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      prevState = getHandle.getValueState[String]("prev",
        org.apache.spark.sql.Encoders.STRING, TTLConfig.NONE)

    override def handleInitialState(key: (String, Long), initial: String,
                                    timerValues: TimerValues): Unit =
      prevState.update(initial)

    override def handleInputRows(key: (String, Long), rows: Iterator[TableRawChange],
                                 timerValues: TimerValues): Iterator[TableCdcEvent] = {
      val p0 = if (prevState.exists()) Some(prevState.get()) else None
      val raw = rows.map(r =>
        RawChange(r.event_id, r.ts, r.user_id, r.event_type, r.props))
      val (out, p1) = foldChanges(raw, p0)
      p1.foreach(prevState.update)
      out.iterator.map(e => TableCdcEvent(key._1, e.event_id, e.ts, e.user_id,
        e.op, e.payload, e.previous, e.changes))
    }
  }

  /** [[withPrevStateByTable]] semantics on transformWithState, seeded with
    * re-keyed migrated state.
    */
  def withPrevStateByTableTwsFrom(ds: Dataset[TableRawChange],
                                  initial: Dataset[((String, Long), String)]): Dataset[TableCdcEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r.table, r.user_id))
      .transformWithState(new PrevImageProcessorByTableWithInit, TimeMode.None(),
        OutputMode.Append(), initial.groupByKey(_._1).mapValues(_._2))
  }

  /** By-table twin of [[ErasingPrevImageProcessor]]: the erasure set is
    * ENTITY-grain (user → cutoff) and applies across EVERY captured table
    * the entity appears in — a GDPR request names the person, not the
    * table, so one config entry must clear the user's prev-image in all
    * (table, user) keys. Same contract otherwise: restart-idempotent via
    * the additive per-key "erasedAt" var, rows ≤ cutoff dropped, state-var
    * layout backward-compatible with [[PrevImageProcessorByTableWithInit]]
    * so an existing multi-table checkpoint resumes in place.
    */
  class ErasingPrevImageProcessorByTable(erased: Map[Long, Long])
      extends ErasingPrevImageProcessorByTableKeys(k => erased.get(k._2))

  /** The by-table erasing processor, parameterized by a cutoff LOOKUP so
    * both grains share one implementation (checkpoint-compatible by
    * construction): [[ErasingPrevImageProcessorByTable]] passes entity
    * grain (`k => erased.get(k._2)` — one cutoff across tables, the
    * single-archive shape), [[withPrevStateByTableTwsErasingKeys]] passes
    * (table, user) grain for multi-archive deployments whose per-table id
    * spaces are INDEPENDENT: one user's cutoff in table A says nothing
    * about table B, and a merged max-cutoff applied across tables would
    * silently drop the entity's FUTURE rows in every table whose ids run
    * lower (erasure must never block future data — the tombstone
    * contract).
    */
  class ErasingPrevImageProcessorByTableKeys(cutoffOf: ((String, Long)) => Option[Long])
      extends StatefulProcessorWithInitialState[(String, Long), TableRawChange,
        TableCdcEvent, String] {
    @transient private var prevState: ValueState[String] = _
    @transient private var erasedAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      prevState = getHandle.getValueState[String]("prev",
        org.apache.spark.sql.Encoders.STRING, TTLConfig.NONE)
      erasedAt = getHandle.getValueState[Long]("erasedAt",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInitialState(key: (String, Long), initial: String,
                                    timerValues: TimerValues): Unit =
      cutoffOf(key) match {
        case Some(cutoff) => erasedAt.update(cutoff)
        case None         => prevState.update(initial)
      }

    override def handleInputRows(key: (String, Long), rows: Iterator[TableRawChange],
                                 timerValues: TimerValues): Iterator[TableCdcEvent] = {
      val data = rows.filter(_.event_type != "erase")
      val live = cutoffOf(key) match {
        case Some(cutoff) =>
          val applied = erasedAt.exists() && erasedAt.get() >= cutoff
          if (!applied) { prevState.clear(); erasedAt.update(cutoff) }
          data.filter(_.event_id > cutoff)
        case None => data
      }
      val p0 = if (prevState.exists()) Some(prevState.get()) else None
      val raw = live.map(r =>
        RawChange(r.event_id, r.ts, r.user_id, r.event_type, r.props))
      val (out, p1) = foldChanges(raw, p0)
      p1.foreach(prevState.update)
      out.iterator.map(e => TableCdcEvent(key._1, e.event_id, e.ts, e.user_id,
        e.op, e.payload, e.previous, e.changes))
    }
  }

  /** [[withPrevStateByTable]] under the erasure-aware by-table processor —
    * resume an existing multi-table tws checkpoint with this to erase an
    * entity across every captured table in place. Sentinels for a
    * multi-table feed: one [[StateErasure.eraseSentinels]] row per
    * (table, user) the entity is known in, tagged with the table.
    */
  def withPrevStateByTableTwsErasing(ds: Dataset[TableRawChange],
                                     erased: Map[Long, Long]): Dataset[TableCdcEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r.table, r.user_id))
      .transformWithState(new ErasingPrevImageProcessorByTable(erased),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[withPrevStateByTableTwsErasing]] with PER-(table, user) cutoffs —
    * the multi-archive form (independent per-table id spaces; see
    * [[ErasingPrevImageProcessorByTableKeys]]).
    */
  def withPrevStateByTableTwsErasingKeys(ds: Dataset[TableRawChange],
                                         erased: Map[(String, Long), Long])
      : Dataset[TableCdcEvent] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r.table, r.user_id))
      .transformWithState(new ErasingPrevImageProcessorByTableKeys(erased.get _),
        TimeMode.None(), OutputMode.Append())
  }

  /** Multi-table variant of [[withPrevState]]: state keyed by
    * (table, user_id), because the reference's OLD image is PER TABLE
    * (`queries.go:22-24` — the trigger fires per table; `previous` can never
    * cross tables). Keying on user_id alone would bleed prev-images between
    * tables the moment two captured tables share key values — the spec pins
    * exactly that. Same TTL/eviction contract as the single-table path.
    */
  def withPrevStateByTable(ds: Dataset[TableRawChange],
                           stateTtl: Option[String] = None): Dataset[TableCdcEvent] = {
    import ds.sparkSession.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(r => (r.table, r.user_id))
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (k: (String, Long), rows: Iterator[TableRawChange], state: GroupState[String]) =>
          val raw = rows.map(r =>
            RawChange(r.event_id, r.ts, r.user_id, r.event_type, r.props))
          val out = processGroup(k._2, raw, state).map(e =>
            TableCdcEvent(k._1, e.event_id, e.ts, e.user_id, e.op,
              e.payload, e.previous, e.changes))
          if (state.exists) stateTtl.foreach(state.setTimeoutDuration)
          out
      }
  }

  // ===== schema-generic pipeline (GenericJdbcSpec capture) =====

  /** One row of the schema-generic capture envelope
    * ([[CdcSource.genericSchema]]): the monotone sequence id and the whole
    * source row as a JSON document.
    */
  case class GenericChange(event_id: Long, payload: String)

  /** Generic CDC event: the reference `Event` shape (`pqstream.proto:
    * 37-47`) without a fixed payload schema — `row_key` is the row's
    * identity (extracted from the payload, typically the primary key;
    * string-typed like the proto's `id`), `previous` the last payload seen
    * for that key, `changes` the RFC 7386 merge patch on UPDATE.
    */
  case class GenericCdcEvent(event_id: Long, row_key: String, op: String,
                             payload: String, previous: String, changes: String)

  // not `private`: the Dataset encoder's generated projection must be able
  // to access the class from outside this object
  case class KeyedGenericChange(row_key: String, op_hint: String,
                                event_id: Long, payload: String)

  /** Shared keying projection + timeout mapping of the generic capture —
    * one body for the plain and resumed paths, same anti-drift argument
    * as [[processGenericGroup]].
    */
  private def keyedGeneric(ds: Dataset[GenericChange], keyPath: String,
                           opPath: Option[String], stateTtl: Option[String])
      : (Dataset[KeyedGenericChange], GroupStateTimeout) = {
    import ds.sparkSession.implicits._
    val opCol = opPath.map(p => upper(get_json_object(col("payload"), s"$$.$p")))
      .getOrElse(lit(null).cast("string"))
    val keyed = ds.toDF().select(
      coalesce(get_json_object(col("payload"), s"$$.$keyPath"), lit("")).as("row_key"),
      opCol.as("op_hint"), col("event_id"), col("payload"))
      .as[KeyedGenericChange]
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    (keyed, timeout)
  }

  /** Prev-image tracking for ARBITRARY captured schemas — [[withPrevState]]
    * with the entity key read out of the dynamic payload instead of a
    * typed column. `keyPath` is a JSON path fragment naming the row's
    * identity (e.g. `"sku"` or `"order.id"`); extraction is a codegen'd
    * `get_json_object` BEFORE the stateful handler (the SchemaDrift
    * pattern: narrow JSON work outside the per-key fold), so the shuffle
    * key and the state key are the row identity — at 100 TB each row's
    * prev-image lives with its shuffle partition exactly like the typed
    * path's per-user state.
    *
    * Op semantics: an id-polled capture observes an append-only log, so by
    * default the first payload per key is INSERT and every later one
    * UPDATE (with `changes` = new→old merge patch, the reference's
    * argument order, `patch.go:32`/`server.go:236`). If the captured
    * table is an outbox/changelog carrying its own op column, name it via
    * `opPath`: its value (uppercased) overrides the inference, and a
    * DELETE clears the key's state — the next event for that key is a
    * fresh INSERT, matching the trigger lifecycle (`queries.go:17-21`:
    * OLD is serialized for DELETE and the row then no longer exists).
    *
    * Rows whose payload lacks the key (null extraction) group under the
    * empty key rather than being dropped — the one-bad-row contract.
    */
  def withPrevStateByRowKey(ds: Dataset[GenericChange], keyPath: String,
                            opPath: Option[String] = None,
                            stateTtl: Option[String] = None): Dataset[GenericCdcEvent] = {
    import ds.sparkSession.implicits._
    val (keyed, timeout) = keyedGeneric(ds, keyPath, opPath, stateTtl)
    keyed.groupByKey(_.row_key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        processGenericGroup(stateTtl))
  }

  /** Shared per-row-key fold of the generic capture — one body for the
    * plain, resumed ([[withPrevStateByRowKeyFrom]]) and erasure paths, so
    * their semantics cannot drift.
    */
  private def processGenericGroup(stateTtl: Option[String])(
      k: String, rows: Iterator[KeyedGenericChange],
      state: GroupState[String]): Iterator[GenericCdcEvent] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // sequence order IS event order for a generic capture — the id
      // is the log position; there is no typed ts column to consult
      val ordered = rows.toSeq.sortBy(_.event_id)
      var prev: Option[String] = state.getOption
      val out = ordered.map { r =>
        val op = Option(r.op_hint).getOrElse(
          if (prev.isEmpty) "INSERT" else "UPDATE")
        val changes =
          if (op == "UPDATE" && prev.isDefined)
            MergePatch.createMergePatch(r.payload, prev.get)
          else null
        val ev = GenericCdcEvent(r.event_id, k, op, r.payload,
          prev.orNull, changes)
        if (op == "DELETE") prev = None else prev = Some(r.payload)
        ev
      }
      prev match {
        case Some(p) =>
          state.update(p)
          stateTtl.foreach(state.setTimeoutDuration)
        case None => if (state.exists) state.remove()
      }
      out.iterator
    }

  /** [[withPrevStateByRowKey]] seeded with migrated (or erasure-filtered)
    * state — the resume side of a generic-capture checkpoint relocation
    * and of [[StateErasure.erasePrevImageStateByRowKey]]'s offline
    * rewrite. Same fold as the plain path by construction.
    */
  def withPrevStateByRowKeyFrom(ds: Dataset[GenericChange], keyPath: String,
                                initial: Dataset[(String, String)],
                                opPath: Option[String] = None,
                                stateTtl: Option[String] = None): Dataset[GenericCdcEvent] = {
    import ds.sparkSession.implicits._
    val (keyed, timeout) = keyedGeneric(ds, keyPath, opPath, stateTtl)
    keyed.groupByKey(_.row_key)
      .flatMapGroupsWithState(OutputMode.Append, timeout,
        initial.groupByKey(_._1).mapValues(_._2))(
        processGenericGroup(stateTtl))
  }

  /** The generic events in the reference's jsonpb `Event` envelope
    * ([[Listen.eventJson]]) — `id` carries the row key (the proto's `id`
    * is the row identity as a string, `pqstream.proto:41`), ready for the
    * Listen hub or any JSON sink. DELETEs ship `previous` in the payload
    * slot exactly like the reference trigger does (`queries.go:19-21`).
    */
  def genericEvents(ds: Dataset[GenericCdcEvent],
                    schema: String = "public",
                    table: String = "events"): DataFrame =
    ds.toDF().select(col("event_id"),
      Listen.eventJson(lit(schema), lit(table), col("op"), col("row_key"),
        when(col("op") === "DELETE", col("previous")).otherwise(col("payload")),
        col("changes")).as("event"))

  /** Exactly-once-ify an at-least-once upstream: drop replayed event ids
    * within the watermark horizon. The offset-tracked JDBC source is
    * exactly-once by construction, but a NOTIFY-shaped transport (the
    * reference's, which can re-deliver around reconnects) or any retrying
    * producer needs ingest-side dedup. `dropDuplicatesWithinWatermark` keys
    * state on event_id and EXPIRES it past the watermark — bounded state,
    * unlike plain `dropDuplicates` whose id set grows forever (SURVEY §7.4
    * #6: unbounded keys at 100 TB demand eviction).
    */
  def dedupeReplays(ds: Dataset[RawChange],
                    watermark: String = "10 minutes"): Dataset[RawChange] = {
    import ds.sparkSession.implicits._
    // null-ts rows bypass the dedup instead of entering it: the watermark
    // operator treats a null event time as infinitely late and silently
    // DROPS the row — but the pipeline's contract is that one bad row never
    // disappears silently (processGroup tolerates null ts; DeadLetter exists
    // for malformed rows). They can't be deduplicated without an event time
    // anyway, so they pass through unchanged.
    val timed = ds.filter(col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
    timed.unionByName(ds.filter(col("ts").isNull)).as[RawChange]
  }

  /** Tumbling-window counts with a watermark — the streaming-window analog of
    * `ops_hourly_counts` (the reference has no event time at all; SURVEY §2B).
    */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Live running counts per event type — the Update-output-mode companion
    * to the Append-mode windowed/session aggregates: a dashboard wants the
    * CURRENT total re-emitted whenever it changes, not a finalized row per
    * closed window. No watermark and no eviction — correct here because the
    * key domain (event types) is bounded, so state is |types| rows forever;
    * for unbounded keys use the watermarked window forms instead (this is
    * precisely the state-size trade that separates the two output modes).
    */
  def liveTypeCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(count(lit(1)).as("n"))

  /** Session windows on the live stream — the streaming analog of the batch
    * `ops_sessionize` (lag + cumulative boundary sum): `session_window` opens
    * a window per (user, event) and MERGES windows that overlap within the
    * gap, so a session closes only after `gap` of per-user silence. The
    * watermark gives sessions a finalization horizon — a merged window is
    * emitted (Append mode) once the watermark passes its end, and its state
    * is dropped; without the watermark session state would accumulate
    * forever. Shuffle is keyed (user, session-window), same partitioning as
    * every other per-user stage.
    */
  def sessionCounts(events: DataFrame,
                    gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Stream-stream interval join: each DELETE-op event (error) paired with
    * the INSERT/UPDATE-op events (purchases) the same user produced in the
    * preceding `withinSeconds` — the online correlation ("which recent
    * actions preceded this failure?") that batch engines answer with a range
    * join (`Relational.rangeJoinBinned`) but a CDC consumer needs as rows
    * arrive.
    *
    * Both sides carry watermarks and the join condition bounds event time in
    * BOTH directions, so Spark derives state-eviction watermarks for each
    * side: a buffered purchase is dropped once no future error can reach
    * back to it (`p_ts < watermark - withinSeconds`), an error row is
    * matched against buffered purchases and never retained past its own
    * watermark. Without the time bound the join would buffer both streams
    * FOREVER — the unbounded-state trap this operator exists to show
    * avoided. State is keyed by (user, time-bucket) internally; shuffle is
    * on user_id for both sides, same as every other keyed stage.
    */
  def correlate(events: DataFrame,
                withinSeconds: Long = 600,
                watermark: String = "10 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
      .withWatermark("e_ts", watermark)
    errors.join(purchases,
      col("p_user") === col("e_user") &&
        col("p_ts") <= col("e_ts") &&
        col("p_ts") >= col("e_ts") - expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("e_user").as("user_id"), col("error_id"), col("e_ts"),
        col("purchase_id"), col("p_ts"))
  }

  /** LEFT OUTER variant of [[correlate]]: every error emits, with null
    * purchase columns when NO purchase preceded it in the window — the
    * "failures with no prior activity" report an inner join silently drops.
    * The semantics outer adds on a stream are about TIME, not just nulls: an
    * unmatched error cannot emit when first seen (a matching purchase may
    * still arrive late), so Spark holds it in state and emits the
    * null-padded row only once the PURCHASE-side watermark guarantees no
    * qualifying `p_ts <= e_ts` row can still arrive — correctness waits
    * exactly one watermark horizon, state stays bounded by the same
    * two-sided eviction as the inner join. Same shuffle (user key, both
    * sides), same state shape; only the emission rule differs.
    */
  def correlateOuter(events: DataFrame,
                     withinSeconds: Long = 600,
                     watermark: String = "10 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
      .withWatermark("e_ts", watermark)
    errors.join(purchases,
      col("p_user") === col("e_user") &&
        col("p_ts") <= col("e_ts") &&
        col("p_ts") >= col("e_ts") - expr(s"INTERVAL $withinSeconds SECONDS"),
      "leftOuter")
      .select(col("e_user").as("user_id"), col("error_id"), col("e_ts"),
        col("purchase_id"), col("p_ts"))
  }

  /** A subscriber = name + table/event-type regexp (the per-client filter of
    * `Listen`, reference `pqstream.proto:12-15`) + sink directory.
    */
  case class Subscription(name: String, eventTypeRegexp: String, path: String)

  /** Fan-out as ONE independent streaming query per subscriber over the same
    * source — the multicast of `server.go:249-253` without the slow-consumer
    * head-of-line blocking: each query has its own checkpoint and offsets, so
    * a slow or failing sink delays/replays only itself (a single foreachBatch
    * writing all sinks sequentially would stall every subscriber on the
    * slowest one and duplicate earlier sinks' appends when a later sink's
    * failure forces batch replay). File sinks are exactly-once per query via
    * the sink's own transaction log.
    */
  def fanOut(events: DataFrame, subs: Seq[Subscription],
             checkpoint: String): Seq[org.apache.spark.sql.streaming.StreamingQuery] =
    subs.map { s =>
      events.filter(col("event_type").rlike(s.eventTypeRegexp))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$checkpoint/${s.name}")
        .option("path", s.path)
        .format("parquet")
        .start()
    }
}
