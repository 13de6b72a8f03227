package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** ONE-CALL entity erasure across EVERY durable copy — the orchestration
  * layer over the per-store pieces that existed separately through r11:
  * archive tombstones ([[graft.sources.Layout.eraseEntities]]), the
  * erasure-set publication ([[StateErasure.erasureSet]]), sentinel
  * injection through the live feed ([[StateErasure.eraseSentinels]]), the
  * in-place transformWithState removal
  * ([[CdcStream.ErasingPrevImageProcessor]]), the offline rewrites for the
  * classic/generic layouts, and the fingerprint-store filters. A production
  * user had to sequence five calls across the archive and N checkpoints to
  * erase one user everywhere — and nothing verified they did it completely.
  * (The reference never had this problem because it never had durable
  * state, `server.go` holds nothing across restarts; an engine that sells
  * durable state has to ship the complete compliance composition.)
  *
  * [[run]] drives the full sequence:
  *
  *  1. BEFORE census — each target read through its own state reader (the
  *     archive through a parquet scan), counting the requested entities'
  *     artifacts. This is the evidence row "we had N copies".
  *  1. Archive erasure — [[graft.sources.Layout.eraseEntities]]: affected
  *     (day, op) partitions rewritten, null keys survive, tombstones
  *     recorded with a pre-rewrite cutoff (replay resurrection blocked).
  *  1. Erasure-set publication — the tombstones read back as
  *     (user → cutoff); a requested user the archive never held gets the
  *     archive's max event id as a synthesized cutoff (nothing of theirs
  *     is replayable, so any cutoff at-or-above live ids is safe).
  *  1. Per-store recipe dispatch — each [[Store]] applies ITS deployment's
  *     recipe (see the subtypes); in-place stores get sentinels inserted
  *     through the REAL feed first so never-recurring keys are reached.
  *  1. AFTER census + completeness report — every target re-read; the
  *     returned frame is one row per store: (store, found_before,
  *     found_after). `found_after` must be all-zero; a non-zero row names
  *     exactly which copy survived.
  *
  * Restart idempotence: a re-call finds zero artifacts everywhere, the
  * archive locate pass finds nothing to rewrite, re-injected sentinels are
  * dropped by the handlers unconditionally, and the erasure receipts
  * (`erasedAt`) keep rebuilt post-erasure payloads intact — the report
  * reads (0, 0) per store.
  *
  * 100 TB posture: inherited from the pieces — the erasure set is bounded
  * by compliance requests (broadcast, not a join); the archive rewrite
  * touches affected partitions only; in-place state removal is bounded by
  * the erasure batch independent of store size (`EraseScaleBench`); the
  * offline rewrites are distributed frames end to end. The census scans
  * are one filtered read per store — the archive scan prunes on row-group
  * `user_id` stats, the state reads are one task per state partition.
  */
object EraseEverywhere {

  /** One durable store in the deployment, with the recipe the orchestrator
    * uses to erase it and the reader it uses to verify it. `erase` returns
    * the store to VERIFY — offline-rewrite stores move to the fresh
    * checkpoint their resumed query committed.
    */
  sealed trait Store {
    def name: String
    private[graft] def found(spark: SparkSession, erased: Map[Long, Long]): Long
    private[graft] def erase(spark: SparkSession, erased: Map[Long, Long]): Store
  }

  /** transformWithState prev-image state, erased IN PLACE on its existing
    * checkpoint (the scale-safe recipe — `EraseScaleBench` measured the
    * offline rewrite growing with store size while in-place stays flat).
    * The orchestrator inserts sentinel command rows into the captured
    * JDBC table itself (ids above the live max, so the source delivers
    * them — reaching keys that never recur), then runs `resumeErasing`:
    * the deployment's "bounce the query under
    * [[CdcStream.withPrevStateTwsErasing]] with this erasure set" action
    * (in production a config flip + restart; the handler drops sentinels
    * unconditionally and stamps `erasedAt` receipts, so the bounce is
    * idempotent).
    */
  final case class TwsInPlace(name: String, checkpointDir: String,
                              jdbcUrl: String, table: String,
                              resumeErasing: Map[Long, Long] => Unit)
      extends Store {
    private[graft] def found(spark: SparkSession, erased: Map[Long, Long]): Long =
      StateMigration.readPrevImageStateTws(spark, checkpointDir)
        .filter(kv => erased.contains(kv._1)).count()
    private[graft] def erase(spark: SparkSession, erased: Map[Long, Long]): Store = {
      insertSentinels(jdbcUrl, table, erased)
      resumeErasing(erased)
      this
    }
  }

  /** Classic flatMapGroupsWithState prev-image state: the offline-rewrite
    * recipe (the `GroupState[String]` layout has no room for an erasure
    * receipt). The orchestrator reads the checkpoint's state, anti-joins
    * the erased keys, hands the filtered frame to `resumeFrom` — the
    * deployment's "start the query on a FRESH checkpoint via
    * [[CdcStream.withPrevStateFrom]]" action, returning the new
    * checkpoint dir once the first batch commits — then DECOMMISSIONS the
    * old checkpoint directory (its files still hold the payload bytes;
    * leaving them is the compliance hole the one-call form exists to
    * close). Verification reads the new checkpoint.
    */
  final case class ClassicOffline(name: String, checkpointDir: String,
                                  resumeFrom: Dataset[(Long, String)] => String)
      extends Store {
    private[graft] def found(spark: SparkSession, erased: Map[Long, Long]): Long =
      StateMigration.readPrevImageState(spark, checkpointDir)
        .filter(kv => erased.contains(kv._1)).count()
    private[graft] def erase(spark: SparkSession, erased: Map[Long, Long]): Store = {
      val filtered = StateErasure.erasePrevImageState(spark, checkpointDir, erased.keySet)
      val fresh = resumeFrom(filtered)
      decommission(spark, checkpointDir, fresh)
      copy(checkpointDir = fresh)
    }
  }

  /** Generic row-key prev-image state ([[CdcStream.withPrevStateByRowKey]]):
    * same offline-rewrite recipe as [[ClassicOffline]], but the erased
    * entity is named by its ROW KEYS in the dynamic payload — `rowKeysOf`
    * is the deployment's user→natural-keys mapping (e.g. the key strings
    * of the user's rows across captured tables).
    */
  final case class GenericOffline(name: String, checkpointDir: String,
                                  rowKeysOf: Set[Long] => Set[String],
                                  resumeFrom: Dataset[(String, String)] => String)
      extends Store {
    private[graft] def found(spark: SparkSession, erased: Map[Long, Long]): Long = {
      val keys = rowKeysOf(erased.keySet)
      StateMigration.readPrevImageStateByRowKey(spark, checkpointDir)
        .filter(kv => keys.contains(kv._1)).count()
    }
    private[graft] def erase(spark: SparkSession, erased: Map[Long, Long]): Store = {
      val filtered = StateErasure.erasePrevImageStateByRowKey(
        spark, checkpointDir, rowKeysOf(erased.keySet))
      val fresh = resumeFrom(filtered)
      decommission(spark, checkpointDir, fresh)
      copy(checkpointDir = fresh)
    }
  }

  /** Text-dedup band-bucket store ([[DedupStream.candidates]]): exemplar
    * entries whose doc belongs to the erased entity are filtered out
    * offline, the stream resumes through `resumeFrom`
    * ([[DedupStream.candidatesFrom]] on a fresh checkpoint), and the old
    * checkpoint is decommissioned. `docsOf` maps the erasure set to the
    * entity's doc ids (identity by default — deployments where doc_id is
    * the user key).
    */
  final case class DedupBuckets(name: String, checkpointDir: String,
                                resumeFrom: Dataset[(String, Long)] => String,
                                docsOf: Set[Long] => Set[Long] = identity)
      extends Store {
    private[graft] def found(spark: SparkSession, erased: Map[Long, Long]): Long = {
      val docs = docsOf(erased.keySet)
      StateMigration.readDedupBucketState(spark, checkpointDir)
        .filter(kv => docs.contains(kv._2)).count()
    }
    private[graft] def erase(spark: SparkSession, erased: Map[Long, Long]): Store = {
      val filtered = StateErasure.eraseDedupBucketState(
        StateMigration.readDedupBucketState(spark, checkpointDir), docsOf(erased.keySet))
      val fresh = resumeFrom(filtered)
      decommission(spark, checkpointDir, fresh)
      copy(checkpointDir = fresh)
    }
  }

  /** Media-dedup fingerprint store ([[DedupStream.fpVerifiedPairs]]):
    * erased docs' fingerprints filtered INSIDE each bucket, emptied
    * buckets dropped; resume via [[DedupStream.fpVerifiedPairsFrom]].
    */
  final case class MediaDedup(name: String, checkpointDir: String,
                              resumeFrom: Dataset[(String, DedupStream.FpBucketState)] => String,
                              docsOf: Set[Long] => Set[Long] = identity)
      extends Store {
    private[graft] def found(spark: SparkSession, erased: Map[Long, Long]): Long = {
      val docs = docsOf(erased.keySet)
      StateMigration.readMediaDedupState(spark, checkpointDir)
        .flatMap(_._2.exemplars.map(_.doc_id))(org.apache.spark.sql.Encoders.scalaLong)
        .filter(d => docs.contains(d)).count()
    }
    private[graft] def erase(spark: SparkSession, erased: Map[Long, Long]): Store = {
      val filtered = StateErasure.eraseMediaDedupState(
        StateMigration.readMediaDedupState(spark, checkpointDir), docsOf(erased.keySet))
      val fresh = resumeFrom(filtered)
      decommission(spark, checkpointDir, fresh)
      copy(checkpointDir = fresh)
    }
  }

  /** Semantic-dedup cluster-exemplar store ([[SemDedupStream.judged]]):
    * erased vectors' exemplars filtered per cluster; resume via
    * [[SemDedupStream.judgedFrom]]. `vecsOf` maps the erasure set to the
    * entity's vector ids.
    */
  final case class SemDedup(name: String, checkpointDir: String,
                            resumeFrom: Dataset[(Long, SemDedupStream.ClusterState)] => String,
                            vecsOf: Set[Long] => Set[Long] = identity)
      extends Store {
    private[graft] def found(spark: SparkSession, erased: Map[Long, Long]): Long = {
      val vecs = vecsOf(erased.keySet)
      StateMigration.readSemDedupState(spark, checkpointDir)
        .flatMap(_._2.ex.map(_.vec_id))(org.apache.spark.sql.Encoders.scalaLong)
        .filter(v => vecs.contains(v)).count()
    }
    private[graft] def erase(spark: SparkSession, erased: Map[Long, Long]): Store = {
      val filtered = StateErasure.eraseSemDedupState(
        StateMigration.readSemDedupState(spark, checkpointDir), vecsOf(erased.keySet))
      val fresh = resumeFrom(filtered)
      decommission(spark, checkpointDir, fresh)
      copy(checkpointDir = fresh)
    }
  }

  /** Sentinel command rows inserted into the CAPTURED TABLE ITSELF — the
    * "through the real feed" half the memory-harness specs stubbed: ids
    * allocated above the table's live max (so the monotone source actually
    * delivers them), `event_type = 'erase'`, null ts/props. The handler
    * drops them unconditionally, so they never become events — they exist
    * to make the stateful handler FIRE for keys that would otherwise never
    * recur. Retry-wrapped: the insert races the capture's own poller for
    * row locks, same as every other write to a live feed.
    */
  private[graft] def insertSentinels(url: String, table: String,
                                     erased: Map[Long, Long]): Unit = {
    require(JdbcFeed.isSafeIdent(table), s"unsafe table identifier: $table")
    if (erased.isEmpty) return
    JdbcFeed.withRetry() {
      val firstId = JdbcFeed.maxId(url, table, "event_id") + 1
      val sentinels = StateErasure.eraseSentinels(erased, firstId)
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val ps = conn.prepareStatement(
          s"INSERT INTO $table (event_id, ts, user_id, event_type, props)" +
            " VALUES (?, ?, ?, ?, ?)")
        sentinels.foreach { s =>
          ps.setLong(1, s.event_id)
          ps.setNull(2, java.sql.Types.TIMESTAMP)
          ps.setLong(3, s.user_id)
          ps.setString(4, s.event_type)
          ps.setNull(5, java.sql.Types.VARCHAR)
          ps.executeUpdate()
        }
      } finally conn.close()
    }
  }

  /** Offline-rewrite decommission: the OLD checkpoint's files still hold
    * the erased payload bytes after the resumed query commits on the
    * fresh one — deleting them is part of the erasure, not housekeeping.
    */
  private def decommission(spark: SparkSession, oldDir: String,
                           newDir: String): Unit = {
    require(newDir != oldDir,
      "offline-rewrite resume must land on a FRESH checkpoint " +
        s"(resumeFrom returned the old dir: $oldDir)")
    val p = new org.apache.hadoop.fs.Path(oldDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) require(fs.delete(p, true), s"failed to decommission $oldDir")
  }

  /** The one call: erase `userIds` from the archive and every configured
    * store, verify every copy, return the completeness report —
    * one row per target: (store, found_before, found_after), `"archive"`
    * first. All-zero `found_after` = the erasure is complete; a re-call
    * is a no-op reporting (0, 0) everywhere.
    */
  def run(spark: SparkSession, archivePath: String, userIds: Seq[Long],
          stores: Seq[Store]): DataFrame = {
    require(userIds.nonEmpty, "eraseEverywhere needs at least one entity")
    require(stores.map(_.name).distinct.size == stores.size,
      s"store names must be unique: ${stores.map(_.name)}")
    val users = userIds.distinct.sorted
    def archiveFound(): Long =
      spark.read.parquet(archivePath)
        .filter(col("user_id").isNotNull && col("user_id").isin(users: _*))
        .count()

    // BEFORE census (cutoffs don't matter to found(); 0L placeholders)
    val preSet = users.map(_ -> 0L).toMap
    val beforeArchive = archiveFound()
    val beforeStores = stores.map(s => s.found(spark, preSet))

    // archive erasure + tombstones (point-in-time cutoffs, replay guard)
    if (beforeArchive > 0)
      graft.sources.Layout.eraseEntities(spark, archivePath, users)

    // erasure-set publication: recorded cutoffs; a user the archive never
    // held gets the archive's max id (nothing of theirs is replayable)
    val recorded = StateErasure.erasureSet(spark, archivePath)
    val maxRow = spark.read.parquet(archivePath).agg(max(col("event_id"))).head()
    val fallback = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val set = users.map(u => u -> recorded.getOrElse(u, fallback)).toMap

    // per-store recipes, then the AFTER census on each store's verified
    // form. A store whose before-census found nothing is SKIPPED (after
    // re-read proves it stayed clean): the recipe's only purpose is
    // removing the requested entities' artifacts, so on a re-call no
    // checkpoint churns, no offline rewrite runs, and no extra sentinel
    // rows land in the live table — the no-op is structural, not just
    // observational.
    val afterStores = stores.zip(beforeStores).map { case (s, before) =>
      val verified = if (before == 0L) s else s.erase(spark, set)
      verified.found(spark, set)
    }

    val sq = spark
    import sq.implicits._
    (("archive", beforeArchive, archiveFound()) +:
      stores.zip(beforeStores.zip(afterStores)).map { case (s, (b, a)) =>
        (s.name, b, a)
      }).toDF("store", "found_before", "found_after")
  }
}
