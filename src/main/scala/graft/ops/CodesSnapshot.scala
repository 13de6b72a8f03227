package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-isolated commits for the persisted codes artifacts — the
  * concurrent-reader contract the in-place dynamic-partition-overwrite
  * lifecycle could not give: a reader planned mid-rewrite used to be able
  * to list SOME list partitions before the overwrite and some after (a
  * torn view — silently wrong answers), because a catalog table's file
  * listing happens lazily at physical planning. Here every mutation is
  * staged as APPEND-ONLY data files (invisible to any reader), then made
  * visible by ONE atomic commit: writing manifest `m-%06d.txt` via
  * create-new rename — the classic lakehouse metadata-pointer swap
  * (Iceberg/Delta's core idea, reduced to what a codes artifact needs).
  * The current snapshot is simply the manifest with the highest version;
  * a reader resolves it ONCE (a bounded driver-side read) and plans over
  * exactly that file set, so it observes the old artifact in full or the
  * new one in full — never a mix.
  *
  * What happens to superseded files is the caller's policy, and the two
  * maintenance verbs deliberately differ:
  *  - ERASURE vacuums immediately — compliance wins over availability:
  *    pre-erase bytes must not survive the call, so a reader still
  *    holding the pre-swap snapshot fails LOUDLY on the vacuumed files
  *    (a crash, never a torn or stale-and-silent answer).
  *  - COMPACTION may defer ([[Similarity.compactPqCodesReport]]'s
  *    `vacuum = false`) — in-flight readers keep their snapshot readable
  *    until an explicit [[vacuum]] reclaims unreferenced files.
  *
  * Manifest layout, inside the artifact's own table directory:
  * {{{
  *   <loc>/list=<l>/part-*.parquet        data files (append-only)
  *   <loc>/_graft_manifests/m-000001.txt  one relative data-file path/line
  * }}}
  * The `_`-prefixed dir is invisible to Spark's file index, so catalog
  * reads of the table keep working untouched. Single-writer discipline
  * (one maintenance session), as everywhere in this artifact lifecycle;
  * the create-new rename makes a racing second writer fail loudly rather
  * than corrupt.
  */
private[graft] object CodesSnapshot {

  final case class Snapshot(version: Int, root: Path, files: Seq[String]) {
    def absolute: Seq[String] = files.map(f => new Path(root, f).toString)
    /** files pruned to the given list partitions — manifest-level static
      * pruning: the plan never even lists the unprobed lists' files */
    def prunedTo(lists: Seq[Long]): Snapshot = {
      val keep = lists.map(l => s"list=$l/").toSet
      copy(files = files.filter(f => keep.exists(f.startsWith)))
    }
    def listsHeld: Seq[Long] =
      files.flatMap(ListDir.findFirstMatchIn(_).map(_.group(1).toLong)).distinct.sorted
  }

  private val ListDir = "^list=(-?\\d+)/".r
  private val ManifestName = "^m-(\\d{6})\\.txt$".r

  private def manifestDir(root: Path) = new Path(root, "_graft_manifests")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All data files currently ON DISK, as root-relative paths — the
    * physical truth, independent of any manifest (used to diff before and
    * after an append stage, and by [[vacuum]]).
    */
  def dataFiles(spark: SparkSession, root: Path): Seq[String] = {
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("list="))
      .flatMap { d =>
        fs.listStatus(d.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(f => s"${d.getPath.getName}/${f.getPath.getName}")
      }
      .sorted
  }

  /** All committed manifest versions on disk, ascending. */
  def versions(spark: SparkSession, root: Path): Seq[Int] = {
    val fs = fsOf(spark, root)
    val dir = manifestDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(s =>
      ManifestName.findFirstMatchIn(s.getPath.getName).map(_.group(1).toInt))
      .sorted
  }

  private def readManifest(spark: SparkSession, root: Path, v: Int): Snapshot = {
    val fs = fsOf(spark, root)
    val in = fs.open(new Path(manifestDir(root), f"m-$v%06d.txt"))
    val files =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    Snapshot(v, root, files)
  }

  /** A SPECIFIC committed snapshot — time travel: a reader that pins a
    * version sees that commit's file set exactly, provided retention has
    * kept it ([[vacuum]]'s `keepLast` / an erasure expires history; a
    * vacuumed version returns None, never a torn or partial view).
    */
  def at(spark: SparkSession, root: Path, version: Int): Option[Snapshot] =
    if (versions(spark, root).contains(version))
      Some(readManifest(spark, root, version))
    else None

  /** The retained commit log, newest last: (version, file count, rough
    * byte size of the referenced data files) — bounded driver-side
    * metadata (manifests are text files of relative paths). File sizes
    * come from ONE directory listing built up front (files shared across
    * versions — the common case, commits are incremental — are stat'ed
    * once, not once per version; per-file exists+stat round-trips would
    * make this serial metadata I/O on an object store).
    */
  def history(spark: SparkSession, root: Path): Seq[(Int, Int, Long)] = {
    val fs = fsOf(spark, root)
    val sizes: Map[String, Long] =
      if (!fs.exists(root)) Map.empty
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("list="))
        .flatMap { d =>
          fs.listStatus(d.getPath).toSeq.filter(_.isFile)
            .map(f => s"${d.getPath.getName}/${f.getPath.getName}" -> f.getLen)
        }.toMap
    versions(spark, root).map { v =>
      val snap = readManifest(spark, root, v)
      (v, snap.files.size, snap.files.map(sizes.getOrElse(_, 0L)).sum)
    }
  }

  private def retentionFile(root: Path) = new Path(manifestDir(root), "retention.txt")

  /** STANDING retention policy for this artifact — how many snapshot
    * versions a default [[vacuum]] keeps time-travel readable. Persisted
    * next to the manifests so the policy survives sessions and is honored
    * by maintenance verbs that vacuum as a side effect (a compaction must
    * not silently destroy history a deployment asked to keep). Absent =
    * 1 (only the current snapshot — the pre-retention semantics).
    */
  def setRetention(spark: SparkSession, root: Path, keepLast: Int): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val fs = fsOf(spark, root)
    fs.mkdirs(manifestDir(root))
    val out = fs.create(retentionFile(root), true)
    try out.write(s"$keepLast\n".getBytes("UTF-8")) finally out.close()
  }

  def retention(spark: SparkSession, root: Path): Int = {
    val fs = fsOf(spark, root)
    val f = retentionFile(root)
    if (!fs.exists(f)) 1
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    }
  }

  /** The highest-version manifest, if any commit ever happened. */
  def current(spark: SparkSession, root: Path): Option[Snapshot] = {
    val vs = versions(spark, root)
    if (vs.isEmpty) None else Some(readManifest(spark, root, vs.max))
  }

  /** The current snapshot, ADOPTING a pre-manifest artifact on first
    * contact: an artifact built before the snapshot layer (or by an older
    * session) has data files but no manifest — its on-disk files become
    * snapshot v1, so every lifecycle verb (including [[vacuum]], whose
    * keep-set would otherwise be EMPTY and delete the whole artifact)
    * starts from a truthful baseline. One helper, one adoption policy —
    * not a per-call-site copy that can drift.
    */
  def currentOrAdopt(spark: SparkSession, root: Path): Snapshot =
    current(spark, root).getOrElse {
      commit(spark, root, dataFiles(spark, root))
      current(spark, root).get
    }

  /** Atomically publish a new snapshot listing exactly `files` (relative
    * paths). The write goes to a RANDOMIZED `.tmp` (a crash between create
    * and rename leaves orphan scratch — reclaimed by [[vacuum]] — never a
    * deterministic name that would wedge every later commit with
    * FileAlreadyExists), then renames to the FINAL versioned name —
    * create-new rename is atomic on POSIX and HDFS, so a reader either
    * sees the complete new manifest or still resolves the previous one;
    * there is no intermediate state, and a racing second writer loses the
    * rename LOUDLY. Returns the committed version.
    */
  def commit(spark: SparkSession, root: Path, files: Seq[String]): Int = {
    val fs = fsOf(spark, root)
    val dir = manifestDir(root)
    fs.mkdirs(dir)
    val next = current(spark, root).map(_.version).getOrElse(0) + 1
    val tmp = new Path(dir,
      f"m-$next%06d.txt.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write((files.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val fin = new Path(dir, f"m-$next%06d.txt")
    require(fs.rename(tmp, fin),
      s"snapshot commit lost the publish race for $fin — a second writer " +
        "is mutating this artifact; the lifecycle is single-writer")
    next
  }

  /** Read a snapshot as a DataFrame. `schema` must be the table's catalog
    * schema INCLUDING the `list` partition column, so partition values
    * parse to the declared type and filters on `list` stay partition
    * filters. An empty snapshot reads as an empty frame of that schema.
    */
  def read(spark: SparkSession, snap: Snapshot,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read
      .option("basePath", snap.root.toString)
      .schema(schema)
      .parquet(snap.absolute: _*)

  /** Drop all but the newest `keepLast` manifests — the retention knob of
    * the commit log. Expiring a manifest removes only METADATA (the
    * version stops being time-travel addressable); the files it alone
    * referenced become reclaimable by the next [[vacuum]]. Returns the
    * expired versions.
    */
  def expire(spark: SparkSession, root: Path, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val fs = fsOf(spark, root)
    val doomed = versions(spark, root).dropRight(keepLast)
    doomed.foreach(v =>
      fs.delete(new Path(manifestDir(root), f"m-$v%06d.txt"), false))
    doomed
  }

  /** Delete every data file NOT referenced by any RETAINED manifest (and
    * any list directory left empty), returning the removed relative paths.
    * `keepLast` bounds the retained commit log first ([[expire]]):
    * `None` (the default) honors the artifact's STANDING [[retention]]
    * policy — so maintenance verbs that vacuum as a side effect
    * (compaction) can never silently destroy history a deployment asked
    * to keep — while an explicit value overrides it for THIS call:
    * erasure passes `Some(1)` (compliance expires all history,
    * policy notwithstanding). With one version retained, the physical
    * directory and the snapshot agree file-for-file after the vacuum —
    * the invariant that keeps plain catalog reads of the table exact;
    * with more retained, only files NO kept version references are
    * reclaimed, so time-travel reads of the kept versions stay exact.
    */
  def vacuum(spark: SparkSession, root: Path,
             keepLast: Option[Int] = None): Seq[String] = {
    val fs = fsOf(spark, root)
    // ADOPT before reclaiming: a pre-manifest artifact's keep-set must be
    // its own files, never the empty set (which would reclaim EVERYTHING)
    currentOrAdopt(spark, root)
    expire(spark, root, keepLast.getOrElse(retention(spark, root)))
    val keep = versions(spark, root)
      .flatMap(v => readManifest(spark, root, v).files).toSet
    val doomed = dataFiles(spark, root).filterNot(keep)
    doomed.foreach(f => fs.delete(new Path(root, f), false))
    // a list dir holding no data files anymore is dropped entirely
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("list="))
      .filter(d => fs.listStatus(d.getPath).forall(f =>
        f.getPath.getName.startsWith("_") || f.getPath.getName.startsWith(".")))
      .foreach(d => fs.delete(d.getPath, true))
    // crash-orphaned commit scratch (randomized .tmp names) goes too
    val mdir = manifestDir(root)
    if (fs.exists(mdir))
      fs.listStatus(mdir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".tmp"))
        .foreach(s => fs.delete(s.getPath, false))
    doomed
  }
}
