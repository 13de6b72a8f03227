package graft

import graft.ops.{CodesSnapshot, Similarity}
import org.apache.spark.sql.functions._

/** The codes artifacts' STAGE-AND-SWAP concurrent-reader contract
  * ([[CodesSnapshot]]): a reader binds to one committed manifest and sees
  * the old artifact in full or the new one in full — never the torn
  * per-partition mix the old in-place dynamic overwrite allowed. Pins:
  * visibility flips ONLY at the atomic manifest commit (staged files are
  * invisible); a deferred-vacuum compaction keeps the pre-swap snapshot
  * byte-readable until [[Similarity.vacuumPqCodes]] reclaims it; an
  * ERASURE vacuums in the same call, so no pre-erase byte survives in ANY
  * file on disk; and the lifecycle answers are unchanged (parity with the
  * from-scratch encode).
  */
class CodesSwapSpec extends SparkSuite {

  private def corpus(prefix: String, growable: Boolean = false): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    if (growable)
      Tables.load(spark, sf, "embeddings").write.parquet(s"$dir/embeddings.parquet")
    else
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/embeddings.parquet"),
        java.nio.file.Paths.get(s"$dir/embeddings.parquet"))
    dir
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select(col("vec_id"), col("codes"), col("list"))
      .collect().map(_.toSeq).toSet

  private def readFiles(root: org.apache.hadoop.fs.Path,
                        files: Seq[String]): org.apache.spark.sql.DataFrame =
    spark.read.option("basePath", root.toString)
      .parquet(files.map(f => new org.apache.hadoop.fs.Path(root, f).toString): _*)

  test("visibility flips only at the manifest commit: staged files are invisible to snapshot readers") {
    val dir = corpus("swap_commit")
    val name = Similarity.ensurePqCodes(spark, dir)
    val root = Similarity.artifactLoc(spark, name.split('.').last)
    val snapA = CodesSnapshot.current(spark, root).get
    val contentA = rowsOf(readFiles(root, snapA.files))
    assert(contentA.nonEmpty)

    // STAGE: append new rows straight into the partition dirs — the write
    // a maintenance verb performs before its commit
    val staged = spark.table(name).orderBy(col("vec_id")).limit(3)
      .select((col("vec_id") + 900000L).as("vec_id"), col("codes"), col("list"))
    staged.write.mode("append").insertInto(name)
    val afterStage = CodesSnapshot.dataFiles(spark, root)
    val newFiles = afterStage.filterNot(snapA.files.toSet)
    assert(newFiles.nonEmpty, "stage produced no files")

    // pre-commit: the current snapshot is UNCHANGED — a reader resolving
    // now still plans exactly the old file set and reads the old content
    val stillA = CodesSnapshot.current(spark, root).get
    assert(stillA.version == snapA.version && stillA.files == snapA.files,
      "staged (uncommitted) files leaked into the current snapshot")
    assert(rowsOf(readFiles(root, stillA.files)) == contentA)

    // SWAP: one atomic commit — and only now do readers see the new rows
    CodesSnapshot.commit(spark, root, snapA.files ++ newFiles)
    val snapB = CodesSnapshot.current(spark, root).get
    assert(snapB.version == snapA.version + 1)
    val contentB = rowsOf(readFiles(root, snapB.files))
    assert(contentB == contentA ++ rowsOf(staged),
      "post-commit snapshot is not old-plus-staged")
  }

  test("compact(vacuum = false): pre-swap snapshot stays byte-readable until vacuumPqCodes reclaims it") {
    val dir = corpus("swap_compact", growable = true)
    val name = Similarity.ensurePqCodes(spark, dir)
    val base = Tables.load(spark, sf, "embeddings")
    (1 to 5).foreach { w =>
      base.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + lit(100000L * w)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f + w)).as("embedding"))
        .write.mode("append").parquet(s"$dir/embeddings.parquet")
      assert(Similarity.refreshPqCodes(spark, dir) > 0L)
    }
    val root = Similarity.artifactLoc(spark, name.split('.').last)
    val snapA = CodesSnapshot.current(spark, root).get
    val contentA = rowsOf(readFiles(root, snapA.files))

    val n = Similarity.compactPqCodes(spark, dir, vacuum = false)
    assert(n > 0L, "fixture failed to fragment")

    // the in-flight reader's view: its pre-swap snapshot reads in FULL,
    // byte-identical — the old files are retained until an explicit vacuum
    assert(rowsOf(readFiles(root, snapA.files)) == contentA,
      "deferred-vacuum compaction broke the pre-swap snapshot")
    // the new reader's view: same rows, coalesced files, higher version
    val snapB = CodesSnapshot.current(spark, root).get
    assert(snapB.version > snapA.version)
    assert(rowsOf(readFiles(root, snapB.files)) == contentA,
      "compaction changed artifact contents")
    assert(snapB.files.size < snapA.files.size)

    // reclaim: superseded files go, the current snapshot still serves, and
    // plain catalog reads agree with it again (directory == manifest)
    val removed = Similarity.vacuumPqCodes(spark, dir)(name)
    assert(removed.nonEmpty, "vacuum reclaimed nothing")
    assert(removed.toSet.subsetOf(snapA.files.toSet))
    assert(rowsOf(readFiles(root, snapB.files)) == contentA)
    assert(rowsOf(spark.table(name)) == contentA)
    intercept[Exception](readFiles(root, snapA.files).collect())
  }

  test("vacuum on a pre-manifest artifact ADOPTS before reclaiming — it must never delete the whole artifact") {
    val dir = corpus("swap_premanifest")
    val name = Similarity.ensurePqCodes(spark, dir)
    val root = Similarity.artifactLoc(spark, name.split('.').last)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the pre-snapshot deployment: data files, NO manifests
    fs.delete(new org.apache.hadoop.fs.Path(root, "_graft_manifests"), true)
    assert(CodesSnapshot.current(spark, root).isEmpty, "fixture broke")
    val rows = rowsOf(spark.table(name))
    val removed = Similarity.vacuumPqCodes(spark, dir)(name)
    // nothing is superseded: the keep-set must be the ADOPTED files, not ∅
    assert(removed.isEmpty,
      s"vacuum reclaimed a pre-manifest artifact's live data: $removed")
    assert(rowsOf(spark.table(name)) == rows, "vacuum lost artifact rows")
    val adopted = CodesSnapshot.current(spark, root)
    assert(adopted.nonEmpty && adopted.get.files.nonEmpty,
      "vacuum did not adopt the pre-manifest files as a snapshot")
  }

  test("census after a deferred-vacuum compaction counts snapshot rows, not doubled directory rows") {
    import graft.streaming.EraseEverywhere
    val dir = corpus("swap_census", growable = true)
    val name = Similarity.ensurePqCodes(spark, dir)
    val base = Tables.load(spark, sf, "embeddings")
    (1 to 5).foreach { w =>
      base.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + lit(100000L * w)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f + w)).as("embedding"))
        .write.mode("append").parquet(s"$dir/embeddings.parquet")
      assert(Similarity.refreshPqCodes(spark, dir) > 0L)
    }
    // pick the victim from the MOST fragmented list — the one compaction
    // will rewrite, leaving its superseded files on disk
    val root = Similarity.artifactLoc(spark, name.split('.').last)
    val preFiles = CodesSnapshot.current(spark, root).get.files
    val ListPrefix = "^list=(-?\\d+)/".r
    val fragList = preFiles
      .flatMap(f => ListPrefix.findFirstMatchIn(f).map(_.group(1).toLong))
      .groupBy(identity).maxBy(_._2.size)._1
    val victim = spark.table(name).filter(col("list") === fragList)
      .select(col("vec_id")).orderBy(col("vec_id")).first().getLong(0)

    assert(Similarity.compactPqCodes(spark, dir, vacuum = false) > 0L)
    // the double-count is REAL through the catalog (old + new files)...
    assert(spark.table(name).filter(col("vec_id") === victim).count() == 2L,
      "fixture broke: deferred vacuum left no superseded copy")
    // ...and the census must NOT inherit it: it reads the snapshot
    val store = EraseEverywhere.PqCodes("codes", dir)
    val found = store.foundBy(spark, Map(victim -> 0L))
    assert(found == Map(victim -> 1L),
      s"census double-counted deferred-vacuum leftovers: $found")
  }

  test("time travel: history lists retained commits; a pinned version reads as committed; retention expires it loudly") {
    val dir = corpus("swap_history", growable = true)
    val name = Similarity.ensurePqCodes(spark, dir)
    val root = Similarity.artifactLoc(spark, name.split('.').last)
    val v1 = CodesSnapshot.current(spark, root).get
    assert(v1.version == 1)
    val contentV1 = rowsOf(readFiles(root, v1.files))

    Tables.load(spark, sf, "embeddings").filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.refreshPqCodes(spark, dir) > 0L)
    val contentV2 = rowsOf(spark.table(name))
    assert(contentV2.size > contentV1.size)

    val kind = Similarity.CodesKind.Sampled
    val hist = Similarity.codesHistory(spark, dir).collect()
      .filter(r => r.getString(0) == name)
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(hist.map(_._2).toSeq == Seq(1, 2), s"commit log diverged: ${hist.toSeq}")
    assert(hist.forall(h => h._1 == kind && h._3 > 0L && h._4 > 0L))

    // pinned reads: each retained version exactly as committed
    assert(rowsOf(Similarity.readCodesAsOf(spark, dir, kind, 1)) == contentV1)
    assert(rowsOf(Similarity.readCodesAsOf(spark, dir, kind, 2)) == contentV2)

    // keepLast = 2 retains both (refresh is append-only — nothing reclaimable)
    assert(Similarity.vacuumPqCodes(spark, dir, Some(2))(name).isEmpty)
    assert(rowsOf(Similarity.readCodesAsOf(spark, dir, kind, 1)) == contentV1)

    // retention to 1: the old version expires, its pinned read fails LOUDLY
    // naming the retained range; the current version is untouched
    Similarity.vacuumPqCodes(spark, dir, Some(1))
    val e = intercept[IllegalArgumentException](
      Similarity.readCodesAsOf(spark, dir, kind, 1))
    assert(e.getMessage.contains("retained versions: [2]"), e.getMessage)
    assert(rowsOf(Similarity.readCodesAsOf(spark, dir, kind, 2)) == contentV2)
    // pinning a version that never existed is the same loud contract
    intercept[IllegalArgumentException](
      Similarity.readCodesAsOf(spark, dir, kind, 99))
  }

  test("standing retention=2 survives a vacuum-true compaction; tightening the policy reclaims") {
    val dir = corpus("swap_retention", growable = true)
    val name = Similarity.ensurePqCodes(spark, dir)
    val base = Tables.load(spark, sf, "embeddings")
    (1 to 5).foreach { w =>
      base.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + lit(100000L * w)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f + w)).as("embedding"))
        .write.mode("append").parquet(s"$dir/embeddings.parquet")
      assert(Similarity.refreshPqCodes(spark, dir) > 0L)
    }
    val root = Similarity.artifactLoc(spark, name.split('.').last)
    val preSwap = CodesSnapshot.current(spark, root).get
    val content = rowsOf(readFiles(root, preSwap.files))

    // the STANDING policy: keep 2 versions — honored by every default
    // vacuum, INCLUDING the one compactPqCodes(vacuum = true) runs as a
    // side effect: a routine compaction must not destroy retained history
    assert(Similarity.setCodesRetention(spark, dir, 2) == Seq(name))
    assert(Similarity.compactPqCodes(spark, dir) > 0L) // vacuum = true
    val kind = Similarity.CodesKind.Sampled
    assert(rowsOf(Similarity.readCodesAsOf(spark, dir, kind, preSwap.version))
      == content,
      "a vacuum-true compaction destroyed history the standing policy retains")

    // a default (policy-honoring) vacuum reclaims nothing either
    assert(Similarity.vacuumPqCodes(spark, dir)(name).isEmpty,
      "policy-honoring vacuum reclaimed files a retained version references")

    // tighten the policy to 1: the superseded fragments go, current serves
    Similarity.setCodesRetention(spark, dir, 1)
    val removed = Similarity.vacuumPqCodes(spark, dir)(name)
    assert(removed.nonEmpty && removed.toSet.subsetOf(preSwap.files.toSet))
    intercept[IllegalArgumentException](
      Similarity.readCodesAsOf(spark, dir, kind, preSwap.version))
    assert(rowsOf(spark.table(name)) == content)
  }

  test("erasure expires ALL history: no retained version can resurrect erased bytes") {
    val dir = corpus("swap_erase_hist", growable = true)
    val name = Similarity.ensurePqCodes(spark, dir)
    Tables.load(spark, sf, "embeddings").filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.refreshPqCodes(spark, dir) > 0L)
    val root = Similarity.artifactLoc(spark, name.split('.').last)
    assert(CodesSnapshot.versions(spark, root) == Seq(1, 2))

    // a standing keep-5 policy must NOT shield history from an erasure —
    // compliance overrides retention by design
    Similarity.setCodesRetention(spark, dir, 5)
    val victim = spark.table(name).orderBy(col("vec_id")).first().getLong(0)
    assert(Similarity.erasePqCodes(spark, dir, Set(victim)) == 1L)
    // exactly one retained version — the post-erase one; pinned reads of
    // the pre-erase commits are gone with their bytes
    val retained = CodesSnapshot.versions(spark, root)
    assert(retained.size == 1, s"erasure left history retained: $retained")
    val kind = Similarity.CodesKind.Sampled
    intercept[IllegalArgumentException](
      Similarity.readCodesAsOf(spark, dir, kind, 1))
    assert(rowsOf(Similarity.readCodesAsOf(spark, dir, kind, retained.head))
      .forall(_.head.asInstanceOf[Long] != victim))
  }

  test("erasure vacuums in the same call: no pre-erase byte survives in any file on disk") {
    val dir = corpus("swap_erase")
    val name = Similarity.ensurePqCodes(spark, dir)
    val root = Similarity.artifactLoc(spark, name.split('.').last)
    val before = CodesSnapshot.current(spark, root).get
    val victims = spark.table(name).orderBy(col("vec_id")).limit(3)
      .collect().map(_.getLong(0)).toSet

    val n = Similarity.erasePqCodes(spark, dir, victims)
    assert(n == victims.size.toLong)

    // the swap happened (version moved) and the DIRECTORY holds no file —
    // referenced or stray — containing a victim row: compliance means the
    // bytes are gone, not merely unreferenced
    val after = CodesSnapshot.current(spark, root).get
    assert(after.version == before.version + 1)
    val allOnDisk = CodesSnapshot.dataFiles(spark, root)
    assert(allOnDisk.toSet == after.files.toSet,
      "stray files on disk after an erasure (vacuum must be immediate)")
    val survivors = rowsOf(readFiles(root, allOnDisk))
    assert(survivors.forall(r => !victims.contains(r.head.asInstanceOf[Long])),
      "a pre-erase byte survived on disk")
    assert(rowsOf(spark.table(name)) == survivors)
  }
}
