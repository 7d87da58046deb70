package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-table maintenance on plain partitioned parquet, with a
  * MANIFEST-COMMITTED promote: every mutation (merge / delete / compact)
  * stages its rewritten partitions out of readers' sight, moves the new
  * files in ADDITIVELY (old files untouched), and then switches the
  * table's live-file set with ONE atomic rename of a manifest file — so a
  * reader that resolves through the manifest ([[readTable]]) observes the
  * table either fully pre-mutation or fully post-mutation, across ALL
  * partitions, no matter where a crash lands. This is the single-file
  * essence of what a log-based table format (Delta/Iceberg) provides,
  * without the format dependency:
  *
  *   - manifest = `_graft_manifest_v<N>` at the table root (underscore
  *     prefix: invisible to plain parquet listing), one relative data-file
  *     path per line; highest N wins. Written to a dot-prefixed temp file
  *     and renamed into place — rename-to-fresh-name is atomic on
  *     HDFS/POSIX semantics, and readers take max(N), so a half-written
  *     manifest (temp name) is never resolvable.
  *   - single writer assumed (the reference pipeline's model); concurrent
  *     READERS get snapshot isolation from the manifest switch.
  *   - one manifest file scales to ~10^6 files (≈100 MB of paths); beyond
  *     that, sharded manifests — true table-format territory.
  *
  * Crash matrix (recovery = re-run the mutation, or re-run
  * [[promoteStaged]] with the same staging dir — both safe, both
  * idempotent via the staging-id file prefix):
  *   - crash mid-STAGE: table + manifest untouched, staging dir is
  *     invisible garbage ([[vacuum]] collects it).
  *   - crash mid-MOVE: manifest still lists only pre-state files; the
  *     moved-in files are unreferenced orphans (manifest readers never
  *     see them; vacuum or the next promote's cleanup collects them).
  *   - crash between MANIFEST COMMIT and CLEANUP: readers see the full
  *     post-state; displaced old files linger unreferenced until vacuum.
  *
  * TIME TRAVEL: mutations run with `retainHistory = true` keep every
  * superseded manifest and the files it references; [[readTableAsOf]]
  * resolves any retained version's exact snapshot (staging-id-prefixed
  * file names mean versions never collide). [[vacuum]] is the retention
  * terminator — it collapses history back to the current version.
  */
object LakeOps {

  private val ManifestPrefix = "_graft_manifest_v"

  /** MERGE INTO emulation: upsert `updates` (new keys insert, existing
    * keys replace) into a `partCol`-partitioned parquet table, rewriting
    * ONLY the partitions the batch touches:
    *
    *  1. the affected partition VALUES are collected (metadata-scale —
    *     one row per touched partition);
    *  2. the base read is filtered to those values, so partition pruning
    *     keeps every untouched partition unread;
    *  3. matched keys drop via a left-anti join, the update batch unions
    *     in, and the merged partitions are written to a STAGING directory
    *     ([[stageMerge]]) — a dot-prefixed child of the table dir, which
    *     parquet listing ignores, so readers never see it. A crash
    *     anywhere in the expensive data write leaves the table
    *     byte-identical;
    *  4. [[promoteStaged]] moves the staged files in and commits the new
    *     live-file set with one atomic manifest rename (see object doc).
    *
    * At 100 TB this is the difference between a full-table rewrite and
    * touching the day's partitions. Clustering by `partCol` before the
    * write keeps one writer per partition (no tasks x partitions file
    * spray). */
  def mergeInto(spark: SparkSession, sinkDir: String, updates: DataFrame,
                keyCol: String, partCol: String,
                retainHistory: Boolean = false): Unit = {
    val staging = stageMerge(spark, sinkDir, updates, keyCol, partCol)
    promoteStaged(spark, sinkDir, staging, retainHistory = retainHistory)
  }

  /** Phase 1: materialize the merged touched partitions under
    * `sinkDir/.graft_staging_<nanos>` and return that path. The base
    * table is only READ (through the manifest, so orphans from a crashed
    * earlier promote are never double-counted); nothing under `sinkDir`
    * visible to a reader is created, changed, or deleted. */
  def stageMerge(spark: SparkSession, sinkDir: String, updates: DataFrame,
                 keyCol: String, partCol: String): String = {
    val affected = updates.select(partCol).distinct().collect().map(_.get(0))
    // bootstrap: a missing or empty table (no data files — e.g. a freshly
    // created sink) merges against an empty base with the updates' schema
    val base = scala.util.Try(readTable(spark, sinkDir))
      .getOrElse(updates.limit(0))
      .filter(col(partCol).isin(affected: _*))
    val merged = base.join(updates.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(updates.select(base.columns.map(col): _*))
    val staging = s"$sinkDir/.graft_staging_${System.nanoTime()}"
    merged.repartition(col(partCol))
      .write.mode("error").partitionBy(partCol).parquet(staging)
    staging
  }

  /** CONCURRENT-JOB-SAFE APPEND — the fix for the measured loss class
    * where N Spark jobs appending to one FS-backed table silently drop
    * each other's rows (the FS commit protocol stages every job under
    * the same `_temporary` dir and a committing job deletes the others'
    * pending task files; measured 26/150 rows lost at 4 writers,
    * docs/CLUSTER.md). Each append here:
    *
    *  1. stages its files under its OWN dot-prefixed dir (no shared
    *     `_temporary`, invisible to readers),
    *  2. moves them into the table root additively under
    *     staging-id-prefixed names (collision-free by construction),
    *  3. commits via an OPTIMISTIC-CONCURRENCY manifest CAS: read the
    *     live version v, publish v+1 = live entries + own files with an
    *     EXCLUSIVE-create primitive, and on losing the race re-read and
    *     retry on top of the winner — the Delta/Iceberg commit-loop
    *     shape. The publish is a hard link on `file:` filesystems
    *     (link(2) fails EEXIST atomically — plain rename REPLACES an
    *     existing name on POSIX, which would silently drop the racing
    *     winner's files) and a rename on HDFS-like filesystems (where
    *     rename-to-existing fails cleanly).
    *
    * Readers through [[readTable]] see every committed append exactly
    * once whatever the interleaving; a crash before the CAS leaves only
    * unreferenced files ([[vacuum]] collects them). Returns the
    * committed manifest version. */
  def appendConcurrent(spark: SparkSession, sinkDir: String,
                       batch: DataFrame, maxAttempts: Int = 64): Long = {
    val root = new Path(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val stagingId = java.util.UUID.randomUUID().toString.replace("-", "")
    val staging = new Path(root, s".graft_append_$stagingId")
    batch.write.mode("error").parquet(staging.toString)
    // additive move: our files become table-root residents but stay
    // unreferenced (invisible to manifest readers) until the CAS lands
    val ours = fs.listStatus(staging)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val destName = s"graft-$stagingId-${f.getPath.getName}"
        if (!fs.rename(f.getPath, new Path(root, destName)))
          throw new java.io.IOException(
            s"append move failed: ${f.getPath} -> $root/$destName")
        destName
      }.toSeq
    fs.delete(staging, true)
    var attempt = 0
    while (true) {
      attempt += 1
      if (attempt > maxAttempts)
        throw new java.io.IOException(
          s"appendConcurrent: lost the manifest race $maxAttempts times ($sinkDir)")
      // live pre-state WITHOUT freezePreState's bootstrap write (its
      // plain writeManifest rename is not CAS-safe): a never-promoted
      // table commits v1 directly through the exclusive publish below.
      // The directory listing includes racing appenders' already-moved
      // files; that is CORRECT — whoever wins the v1 race publishes the
      // union visible at its listing, and losers re-add their own files
      // on retry (entries are deduplicated).
      val (preV, preFiles) = currentManifest(fs, root) match {
        case Some((v, p)) => (v, readManifest(fs, p))
        case None => (0L, listDataFiles(fs, root))
      }
      val entries = (preFiles ++ ours).distinct.sorted
      if (publishExclusive(fs, root, preV + 1, entries)) return preV + 1
    }
    -1L // unreachable
  }

  /** Exclusive (fail-if-exists) manifest publish — the CAS arm of
    * [[appendConcurrent]]: returns false when version `v` was taken by
    * a racer. Hard link on `file:` schemes (atomic EEXIST on POSIX),
    * rename elsewhere (HDFS rename-to-existing returns false). */
  private def publishExclusive(fs: FileSystem, root: Path, v: Long,
                               files: Seq[String]): Boolean = {
    val tmp = new Path(root, s".graft_manifest_tmp_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val out = fs.create(tmp, false)
    try out.write(
      (s"# graft manifest v$v\n" + files.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(root, s"$ManifestPrefix$v")
    val won =
      if ("file" == fs.getUri.getScheme) {
        val destFile = java.nio.file.Paths.get(
          fs.makeQualified(dest).toUri.getPath)
        val tmpFile = java.nio.file.Paths.get(
          fs.makeQualified(tmp).toUri.getPath)
        try { java.nio.file.Files.createLink(destFile, tmpFile); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else !fs.exists(dest) && fs.rename(tmp, dest)
    // link publish leaves tmp as a second name for the same inode;
    // rename-failure leaves it orphaned — drop it either way
    if (fs.exists(tmp)) fs.delete(tmp, false)
    won
  }

  /** Right-to-be-forgotten DELETE: remove every row whose `keyCol` is in
    * `keys` (a one-column frame), rewriting ONLY the partitions that
    * contain at least one matching row — found with a column-pruned
    * (partCol, keyCol) scan semi-joined against the broadcast key set, so
    * untouched partitions are never read past their footers. A partition
    * whose every row is deleted produces NO staged directory; it is
    * passed to the promote as an explicit drop, so its files leave the
    * manifest in the same atomic switch. At 100 TB the cost profile is
    * the GDPR job's ideal: scan (2 columns) + rewrite only the
    * partitions the subjects appear in. */
  def deleteKeys(spark: SparkSession, sinkDir: String, keys: DataFrame,
                 keyCol: String, partCol: String,
                 retainHistory: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val base = readTable(spark, sinkDir)
    val affected = base.select(partCol, keyCol)
      .join(broadcast(keys), Seq(keyCol), "left_semi")
      .select(partCol).distinct().collect().map(_.get(0))
    if (affected.isEmpty) return
    val kept = base.filter(col(partCol).isin(affected: _*))
      .join(broadcast(keys), Seq(keyCol), "left_anti")
      .select(base.columns.map(col): _*)
    val staging = s"$sinkDir/.graft_staging_${System.nanoTime()}"
    kept.repartition(col(partCol))
      .write.mode("error").partitionBy(partCol).parquet(staging)
    promoteStaged(spark, sinkDir, staging,
      dropParts = affected.map(v => s"$partCol=$v").toSet,
      retainHistory = retainHistory)
  }

  /** Small-file COMPACTION — the other standing lake-maintenance job:
    * rewrite every partition's data clustered to ONE writer per
    * partition so each partition becomes a single right-sized file,
    * through the same stage + manifest-commit machinery. Row content is
    * byte-for-byte preserved — compaction only changes the file
    * layout. At 100 TB this runs per-partition incrementally; the single
    * parallel `repartition(partCol)` here is that same job fanned over
    * all partitions at once. */
  def compact(spark: SparkSession, sinkDir: String, partCol: String): Unit = {
    val staging = s"$sinkDir/.graft_staging_${System.nanoTime()}"
    readTable(spark, sinkDir)
      .repartition(col(partCol))
      .write.mode("error").partitionBy(partCol).parquet(staging)
    promoteStaged(spark, sinkDir, staging)
  }

  /** Phase 2: commit the staged mutation. Sub-phases (each individually
    * crash-safe — see the object doc's crash matrix):
    * freeze pre-state → move staged files in (additive) → atomic
    * manifest switch → cleanup. `dropParts` names partition directories
    * whose rows were deleted entirely (no staged replacement) — they
    * leave the manifest in the same switch. */
  def promoteStaged(spark: SparkSession, sinkDir: String, staging: String,
                    dropParts: Set[String] = Set.empty,
                    retainHistory: Boolean = false): Unit = {
    val root = new Path(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root) // first merge may be creating the table
    val pre = freezePreState(fs, root)
    val moved = moveStagedIn(fs, root, new Path(staging))
    commitManifest(fs, root, pre, moved, dropParts)
    if (retainHistory)
      // time-travel mode: superseded manifests and the data files they
      // reference stay on disk (readTableAsOf resolves them); only the
      // now-empty staging dir goes. Reclamation is vacuum()'s job.
      fs.delete(new Path(staging), true)
    else cleanup(fs, root, new Path(staging), pre, moved, dropParts)
  }

  /** Read a lake table through its manifest when one exists — the reader
    * contract that makes the promote atomic table-wide: the file set is
    * whatever the highest-version manifest lists, so a mid-promote crash
    * is invisible (orphaned moved-in files are not listed; displaced
    * not-yet-cleaned files still are). Falls back to plain directory
    * listing for never-promoted tables. */
  def readTable(spark: SparkSession, sinkDir: String): DataFrame = {
    val root = new Path(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    currentManifest(fs, root) match {
      case Some((_, mp)) =>
        val files = readManifest(fs, mp)
        require(files.nonEmpty, s"manifest lists no live files for $sinkDir")
        readEntries(spark, sinkDir, files)
      case None => spark.read.parquet(sinkDir)
    }
  }

  /** Read a manifest's entries: relative entries under the table root
    * with the root as basePath (partition-column discovery), ABSOLUTE
    * entries (shallow-clone borrows) grouped by their table root — the
    * grandparent of each `part=value/file` path — so every group keeps a
    * consistent basePath and partition inference, then unioned by
    * name. */
  private def readEntries(spark: SparkSession, sinkDir: String,
                          files: Seq[String]): DataFrame = {
    val (abs, rel) = files.partition(_.startsWith("/"))
    val frames = Seq.newBuilder[DataFrame]
    if (rel.nonEmpty)
      frames += spark.read.option("basePath", sinkDir)
        .parquet(rel.map(f => s"$sinkDir/$f"): _*)
    abs.groupBy(f => new Path(f).getParent.getParent.toString).toSeq.sortBy(_._1)
      .foreach { case (bp, fl) =>
        frames += spark.read.option("basePath", bp).parquet(fl.sorted: _*)
      }
    frames.result().reduce(_ unionByName _)
  }

  /** Time-travel read: resolve the table THROUGH A SPECIFIC manifest
    * version — available for every version since the last
    * non-retaining promote/vacuum when mutations ran with
    * `retainHistory = true`. The snapshot is exactly the file list that
    * version committed; because moved-in files are staging-id-prefixed,
    * versions never collide on file names and old snapshots stay
    * byte-identical while new versions land. */
  def readTableAsOf(spark: SparkSession, sinkDir: String, version: Long): DataFrame = {
    val root = new Path(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = allManifests(fs, root).collectFirst { case (v, p) if v == version => p }
      .getOrElse(throw new IllegalArgumentException(
        s"no manifest v$version for $sinkDir (retained: ${listVersions(spark, sinkDir).mkString(",")})"))
    val files = readManifest(fs, mp)
    require(files.nonEmpty, s"manifest v$version lists no live files for $sinkDir")
    readEntries(spark, sinkDir, files)
  }

  /** PARTITION-PRUNED change-feed scans between two retained versions:
    * rows can differ ONLY inside partitions whose FILE SET changed
    * between the manifests — a PK is unique per snapshot and lives in
    * its partition's files, and an untouched partition carries
    * byte-identical files in both manifests, so each of its rows joins
    * to itself as `unchanged` with delta 0. The manifest diff (pure
    * metadata, no data read) names the touched partitions; both
    * snapshot scans prune to them, and the untouched rows are COUNTED
    * from one footer-metadata scan of the shared files instead of
    * flowing through the diff join. At 100 TB this is the difference
    * between two full snapshot scans and two scans of the day's
    * changed partitions. Returns (prunedFrom, prunedTo,
    * unchangedRowCount). */
  def changeFeedScans(spark: SparkSession, sinkDir: String, from: Long,
      to: Long): (DataFrame, DataFrame, Long) = {
    val root = new Path(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def filesOf(v: Long): Seq[String] = {
      val mp = allManifests(fs, root).collectFirst { case (vv, p) if vv == v => p }
        .getOrElse(throw new IllegalArgumentException(
          s"no manifest v$v for $sinkDir (retained: ${listVersions(spark, sinkDir).mkString(",")})"))
      readManifest(fs, mp)
    }
    val mf = filesOf(from)
    val mt = filesOf(to)
    val changed = (mf.toSet diff mt.toSet) union (mt.toSet diff mf.toSet)
    val touched = changed.map(partOf)
    val (fT, rest) = mf.partition(f => touched(partOf(f)))
    val tT = mt.filter(f => touched(partOf(f)))
    def scan(files: Seq[String], all: Seq[String]): DataFrame =
      if (files.nonEmpty) readEntries(spark, sinkDir, files)
      else readEntries(spark, sinkDir, all).limit(0) // schema-only
    val unchangedRows =
      if (rest.isEmpty) 0L else readEntries(spark, sinkDir, rest).count()
    (scan(fT, mf), scan(tT, mt), unchangedRows)
  }

  /** Zero-copy SHALLOW CLONE (the Delta/Iceberg shallow-clone shape on
    * plain parquet): the clone is a new table directory containing ONLY
    * a v1 manifest whose entries are ABSOLUTE paths into the source's
    * current snapshot — no data bytes move, clone cost is one manifest
    * write regardless of table size. Mutations on the clone are
    * copy-on-write: a merge rewrites the touched partitions into
    * clone-local files and the commit drops the borrowed absolute
    * references for those partitions from the clone's manifest (see
    * [[partOf]]); the SOURCE's files are never deleted by the clone's
    * cleanup or vacuum, which only scan the clone's own root.
    * Ownership caveat (same as every shallow-clone design): vacuuming
    * or rewriting the SOURCE can invalidate clones that still borrow
    * its files — clones are snapshots for experimentation, not
    * long-lived replicas. */
  def shallowClone(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    val src = new Path(srcDir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcAbs = fs.makeQualified(src).toUri.getPath
    val files = currentManifest(fs, src) match {
      case Some((_, mp)) => readManifest(fs, mp)
        .map(f => if (f.startsWith("/")) f else s"$srcAbs/$f")
      case None => listDataFiles(fs, src).map(f => s"$srcAbs/$f")
    }
    require(files.nonEmpty, s"cannot clone empty table $srcDir")
    val dst = new Path(dstDir)
    fs.mkdirs(dst)
    writeManifest(fs, dst, 1L, files.sorted)
  }

  /** The current manifest's live-file entries (relative paths), empty for
    * a never-promoted table. Hadoop IO, not a datasource read — the
    * underscore-prefixed manifest name is "hidden" to Spark readers by
    * convention (deliberately: a `spark.read` over the table root must
    * never pick the manifest up as data). */
  def liveEntries(spark: SparkSession, sinkDir: String): Seq[String] = {
    val root = new Path(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    currentManifest(fs, root).map { case (_, p) => readManifest(fs, p) }
      .getOrElse(Seq.empty)
  }

  /** Retained manifest versions, ascending. */
  def listVersions(spark: SparkSession, sinkDir: String): Seq[Long] = {
    val root = new Path(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    allManifests(fs, root).map(_._1).sorted
  }

  /** Garbage collection: delete every data file not referenced by the
    * current manifest, every stale staging directory, and every
    * superseded manifest version. Safe to run any time under the
    * single-writer assumption — live data is exactly the manifest's
    * list. No-op on never-promoted tables (no manifest = no orphan
    * provenance to reason from). */
  def vacuum(spark: SparkSession, sinkDir: String): Unit = {
    val root = new Path(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    currentManifest(fs, root).foreach { case (ver, mp) =>
      val live = readManifest(fs, mp).toSet
      for (f <- listDataFiles(fs, root) if !live.contains(f))
        fs.delete(new Path(root, f), false)
      for (s <- fs.listStatus(root)
           if s.getPath.getName.startsWith(".graft_staging_"))
        fs.delete(s.getPath, true)
      for ((v, p) <- allManifests(fs, root) if v < ver) fs.delete(p, false)
      // partition dirs emptied by deletes/vacuum
      for (s <- fs.listStatus(root)
           if s.isDirectory && s.getPath.getName.contains("=")
             && fs.listStatus(s.getPath).isEmpty)
        fs.delete(s.getPath, true)
    }
  }

  // ---- promote sub-phases (package-visible for crash-injection specs) --

  /** The pre-mutation live state: (manifest version, relative file
    * paths). A never-promoted table gets a bootstrap manifest v1 written
    * from the directory listing FIRST, so even the first promote's
    * switch is protected. */
  private[graft] def freezePreState(fs: FileSystem, root: Path): (Long, Seq[String]) =
    currentManifest(fs, root) match {
      case Some((v, p)) => (v, readManifest(fs, p))
      case None =>
        val files = listDataFiles(fs, root)
        writeManifest(fs, root, 1L, files)
        (1L, files)
    }

  /** Additive move: every staged partition's data files rename into the
    * live partition directory under a staging-id-prefixed name (old
    * files untouched — a manifest reader cannot observe the move).
    * Returns partitionDirName -> relative moved paths. Idempotent for a
    * given staging dir: files already moved by a crashed earlier attempt
    * are recognised by their prefix and folded into the result, so a
    * re-promote commits the complete file set. */
  private[graft] def moveStagedIn(fs: FileSystem, root: Path,
                                  staging: Path): Map[String, Seq[String]] = {
    val stagingId = staging.getName.stripPrefix(".graft_staging_")
    val parts = fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    parts.map { p =>
      val destDir = new Path(root, p.getPath.getName)
      fs.mkdirs(destDir)
      val fresh = fs.listStatus(p.getPath)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map { f =>
          val destName = s"graft-$stagingId-${f.getPath.getName}"
          if (!fs.rename(f.getPath, new Path(destDir, destName)))
            throw new java.io.IOException(
              s"move failed: ${f.getPath} -> $destDir/$destName")
          s"${p.getPath.getName}/$destName"
        }.toSeq
      val earlier = fs.listStatus(destDir)
        .filter(s => s.isFile && s.getPath.getName.startsWith(s"graft-$stagingId-"))
        .map(s => s"${p.getPath.getName}/${s.getPath.getName}").toSeq
      p.getPath.getName -> (fresh ++ earlier).distinct
    }.toMap
  }

  /** THE commit point: one rename makes version pre+1 the table. Live
    * set = untouched partitions' previous files + touched partitions'
    * moved-in files (drop-partitions contribute nothing). */
  private[graft] def commitManifest(fs: FileSystem, root: Path,
                                    pre: (Long, Seq[String]),
                                    moved: Map[String, Seq[String]],
                                    dropParts: Set[String]): Unit = {
    val touched = moved.keySet ++ dropParts
    val kept = pre._2.filterNot(f => touched.contains(partOf(f)))
    writeManifest(fs, root, pre._1 + 1, (kept ++ moved.values.flatten).sorted)
  }

  /** Post-commit housekeeping (readers already switched): displaced and
    * orphaned files of touched partitions, emptied partition dirs,
    * superseded manifests, the staging dir. */
  private[graft] def cleanup(fs: FileSystem, root: Path, staging: Path,
                             pre: (Long, Seq[String]),
                             moved: Map[String, Seq[String]],
                             dropParts: Set[String]): Unit = {
    val touched = moved.keySet ++ dropParts
    for (part <- touched) {
      val dir = new Path(root, part)
      if (fs.exists(dir)) {
        val keep = moved.getOrElse(part, Seq.empty).map(_.split('/').last).toSet
        for (s <- fs.listStatus(dir)
             if s.isFile && s.getPath.getName.endsWith(".parquet")
               && !keep.contains(s.getPath.getName))
          fs.delete(s.getPath, false)
        if (keep.isEmpty) fs.delete(dir, true)
      }
    }
    for ((v, p) <- allManifests(fs, root) if v <= pre._1) fs.delete(p, false)
    fs.delete(staging, true)
  }

  // ---- manifest primitives --------------------------------------------

  /** Partition-directory name a manifest entry belongs to. Relative
    * entries are `<part>/<file>`; ABSOLUTE entries (shallow-clone
    * references into another table) resolve through their parent
    * directory name, so a mutation touching partition `d=x` correctly
    * drops the clone's borrowed `/src/.../d=x/...` references from the
    * manifest (copy-on-write) while never deleting the source files —
    * cleanup only scans partition dirs under this table's own root. */
  private def partOf(relPath: String): String =
    if (relPath.startsWith("/")) new Path(relPath).getParent.getName
    else relPath.split('/').head


  private def allManifests(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(ManifestPrefix))
      .flatMap { s =>
        scala.util.Try(s.getPath.getName.stripPrefix(ManifestPrefix).toLong)
          .toOption.map(_ -> s.getPath)
      }

  private[graft] def currentManifest(fs: FileSystem, root: Path): Option[(Long, Path)] = {
    val all = allManifests(fs, root)
    if (all.isEmpty) None else Some(all.maxBy(_._1))
  }

  private def readManifest(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.linesIterator.filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
  }

  /** Write manifest version `v`: dot-prefixed temp file (invisible to
    * both parquet listing and manifest resolution), then the atomic
    * rename that IS the commit. */
  private def writeManifest(fs: FileSystem, root: Path, v: Long,
                            files: Seq[String]): Unit = {
    val tmp = new Path(root, s".graft_manifest_tmp_${System.nanoTime()}")
    val out = fs.create(tmp, false)
    try out.write(
      (s"# graft manifest v$v\n" + files.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(root, s"$ManifestPrefix$v")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"manifest commit failed: $tmp -> $dest")
  }

  /** Relative paths of all data files under `root` (recursive), skipping
    * hidden (dot/underscore-prefixed) entries — the plain-listing view of
    * a never-promoted table. */
  private[graft] def listDataFiles(fs: FileSystem, root: Path): Seq[String] = {
    def walk(p: Path, rel: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val name = s.getPath.getName
        if (name.startsWith(".") || name.startsWith("_")) Seq.empty
        else if (s.isDirectory) walk(s.getPath, s"$rel$name/")
        else if (name.endsWith(".parquet")) Seq(s"$rel$name")
        else Seq.empty
      }
    if (fs.exists(root)) walk(root, "") else Seq.empty
  }
}
