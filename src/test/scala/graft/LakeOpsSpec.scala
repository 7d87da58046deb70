package graft

import org.apache.spark.sql.functions._
import graft.etl.LakeOps

/** MERGE INTO emulation on partitioned parquet: correctness of the
  * upsert and the only-touched-partitions-rewritten guarantee. */
class LakeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeInto upserts and leaves untouched partitions byte-identical") {
    val out = graft.queries.Staging.tmpDir("lakeops")
    Seq(
      (1L, "2024-01-01", 10.0),
      (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 30.0),
      (4L, "2024-01-03", 40.0),
    ).toDF("id", "d", "v")
      .repartition(col("d"))
      .write.mode("overwrite").partitionBy("d").parquet(out)

    def partFiles(d: String) = {
      val dir = new java.io.File(s"$out/d=$d")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before02 = partFiles("2024-01-02")
    val before03 = partFiles("2024-01-03")

    // update id=2 (existing, 2024-01-01), insert id=9 (new partition)
    val updates = Seq(
      (2L, "2024-01-01", 99.0),
      (9L, "2024-01-04", 90.0),
    ).toDF("id", "d", "v")
    LakeOps.mergeInto(spark, out, updates, "id", "d")

    // partition-type inference reads d back as DATE -> compare as string
    val got = spark.read.parquet(out)
      .select(col("id"), col("d").cast("string").as("d"), col("v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> (("2024-01-01", 10.0)),
      2L -> (("2024-01-01", 99.0)),
      3L -> (("2024-01-02", 30.0)),
      4L -> (("2024-01-03", 40.0)),
      9L -> (("2024-01-04", 90.0))))

    // untouched partitions: same files, same mtimes — never rewritten
    assert(partFiles("2024-01-02") === before02)
    assert(partFiles("2024-01-03") === before03)
  }

  private def writeBase(out: String): Unit =
    Seq(
      (1L, "2024-01-01", 10.0),
      (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 30.0),
    ).toDF("id", "d", "v")
      .repartition(col("d"))
      .write.mode("overwrite").partitionBy("d").parquet(out)

  private def readTable(out: String) =
    spark.read.parquet(out)
      .select(col("id"), col("d").cast("string").as("d"), col("v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  private val baseContent = Map(
    1L -> (("2024-01-01", 10.0)),
    2L -> (("2024-01-01", 20.0)),
    3L -> (("2024-01-02", 30.0)))

  test("appendConcurrent: racing appenders lose no rows; every batch lands exactly once") {
    // the measured FS loss class (26/150 rows at 4 concurrent INSERT
    // jobs, shared _temporary): the manifest-CAS append must take the
    // same concurrency with zero loss and zero duplication
    val out = graft.queries.Staging.tmpDir("lakeconc")
    val writers = 4
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val versions = Await.result(
      Future.sequence((0 until writers).map { w =>
        Future {
          val batch = spark.range(w * 1000, w * 1000 + 250)
            .select(col("id"), lit(w.toLong).as("writer"))
          LakeOps.appendConcurrent(spark, out, batch)
        }
      }), 120.seconds)
    // each commit took a DISTINCT version — the CAS never let two
    // writers both believe they own the same manifest slot
    assert(versions.toSet.size === writers)
    val got = LakeOps.readTable(spark, out)
    assert(got.count() === writers * 250L)
    assert(got.select("id").distinct().count() === writers * 250L)
    val perWriter = got.groupBy("writer").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perWriter === (0 until writers).map(w => w.toLong -> 250L).toMap)
    // a sequential follow-up append composes on top of the raced state
    LakeOps.appendConcurrent(spark, out,
      spark.range(90000, 90010).select(col("id"), lit(99L).as("writer")))
    assert(LakeOps.readTable(spark, out).count() === writers * 250L + 10L)
    // and vacuum leaves exactly the live set (no stranded orphans)
    LakeOps.vacuum(spark, out)
    assert(LakeOps.readTable(spark, out).count() === writers * 250L + 10L)
  }

  test("appendConcurrent bootstraps over pre-manifest plain parquet without losing it") {
    val out = graft.queries.Staging.tmpDir("lakeconcboot")
    spark.range(0, 50).select(col("id"), lit(0L).as("writer"))
      .write.mode("overwrite").parquet(out)
    LakeOps.appendConcurrent(spark, out,
      spark.range(100, 150).select(col("id"), lit(1L).as("writer")))
    val got = LakeOps.readTable(spark, out)
    assert(got.count() === 100L)
    assert(got.select("id").distinct().count() === 100L)
  }

  test("crash between stage and promote leaves the table byte-identical") {
    val out = graft.queries.Staging.tmpDir("lakeops-crash")
    writeBase(out)
    def allDataFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(out))
        .filter(f => f.getName.endsWith(".parquet") && !f.getPath.contains(".graft_staging"))
        .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    }
    val filesBefore = allDataFiles()

    val updates = Seq((2L, "2024-01-01", 99.0), (9L, "2024-01-04", 90.0)).toDF("id", "d", "v")
    // the crash: the full (expensive) data write runs, the promote never does
    val staging = LakeOps.stageMerge(spark, out, updates, "id", "d")
    assert(new java.io.File(staging).exists())

    // the table is untouched — same files, sizes, mtimes, same rows; the
    // dot-prefixed staging dir is invisible to parquet listing
    assert(allDataFiles() === filesBefore)
    assert(readTable(out) === baseContent)

    // recovery: promote the staged merge later -> merged content
    LakeOps.promoteStaged(spark, out, staging)
    assert(readTable(out) === Map(
      1L -> (("2024-01-01", 10.0)),
      2L -> (("2024-01-01", 99.0)),
      3L -> (("2024-01-02", 30.0)),
      9L -> (("2024-01-04", 90.0))))
    assert(!new java.io.File(staging).exists(), "staging dir cleaned up after promote")
  }

  test("mergeInto bootstraps a missing table on first merge") {
    val out = graft.queries.Staging.tmpDir("lakeops-boot") + "/table"
    val updates = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0)).toDF("id", "d", "v")
    LakeOps.mergeInto(spark, out, updates, "id", "d")
    assert(readTable(out) === Map(
      1L -> (("2024-01-01", 10.0)), 2L -> (("2024-01-02", 20.0))))
    // and a second merge behaves as a normal upsert
    LakeOps.mergeInto(spark, out,
      Seq((2L, "2024-01-02", 99.0)).toDF("id", "d", "v"), "id", "d")
    assert(readTable(out) === Map(
      1L -> (("2024-01-01", 10.0)), 2L -> (("2024-01-02", 99.0))))
  }

  test("compact: rows preserved exactly, files per partition collapse to one") {
    val out = graft.queries.Staging.tmpDir("lakeops-compact")
    // fragment: 5 writer tasks x 2 partitions -> up to 5 files per partition
    (1L to 200L).map(i => (i, if (i % 2 == 0) "2024-01-01" else "2024-01-02", i * 1.5))
      .toDF("id", "d", "v")
      .repartition(5, col("id"))
      .write.mode("overwrite").partitionBy("d").parquet(out)
    def files(d: String) =
      new java.io.File(s"$out/d=$d").listFiles().count(_.getName.endsWith(".parquet"))
    assert(files("2024-01-01") > 1, "staging should fragment the partition")
    val before = spark.read.parquet(out)
      .select(col("id"), col("v")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    LakeOps.compact(spark, out, "d")

    assert(files("2024-01-01") === 1 && files("2024-01-02") === 1)
    val after = spark.read.parquet(out)
      .select(col("id"), col("v")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after === before)
    // staging dir cleaned
    assert(!new java.io.File(out).listFiles().exists(_.getName.startsWith(".graft_staging")))
  }

  private def manifestRead(out: String) =
    LakeOps.readTable(spark, out)
      .select(col("id"), col("d").cast("string").as("d"), col("v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  private val mergedContent = Map(
    1L -> (("2024-01-01", 77.0)),
    2L -> (("2024-01-01", 20.0)),
    3L -> (("2024-01-02", 88.0)))

  test("crash mid-promote: manifest readers see fully-old until the commit rename, fully-new after") {
    val out = graft.queries.Staging.tmpDir("lakeops-midcrash")
    writeBase(out)
    val updates = Seq((1L, "2024-01-01", 77.0), (3L, "2024-01-02", 88.0)).toDF("id", "d", "v")
    val staging = LakeOps.stageMerge(spark, out, updates, "id", "d")
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // drive the promote phase by phase, "dying" between each
    val pre = LakeOps.freezePreState(fs, root)
    assert(manifestRead(out) === baseContent, "bootstrap manifest freezes pre-state")

    val moved = LakeOps.moveStagedIn(fs, root, new org.apache.hadoop.fs.Path(staging))
    // crash point: new files are IN the live partition dirs of BOTH
    // touched partitions, manifest not yet switched — a manifest reader
    // still sees the complete pre-merge table, never a partition-wise mix
    assert(manifestRead(out) === baseContent,
      "mid-move: reader must observe the fully-old table")

    LakeOps.commitManifest(fs, root, pre, moved, Set.empty)
    // crash point: manifest switched, displaced files not yet cleaned —
    // reader sees the complete post-merge table across ALL partitions
    assert(manifestRead(out) === mergedContent,
      "post-commit: reader must observe the fully-new table")

    LakeOps.cleanup(fs, root, new org.apache.hadoop.fs.Path(staging), pre, moved, Set.empty)
    // settled: plain listing agrees with the manifest again
    assert(readTable(out) === mergedContent)
    assert(manifestRead(out) === mergedContent)
    assert(!new java.io.File(staging).exists(), "staging dir cleaned up")
  }

  test("re-promote after a crash mid-move folds already-moved files in (no loss, no dupes)") {
    val out = graft.queries.Staging.tmpDir("lakeops-remote")
    writeBase(out)
    val updates = Seq((1L, "2024-01-01", 77.0), (3L, "2024-01-02", 88.0)).toDF("id", "d", "v")
    val staging = LakeOps.stageMerge(spark, out, updates, "id", "d")
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // simulate the crash: ONE staged file made it in (with the exact
    // staging-id prefix moveStagedIn uses), then the process died
    val stagingId = new org.apache.hadoop.fs.Path(staging).getName
      .stripPrefix(".graft_staging_")
    val onePart = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("d=")).head
    val oneFile = fs.listStatus(onePart.getPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head
    val dest = new org.apache.hadoop.fs.Path(root, onePart.getPath.getName)
    fs.mkdirs(dest)
    assert(fs.rename(oneFile.getPath,
      new org.apache.hadoop.fs.Path(dest, s"graft-$stagingId-${oneFile.getPath.getName}")))

    // recovery = run the promote again with the same staging dir: the
    // orphaned file is recognised by its prefix and committed alongside
    // the rest — nothing lost, nothing double-counted
    LakeOps.promoteStaged(spark, out, staging)
    assert(manifestRead(out) === mergedContent)
    assert(readTable(out) === mergedContent)
  }

  test("vacuum collects orphans from an abandoned promote; table reads unchanged") {
    val out = graft.queries.Staging.tmpDir("lakeops-vacuum")
    writeBase(out)
    val updates = Seq((1L, "2024-01-01", 77.0)).toDF("id", "d", "v")
    val staging = LakeOps.stageMerge(spark, out, updates, "id", "d")
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // abandoned attempt: files moved in, manifest never switched
    LakeOps.freezePreState(fs, root)
    LakeOps.moveStagedIn(fs, root, new org.apache.hadoop.fs.Path(staging))
    assert(manifestRead(out) === baseContent)

    LakeOps.vacuum(spark, out)
    // orphans + staging gone; live data exactly the manifest's list
    assert(manifestRead(out) === baseContent)
    assert(readTable(out) === baseContent, "plain listing clean after vacuum")
    assert(!new java.io.File(staging).exists())
  }

  test("vacuum after a history-retaining merge drops superseded files and old manifests; liveEntries = on-disk parquet set") {
    val out = graft.queries.Staging.tmpDir("lakeops-vacuum-hist")
    writeBase(out)
    val updates = Seq((1L, "2024-01-01", 99.0)).toDF("id", "d", "v")
    LakeOps.mergeInto(spark, out, updates, "id", "d", retainHistory = true)
    assert(LakeOps.listVersions(spark, out) === Seq(1L, 2L), "history retained pre-GC")
    def diskFiles = {
      val root = new org.apache.hadoop.fs.Path(out)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(d => fs.listStatus(d.getPath).map(f => s"${d.getPath.getName}/${f.getPath.getName}"))
        .filter(_.endsWith(".parquet")).toSet
    }
    assert(diskFiles.size > LakeOps.liveEntries(spark, out).size,
      "superseded files present before vacuum")
    val content = manifestRead(out)
    LakeOps.vacuum(spark, out)
    assert(LakeOps.listVersions(spark, out) === Seq(2L), "old manifest collected")
    assert(diskFiles === LakeOps.liveEntries(spark, out).toSet,
      "after GC the disk holds exactly the live set")
    assert(manifestRead(out) === content, "content preserved")
  }

  test("deleteKeys drops fully-deleted partitions atomically with the manifest switch") {
    val out = graft.queries.Staging.tmpDir("lakeops-dropall")
    writeBase(out)
    // delete every row of partition 2024-01-02 (id=3) and one row elsewhere
    val victims = Seq(2L, 3L).toDF("id")
    LakeOps.deleteKeys(spark, out, victims, "id", "d")
    assert(manifestRead(out) === Map(1L -> (("2024-01-01", 10.0))))
    assert(!new java.io.File(s"$out/d=2024-01-02").exists(),
      "emptied partition dir removed in cleanup")
  }

  test("shallowClone: zero-copy birth, copy-on-write divergence, source untouched") {
    val src = graft.queries.Staging.tmpDir("clone-src")
    val dst = graft.queries.Staging.tmpDir("clone-dst")
    writeBase(src)
    LakeOps.shallowClone(spark, src, dst)
    // zero-copy: no data files under the clone, just the manifest
    def parquetsUnder(d: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(d))
    }
    assert(parquetsUnder(dst).isEmpty, "clone must borrow, not copy")
    def content(d: String) = LakeOps.readTable(spark, d)
      .select(col("id"), col("d").cast("string"), col("v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(content(dst) === baseContent, "clone reads the source snapshot")
    // CoW: mutate the clone; touched partition rewrites locally, source
    // partitions stay borrowed and the source itself is bit-unchanged
    LakeOps.mergeInto(spark, dst,
      Seq((2L, "2024-01-01", 99.0)).toDF("id", "d", "v"), "id", "d")
    assert(content(src) === baseContent, "source unchanged by clone mutation")
    assert(content(dst)(2L) === (("2024-01-01", 99.0)))
    assert(parquetsUnder(dst).forall(_.getPath.contains("d=2024-01-01")),
      "only the touched partition materialises locally")
    // vacuum on the clone must not reach into the source
    LakeOps.vacuum(spark, dst)
    assert(content(src) === baseContent, "clone vacuum never deletes source files")
    assert(content(dst)(2L) === (("2024-01-01", 99.0)))
  }

  test("retainHistory: old version stays readable as-of; vacuum terminates retention") {
    val out = graft.queries.Staging.tmpDir("lakeops-travel")
    writeBase(out)
    val updates = Seq((2L, "2024-01-01", 99.0), (9L, "2024-01-04", 90.0)).toDF("id", "d", "v")
    LakeOps.mergeInto(spark, out, updates, "id", "d", retainHistory = true)
    assert(LakeOps.listVersions(spark, out) === Seq(1L, 2L))
    def content(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("d").cast("string"), col("v"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    // v1 = the exact pre-merge snapshot; v2 = current
    assert(content(LakeOps.readTableAsOf(spark, out, 1L)) === baseContent)
    assert(content(LakeOps.readTableAsOf(spark, out, 2L)) ===
      content(LakeOps.readTable(spark, out)))
    assert(content(LakeOps.readTable(spark, out))(2L) === (("2024-01-01", 99.0)))
    // a second retaining mutation stacks a third version
    LakeOps.mergeInto(spark, out,
      Seq((1L, "2024-01-01", 11.0)).toDF("id", "d", "v"), "id", "d",
      retainHistory = true)
    assert(LakeOps.listVersions(spark, out) === Seq(1L, 2L, 3L))
    assert(content(LakeOps.readTableAsOf(spark, out, 1L)) === baseContent,
      "v1 snapshot byte-stable across later promotes")
    // vacuum collapses history to the current version only
    LakeOps.vacuum(spark, out)
    assert(LakeOps.listVersions(spark, out) === Seq(3L))
    intercept[IllegalArgumentException] {
      LakeOps.readTableAsOf(spark, out, 1L)
    }
    assert(content(LakeOps.readTable(spark, out))(1L) === (("2024-01-01", 11.0)))
  }

  test("partition evolution: each generation prunes on its own layout, no rewrite") {
    import org.apache.spark.sql.functions._
    val rows = (0 until 200).map { i =>
      (i.toLong, f"2024-01-${1 + i % 20}%02d", (i % 24).toLong, i.toDouble)
    }
    val df = rows.toDF("event_id", "p_day", "p_hour", "value")
    val d1 = graft.queries.Staging.tmpDir("pevspec1")
    val d2 = graft.queries.Staging.tmpDir("pevspec2")
    df.filter(substring(col("p_day"), 9, 2).cast("int") <= 10)
      .drop("p_hour").write.mode("overwrite").partitionBy("p_day").parquet(d1)
    df.filter(substring(col("p_day"), 9, 2).cast("int") > 10)
      .write.mode("overwrite").partitionBy("p_day", "p_hour").parquet(d2)
    // executed-scan file counts (inputFiles lists the relation pre-prune)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      }.flatten.map(_.metrics("numFiles").value).sum
    }
    // generation 1: a day filter must open only that day's files
    val g1 = spark.read.parquet(d1)
    assert(filesRead(g1.filter(col("p_day") === "2024-01-03")) < g1.inputFiles.length,
      "day filter must prune generation-1 partitions")
    // generation 2: the finer layout prunes on day AND hour
    val g2 = spark.read.parquet(d2)
    assert(filesRead(g2.filter(col("p_day") === "2024-01-13" && col("p_hour") === 12L)) <
      filesRead(g2.filter(col("p_day") === "2024-01-13")),
      "hour filter must prune inside the evolved layout")
    // the union reader sees every row exactly once
    val union = g1.select("event_id").unionByName(g2.select("event_id"))
    assert(union.distinct().count() === 200L && union.count() === 200L)
  }
  test("changeFeedScans prunes both snapshots to manifest-diff partitions") {
    val out = graft.queries.Staging.tmpDir("cfscan")
    Seq(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 30.0), (4L, "2024-01-02", 40.0),
      (5L, "2024-01-03", 50.0), (6L, "2024-01-03", 60.0),
    ).toDF("id", "d", "v")
      .repartition(col("d"))
      .write.mode("overwrite").partitionBy("d").parquet(out)
    // v2: touch ONLY 2024-01-02 (update id=3, insert id=7)
    LakeOps.mergeInto(spark, out,
      Seq((3L, "2024-01-02", 99.0), (7L, "2024-01-02", 70.0)).toDF("id", "d", "v"),
      "id", "d", retainHistory = true)
    val (sFrom, sTo, nUntouched) = LakeOps.changeFeedScans(spark, out, 1L, 2L)
    // pruned scans hold exactly the touched partition's rows
    assert(sFrom.select("id").collect().map(_.getLong(0)).toSet === Set(3L, 4L))
    assert(sTo.select("id").collect().map(_.getLong(0)).toSet === Set(3L, 4L, 7L))
    // the four rows of 01-01 and 01-03 are counted, never joined
    assert(nUntouched === 4L)
    // and the pruned scans + untouched count partition each snapshot
    assert(sFrom.count() + nUntouched === LakeOps.readTableAsOf(spark, out, 1L).count())
    assert(sTo.count() + nUntouched === LakeOps.readTableAsOf(spark, out, 2L).count())
  }
}
