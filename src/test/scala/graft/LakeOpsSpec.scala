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
}
