package graft

import graft.sources.LakeOps
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Lake maintenance semantics: compaction changes layout and ONLY
  * layout; evolved reads union by name with nulls for pre-evolution
  * batches.
  */
class LakeOpsSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("compact collapses a fragmented lake to one file per partition, content-identical") {
    val root = tmp("lakeops")
    val ev = Tables.events(spark, sf("sf0.001"))
      .withColumn("event_date", to_date(col("ts")).cast("string"))
    ev.repartition(16).write.partitionBy("event_date").parquet(s"$root/src")
    val before = LakeOps.parquetFileCount(s"$root/src")

    LakeOps.compact(spark, s"$root/src", s"$root/dst", Seq("event_date"))
    val after = LakeOps.parquetFileCount(s"$root/dst")
    val nPartitions = ev.select("event_date").distinct().count()

    assert(after == nPartitions, s"expected 1 file per partition, got $after for $nPartitions")
    assert(before > after * 4, s"fixture wasn't fragmented: $before vs $after")
    // partition layout preserved
    assert(new java.io.File(s"$root/dst").list().exists(_.startsWith("event_date=")))
    // content identical, column for column
    val a = spark.read.parquet(s"$root/src")
    val b = spark.read.parquet(s"$root/dst")
    assert(a.columns.sorted.sameElements(b.columns.sorted))
    val cols = a.columns.sorted.map(col).toSeq
    assert(a.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
      b.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty)
  }

  test("compact with filesPerPartition > 1 splits hot partitions deterministically") {
    val root = tmp("lakeops_salt")
    val ev = Tables.events(spark, sf("sf0.001"))
      .withColumn("event_date", to_date(col("ts")).cast("string"))
    ev.write.partitionBy("event_date").parquet(s"$root/src")
    LakeOps.compact(spark, s"$root/src", s"$root/dst", Seq("event_date"),
      filesPerPartition = 3)
    val days = ev.select("event_date").distinct().count()
    val files = LakeOps.parquetFileCount(s"$root/dst")
    assert(files > days && files <= days * 3, s"$files files for $days partitions")
    val a = spark.read.parquet(s"$root/src").select(col("event_id"))
    val b = spark.read.parquet(s"$root/dst").select(col("event_id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("readEvolved unions by name; pre-evolution rows read the new column as null") {
    import spark.implicits._
    val root = tmp("lakeops_evolve")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$root/batch=1")
    Seq((3L, "c", 9.5), (4L, "d", 2.5)).toDF("id", "v", "score")
      .write.parquet(s"$root/batch=2")
    val out = LakeOps.readEvolved(spark, root)
    assert(out.columns.toSet == Set("id", "v", "score", "batch"))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(2).getDouble(rows(2).fieldIndex("score")) == 9.5)
  }
}
