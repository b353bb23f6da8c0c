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

  test("mergeUpsert applies update/insert/delete; untouched partitions stay byte-identical") {
    import spark.implicits._
    val root = tmp("lakeops_merge")
    Seq(
      (1L, "a", 10.0, "p1"), (2L, "b", 20.0, "p1"), (3L, "c", 30.0, "p1"),
      (4L, "d", 40.0, "p2"), (5L, "e", 50.0, "p2"))
      .toDF("id", "name", "score", "part")
      .write.partitionBy("part").parquet(s"$root/lake")
    def snapshot(p: String): Seq[(String, Long, Long)] =
      new java.io.File(s"$root/lake/part=$p").listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
        .map(f => (f.getName, f.length(), f.lastModified())).sorted
    val p2Before = snapshot("p2")

    // update id=1, delete id=2, insert id=9 — all inside p1
    val changes = Seq(
      (1L, "a2", 11.0, "p1", false),
      (2L, "b", 20.0, "p1", true),
      (9L, "z", 90.0, "p1", false))
      .toDF("id", "name", "score", "part", "_deleted")
    LakeOps.mergeUpsert(spark, s"$root/lake", changes, Seq("id"), "part")

    val out = spark.read.parquet(s"$root/lake")
      .select("id", "name", "score", "part").as[(Long, String, Double, String)]
      .collect().toSet
    assert(out == Set(
      (1L, "a2", 11.0, "p1"), (3L, "c", 30.0, "p1"), (9L, "z", 90.0, "p1"),
      (4L, "d", 40.0, "p2"), (5L, "e", 50.0, "p2")))
    // the untouched partition was neither read nor rewritten
    assert(snapshot("p2") == p2Before, "untouched partition files changed")
  }

  test("mergeUpsert drops a partition whose every row was deleted") {
    import spark.implicits._
    val root = tmp("lakeops_merge_empty")
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"))
      .toDF("id", "name", "part")
      .write.partitionBy("part").parquet(s"$root/lake")
    val changes = Seq((1L, "a", "p1", true), (2L, "b", "p1", true))
      .toDF("id", "name", "part", "_deleted")
    LakeOps.mergeUpsert(spark, s"$root/lake", changes, Seq("id"), "part")
    assert(!new java.io.File(s"$root/lake/part=p1").exists(),
      "fully-deleted partition directory should be dropped")
    val out = spark.read.parquet(s"$root/lake")
      .select("id", "part").as[(Long, String)].collect().toSet
    assert(out == Set((3L, "p2")))
  }

  test("mergeUpsert drops an emptied partition whose value needs Hive escaping") {
    import spark.implicits._
    val root = tmp("lakeops_merge_escape")
    // ':' and ' ' are Hive-escaped in directory names: the on-disk dir
    // is part=2026-01-01 10%3A00 — the emptied-partition diff must
    // compare in that escaped namespace
    val weird = "2026-01-01 10:00"
    Seq((1L, "a", weird), (2L, "b", "plain"))
      .toDF("id", "name", "part")
      .write.partitionBy("part").parquet(s"$root/lake")
    val escapedDirs = new java.io.File(s"$root/lake").listFiles()
      .map(_.getName).filter(_.startsWith("part="))
    assert(escapedDirs.exists(_.contains("%3A")), escapedDirs.mkString(","))
    val changes = Seq((1L, "a", weird, true)).toDF("id", "name", "part", "_deleted")
    LakeOps.mergeUpsert(spark, s"$root/lake", changes, Seq("id"), "part")
    assert(!escapedDirs.filter(_.contains("%3A"))
      .exists(d => new java.io.File(s"$root/lake/$d").exists()),
      "escaped emptied-partition directory should be dropped")
    val out = spark.read.parquet(s"$root/lake")
      .select("id", "part").as[(Long, String)].collect().toSet
    assert(out == Set((2L, "plain")))
  }

  test("mergeUpsert prunes the lake scan to touched partitions") {
    import spark.implicits._
    val root = tmp("lakeops_merge_prune")
    Seq((1L, "p1"), (2L, "p2"), (3L, "p3"))
      .toDF("id", "part").write.partitionBy("part").parquet(s"$root/lake")
    // the pruning shape mergeUpsert builds internally: bare attribute
    // vs literals, so PartitionFilters carries it (not PushedFilters)
    val lake = spark.read.parquet(s"$root/lake")
    val plan = lake.filter(col("part").isin("p1"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part#"), plan)
    val scanned = lake.filter(col("part").isin("p1"))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.forall(_.contains("part=p1")), scanned.mkString(","))
  }

  test("z-order clustering: a 2D box filter touches far fewer files than time order") {
    val ev = Tables.events(spark, sf("sf0.01")).withColumn("day",
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).cast("long"))
    val rowDir = java.nio.file.Files.createTempDirectory("lake_row").toString
    val zDir = java.nio.file.Files.createTempDirectory("lake_z").toString
    // fair baseline: the usual insertion layout, time-ordered — the
    // day half of the box DOES localize there; only user_id spreads
    ev.repartitionByRange(16, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(rowDir)
    LakeOps.zorderWrite(ev, "user_id", "day", zDir, numFiles = 16)
    def box(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("user_id") <= 7 && col("day") < 8)
    def filesTouched(dir: String): Long =
      box(spark.read.parquet(dir)).select(input_file_name()).distinct().count()
    // content identical through the rewrite
    val a = box(spark.read.parquet(rowDir)).select("event_id")
      .collect().map(_.getLong(0)).toSet
    val b = box(spark.read.parquet(zDir)).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    // the layout win: both dims localized → the box lives in a corner
    // of the curve; time order only localizes one dim
    val (tRow, tZ) = (filesTouched(rowDir), filesTouched(zDir))
    assert(tZ < tRow, s"z-order touched $tZ files vs time-order $tRow")
    assert(tZ <= 4, s"z-order box should live in a few files, touched $tZ of 16")
  }
}
