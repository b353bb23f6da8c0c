package graft

import graft.sources.VersionedLake
import graft.streaming.MaterializedAgg
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The incrementally-maintained materialized aggregate must equal the
  * batch recompute after every kind of source commit, delete emptied
  * groups, survive re-delivered diffs exactly-once, and keep its own
  * version history.
  */
class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def viewRows(view: String): Map[String, (Double, Long)] =
    VersionedLake.read(spark, view)
      .select("sensor", "agg_sum", "agg_count")
      .as[(String, Double, Long)].collect()
      .map { case (k, s, c) => k -> ((s, c)) }.toMap

  private def truth(src: String): Map[String, (Double, Long)] =
    VersionedLake.read(spark, src)
      .groupBy("sensor").agg(sum("value").as("s"), count(lit(1)).as("c"))
      .as[(String, Double, Long)].collect()
      .map { case (k, s, c) => k -> ((s, c)) }.toMap

  test("maintained view equals batch recompute across create/merge/append/compaction; exactly-once") {
    val root = tmp("magg")
    val src = s"$root/src"
    val state = s"$root/state"
    val view = s"$root/view"
    def maintain() = MaterializedAgg.maintain(spark, src, state, view,
      groupCols = Seq("sensor"), valueCol = "value", partitionCol = "sensor")

    // v1: initial data
    VersionedLake.create(
      Seq((1L, "s1", 10.0), (2L, "s1", 5.0), (3L, "s2", 7.0))
        .toDF("id", "sensor", "value"), src, "sensor")
    assert(maintain() == 1)
    assert(viewRows(view) == Map("s1" -> ((15.0, 2L)), "s2" -> ((7.0, 1L))))
    assert(viewRows(view) == truth(src))

    // v2: update id=1, delete id=3 (empties s2), insert s3
    VersionedLake.mergeUpsert(spark, src,
      Seq((1L, "s1", 12.0, false), (3L, "s2", 7.0, true), (4L, "s3", 2.0, false))
        .toDF("id", "sensor", "value", "_deleted"), Seq("id"), "sensor")
    // v3: plain append
    VersionedLake.append(Seq((5L, "s1", 1.0)).toDF("id", "sensor", "value"),
      src, "sensor")
    assert(maintain() == 2)
    val after = viewRows(view)
    assert(after == truth(src))
    assert(after == Map("s1" -> ((18.0, 3L)), "s3" -> ((2.0, 1L))))
    assert(!after.contains("s2")) // emptied group deleted, no ghost row

    // v4: source compaction — zero CDC rows, view untouched
    val viewVBefore = VersionedLake.currentVersion(view)
    VersionedLake.compactPartitions(spark, src, "sensor")
    assert(maintain() == 1)
    assert(VersionedLake.currentVersion(view) == viewVBefore)
    assert(viewRows(view) == truth(src))

    // re-delivery: rewind the feed watermark two versions — the view's
    // recorded batch id skips the replays, nothing double-counts
    Files.write(java.nio.file.Paths.get(s"$state/WATERMARK"), "2".getBytes)
    assert(maintain() == 2)
    assert(viewRows(view) == truth(src))

    // the view has its own history: its first version is the v1 fold
    assert(VersionedLake.read(spark, view, Some(1))
      .select("sensor", "agg_sum").as[(String, Double)].collect().toMap ==
      Map("s1" -> 15.0, "s2" -> 7.0))
    // and metadata row counts work on the view too
    assert(VersionedLake.rowCount(spark, view) == 2L)
  }

  test("MIN/MAX view: inserts fold, deletes re-aggregate the touched groups, per-version parity") {
    val root = tmp("magg_mm")
    val src = s"$root/src"
    val state = s"$root/state"
    val view = s"$root/view"
    def maintain() = MaterializedAgg.maintain(spark, src, state, view,
      groupCols = Seq("sensor"), valueCol = "value", partitionCol = "sensor",
      minMaxCols = Seq("value"), srcPartitionCol = Some("sensor"))
    def mm(view: String): Map[String, (Double, Double)] =
      VersionedLake.read(spark, view)
        .select("sensor", "min_value", "max_value")
        .as[(String, Double, Double)].collect()
        .map { case (k, lo, hi) => k -> ((lo, hi)) }.toMap

    // v1 bootstrap: s1 has max 10, runner-up 5; s2 single row
    VersionedLake.create(
      Seq((1L, "s1", 10.0), (2L, "s1", 5.0), (3L, "s2", 7.0))
        .toDF("id", "sensor", "value"), src, "sensor")
    assert(maintain() == 1)
    assert(mm(view) == Map("s1" -> ((5.0, 10.0)), "s2" -> ((7.0, 7.0))))

    // v2 insert-only: folds with least/greatest, no delete path
    VersionedLake.append(Seq((4L, "s1", 20.0), (5L, "s2", 1.0))
      .toDF("id", "sensor", "value"), src, "sensor")
    assert(maintain() == 1)
    assert(mm(view) == Map("s1" -> ((5.0, 20.0)), "s2" -> ((1.0, 7.0))))

    // v3 deletes the CURRENT MAX of s1 (20) and the CURRENT MIN of s2
    // (1): the folded values are not recoverable by inversion — only
    // the touched-group re-aggregate finds the runner-ups
    VersionedLake.mergeUpsert(spark, src,
      Seq((4L, "s1", 20.0, true), (5L, "s2", 1.0, true))
        .toDF("id", "sensor", "value", "_deleted"), Seq("id"), "sensor")
    // v4 queued BEHIND v3 before any maintenance: the v3 re-aggregate
    // must read source AT v3, not current
    VersionedLake.append(Seq((6L, "s1", 15.0)).toDF("id", "sensor", "value"),
      src, "sensor")
    assert(maintain() == 2)
    assert(mm(view) == Map("s1" -> ((5.0, 15.0)), "s2" -> ((7.0, 7.0))))

    // per-version parity: every VIEW version equals the batch
    // recompute over its SOURCE version — the observable form of the
    // version-pinned re-read
    (1 to VersionedLake.currentVersion(view)).foreach { vv =>
      val got = VersionedLake.read(spark, view, Some(vv))
        .select("sensor", "agg_sum", "agg_count", "min_value", "max_value")
        .as[(String, Double, Long, Double, Double)].collect().toSet
      // view version vv was committed with batch id = the source
      // version it folded; recompute from that source version
      val srcV = VersionedLake.committedBatchId(view, Some(vv)).toInt
      val want = VersionedLake.read(spark, src, Some(srcV))
        .groupBy("sensor")
        .agg(sum("value").as("s"), count(lit(1)).as("c"),
          min("value").as("lo"), max("value").as("hi"))
        .as[(String, Double, Long, Double, Double)].collect().toSet
      assert(got == want, s"view v$vv != source v$srcV recompute")
    }

    // group emptied entirely: its row (and min/max) leave the view
    VersionedLake.mergeUpsert(spark, src,
      Seq((3L, "s2", 7.0, true)).toDF("id", "sensor", "value", "_deleted"),
      Seq("id"), "sensor")
    assert(maintain() == 1)
    assert(!mm(view).contains("s2"))
    assert(mm(view) == Map("s1" -> ((5.0, 15.0))))
  }

  test("HLL distinct view: inserts merge registers, deletes re-read, estimate equals one-shot") {
    import graft.operators.Sketch
    val root = tmp("magg_hll")
    val src = s"$root/src"
    val state = s"$root/state"
    val view = s"$root/view"
    val p = 5
    def maintain() = MaterializedAgg.maintain(spark, src, state, view,
      groupCols = Seq("sensor"), valueCol = "value", partitionCol = "sensor",
      srcPartitionCol = Some("sensor"), hllCol = Some("user"), hllP = p)
    // strongest pin: the MAINTAINED register arrays equal the one-shot
    // register build over the current source state, bucket for bucket
    def viewRegs(): Map[String, Seq[Int]] =
      VersionedLake.read(spark, view).select("sensor", MaterializedAgg.HllRegsCol)
        .collect().map(r => r.getString(0) ->
          r.getSeq[Int](1).toList.asInstanceOf[Seq[Int]]).toMap
    def oneShotRegs(): Map[String, Seq[Int]] =
      Sketch.hllRegisters(VersionedLake.read(spark, src),
        col("user").cast("string"), Seq("sensor"), p)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .groupBy(_._1).map { case (k, rows) =>
          val arr = Array.fill(1 << p)(0)
          rows.foreach { case (_, b, mr) => arr(b) = mr }
          k -> arr.toSeq
        }
    def viewEst(): Map[String, Double] =
      VersionedLake.read(spark, view).select(col("sensor"),
        MaterializedAgg.hllEstimate(col(MaterializedAgg.HllRegsCol), p).as("e"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def oneShotEst(): Map[String, Double] =
      Sketch.hllDistinct(VersionedLake.read(spark, src),
        col("user").cast("string"), Seq("sensor"), p)
        .collect().map(r => r.getString(0) ->
          r.getAs[Double]("hll_estimate")).toMap

    // v1 bootstrap: overlapping users within and across sensors
    VersionedLake.create(
      (1L to 30L).map(i => (i, if (i % 3 == 0) "s2" else "s1", s"u${i % 12}", 1.0))
        .toDF("id", "sensor", "user", "value"), src, "sensor")
    assert(maintain() == 1)
    assert(viewRegs() == oneShotRegs())
    assert(viewEst() == oneShotEst())

    // v2 insert-only: registers fold by element-wise max, no source read
    VersionedLake.append(
      (31L to 45L).map(i => (i, "s1", s"u${i}", 1.0))
        .toDF("id", "sensor", "user", "value"), src, "sensor")
    assert(maintain() == 1)
    assert(viewRegs() == oneShotRegs())
    assert(viewEst() == oneShotEst())

    // v3 deletes rows of s1 (including every row of some users — not
    // invertible from registers) and empties nothing; v4 empties s2
    VersionedLake.mergeUpsert(spark, src,
      ((31L to 40L).map(i => (i, "s1", s"u${i}", 1.0, true)) :+
        ((1L, "s1", "u1", 1.0, true)))
        .toDF("id", "sensor", "user", "value", "_deleted"), Seq("id"), "sensor")
    assert(maintain() == 1)
    assert(viewRegs() == oneShotRegs())
    assert(viewEst() == oneShotEst())

    VersionedLake.mergeUpsert(spark, src,
      (1L to 30L).filter(_ % 3 == 0).map(i => (i, "s2", s"u${i % 12}", 1.0, true))
        .toDF("id", "sensor", "user", "value", "_deleted"), Seq("id"), "sensor")
    assert(maintain() == 1)
    assert(!viewRegs().contains("s2"))
    assert(viewRegs() == oneShotRegs())

    // exactly-once: re-running maintenance with nothing new is a no-op
    val vv = VersionedLake.currentVersion(view)
    assert(maintain() == 0)
    assert(VersionedLake.currentVersion(view) == vv)
  }

  test("streaming sink auto-maintains its view: interleaved commits, restart, exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("magg_stream")
    val src = s"$root/src"
    val view = s"$root/view"
    val ms = MemoryStream[(Long, String, Double)]
    def run(): Unit =
      VersionedLake.streamingCommit(
        ms.toDS().toDF("id", "sensor", "value"), src, "sensor",
        s"$root/ckpt",
        postCommit = MaterializedAgg.maintainHook(src, s"$root/state", view,
          groupCols = Seq("sensor"), valueCol = "value",
          partitionCol = "sensor", minMaxCols = Seq("value"),
          srcPartitionCol = Some("sensor")))
        .awaitTermination()
    def truthMm: Set[(String, Double, Long, Double, Double)] =
      VersionedLake.read(spark, src)
        .groupBy("sensor")
        .agg(sum("value").as("s"), count(lit(1)).as("c"),
          min("value").as("lo"), max("value").as("hi"))
        .as[(String, Double, Long, Double, Double)].collect().toSet
    def viewMm: Set[(String, Double, Long, Double, Double)] =
      VersionedLake.read(spark, view)
        .select("sensor", "agg_sum", "agg_count", "min_value", "max_value")
        .as[(String, Double, Long, Double, Double)].collect().toSet

    // two streamed micro-batches — the view follows without any
    // external maintenance call
    ms.addData((1L, "s1", 10.0), (2L, "s2", 3.0))
    run()
    assert(viewMm == truthMm)
    ms.addData((3L, "s1", 20.0))
    run()
    assert(viewMm == truthMm)
    // an OUT-OF-BAND writer deletes the streamed max; the next stream
    // tick's hook drains that version too (feed order, delete re-agg)
    VersionedLake.mergeUpsert(spark, src,
      Seq((3L, "s1", 20.0, true)).toDF("id", "sensor", "value", "_deleted"),
      Seq("id"), "sensor")
    ms.addData((4L, "s2", 1.0))
    run()
    assert(viewMm == truthMm)
    assert(viewMm.exists { case (s, _, _, _, hi) => s == "s1" && hi == 10.0 })
    // mid-stream restart with a re-delivered batch: wipe the sink's
    // watermark knowledge by replaying the same checkpoint with no new
    // data — nothing double-folds (view batch-id guard)
    val vBefore = VersionedLake.currentVersion(view)
    run()
    assert(VersionedLake.currentVersion(view) == vBefore)
    assert(viewMm == truthMm)
  }
}
