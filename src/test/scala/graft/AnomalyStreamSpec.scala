package graft

import graft.streaming.AnomalyStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the trailing z-score monitor: the streaming
  * flatMapGroupsWithState form must reproduce the batch window
  * operator row for row on the same (per-key time-ordered) events,
  * including across micro-batch boundaries, and its state must stay
  * trimmed to the window.
  */
class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val W = 3L * 86400L * 1000000L // 3 days, the t15 gate window

  private def batchReference(): Map[(String, Long), (Long, Option[Double], Boolean)] =
    graft.operators.TimeSeries.anomalyZScore(
      Tables.events(spark, sf("sf0.001"))
        .select(col("user_id"), col("ts"), col("value"), col("event_id")),
      "user_id", "ts", "value", W)
      .select(col("user_id").cast("string"), col("event_id"), col("n_win"),
        col("z_r4"), col("is_anomaly"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4))))
      .toMap

  test("streaming z-scores equal the batch operator across micro-batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id").cast("string"), col("ts"), col("value"), col("event_id"))
      .as[(String, java.sql.Timestamp, Double, Long)]
      .collect().sortBy(r => (r._2.getTime, r._4)).toSeq
    val ms = MemoryStream[(String, java.sql.Timestamp, Double, Long)]
    val q = AnomalyStream.anomalyZScoreStream(
      ms.toDS().toDF("user_id", "ts", "value", "event_id"),
      "user_id", "ts", "value", "event_id", W)
      .writeStream.format("memory").queryName("az_stream")
      .outputMode("append").start()
    try {
      // three arbitrary micro-batch cuts: window state must carry over
      ms.addData(rows.take(300)); q.processAllAvailable()
      ms.addData(rows.slice(300, 700)); q.processAllAvailable()
      ms.addData(rows.drop(700)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("az_stream")
      .select(col("key"), col("tiebreak"), col("n_win"), col("z_r4"), col("is_anomaly"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4))))
      .toMap
    val ref = batchReference()
    assert(streamed.size == ref.size)
    val diffs = ref.collect { case (k, v) if streamed.get(k) != Some(v) =>
      s"$k: batch=$v stream=${streamed.get(k)}"
    }
    assert(diffs.isEmpty, diffs.take(5).mkString("\n"))
  }

  test("state trims to the trailing window as events advance") {
    // drive the group function directly through a batch Dataset (the
    // same code path) with a key whose events span many windows
    val t0 = 1700000000000000L
    val readings = (0 until 50).map(i => ("k", t0 + i.toLong * W / 4, 10.0 + i, i.toLong))
      .toDF("key", "micros", "value", "tiebreak")
      .select(col("key"), timestamp_micros(col("micros")).as("ts"),
        col("value"), col("tiebreak"))
    val out = AnomalyStream.anomalyZScoreStream(
      readings, "key", "ts", "value", "tiebreak", W, minN = 2L)
      .collect()
    // trailing window spans at most 5 quarter-window-spaced events
    assert(out.map(_.n_win).max <= 5)
    assert(out.length == 50)
  }
}
