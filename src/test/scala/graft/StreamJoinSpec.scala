package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream-stream interval join: the same intervalJoin call must
  * produce the batch range-join answer when fed streams (append mode,
  * watermark-bounded state), including events arriving across
  * different micro-batches and out of key order.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // clicks: (user, click_ts); purchases: (user, purchase_ts, cents)
  private val clicks = Seq(
    (10L, ts("2024-01-01 00:00:00")),
    (10L, ts("2024-01-01 02:00:00")),
    (20L, ts("2024-01-01 00:30:00")),
    (30L, ts("2024-01-01 01:00:00"))
  )
  private val purchases = Seq(
    (10L, ts("2024-01-01 00:40:00"), 500L), // within 1h of click 1 only
    (10L, ts("2024-01-01 02:10:00"), 900L), // within 1h of click 2 only
    (20L, ts("2024-01-01 03:00:00"), 100L), // too late for user 20's click
    (40L, ts("2024-01-01 00:10:00"), 700L)  // no click at all
  )

  private def asBatchFrames = (
    clicks.toDF("user_id", "click_ts"),
    purchases.toDF("user_id", "purchase_ts", "cents"))

  private def run(j: org.apache.spark.sql.DataFrame): Set[(Long, Timestamp, Timestamp, Long)] =
    j.select(col("user_id"), col("click_ts"), col("purchase_ts"), col("cents"))
      .collect().map(r =>
        (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

  test("interval join on batch frames is the exact attribution set") {
    val (c, p) = asBatchFrames
    val got = run(StreamJoin.intervalJoin(c, p, "user_id",
      "click_ts", "purchase_ts", watermark = "2 hours", before = "0 seconds", after = "1 hour"))
    assert(got == Set(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:40:00"), 500L),
      (10L, ts("2024-01-01 02:00:00"), ts("2024-01-01 02:10:00"), 900L)))
  }

  test("streamed micro-batches produce the batch answer (bounded watermark state)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cs = MemoryStream[(Long, Timestamp)]
    val ps = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamJoin.intervalJoin(
      cs.toDS().toDF("user_id", "click_ts"),
      ps.toDS().toDF("user_id", "purchase_ts", "cents"),
      "user_id", "click_ts", "purchase_ts",
      watermark = "2 hours", before = "0 seconds", after = "1 hour")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      // interleaved arrival: clicks land before AND after their purchases
      cs.addData(clicks.take(2)); q.processAllAvailable()
      ps.addData(purchases.take(1)); q.processAllAvailable()
      ps.addData(purchases.drop(1)); q.processAllAvailable()
      cs.addData(clicks.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = run(spark.table("attrib"))
    val (c, p) = asBatchFrames
    val batch = run(StreamJoin.intervalJoin(c, p, "user_id",
      "click_ts", "purchase_ts", "2 hours", "0 seconds", "1 hour"))
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("overlapping non-key columns and shared time names are rejected") {
    val (c, p) = asBatchFrames
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(
        c.withColumn("extra", lit(1)), p.withColumn("extra", lit(2)),
        "user_id", "click_ts", "purchase_ts", "1 hour", "0 seconds", "1 hour")
    }
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(c, p.withColumnRenamed("purchase_ts", "click_ts"),
        "user_id", "click_ts", "click_ts", "1 hour", "0 seconds", "1 hour")
    }
  }
}
