package graft

import graft.operators.TimeSeries
import graft.operators.TimeSeries.GridParams
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val P = GridParams("k", "t", "v", "s", "1 MINUTE")

  private def obs(rows: (String, String, Double, String)*) =
    rows.toSeq.map { case (k, t, v, s) => (k, ts(t), v, s) }.toDF("k", "t", "v", "s")

  test("linear interpolation fills the midpoint of a gap") {
    val df = obs(
      ("a", "2024-01-01 00:00:00", 10.0, "OK"),
      ("a", "2024-01-01 00:02:00", 30.0, "OK"))
    val out = TimeSeries.interpolateOnGrid(df, P)
      .orderBy("time").collect()
    assert(out.map(_.getAs[Double]("temperature")).toSeq == Seq(10.0, 20.0, 30.0))
  }

  test("exact grid hits return the observed value, not an interpolation") {
    val df = obs(
      ("a", "2024-01-01 00:00:00", 5.0, "OK"),
      ("a", "2024-01-01 00:01:00", 99.0, "WARNING"),
      ("a", "2024-01-01 00:02:00", 7.0, "OK"))
    val out = TimeSeries.interpolateOnGrid(df, P).orderBy("time").collect()
    assert(out.map(_.getAs[Double]("temperature")).toSeq == Seq(5.0, 99.0, 7.0))
    assert(out.map(_.getAs[String]("status")).toSeq == Seq("OK", "WARNING", "OK"))
  }

  test("single observation yields a single grid point carrying the value") {
    val df = obs(("a", "2024-01-01 00:00:30", 42.0, "ERROR"))
    val out = TimeSeries.interpolateOnGrid(df, P).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("temperature") == 42.0)
    assert(out(0).getAs[String]("status") == "ERROR")
  }

  test("LOCF carries the last seen status across unobserved grid points") {
    val df = obs(
      ("a", "2024-01-01 00:00:00", 1.0, "WARNING"),
      ("a", "2024-01-01 00:03:00", 4.0, "OK"))
    val out = TimeSeries.interpolateOnGrid(df, P).orderBy("time").collect()
    assert(out.map(_.getAs[String]("status")).toSeq ==
      Seq("WARNING", "WARNING", "WARNING", "OK"))
  }

  test("groups are independent (no cross-sensor leakage)") {
    val df = obs(
      ("a", "2024-01-01 00:00:00", 0.0, "OK"),
      ("a", "2024-01-01 00:01:00", 10.0, "OK"),
      ("b", "2024-01-01 00:00:00", 100.0, "ERROR"))
    val out = TimeSeries.interpolateOnGrid(df, P)
    assert(out.filter($"k" === "b").count() == 1)
    assert(out.filter($"k" === "a").agg(max("temperature")).head().getDouble(0) == 10.0)
  }

  test("interpolated values stay within observed bounds (linearity invariant)") {
    val df = Tables.events(spark, sf("sf0.001"))
    val p = GridParams("user_id", "ts", "value", "event_type", "1 HOUR")
    val bounds = df.groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val bad = TimeSeries.interpolateOnGrid(df, p)
      .join(bounds, "user_id")
      .filter($"temperature" < $"lo" - 1e-9 || $"temperature" > $"hi" + 1e-9)
    assert(bad.count() == 0)
  }

  test("bin truncates to the bucket start") {
    val df = Seq(Tuple1(ts("2024-01-01 10:17:45"))).toDF("t")
    val out = df.select(TimeSeries.bin($"t", 3600L).as("b")).head().getTimestamp(0)
    assert(out == ts("2024-01-01 10:00:00"))
  }

  test("createTimeSeries orders by time and unnest round-trips") {
    val df = obs(
      ("a", "2024-01-01 00:02:00", 2.0, "OK"),
      ("a", "2024-01-01 00:00:00", 0.0, "OK"),
      ("a", "2024-01-01 00:01:00", 1.0, "OK"))
    val series = df.groupBy("k").agg(TimeSeries.createTimeSeries($"t", $"v").as("series"))
    val flat = TimeSeries.unnestSeries(series, "series", "time", "value")
    assert(flat.orderBy("time").select("value").as[Double].collect().toSeq == Seq(0.0, 1.0, 2.0))
  }

  test("binMaxWindowed == bin() formulation on batch, and runs unchanged as a stream") {
    val events = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), col("ts"), col("value"))
    val windowed = TimeSeries.binMaxWindowed(events, "user_id", "ts", "value", "1 hour")
      .orderBy("user_id", "bin_ts").collect()
    val binned = events
      .groupBy(col("user_id"), TimeSeries.bin(col("ts"), 3600L).as("bin_ts"))
      .agg(max(col("value")).as("max_value"))
      .orderBy("user_id", "bin_ts").collect()
    assert(windowed.sameElements(binned) && windowed.nonEmpty)

    // the SAME function over a MemoryStream, watermarked append mode
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = events.limit(200)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSeq
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val stream = TimeSeries.binMaxWindowed(
      ms.toDS().toDF("user_id", "ts", "value").withWatermark("ts", "0 seconds"),
      "user_id", "ts", "value", "1 hour")
    val q = stream.writeStream.format("memory").queryName("binmax_out")
      .outputMode("append").start()
    try {
      ms.addData(rows)
      // sentinel advances the watermark past every real bin
      ms.addData(Seq((999L, ts("2030-01-01 00:00:00"), 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("binmax_out")
      .filter(col("user_id") =!= 999L)
      .orderBy("user_id", "bin_ts").collect()
    // batch side built from the SAME collected rows (limit() alone is
    // not a deterministic subset across evaluations)
    val batch200 = TimeSeries.binMaxWindowed(
      rows.toDF("user_id", "ts", "value"), "user_id", "ts", "value", "1 hour")
      .orderBy("user_id", "bin_ts").collect()
    assert(streamed.sameElements(batch200) && streamed.nonEmpty)
  }

  test("ohlc picks first/last by (time, tiebreak); rate nulls on duplicate timestamps") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10.0, 1L),
      (1L, ts("2024-01-01 00:10:00"), 30.0, 2L),
      (1L, ts("2024-01-01 00:20:00"), 5.0, 3L),
      // same timestamp as id=3: tiebreak decides close; rate goes null
      (1L, ts("2024-01-01 00:20:00"), 8.0, 4L)
    ).toDF("k", "t", "v", "id")
    val candle = TimeSeries.ohlc(rows, "k", "t", "v", "id", 3600L).collect()
    assert(candle.length == 1)
    val r = candle.head
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 30.0 &&
      r.getDouble(4) == 5.0 && r.getDouble(5) == 8.0 && r.getLong(6) == 4L)
    val rates = TimeSeries.rateOfChange(rows, "k", "t", "v", "id")
      .select("id", "rate_r4").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(rates(1L) == null) // first of series
    assert(rates(2L) == math.floor(20.0 / 300.0 * 10000 + 0.5) / 10000.0)
    assert(rates(3L) == math.floor(-25.0 / 600.0 * 10000 + 0.5) / 10000.0)
    assert(rates(4L) == null) // dt = 0 → null, never ±Infinity
  }
}
