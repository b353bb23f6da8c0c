package graft

import graft.operators.Temporal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** As-of join and sessionization semantics, pinned on handcrafted
  * corpora where every expected match is known by hand, plus the
  * session_window ≡ gaps-and-islands equivalence on real data (the
  * property the x_sessionize oracle depends on).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val left = Seq(
    (1L, 10L, ts("2024-01-01 00:00:05"), 1.0),
    (2L, 10L, ts("2024-01-01 00:00:10"), 2.0), // exactly at a right row
    (3L, 10L, ts("2024-01-01 00:00:30"), 3.0),
    (4L, 20L, ts("2024-01-01 00:00:10"), 4.0)  // key with no right rows
  ).toDF("event_id", "user_id", "ts", "v")

  private val right = Seq(
    (10L, ts("2024-01-01 00:00:10"), 100.0),
    (10L, ts("2024-01-01 00:00:20"), 200.0)
  ).toDF("user_id", "ts", "state")

  test("asOf: backward inclusive match, left-outer on misses") {
    val out = Temporal.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("state"))
      .orderBy("event_id").collect()
    // before any right row -> null
    assert(out(0).isNullAt(out(0).fieldIndex("asof_state")))
    // equal timestamp matches (inclusive >=)
    assert(out(1).getDouble(out(1).fieldIndex("asof_state")) == 100.0)
    // latest at-or-before, not first
    assert(out(2).getDouble(out(2).fieldIndex("asof_state")) == 200.0)
    assert(out(2).getTimestamp(out(2).fieldIndex("asof_time")) == ts("2024-01-01 00:00:20"))
    // key absent from right -> null, row kept
    assert(out(3).isNullAt(out(3).fieldIndex("asof_state")))
    assert(out.length == 4)
  }

  test("asOf: tolerance nulls stale matches but keeps rows") {
    val farLeft = Seq((9L, 10L, ts("2024-01-01 02:00:00"), 9.0))
      .toDF("event_id", "user_id", "ts", "v")
    val out = Temporal.asOf(farLeft.union(left.limit(0)), right,
      Seq("user_id"), "ts", "ts", Seq("state"),
      tolerance = Some(expr("INTERVAL 10 MINUTES")))
      .collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_state")))
    assert(out(0).isNullAt(out(0).fieldIndex("asof_time")))
  }

  test("asOf: a right row with null payload still wins the match") {
    val r2 = Seq(
      (10L, ts("2024-01-01 00:00:10"), Some(100.0)),
      (10L, ts("2024-01-01 00:00:20"), Option.empty[Double])
    ).toDF("user_id", "ts", "state")
    val out = Temporal.asOf(
      Seq((1L, 10L, ts("2024-01-01 00:00:30"), 0.0)).toDF("event_id", "user_id", "ts", "v"),
      r2, Seq("user_id"), "ts", "ts", Seq("state")).collect()
    // the 00:00:20 row matches (struct non-null) even though its payload
    // is null — per-column LOCF would wrongly fall back to 100.0
    assert(out(0).isNullAt(out(0).fieldIndex("asof_state")))
    assert(out(0).getTimestamp(out(0).fieldIndex("asof_time")) == ts("2024-01-01 00:00:20"))
  }

  test("asOf: tiebreak picks the greatest among equal right timestamps") {
    val dup = Seq(
      (10L, ts("2024-01-01 00:00:10"), 1.0, 7L),
      (10L, ts("2024-01-01 00:00:10"), 2.0, 9L),
      (10L, ts("2024-01-01 00:00:10"), 3.0, 8L)
    ).toDF("user_id", "ts", "state", "rid")
    val out = Temporal.asOf(
      Seq((1L, 10L, ts("2024-01-01 00:00:15"), 0.0)).toDF("event_id", "user_id", "ts", "v"),
      dup, Seq("user_id"), "ts", "ts", Seq("state"), tiebreak = Some("rid")).collect()
    assert(out(0).getDouble(out(0).fieldIndex("asof_state")) == 2.0) // rid 9 wins
  }

  test("asOf agrees with a brute-force per-row scan on real events") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val l = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("sv"))
    val out = Temporal.asOf(l, r, Seq("user_id"), "ts", "ts", Seq("sv"))
      .select("event_id", "asof_sv").as[(Long, Option[Double])].collect().toMap
    // brute force: theta-join all at-or-before rows, keep max ts
    val brute = l.as("l").join(r.as("r"),
        col("l.user_id") === col("r.user_id") && col("l.ts") >= col("r.ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.event_id")).orderBy(col("r.ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("l.event_id"), col("r.sv"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out == brute)
    assert(out.values.exists(_.isDefined) && out.values.exists(_.isEmpty))
  }

  test("sessionize: session_window form equals gaps-and-islands form") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val a = Temporal.sessionize(ev, "user_id", "ts", "value", "4 hours")
      .orderBy("user_id", "session_start").collect()
    val b = Temporal.sessionizeIslands(ev, "user_id", "ts", "value", "4 hours")
      .orderBy("user_id", "session_start").collect()
    assert(a.length == b.length && a.length > 0)
    assert(a.sameElements(b))
    // sessions actually merge events (not all singletons) and split
    val sizes = a.map(_.getAs[Long]("n_events"))
    assert(sizes.exists(_ > 1))
    val users = a.map(_.getAs[Long]("user_id")).distinct
    assert(a.length > users.length)
  }

  test("trailingAgg equals a brute-force theta-join on real events") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val got = Temporal.trailingAgg(ev, "user_id", "ts", "value", 3600L * 1000000L)
      .select("event_id", "n_window", "sum_cents_window", "max_value_window")
      .as[(Long, Long, Long, Double)].collect().map { case (e, n, s2, m) => e -> ((n, s2, m)) }.toMap
    val brute = ev.as("l").join(ev.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") <= col("l.ts") &&
          col("r.ts") >= col("l.ts") - expr("INTERVAL 1 HOUR"))
      .groupBy(col("l.event_id").as("event_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("r.value") * 100).cast("long")).as("s"),
        max(col("r.value")).as("m"))
      .as[(Long, Long, Long, Double)].collect().map { case (e, n, s2, m) => e -> ((n, s2, m)) }.toMap
    assert(got == brute)
    assert(got.values.exists(_._1 > 1)) // windows actually span events
  }

  test("sessionize runs unchanged under Structured Streaming (watermarked append)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.5),
      (1L, ts("2024-01-01 00:20:00"), 2.5), // same session
      (2L, ts("2024-01-01 00:10:00"), 3.0),
      (1L, ts("2024-01-01 02:00:00"), 4.0), // new session for user 1
      // sentinel far in the future: advances the watermark past every
      // real session so append mode emits them all
      (99L, ts("2024-02-01 00:00:00"), 0.0))
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = ms.toDS().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("value_cents"))
    val q = stream.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // two batches: the second's sentinel closes the first's sessions
      ms.addData(events.take(3)); q.processAllAvailable()
      ms.addData(events.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_out")
      .filter(col("user_id") =!= 99L)
      .orderBy("user_id", "session_start").collect()
    val batch = Temporal.sessionize(
      events.toDF("user_id", "ts", "value"), "user_id", "ts", "value", "1 hour")
      .filter(col("user_id") =!= 99L)
      .orderBy("user_id", "session_start").collect()
    assert(streamed.length == 3)
    assert(streamed.sameElements(batch))
  }

  test("sessionize: boundary — exactly gap-after merges, beyond splits") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 01:00:00"), 1.0), // exactly gap after -> MERGES
      (1L, ts("2024-01-01 02:00:00.000001"), 1.0), // 1 µs beyond gap -> new
      (1L, ts("2024-01-01 02:30:00"), 1.0)  // < gap after prev -> same
    ).toDF("user_id", "ts", "value")
    val out = Temporal.sessionize(df, "user_id", "ts", "value", "1 hour")
      .orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(1).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[java.sql.Timestamp]("session_end") == ts("2024-01-01 02:00:00"))
    val islands = Temporal.sessionizeIslands(df, "user_id", "ts", "value", "1 hour")
      .orderBy("session_start").collect()
    assert(out.sameElements(islands))
  }

  test("asOfNext: forward inclusive match, tolerance, left-outer on misses") {
    val out = Temporal.asOfNext(left, right, Seq("user_id"), "ts", "ts", Seq("state"))
      .orderBy("event_id").collect()
    // before both right rows -> the earliest one (00:00:10)
    assert(out(0).getDouble(out(0).fieldIndex("asof_state")) == 100.0)
    // equal timestamp matches (inclusive >=)
    assert(out(1).getDouble(out(1).fieldIndex("asof_state")) == 100.0)
    // after the last right row -> null, row kept
    assert(out(2).isNullAt(out(2).fieldIndex("asof_state")))
    // key absent from right -> null
    assert(out(3).isNullAt(out(3).fieldIndex("asof_state")))
    // tolerance: a match too far AHEAD is nulled
    val tight = Temporal.asOfNext(left, right, Seq("user_id"), "ts", "ts",
      Seq("state"), tolerance = Some(expr("INTERVAL 2 SECONDS")))
      .orderBy("event_id").collect()
    assert(tight(0).isNullAt(tight(0).fieldIndex("asof_state"))) // 00:00:05 → 00:00:10 is 5s ahead
    assert(tight(1).getDouble(tight(1).fieldIndex("asof_state")) == 100.0) // exact hit
  }

  test("asOfNext agrees with a brute-force per-row scan on real events") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val l = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("sev"))
    val got = Temporal.asOfNext(l, r, Seq("user_id"), "ts", "ts", Seq("sev"))
      .select("event_id", "asof_time").collect()
      .map(row => row.getLong(0) -> Option(row.getTimestamp(1))).toMap
    val rights = r.collect()
      .map(row => (row.getLong(0), row.getTimestamp(1))).groupBy(_._1)
    val want = l.collect().map { row =>
      val cands = rights.getOrElse(row.getLong(1), Array.empty)
        .map(_._2).filter(_.getTime >= row.getTimestamp(2).getTime)
      row.getLong(0) -> (if (cands.isEmpty) None else Some(cands.minBy(_.getTime)))
    }.toMap
    assert(got == want && got.nonEmpty)
  }

  test("rangeJoin: half-open containment, boundaries exact") {
    val pts = Seq(
      (1L, 10L, ts("2024-01-01 00:10:00")), // inside
      (2L, 10L, ts("2024-01-01 00:00:00")), // == start -> IN (inclusive)
      (3L, 10L, ts("2024-01-01 00:30:00")), // == end -> OUT (half-open)
      (4L, 10L, ts("2024-01-01 00:29:59.999999")), // 1 µs before end -> IN
      (5L, 20L, ts("2024-01-01 00:10:00"))  // other key -> no window
    ).toDF("event_id", "user_id", "ts")
    val ivs = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"), 7.0)
    ).toDF("user_id", "w_start", "w_end", "sev")
    val out = Temporal.rangeJoin(pts, ivs, Seq("user_id"),
      "ts", "w_start", "w_end", binMicros = 10L * 60L * 1000000L)
      .select("event_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 4L))
  }

  test("rangeJoin: interval spanning many bins matches each pair exactly once") {
    // 3-hour interval over 10-minute bins (19 expanded rows) — every
    // contained point must appear exactly once, never per-bin.
    val pts = (0 until 12).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 0${i / 4}:${(i % 4) * 15}%02d:00")))
      .toDF("event_id", "user_id", "ts")
    val ivs = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00"), 1.0))
      .toDF("user_id", "w_start", "w_end", "sev")
    val out = Temporal.rangeJoin(pts, ivs, Seq("user_id"),
      "ts", "w_start", "w_end", binMicros = 10L * 60L * 1000000L)
      .groupBy("event_id").count().collect()
    assert(out.length == 12 && out.forall(_.getLong(1) == 1L))
  }

  test("rangeJoin: empty and overlapping intervals; brute-force equivalence on real events") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val pts = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val ivs = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("w_start"))
      .agg(max(col("value")).as("sev"))
      .withColumn("w_end", col("w_start") + expr("INTERVAL 47 MINUTES"))
    val got = Temporal.rangeJoin(pts, ivs, Seq("user_id"),
      "ts", "w_start", "w_end", binMicros = 30L * 60L * 1000000L)
      .select("event_id", "w_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val brute = pts.as("l").join(ivs.as("r"),
      col("l.user_id") === col("r.user_id") &&
        col("l.ts") >= col("w_start") && col("l.ts") < col("w_end"))
      .select("event_id", "w_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(got == brute && got.nonEmpty)
  }
}
