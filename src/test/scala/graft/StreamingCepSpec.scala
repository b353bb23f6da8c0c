package graft

import graft.streaming.CepStream
import graft.streaming.CepStream.{CepMatch, Params, SensorEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp
import scala.util.Random

/** Parity harness for the two C1 formulations: the streaming
  * flatMapGroupsWithState operator must produce exactly the rows of the
  * batch window-function emulation (which is DuckDB-oracle-checked) on
  * the same input, both within one micro-batch and across micro-batch
  * boundaries (state carried between batches).
  */
class StreamingCepSpec extends SparkSpec {
  import spark.implicits._

  private var qid = 0

  /** Feed events through a MemoryStream in `chunks` pieces and collect
    * all emitted matches. */
  private def runStream(events: Seq[SensorEvent], chunks: Int,
      p: Params = Params()): Seq[CepMatch] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    qid += 1
    val name = s"cep_stream_out_$qid"
    val ms = MemoryStream[SensorEvent]
    val q = CepStream.matches(ms.toDS(), p).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      val size = math.max(1, (events.size + chunks - 1) / chunks)
      events.grouped(size).foreach { chunk =>
        ms.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[CepMatch].collect().toSeq
  }

  private def runBatch(events: Seq[SensorEvent], p: Params = Params()): Seq[CepMatch] =
    CepStream.matchesBatchEmulation(events.toDS(), p).as[CepMatch].collect().toSeq

  private def norm(ms: Seq[CepMatch]) =
    ms.sortBy(m => (m.sensor_id, m.event_time.getTime))

  private def seq(key: String, t0: Long, statuses: (String, Double)*): Seq[SensorEvent] =
    statuses.zipWithIndex.map { case ((s, v), i) =>
      SensorEvent(key, new Timestamp(t0 + i * 1000L), v, s, i.toLong)
    }

  private val T0 = 1700000000000L
  private val E = "ERROR" -> 100.0
  private def ok(v: Double) = "OK" -> v

  test("simple sandwich: streaming matches batch with full measures") {
    val ev = seq("k1", T0, E, ok(10), ok(20), E)
    val s = runStream(ev, chunks = 1)
    assert(norm(s) == norm(runBatch(ev)))
    assert(s.head.history == "OK-OK" && s.head.non_errors == 2 && s.head.elapsed == 3)
  }

  test("edge cases: overflow, zero-B, WITHIN expiry, skip-past-last-row") {
    val cases = Seq(
      seq("k1", T0, E, ok(1), ok(2), ok(3), ok(4), ok(5), ok(6), E), // B overflow → none
      seq("k1", T0, E, E),                                           // zero B → none
      seq("k1", T0, E, ok(1), E, ok(2), E),                          // skip past last row → 1
      seq("k1", T0, E, ok(1), E, ok(2), E, ok(3), E),                // parity chain → 2
      seq("k1", T0, E, E, ok(7), E))                                 // reset then match → 1
    cases.foreach { ev =>
      assert(norm(runStream(ev, 1)) == norm(runBatch(ev)), s"diverged on $ev")
    }
    // WITHIN: 4 events 1 s apart → elapsed 3 s; within 2 s suppresses
    val tight = Params(withinMicros = 2000000L)
    val ev = seq("k1", T0, E, ok(1), ok(2), E)
    assert(runStream(ev, 1, tight).isEmpty && runBatch(ev, tight).isEmpty)
  }

  test("C2 ordering contract: in-batch event_time order governs, cross-batch disorder is not repaired") {
    // The reference orders by PROCESSING time (notebook.txt:7,52) but
    // computes every measure from event_time; this engine's documented
    // contract (CepStream.scala scaladoc) sorts each micro-batch by
    // (event_time, event_id) and does not repair disorder ACROSS
    // batches. This case pins both halves so the contract cannot
    // silently change.
    val inOrder = seq("k1", T0, E, ok(10), ok(20), E)
    // arrival order scrambled WITHIN one batch: C, B1, A, B2
    val shuffled = Seq(inOrder(3), inOrder(1), inOrder(0), inOrder(2))
    val s = runStream(shuffled, chunks = 1)
    assert(norm(s) == norm(runBatch(inOrder)),
      "a single micro-batch must match in event_time order, not arrival order")
    assert(s.head.history == "OK-OK" && s.head.elapsed == 3)
    // the same disorder split one-event-per-batch is NOT repaired: the
    // state machine sees C before A and the event-time sandwich never
    // assembles — the documented divergence, relying on the source
    // (a Kinesis shard, a partitioned Kafka topic) preserving each
    // key's order across batches
    val sCross = runStream(shuffled, chunks = 4)
    assert(norm(sCross) != norm(runBatch(inOrder)),
      "cross-batch disorder unexpectedly produced the event-time-order result " +
        "— the documented C2 contract changed")
  }

  test("state survives micro-batch boundaries (A, B, C in separate batches)") {
    val ev = seq("k1", T0, E, ok(10), ok(20), E)
    val out = runStream(ev, chunks = 4) // one event per batch
    assert(norm(out) == norm(runBatch(ev)))
    assert(out.size == 1 && out.head.history == "OK-OK")
  }

  test("randomized multi-key parity, single batch and many batches") {
    val rnd = new Random(99)
    val keys = Seq("s-01", "s-02", "s-03")
    val ev = (0 until 600).map { i =>
      val key = keys(rnd.nextInt(keys.size))
      val status = if (rnd.nextDouble() < 0.35) "ERROR" else if (rnd.nextBoolean()) "OK" else "WARNING"
      SensorEvent(key, new Timestamp(T0 + i * 1000L), 10 + rnd.nextInt(170), status, i.toLong)
    }
    val batch = norm(runBatch(ev))
    assert(batch.nonEmpty) // fixture sanity: the pattern must actually fire
    assert(norm(runStream(ev, chunks = 1)) == batch)
    assert(norm(runStream(ev, chunks = 9)) == batch)
  }

  test("a pending match whose WITHIN horizon fell behind the watermark is dropped, not crashed") {
    // batch 1 (4 events): k1's A plus k2 traffic 300 s later — the
    // watermark jumps past k1's A+WITHIN. batch 2 (3 events): k1
    // receives data while (potentially) holding the stale pending A.
    // Under a continuously-fed stream, step() would then call
    // setTimeoutTimestamp below the watermark → IllegalArgumentException
    // killing the query; the state machine now drops the
    // past-horizon partial match and clamps the TTL above the
    // watermark, so both batch schedules (with or without the engine's
    // interleaved watermark-commit batch) are safe and agree with the
    // batch emulation.
    val ev = Seq(
      SensorEvent("k1", new Timestamp(T0), 100.0, "ERROR", 0L),
      SensorEvent("k1", new Timestamp(T0 + 1000), 10.0, "OK", 1L),
      SensorEvent("k2", new Timestamp(T0 + 300000), 100.0, "ERROR", 2L),
      SensorEvent("k2", new Timestamp(T0 + 301000), 5.0, "OK", 3L),
      SensorEvent("k2", new Timestamp(T0 + 302000), 100.0, "ERROR", 4L),
      SensorEvent("k1", new Timestamp(T0 + 303000), 20.0, "OK", 5L),
      SensorEvent("k1", new Timestamp(T0 + 304000), 100.0, "ERROR", 6L))
    val out = runStream(ev, chunks = 2) // → batches of 4 and 3
    // k2's quick sandwich matches; k1's stale A must NOT (elapsed would
    // exceed WITHIN) and the query must complete without error
    assert(out.map(_.sensor_id).toSet == Set("k2"))
    assert(norm(out) == norm(runBatch(ev)))
  }

  // ——— generic PatternSpec streaming (round 9): the funnel shape of
  // c8_cep_funnel, live ———

  private val funnelP = CepStream.batchParams(Params())
  private def funnelSpec(minB: Int = 0, maxB: Int = 3,
      within: Long = 259200000000L) = graft.operators.Cep.PatternSpec(
    a = org.apache.spark.sql.functions.col("status") === "signup",
    b = org.apache.spark.sql.functions.col("status").isin("click", "view"),
    c = org.apache.spark.sql.functions.col("status") === "purchase",
    minB = minB, maxB = maxB, withinMicros = within)

  /** Feed events through a MemoryStream and run the GENERIC streaming
    * operator with the given spec. */
  private def runStreamPattern(events: Seq[SensorEvent], chunks: Int,
      spec: graft.operators.Cep.PatternSpec): Seq[CepMatch] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    qid += 1
    val name = s"cep_pattern_out_$qid"
    val ms = MemoryStream[SensorEvent]
    val q = CepStream.matchesPattern(ms.toDF(), funnelP, spec).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      val size = math.max(1, (events.size + chunks - 1) / chunks)
      events.grouped(size).foreach { chunk =>
        ms.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[CepMatch].collect().toSeq
  }

  private def runBatchPattern(events: Seq[SensorEvent],
      spec: graft.operators.Cep.PatternSpec): Seq[CepMatch] =
    graft.operators.Cep.matchesPattern(events.toDF(), funnelP, spec)
      .as[CepMatch].collect().toSeq

  test("generic pattern: funnel stream equals batch, minB=0 empty history") {
    val ev = seq("u1", T0,
      "signup" -> 10.0, "click" -> 20.0, "view" -> 30.0, "purchase" -> 40.0,
      "signup" -> 50.0, "purchase" -> 60.0, // minB=0: adjacent A C
      "signup" -> 70.0, "click" -> 80.0, "error" -> 90.0, "purchase" -> 95.0) // broken run
    val spec = funnelSpec()
    val s = norm(runStreamPattern(ev, chunks = 1, spec))
    assert(s == norm(runBatchPattern(ev, spec)))
    assert(s.size == 2)
    assert(s(0).history == "click-view" && s(0).non_errors == 2)
    assert(s(1).history == "" && s(1).non_errors == 0 &&
      s(1).min_temperature == 50.0 && s(1).max_temperature == 60.0)
  }

  test("generic pattern: funnel parity across micro-batch boundaries and minB/maxB bounds") {
    val ev = seq("u1", T0,
      "signup" -> 1.0, "click" -> 2.0, "purchase" -> 3.0,
      "signup" -> 4.0, "click" -> 5.0, "view" -> 6.0, "click" -> 7.0, "view" -> 8.0,
      "purchase" -> 9.0, // 4 B rows > maxB=3 → no match
      "signup" -> 10.0, "purchase" -> 11.0)
    Seq(funnelSpec(minB = 0), funnelSpec(minB = 1), funnelSpec(minB = 2)).foreach { spec =>
      val batch = norm(runBatchPattern(ev, spec))
      assert(norm(runStreamPattern(ev, 1, spec)) == batch, s"single-batch, minB=${spec.minB}")
      assert(norm(runStreamPattern(ev, 5, spec)) == batch, s"multi-batch, minB=${spec.minB}")
    }
  }

  test("generic pattern: randomized funnel parity, state across many micro-batches") {
    val rnd = new Random(7)
    val kinds = Seq("signup", "click", "view", "purchase", "error", "other")
    val keys = Seq("u-01", "u-02", "u-03", "u-04")
    val ev = (0 until 500).map { i =>
      SensorEvent(keys(rnd.nextInt(keys.size)), new Timestamp(T0 + i * 1000L),
        math.floor(rnd.nextDouble() * 1000) / 10.0, kinds(rnd.nextInt(kinds.size)), i.toLong)
    }
    val spec = funnelSpec(within = 30000000L) // 30 s — exercises the bound too
    val batch = norm(runBatchPattern(ev, spec))
    assert(batch.nonEmpty)
    assert(norm(runStreamPattern(ev, 1, spec)) == batch)
    assert(norm(runStreamPattern(ev, 8, spec)) == batch)
  }

  test("streaming measures clause equals the batch measures clause, across micro-batches") {
    import org.apache.spark.sql.functions.{array_join, col}
    val rnd = new Random(11)
    val kinds = Seq("signup", "click", "view", "purchase", "error")
    val ev = (0 until 300).map { i =>
      SensorEvent(s"u-${i % 3}", new Timestamp(T0 + i * 1000L),
        math.floor(rnd.nextDouble() * 1000) / 10.0, kinds(rnd.nextInt(kinds.size)), i.toLong)
    }
    val spec = funnelSpec()
    def funnelMeasures(m: graft.operators.Cep.MatchMeasures) = Seq(
      m.key.cast("string").as("user_id"),
      m.aTime.as("signup_time"),
      m.cTime.as("purchase_time"),
      m.bCount.cast("long").as("mid_events"),
      array_join(m.bHistory, ">").as("journey"),
      m.cValue.as("purchase_value"),
      m.bSum.cast("string").as("mid_spend"), // decimal(18,2) on both paths
      m.avgValue.as("avg_value"),
      m.elapsedSeconds.as("secs"))
    val batch = graft.operators.Cep.matchesPattern(
      ev.toDF(), funnelP, spec, funnelMeasures)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    // streaming: same measures through the vocab post-projection
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    (Seq(1, 6)).foreach { chunks =>
      qid += 1
      val name = s"cep_measures_out_$qid"
      val ms = MemoryStream[SensorEvent]
      val q = CepStream.matchesPatternMeasures(ms.toDF(), funnelP, spec, funnelMeasures)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        val size = math.max(1, (ev.size + chunks - 1) / chunks)
        ev.grouped(size).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      } finally q.stop()
      val streamed = spark.table(name).collect().map(_.toSeq).toSet
      assert(streamed == batch, s"chunks=$chunks")
    }
  }

  test("WITHIN acts as state TTL: stale partial match never completes") {
    // A at t0, B at t0+1s, then C far beyond WITHIN (default 60 s)
    val ev = Seq(
      SensorEvent("k1", new Timestamp(T0), 100.0, "ERROR", 0L),
      SensorEvent("k1", new Timestamp(T0 + 1000), 10.0, "OK", 1L),
      SensorEvent("k1", new Timestamp(T0 + 300000), 100.0, "ERROR", 2L),
      // the late C starts a NEW pending A; a quick sandwich after it matches
      SensorEvent("k1", new Timestamp(T0 + 301000), 20.0, "OK", 3L),
      SensorEvent("k1", new Timestamp(T0 + 302000), 100.0, "ERROR", 4L))
    val out = runStream(ev, chunks = 3)
    assert(norm(out) == norm(runBatch(ev)))
    assert(out.size == 1 && out.head.event_time.getTime == T0 + 300000)
  }
}
