package graft.streaming

import graft.operators.Cep
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp
import scala.math.BigDecimal.RoundingMode

/** C1 (streaming form) — the reference's MATCH_RECOGNIZE ERROR-sandwich
  * pattern as a Structured Streaming operator
  * (kinesis-studio-notebook/notebook.txt:47-68): per sensor, pattern
  * A B{1,5} C WITHIN interval, AFTER MATCH SKIP PAST LAST ROW, where
  * A/C are ERROR events and B non-ERROR.
  *
  * Engine shape: `groupByKey(sensor).flatMapGroupsWithState` with
  * event-time timeout — per-key state is a bounded partial match
  * (pending A + ≤maxB buffered B events, ≤7 events total, mirroring the
  * NFA the Flink CEP operator would build). The WITHIN clause doubles
  * as the state TTL: once the watermark passes A + within, the partial
  * match can never complete (a qualifying C would be late beyond the
  * watermark), so the state store stays O(keys × maxB) regardless of
  * stream length — the property that lets this run indefinitely on an
  * unbounded 100 TB/day stream.
  *
  * Ordering (C2): the reference orders by processing time; its measures
  * use event_time, so results agree whenever arrival is in order.
  * Events are sorted by (event_time, event_id) within each micro-batch;
  * cross-batch reordering is not repaired (documented divergence,
  * matching at-most-once arrival order of a Kinesis shard).
  *
  * Measure semantics replicate the batch emulation (operators/Cep.scala
  * — window-function formulation, DuckDB-oracle-checked) bit for bit:
  * decimal(18,2) exact accumulation for the average, half-up rounding
  * to 2 decimals, elapsed = half-up seconds between A and C.
  * StreamingCepSpec asserts parity on identical inputs.
  */
object CepStream {

  final case class SensorEvent(
      sensor_id: String,
      event_time: Timestamp,
      temperature: Double,
      status: String,
      event_id: Long)

  final case class CepMatch(
      sensor_id: String,
      event_time: Timestamp,
      non_errors: Long,
      history: String,
      min_temperature: Double,
      avg_temperature: Double,
      max_temperature: Double,
      elapsed: Long)

  /** Partial-match state: the pending A plus buffered B measures —
    * bounded at maxB entries by construction. A's instant is kept in
    * microseconds (Timestamp.getTime is millis-only; the events table
    * carries micros and elapsed/WITHIN must be micros-exact to match
    * the batch emulation). */
  final case class PartialMatch(
      aTimeMicros: Long,
      aValue: Double,
      bStatuses: List[String],
      bValues: List[Double])

  /** Full-precision instant of a Timestamp in microseconds. */
  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  final case class Params(
      errorValue: String = "ERROR",
      maxB: Int = 5,
      withinMicros: Long = 60000000L) // WITHIN INTERVAL '1' MINUTES

  /** Batch-identical rounding: cast to decimal(18,2) half-up. */
  private def d2(v: Double): BigDecimal =
    BigDecimal(v).setScale(2, RoundingMode.HALF_UP)

  private def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def emit(p: Params, key: String, st: PartialMatch,
      cTimeMicros: Long, cValue: Double): CepMatch = {
    val bMin = st.bValues.min
    val bMax = st.bValues.max
    val total = st.bValues.size + 2
    val sum = d2(st.aValue) + d2(cValue) + st.bValues.map(d2).sum
    val avg = math.floor((sum.toDouble / total) * 100 + 0.5) / 100.0
    val elapsed = math.floor((cTimeMicros - st.aTimeMicros) / 1000000.0 + 0.5).toLong
    CepMatch(
      sensor_id = key,
      event_time = toTimestamp(st.aTimeMicros),
      non_errors = st.bValues.size.toLong,
      history = st.bStatuses.reverse.mkString("-"),
      min_temperature = math.min(math.min(st.aValue, cValue), bMin),
      avg_temperature = avg,
      max_temperature = math.max(math.max(st.aValue, cValue), bMax),
      elapsed = elapsed)
  }

  /** The per-key state machine. Mirrors the batch candidate/parity
    * semantics exactly:
    *  - ERROR with a pending A and 1..maxB B's inside WITHIN → match;
    *    state cleared (SKIP PAST LAST ROW: C cannot start a match).
    *  - any other ERROR → becomes the new pending A.
    *  - non-ERROR with a pending A → buffered; overflow (> maxB) kills
    *    the pending match (the pair can never be a candidate).
    *  - non-ERROR without a pending A → ignored.
    */
  private def step(p: Params, streaming: Boolean)(key: String, events: Iterator[SensorEvent],
      state: GroupState[PartialMatch]): Iterator[CepMatch] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var st: Option[PartialMatch] = state.getOption
    val out = List.newBuilder[CepMatch]

    events.toSeq.sortBy(e => (micros(e.event_time), e.event_id)).foreach { e =>
      val t = micros(e.event_time)
      if (e.status == p.errorValue) {
        st match {
          case Some(pm) if pm.bValues.nonEmpty && pm.bValues.size <= p.maxB &&
              (t - pm.aTimeMicros) <= p.withinMicros =>
            out += emit(p, key, pm, t, e.temperature)
            st = None // SKIP PAST LAST ROW
          case _ =>
            st = Some(PartialMatch(t, e.temperature, Nil, Nil))
        }
      } else {
        st match {
          case Some(pm) =>
            if (pm.bValues.size >= p.maxB) st = None // B{1,5} overflow: abort
            else st = Some(pm.copy(
              bStatuses = e.status :: pm.bStatuses,
              bValues = e.temperature :: pm.bValues))
          case None => // non-error outside any pending match
        }
      }
    }

    st match {
      case Some(pm) =>
        val expiryMillis = pm.aTimeMicros / 1000L + p.withinMicros / 1000L + 1L
        val wm = if (streaming) state.getCurrentWatermarkMs() else 0L
        if (streaming && wm >= expiryMillis) {
          // the pending A is already beyond the WITHIN horizon (any
          // completing C would be late past the watermark) — drop it
          // now; updating instead would also crash setTimeoutTimestamp,
          // which rejects timestamps at or below the watermark
          if (state.exists) state.remove()
        } else {
          state.update(pm)
          // state TTL = the WITHIN horizon: after that no C can
          // complete this match without being late beyond the
          // watermark. (Batch execution has no watermark — timeouts
          // never fire there.) Clamped above the current watermark for
          // partial matches created just inside the horizon.
          if (streaming)
            state.setTimeoutTimestamp(math.max(expiryMillis, wm + 1L))
        }
      case None =>
        if (state.exists) state.remove()
    }
    out.result().iterator
  }

  /** Streaming (or batch) Dataset in, matches out. Streaming input gets
    * a watermark on event_time (bounds state via the WITHIN TTL); batch
    * input runs the same state machine in one pass per key — the same
    * operator serves the continuous and the ad-hoc form.
    *
    * Memory shape: streaming STATE is O(keys × maxB), but each
    * invocation buffers its micro-batch's per-key events for the
    * in-batch sort — fine for micro-batches, whereas the batch form
    * hands one invocation a key's FULL history. For unbounded per-key
    * batch histories prefer `Cep.matchesBatch` (window functions sort
    * with disk spill); the batch mode here exists for parity testing
    * and moderate ad-hoc runs.
    */
  def matches(events: Dataset[SensorEvent], p: Params = Params(),
      watermarkDelay: String = "10 seconds"): Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("event_time", watermarkDelay)
      else events
    withWm
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState[PartialMatch, CepMatch](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout)(
        step(p, streaming))
  }

  /** The batch emulation's params for the same semantics, for parity
    * checks against operators/Cep.matchesBatch. */
  def batchParams(p: Params): Cep.Params =
    Cep.Params("sensor_id", "event_time", "temperature", "status", "event_id",
      errorValue = p.errorValue, maxB = p.maxB, withinMicros = p.withinMicros)

  /** Run the DuckDB-oracle-checked batch emulation over the same typed
    * events, for cross-checking the two formulations (SURVEY §2.7 C1:
    * "Implement both; cross-check on same input"). */
  def matchesBatchEmulation(events: Dataset[SensorEvent], p: Params = Params()): DataFrame =
    Cep.matchesBatch(events.toDF(), batchParams(p))
}
