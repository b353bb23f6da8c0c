package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming form of [[graft.operators.TimeSeries.anomalyZScore]]:
  * per-key trailing-window z-scores on an unbounded stream — the live
  * "is this sensor reading abnormal against its own recent history?"
  * monitor next to the CEP operator.
  *
  * Engine shape: `groupByKey(key).flatMapGroupsWithState`; per-key
  * state is the (micros, cents) pairs inside the trailing window,
  * trimmed on every event, so the state store holds O(events-in-window)
  * per key regardless of stream length. One output row per input
  * event, scores computed with the IDENTICAL exact-integer algebra as
  * the batch operator — `AnomalyStreamSpec` pins stream ≡ batch on the
  * same events (arrival order per key is the contract, same as the CEP
  * operator's documented C2 semantics; within a micro-batch events are
  * sorted by (time, tiebreak)).
  */
object AnomalyStream {

  final case class Reading(key: String, micros: Long, value: Double,
      tiebreak: Long)

  final case class Scored(key: String, time: Timestamp, value: Double,
      tiebreak: Long, n_win: Long, z_r4: Option[Double], is_anomaly: Boolean)

  /** Window contents, ascending micros. Cents alongside so the scoring
    * algebra is exact-integer, same as the batch form. */
  final case class WindowState(entries: Vector[(Long, Long)])

  /** Score one event against the window INCLUDING itself — the literal
    * batch arithmetic: z = (x·n − Σx)/(n·√((n·Σx² − (Σx)²)/(n·(n−1)))),
    * rounded half-up to 4 decimals; None when thin or flat. */
  private def score(entries: Vector[(Long, Long)], cents: Long, minN: Long,
      zThreshold: Double): (Long, Option[Double], Boolean) = {
    val n = entries.length.toLong
    val s = entries.iterator.map(_._2).sum
    val q = entries.iterator.map(e => e._2 * e._2).sum
    val a = n * q - s * s
    if (n >= minN && a > 0) {
      val z = (cents * n - s).toDouble /
        (n.toDouble * math.sqrt(a.toDouble / (n * (n - 1)).toDouble))
      val r4 = math.floor(z * 10000 + 0.5) / 10000.0
      (n, Some(r4), math.abs(r4) > zThreshold)
    } else (n, None, false)
  }

  /** Apply to a streaming (or batch) DataFrame with columns
    * (`key`, `time` timestamp, `value` double, `tiebreak` long). For
    * streams the caller sets a watermark upstream if an event-time
    * sink requires one; state is self-trimming either way.
    */
  def anomalyZScoreStream(events: DataFrame, key: String, time: String,
      value: String, tiebreak: String, windowMicros: Long,
      minN: Long = 8L, zThreshold: Double = 3.0): Dataset[Scored] = {
    require(windowMicros > 0, s"windowMicros must be > 0, got $windowMicros")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(key).cast("string").as("key"),
        unix_micros(col(time)).as("micros"),
        col(value).cast("double").as("value"),
        col(tiebreak).cast("long").as("tiebreak"))
      .as[Reading]
      .groupByKey(_.key)
      .flatMapGroupsWithState[WindowState, Scored](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[Reading], state: GroupState[WindowState]) =>
          var entries = state.getOption.map(_.entries)
            .getOrElse(Vector.empty[(Long, Long)])
          val out = it.toSeq.sortBy(r => (r.micros, r.tiebreak)).map { r =>
            // HALF_UP on the double product — the same rounding Spark's
            // round(value * 100) applies in the batch operator
            val cents = BigDecimal(r.value * 100)
              .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
            entries = (entries :+ ((r.micros, cents)))
              .dropWhile(_._1 < r.micros - windowMicros)
            val (n, z, flag) = score(entries, cents, minN, zThreshold)
            val ts = new Timestamp(r.micros / 1000000L * 1000L)
            ts.setNanos(((r.micros % 1000000L) * 1000L).toInt)
            Scored(k, ts, r.value, r.tiebreak, n, z, flag)
          }
          if (entries.isEmpty) state.remove() else state.update(WindowState(entries))
          out.iterator
      }
  }
}
