package graft.functions

import org.apache.spark.sql.{Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import java.sql.Timestamp
import scala.math.Ordering.Implicits._

/** SURVEY §7 Phase 3 — the Timestream SQL dialect registered as session
  * functions, so the reference's queries (timestream-queries/
  * queries.txt:2-19) run as SQL TEXT against this engine:
  *
  *   CREATE_TIME_SERIES(time, value)      → UDAF: sorted array<struct>
  *   CREATE_TIME_SERIES_STR(time, status) → string-valued series
  *   INTERPOLATE_LINEAR(series, grid)     → UDF over sorted arrays
  *   INTERPOLATE_LOCF(series, grid)       → last-observation carry
  *   BIN(time, seconds)                   → fixed-width bucket truncate
  *   AGO('15m' | '7d' | …) / TS_NOW()     → relative time, frozen-clock
  *
  * Interpolation math replicates operators/TimeSeries.interpolateOnGrid
  * operation for operation (micros integer deltas, identical op order,
  * ties broken by value), so the SQL-text flagship hash-matches the
  * window-formulated one — q_sql_flagship shares t9's DuckDB oracle.
  * One documented divergence: at duplicate (key, time) observations the
  * string-series LOCF breaks the tie by STATUS string here (each series
  * is built independently) while the fused window path breaks it by
  * temperature (both columns ride one row there); identical whenever
  * (key, time) is unique — which the fixtures and any sane sensor feed
  * guarantee.
  * The array form is the API-fidelity path (a sensor's history becomes
  * one array row); the window form remains the scale path (SURVEY
  * §2.3 T3 design note).
  *
  * AGO resolves against an explicit frozen clock when given — queries
  * in the correctness gate must be deterministic; production use passes
  * now = None for the wall clock.
  */
object Dialect {

  final case class TV(time: Timestamp, value: Double)
  final case class SV(time: Timestamp, value: String)

  private def us(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Observations must be (time, value)-sorted for the two-pointer
    * merge. Series built by create_time_series always are; a hand-built
    * SQL array may not be — detect in O(n) (free for the composed path)
    * and sort defensively, matching the aggregator's sort order, so a
    * raw-SQL caller gets correct interpolation instead of silent
    * garbage. */
  private def ensureSorted[T](obs: IndexedSeq[(Long, T)])(
      implicit ord: Ordering[(Long, T)]): IndexedSeq[(Long, T)] = {
    var i = 1
    while (i < obs.length && ord.lteq(obs(i - 1), obs(i))) i += 1
    if (i >= obs.length) obs else obs.sorted
  }

  private def checkSeriesSize(n: Int, cap: Int): Unit =
    if (n > cap) throw new IllegalStateException(
      s"create_time_series: a single series exceeds $cap elements. The array form holds " +
        "one key's whole history in one row — for histories this large use the window-form " +
        "operators (graft.operators.TimeSeries), or raise maxSeriesElements in Dialect.register.")

  /** Sorted-series UDAF: the merge is list concatenation and the sort
    * happens once in finish, so partial aggregation order (cluster
    * nondeterminism) cannot leak into the result. `cap` fails fast
    * (clear error instead of a silent executor OOM downstream) when one
    * key's series exceeds the configured element count. */
  private class SeriesAgg(cap: Int) extends Aggregator[(Timestamp, Double), List[(Timestamp, Double)], Seq[TV]] {
    def zero: List[(Timestamp, Double)] = Nil
    def reduce(b: List[(Timestamp, Double)], a: (Timestamp, Double)): List[(Timestamp, Double)] = a :: b
    def merge(a: List[(Timestamp, Double)], b: List[(Timestamp, Double)]): List[(Timestamp, Double)] = a ::: b
    def finish(b: List[(Timestamp, Double)]): Seq[TV] = {
      checkSeriesSize(b.size, cap)
      b.sortBy { case (t, v) => (us(t), v) }.map { case (t, v) => TV(t, v) }
    }
    def bufferEncoder: Encoder[List[(Timestamp, Double)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[TV]] = ExpressionEncoder()
  }

  private class SeriesStrAgg(cap: Int) extends Aggregator[(Timestamp, String), List[(Timestamp, String)], Seq[SV]] {
    def zero: List[(Timestamp, String)] = Nil
    def reduce(b: List[(Timestamp, String)], a: (Timestamp, String)): List[(Timestamp, String)] = a :: b
    def merge(a: List[(Timestamp, String)], b: List[(Timestamp, String)]): List[(Timestamp, String)] = a ::: b
    def finish(b: List[(Timestamp, String)]): Seq[SV] = {
      checkSeriesSize(b.size, cap)
      b.sortBy { case (t, v) => (us(t), v) }.map { case (t, v) => SV(t, v) }
    }
    def bufferEncoder: Encoder[List[(Timestamp, String)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[SV]] = ExpressionEncoder()
  }

  /** Linear interpolation of a sorted (time, double) series onto grid
    * instants. prev = last observation at-or-before the instant (ties:
    * greatest value — the window formulation's `_v asc` tiebreak);
    * next = first strictly after. Identical IEEE op order to
    * interpolateOnGrid: pv + ((nv - pv) * Δt) / Δtotal on micros longs.
    */
  private def interpLinear(series: Seq[Row], grid: Seq[Timestamp]): Seq[TV] = {
    val obs = ensureSorted(
      series.map(r => (us(r.getTimestamp(0)), r.getDouble(1))).toIndexedSeq)
    if (obs.isEmpty) return Seq.empty // nothing to interpolate from
    // two-pointer merge over the (sorted) series and the grid —
    // O(obs + grid) per group; a per-point scan would be O(obs × grid).
    // The pointer rewinds if a caller passes an out-of-order grid
    // (SEQUENCE always yields ascending instants, but these are general
    // SQL functions).
    var i = 0 // count of observations with t <= current grid instant
    var lastGu = Long.MinValue
    grid.map { g =>
      val gu = us(g)
      if (gu < lastGu) i = 0
      lastGu = gu
      while (i < obs.length && obs(i)._1 <= gu) i += 1
      val v =
        if (i == obs.length) obs(i - 1)._2 // past the last observation
        else if (i == 0) obs.head._2 // before the first observation
        else {
          val (pt, pv) = obs(i - 1)
          val (nt, nv) = obs(i)
          pv + ((nv - pv) * (gu - pt).toDouble) / (nt - pt).toDouble
        }
      TV(g, v)
    }
  }

  /** LOCF of a sorted (time, string) series onto grid instants. */
  private def interpLocf(series: Seq[Row], grid: Seq[Timestamp]): Seq[SV] = {
    val obs = ensureSorted(
      series.map(r => (us(r.getTimestamp(0)), r.getString(1))).toIndexedSeq)
    if (obs.isEmpty) return grid.map(SV(_, null))
    var i = 0
    var lastGu = Long.MinValue
    grid.map { g =>
      val gu = us(g)
      if (gu < lastGu) i = 0
      lastGu = gu
      while (i < obs.length && obs(i)._1 <= gu) i += 1
      SV(g, if (i == 0) null else obs(i - 1)._2)
    }
  }

  private def binTs(t: Timestamp, stepSeconds: Long): Timestamp = {
    val stepUs = stepSeconds * 1000000L
    val b = us(t) - math.floorMod(us(t), stepUs)
    new Timestamp(math.floorDiv(b, 1000L)) // whole-second boundaries: millis exact
  }

  private val AgoPattern = "(\\d+)\\s*(s|m|h|d)".r

  private[graft] def parseAgoMicros(d: String): Long = d.trim match {
    case AgoPattern(n, unit) =>
      val mult = unit match {
        case "s" => 1000000L
        case "m" => 60L * 1000000L
        case "h" => 3600L * 1000000L
        case "d" => 86400L * 1000000L
      }
      n.toLong * mult
    case other => throw new IllegalArgumentException(s"ago(): cannot parse duration '$other'")
  }

  /** Register the dialect on a session. `now` freezes AGO()/TS_NOW()
    * for deterministic queries; None uses the wall clock per call.
    * `maxSeriesElements` bounds how many observations one key's series
    * may hold (the array form's per-key memory knob — exceeded series
    * fail fast instead of OOMing an executor downstream).
    * Also exposes the engine's native expressions (VecDot,
    * WordShingles, RollingPolyHash) as SQL functions — codegen'd /
    * compiled-loop implementations resolved straight from SQL text, no
    * UDF SerDe.
    */
  def register(spark: SparkSession, now: Option[Timestamp] = None,
      maxSeriesElements: Int = 1000000): Unit = {
    import org.apache.spark.sql.GraftShim.registerFunction
    registerFunction(spark, "vec_dot", es => {
      require(es.length == 2, s"vec_dot requires 2 arguments, got ${es.length}")
      // cast to array<double> so SQL callers with array<float>/array<int>
      // get correct numbers (raw ArrayData reads would return garbage)
      // and non-castable inputs fail at analysis time
      VecDot(VectorFunctions.asDoubleArray(es(0)), VectorFunctions.asDoubleArray(es(1)))
    })
    registerFunction(spark, "word_shingles", es => {
      // n must be a literal: the shingle width shapes the expression
      // itself, so a column reference (or non-deterministic foldable)
      // has no meaningful analysis-time value
      require(es.length == 2, s"word_shingles requires 2 arguments, got ${es.length}")
      require(es(1).foldable && es(1).deterministic,
        "word_shingles requires a literal shingle size n")
      val n = es(1).eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"word_shingles: n must be an integer literal, got $other")
      }
      WordShingles(es(0), n)
    })
    registerFunction(spark, "rolling_poly_hash", es => {
      require(es.length == 1, s"rolling_poly_hash requires 1 argument, got ${es.length}")
      RollingPolyHash(es(0))
    })
    spark.udf.register("create_time_series", udaf(new SeriesAgg(maxSeriesElements)))
    spark.udf.register("create_time_series_str", udaf(new SeriesStrAgg(maxSeriesElements)))
    spark.udf.register("interpolate_linear",
      (series: Seq[Row], grid: Seq[Timestamp]) => interpLinear(series, grid))
    spark.udf.register("interpolate_locf",
      (series: Seq[Row], grid: Seq[Timestamp]) => interpLocf(series, grid))
    spark.udf.register("bin", (t: Timestamp, s: Long) => binTs(t, s))
    def nowTs(): Timestamp = now.getOrElse(new Timestamp(System.currentTimeMillis()))
    spark.udf.register("ts_now", () => nowTs())
    spark.udf.register("ago",
      (d: String) => new Timestamp(nowTs().getTime - parseAgoMicros(d) / 1000L))
  }
}
