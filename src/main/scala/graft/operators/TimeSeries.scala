package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators: the Timestream dialect surface of the reference,
  * re-expressed as Spark-native plans.
  *
  * Reference semantics (all `/root/reference` unless noted):
  *  - CREATE_TIME_SERIES(time, value): timestream-queries/queries.txt:4-9,36-39
  *  - SEQUENCE(min(time), max(time), step): queries.txt:6,26,38
  *  - INTERPOLATE_LINEAR(ts, grid): queries.txt:4-6,24-26
  *  - INTERPOLATE_LOCF(ts, grid): queries.txt:7-9,27-29
  *  - CROSS JOIN UNNEST(series) AS t (time, value): queries.txt:16-17
  *  - flagship composite: queries.txt:2-19
  *
  * Design note (scale): the interpolation path deliberately avoids the
  * array-per-group representation for execution. Collecting a sensor's whole
  * history into one array row caps scalability at per-key memory; instead we
  * union the grid points with the observations and resolve previous/next
  * observation per grid point with frame-bounded window functions. That is
  * one hash-partition shuffle + one sort per key — the same shape Spark uses
  * for any windowed analytic — and streams arbitrarily long per-key history.
  * The array form (`createTimeSeries`) is still provided for API fidelity
  * (UNNEST round-trips, SQL dialect), just not on the hot path.
  *
  * 100× caveat (standard for Window.partitionBy): one KEY's rows must fit
  * a single partition's sort (spilling to disk beyond memory). Keys here
  * are sensors — per-sensor history is bounded by retention, and a
  * pathological hot sensor degrades to disk-backed sort, not failure. If
  * keys were genuinely unbounded, pre-bucket by (key, coarse time range)
  * and stitch range boundaries.
  */
object TimeSeries {

  /** T1 — CREATE_TIME_SERIES as an aggregate Column: ordered
    * array<struct<time,value>> per group. Use inside groupBy().agg().
    */
  def createTimeSeries(time: Column, value: Column): Column =
    array_sort(collect_list(struct(time.as("time"), value.as("value"))))

  /** T2 — SEQUENCE(min,max,step) as an aggregate Column producing the
    * regular grid spanning the group's observed range. `step` is a SQL
    * interval body, e.g. "1 HOUR", "30 SECONDS".
    */
  def sequenceGrid(time: Column, step: String): Column =
    sequence(min(time), max(time), expr(s"INTERVAL $step"))

  /** T5 — UNNEST a series column back to (time, value) rows. */
  def unnestSeries(df: DataFrame, series: String, timeCol: String, valueCol: String): DataFrame =
    df.withColumn("_ts_elem", explode(col(series)))
      .withColumn(timeCol, col("_ts_elem.time"))
      .withColumn(valueCol, col("_ts_elem.value"))
      .drop("_ts_elem", series)

  /** Parameters for grid interpolation over a long-format table. */
  final case class GridParams(
      key: String,
      time: String,
      value: String,
      status: String,
      step: String)

  /** T2+T3+T4 fused: for each key, build the regular grid
    * [min(time), max(time)] with `step`, linearly interpolate `value` onto
    * it (INTERPOLATE_LINEAR) and carry the last `status` forward onto it
    * (INTERPOLATE_LOCF).
    *
    * Output columns: key, "time" (grid instant), "temperature" (interpolated
    * double), "status" (LOCF string).
    *
    * Implementation: union(observations, grid) → per-key window:
    *   prev/next observation via last/first(ignoreNulls) with
    *   unbounded-preceding / unbounded-following frames. Observations sort
    *   before grid points at equal timestamps (is_grid tiebreak) so an
    *   exact grid hit interpolates to the observed value and LOCF picks the
    *   co-timed observation, matching Timestream semantics.
    */
  def interpolateOnGrid(df: DataFrame, p: GridParams): DataFrame = {
    val obs = df.select(
      col(p.key).as("_k"),
      col(p.time).as("_t"),
      col(p.value).cast("double").as("_v"),
      col(p.status).cast("string").as("_s"),
      lit(0).as("_g"))

    val grid = df
      .groupBy(col(p.key).as("_k"))
      .agg(sequence(min(col(p.time)), max(col(p.time)), expr(s"INTERVAL ${p.step}")).as("_grid"))
      .select(col("_k"), explode(col("_grid")).as("_t"),
        lit(null).cast("double").as("_v"), lit(null).cast("string").as("_s"),
        lit(1).as("_g"))

    // _v as final sort key: duplicate (key, ts) observations would
    // otherwise make prev/next nondeterministic across runs/engines.
    // asc_nulls_first matches the oracle's explicit NULLS FIRST (grid
    // rows carry null _v; DuckDB defaults to NULLS LAST on ASC).
    val base = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_g"), col("_v").asc_nulls_first)
    val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next observation" = first non-null at-or-after the current row.
    // Expressed as a RUNNING frame over the REVERSED ordering instead of
    // first() over [currentRow, unboundedFollowing]: Spark evaluates an
    // unbounded-FOLLOWING frame by rescanning the remainder of the
    // partition for every row — O(n²) per key — while running frames
    // are incremental O(n). Same rows, same values, ~3× faster flagship.
    val wNextRun = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_g").desc, col("_v").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val obsTime = when(col("_v").isNotNull, col("_t"))
    val annotated = obs.unionByName(grid)
      .withColumn("_nv", last(col("_v"), ignoreNulls = true).over(wNextRun))
      .withColumn("_nt", last(obsTime, ignoreNulls = true).over(wNextRun))
      .withColumn("_pv", last(col("_v"), ignoreNulls = true).over(wPrev))
      .withColumn("_pt", last(obsTime, ignoreNulls = true).over(wPrev))
      .withColumn("_locf", last(col("_s"), ignoreNulls = true).over(wPrev))

    // v = pv + (nv - pv) * (t - pt) / (nt - pt), micros integer deltas.
    // Edges: pt == nt ⇔ grid point coincides with the only observation in
    // range; nt null ⇔ grid point ties with the final observation (which
    // sorts before it, emptying the following frame) → carry pv; pt null
    // symmetric (only possible with null-valued leading observations).
    val interp = when(col("_pt") === col("_nt"), col("_pv"))
      .when(col("_nt").isNull, col("_pv"))
      .when(col("_pt").isNull, col("_nv"))
      .otherwise(
        col("_pv") + (col("_nv") - col("_pv")) *
          (unix_micros(col("_t")) - unix_micros(col("_pt"))) /
          (unix_micros(col("_nt")) - unix_micros(col("_pt"))))

    annotated
      .filter(col("_g") === 1)
      .select(
        col("_k").as(p.key),
        col("_t").as("time"),
        interp.as("temperature"),
        col("_locf").as("status"))
  }

  /** T9 — the flagship composite (queries.txt:2-19): interpolate both
    * series onto the grid, flatten, re-aggregate per (key, grid instant)
    * with min(status) / avg(temperature) exactly as the reference query
    * does after its double UNNEST + time equi-join.
    */
  def flagship(df: DataFrame, p: GridParams): DataFrame = {
    interpolateOnGrid(df, p)
      .groupBy(col(p.key), col("time"))
      .agg(
        min(col("status")).as("status"),
        graft.functions.Arith.r2(avg(col("temperature"))).as("temperature"))
  }

  /** T7 — BIN(time, step): truncate a timestamp to a fixed-width bucket.
    * Grafana panels: grafana-dashboard/grafanaTimeSeriesre_Inventdemo.json:121,392,518.
    * `t - pmod(t, step)` is pure long arithmetic (floor-mod handles
    * pre-epoch timestamps), exactly DuckDB's integer `//` semantics —
    * no double rounding at any timestamp magnitude.
    */
  def bin(time: Column, stepSeconds: Long): Column = {
    val stepUs = stepSeconds * 1000000L
    timestamp_micros(unix_micros(time) - pmod(unix_micros(time), lit(stepUs)))
  }

  /** T7 in the engine-native tumbling-window spelling: identical
    * semantics to `groupBy(bin(time, step))` (window start == bin
    * floor), but expressed through `window()`, which is what lets the
    * SAME function run UNCHANGED over a batch DataFrame or a
    * watermarked stream in append mode — the streaming-compatible
    * per-bin aggregate (state per open window, closed by the
    * watermark). TimeSeriesSpec pins both equivalences: bin-form
    * equality on batch, and batch/stream parity through MemoryStream.
    */
  def binMaxWindowed(df: DataFrame, key: String, time: String,
      value: String, step: String): DataFrame =
    df.groupBy(col(key), window(col(time), step).as("w"))
      .agg(max(col(value)).as("max_value"))
      .select(col(key), col("w.start").as("bin_ts"), col("max_value"))

  /** Min/max downsampling for time-series rendering: per (key, bin)
    * keep the extreme OBSERVATIONS — true timestamps and values, not
    * bin aggregates — so a plot over the downsampled series preserves
    * every spike the full series had. One hash shuffle on (key, bin),
    * two ranks over the same sorted partition; a single-row bin
    * surfaces as both its own min and max (one row per role, always —
    * deterministic cardinality). `tiebreak` must be a unique column:
    * equal values in a bin need a total order for reproducible picks.
    */
  def downsampleMinMax(df: DataFrame, key: String, time: String,
      value: String, tiebreak: String, stepSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = df.withColumn("bin_ts", bin(col(time), stepSeconds))
    def pick(role: String, w: Window.type => org.apache.spark.sql.expressions.WindowSpec) =
      binned
        .withColumn("_rn", row_number().over(w(Window)))
        .filter(col("_rn") === 1)
        .select(col(key), col("bin_ts"), lit(role).as("role"),
          col(tiebreak), col(time), col(value))
    val lows = pick("min", _.partitionBy(col(key), col("bin_ts"))
      .orderBy(col(value).asc, col(tiebreak).asc))
    val highs = pick("max", _.partitionBy(col(key), col("bin_ts"))
      .orderBy(col(value).desc, col(tiebreak).asc))
    lows.unionByName(highs)
  }

  /** OHLC candle downsampling: per (key, bin) the first (open), max
    * (high), min (low), and last (close) value — the other classic
    * rendering/feature reduction next to [[downsampleMinMax]]. ONE
    * hash aggregate with map-side combine (min_by/max_by partials —
    * no window sort, no second pass): at 100 TB the shuffle carries
    * (key, bin) groups, never observations. Open/close are picked by
    * `min_by`/`max_by` over a `struct(time, tiebreak)` ordinal —
    * struct ordering is lexicographic, so (time, then unique tiebreak)
    * is a total order with no arithmetic and therefore no overflow at
    * any time span or id width (a scaled-BIGINT composite wraps int64
    * ~106 days past its origin under non-ANSI mode — silently).
    */
  def ohlc(df: DataFrame, key: String, time: String, value: String,
      tiebreak: String, stepSeconds: Long): DataFrame = {
    val ord = struct(col(time), col(tiebreak))
    df.groupBy(col(key), bin(col(time), stepSeconds).as("bin_ts"))
      .agg(
        graft.functions.Arith.r2(min_by(col(value), ord)).as("open"),
        graft.functions.Arith.r2(max(col(value))).as("high"),
        graft.functions.Arith.r2(min(col(value))).as("low"),
        graft.functions.Arith.r2(max_by(col(value), ord)).as("close"),
        count(lit(1)).as("n_obs"))
  }

  /** Gap detection — the monitoring question "which sensors went
    * SILENT, and when": per key, every grid step in the key's observed
    * [first, last] span with NO observation inside it. Dual of
    * interpolation (same per-key SEQUENCE grid; instead of filling
    * gaps, report them). One distinct-project of (key, bin), one tiny
    * per-key bounds aggregate, and a LEFT ANTI hash join grid−observed
    * — at 100 TB the anti join shuffles (key, bin) pairs only, never
    * event payloads.
    */
  def detectGaps(df: DataFrame, key: String, time: String,
      stepSeconds: Long): DataFrame = {
    val observed = df
      .select(col(key), bin(col(time), stepSeconds).as("gap_start"))
      .distinct()
    val grid = df
      .groupBy(col(key))
      .agg(min(col(time)).as("_lo"), max(col(time)).as("_hi"))
      .select(col(key), explode(sequence(
        bin(col("_lo"), stepSeconds), bin(col("_hi"), stepSeconds),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("gap_start"))
    grid.join(observed, Seq(key, "gap_start"), "left_anti")
  }

  /** Per-series rate of change (discrete derivative): for every
    * observation after a key's first, (Δvalue / Δseconds) against the
    * predecessor in (time, tiebreak) order — the monitoring "rate()"
    * next to [[trailingAgg]]. One key shuffle + streaming sort, lag
    * is O(1) per row. The quotient is two IEEE ops (multiply, divide)
    * on exact integer micros, so a SQL oracle reproduces it
    * bit-for-bit; zero/negative Δt (duplicate timestamps) yields null
    * rather than ±Infinity.
    */
  def rateOfChange(df: DataFrame, key: String, time: String, value: String,
      tiebreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tiebreak))
    val dt = unix_micros(col(time)) - lag(unix_micros(col(time)), 1).over(w)
    val dv = col(value) - lag(col(value), 1).over(w)
    df.select(col(key), col(time), col(tiebreak), col(value))
      .withColumn("rate_r4",
        when(dt > 0,
          floor(dv * 1000000L / dt * 10000 + lit(0.5)) / 10000.0))
  }

  /** Trailing-window z-score anomaly flagging — "is this reading ≥ k
    * standard deviations from its own recent history?", the standard
    * per-sensor outlier monitor. The frame is a trailing RANGE window
    * (time-bounded, order-insensitive within ties), and every windowed
    * sum is over EXACT integer cents, so mean and variance come out of
    * integer algebra and the only float ops are a fixed division /
    * sqrt sequence a SQL oracle replays bit-for-bit:
    * z = (x·n − Σx) / (n · √((n·Σx² − (Σx)²) / (n·(n−1)))).
    *
    * The anomaly flag derives from the ROUNDED z (both engines emit
    * identical r4 values, so the boolean can't flip on a last-ulp
    * boundary). Null z when the window is thin (n < minN) or flat
    * (zero variance). One key shuffle; state is O(frame) per key.
    */
  def anomalyZScore(df: DataFrame, key: String, time: String, value: String,
      windowMicros: Long, minN: Long = 8L, zThreshold: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col("_tz"))
      .rangeBetween(-windowMicros, Window.currentRow)
    val n = col("n_win"); val s = col("_s"); val q = col("_q"); val x = col("_c")
    val a = n * q - s * s
    val z = (x * n - s).cast("double") /
      (n.cast("double") * sqrt(a.cast("double") / (n * (n - 1)).cast("double")))
    // squared cents pre-projected and all three frame aggregates in
    // ONE select: window expressions over plain attributes with a
    // shared spec collapse into a single Window node (one sort, one
    // pass) — chained withColumn + an inline product plans TWO
    df
      .withColumn("_tz", unix_micros(col(time)))
      .withColumn("_c", round(col(value) * 100).cast("long"))
      .withColumn("_c2", col("_c") * col("_c"))
      .select(col("*"),
        count(lit(1)).over(w).as("n_win"),
        sum(col("_c")).over(w).as("_s"),
        sum(col("_c2")).over(w).as("_q"))
      .withColumn("z_r4",
        when(n >= minN && a > 0, floor(z * 10000 + lit(0.5)) / 10000.0))
      .withColumn("is_anomaly", coalesce(abs(col("z_r4")) > zThreshold, lit(false)))
      .drop("_tz", "_c", "_c2", "_s", "_q")
  }
}
