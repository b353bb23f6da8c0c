package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators beyond the reference surface: as-of join and
  * sessionization. The reference has no as-of join (SURVEY.md §2.5 —
  * "as-of semantics are subsumed by LOCF"), but a time-series engine
  * used for training-data pipelines needs the real operator: enrich
  * each fact row with the latest dimension/state row at-or-before its
  * timestamp (point-in-time-correct feature joins).
  *
  * Scale shape: NOT a range join. The as-of join is the
  * union + running-window formulation — one hash shuffle on the key,
  * per-key streaming sort (disk-spillable), zero row amplification.
  * A range/theta join with the same semantics either explodes candidate
  * pairs (every right row ≤ t) or needs a broadcast, neither of which
  * survives 100 TB; the LOCF-over-union form is the same plan family
  * Catalyst already executes for T4 and scales identically.
  */
object Temporal {

  /** As-of join (backward, inclusive): for every left row, attach the
    * payload of the right row with the greatest `rightTime` ≤ the left
    * row's `leftTime`, per join key — or nulls when no such row exists
    * (left-outer semantics, like DuckDB's `ASOF LEFT JOIN`).
    *
    * Mechanics: tag right rows side=0 and left rows side=1, union on a
    * common schema, wrap each right row's (time, payload) in ONE struct
    * and LOCF it with `last(ignoreNulls)` over a running window ordered
    * by (time, side, tiebreak). The struct wrapper is what keeps the
    * semantics honest: a right row whose payload VALUE is null still
    * wins the match (its struct is non-null), exactly like a real
    * as-of join — per-column LOCF would silently skip back to an older
    * row. Right-before-left at equal timestamps gives the inclusive
    * (≥) match; `tiebreak` makes the pick among right rows with
    * identical (key, time) deterministic (greatest value wins —
    * callers needing an engine-portable oracle should pre-reduce the
    * right side to one row per (key, time), where every engine agrees).
    *
    * `tolerance`: when set, a match older than `leftTime − tolerance`
    * is nulled out (the row is kept — left-outer, not a filter), the
    * usual staleness bound in point-in-time feature lookups.
    *
    * Output: all left columns, then each payload column `c` as
    * `asof_c`, then `asof_time` (the matched right timestamp).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Column] = None, tiebreak: Option[String] = None): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, payload, tolerance,
      tiebreak, forward = false)

  /** FORWARD as-of join (inclusive): for every left row, the right row
    * with the SMALLEST `rightTime` ≥ its `leftTime` — "the next
    * maintenance event / deploy / rate change at-or-after this point".
    * The exact mirror of [[asOf]]: same union + one-key-window plan
    * (first-over-following instead of last-over-preceding), same
    * left-outer and tolerance semantics (a match further than
    * `tolerance` AHEAD is nulled), same greatest-tiebreak among equal
    * right timestamps.
    */
  def asOfNext(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Column] = None, tiebreak: Option[String] = None): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, payload, tolerance,
      tiebreak, forward = true)

  private def asOfImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Column], tiebreak: Option[String],
      forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "asOf requires at least one payload column")
    require(!payload.contains("_mt"), "payload column name _mt is reserved")
    val leftCols = left.columns.toSeq

    val mStruct = struct(col(rightTime).as("_mt") +: payload.map(col): _*)
    val mType = right.select(mStruct.as("_m")).schema("_m").dataType
    val l = left.select(
      leftCols.map(col) :+
        col(leftTime).as("_t") :+ lit(1).as("_side") :+ lit(0L).as("_tb") :+
        lit(null).cast(mType).as("_m"): _*)
    val leftOnly = leftCols.filterNot(keys.contains)
    val r0 = right.select(
      keys.map(col) :+
        col(rightTime).as("_t") :+ lit(0).as("_side") :+
        tiebreak.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("_tb") :+
        mStruct.as("_m"): _*)
    val r = leftOnly.foldLeft(r0) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    // Tie layout at equal _t: backward sorts right BEFORE left (side
    // asc) so the inclusive ≤ match sees it in the preceding frame;
    // forward sorts left BEFORE right (side desc) so the inclusive ≥
    // match sees it in the following frame. Tiebreak direction flips
    // with the frame so "greatest _tb wins" holds in both.
    val base = Window.partitionBy(keys.map(col): _*)
    val w =
      if (forward)
        base.orderBy(col("_t").asc, col("_side").desc, col("_tb").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        base.orderBy(col("_t").asc, col("_side").asc, col("_tb").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fill =
      if (forward) first(col("_m"), ignoreNulls = true)
      else last(col("_m"), ignoreNulls = true)
    val filled = l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("_m", fill.over(w))
      .filter(col("_side") === 1)
    val stale = tolerance
      .map { tol =>
        if (forward) col("_m._mt") > (col("_t") + tol)
        else col("_m._mt") < (col("_t") - tol)
      }
      .getOrElse(lit(false))
    filled
      .withColumn("_m", when(stale, lit(null).cast(mType)).otherwise(col("_m")))
      .select(leftCols.map(col) ++
        payload.map(c => col(s"_m.$c").as(s"asof_$c")) :+
        col("_m._mt").as("asof_time"): _*)
  }

  /** Sessionization via Spark's native `session_window`: merge each
    * key's events into sessions separated by gaps ≥ `gap`; one shuffle
    * on the key, and the SAME aggregation runs unchanged under
    * Structured Streaming (session_window is watermark-mergeable state,
    * the engine-native way to sessionize an unbounded stream).
    *
    * Output per session: key, session_start (first event),
    * session_end (last event + gap, the half-open session bound),
    * n_events, and `value` summed in exact integer cents
    * (engine-portable — float sums are order-dependent).
    */
  def sessionize(events: DataFrame, key: String, time: String,
      value: String, gap: String): DataFrame =
    events
      .groupBy(col(key), session_window(col(time), gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col(value) * 100).cast("long")).as("value_cents"))
      .select(col(key), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("value_cents"))

  /** Trailing time-range aggregate: for EVERY event, aggregates over
    * the key's events in `[t − window, t]` (the SQL RANGE INTERVAL
    * PRECEDING frame, inclusive at both bounds) — the per-event moving
    * count/sum/max of monitoring and feature pipelines ("events in the
    * last hour", "rolling max").
    *
    * A RANGE-frame window over the epoch-micros order column: one hash
    * shuffle on the key, per-key streaming sort, and Spark evaluates
    * the sliding frame incrementally (two moving pointers), so cost is
    * O(rows), not O(rows × frame size). Range frames include ALL rows
    * whose order value ties the frame bounds — the same peer rule as
    * SQL engines' RANGE, which is what makes the DuckDB oracle an
    * independent check rather than a re-derivation.
    *
    * The summed value rides as exact integer cents (order-portable);
    * max needs no such care (no arithmetic, exact in any order).
    */
  def trailingAgg(events: DataFrame, key: String, time: String,
      value: String, windowMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col("_tl"))
      .rangeBetween(-windowMicros, Window.currentRow)
    events
      .withColumn("_tl", unix_micros(col(time)))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_cents_window",
        sum(round(col(value) * 100).cast("long")).over(w))
      .withColumn("max_value_window", max(col(value)).over(w))
      .drop("_tl")
  }

  /** Interval (range) join: pair every left point row with every right
    * interval row of the same key whose `[start, end)` contains the
    * point — "which maintenance window / incident / session was this
    * event inside?".
    *
    * Scale shape: a BINNED EQUI-JOIN, not a theta join. Both sides map
    * to fixed-width time bins — a point to the one bin containing it,
    * an interval to every bin it covers (≤ ceil(len/width) + 1 rows,
    * ~2 when `binMicros` is chosen near the typical interval length) —
    * and the join runs hash-partitioned on (key, bin) with the exact
    * containment predicate as a post-filter. Each qualifying pair
    * emerges EXACTLY once (the point lives in exactly one bin), so no
    * dedup pass is needed. A raw inequality join on the same inputs
    * would plan a per-key cross product (or, keys absent, a broadcast
    * nested loop) — the classic 100 TB range-join trap this
    * formulation avoids; candidate amplification is bounded by the
    * bin expansion factor instead of per-key row counts.
    *
    * Intervals with `end ≤ start` are empty and dropped. Non-key
    * column names must be disjoint between the two inputs.
    *
    * Output: all left columns, then the interval's non-key columns.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      time: String, start: String, end: String, binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    val dup = points.columns.toSet
      .intersect(intervals.columns.filterNot(keys.contains).toSet)
    require(dup.isEmpty, s"overlapping non-key columns: ${dup.mkString(", ")}")
    // `div` (exact integer division), never `/`: a double quotient can
    // round across the bin boundary for micros near 2^53-scale values,
    // silently dropping boundary pairs. Timestamps are non-negative, so
    // div == floor-div here.
    // The bin column uses RangeJoinBinRewrite's marker name: the
    // optimizer rule skips any join whose condition already references
    // it, so installing the rule never re-bins (and so re-explodes)
    // a plan this operator built.
    val bin = graft.plans.RangeJoinBinRewrite.BinName
    val p = points.withColumn(bin,
      expr(s"unix_micros($time) div ${binMicros}L"))
    val iv = intervals
      .filter(col(end) > col(start))
      .withColumn(bin, explode(expr(
        s"sequence(unix_micros($start) div ${binMicros}L, " +
          s"(unix_micros($end) - 1) div ${binMicros}L)")))
    p.join(iv, keys :+ bin)
      .filter(col(time) >= col(start) && col(time) < col(end))
      .select(points.columns.map(col) ++
        intervals.columns.filterNot(keys.contains).map(col): _*)
  }

  /** Gaps-and-islands sessionization — the classic two-window
    * formulation (lag → break flag → running sum), kept as the
    * cross-check for [[sessionize]]: TemporalSpec asserts both produce
    * identical sessions, which pins session_window's merge rule (new
    * session iff the gap since the previous event STRICTLY exceeds
    * `gap` — adjacent windows merge, verified empirically in
    * TemporalSpec) to the explicit SQL-expressible definition the
    * DuckDB oracle runs.
    */
  def sessionizeIslands(events: DataFrame, key: String, time: String,
      value: String, gap: String): DataFrame = {
    val wOrd = Window.partitionBy(col(key)).orderBy(col(time))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev", lag(col(time), 1).over(wOrd))
      .withColumn("_brk",
        when(col("_prev").isNull ||
          col(time) > col("_prev") + expr(s"INTERVAL $gap"), 1L).otherwise(0L))
      .withColumn("_sid", sum(col("_brk")).over(wRun))
      .groupBy(col(key), col("_sid"))
      .agg(
        min(col(time)).as("session_start"),
        (max(col(time)) + expr(s"INTERVAL $gap")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(round(col(value) * 100).cast("long")).as("value_cents"))
      .select(col(key), col("session_start"), col("session_end"),
        col("n_events"), col("value_cents"))
  }
}
