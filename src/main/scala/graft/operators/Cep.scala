package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C1 — the reference's MATCH_RECOGNIZE ERROR-sandwich pattern
  * (kinesis-studio-notebook/notebook.txt:47-68), batch formulation.
  *
  * Pattern, per key ordered by time: A B{1,5} C WITHIN `within`,
  * AFTER MATCH SKIP PAST LAST ROW, where A/C: status == errorValue and
  * B: status != errorValue. Measures as notebook.txt:54-61: A's event
  * time, COUNT(*)-2 non_errors, '-'-joined B statuses (≤5), MIN/AVG/MAX
  * temperature over the whole match, elapsed seconds C-A.
  *
  * Distributed formulation — no joins, no per-key iteration:
  *  1. rn: row_number per key (time, id tiebreak); epoch: running count
  *     of error rows — every row belongs to the epoch of the error
  *     preceding it, so an error row is the FIRST row of its epoch and
  *     the B candidates of a match are exactly the non-error rows of
  *     the A row's epoch.
  *  2. Per-epoch window aggregates give B min/max/sum (sum as DECIMAL —
  *     exact, order-independent) and the ≤5 following statuses
  *     (collect_list over a [1,5]-following frame) for `history`.
  *  3. On error rows only: lead() supplies the consecutive error (the
  *     candidate C). Candidate ⇔ 1 ≤ gap ≤ maxB rows and C-A within
  *     the time bound. Since B rows must be non-errors, A and C are
  *     necessarily consecutive errors — candidates never interleave.
  *  4. AFTER MATCH SKIP PAST LAST ROW: a matched C cannot start the
  *     next match. Within a maximal run of consecutive candidate
  *     pairs the greedy matcher takes positions 1,3,5,… — the classic
  *     gaps-and-islands parity, computed with two row_numbers.
  *
  * Everything is window functions over (key)- and (key, epoch)-hash
  * partitions: two shuffles total, per-key state bounded by the frame,
  * no driver-side logic — the shape survives arbitrary scale-up.
  */
object Cep {

  final case class Params(
      key: String,
      time: String,
      value: String,
      status: String,
      id: String,
      errorValue: String = "error",
      maxB: Int = 5,
      withinMicros: Long = 259200000000L) // 72 h — scaled analog of WITHIN '1' MINUTES

  def matchesBatch(df: DataFrame, p: Params): DataFrame = {
    val wOrd = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_id"))
    val base = df.select(
      col(p.key).as("_k"),
      col(p.time).as("_t"),
      col(p.value).cast("double").as("_v"),
      col(p.status).cast("string").as("_s"),
      col(p.id).as("_id"))
      .withColumn("_err", col("_s") === lit(p.errorValue))
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("_epoch", sum(when(col("_err"), 1).otherwise(0))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val wEpoch = Window.partitionBy(col("_k"), col("_epoch"))
    val wEpochSeq = wEpoch.orderBy(col("_rn")).rowsBetween(1, p.maxB)
    val bNonErr = when(!col("_err"), col("_v"))
    val stats = base
      .withColumn("_b_min", min(bNonErr).over(wEpoch))
      .withColumn("_b_max", max(bNonErr).over(wEpoch))
      .withColumn("_b_sum", sum(when(!col("_err"), col("_v").cast("decimal(18,2)"))).over(wEpoch))
      .withColumn("_b_hist", collect_list(col("_s")).over(wEpochSeq))

    val wErr = Window.partitionBy(col("_k")).orderBy(col("_rn"))
    val errs = stats.filter(col("_err"))
      .withColumn("_c_rn", lead(col("_rn"), 1).over(wErr))
      .withColumn("_c_t", lead(col("_t"), 1).over(wErr))
      .withColumn("_c_v", lead(col("_v"), 1).over(wErr))

    val cands = errs.filter(
      col("_c_rn").isNotNull &&
        (col("_c_rn") - col("_rn") - 1).between(1, p.maxB) &&
        (unix_micros(col("_c_t")) - unix_micros(col("_t"))) <= p.withinMicros)
      .withColumn("_grp", col("_epoch") - row_number().over(wErr))

    val matches = cands
      .withColumn("_pos", row_number().over(
        Window.partitionBy(col("_k"), col("_grp")).orderBy(col("_epoch"))))
      .filter(col("_pos") % 2 === 1)

    val total = col("_c_rn") - col("_rn") + 1
    val avgNum = (col("_v").cast("decimal(18,2)") + col("_c_v").cast("decimal(18,2)") + col("_b_sum"))
    matches.select(
      col("_k").as("sensor_id"),
      col("_t").as("event_time"),
      (col("_c_rn") - col("_rn") - 1).cast("long").as("non_errors"),
      array_join(col("_b_hist"), "-").as("history"),
      least(col("_v"), col("_c_v"), col("_b_min")).as("min_temperature"),
      (floor((avgNum.cast("double") / total) * 100 + lit(0.5)) / 100.0).as("avg_temperature"),
      greatest(col("_v"), col("_c_v"), col("_b_max")).as("max_temperature"),
      floor((unix_micros(col("_c_t")) - unix_micros(col("_t"))) / 1000000.0 + lit(0.5))
        .cast("long").as("elapsed"))
  }
}
