package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Generic `A B{minB,maxB} C WITHIN within` pattern: the reference's
    * ERROR-sandwich (A = C = status==error, B = the complement,
    * {1,5}) becomes one instance — see [[matchesPattern]] for the
    * semantics and the one classification rule that keeps the
    * distributed resolution exact.
    *
    * Predicates are Columns over the INPUT DataFrame's columns (e.g.
    * `col("event_type") === "signup"`), evaluated once per row before
    * the operator's internal renames.
    */
  final case class PatternSpec(
      a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column,
      c: org.apache.spark.sql.Column,
      minB: Int = 1,
      maxB: Int = 5,
      withinMicros: Long = 259200000000L) {
    require(minB >= 0, s"minB must be >= 0, got $minB")
    require(maxB >= minB, s"maxB ($maxB) must be >= minB ($minB)")
    require(withinMicros > 0, s"withinMicros must be positive, got $withinMicros")
  }

  /** The reference pattern as a [[PatternSpec]] instance. `b` uses
    * null-safe negation so a NULL status classifies as B — matching
    * [[matchesBatch]] (whose epoch counter treats NULL `_err` as 0) and
    * the streaming machine (Scala `==` on a null status is false): the
    * three formulations agree on null-status rows. */
  def errorSandwichSpec(p: Params): PatternSpec = PatternSpec(
    a = col(p.status).cast("string") === lit(p.errorValue),
    b = !(col(p.status).cast("string") <=> lit(p.errorValue)),
    c = col(p.status).cast("string") === lit(p.errorValue),
    minB = 1, maxB = p.maxB, withinMicros = p.withinMicros)

  def matchesBatch(df: DataFrame, p: Params): DataFrame = {
    val wOrd = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_id"))
    val base = df.select(
      col(p.key).as("_k"),
      col(p.time).as("_t"),
      col(p.value).cast("double").as("_v"),
      col(p.status).cast("string").as("_s"),
      col(p.id).as("_id"))
      // null-safe: a NULL status is a B row in full (epoch counter,
      // B min/max/sum) — keeps matchesBatch ≡ matchesPattern(
      // errorSandwichSpec) ≡ the streaming machine on null statuses
      .withColumn("_err", col("_s") <=> lit(p.errorValue))
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

  /** The match-level quantities a measures clause can draw on — the
    * MATCH_RECOGNIZE MEASURES vocabulary for this pattern shape, as
    * Columns over the resolved match row. `bMin`/`bMax`/`bSum` are
    * null for an empty B run; `bSum` is DECIMAL(18,2) (exact,
    * order-independent); `avgValue` is the exact decimal mean over
    * A+B+C rounded half-up to 2 dp; `elapsedSeconds` is C−A rounded
    * to whole seconds. */
  final case class MatchMeasures(
      key: Column,
      aTime: Column, aValue: Column, aStatus: Column,
      cTime: Column, cValue: Column, cStatus: Column,
      bCount: Column, bMin: Column, bMax: Column, bSum: Column,
      bHistory: Column,
      totalRows: Column,
      minValue: Column, maxValue: Column, avgValue: Column,
      elapsedSeconds: Column)

  /** The reference notebook's measure list (notebook.txt:54-61) —
    * [[matchesPattern]]'s output when no measures are given, and the
    * schema [[matchesBatch]] pins. */
  def defaultMeasures(m: MatchMeasures): Seq[Column] = Seq(
    m.key.as("sensor_id"),
    m.aTime.as("event_time"),
    m.bCount.cast("long").as("non_errors"),
    // A's epoch holds exactly its match's B rows (C starts the next
    // epoch), so the [1,maxB]-following collect IS the history; an
    // empty B run (minB=0) joins to the empty string
    array_join(m.bHistory, "-").as("history"),
    m.minValue.as("min_temperature"),
    m.avgValue.as("avg_temperature"),
    m.maxValue.as("max_temperature"),
    m.elapsedSeconds.as("elapsed"))

  /** Generic `A B{minB,maxB} C WITHIN within`, AFTER MATCH SKIP PAST
    * LAST ROW — the same two-shuffle epoch/parity machinery as
    * [[matchesBatch]], with the pattern variables as parameters.
    *
    * Semantics (row classification first, then matching):
    *  - A row satisfying `spec.b` is a B row; any other row is a
    *    BOUNDARY. Matches start only at boundary rows satisfying
    *    `spec.a` and end at boundary rows satisfying `spec.c`. This
    *    resolves an a∧b or c∧b overlap deterministically (B wins) —
    *    the one restriction vs full backtracking-regex semantics, and
    *    what keeps the distributed form exact: rows strictly between
    *    consecutive boundaries are all B by construction, so EVERY
    *    candidate match is a consecutive-boundary pair and two
    *    candidates can overlap only by sharing an endpoint (C of one =
    *    A of the next). SKIP PAST LAST ROW over endpoint-chains is the
    *    same gaps-and-islands parity as the fixed form.
    *  - Rows matching no variable are boundaries that satisfy neither
    *    `a` nor `c`: they break B runs and start nothing — the
    *    MATCH_RECOGNIZE treatment of unmatched rows.
    *
    * Generalizations over [[matchesBatch]]: A and C predicates may
    * differ, minB may be 0 (A directly followed by C), and the
    * boundary alphabet may be wider than {A, C}. The fixed form equals
    * `matchesPattern(df, p, errorSandwichSpec(p))` — CepSpec asserts
    * it property-style; the output schema (column names included) is
    * identical, so the two are drop-in interchangeable.
    */
  def matchesPattern(df: DataFrame, p: Params, spec: PatternSpec): DataFrame =
    matchesPattern(df, p, spec, defaultMeasures)

  /** [[matchesPattern]] with a caller-supplied measures clause: the
    * output schema is whatever `measures` names over the
    * [[MatchMeasures]] vocabulary, so non-sensor domains (funnels,
    * order flows) get domain-named outputs instead of the notebook's
    * sensor_id/temperature schema. */
  def matchesPattern(df: DataFrame, p: Params, spec: PatternSpec,
      measures: MatchMeasures => Seq[Column]): DataFrame = {
    val wOrd = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_id"))
    val base = df.select(
      col(p.key).as("_k"),
      col(p.time).as("_t"),
      col(p.value).cast("double").as("_v"),
      col(p.status).cast("string").as("_s"),
      col(p.id).as("_id"),
      spec.b.as("_isB"),
      spec.a.as("_isA"),
      spec.c.as("_isC"))
      // classification rule: B wins; boundaries are the non-B rows
      .withColumn("_bd", !coalesce(col("_isB"), lit(false)))
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("_epoch", sum(when(col("_bd"), 1).otherwise(0))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val wEpoch = Window.partitionBy(col("_k"), col("_epoch"))
    val bVal = when(!col("_bd"), col("_v"))
    val stats = base
      .withColumn("_b_min", min(bVal).over(wEpoch))
      .withColumn("_b_max", max(bVal).over(wEpoch))
      .withColumn("_b_sum", sum(when(!col("_bd"), col("_v").cast("decimal(18,2)"))).over(wEpoch))
      .withColumn("_b_hist",
        if (spec.maxB == 0) array().cast("array<string>")
        else collect_list(col("_s"))
          .over(wEpoch.orderBy(col("_rn")).rowsBetween(1, spec.maxB)))

    val wBd = Window.partitionBy(col("_k")).orderBy(col("_rn"))
    val bds = stats.filter(col("_bd"))
      .withColumn("_c_rn", lead(col("_rn"), 1).over(wBd))
      .withColumn("_c_t", lead(col("_t"), 1).over(wBd))
      .withColumn("_c_v", lead(col("_v"), 1).over(wBd))
      .withColumn("_c_s", lead(col("_s"), 1).over(wBd))
      .withColumn("_c_isC", lead(col("_isC"), 1).over(wBd))

    val cands = bds.filter(
      coalesce(col("_isA"), lit(false)) &&
        coalesce(col("_c_isC"), lit(false)) &&
        (col("_c_rn") - col("_rn") - 1).between(spec.minB, spec.maxB) &&
        (unix_micros(col("_c_t")) - unix_micros(col("_t"))) <= spec.withinMicros)
      .withColumn("_grp", col("_epoch") - row_number().over(wBd))

    val matches = cands
      .withColumn("_pos", row_number().over(
        Window.partitionBy(col("_k"), col("_grp")).orderBy(col("_epoch"))))
      .filter(col("_pos") % 2 === 1)

    val total = col("_c_rn") - col("_rn") + 1
    val bCnt = col("_c_rn") - col("_rn") - 1
    val avgNum = (col("_v").cast("decimal(18,2)") + col("_c_v").cast("decimal(18,2)") +
      coalesce(col("_b_sum"), lit(0).cast("decimal(18,2)")))
    val m = MatchMeasures(
      key = col("_k"),
      aTime = col("_t"), aValue = col("_v"), aStatus = col("_s"),
      cTime = col("_c_t"), cValue = col("_c_v"), cStatus = col("_c_s"),
      bCount = bCnt, bMin = col("_b_min"), bMax = col("_b_max"),
      bSum = col("_b_sum"), bHistory = col("_b_hist"),
      totalRows = total,
      minValue = least(col("_v"), col("_c_v"), col("_b_min")),
      maxValue = greatest(col("_v"), col("_c_v"), col("_b_max")),
      avgValue = floor((avgNum.cast("double") / total) * 100 + lit(0.5)) / 100.0,
      elapsedSeconds = floor(
        (unix_micros(col("_c_t")) - unix_micros(col("_t"))) / 1000000.0 + lit(0.5))
        .cast("long"))
    matches.select(measures(m): _*)
  }
}
