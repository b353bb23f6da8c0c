package graft.queries

import graft.{QDef, Tables}
import graft.functions.Arith
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-surface breadth gates: the everyday analytic operators a user
  * switching engines reaches for on day one — ranking/offset window
  * functions, semi-structured JSON extraction, per-group top-k, and
  * bag/set operations — each hash-checked against DuckDB's independent
  * implementation of the same ANSI semantics.
  */
object SurfaceQueries {

  def defs: Seq[QDef] = Seq(

    // Ranking + offset + frame window functions in one pass over one
    // shuffle (all functions share the same (user_id, ts, event_id)
    // window): rank vs dense_rank vs row_number tie behavior, lag/lead
    // offsets, and first/last over a running frame. event_id tiebreak
    // makes every function deterministic in both engines.
    QDef(
      "w_window_suite",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("rn", row_number().over(w))
          // rank by purchase DAY: same-day purchases tie and share a
          // rank — the rank ≠ row_number distinction under test
          .withColumn("rnk", rank().over(Window.partitionBy(col("user_id"))
            .orderBy(to_date(col("ts")))))
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("next_id", lead(col("event_id"), 2).over(w))
          .withColumn("first_ts", first(col("ts")).over(wRun))
          .withColumn("run_cnt", count(lit(1)).over(wRun))
          // the tied-day window again: dense_rank's gapless contract and
          // the two exact-rational distribution functions
          .withColumn("drnk", dense_rank().over(Window.partitionBy(col("user_id"))
            .orderBy(to_date(col("ts")))))
          .withColumn("pr", percent_rank().over(Window.partitionBy(col("user_id"))
            .orderBy(to_date(col("ts")))))
          .withColumn("cd", cume_dist().over(Window.partitionBy(col("user_id"))
            .orderBy(to_date(col("ts")))))
          .withColumn("second_value", nth_value(col("value"), 2).over(wRun))
          .orderBy(col("event_id"))
      },
      Some(
        """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
          |       CAST(row_number() OVER w AS INT) AS rn,
          |       CAST(rank() OVER wd AS INT) AS rnk,
          |       lag(value, 1) OVER w AS prev_value,
          |       lead(event_id, 2) OVER w AS next_id,
          |       first_value(CAST(ts AS TIMESTAMP)) OVER wr AS first_ts,
          |       CAST(count(*) OVER wr AS BIGINT) AS run_cnt,
          |       CAST(dense_rank() OVER wd AS INT) AS drnk,
          |       percent_rank() OVER wd AS pr,
          |       cume_dist() OVER wd AS cd,
          |       nth_value(value, 2) OVER wr AS second_value
          |FROM events WHERE event_type = 'purchase'
          |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id),
          |       wd AS (PARTITION BY user_id ORDER BY CAST(ts AS DATE)),
          |       wr AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
          |              ROWS UNBOUNDED PRECEDING)
          |ORDER BY event_id""".stripMargin)),

    // Datetime function breadth: truncation grains, field extraction,
    // calendar arithmetic — the scalar time toolkit around the binning
    // operators, each spelled against its DuckDB twin.
    QDef(
      "p15_datetime_suite",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_id") % 100 === 0)
        .select(
          col("event_id"),
          date_trunc("week", col("ts")).as("week_start"),
          date_trunc("hour", col("ts")).as("hour_start"),
          dayofweek(col("ts")).cast("long").as("dow_1sun"),
          dayofmonth(col("ts")).cast("long").as("dom"),
          hour(col("ts")).cast("long").as("hh"),
          date_add(to_date(col("ts")), 30).cast("timestamp").as("plus_30d"),
          add_months(to_date(col("ts")), 2).cast("timestamp").as("plus_2mo"),
          last_day(to_date(col("ts"))).cast("timestamp").as("month_end"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("days_since_jan1"))
        .orderBy(col("event_id")),
      Some(
        """SELECT event_id,
          |       date_trunc('week', CAST(ts AS TIMESTAMP)) AS week_start,
          |       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
          |       CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow_1sun,
          |       CAST(dayofmonth(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dom,
          |       CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hh,
          |       CAST(CAST(CAST(ts AS DATE) + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS plus_30d,
          |       CAST(CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS TIMESTAMP) AS plus_2mo,
          |       CAST(last_day(CAST(ts AS DATE)) AS TIMESTAMP) AS month_end,
          |       date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_jan1
          |FROM events WHERE event_id % 100 = 0
          |ORDER BY event_id""".stripMargin)),

    // String scalar breadth: padding, translation, slicing, search,
    // and edit distance over the document corpus — each against
    // DuckDB's independent implementation.
    QDef(
      "p16_string_suite",
      (s, dir) => Tables.documents(s, dir)
        .filter(col("doc_id") % 25 === 0)
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("len"),
          upper(substring(col("text"), 1, 12)).as("head_upper"),
          lpad(col("lang"), 5, "_").as("lang_pad"),
          translate(col("source"), "aeiou", "AEIOU").as("source_vowels"),
          reverse(col("lang")).as("lang_rev"),
          instr(col("text"), "data").cast("long").as("first_data"),
          levenshtein(col("lang"), lit("en")).cast("long").as("lang_dist"),
          regexp_replace(col("text"), "\\bthe\\b", "THE").as("the_marked"))
        .orderBy(col("doc_id")),
      Some(
        """SELECT doc_id,
          |       CAST(length(text) AS BIGINT) AS len,
          |       upper(substr(text, 1, 12)) AS head_upper,
          |       lpad(lang, 5, '_') AS lang_pad,
          |       translate(source, 'aeiou', 'AEIOU') AS source_vowels,
          |       reverse(lang) AS lang_rev,
          |       CAST(instr(text, 'data') AS BIGINT) AS first_data,
          |       CAST(levenshtein(lang, 'en') AS BIGINT) AS lang_dist,
          |       regexp_replace(text, '\b(the)\b', 'THE', 'g') AS the_marked
          |FROM documents WHERE doc_id % 25 = 0
          |ORDER BY doc_id""".stripMargin)),

    // Semi-structured extraction: events.props is a JSON document
    // column; pull a typed field out and aggregate on it — the
    // schema-on-read path every telemetry/doc pipeline runs before
    // anything relational happens. get_json_object stays a narrow
    // codegen'd projection (no shuffle until the aggregate).
    QDef(
      "p14_json_props",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some(
        """SELECT event_type,
          |       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
          |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Per-group top-k: each user's 3 highest-value purchases. The
    // window row_number + filter form — one hash shuffle, per-key sort,
    // early-out at k per key; the total order (value DESC, event_id)
    // makes the cut deterministic.
    QDef(
      "o_topk_per_user",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .orderBy(col("user_id"), col("rk"))
      },
      Some(
        """SELECT event_id, user_id, value, CAST(rk AS INT) AS rk FROM (
          |  SELECT event_id, user_id, value,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY value DESC, event_id) AS rk
          |  FROM events WHERE event_type = 'purchase')
          |WHERE rk <= 3 ORDER BY user_id, rk""".stripMargin)),

    // Statistical aggregates with EXACT moment accumulation: builtin
    // one-pass stddev/corr accumulate floating co-moments whose
    // rounding is engine- and order-dependent — unusable under a hash
    // gate and nondeterministic under retries at scale. Instead the
    // raw moments (Σx, Σx², Σxy …) accumulate as exact integers
    // (decimal for the squares), and the textbook formulas run as one
    // deterministic double-op sequence spelled identically in the
    // oracle. Map-side combine still applies — exact sums are
    // commutative — so the scale shape matches a builtin aggregate.
    QDef(
      "a9_stats_moments",
      (s, dir) => {
        val x = expr("CAST(round(o_totalprice * 100) AS BIGINT)") // cents
        val y = dayofmonth(col("o_orderdate")).cast("long")
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            sum(x).as("sx"),
            sum((x * x).cast("decimal(38,0)")).as("sxx"),
            sum(y).as("sy"),
            sum((y * y).cast("decimal(38,0)")).as("syy"),
            sum((x * y).cast("decimal(38,0)")).as("sxy"))
          .select(
            col("o_orderpriority"),
            col("n"),
            Arith.r2(col("sx").cast("double") / col("n")).as("mean_cents"),
            Arith.r2(sqrt(
              (col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n"))
                / (col("n") - 1))).as("stddev_cents"),
            Arith.r4(
              (col("n") * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")) /
                (sqrt(col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")) *
                  sqrt(col("n") * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double"))))
              .as("corr_price_day"))
          .orderBy(col("o_orderpriority"))
      },
      Some(
        """WITH m AS (
          |  SELECT o_orderpriority,
          |         count(*) AS n,
          |         CAST(sum(x) AS BIGINT) AS sx,
          |         CAST(sum(x * x) AS DOUBLE) AS sxx,
          |         CAST(sum(y) AS BIGINT) AS sy,
          |         CAST(sum(y * y) AS DOUBLE) AS syy,
          |         CAST(sum(x * y) AS DOUBLE) AS sxy
          |  FROM (
          |    SELECT o_orderpriority,
          |           CAST(round(o_totalprice * 100) AS BIGINT) AS x,
          |           CAST(day(o_orderdate) AS BIGINT) AS y
          |    FROM orders)
          |  GROUP BY o_orderpriority)
          |SELECT o_orderpriority, n,
          |       floor((CAST(sx AS DOUBLE) / n) * 100 + 0.5) / 100.0 AS mean_cents,
          |       floor(sqrt((sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1))
          |             * 100 + 0.5) / 100.0 AS stddev_cents,
          |       floor(((n * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          |              (sqrt(n * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
          |               sqrt(n * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
          |             * 10000 + 0.5) / 10000.0 AS corr_price_day
          |FROM m ORDER BY o_orderpriority""".stripMargin)),

    // Set operations over non-trivial cohorts (every user touches every
    // event type, so cohorts are frequency-thresholded): heavy clickers
    // INTERSECT heavy purchasers, EXCEPT heavy error-ers — distinct-set
    // semantics, each leg one aggregate + the set-op shuffles.
    QDef(
      "set_ops_users",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        def heavy(t: String, n: Long) = ev.filter(col("event_type") === t)
          .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= n).select(col("user_id"))
        heavy("click", 14).intersect(heavy("purchase", 14))
          .except(heavy("error", 16))
          .orderBy(col("user_id"))
      },
      Some(
        """WITH h AS (
          |  SELECT event_type, user_id, count(*) AS c FROM events
          |  GROUP BY event_type, user_id)
          |(SELECT user_id FROM h WHERE event_type = 'click' AND c >= 14
          | INTERSECT
          | SELECT user_id FROM h WHERE event_type = 'purchase' AND c >= 14)
          |EXCEPT
          |SELECT user_id FROM h WHERE event_type = 'error' AND c >= 16
          |ORDER BY user_id""".stripMargin)))
}
