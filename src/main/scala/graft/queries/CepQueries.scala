package graft.queries

import graft.{QDef, Tables}
import graft.operators.Cep

/** C1 batch emulation over `events` (FIXTURES.md §C: event_type='error'
  * plays ERROR, value plays temperature). WITHIN is 72 h — the scaled
  * analog of the reference's 1 minute for this table's ~10 h inter-event
  * cadence. The DuckDB oracle mirrors the window formulation operation
  * for operation; the B-sum accumulates as DECIMAL in both engines so
  * avg_temperature is independent of accumulation order.
  */
object CepQueries {

  private val P = Cep.Params(
    key = "user_id", time = "ts", value = "value", status = "event_type",
    id = "event_id", errorValue = "error", maxB = 5,
    withinMicros = 259200000000L)

  def defs: Seq[QDef] = Seq(
    QDef(
      "c1_cep_error_sandwich",
      (s, dir) => Cep.matchesBatch(Tables.events(s, dir), P),
      Some(
        """WITH base AS (
          |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value AS v, event_type AS s, event_id,
          |         row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
          |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS epoch
          |  FROM events
          |), epochstats AS (
          |  SELECT *,
          |    min(CASE WHEN s <> 'error' THEN v END) OVER (PARTITION BY user_id, epoch) AS b_min,
          |    max(CASE WHEN s <> 'error' THEN v END) OVER (PARTITION BY user_id, epoch) AS b_max,
          |    sum(CASE WHEN s <> 'error' THEN CAST(v AS DECIMAL(18,2)) END) OVER (PARTITION BY user_id, epoch) AS b_sum,
          |    list(s) OVER (PARTITION BY user_id, epoch ORDER BY rn
          |                  ROWS BETWEEN 1 FOLLOWING AND 5 FOLLOWING) AS b_hist
          |  FROM base
          |), errs AS (
          |  SELECT user_id, t, v, rn, epoch, b_min, b_max, b_sum, b_hist,
          |         lead(rn) OVER w AS c_rn,
          |         lead(t) OVER w AS c_t,
          |         lead(v) OVER w AS c_v
          |  FROM epochstats WHERE s = 'error'
          |  WINDOW w AS (PARTITION BY user_id ORDER BY rn)
          |), cands AS (
          |  SELECT *, epoch - row_number() OVER (PARTITION BY user_id ORDER BY epoch) AS grp
          |  FROM errs
          |  WHERE c_rn IS NOT NULL AND c_rn - rn - 1 BETWEEN 1 AND 5
          |    AND epoch_us(c_t) - epoch_us(t) <= 259200000000
          |), matches AS (
          |  SELECT * FROM (
          |    SELECT *, row_number() OVER (PARTITION BY user_id, grp ORDER BY epoch) AS pos FROM cands
          |  ) WHERE pos % 2 = 1
          |)
          |SELECT user_id AS sensor_id, t AS event_time,
          |       c_rn - rn - 1 AS non_errors,
          |       array_to_string(b_hist, '-') AS history,
          |       least(v, c_v, b_min) AS min_temperature,
          |       floor((CAST(CAST(v AS DECIMAL(18,2)) + CAST(c_v AS DECIMAL(18,2)) + b_sum AS DOUBLE)
          |              / (c_rn - rn + 1)) * 100 + 0.5) / 100.0 AS avg_temperature,
          |       greatest(v, c_v, b_max) AS max_temperature,
          |       CAST(floor((epoch_us(c_t) - epoch_us(t)) / 1000000.0 + 0.5) AS BIGINT) AS elapsed
          |FROM matches ORDER BY sensor_id, event_time""".stripMargin),
      headline = true)
  )
}
