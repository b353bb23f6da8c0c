package graft.queries

import graft.{QDef, Tables}
import graft.streaming.{Generator, Ingest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch-checkable surfaces of the streaming family (SURVEY §2.1):
  * the ingest parse+pivot path (S1/S4/S9) exercised on the events
  * table through a real JSON round-trip, and the synthetic generator
  * (S3). The stream-specific halves — file-watch source, checkpointed
  * exactly-once sink, rate-source feed — are end-to-end tested in
  * IngestSpec/GeneratorSpec (a DuckDB oracle cannot run a stream).
  */
object StreamingQueries {

  /** Wide schema of the JSON round-trip fixture: temperature always
    * present, `error_flag` only on error events — exercising the
    * "one narrow row per measure PRESENT" Lambda semantics. */
  private val wideSchema = StructType(Seq(
    StructField("sensor_id", StringType),
    StructField("temperature", DoubleType),
    StructField("status", StringType),
    StructField("event_time", LongType),
    StructField("error_flag", DoubleType)))

  def defs: Seq[QDef] = Seq(

    QDef(
      "s4_ingest_narrow",
      (s, dir) => {
        // events → on-wire JSON lines → S1 parse → S4 narrow pivot.
        // Timing note (r8 warm profile, sf0.1): parse+pivot 0.6 s, the
        // oracle's edge sort ~1 s, warm total 1.65-1.70 s — unchanged
        // since r6. Recorded bench values of 2.5-3.2 s are first-run
        // codegen/JIT for the json render+parse pipeline landing on
        // the timed pass (the untimed construction pass builds plans
        // but executes nothing), not a plan regression; the bench
        // canary samples now make that adjudicable from the artifact.
        val json = Tables.events(s, dir).select(to_json(struct(
          col("user_id").cast("string").as("sensor_id"),
          col("value").as("temperature"),
          col("event_type").as("status"),
          unix_micros(col("ts")).as("event_time"),
          when(col("event_type") === "error", col("value") * 2).as("error_flag"))).as("value"))
        val wide = Ingest.parseSensorJson(json, schema = wideSchema)
        Ingest.toNarrow(wide, dims = Seq("sensor_id", "status"),
          measures = Seq("temperature", "error_flag"))
          .orderBy(col("sensor_id"), col("time"), col("measure_name"))
      },
      Some(
        """WITH wide AS (
          |  SELECT CAST(user_id AS VARCHAR) AS sensor_id,
          |         value AS temperature,
          |         event_type AS status,
          |         epoch_us(CAST(ts AS TIMESTAMP)) AS ut,
          |         CASE WHEN event_type = 'error' THEN value * 2 END AS error_flag
          |  FROM events
          |)
          |SELECT * FROM (
          |  SELECT sensor_id, status, make_timestamp(ut) AS time,
          |         'temperature' AS measure_name, temperature AS measure_value
          |  FROM wide WHERE temperature IS NOT NULL
          |  UNION ALL
          |  SELECT sensor_id, status, make_timestamp(ut), 'error_flag', error_flag
          |  FROM wide WHERE error_flag IS NOT NULL
          |)
          |ORDER BY sensor_id, time, measure_name""".stripMargin)),

    // Full oracle: the md5-nibble uniforms are reproducible in DuckDB
    // (same construction as the d_simhash oracle), so the oracle
    // re-derives every generated record from the same rules —
    // temperature, status, dropout, sensor formatting — and must agree
    // on the aggregate stats bit-for-bit.
    QDef(
      "s3_generator_stats",
      (s, _) => Generator.generate(s, sensors = 100, ticks = 600)
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          min(col("temperature")).as("min_temp"),
          max(col("temperature")).as("max_temp"),
          count_distinct(col("sensor_id")).as("n_sensors"))
        .orderBy(col("status")),
      Some(generatorOracle(sensors = 100, ticks = 600))),

    // The stream-stream interval join's BATCH semantics as a hash gate
    // (the attribution shape: purchases within 1 hour after a click,
    // same user). StreamJoin.intervalJoin is ONE implementation for
    // both modes — StreamJoinSpec pins streamed micro-batches ≡ this
    // exact batch answer, and this row pins the batch answer against
    // an independent DuckDB range join.
    QDef(
      "j_stream_interval",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("purchase_ts"),
            col("event_id").as("purchase_id"),
            round(col("value") * 100).cast("long").as("cents"))
        graft.streaming.StreamJoin.intervalJoin(clicks, purchases, "user_id",
          "click_ts", "purchase_ts", watermark = "2 hours",
          before = "0 seconds", after = "1 hour")
          .select(col("user_id"), col("click_id"), col("purchase_id"), col("cents"))
          .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
      },
      Some(
        """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
          |       CAST(round(p.value * 100) AS BIGINT) AS cents
          |FROM (SELECT * FROM events WHERE event_type = 'click') c
          |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          |  ON p.user_id = c.user_id
          | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
          | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR
          |ORDER BY c.user_id, click_id, purchase_id""".stripMargin))
  )

  /** DuckDB mirror of Generator.generate: md5-nibble uniforms (first 6
    * hex digits over 2^24 — exact binary fractions, so thresholds agree
    * bit-for-bit), identical temperature/status/dropout derivation. */
  private def generatorOracle(sensors: Int, ticks: Int): String = {
    def u(salt: Int): String = {
      val md = s"md5(CAST(i AS VARCHAR) || ':$salt')"
      val nibs = (1 to 6).map { k =>
        s"(CASE WHEN ascii(substr($md, $k, 1)) <= 57" +
          s" THEN ascii(substr($md, $k, 1)) - 48" +
          s" ELSE ascii(substr($md, $k, 1)) - 87 END)"
      }
      val v = nibs.reduce((a, b) => s"(($a) * 16 + $b)")
      s"(CAST($v AS DOUBLE) / 16777216)"
    }
    s"""WITH ids AS (
       |  SELECT i FROM generate_series(0, ${sensors.toLong * ticks - 1}) t(i)
       |), derived AS (
       |  SELECT printf('sensor-%02d', i % $sensors) AS sensor_id,
       |         floor(10 + ${u(1)} * 170 + 0.5) AS temperature,
       |         ${u(2)} < 0.2 AS flaky,
       |         CASE WHEN ${u(3)} < 0.5 THEN 'WARNING' ELSE 'ERROR' END AS warn_err,
       |         ${u(4)} < 0.5 AS emitted
       |  FROM ids
       |), rows_out AS (
       |  SELECT sensor_id, temperature,
       |         CASE WHEN temperature > 160 THEN 'ERROR'
       |              WHEN temperature > 140 OR flaky THEN warn_err
       |              ELSE 'OK' END AS status
       |  FROM derived WHERE emitted
       |)
       |SELECT status, count(*) AS n,
       |       min(temperature) AS min_temp,
       |       max(temperature) AS max_temp,
       |       count(DISTINCT sensor_id) AS n_sensors
       |FROM rows_out GROUP BY status ORDER BY status""".stripMargin
  }
}
