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

    // rows-only: the hash-based uniforms aren't reproducible in SQL;
    // the generator's rules and determinism are asserted in GeneratorSpec
    QDef(
      "s3_generator_stats",
      (s, _) => Generator.generate(s, sensors = 100, ticks = 600)
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          min(col("temperature")).as("min_temp"),
          max(col("temperature")).as("max_temp"),
          count_distinct(col("sensor_id")).as("n_sensors"))
        .orderBy(col("status")),
      None)
  )
}
