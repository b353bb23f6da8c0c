package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3 — the synthetic sensor generator with the reference's rules
  * (random-data-generator/random_data_generator.py:21-58): 100 sensors
  * at 1 Hz with ~50% dropout, temperature ∈ [10, 180], status derived
  * from temperature:
  *   temperature > 160            → ERROR
  *   temperature > 140 OR 20%    → random WARNING | ERROR
  *   otherwise                    → OK
  *
  * Randomness is hash-based (md5 of row id + stream salt), NOT
  * `rand()`: every value is a pure function of (seed, row id), so
  * output is identical across partitionings, retries, and cluster
  * layouts — the property the deterministic test fixtures and
  * exactly-once sinks rely on. Generation is `spark.range`, so it
  * scales out embarrassingly (no driver-side loop).
  */
object Generator {

  /** Uniform [0, 1) from a row id and salt — deterministic AND
    * engine-portable (graft.functions.HashRandom: md5-nibble fraction,
    * exact in binary), which is what makes the generator's whole
    * output oracle-checkable. Catalyst's subexpression elimination
    * collapses the repeated md5 calls into one per (row, salt). */
  private def u(id: Column, salt: Int): Column =
    graft.functions.HashRandom.uniform(concat(id.cast("string"), lit(":" + salt)))

  private def wideColumns(id: Column, sensors: Int, startMillis: Long): Seq[Column] = {
    val tick = (id / sensors).cast("long")
    val sensor = pmod(id, lit(sensors)).cast("int")
    // floor(x + 0.5) == round-half-up for positive x, and is the one
    // rounding spelled identically in the DuckDB oracle (Arith.r2 note)
    val temperature = floor(lit(10.0) + u(id, 1) * 170.0 + lit(0.5)).cast("double")
    val flaky = u(id, 2) < 0.2
    val warnErr = when(u(id, 3) < 0.5, "WARNING").otherwise("ERROR")
    val status = when(temperature > 160, lit("ERROR"))
      .when(temperature > 140 || flaky, warnErr)
      .otherwise(lit("OK"))
    Seq(
      format_string("sensor-%02d", sensor).as("sensor_id"),
      temperature.as("temperature"),
      status.as("status"),
      (lit(startMillis) * 1000L + tick * 1000000L).as("event_time"), // micros, 1 Hz
      (u(id, 4) < 0.5).as("emitted")) // ~50% dropout
  }

  /** Batch generation: `ticks` seconds of the fleet. Returns the wide
    * record shape of the stream (sensor_id, temperature, status,
    * event_time micros), post-dropout.
    */
  def generate(spark: SparkSession, sensors: Int = 100, ticks: Int = 60,
      startMillis: Long = 1700000000000L): DataFrame = {
    val ids = spark.range(sensors.toLong * ticks)
    ids.select(wideColumns(col("id"), sensors, startMillis): _*)
      .filter(col("emitted"))
      .drop("emitted")
  }

  /** Streaming generation off the rate source: same record rules keyed
    * on the rate counter — the live feed for the ingest + CEP pipeline
    * (rowsPerSecond ≈ sensors emulates the 1 Hz fleet).
    */
  def generateStream(spark: SparkSession, sensors: Int = 100,
      rowsPerSecond: Int = 100, startMillis: Long = 1700000000000L): DataFrame = {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    rate.select(wideColumns(col("value"), sensors, startMillis): _*)
      .filter(col("emitted"))
      .drop("emitted")
  }

  /** The generated stream as JSON lines (the on-wire shape of the
    * reference's Kinesis records) — feed to Ingest.parseSensorJson. */
  def toJsonLines(wide: DataFrame): DataFrame =
    wide.select(to_json(struct(col("sensor_id"), col("temperature"),
      col("status"), col("event_time"))).as("value"))
}
