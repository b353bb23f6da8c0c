package graft

import graft.streaming.Generator
import org.apache.spark.sql.functions._

/** The synthetic generator must honor the reference's derivation rules
  * (status from temperature, ~50% dropout, 2-digit sensor ids) and be
  * fully deterministic — identical output for any partitioning, the
  * property its hash-based randomness exists to provide.
  */
class GeneratorSpec extends SparkSpec {

  private lazy val df = Generator.generate(spark, sensors = 100, ticks = 600)

  test("temperature range and status rules match the reference derivation") {
    val rows = df.select("temperature", "status").collect()
    assert(rows.forall { r =>
      val t = r.getDouble(0); t >= 10.0 && t <= 180.0
    })
    rows.foreach { r =>
      val (t, s) = (r.getDouble(0), r.getString(1))
      assert(Set("OK", "WARNING", "ERROR")(s))
      if (t > 160) assert(s == "ERROR", s"t=$t must be ERROR")
      else if (t > 140) assert(s != "OK", s"t=$t must be WARNING/ERROR")
      if (s == "OK") assert(t <= 140)
    }
    // all three statuses occur
    assert(df.select("status").distinct().count() == 3)
  }

  test("fleet shape: 2-digit sensor ids, 1 Hz ticks, ~50% dropout") {
    val sensors = df.select("sensor_id").distinct().collect().map(_.getString(0))
    assert(sensors.length == 100)
    assert(sensors.forall(_.matches("sensor-\\d{2}")))
    val n = df.count().toDouble / (100 * 600)
    assert(n > 0.45 && n < 0.55, s"dropout fraction $n")
    // event_time advances in whole seconds (micros)
    val ts = df.select("event_time").limit(100).collect().map(_.getLong(0))
    assert(ts.forall(t => t % 1000000L == 0L))
  }

  test("deterministic and partition-count invariant") {
    val a = df.collect().map(_.toSeq).toSet
    val b = Generator.generate(spark, sensors = 100, ticks = 600)
      .repartition(13).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("stream form has the identical schema to the batch form") {
    val s = Generator.generateStream(spark, sensors = 10, rowsPerSecond = 10)
    assert(s.isStreaming)
    assert(s.schema == df.schema)
  }
}
