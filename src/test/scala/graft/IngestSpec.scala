package graft

import graft.streaming.{Generator, Ingest}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}

/** End-to-end ingest pipeline: JSON-line files → S1 parse → S4 narrow
  * pivot → checkpointed parquet sink. Asserts batch/stream parity,
  * append-only incremental pickup, and exactly-once restart behavior
  * (the checkpoint makes a re-run a no-op — the upgrade over the
  * reference Lambda's silent-drop at-least-once writes).
  */
class IngestSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private def writeJsonFile(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes("UTF-8"))

  private def narrowSet(df: org.apache.spark.sql.DataFrame) =
    df.select("sensor_id", "status", "time", "measure_name", "measure_value")
      .collect().map(_.toSeq).toSet

  test("toNarrow emits one row per PRESENT measure with dimensions riding along") {
    import spark.implicits._
    val wide = Seq(
      ("s-01", Some(42.5), "OK", 1700000000000000L),
      ("s-02", None, "ERROR", 1700000001000000L)) // absent measure → no row
      .toDF("sensor_id", "temperature", "status", "event_time")
    val narrow = Ingest.toNarrow(wide, Seq("sensor_id", "status"), Seq("temperature"))
    val rows = narrow.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("sensor_id") == "s-01")
    assert(rows.head.getAs[String]("measure_name") == "temperature")
    assert(rows.head.getAs[Double]("measure_value") == 42.5)
  }

  test("streaming ingest: files → narrow parquet, parity with the batch path") {
    val in = tmp("ingest_in")
    val out = tmp("ingest_out")
    val ckpt = tmp("ingest_ckpt")

    val events = Generator.generate(spark, sensors = 10, ticks = 30)
    val lines = Generator.toJsonLines(events).collect().map(_.getString(0)).toSeq
    writeJsonFile(in, "batch1.json", lines.take(100))
    writeJsonFile(in, "batch2.json", lines.drop(100))

    val q = Ingest.ingestStream(spark, in.toString, out.toString, ckpt.toString)
    q.awaitTermination()

    val got = narrowSet(spark.read.parquet(out.toString))
    val expect = narrowSet(Ingest.toNarrow(events, Seq("sensor_id", "status"), Seq("temperature")))
    assert(got == expect)
    assert(got.nonEmpty)
    // partitioned lake layout (S6 shape): event_date=... directories
    assert(out.toFile.list().exists(_.startsWith("event_date=")))
  }

  test("network ingest entry point: caller-supplied source feeds the same parse path") {
    // The production call is format="kafka" (value: binary → cast to
    // string inside parseSensorJson); the connector jar isn't in the
    // pinned build classpath, so drive the identical code path with the
    // text source, which exposes the same value-shaped column.
    val in = tmp("netingest_in")
    val out = tmp("netingest_out")
    val ckpt = tmp("netingest_ckpt")
    val events = Generator.generate(spark, sensors = 5, ticks = 10)
    val lines = Generator.toJsonLines(events).collect().map(_.getString(0)).toSeq
    writeJsonFile(in, "tick1.json", lines)
    val q = Ingest.networkIngestStream(
      spark, "text", Map("path" -> in.toString), out.toString, ckpt.toString)
    q.awaitTermination()
    val got = narrowSet(spark.read.parquet(out.toString))
    val expect = narrowSet(Ingest.toNarrow(events, Seq("sensor_id", "status"), Seq("temperature")))
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("source seam: a programmatic MemoryStream drives the same parse→pivot→sink path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = tmp("memingest_out")
    val ckpt = tmp("memingest_ckpt")
    val events = Generator.generate(spark, sensors = 5, ticks = 10)
    val lines = Generator.toJsonLines(events).collect().map(_.getString(0)).toSeq
    val ms = MemoryStream[String]
    ms.addData(lines: _*)
    // no file source, no format string — the caller OWNS the source and
    // hands the value-shaped stream straight to the shared sink path
    Ingest.ingestRawStream(ms.toDF(), out.toString, ckpt.toString)
      .awaitTermination()
    val got = narrowSet(spark.read.parquet(out.toString))
    val expect = narrowSet(Ingest.toNarrow(events, Seq("sensor_id", "status"), Seq("temperature")))
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("restart with same checkpoint is exactly-once; new files append") {
    val in = tmp("ingest2_in")
    val out = tmp("ingest2_out")
    val ckpt = tmp("ingest2_ckpt")

    val events = Generator.generate(spark, sensors = 5, ticks = 20)
    val lines = Generator.toJsonLines(events).collect().map(_.getString(0)).toSeq
    writeJsonFile(in, "a.json", lines.take(30))

    Ingest.ingestStream(spark, in.toString, out.toString, ckpt.toString).awaitTermination()
    val n1 = spark.read.parquet(out.toString).count()

    // restart, no new data → no new rows
    Ingest.ingestStream(spark, in.toString, out.toString, ckpt.toString).awaitTermination()
    assert(spark.read.parquet(out.toString).count() == n1)

    // restart with one more file → only its rows appended
    writeJsonFile(in, "b.json", lines.drop(30))
    Ingest.ingestStream(spark, in.toString, out.toString, ckpt.toString).awaitTermination()
    val all = narrowSet(spark.read.parquet(out.toString))
    assert(all == narrowSet(Ingest.toNarrow(events, Seq("sensor_id", "status"), Seq("temperature"))))
  }

  test("quarantine parse: malformed lines keep their raw text; good rows parse clean") {
    import spark.implicits._
    val lines = Seq(
      """{"sensor_id": "s-1", "temperature": 20.5, "status": "OK", "event_time": 1700000000000000}""",
      """{"sensor_id": "s-2", "temperature": 21.0, "status": "OK", "event_time": 1700000001000000""", // truncated
      """not json at all""",
      """{"temperature": 3.0, "status": "OK", "event_time": 1700000002000000}""", // no identity
      """{"sensor_id": "s-3", "status": "ERROR"}""") // parses but no time
    val out = graft.streaming.Ingest
      .parseSensorJsonQuarantine(lines.toDF("value")).collect()
    val good = out.filter(_.getAs[String]("_corrupt") == null)
    val bad = out.filter(_.getAs[String]("_corrupt") != null)
    assert(good.length == 1 && good.head.getAs[String]("sensor_id") == "s-1")
    assert(bad.length == 4)
    // every quarantined row carries its ORIGINAL raw line for replay
    assert(bad.map(_.getAs[String]("_corrupt")).toSet == lines.drop(1).toSet)
  }

  test("dedup ingest: re-delivered records land exactly once, within and across restarts") {
    val in = tmp("ingest3_in")
    val out = tmp("ingest3_out")
    val ckpt = tmp("ingest3_ckpt")

    val events = Generator.generate(spark, sensors = 5, ticks = 10)
    val lines = Generator.toJsonLines(events).collect().map(_.getString(0)).toSeq
    // batch 1: first 30 records, 10 of them duplicated WITHIN the batch
    writeJsonFile(in, "a.json", lines.take(30) ++ lines.take(10))
    Ingest.ingestDedupStream(spark, in.toString, out.toString, ckpt.toString)
      .awaitTermination()

    // batch 2 after restart: 15 re-deliveries of batch-1 records
    // (within the watermark horizon) plus the genuinely new tail
    writeJsonFile(in, "b.json", lines.slice(15, 30) ++ lines.drop(30))
    Ingest.ingestDedupStream(spark, in.toString, out.toString, ckpt.toString)
      .awaitTermination()

    val got = narrowSet(spark.read.parquet(out.toString))
    val expect = narrowSet(
      Ingest.toNarrow(events, Seq("sensor_id", "status"), Seq("temperature")))
    assert(got == expect) // every record exactly once, no dup survived
    val n = spark.read.parquet(out.toString).count()
    assert(n == spark.read.parquet(out.toString).dropDuplicates().count())
  }
}
