package graft

import graft.operators.Cep
import org.apache.spark.sql.DataFrame

import java.sql.Timestamp

class CepSpec extends SparkSpec {
  import spark.implicits._

  // one event per second starting at t0; WITHIN set to 10 s unless given
  private def seq(statuses: (String, Double)*): DataFrame =
    statuses.zipWithIndex.map { case ((s, v), i) =>
      ("k1", new Timestamp(1700000000000L + i * 1000L), v, s, i.toLong)
    }.toDF("k", "t", "v", "s", "id")

  private def run(df: DataFrame, within: Long = 10000000L) =
    Cep.matchesBatch(df, Cep.Params("k", "t", "v", "s", "id",
      errorValue = "ERROR", maxB = 5, withinMicros = within))
      .collect()

  private val E = "ERROR" -> 100.0
  private def ok(v: Double) = "OK" -> v

  test("simple sandwich matches with full measures") {
    val out = run(seq(E, ok(10.0), ok(20.0), E))
    assert(out.length == 1)
    val m = out.head
    assert(m.getAs[Long]("non_errors") == 2L)
    assert(m.getAs[String]("history") == "OK-OK")
    assert(m.getAs[Double]("min_temperature") == 10.0)
    assert(m.getAs[Double]("max_temperature") == 100.0)
    assert(m.getAs[Double]("avg_temperature") == 57.5) // (100+10+20+100)/4
    assert(m.getAs[Long]("elapsed") == 3L)
  }

  test("no match without a closing ERROR") {
    assert(run(seq(E, ok(1), ok(2), ok(3))).isEmpty)
  }

  test("B overflow (>5 non-errors) does not match") {
    assert(run(seq(E, ok(1), ok(2), ok(3), ok(4), ok(5), ok(6), E)).isEmpty)
  }

  test("adjacent ERROR-ERROR (zero B rows) does not match") {
    assert(run(seq(E, E)).isEmpty)
  }

  test("WITHIN expiry suppresses slow matches") {
    // 4 events, 1 s apart → C - A = 3 s; within = 2 s
    assert(run(seq(E, ok(1), ok(2), E), within = 2000000L).isEmpty)
    assert(run(seq(E, ok(1), ok(2), E), within = 3000000L).length == 1)
  }

  test("SKIP PAST LAST ROW: shared C cannot start the next match") {
    // E ok E ok E — pairs (1,2) and (2,3) both candidates; greedy takes
    // the first, consumes the middle ERROR, so only one match.
    val out = run(seq(E, ok(1), E, ok(2), E))
    assert(out.length == 1)
    assert(out.head.getAs[String]("history") == "OK")
  }

  test("SKIP PAST LAST ROW: third pair matches again after a skipped middle") {
    // E ok E ok E ok E — candidates (1,2),(2,3),(3,4): matches 1st and 3rd.
    val out = run(seq(E, ok(1), E, ok(2), E, ok(3), E))
    assert(out.length == 2)
    assert(out.map(_.getAs[Double]("min_temperature")).toSet == Set(1.0, 3.0))
  }

  test("non-candidate pair resets the greedy run") {
    // E E ok E: (1,2) not a candidate (no B), so (2,3) is free to match.
    val out = run(seq(E, E, ok(7), E))
    assert(out.length == 1)
    assert(out.head.getAs[Double]("min_temperature") == 7.0)
  }

  test("keys are independent") {
    val df = seq(E, ok(1), E).union(
      Seq(("k2", new Timestamp(1700000000000L), 50.0, "ERROR", 100L),
        ("k2", new Timestamp(1700000001000L), 5.0, "OK", 101L),
        ("k2", new Timestamp(1700000002000L), 50.0, "ERROR", 102L))
        .toDF("k", "t", "v", "s", "id"))
    assert(run(df).length == 2)
  }

  test("matches never overlap and always start/end with ERROR (invariant at sf0.001)") {
    val p = Cep.Params("user_id", "ts", "value", "event_type", "event_id",
      errorValue = "error", maxB = 5, withinMicros = 259200000000L)
    val events = Tables.events(spark, sf("sf0.001"))
    val out = Cep.matchesBatch(events, p)
    val rows = out.select("sensor_id", "event_time", "elapsed", "non_errors").collect()
    // non-overlap: for each key, next match's A strictly after this match's C
    rows.groupBy(_.getLong(0)).foreach { case (_, ms) =>
      val sorted = ms.sortBy(_.getTimestamp(1).getTime)
      sorted.sliding(2).foreach {
        case Array(m1, m2) =>
          val c1End = m1.getTimestamp(1).getTime + m1.getLong(2) * 1000
          assert(m2.getTimestamp(1).getTime > c1End - 1000) // elapsed rounded to s
        case _ =>
      }
    }
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 5))
  }
}
