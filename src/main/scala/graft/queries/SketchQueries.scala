package graft.queries

import graft.{QDef, Tables}
import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** Sketch gates. Unusually for approximate operators, all three are
  * full hash gates, not tolerance checks: the HLL oracles replay the
  * identical md5-register construction and estimator arithmetic in
  * DuckDB (see [[Sketch]]'s exactness discipline), and the heavy-hitter
  * gate's sketch+verify result provably equals the exact top-k the
  * oracle computes (k-th frequency > N/(capacity+1) at every shipped
  * scale factor — re-asserted on the live corpus in SketchSpec).
  */
object SketchQueries {

  def defs: Seq[QDef] = Seq(

    // Distinct users per day at m=32 registers: the grouped sketch
    // (30 groups, each its own register set). exact_distinct /
    // rel_err_pct ride along as calibration columns (both engines
    // compute them identically).
    QDef(
      "k_hll_users",
      (s, dir) => Sketch.hllDistinct(
        Tables.events(s, dir)
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
        col("user_id").cast("string"),
        groupCols = Seq("day"), p = 5),
      Some(Sketch.hllOracleSql(
        "(SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, user_id FROM events) ev",
        "CAST(user_id AS VARCHAR)", Seq("day"), p = 5))),

    // Global distinct event ids at m=1024 registers: the high-precision
    // ungrouped sketch (~3% expected error).
    QDef(
      "k_hll_events",
      (s, dir) => Sketch.hllDistinct(
        Tables.events(s, dir),
        col("event_id").cast("string"),
        groupCols = Seq.empty, p = 10),
      Some(Sketch.hllOracleSql(
        "events", "CAST(event_id AS VARCHAR)", Seq.empty, p = 10))),

    // Sketch MERGEABILITY — the property that makes sketches worth
    // having at 100 TB: per-day register sets (what a pipeline
    // persists) merged via bucket-max must estimate exactly like one
    // pass over the union. Spark runs the two paths as genuinely
    // different plans; the oracle replays the single pass.
    QDef(
      "k_hll_merge",
      (s, dir) => {
        val key = col("user_id").cast("string")
        val ev = Tables.events(s, dir)
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        val daily = Sketch.hllRegisters(ev, key, Seq("day"), p = 5)
        val merged = Sketch.hllEstimate(daily, Seq.empty, p = 5)
          .select(col("hll_estimate").as("merged_estimate"))
        val direct = Sketch.hllEstimate(
          Sketch.hllRegisters(ev, key, Seq.empty, p = 5), Seq.empty, p = 5)
          .select(col("hll_estimate").as("direct_estimate"))
        val exact = ev.agg(countDistinct(key).as("exact_distinct"))
        merged.crossJoin(direct).crossJoin(exact)
      },
      Some(Sketch.hllMergeOracleSql("events", "CAST(user_id AS VARCHAR)", p = 5))),

    // Top-20 trigrams by frequency: Misra-Gries candidates (16384
    // counters per partition) + exact verify of the survivors.
    QDef(
      "k_heavy_ngrams",
      (s, dir) => Sketch.topKNgrams(
        Tables.documents(s, dir), "text", n = 3, k = 20),
      Some(Sketch.topKNgramsOracleSql("documents", "text", n = 3, k = 20))))
}
