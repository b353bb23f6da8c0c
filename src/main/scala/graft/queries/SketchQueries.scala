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

    // Mergeable equi-width histogram quantile sketch: per-event-type
    // value quantiles from a (group × 120-bin) histogram — the
    // bounded-shuffle replacement for exact per-group percentile at
    // corpus scale. The oracle replays the whole sketch (bin clamp,
    // cumulative walk, in-bin linear interpolation) bit-for-bit, so
    // the estimates are hash-checked, not tolerance-checked.
    QDef(
      "k_hist_quantiles",
      (s, dir) => {
        val histo = Sketch.histogramBuild(Tables.events(s, dir),
          col("value"), Seq("event_type"), lo = 0.0, hi = 600.0, bins = 120)
        Sketch.histogramQuantiles(histo, Seq("event_type"),
          lo = 0.0, hi = 600.0, bins = 120, qs = Seq(0.1, 0.5, 0.9, 0.99))
          .orderBy(col("event_type"), col("q"))
      },
      Some(
        """WITH h AS (
          |  SELECT event_type,
          |         LEAST(GREATEST(CAST(floor((value - 0.0) * 120 / 600.0) AS BIGINT), 0), 119) AS bin,
          |         count(*) AS cnt
          |  FROM events GROUP BY 1, 2
          |), c AS (
          |  SELECT event_type, bin, cnt,
          |         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
          |         sum(cnt) OVER (PARTITION BY event_type) AS total
          |  FROM h
          |), qx AS (
          |  SELECT event_type, q, bin, cnt, cum, total
          |  FROM c, (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
          |                  (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE))) AS qs(q)
          |  WHERE cum >= CAST(ceil(q * total) AS BIGINT)
          |), sel AS (
          |  SELECT event_type, q, min(bin) AS bin, arg_min(cnt, bin) AS cnt,
          |         arg_min(cum, bin) AS cum, arg_min(total, bin) AS total
          |  FROM qx GROUP BY 1, 2
          |)
          |SELECT event_type, q,
          |       floor((0.0 + (bin + (CAST(ceil(q * total) AS BIGINT) - cum + cnt) / cnt) * 5.0)
          |             * 100 + 0.5) / 100.0 AS est
          |FROM sel ORDER BY event_type, q""".stripMargin)),

    // Histogram quantiles with DERIVED bounds: pass 1 exact min/max
    // (one cheap agg), pass 2 the same histogram sketch — no
    // caller-supplied [lo, hi]. The oracle replays both passes in the
    // same IEEE operation order, so estimates are bit-exact.
    QDef(
      "k_hist_quantiles_auto",
      (s, dir) => Sketch.histogramQuantilesAuto(Tables.events(s, dir),
        col("value"), Seq("event_type"), bins = 120,
        qs = Seq(0.1, 0.5, 0.9, 0.99))
        .orderBy(col("event_type"), col("q")),
      Some(Sketch.histogramAutoOracleSql("events", "value",
        Seq("event_type"), bins = 120, qs = Seq(0.1, 0.5, 0.9, 0.99)))),

    // HLL set algebra: clicking user-days ∩ purchasing user-days via
    // inclusion-exclusion over ONE dual-register pass (the union
    // register is the per-bucket max of the two cohorts' maxes — the
    // merge property exercised inside a single aggregate). All four
    // estimates replayed bit-for-bit; exact intersection rides along.
    QDef(
      "k_hll_setops",
      (s, dir) => Sketch.hllSetOps(
        Tables.events(s, dir),
        concat(col("user_id").cast("string"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd")),
        inA = col("event_type") === "click",
        inB = col("event_type") === "purchase",
        p = 10),
      Some(Sketch.hllSetOpsOracleSql(
        "events",
        "CAST(user_id AS VARCHAR) || ':' || strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')",
        "event_type = 'click'", "event_type = 'purchase'", p = 10))),

    // Distinct users per day at m=32 registers: the grouped sketch
    // (30 groups, each its own register set), run in CALIBRATION mode
    // (exact = true): exact_distinct / rel_err_pct ride along, computed
    // identically by both engines. This is the tuning form — the
    // exact leg is the distinct-shuffle the sketch replaces, so it is
    // opt-in and k_hll_events below gates the production default.
    QDef(
      "k_hll_users",
      (s, dir) => Sketch.hllDistinct(
        Tables.events(s, dir)
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
        col("user_id").cast("string"),
        groupCols = Seq("day"), p = 5, exact = true)
        .orderBy(col("day")),
      Some(Sketch.hllOracleSql(
        "(SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, user_id FROM events) ev",
        "CAST(user_id AS VARCHAR)", Seq("day"), p = 5, exact = true))),

    // Global distinct event ids at m=1024 registers: the high-precision
    // ungrouped sketch (~3% expected error) in its DEFAULT estimate-only
    // form — no exact leg, so the only shuffle is register-sized.
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
      Some(Sketch.topKNgramsOracleSql("documents", "text", n = 3, k = 20))),

    // Bloom semi-join pruning: the filter is built from the "hot"
    // users (≥ 17 error events), the whole events table is pruned by a
    // MAP-SIDE membership test (no shuffle, no join — the packed
    // bitset rides the plan inside a native codegen'd expression), and
    // the gate hash-checks per-type row counts / bloom passes / true
    // members. Because the buckets are md5-derived, the oracle
    // rebuilds the exact bitset in SQL — every FALSE POSITIVE is
    // reproduced bit-for-bit, so the approximation itself is under the
    // hash, not a tolerance. (At sf0.01 the filter is sparse and FPs
    // are ~0; at sf0.1 load factor ≈ 0.45 makes pruning-with-FPs the
    // measured behavior.)
    QDef(
      "k_bloom_prune",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val build = ev.filter(col("event_type") === "error")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_err"))
          .filter(col("n_err") >= 17)
          .select(col("user_id"))
        val words = Sketch.bloomBuild(build, "user_id", k = BloomK, m = BloomM)
        val pass = Sketch.bloomPrune(ev, "user_id", words, BloomK, BloomM)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_pass"))
        val truth = ev.join(broadcast(build), Seq("user_id"), "left_semi")
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_true"))
        ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_rows"))
          .join(pass, "event_type")
          .join(truth, "event_type")
          .select(col("event_type"), col("n_rows"), col("n_pass"), col("n_true"))
          .orderBy(col("event_type"))
      },
      Some(bloomOracle)),

    // CountMin point-frequency: the d×w counter table built over every
    // trigram occurrence (shuffle bounded by d×w whatever the
    // vocabulary), then the exact top-20 grams plus two known-absent
    // probes estimated by the row-minimum rule. The oracle rebuilds
    // every counter from the same md5 buckets, so collision overcounts
    // — the sketch's entire error story — are hash-checked exactly.
    // (This corpus is CM's adversarial case: near-uniform counts mean
    // estimates ride ≈ N/w above truth; the gate pins that behavior
    // rather than hiding it, and SketchSpec asserts the one-sided
    // bound est ≥ exact.)
    QDef(
      "k_cm_freq",
      (s, dir) => {
        val sp = s; import sp.implicits._
        val grams = Sketch.ngramStream(Tables.documents(s, dir), "text", n = 3)
        val cm = Sketch.countMinBuild(grams, "gram", d = CmD, w = CmW)
        val exact = grams.groupBy(col("gram")).agg(count(lit(1)).as("exact_cnt"))
        val qset = exact.orderBy(desc("exact_cnt"), col("gram")).limit(20)
          .select(col("gram"))
          .unionByName(Seq("zz zz zz", "qq qq qq").toDF("gram"))
        Sketch.countMinEstimate(cm, qset, "gram", d = CmD, w = CmW)
          .join(exact, Seq("gram"), "left")
          .select(col("gram"), col("cm_estimate"),
            coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
          .orderBy(col("gram"))
      },
      Some(cmOracle)))

  private val BloomK = 3
  private val BloomM = 1024
  private val CmD = 4
  private val CmW = 65536

  private def cmOracle: String = {
    val gramHash = parse8("'cm:' || CAST(j AS VARCHAR) || ':' || gram")
    s"""WITH w AS (
       |  SELECT string_split(text, ' ') AS ws FROM documents
       |), g AS (
       |  SELECT unnest(CASE WHEN len(ws) >= 3 THEN list_transform(
       |           generate_series(1, len(ws) - 2), i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
       |         ELSE [] END) AS gram
       |  FROM w
       |), ex AS (
       |  SELECT gram, count(*) AS exact_cnt FROM g GROUP BY gram
       |), cm AS (
       |  SELECT j AS i, $gramHash % $CmW AS bucket, count(*) AS cnt
       |  FROM g, generate_series(0, ${CmD - 1}) js(j)
       |  GROUP BY 1, 2
       |), qs AS (
       |  SELECT gram FROM (SELECT gram FROM ex ORDER BY exact_cnt DESC, gram LIMIT 20)
       |  UNION ALL SELECT 'zz zz zz' UNION ALL SELECT 'qq qq qq'
       |), qb AS (
       |  SELECT gram, j AS i, $gramHash % $CmW AS bucket
       |  FROM qs, generate_series(0, ${CmD - 1}) js(j)
       |), est AS (
       |  SELECT qb.gram, min(COALESCE(cm.cnt, 0)) AS cm_estimate
       |  FROM qb LEFT JOIN cm USING (i, bucket)
       |  GROUP BY qb.gram
       |)
       |SELECT est.gram, CAST(cm_estimate AS BIGINT) AS cm_estimate,
       |       CAST(COALESCE(ex.exact_cnt, 0) AS BIGINT) AS exact_cnt
       |FROM est LEFT JOIN ex ON ex.gram = est.gram
       |ORDER BY est.gram""".stripMargin
  }

  /** DuckDB BIGINT parse of the first 8 md5 hex chars of `arg` —
    * the same 32 uniform bits Spark's conv(substring(md5, 1, 8), 16,
    * 10) extracts (first term cast keeps the fold in BIGINT). */
  private def parse8(arg: String): String =
    (1 to 8).map { i =>
      s"(instr('0123456789abcdef', substr(md5($arg), $i, 1)) - 1)"
    }.reduceLeft((a, b) => s"(CAST($a AS BIGINT) * 16 + $b)")

  private def bloomOracle: String = {
    val keyHash = parse8("'bloom:' || CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")
    s"""WITH build AS (
       |  SELECT user_id FROM events WHERE event_type = 'error'
       |  GROUP BY user_id HAVING count(*) >= 17
       |), bits AS (
       |  SELECT DISTINCT $keyHash % $BloomM AS bucket
       |  FROM build, generate_series(0, ${BloomK - 1}) js(j)
       |), pu AS (
       |  SELECT DISTINCT user_id FROM events
       |), pb AS (
       |  SELECT user_id, $keyHash % $BloomM AS bucket
       |  FROM pu, generate_series(0, ${BloomK - 1}) js(j)
       |), pass AS (
       |  SELECT pb.user_id FROM pb JOIN bits USING (bucket)
       |  GROUP BY pb.user_id HAVING count(*) = $BloomK
       |)
       |SELECT event_type,
       |       count(*) AS n_rows,
       |       count(CASE WHEN p.user_id IS NOT NULL THEN 1 END) AS n_pass,
       |       count(CASE WHEN b.user_id IS NOT NULL THEN 1 END) AS n_true
       |FROM events e
       |LEFT JOIN pass p ON p.user_id = e.user_id
       |LEFT JOIN build b ON b.user_id = e.user_id
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }
}
