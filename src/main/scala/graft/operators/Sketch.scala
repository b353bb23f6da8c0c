package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Approximate-aggregation sketches with EXACTLY reproducible results:
  * HyperLogLog distinct counting and Misra-Gries heavy hitters.
  *
  * The usual objection to gating a sketch against a second engine is
  * that the sketch's internals (hash function, register layout,
  * estimator arithmetic) are implementation-private, so only weak
  * "within ε" checks are possible. Both sketches here are built from
  * md5 — the one hash Spark and DuckDB evaluate identically (the same
  * trick as [[Dedup.simhash64]] and [[graft.functions.HashRandom]]) —
  * and every estimator step is either exact integer arithmetic or a
  * single IEEE double op, so a DuckDB oracle can replay the WHOLE
  * sketch bit-for-bit and the gates are hash-green, not tolerance
  * checks.
  *
  * Scale shape (the reason sketches exist at 100 TB):
  *  - HLL: one narrow projection → hash aggregate on (group, bucket)
  *    with map-side partial max (shuffle ≤ groups × m rows after
  *    combine, regardless of input size) → tiny final aggregate. No
  *    distinct-shuffle of the raw keys, which is the whole point: the
  *    exact `count(distinct)` this replaces shuffles every distinct
  *    (group, key) pair.
  *  - Heavy hitters: one streaming pass per partition bounded at
  *    `capacity` counters (Misra-Gries), then an exact count of ONLY
  *    the surviving candidates — a join against a candidate set
  *    bounded by capacity × partitions (in practice by the vocabulary),
  *    never a full-vocabulary top-k shuffle of a skewed key space.
  */
object Sketch {

  // ---------------------------------------------------------------------------
  // HyperLogLog
  // ---------------------------------------------------------------------------

  /** Register layout, fixed regardless of precision p ≤ 10: md5(key)
    * hex chars 1..3 (12 bits) pmod m give the bucket; chars 4..16
    * (13 nibbles = 52 bits) give rho = 1 + leading-zero-bit count
    * (53 when all 52 bits are zero). Estimator: raw HLL,
    * E = alpha_m · m² / Σ_j 2^(−M_j) (Flajolet et al. 2007).
    *
    * Exactness discipline: the harmonic sum runs SCALED BY 2^53 in
    * BIGINT — every term 2^(53−M_j) ≤ 2^52 is an exact integer, and
    * with at least one occupied bucket the total is < m·2^53 ≤ 2^63,
    * so 64-bit addition is exact and order-independent across
    * partitionings AND engines (a double sum would round
    * order-dependently once the exponent spread exceeds the mantissa).
    * Only the final step happens in doubles: one cast, one divide, one
    * half-up round — each a single deterministic IEEE op.
    */
  private val RhoWindowNibbles = 13 // 52 bits of rho material
  private val RhoScale = 53 // rho ∈ [1, 53]; sum scaled by 2^53
  private val TermScale = 1L << RhoScale // 2^53, the empty-bucket term

  /** alpha_m · m² · 2^53 as one double constant; embedding the SAME
    * shortest-repr literal in the oracle SQL makes the final division
    * bit-identical in both engines. Small-m alphas are the published
    * bias correctors. */
  private[graft] def hllNumerator(p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m * math.pow(2.0, RhoScale)
  }

  /** (bucket, rho) columns for a string key. The upper bound is 10, not
    * an implementation whim: the BIGINT-scaled harmonic sum needs
    * m·2^53 ≤ 2^63 (every empty bucket contributes the full 2^53 term),
    * i.e. m ≤ 1024. At p ≥ 11 the sum can wrap int64 — silently under
    * non-ANSI Spark, while DuckDB's HUGEINT would not — so estimates
    * diverge between engines exactly where the gate can't see it.
    */
  private[graft] def hllCols(key: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 10,
      s"hll precision must be in [4, 10] (m*2^53 must fit int64), got $p")
    val md = md5(key)
    val m = 1 << p
    val bucket = pmod(conv(substring(md, 1, 3), 16, 10).cast("int"), lit(m))
    // Leading-zero nibble run of the rho window, then the bit position
    // inside the first non-zero nibble. When the window is all zeros
    // firstNib reads past the string (ascii('') = 0) but that branch's
    // value is unused — rho takes the all-zero arm.
    val rest = substring(md, 4, RhoWindowNibbles)
    val z = length(regexp_extract(rest, "^(0*)", 1))
    val fnChar = ascii(rest.substr(z + lit(1), lit(1)))
    val firstNib = when(fnChar <= 57, fnChar - 48).otherwise(fnChar - 87)
    val lzInNib = when(firstNib >= 8, 0).when(firstNib >= 4, 1)
      .when(firstNib >= 2, 2).otherwise(3)
    val rho = when(z === RhoWindowNibbles, lit(RhoScale))
      .otherwise(z * 4 + lzInNib + 1)
    (bucket, rho)
  }

  /** Per-group HLL distinct estimate of `key` (a string-typed column).
    *
    * Default output: groupCols..., hll_estimate (half-up 2dp) — the
    * scale-safe form, whose only shuffle is register-sized (≤ 2^p rows
    * per group). `exact = true` adds a calibration leg
    * (`exact_distinct`, `rel_err_pct` half-up 2dp) computed with a real
    * `count(distinct)` — useful while tuning `p`, but that leg IS the
    * distinct-shuffle the sketch replaces, so it is opt-in and should
    * never ship in a production pipeline at corpus scale.
    */
  def hllDistinct(df: DataFrame, key: Column, groupCols: Seq[String], p: Int,
      exact: Boolean = false): DataFrame = {
    import graft.functions.Arith.r2
    val gs = groupCols.map(col)
    val harmonic = hllEstimate(hllRegisters(df, key, groupCols, p), groupCols, p)
    if (!exact) return harmonic.select(gs :+ col("hll_estimate"): _*)
    val exactLeg = df
      .groupBy(gs: _*)
      .agg(countDistinct(key).as("exact_distinct"))
    val joined =
      if (groupCols.isEmpty) harmonic.crossJoin(exactLeg)
      else harmonic.join(exactLeg, groupCols)
    joined
      .withColumn(
        "rel_err_pct",
        r2((col("hll_estimate") - col("exact_distinct")) * 100.0 /
          col("exact_distinct")))
      .select(gs ++ Seq(col("hll_estimate"), col("exact_distinct"),
        col("rel_err_pct")): _*)
  }

  /** Per-group register SETS — the mergeable partial state a pipeline
    * persists (e.g. one register set per day): one row per occupied
    * (group..., bucket) with the max rho. ≤ m rows per group however
    * large the input. */
  def hllRegisters(df: DataFrame, key: Column, groupCols: Seq[String], p: Int): DataFrame = {
    val (bucket, rho) = hllCols(key, p)
    val gs = groupCols.map(col)
    df.select(gs :+ bucket.as("b") :+ rho.as("r"): _*)
      .groupBy(gs :+ col("b"): _*)
      .agg(max(col("r")).as("mr"))
  }

  /** Estimate from register sets (per `groupCols` subset of the
    * registers' group columns — pass Seq.empty to MERGE all register
    * sets into one estimate, the sketch-union that lets persisted
    * daily sketches roll up to any period without rescanning raw
    * data: max is associative, so max-of-daily-maxes ≡ the registers
    * of the unioned data). */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    import graft.functions.Arith.r2
    val m = 1 << p
    val gs = groupCols.map(col)
    regs
      .groupBy(gs :+ col("b"): _*)
      .agg(max(col("mr")).as("mr")) // no-op when groupCols == the regs' grouping
      .groupBy(gs: _*)
      .agg(
        sum(pow(lit(2.0), lit(RhoScale) - col("mr")).cast("long")).as("s_present"),
        count(lit(1)).as("nb"))
      .withColumn(
        "s_total",
        col("s_present") + (lit(m.toLong) - col("nb")) * lit(TermScale))
      .withColumn(
        "hll_estimate",
        r2(lit(hllNumerator(p)) / col("s_total").cast("double")))
  }

  /** HLL set-operation estimates over two cohorts of one keyed table:
    * |A|, |B|, |A∪B| read off ONE dual-register pass (per bucket, the
    * max rho of each cohort; the union register is their max — the
    * merge property executed inside a single aggregate), and
    * |A∩B| = |A| + |B| − |A∪B| by inclusion–exclusion — the standard
    * HLL intersection estimator. Exact intersection rides along for
    * calibration (computed from the distinct-key table, the one extra
    * aggregate) — and matters, because inclusion–exclusion's absolute
    * error scales with the OPERANDS (σ ≈ 1.04/√m of each of the three
    * estimates), not the intersection: the estimate is tight when the
    * overlap is comparable to the union and can swamp a small overlap
    * entirely (the documented limitation of every HLL intersection;
    * SketchSpec pins both regimes).
    *
    * One sketch-sized shuffle (≤ m register rows) + one distinct-key
    * aggregate; every estimate is the same fixed IEEE sequence as
    * [[hllEstimate]], so the oracle replays all four bit-for-bit.
    * Output (one row): hll_a, hll_b, hll_union, hll_intersect (half-up
    * 2dp), exact_intersect.
    */
  def hllSetOps(df: DataFrame, key: Column, inA: Column, inB: Column,
      p: Int): DataFrame = {
    val tagged = taggedCohorts(df, key, inA, inB, p)
    val exact = cohortKeyFlags(tagged)
      .agg(count(when(col("a") && col("bb"), lit(1))).as("exact_intersect"))
    hllSetOpsFromRegisters(hllDualRegisters(tagged), exact, p)
  }

  private[graft] def taggedCohorts(df: DataFrame, key: Column, inA: Column,
      inB: Column, p: Int): DataFrame = {
    val (bucket, rho) = hllCols(key, p)
    df.select(bucket.as("b"), rho.as("r"),
      inA.as("ia"), inB.as("ib"), key.as("k"))
  }

  /** The STATEFUL stage of [[hllSetOps]]: per bucket, each cohort's
    * max rho — a plain (bucket → max, max) aggregate, so the same call
    * is streaming-legal in complete mode with state bounded by m rows
    * forever (SketchSpec pins stream ≡ batch). Input columns: b, r,
    * ia, ib (from the tagged projection). */
  private[graft] def hllDualRegisters(tagged: DataFrame): DataFrame =
    tagged
      .filter(col("ia") || col("ib"))
      .groupBy(col("b"))
      .agg(max(when(col("ia"), col("r"))).as("ra"),
        max(when(col("ib"), col("r"))).as("rb"))

  /** Per-key cohort membership flags — the stateful half of the exact
    * intersection (also a single streaming-legal aggregate; the final
    * count is a stateless read of its result). */
  private[graft] def cohortKeyFlags(tagged: DataFrame): DataFrame =
    tagged.groupBy(col("k"))
      .agg(max(col("ia")).as("a"), max(col("ib")).as("bb"))

  /** Fold the dual-register table into the four estimates (stateless
    * finishing stage — in a live pipeline it runs as a batch read over
    * the continuously-maintained register sink). */
  private[graft] def hllSetOpsFromRegisters(regs: DataFrame,
      exact: DataFrame, p: Int): DataFrame = {
    import graft.functions.Arith.r2
    val m = 1 << p
    val sums = regs.agg(
      sum(pow(lit(2.0), lit(RhoScale) - col("ra")).cast("long")).as("sa"),
      count(col("ra")).as("na"),
      sum(pow(lit(2.0), lit(RhoScale) - col("rb")).cast("long")).as("sb"),
      count(col("rb")).as("nb"),
      // greatest skips nulls: the union register set
      sum(pow(lit(2.0), lit(RhoScale) - greatest(col("ra"), col("rb"))).cast("long")).as("su"),
      count(lit(1)).as("nu"))
    // empty-cohort guard: n = 0 would make the empty-bucket term
    // m * 2^53 (int64 overflow at p = 10) with a NULL register sum —
    // short-circuit to the exact answer, estimate 0.0, before the
    // register arithmetic (mirrored in hllSetOpsOracleSql)
    def est(s: String, n: String) =
      when(col(n) === 0, lit(0.0)).otherwise(
        lit(hllNumerator(p)) /
          (col(s) + (lit(m.toLong) - col(n)) * lit(TermScale)).cast("double"))
    sums.crossJoin(exact)
      .select(
        r2(est("sa", "na")).as("hll_a"),
        r2(est("sb", "nb")).as("hll_b"),
        r2(est("su", "nu")).as("hll_union"),
        r2(est("sa", "na") + est("sb", "nb") - est("su", "nu")).as("hll_intersect"),
        col("exact_intersect"))
  }

  /** DuckDB replay of [[hllSetOps]]: the same dual-register CTE and
    * the identical estimate arithmetic. `aSql`/`bSql` are the cohort
    * predicates over `src`'s columns. */
  def hllSetOpsOracleSql(src: String, keySql: String, aSql: String,
      bSql: String, p: Int): String = {
    val m = 1 << p
    val numer = hllNumerator(p).toString
    // same empty-cohort short-circuit as the engine: n = 0 would
    // overflow the empty-bucket term before the division
    def est(s: String, n: String) =
      s"(CASE WHEN $n = 0 THEN 0.0 ELSE $numer / CAST($s + ($m - $n) * $TermScale AS DOUBLE) END)"
    val ea = est("sa", "na"); val eb = est("sb", "nb"); val eu = est("su", "nu")
    // cohort flags computed once in the source subquery, then carried
    // as plain columns through the shared register CTE chain
    val tagged = s"(SELECT *, ($aSql) AS ia, ($bSql) AS ib FROM $src) tagged_src"
    s"""WITH ${regsCtes(tagged, keySql, "ia, ib, ", m)}, dual AS (
       |  SELECT b,
       |         max(CASE WHEN ia THEN mr END) AS ra,
       |         max(CASE WHEN ib THEN mr END) AS rb
       |  FROM regs WHERE ia OR ib GROUP BY b
       |), sums AS (
       |  SELECT
       |    sum(CAST(power(2.0, $RhoScale - ra) AS BIGINT)) AS sa, count(ra) AS na,
       |    sum(CAST(power(2.0, $RhoScale - rb) AS BIGINT)) AS sb, count(rb) AS nb,
       |    sum(CAST(power(2.0, $RhoScale - greatest(ra, rb)) AS BIGINT)) AS su,
       |    count(*) AS nu
       |  FROM dual
       |), ex AS (
       |  SELECT count(*) AS exact_intersect FROM (
       |    SELECT $keySql AS k FROM $src GROUP BY 1
       |    HAVING max(CASE WHEN $aSql THEN 1 ELSE 0 END) = 1
       |       AND max(CASE WHEN $bSql THEN 1 ELSE 0 END) = 1)
       |)
       |SELECT floor($ea * 100 + 0.5) / 100.0 AS hll_a,
       |       floor($eb * 100 + 0.5) / 100.0 AS hll_b,
       |       floor($eu * 100 + 0.5) / 100.0 AS hll_union,
       |       floor(($ea + $eb - $eu) * 100 + 0.5) / 100.0 AS hll_intersect,
       |       CAST(exact_intersect AS BIGINT) AS exact_intersect
       |FROM sums, ex""".stripMargin
  }

  /** DuckDB replay of [[hllDistinct]] over table `src`: identical
    * bucket/rho extraction (instr-on-hex-alphabet nibble arithmetic),
    * identical BIGINT harmonic sum, identical final double ops.
    * `keySql` must render the key exactly as the Spark column does
    * (bigints print identically in both engines). `exact` mirrors the
    * Spark side's calibration switch. */
  def hllOracleSql(src: String, keySql: String, groupCols: Seq[String], p: Int,
      exact: Boolean = false): String = {
    val m = 1 << p
    val numer = hllNumerator(p).toString
    val gSel = groupCols.map(g => s"$g, ").mkString
    val gBy = if (groupCols.isEmpty) "" else s"GROUP BY ${groupCols.mkString(", ")}"
    val gJoin =
      if (groupCols.isEmpty) "ON TRUE"
      else "USING (" + groupCols.mkString(", ") + ")"
    val ord = if (groupCols.isEmpty) "" else s"\nORDER BY ${groupCols.mkString(", ")}"
    val estCte =
      s"""WITH ${regsCtes(src, keySql, gSel, m)}, est AS (
         |  SELECT $gSel
         |         floor($numer / CAST(
         |             sum(CAST(power(2.0, $RhoScale - mr) AS BIGINT))
         |             + ($m - count(*)) * ${TermScale}
         |           AS DOUBLE) * 100 + 0.5) / 100.0 AS hll_estimate
         |  FROM regs $gBy
         |)""".stripMargin
    if (!exact)
      s"""$estCte
         |SELECT $gSel hll_estimate FROM est$ord""".stripMargin
    else
      s"""$estCte, ex AS (
         |  SELECT $gSel count(DISTINCT $keySql) AS exact_distinct FROM $src $gBy
         |)
         |SELECT $gSel hll_estimate, exact_distinct,
         |       floor((hll_estimate - exact_distinct) * 100.0 / exact_distinct
         |             * 100 + 0.5) / 100.0 AS rel_err_pct
         |FROM est JOIN ex $gJoin$ord""".stripMargin
  }

  /** The h → zr → rho → regs CTE chain shared by the HLL oracles. */
  private def regsCtes(src: String, keySql: String, gSel: String, m: Int): String =
    s"""h AS (
       |  SELECT $gSel md5($keySql) AS md FROM $src
       |), zr AS (
       |  SELECT $gSel
       |         (instr('0123456789abcdef', substr(md, 1, 1)) - 1) * 256
       |         + (instr('0123456789abcdef', substr(md, 2, 1)) - 1) * 16
       |         + (instr('0123456789abcdef', substr(md, 3, 1)) - 1) AS b12,
       |         length(regexp_extract(substr(md, 4, $RhoWindowNibbles), '^(0*)', 1)) AS z,
       |         instr('0123456789abcdef',
       |               substr(substr(md, 4, $RhoWindowNibbles),
       |                      length(regexp_extract(substr(md, 4, $RhoWindowNibbles), '^(0*)', 1)) + 1,
       |                      1)) - 1 AS fn
       |  FROM h
       |), rho AS (
       |  SELECT $gSel b12 % $m AS b,
       |         CASE WHEN z = $RhoWindowNibbles THEN $RhoScale
       |              ELSE z * 4
       |                   + (CASE WHEN fn >= 8 THEN 0 WHEN fn >= 4 THEN 1
       |                           WHEN fn >= 2 THEN 2 ELSE 3 END) + 1
       |         END AS r
       |  FROM zr
       |), regs AS (
       |  SELECT $gSel b, max(r) AS mr FROM rho GROUP BY ${gSel}b
       |)""".stripMargin

  /** DuckDB twin of the merge gate: one register pass (merging
    * per-period register maxes is associatively identical to the
    * single pass — that equality is exactly what the gate checks on
    * the Spark side, where the two estimates run as genuinely
    * different plans). */
  def hllMergeOracleSql(src: String, keySql: String, p: Int): String = {
    val m = 1 << p
    val numer = hllNumerator(p).toString
    s"""WITH ${regsCtes(src, keySql, "", m)}, est AS (
       |  SELECT floor($numer / CAST(
       |             sum(CAST(power(2.0, $RhoScale - mr) AS BIGINT))
       |             + ($m - count(*)) * ${TermScale}
       |           AS DOUBLE) * 100 + 0.5) / 100.0 AS e
       |  FROM regs
       |), ex AS (
       |  SELECT count(DISTINCT $keySql) AS exact_distinct FROM $src
       |)
       |SELECT est.e AS merged_estimate, est.e AS direct_estimate,
       |       ex.exact_distinct
       |FROM est JOIN ex ON TRUE""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // Misra-Gries heavy hitters
  // ---------------------------------------------------------------------------

  /** One Misra-Gries pass: at most `capacity` counters; surviving keys
    * are returned. Guarantee (Misra & Gries 1982): any key whose
    * frequency in this stream exceeds n/(capacity+1) survives. Exposed
    * for the property test. */
  private[graft] def misraGries(it: Iterator[String], capacity: Int): Iterator[String] = {
    val counts = mutable.HashMap.empty[String, Long]
    it.foreach { g =>
      counts.get(g) match {
        case Some(c) => counts.update(g, c + 1)
        case None if counts.size < capacity => counts.update(g, 1L)
        case None =>
          // Decrement-all eviction: amortized O(1) per input item
          // (each decrement pays for one prior increment).
          val dead = List.newBuilder[String]
          counts.foreachEntry { (k, c) =>
            if (c == 1L) dead += k else counts.update(k, c - 1)
          }
          dead.result().foreach(counts.remove)
      }
    }
    counts.keysIterator
  }

  /** Exact top-k n-grams by frequency via sketch-candidates +
    * exact-verify:
    *
    *  1. CANDIDATES: per-partition Misra-Gries over the n-gram stream.
    *     Pigeonhole lifts the per-partition guarantee to a global one:
    *     if freq(g) > N/(capacity+1) globally then freq_p(g) >
    *     n_p/(capacity+1) in some partition, so g survives there.
    *  2. VERIFY: exact counts of ONLY the candidates (join + hash
    *     aggregate), then top-k under the total order (count DESC,
    *     gram ASC).
    *
    * The result EQUALS the exact top-k whenever the k-th frequency
    * exceeds N/(capacity+1) — SketchSpec asserts both that bound and
    * the equality on the real corpus. Output: gram, cnt.
    */
  def topKNgrams(docs: DataFrame, text: String, n: Int, k: Int,
      capacity: Int = 16384): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = ngramStream(docs, text, n)
    val cands = grams.as[String]
      .mapPartitions(it => misraGries(it, capacity))
      .toDF("gram").distinct()
    // Candidate set is bounded by capacity × partitions and in practice
    // by the vocabulary — leave the join strategy to stats/AQE (it
    // broadcasts when small), never a full-vocabulary top-k shuffle.
    grams.join(cands, "gram")
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }

  /** Word n-grams WITH multiplicity (unlike the dedup shingles, which
    * are per-doc sets), one row per occurrence, column `gram`. */
  private[graft] def ngramStream(docs: DataFrame, text: String, n: Int): DataFrame = {
    val lam = (0 until n).map(j => s"element_at(ws, i + $j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(split(col(text), " ").as("ws"))
      .select(explode(when(size(col("ws")) >= n,
        expr(s"transform(sequence(1, size(ws) - ${n - 1}), i -> $lam)"))
        .otherwise(array().cast("array<string>"))).as("gram"))
  }

  // ---------------------------------------------------------------------------
  // Bloom filter — semi-join pruning
  // ---------------------------------------------------------------------------

  /** The k bucket positions of a string key in an m-bit Bloom filter:
    * bucket j = first 8 md5 hex chars of "bloom:j:key" (32 uniform
    * bits) pmod m. md5-derived like every sketch here, so a DuckDB
    * oracle reproduces every bucket — and therefore every false
    * positive — bit-for-bit: the pruning gate is a hash check, not a
    * tolerance check. m ≤ 2^30 keeps pmod well inside the 32-bit
    * uniform's range (bias ≤ 2^-2 of a ulp per bucket, identical in
    * both engines since the arithmetic is).
    */
  def bloomBuckets(key: Column, k: Int, m: Int): Column = {
    require(k >= 1 && k <= 16, s"bloom k must be in [1, 16], got $k")
    require(m >= 64 && m <= (1 << 30) && (m & 63) == 0,
      s"bloom m must be a multiple of 64 in [64, 2^30], got $m")
    array((0 until k).map { j =>
      pmod(conv(substring(md5(concat(lit(s"bloom:$j:"), key)), 1, 8), 16, 10)
        .cast("long"), lit(m.toLong))
    }: _*)
  }

  /** Build the packed bitset from the build side's keys: buckets pack
    * into 64-bit words DISTRIBUTIVELY — groupBy(bucket >> 6) with a
    * bit_or of the shifted bits, map-side combined — so the shuffle
    * and the driver collect are both bounded by m/64 word rows (m=2^20
    * is 16 K rows / 128 KiB packed), never by the n·k bucket stream.
    * The ONLY driver-side data is the filter itself — which the API
    * returns anyway — exactly like the centroid/codebook model state
    * of the ANN family.
    */
  def bloomBuild(build: DataFrame, key: String, k: Int, m: Int): Array[Long] = {
    val words = new Array[Long](m / 64)
    build
      .select(explode(bloomBuckets(col(key).cast("string"), k, m)).as("bucket"))
      .groupBy(shiftright(col("bucket"), 6).as("word"))
      .agg(expr("bit_or(shiftleft(1L, int(bucket % 64)))").as("bits"))
      .collect()
      .foreach { r => words(r.getLong(0).toInt) = r.getLong(1) }
    words
  }

  /** Probe-side pruning: keep rows whose key MIGHT be in the filter.
    * A map-side codegen'd filter ([[graft.functions.BloomMightContain]]
    * — the bitset rides the plan) — the probe table is never shuffled
    * and never joined, which is the entire value of Bloom pruning at
    * 100 TB: the exact semi-join this precedes only sees the rows that
    * survive. False positives pass (by design, deterministically);
    * false negatives are impossible.
    */
  def bloomPrune(probe: DataFrame, key: String, words: Array[Long],
      k: Int, m: Int): DataFrame = {
    require(words.length * 64 == m, s"bitset has ${words.length * 64} bits, expected $m")
    probe.filter(graft.functions.BloomFunctions.bloomMightContain(
      bloomBuckets(col(key).cast("string"), k, m), words))
  }

  // ---------------------------------------------------------------------------
  // CountMin — point-frequency sketch
  // ---------------------------------------------------------------------------

  /** Row-i bucket of a key in a width-w CountMin sketch: first 8 md5
    * hex chars of "cm:i:key" (32 uniform bits) pmod w — md5-derived
    * like the whole sketch family, so a DuckDB oracle rebuilds every
    * counter, and therefore every collision-overcount, bit-for-bit. */
  private def cmBucket(key: Column, i: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cm:$i:"), key)), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))

  private def cmPairs(key: Column, d: Int, w: Int): Column =
    array((0 until d).map { i =>
      struct(lit(i).as("i"), cmBucket(key, i, w).as("bucket"))
    }: _*)

  /** Build the d×w counter table from an item stream (one row per
    * OCCURRENCE): each item increments one counter per row. One hash
    * aggregate over d×N exploded pairs with map-side combine — the
    * shuffle is bounded by d×w rows REGARDLESS of vocabulary or input
    * size, which is the sketch's scale property (an exact frequency
    * table shuffles every distinct key). Counters are plain sums, so
    * shard sketches merge by adding counters (roll-up, spec'd). */
  def countMinBuild(items: DataFrame, key: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8, s"countMin depth must be in [1, 8], got $d")
    require(w >= 16, s"countMin width must be >= 16, got $w")
    items
      .select(explode(cmPairs(col(key).cast("string"), d, w)).as("e"))
      .groupBy(col("e.i").as("i"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates: est(key) = min over rows of the key's
    * counter — the classic CountMin upper bound (never undercounts;
    * overcounts only by colliding keys, ≈ N/w per row). The query set
    * is tiny and broadcast against the (≤ d×w row) sketch. */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame, key: String,
      d: Int, w: Int): DataFrame =
    queries
      .select(col(key), explode(cmPairs(col(key).cast("string"), d, w)).as("e"))
      .select(col(key), col("e.i").as("i"), col("e.bucket").as("bucket"))
      .join(sketch, Seq("i", "bucket"), "left")
      .groupBy(col(key))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))

  // ---------------------------------------------------------------------------
  // Equi-width histogram quantile sketch
  // ---------------------------------------------------------------------------

  /** Mergeable equi-width histogram over a numeric column: one row per
    * (group, bin) with the bin's occupancy. `bin = clamp(floor((v-lo)
    * ·bins/(hi-lo)), 0, bins-1)` — out-of-range values land in the edge
    * bins (standard histogram-sketch behavior; the oracle replays the
    * clamp, so it is hash-checked, not tolerated).
    *
    * This is the quantile sketch that survives 100 TB: ONE hash
    * aggregate with map-side combine, shuffle bounded by
    * groups × bins rows regardless of input size, and shard histograms
    * merge by ADDING counts (associative/commutative — the
    * `SketchSpec` merge pin), so per-day partials roll up to any
    * horizon without touching raw data again. The exact alternative
    * (`percentile`) shuffles every value per group.
    */
  def histogramBuild(df: DataFrame, value: Column, groupCols: Seq[String],
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val raw = floor((value - lit(lo)) * bins / (hi - lo)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    df.groupBy(groupCols.map(col) :+ bin.as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a [[histogramBuild]] sketch: for each q,
    * rank = ceil(q·total); walk the cumulative histogram to the first
    * bin holding that rank and interpolate linearly inside it —
    * est = lo + (bin + (rank − cum_before)/cnt) · width.
    *
    * Every stage here runs over SKETCH-sized data (≤ groups × bins
    * rows), so the windows are per-group cumulative sums over at most
    * `bins` rows — never over the raw values. Each arithmetic step is
    * exact-integer or a single IEEE double op in a fixed order, so the
    * DuckDB oracle replays estimates bit-for-bit.
    */
  def histogramQuantiles(histo: DataFrame, groupCols: Seq[String],
      lo: Double, hi: Double, bins: Int, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val width = (hi - lo) / bins
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cum = histo
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy(col("bin"))))
      .withColumn("total", sum(col("cnt")).over(byGroup))
      .withColumn("q", explode(array(qs.map(lit): _*)))
    val rank = ceil(col("q") * col("total"))
    val sel = cum.filter(col("cum") >= rank)
      .groupBy(groupCols.map(col) :+ col("q"): _*)
      .agg(min(struct(col("bin"), col("cnt"), col("cum"), col("total"))).as("s"))
      .select(groupCols.map(col) ++ Seq(col("q"),
        col("s.bin").as("bin"), col("s.cnt").as("cnt"),
        col("s.cum").as("cum"), col("s.total").as("total")): _*)
    val rankSel = ceil(col("q") * col("total"))
    sel.select(groupCols.map(col) ++ Seq(col("q"),
      graft.functions.Arith.r2(lit(lo) +
        (col("bin") + (rankSel - col("cum") + col("cnt")) / col("cnt")) * lit(width))
        .as("est")): _*)
  }

  /** [[histogramBuild]] + [[histogramQuantiles]] with bounds DERIVED
    * from the data instead of caller-supplied: pass 1 is one exact
    * global min/max aggregate (2 doubles of driver model state — the
    * cheapest full-scan agg there is, map-side combined to one row per
    * partition), pass 2 is the existing histogram sketch over those
    * bounds. Degenerate constant columns (hi == lo) widen hi by 1.0 so
    * the bin width stays positive — the oracle replays the same guard.
    *
    * Bounds are GLOBAL (not per-group) on purpose: shared bounds keep
    * shard histograms mergeable by count-addition across groups and
    * time ranges, which is the property that makes this sketch useful
    * at 100 TB (per-day partials roll up without re-reading data).
    */
  def histogramQuantilesAuto(df: DataFrame, value: Column,
      groupCols: Seq[String], bins: Int, qs: Seq[Double]): DataFrame = {
    val row = df.agg(min(value.cast("double")).as("lo"),
      max(value.cast("double")).as("hi")).head()
    require(!row.isNullAt(0), "histogramQuantilesAuto: input has no rows")
    val lo = row.getDouble(0)
    val hi0 = row.getDouble(1)
    val hi = if (hi0 > lo) hi0 else lo + 1.0
    histogramQuantiles(histogramBuild(df, value, groupCols, lo, hi, bins),
      groupCols, lo, hi, bins, qs)
  }

  /** DuckDB replay of [[histogramQuantilesAuto]]: the same two passes —
    * min/max bounds CTE (with the hi==lo widening guard), then the
    * identical bin/cumulate/interpolate arithmetic in the same IEEE
    * operation order, so estimates match bit-for-bit. */
  def histogramAutoOracleSql(src: String, valueExpr: String,
      groupCols: Seq[String], bins: Int, qs: Seq[Double]): String = {
    val g = groupCols.mkString(", ")
    val qsVals = qs.map(q => s"(CAST($q AS DOUBLE))").mkString(", ")
    s"""WITH b0 AS (
       |  SELECT CAST(min($valueExpr) AS DOUBLE) AS lo,
       |         CAST(max($valueExpr) AS DOUBLE) AS hi0 FROM $src
       |), b AS (
       |  SELECT lo, CASE WHEN hi0 > lo THEN hi0 ELSE lo + 1.0 END AS hi FROM b0
       |), h AS (
       |  SELECT $g,
       |         LEAST(GREATEST(CAST(floor(($valueExpr - b.lo) * $bins / (b.hi - b.lo)) AS BIGINT), 0), ${bins - 1}) AS bin,
       |         count(*) AS cnt
       |  FROM $src, b GROUP BY ALL
       |), c AS (
       |  SELECT $g, bin, cnt,
       |         sum(cnt) OVER (PARTITION BY $g ORDER BY bin) AS cum,
       |         sum(cnt) OVER (PARTITION BY $g) AS total
       |  FROM h
       |), qx AS (
       |  SELECT $g, q, bin, cnt, cum, total
       |  FROM c, (VALUES $qsVals) AS qs(q)
       |  WHERE cum >= CAST(ceil(q * total) AS BIGINT)
       |), sel AS (
       |  SELECT $g, q, min(bin) AS bin, arg_min(cnt, bin) AS cnt,
       |         arg_min(cum, bin) AS cum, arg_min(total, bin) AS total
       |  FROM qx GROUP BY ALL
       |)
       |SELECT $g, q,
       |       ${graft.functions.Arith.sqlR2(
            s"b.lo + (bin + (CAST(ceil(q * total) AS BIGINT) - cum + cnt) / cnt) * ((b.hi - b.lo) / $bins)")} AS est
       |FROM sel, b ORDER BY $g, q""".stripMargin
  }

  /** DuckDB replay of [[topKNgrams]]'s SEMANTICS (exact top-k; the
    * sketch side is exact under the asserted frequency bound). */
  def topKNgramsOracleSql(src: String, text: String, n: Int, k: Int): String = {
    val parts = (1 to n).map(j => s"ws[i + ${j - 1}]").mkString(" || ' ' || ")
    s"""WITH w AS (
       |  SELECT string_split($text, ' ') AS ws FROM $src
       |), g AS (
       |  SELECT unnest(CASE WHEN len(ws) >= $n THEN list_transform(
       |           generate_series(1, len(ws) - ${n - 1}), i -> $parts)
       |         ELSE [] END) AS gram
       |  FROM w
       |)
       |SELECT gram, count(*) AS cnt FROM g
       |GROUP BY gram ORDER BY cnt DESC, gram LIMIT $k""".stripMargin
  }
}
