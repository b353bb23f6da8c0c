package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** Verification for the sketch family beyond the hash gates: the HLL
  * estimator against an independent Scala reference and under
  * repartitioning, and the Misra-Gries guarantee that makes the
  * heavy-hitter gate's sketch+verify result EXACTLY the top-k.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
  private def events = Tables.events(spark, sf("sf0.001"))

  // Independent reference: java.security MD5, plain bit twiddling — no
  // shared code with the Column-math implementation under test.
  private def refHll(keys: Seq[String], p: Int): Double = {
    val m = 1 << p
    val regs = new Array[Int](m)
    keys.foreach { k =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      val b = Integer.parseInt(hex.substring(0, 3), 16) % m
      val rest = hex.substring(3, 16) // 13 nibbles
      val v = java.lang.Long.parseLong(rest, 16) // 52 bits
      val rho = if (v == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(v))
      regs(b) = math.max(regs(b), rho)
    }
    val s = regs.map(r => math.pow(2.0, -r)).sum
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m / s
  }

  test("hllDistinct matches the independent reference estimator") {
    val keys = (1 to 2000).map(i => s"user-$i")
    val df = keys.toDF("k")
    val got = Sketch.hllDistinct(df, col("k"), Seq.empty, p = 8)
      .select("hll_estimate").as[Double].head()
    val want = refHll(keys, 8)
    // got is half-up rounded to 2dp; reference is unrounded
    assert(math.abs(got - want) < 0.01, s"got $got want $want")
  }

  test("hllDistinct is invariant under repartitioning") {
    val base = events.select(col("user_id").cast("string").as("k"))
    val a = Sketch.hllDistinct(base, col("k"), Seq.empty, p = 6)
      .select("hll_estimate").as[Double].head()
    val b = Sketch.hllDistinct(base.repartition(13), col("k"), Seq.empty, p = 6)
      .select("hll_estimate").as[Double].head()
    assert(a == b)
  }

  test("hllDistinct error is within 3 standard errors at m=256") {
    val keys = (1 to 5000).map(i => s"id-$i").toDF("k")
    val est = Sketch.hllDistinct(keys, col("k"), Seq.empty, p = 8)
      .select("hll_estimate").as[Double].head()
    val se = 1.04 / math.sqrt(256.0) // ~6.5%
    assert(math.abs(est - 5000.0) / 5000.0 < 3 * se, s"estimate $est")
  }

  test("misraGries retains every key above n/(capacity+1)") {
    // 3 heavy keys in a sea of 200 singletons, capacity 8
    val stream = Seq.fill(60)("hot1") ++ Seq.fill(40)("hot2") ++
      Seq.fill(30)("hot3") ++ (1 to 200).map(i => s"cold-$i")
    val shuffled = new scala.util.Random(7).shuffle(stream)
    val out = Sketch.misraGries(shuffled.iterator, 8).toSet
    val n = shuffled.size
    Seq("hot1" -> 60, "hot2" -> 40, "hot3" -> 30).foreach { case (k, f) =>
      if (f > n / 9.0) assert(out.contains(k), s"$k (freq $f) evicted")
    }
    assert(out.size <= 8)
  }

  test("topKNgrams equals the exact top-k on the real corpus, and the MG bound holds") {
    val grams = Sketch.ngramStream(docs, "text", 3)
    val exact = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sketch = Sketch.topKNgrams(docs, "text", n = 3, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sketch.toSeq == exact.toSeq)
    // The exactness precondition the gate relies on: k-th frequency
    // strictly above N/(capacity+1).
    val n = grams.count()
    assert(exact.last._2 > n / 16385.0,
      s"MG bound violated: kth=${exact.last._2}, N/(c+1)=${n / 16385.0}")
  }

  test("HLL registers accumulate identically under Structured Streaming") {
    // the register table is a plain (bucket → max rho) aggregate, so the
    // SAME hllRegisters call is streaming-legal — sketches keep their
    // exactness guarantee on unbounded streams (state = m rows, ever)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keys = (1 to 3000).map(i => s"stream-user-$i")
    val ms = MemoryStream[String]
    val regs = Sketch.hllRegisters(ms.toDS().toDF("k"), col("k"), Seq.empty, p = 6)
    val q = regs.writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      ms.addData(keys.take(1000)); q.processAllAvailable()
      ms.addData(keys.drop(1000)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hll_regs").orderBy("b")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val batch = Sketch.hllRegisters(keys.toDF("k"), col("k"), Seq.empty, p = 6)
      .orderBy("b").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(streamed == batch && streamed.nonEmpty)
    // and the estimate computed off the streamed registers matches batch
    val se = Sketch.hllEstimate(spark.table("hll_regs"), Seq.empty, p = 6)
      .select("hll_estimate").as[Double].head()
    val be = Sketch.hllDistinct(keys.toDF("k"), col("k"), Seq.empty, p = 6)
      .select("hll_estimate").as[Double].head()
    assert(se == be)
  }

  test("hllSetOps dual registers and key flags accumulate identically under Structured Streaming") {
    // the set-algebra operator's two STATEFUL stages are each a single
    // aggregate (bucket → max-per-cohort; key → membership flags), so
    // the same calls are streaming-legal in complete mode with state
    // bounded by m + |keys| rows; the estimate fold is a stateless
    // finishing read. Stream both stages, finish off the sinks, and
    // the full output row must equal the one-shot batch operator.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1 to 2000).map { i =>
      (s"so-user-$i", i % 2 == 0 || i % 3 == 0, i % 3 == 0 || i % 5 == 0)
    }
    val ms = MemoryStream[(String, Boolean, Boolean)]
    val tagged = graft.operators.Sketch.taggedCohorts(
      ms.toDS().toDF("k0", "ia0", "ib0"),
      col("k0"), col("ia0"), col("ib0"), p = 6)
    val qRegs = graft.operators.Sketch.hllDualRegisters(tagged)
      .writeStream.format("memory").queryName("so_regs")
      .outputMode("complete").start()
    val qFlags = graft.operators.Sketch.cohortKeyFlags(tagged)
      .writeStream.format("memory").queryName("so_flags")
      .outputMode("complete").start()
    try {
      ms.addData(rows.take(700)); qRegs.processAllAvailable(); qFlags.processAllAvailable()
      ms.addData(rows.drop(700)); qRegs.processAllAvailable(); qFlags.processAllAvailable()
    } finally { qRegs.stop(); qFlags.stop() }

    val batchDf = rows.toDF("k0", "ia0", "ib0")
    val batchTagged = graft.operators.Sketch.taggedCohorts(
      batchDf, col("k0"), col("ia0"), col("ib0"), p = 6)
    // stage parity: streamed register/flag tables == batch ones
    val sRegs = spark.table("so_regs").orderBy("b").collect().map(_.toSeq).toSeq
    val bRegs = graft.operators.Sketch.hllDualRegisters(batchTagged)
      .orderBy("b").collect().map(_.toSeq).toSeq
    assert(sRegs == bRegs && sRegs.nonEmpty)
    val sFlags = spark.table("so_flags").orderBy("k").collect().map(_.toSeq).toSeq
    val bFlags = graft.operators.Sketch.cohortKeyFlags(batchTagged)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(sFlags == bFlags)
    // end-to-end parity: estimates finished off the STREAMED state ==
    // the one-shot batch operator, bit for bit
    val exact = spark.table("so_flags")
      .agg(count(when(col("a") && col("bb"), lit(1))).as("exact_intersect"))
    val finished = graft.operators.Sketch.hllSetOpsFromRegisters(
      spark.table("so_regs"), exact, p = 6).collect().map(_.toSeq).toSeq
    val batch = graft.operators.Sketch.hllSetOps(
      batchDf, col("k0"), col("ia0"), col("ib0"), p = 6).collect().map(_.toSeq).toSeq
    assert(finished == batch)
  }

  test("ngramStream keeps multiplicity and skips short docs") {
    val df = Seq("a b a b a", "x y").toDF("text")
    val grams = Sketch.ngramStream(df, "text", 3).as[String].collect().sorted
    assert(grams.toSeq == Seq("a b a", "b a b", "a b a").sorted)
  }

  test("countMin never undercounts, hits exactly when collision-free, and merges by summing") {
    val items = (Seq.fill(50)("alpha") ++ Seq.fill(7)("beta") ++
      (0 until 200).map(i => s"tail_$i")).toDF("k")
    val (d, w) = (4, 4096)
    val cm = Sketch.countMinBuild(items, "k", d, w)
    val queries = Seq("alpha", "beta", "tail_0", "absent").toDF("k")
    val est = Sketch.countMinEstimate(cm, queries, "k", d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("alpha" -> 50L, "beta" -> 7L, "tail_0" -> 1L, "absent" -> 0L)
    // one-sided error: min-of-counters can only overcount
    exact.foreach { case (k, n) => assert(est(k) >= n, s"$k: ${est(k)} < $n") }
    // at 257 items over 4096 buckets collisions are overwhelmingly
    // unlikely in all 4 rows at once for every probe — demand exactness
    assert(est == exact, s"collision where none expected: $est")
    // merge = counter addition: shard sketches summed == one-pass sketch
    val shardA = Sketch.countMinBuild(items.limit(100), "k", d, w)
    val shardB = Sketch.countMinBuild(
      items.exceptAll(items.limit(100)), "k", d, w)
    val merged = shardA.unionByName(shardB)
      .groupBy(col("i"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val onePass = cm.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == onePass)
  }

  test("countMin counters accumulate identically under Structured Streaming") {
    // like the HLL registers, the counter table is one aggregate, so
    // the SAME countMinBuild call is streaming-legal with state
    // bounded at d×w rows forever — frequency sketching on an
    // unbounded stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val items = (1 to 500).map(i => s"it_${i % 37}")
    val ms = MemoryStream[String]
    val q = Sketch.countMinBuild(ms.toDS().toDF("k"), "k", 4, 256)
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    try {
      ms.addData(items.take(200)); q.processAllAvailable()
      ms.addData(items.drop(200)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cm_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketch.countMinBuild(items.toDF("k"), "k", 4, 256)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("countMin is invariant under repartitioning") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val grams = Sketch.ngramStream(docs, "text", 3)
    val a = Sketch.countMinBuild(grams, "gram", 4, 1024)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Sketch.countMinBuild(grams.repartition(13), "gram", 4, 1024)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("histogram sketch: shard histograms merge by addition to the one-pass build") {
    val (lo, hi, bins) = (0.0, 600.0, 120)
    val onePass = Sketch.histogramBuild(events, col("value"), Seq("event_type"), lo, hi, bins)
    // shard by day, build per shard, merge by summing counts
    val sharded = Sketch.histogramBuild(
      events.withColumn("day", to_date(col("ts")).cast("string")),
      col("value"), Seq("event_type", "day"), lo, hi, bins)
      .groupBy(col("event_type"), col("bin")).agg(sum(col("cnt")).as("cnt"))
    assert(onePass.exceptAll(sharded).isEmpty && sharded.exceptAll(onePass).isEmpty)
    // and the estimates are partition-invariant
    val q = Seq(0.1, 0.5, 0.9)
    val a = Sketch.histogramQuantiles(onePass, Seq("event_type"), lo, hi, bins, q)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val b = Sketch.histogramQuantiles(
      Sketch.histogramBuild(events.repartition(13), col("value"), Seq("event_type"), lo, hi, bins),
      Seq("event_type"), lo, hi, bins, q)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("histogram quantile estimates land within one bin width of the exact percentile") {
    val (lo, hi, bins) = (0.0, 600.0, 120)
    val width = (hi - lo) / bins
    val histo = Sketch.histogramBuild(events, col("value"), Seq("event_type"), lo, hi, bins)
    val est = Sketch.histogramQuantiles(histo, Seq("event_type"), lo, hi, bins, Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"), expr("percentile(value, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    exact.foreach { case (t, (p50, p90)) =>
      assert(math.abs(est((t, 0.5)) - p50) <= width, s"$t p50: ${est((t, 0.5))} vs $p50")
      assert(math.abs(est((t, 0.9)) - p90) <= width, s"$t p90: ${est((t, 0.9))} vs $p90")
    }
    // out-of-range values clamp into the edge bins instead of vanishing
    val tiny = Seq(("a", -5.0), ("a", 1000.0), ("a", 3.0)).toDF("g", "v")
    val h = Sketch.histogramBuild(tiny, col("v"), Seq("g"), lo, hi, bins)
    assert(h.agg(sum("cnt")).head.getLong(0) == 3L)
    assert(h.filter(col("bin") === 0).head.getLong(2) == 2L) // -5.0 and 3.0
  }

  test("histogram bins accumulate identically under Structured Streaming") {
    // the build is one hash aggregate, so the SAME histogramBuild call
    // is streaming-legal with state bounded at groups × bins forever —
    // per-group quantile sketching on an unbounded stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vals = (1 to 400).map(i => (s"g${i % 3}", (i % 97) * 6.1))
    val ms = MemoryStream[(String, Double)]
    val q = Sketch.histogramBuild(ms.toDS().toDF("g", "v"), col("v"), Seq("g"),
      lo = 0.0, hi = 600.0, bins = 120)
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete").start()
    try {
      ms.addData(vals.take(150)); q.processAllAvailable()
      ms.addData(vals.drop(150)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hist_stream")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketch.histogramBuild(vals.toDF("g", "v"), col("v"), Seq("g"),
      lo = 0.0, hi = 600.0, bins = 120)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("hllSetOps: union estimate equals the single-cohort sketch; intersection tracks exact") {
    // sf0.01: user-day cardinalities (~10-15k) sit ABOVE the raw-HLL
    // validity floor of 2.5m ≈ 2.5k — below it per-estimate bias
    // doesn't cancel through inclusion-exclusion (the gate's corpus is
    // at least this large; sf0.001 is not)
    val ev = Tables.events(spark, sf("sf0.01"))
    val key = concat(col("user_id").cast("string"), lit(":"),
      to_date(col("ts")).cast("string"))
    val inA = col("event_type") === "click"
    val inB = col("event_type") === "purchase"
    val row = Sketch.hllSetOps(ev, key, inA, inB, p = 10).head()
    val (ea, eb, eu, ei) = (row.getDouble(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    val exact = row.getLong(4)
    // the dual-register union is EXACTLY the plain sketch over A∪B
    val plain = Sketch.hllDistinct(ev.filter(inA || inB), key,
      Seq.empty, p = 10).head().getDouble(0)
    assert(eu == plain, s"union $eu vs single-cohort $plain")
    // per-cohort estimates likewise
    val pa = Sketch.hllDistinct(ev.filter(inA), key, Seq.empty, 10).head().getDouble(0)
    assert(ea == pa)
    // inclusion-exclusion: identity holds up to the output rounding
    // (hll_intersect rounds the UNROUNDED combination once; recombining
    // the three already-rounded outputs can differ by ≤ 1.5 cents)
    assert(math.abs(ea + eb - eu - ei) <= 0.02)
    assert(exact > 0, "fixture cohorts must overlap")
    // the estimator's known profile: absolute error scales with the
    // OPERANDS (σ ≈ 1.04/√m each), not the intersection — tight only
    // when the overlap is comparable to the union
    assert(math.abs(ei - exact) <= 0.1 * (ea + eb + eu),
      s"intersection est $ei vs exact $exact beyond the operand-scaled bound")
    // the good regime: heavily-overlapping cohorts estimate well
    val bigA = col("event_type").isin("click", "view")
    val bigB = col("event_type").isin("click", "purchase")
    val r2row = Sketch.hllSetOps(ev, key, bigA, bigB, p = 10).head()
    val (ei2, exact2) = (r2row.getDouble(3), r2row.getLong(4))
    assert(math.abs(ei2 - exact2) / exact2 < 0.15,
      s"big-overlap intersection $ei2 vs exact $exact2")
  }

  test("auto-bounds histogram: equals the manual sketch at exact min/max; constant columns survive") {
    val (bins, qs) = (120, Seq(0.1, 0.5, 0.9))
    val bounds = events.agg(min(col("value")), max(col("value"))).head()
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val auto = Sketch.histogramQuantilesAuto(events, col("value"), Seq("event_type"), bins, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val manual = Sketch.histogramQuantiles(
      Sketch.histogramBuild(events, col("value"), Seq("event_type"), lo, hi, bins),
      Seq("event_type"), lo, hi, bins, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(auto == manual && auto.nonEmpty)
    // degenerate constant column: hi widens to lo + 1, estimates stay
    // within the (widened) bin width of the constant
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val cq = Sketch.histogramQuantilesAuto(const, col("v"), Seq("g"), 10, Seq(0.5, 1.0))
      .collect()
    assert(cq.length == 4)
    cq.foreach(r => assert(math.abs(r.getDouble(2) - 5.0) <= 0.1, r.toString))
  }

  test("auto-derived bounds drive the same streaming-legal histogram accumulation") {
    // the auto operator's pass 2 is histogramBuild — so a stream can
    // accumulate under bounds derived from a bootstrap batch (the
    // standard deployment: derive once, stream forever) and the
    // quantile walk over the streamed sketch equals the batch auto form
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vals = (1 to 300).map(i => (s"g${i % 2}", (i % 89) * 3.7))
    val batchDf = vals.toDF("g", "v")
    val bounds = batchDf.agg(min(col("v")), max(col("v"))).head()
    val (lo, hi0) = (bounds.getDouble(0), bounds.getDouble(1))
    val hi = if (hi0 > lo) hi0 else lo + 1.0
    val (bins, qs) = (50, Seq(0.25, 0.75))
    val ms = MemoryStream[(String, Double)]
    val q = Sketch.histogramBuild(ms.toDS().toDF("g", "v"), col("v"), Seq("g"),
      lo, hi, bins)
      .writeStream.format("memory").queryName("hist_auto_stream")
      .outputMode("complete").start()
    try {
      ms.addData(vals.take(100)); q.processAllAvailable()
      ms.addData(vals.drop(100)); q.processAllAvailable()
    } finally q.stop()
    val streamedQ = Sketch.histogramQuantiles(
      spark.table("hist_auto_stream"), Seq("g"), lo, hi, bins, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val batchAuto = Sketch.histogramQuantilesAuto(batchDf, col("v"), Seq("g"), bins, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(streamedQ == batchAuto && streamedQ.nonEmpty)
  }

  test("bloom: no false negatives, FPs match a driver-side reference bitset") {
    val (k, m) = (3, 512)
    val members = (0 until 40).map(i => s"member_$i")
    val others = (0 until 200).map(i => s"other_$i")
    val build = members.toDF("key")
    val words = Sketch.bloomBuild(build, "key", k, m)
    // driver-side reference: same md5 construction, independent code
    val md = java.security.MessageDigest.getInstance("MD5")
    def buckets(key: String): Seq[Long] = (0 until k).map { j =>
      val hex = md.digest(s"bloom:$j:$key".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % m
    }
    val refBits = members.flatMap(buckets).toSet
    def refMight(key: String): Boolean = buckets(key).forall(refBits.contains)
    val got = Sketch.bloomPrune((members ++ others).toDF("key"), "key", words, k, m)
      .as[String].collect().toSet
    val want = (members ++ others).filter(refMight).toSet
    assert(got == want)
    assert(members.toSet.subsetOf(got), "false negative!") // impossible by construction
    assert((got -- members).nonEmpty, // at this load factor FPs must occur
      s"expected false positives at load ${refBits.size}/$m")
  }

  test("bloom pruning is a map-side filter: no join, no shuffle, codegen'd membership") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val words = Sketch.bloomBuild(ev.select(col("user_id")).limit(10), "user_id", 3, 1024)
    val plan = Sketch.bloomPrune(ev, "user_id", words, 3, 1024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    assert(!plan.contains("Join"), s"bloom pruning planned a join:\n$plan")
    assert(!plan.contains("Exchange"), s"bloom pruning planned a shuffle:\n$plan")
  }

  test("bloom membership expression: out-of-range buckets fail closed, null elements null out") {
    import graft.functions.BloomFunctions.bloomMightContain
    val words = Array.fill(4)(-1L) // all 256 bits set
    val df = Seq(
      (1L, Seq[java.lang.Long](0L, 255L)),   // in range, set -> true
      (2L, Seq[java.lang.Long](256L)),       // beyond bitset -> false, not OOB read
      (3L, Seq[java.lang.Long](-1L)),        // negative -> false
      (4L, Seq[java.lang.Long](0L, null))    // null element -> null
    ).toDF("id", "buckets")
    val got = df.select(col("id"), bloomMightContain(col("buckets"), words).as("r"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> null))
  }
}
