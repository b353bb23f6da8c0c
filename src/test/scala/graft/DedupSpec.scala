package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Verification for the dedup family, including the two paths that have
  * no DuckDB oracle: MinHash+LSH (checked against the exact Jaccard
  * pair set) and SimHash (checked against a brute-force Hamming scan —
  * pigeonhole blocking must be recall-complete).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("shingles: distinct word trigrams, empty below 3 words") {
    val df = Seq("a b c d", "a b", "x y z x y z").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
    val out = df.collect().map(_.getSeq[String](0).toSet)
    assert(out(0) == Set("a b c", "b c d"))
    assert(out(1) == Set.empty)
    assert(out(2) == Set("x y z", "y z x", "z x y")) // distinct-ified
  }

  test("exactDedup groups identical texts under the minimum id") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("id", "text")
    val out = Dedup.exactDedup(df, "id", "text").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("keeper_id") == 1L && byId(1L).getAs[Boolean]("is_canonical"))
    assert(byId(2L).getAs[Long]("keeper_id") == 1L && !byId(2L).getAs[Boolean]("is_canonical"))
    assert(byId(2L).getAs[Long]("n_copies") == 2L)
    assert(byId(3L).getAs[Boolean]("is_canonical"))
  }

  test("jaccardPairs computes exact jaccard on a handcrafted corpus") {
    // doc1/doc2 share 3 of their trigram shingles; doc3 is unrelated.
    // doc1: "a b c d e" -> {abc, bcd, cde} ; doc2: "a b c d f" -> {abc, bcd, cdf}
    // jaccard = 2 / (3 + 3 - 2) = 0.5
    val df = Seq((1L, "a b c d e"), (2L, "a b c d f"), (3L, "q r s t u")).toDF("doc_id", "text")
    val out = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.4).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getAs[Long]("common") == 2L)
    assert(out.head.getAs[Double]("jaccard") == 0.5)
  }

  test("maxShingleDf cap keeps jaccard scores exact (hot-overlap correction)") {
    // "x y z" is shared by all 4 docs (df=4 > cap=3) so it is excluded
    // from candidate generation, but pair scores must still count it.
    val df = Seq(
      (1L, "x y z a b c"), (2L, "x y z a b d"),
      (3L, "x y z q q q"), (4L, "x y z w w w")).toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.3, maxShingleDf = Some(3L))
    val uncapped = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.3, maxShingleDf = None)
    // docs 1,2 share non-hot shingles ("y z a", "z a b") -> candidates either way,
    // and their jaccard must include the hot "x y z" shingle in `common`.
    val c = capped.filter(col("d1") === 1 && col("d2") === 2).collect().head
    val u = uncapped.filter(col("d1") === 1 && col("d2") === 2).collect().head
    assert(c.getAs[Long]("common") == u.getAs[Long]("common"))
    assert(c.getAs[Double]("jaccard") == u.getAs[Double]("jaccard"))
  }

  test("MinHash+LSH pair set equals the exact Jaccard pair set (sf0.001)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val exact = pairSet(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8))
    val lsh = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8))
    assert(lsh == exact)
    assert(exact.nonEmpty) // the fixture must actually exercise the op
  }

  test("MinHash+LSH pair set equals the exact Jaccard pair set (sf0.01)") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val exact = pairSet(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8))
    val lsh = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8))
    assert(lsh == exact)
    assert(exact.size == 25)
  }

  test("SimHash pigeonhole blocking is recall-complete vs brute-force Hamming scan (sf0.001)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val blocked = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7)
    val h = Dedup.simhash64(docs, "doc_id", "text")
    val brute = h.select(col("doc").as("d1"), col("h").as("h1"))
      .crossJoin(h.select(col("doc").as("d2"), col("h").as("h2")))
      .filter(col("d1") < col("d2"))
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
      .filter(col("hamming") <= 7)
    assert(pairSet(blocked) == pairSet(brute))
    assert(pairSet(blocked).nonEmpty)
  }

  test("degenerate corpus: salted candidate joins produce the identical pair set") {
    // 300 near-identical docs (one appended word each): every band
    // bucket and every simhash chunk collapses to a handful of hot
    // keys, the skew class the salting guards. The salted path
    // (hot threshold 10 → everything goes through salt replication)
    // must produce EXACTLY the pair set of the plain self-join
    // (threshold high enough that salting never engages).
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = (0 until 300).map(i => (i.toLong, s"$base tail$i")).toDF("doc_id", "text")

    val lshSalted = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8,
      hotBucketThreshold = 10L, salts = 8))
    val lshPlain = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8,
      hotBucketThreshold = Long.MaxValue))
    assert(lshSalted == lshPlain)
    // near-identical docs: jaccard ≈ 58/64 ≈ 0.91 for every pair — the
    // result is genuinely quadratic, which is exactly the stress shape
    assert(lshSalted.size == 300 * 299 / 2)

    val shSalted = pairSet(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7,
      hotChunkThreshold = 10L, salts = 8))
    val shPlain = pairSet(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7,
      hotChunkThreshold = Long.MaxValue))
    assert(shSalted == shPlain)
    assert(shSalted.nonEmpty)
  }

  test("neardupClusters: transitive closure, keeper = min id, singletons kept") {
    // pair graph: 1-2, 2-3 (3 reaches 1 only transitively); 4 singleton
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val out = graft.operators.Dedup.neardupClusters(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1) // operator output is unordered (no global sort inside it)
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (4L, 4L, 1L, true)))
  }

  test("neardupClusters: one mega-cluster sizes via hash agg, not a single-task window") {
    // the degenerate corpus: EVERY doc joins one cluster. With sizing
    // as count-over-window(cluster_id) this would funnel all rows into
    // one window partition; the groupBy+join form must both complete
    // and stay window-free in the plan.
    val n = 500
    val docs = (1 to n).map(_.toLong).toDF("doc_id")
    val pairs = (2 to n).map(i => (1L, i.toLong)).toDF("d1", "d2")
    val out = graft.operators.Dedup.neardupClusters(docs, "doc_id", pairs)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"cluster sizing planned a window:\n$plan")
    val rows = out.collect()
    assert(rows.length == n)
    assert(rows.forall(_.getLong(1) == 1L))
    assert(rows.forall(_.getLong(2) == n.toLong))
    assert(rows.count(_.getBoolean(3)) == 1)
  }

  test("neardupClusters converges on a long chain (pointer jumping)") {
    // a 40-node path has diameter 39: plain min-propagation needs ~39
    // rounds, pointer jumping must land it well inside maxIters
    val n = 40
    val docs = (1 to n).map(_.toLong).toDF("doc_id")
    val pairs = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("d1", "d2")
    val out = graft.operators.Dedup.neardupClusters(docs, "doc_id", pairs, maxIters = 12)
      .collect()
    assert(out.length == n)
    assert(out.forall(_.getLong(1) == 1L))
    assert(out.count(_.getBoolean(3)) == 1)
  }

  test("SimHash pairs respect the Hamming bound and report true distances") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7).collect()
    assert(out.forall(_.getAs[Long]("hamming") <= 7L))
    // spot-check one reported distance against a direct computation
    val h = Dedup.simhash64(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.take(20).foreach { r =>
      val expect = java.lang.Long.bitCount(h(r.getLong(0)) ^ h(r.getLong(1))).toLong
      assert(r.getAs[Long]("hamming") == expect)
    }
  }

  test("exactSubstringScrub: keep-first across docs and within a doc; span accounting") {
    import spark.implicits._
    val passage = (1 to 6).map(i => s"p$i").mkString(" ") // a 6-token shared passage
    val docs = Seq(
      (1L, s"a1 a2 $passage a3 a4"),                    // first occurrence: survives
      (2L, s"b1 $passage b2 b3 b4"),                    // later copy: scrubbed
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"),                  // untouched
      (4L, s"$passage d1 $passage")                     // within-doc repeat: 2nd scrubbed
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringScrub(docs, "doc_id", "text", L = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1: owns the first occurrence — nothing removed
    assert(out(1L) == ((10L, 0L, 0L, s"a1 a2 $passage a3 a4")))
    // doc 2: exactly the passage tokens removed, one maximal span
    assert(out(2L) == ((10L, 6L, 1L, "b1 b2 b3 b4")))
    // doc 3: untouched
    assert(out(3L)._2 == 0L && out(3L)._4 == "c1 c2 c3 c4 c5 c6 c7 c8")
    // doc 4: the SECOND in-doc occurrence goes, the first survives
    // (it is not the global first — doc 1 is… no: ordering is (doc,pos),
    // doc 1 < doc 4, so BOTH of doc 4's occurrences are non-canonical)
    assert(out(4L)._1 == 13L && out(4L)._2 == 12L && out(4L)._3 == 2L)
    assert(out(4L)._4 == "d1")
    // partition invariance
    val again = Dedup.exactSubstringScrub(docs.repartition(5), "doc_id", "text", L = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(again == out)
    // touching spans merge: two flagged starts exactly L apart = one span
    val t = Seq(
      (1L, "x1 x2 x3 y1 y2 y3 z"),
      (2L, "x1 x2 x3 y1 y2 y3 w")) // starts 0 and 3 with L=3: touching
      .toDF("doc_id", "text")
    val m = Dedup.exactSubstringScrub(t, "doc_id", "text", L = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(m(2L)._1 == 6L && m(2L)._2 == 1L, m.toString) // 6 tokens, ONE span
    // plan pin: aggregates + joins only — no window function anywhere
    val plan = Dedup.exactSubstringScrub(docs, "doc_id", "text", 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window ["), plan)
    // the fingerprint (8-byte shuffle key) variant is result-identical
    // to the exact text-keyed reference, here and on the real corpus
    val fp = Dedup.exactSubstringScrub(docs, "doc_id", "text", L = 6, fingerprint = true)
      .collect().map(_.toSeq).toSet
    val exact = Dedup.exactSubstringScrub(docs, "doc_id", "text", L = 6)
      .collect().map(_.toSeq).toSet
    assert(fp == exact)
    val corpus = Tables.documents(spark, sf("sf0.001"))
    val fpC = Dedup.exactSubstringScrub(corpus, "doc_id", "text", L = 15, fingerprint = true)
      .collect().map(_.toSeq).toSet
    val exC = Dedup.exactSubstringScrub(corpus, "doc_id", "text", L = 15)
      .collect().map(_.toSeq).toSet
    assert(fpC == exC && fpC.nonEmpty)
  }

  test("setJaccardPairs over exploded elements equals jaccardPairs over text") {
    val corpus = Tables.documents(spark, sf("sf0.001")).limit(200)
    val viaText = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3,
      threshold = 0.6, maxShingleDf = Some(50L)).collect().map(_.toSeq).toSet
    val items = corpus.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("s"))
    val viaSet = Dedup.setJaccardPairs(items, "doc_id", "s",
      threshold = 0.6, maxElemDf = Some(50L)).collect().map(_.toSeq).toSet
    assert(viaSet == viaText)
  }

  test("setJaccardPairs: duplicate memberships collapse, non-string elements join") {
    // long-typed elements, repeated rows: sets are {1,2,3} / {2,3,4} / {9}
    val items = Seq((10L, 1L), (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 2L), (20L, 3L), (20L, 4L), (20L, 4L), (30L, 9L)).toDF("doc", "e")
    val out = Dedup.setJaccardPairs(items, "doc", "e", threshold = 0.4).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("d1") == 10L && r.getAs[Long]("d2") == 20L)
    assert(r.getAs[Long]("common") == 2L && r.getAs[Long]("sz1") == 3L
      && r.getAs[Long]("sz2") == 3L)
    assert(r.getAs[Double]("jaccard") == 0.5)
  }

  test("setJaccardPairs maxElemDf cap keeps scores exact (hot-overlap correction)") {
    // element 100 is in all four sets (df=4 > cap=3): excluded from
    // candidate generation, still counted in `common` for candidates
    // that qualify through cold elements.
    val items = Seq(
      (1L, 100L), (1L, 1L), (1L, 2L),
      (2L, 100L), (2L, 1L), (2L, 2L),
      (3L, 100L), (3L, 7L), (3L, 8L),
      (4L, 100L), (4L, 5L), (4L, 6L)).toDF("doc", "e")
    val capped = Dedup.setJaccardPairs(items, "doc", "e", 0.3, maxElemDf = Some(3L))
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Long]("common"), r.getAs[Double]("jaccard"))).toSet
    // only (1,2) share cold elements; their common includes the hot 100
    assert(capped == Set((1L, 2L, 3L, 1.0)))
  }
}
