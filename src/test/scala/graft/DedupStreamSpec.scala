package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.VersionedLake

/** Incremental dedup-at-ingest. The headline claim is parity: feeding
  * the corpus through increments emits, across all ticks, EXACTLY the
  * pair set of the one-shot batch operator on the full corpus. Plus
  * the exactly-once re-delivery contract: replaying a batch against
  * fully-committed lakes changes nothing and returns identical pairs.
  */
class DedupStreamSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("incremental ingest across 3 ticks equals the one-shot batch pair set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = tmp("graft_dedup_stream")
    val corpus = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val rows = corpus.as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { b =>
      ms.addData(b.toSeq)
      val q = graft.streaming.DedupStream.start(
        ms.toDS().toDF("doc_id", "text"), "doc_id", "text",
        s"$root/docs", s"$root/index", s"$root/pairs", s"$root/ckpt",
        n = 3, threshold = 0.8)
      q.awaitTermination()
    }
    val streamed = VersionedLake.read(spark, s"$root/pairs")
      .select("d1", "d2", "common", "sz1", "sz2", "jaccard")
      .collect().map(_.toSeq).toSet
    val oneShot = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.8).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty, "fixture corpus should contain near-dups")
    assert(streamed == oneShot)
    // the docs lake now IS the corpus, and the index holds 16 bands/doc
    assert(VersionedLake.read(spark, s"$root/docs").count() == rows.length)
    assert(VersionedLake.read(spark, s"$root/index").count() == rows.length * 16L)
  }

  test("re-delivered batch: lakes unchanged, identical pair output") {
    import spark.implicits._
    val root = tmp("graft_dedup_redeliver")
    val b1 = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g h"),
      (3L, "q w e r t y u")).toDF("doc_id", "text")
    val p1 = graft.streaming.DedupStream.indexBatch(b1, "doc_id", "text",
      s"$root/docs", s"$root/index", n = 3, threshold = 0.5,
      appendBatchId = Some(0L)).collect().map(_.toSeq).toSet
    assert(p1.exists(r => r(0) == 1L && r(1) == 2L), p1.toString)
    val v = (VersionedLake.currentVersion(s"$root/docs"),
      VersionedLake.currentVersion(s"$root/index"))
    // at-least-once re-delivery of the SAME batch id: the lakes'
    // watermarks block both appends, and the recomputed pairs (now
    // with the batch already indexed) collapse to the same set
    val p2 = graft.streaming.DedupStream.indexBatch(b1, "doc_id", "text",
      s"$root/docs", s"$root/index", n = 3, threshold = 0.5,
      appendBatchId = Some(0L)).collect().map(_.toSeq).toSet
    assert(p2 == p1)
    assert((VersionedLake.currentVersion(s"$root/docs"),
      VersionedLake.currentVersion(s"$root/index")) == v)
    // a LATER batch matches across increments through the index
    val b2 = Seq((9L, "a b c d e f g x")).toDF("doc_id", "text")
    val p3 = graft.streaming.DedupStream.indexBatch(b2, "doc_id", "text",
      s"$root/docs", s"$root/index", n = 3, threshold = 0.5,
      appendBatchId = Some(1L)).collect().map(_.toSeq).toSet
    assert(p3.exists(r => r(0) == 1L && r(1) == 9L), p3.toString)
    assert(p3.exists(r => r(0) == 2L && r(1) == 9L), p3.toString)
  }

  test("indexElementsBatch increments equal batch setJaccardPairs (uncapped)") {
    val root = tmp("graft_elem_incr")
    val corpus = Tables.documents(spark, sf("sf0.001")).limit(200)
    val items = corpus.select(col("doc_id").as("doc"),
      explode(Dedup.shingles(col("text"), 3)).as("s"))
    val p1 = graft.streaming.DedupStream.indexElementsBatch(
      items.filter(col("doc") % 2 === 0), "doc", "s",
      s"$root/elems", threshold = 0.8, appendBatchId = Some(0L))
      .collect().map(_.toSeq).toSet
    val p2 = graft.streaming.DedupStream.indexElementsBatch(
      items.filter(col("doc") % 2 =!= 0), "doc", "s",
      s"$root/elems", threshold = 0.8, appendBatchId = Some(1L))
      .collect().map(_.toSeq).toSet
    val oneShot = Dedup.setJaccardPairs(items, "doc", "s", threshold = 0.8)
      .collect().map(_.toSeq).toSet
    assert((p1 ++ p2) == oneShot)
    assert(p1.intersect(p2).isEmpty, "increments emit disjoint pair classes")
  }

  test("indexElementsBatch re-delivery: lake unchanged, identical pairs; capped recall >= batch") {
    import spark.implicits._
    val root = tmp("graft_elem_redeliver")
    val b1 = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 13L), (3L, 99L)).toDF("doc", "e")
    val p1 = graft.streaming.DedupStream.indexElementsBatch(b1, "doc", "e",
      s"$root/elems", threshold = 0.4, appendBatchId = Some(0L))
      .collect().map(_.toSeq).toSet
    assert(p1.exists(r => r(0) == 1L && r(1) == 2L && r(2) == 2L), p1.toString)
    val v = VersionedLake.currentVersion(s"$root/elems")
    val p2 = graft.streaming.DedupStream.indexElementsBatch(b1, "doc", "e",
      s"$root/elems", threshold = 0.4, appendBatchId = Some(0L))
      .collect().map(_.toSeq).toSet
    assert(p2 == p1)
    assert(VersionedLake.currentVersion(s"$root/elems") == v)
    // capped run: element 10/11 shared by a later doc as well — the cap
    // is computed over index + batch, values stay exact
    val b2 = Seq((9L, 10L), (9L, 11L), (9L, 12L)).toDF("doc", "e")
    val p3 = graft.streaming.DedupStream.indexElementsBatch(b2, "doc", "e",
      s"$root/elems", threshold = 0.4, maxElemDf = Some(2L),
      appendBatchId = Some(1L)).collect().map(_.toSeq).toSet
    // 10 and 11 are now hot (df=3 > 2); 12 stays cold and carries the
    // (1,9) candidate, whose common STILL counts the hot elements
    assert(p3.exists(r => r(0) == 1L && r(1) == 9L && r(2) == 3L), p3.toString)
  }

  test("indexHammingBatch increments equal batch hammingPairs; re-delivery idempotent") {
    val root = tmp("graft_hamming_incr")
    val docs = Tables.documents(spark, sf("sf0.001"))
    val sigs = Dedup.simhash64(docs, "doc_id", "text")
    val p1 = graft.streaming.DedupStream.indexHammingBatch(
      sigs.filter(col("doc") % 2 === 0), "doc", "h",
      s"$root/hashes", maxHamming = 7, appendBatchId = Some(0L))
      .collect().map(_.toSeq).toSet
    val p2 = graft.streaming.DedupStream.indexHammingBatch(
      sigs.filter(col("doc") % 2 =!= 0), "doc", "h",
      s"$root/hashes", maxHamming = 7, appendBatchId = Some(1L))
      .collect().map(_.toSeq).toSet
    val oneShot = Dedup.hammingPairs(sigs, maxHamming = 7)
      .collect().map(_.toSeq).toSet
    assert((p1 ++ p2) == oneShot && oneShot.nonEmpty)
    assert(p1.intersect(p2).isEmpty)
    // re-delivery of increment 2 against the fully-committed lake
    val v = VersionedLake.currentVersion(s"$root/hashes")
    val p2r = graft.streaming.DedupStream.indexHammingBatch(
      sigs.filter(col("doc") % 2 =!= 0), "doc", "h",
      s"$root/hashes", maxHamming = 7, appendBatchId = Some(1L))
      .collect().map(_.toSeq).toSet
    assert(p2r == p2)
    assert(VersionedLake.currentVersion(s"$root/hashes") == v)
  }

  test("startHashes stream: pairs lake across ticks equals one-shot hammingPairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = tmp("graft_hashes_stream")
    val sigs = Dedup.simhash64(
      Tables.documents(spark, sf("sf0.001")), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ms = MemoryStream[(Long, Long)]
    sigs.grouped(math.max(1, sigs.length / 2 + 1)).foreach { b =>
      ms.addData(b.toSeq)
      val q = graft.streaming.DedupStream.startHashes(
        ms.toDS().toDF("doc", "h"), "doc", "h",
        s"$root/hashes", s"$root/pairs", s"$root/ckpt",
        maxHamming = 7, compactEvery = 2)
      q.awaitTermination()
    }
    val streamed = VersionedLake.read(spark, s"$root/pairs")
      .select("d1", "d2", "hamming").collect().map(_.toSeq).toSet
    val oneShot = Dedup.hammingPairs(
      Dedup.simhash64(Tables.documents(spark, sf("sf0.001")), "doc_id", "text"),
      maxHamming = 7).collect().map(_.toSeq).toSet
    assert(streamed == oneShot && streamed.nonEmpty)
  }

  test("small tick against a 4-increment lake is candidate-bounded at the file level") {
    import spark.implicits._
    val root = tmp("graft_dedup_pointread")
    val corpus = Tables.documents(spark, sf("sf0.001")).limit(160)
      .select(col("doc_id"), col("text"))
    // 4 increments through the same lakes — each tick leaves its own
    // files behind, so the lakes end up with ≥4 files per partition
    // worth of history for a later tick to (not) read
    (0 until 4).foreach { t =>
      graft.streaming.DedupStream.indexBatch(
        corpus.filter(col("doc_id") % 4 === t), "doc_id", "text",
        s"$root/docs", s"$root/index", n = 3, threshold = 0.8,
        appendBatchId = Some(t.toLong)).collect()
    }
    val docsAll = sources.VersionedLake.read(spark, s"$root/docs").inputFiles.length
    val idxAll = sources.VersionedLake.read(spark, s"$root/index").inputFiles.length
    assert(docsAll >= 4, s"docs lake should hold >=4 files, got $docsAll")

    // the docs-lake verify read for a 2-candidate tick: pointRead is
    // THE implementation indexBatch calls (shared code is the pin) —
    // partition pruning via the props-recorded hash count composed
    // with the id Bloom must open a small fraction of the files
    val two = corpus.limit(2).select(col("doc_id"))
    val keyed = two.select(col("doc_id").cast("string").as("k"),
      pmod(xxhash64(col("doc_id")), lit(16)).cast("string").as("p"))
    val verifyFiles = graft.streaming.DedupStream.pointRead(
      spark, s"$root/docs", "doc_id", keyed).inputFiles.length
    assert(verifyFiles < docsAll,
      s"verify read should be file-pruned: $verifyFiles vs $docsAll")
    // and it still returns exactly those docs' rows
    val got = graft.streaming.DedupStream.pointRead(
      spark, s"$root/docs", "doc_id", keyed)
      .join(two, Seq("doc_id"), "left_semi").count()
    assert(got == 2L)

    // an ABSENT key prunes to zero files (no partition hint: Bloom-only)
    val absent = Seq("absent-doc-983245872").toDF("k")
    assert(graft.streaming.DedupStream.pointRead(
      spark, s"$root/docs", "doc_id", absent).inputFiles.isEmpty)

    // the index-lake candidate read for one bucket value: Bloom-pruned
    // below the full file count
    val oneBucket = sources.VersionedLake.read(spark, s"$root/index")
      .select(col("bucket")).limit(1)
      .select(col("bucket").cast("string").as("k"))
    val idxFiles = graft.streaming.DedupStream.pointRead(
      spark, s"$root/index", "bucket", oneBucket).inputFiles.length
    assert(idxFiles < idxAll,
      s"index candidate read should be file-pruned: $idxFiles vs $idxAll")

    // the recorded partition count arms requireProps: a tick hashing
    // with a DIFFERENT docParts must fail loudly, not silently misread
    intercept[IllegalArgumentException] {
      graft.streaming.DedupStream.indexBatch(
        corpus.limit(1), "doc_id", "text",
        s"$root/docs", s"$root/index", n = 3, threshold = 0.8,
        docParts = 32, appendBatchId = Some(9L)).collect()
    }
  }

  test("capped element ticks maintain the df side lake; stale side lake resyncs") {
    import spark.implicits._
    val root = tmp("graft_elem_df")
    val lake = s"$root/elems"
    val dfLake = graft.streaming.DedupStream.dfDir(lake)
    val b1 = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L)).toDF("doc", "e")
    graft.streaming.DedupStream.indexElementsBatch(b1, "doc", "e", lake,
      threshold = 0.1, maxElemDf = Some(10L), appendBatchId = Some(0L)).collect()
    // capped tick 1 bootstrapped the side lake with cumulative counts
    val c1 = sources.VersionedLake.read(spark, dfLake)
      .select(col("s"), col("c")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 == Map(10L -> 2L, 11L -> 1L, 12L -> 1L), c1.toString)
    // capped tick 2 is IN SYNC: counts fold in additively (no rebuild)
    val b2 = Seq((3L, 10L), (3L, 13L)).toDF("doc", "e")
    graft.streaming.DedupStream.indexElementsBatch(b2, "doc", "e", lake,
      threshold = 0.1, maxElemDf = Some(10L), appendBatchId = Some(1L)).collect()
    val c2 = sources.VersionedLake.read(spark, dfLake)
      .select(col("s"), col("c")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2 == Map(10L -> 3L, 11L -> 1L, 12L -> 1L, 13L -> 1L), c2.toString)
    // an UNCAPPED tick in between leaves the side lake behind...
    val b3 = Seq((4L, 10L), (4L, 14L)).toDF("doc", "e")
    graft.streaming.DedupStream.indexElementsBatch(b3, "doc", "e", lake,
      threshold = 0.1, appendBatchId = Some(2L)).collect()
    assert(sources.VersionedLake.committedBatchId(dfLake) == 1L)
    // ...and the next capped tick detects it and resyncs from the index
    val b4 = Seq((5L, 10L), (5L, 15L)).toDF("doc", "e")
    val p4 = graft.streaming.DedupStream.indexElementsBatch(b4, "doc", "e", lake,
      threshold = 0.1, maxElemDf = Some(3L), appendBatchId = Some(3L))
      .collect().map(_.toSeq).toSet
    val c4 = sources.VersionedLake.read(spark, dfLake)
      .select(col("s"), col("c")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c4 == Map(10L -> 5L, 11L -> 1L, 12L -> 1L, 13L -> 1L, 14L -> 1L, 15L -> 1L),
      c4.toString)
    // element 10 is hot (df=5 > 3): doc 5 shares ONLY 10 with earlier
    // docs, so no candidate survives the cap — no pairs emitted
    assert(p4.isEmpty, p4.toString)
    // replay of the capped tick: identical (empty) output, df lake
    // version unchanged (watermark-guarded)
    val v = sources.VersionedLake.currentVersion(dfLake)
    val p4r = graft.streaming.DedupStream.indexElementsBatch(b4, "doc", "e", lake,
      threshold = 0.1, maxElemDf = Some(3L), appendBatchId = Some(3L))
      .collect().map(_.toSeq).toSet
    assert(p4r == p4 && sources.VersionedLake.currentVersion(dfLake) == v)
  }

  test("retract removes docs from dedup state: later increments stop matching them") {
    import spark.implicits._
    val root = tmp("graft_retract")
    val b1 = Seq((1L, "a b c d e f g"), (2L, "q w e r t y u")).toDF("doc_id", "text")
    graft.streaming.DedupStream.indexBatch(b1, "doc_id", "text",
      s"$root/docs", s"$root/index", n = 3, threshold = 0.5,
      appendBatchId = Some(0L)).collect()
    // control: a near-copy of doc 1 matches while 1 is indexed
    val probe1 = graft.streaming.DedupStream.indexBatch(
      Seq((8L, "a b c d e f g h")).toDF("doc_id", "text"), "doc_id", "text",
      s"$root/docs", s"$root/index", n = 3, threshold = 0.5,
      appendBatchId = Some(1L)).collect().map(_.toSeq).toSet
    assert(probe1.exists(r => r(0) == 1L && r(1) == 8L), probe1.toString)
    // retract 1 and 8; a fresh near-copy then matches NOTHING
    graft.streaming.DedupStream.retract(
      Seq(1L, 8L).toDF("doc_id"), "doc_id",
      docsLake = Some(s"$root/docs"), indexLake = Some(s"$root/index"),
      batchId = Some(2L))
    val probe2 = graft.streaming.DedupStream.indexBatch(
      Seq((9L, "a b c d e f g x")).toDF("doc_id", "text"), "doc_id", "text",
      s"$root/docs", s"$root/index", n = 3, threshold = 0.5,
      appendBatchId = Some(3L)).collect()
    assert(probe2.isEmpty, probe2.mkString(","))
    // the Hamming form retracts the same way
    val sigs = Seq((1L, 0x0f0f0f0fL), (2L, 0x70f0f0f0L)).toDF("doc", "h")
    graft.streaming.DedupStream.indexHammingBatch(sigs, "doc", "h",
      s"$root/hashes", maxHamming = 7, appendBatchId = Some(0L)).collect()
    graft.streaming.DedupStream.retract(Seq(1L).toDF("doc"), "doc",
      hashLake = Some(s"$root/hashes"), batchId = Some(1L))
    val probeH = graft.streaming.DedupStream.indexHammingBatch(
      Seq((9L, 0x0f0f0f0eL)).toDF("doc", "h"), "doc", "h",
      s"$root/hashes", maxHamming = 7, appendBatchId = Some(2L))
      .collect()
    assert(probeH.isEmpty, probeH.mkString(","))
  }
}
