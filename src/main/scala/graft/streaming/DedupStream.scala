package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup
import graft.sources.VersionedLake

/** Incremental near-duplicate detection — dedup-AT-INGEST, the shape a
  * continuously-crawled corpus actually needs. The batch operators
  * ([[graft.operators.Dedup]]) answer "which documents in this corpus
  * duplicate each other"; this one answers it ONLINE: as each
  * micro-batch of new documents arrives, find every near-dup pair the
  * batch introduces (against everything already ingested AND within
  * the batch), then fold the batch into the persistent state so the
  * next increment sees it.
  *
  * State is two versioned lakes, both owned by this operator:
  *
  *  - the DOCS lake: (id, text) of every ingested document,
  *    hash-partitioned on id — the verification corpus;
  *  - the INDEX lake: the MinHash band-bucket table
  *    ([[Dedup.minhashBandBuckets]] rows, fixed-seed permutations so
  *    buckets are comparable across increments and restarts),
  *    partitioned by band — the blocking structure.
  *
  * Per increment the work is: band the NEW docs (one signature
  * aggregate over the batch only — the corpus is never re-signed),
  * equi-join the batch's buckets against the index (batch-sized ⋈
  * index on (band, bucket) — AQE handles a hot bucket on the index
  * side; within-batch candidates go through the same salted self-join
  * as the batch operator), then EXACT-verify candidates by re-reading
  * only the touched documents' texts from the docs lake (a semi-join
  * on candidate ids — candidate-bounded I/O, never a corpus scan).
  * So each tick costs O(batch + candidates), not O(corpus): the 100 TB
  * history is touched only through its (narrow) bucket index and the
  * handful of texts that candidates name.
  *
  * Exactly-once: every lake append carries the micro-batch id and is
  * guarded by the lake's committed-batch-id watermark, so an
  * at-least-once re-delivery after a partial failure skips the appends
  * that already committed and completes the missing ones. The pair
  * computation itself is idempotent under re-delivery even when the
  * failed attempt had already indexed the batch: self-matches are
  * filtered, and a batch-internal pair rediscovered through the index
  * collapses in the candidate distinct — DedupStreamSpec replays a
  * batch against fully-committed lakes and gets the identical output.
  *
  * The headline property (DedupStreamSpec): feeding a corpus through
  * ANY partition into increments yields, across all ticks, EXACTLY the
  * pair set of the one-shot batch [[Dedup.minhashLshPairs]] on the
  * full corpus — incremental ingest loses nothing and invents nothing.
  */
object DedupStream {

  /** Internal hash-partition column added to the docs and pairs lakes. */
  private val PartCol = "dd_part"

  /** One increment: detect, then ingest. Returns the verified near-dup
    * pairs the batch introduces — (d1, d2, common, sz1, sz2, jaccard),
    * d1 < d2, the same shape as the batch operators — materialized
    * BEFORE the lakes advance (the result is checkpointed, so nothing
    * downstream can observe the post-append state through it).
    *
    * `appendBatchId` arms the exactly-once guard on both lake appends;
    * None (ad-hoc batch use) always appends.
    */
  def indexBatch(batch: DataFrame, id: String, text: String,
      docsLake: String, indexLake: String, n: Int, threshold: Double,
      numPerm: Int = 32, bands: Int = 16,
      hotBucketThreshold: Long = 100L, salts: Int = 16,
      docParts: Int = 16,
      appendBatchId: Option[Long] = None): DataFrame = {
    val spark = batch.sparkSession
    val newBanded = Dedup.minhashBandBuckets(batch, id, text, n, numPerm, bands)

    // candidates the batch introduces: batch×index on the bucket key,
    // plus batch-internal via the salted self-join (same exactness
    // guarantee as the batch operator). least/greatest keeps the
    // (d1 < d2) orientation regardless of arrival order; the
    // self-match filter makes re-delivery against an already-indexed
    // batch a no-op rather than a doc matching itself.
    val selfCands = Dedup.saltedSelfPairs(newBanded, Seq("band", "bucket"),
      hotBucketThreshold, salts)
      .select(col("doc_1").as("d1"), col("doc_2").as("d2"))
    val haveIndex = VersionedLake.currentVersion(indexLake) >= 1
    val cands = (if (!haveIndex) selfCands else {
      val old = VersionedLake.read(spark, indexLake)
        .select(col("doc").as("odoc"), col("band"), col("bucket"))
      val cross = newBanded.join(old, Seq("band", "bucket"))
        .filter(col("doc") =!= col("odoc"))
        .select(least(col("doc"), col("odoc")).as("d1"),
          greatest(col("doc"), col("odoc")).as("d2"))
      selfCands.unionByName(cross)
    }).dropDuplicates("d1", "d2")

    // verification corpus: the batch plus ONLY the already-ingested
    // docs that candidates name (semi-join on candidate ids — the
    // docs lake is never scanned into the verify). dropDuplicates
    // guards the re-delivery case where the batch is already in the
    // lake: a doc appearing twice would double-count every common
    // shingle.
    val candIds = cands
      .select(explode(array(col("d1"), col("d2"))).as(id)).distinct()
    val batchDocs = batch.select(col(id), col(text))
    val verifyDocs = (if (!haveIndex ||
        VersionedLake.currentVersion(docsLake) < 1) batchDocs
      else batchDocs.unionByName(
        VersionedLake.read(spark, docsLake).select(col(id), col(text))
          .join(candIds, Seq(id), "left_semi")))
      .dropDuplicates(id)
    // materialize (lineage truncated) BEFORE the appends below: the
    // lake reads above are file-pinned at plan time, but checkpointing
    // makes the ordering explicit instead of implicit.
    val pairs = Dedup.verifyJaccardPairs(cands, verifyDocs, id, text, n, threshold)
      .localCheckpoint(true)

    def guarded(lake: String)(doAppend: => Unit): Unit =
      if (appendBatchId.forall(_ > VersionedLake.committedBatchId(lake))) doAppend
    guarded(docsLake) {
      VersionedLake.append(
        batchDocs.withColumn(PartCol, pmod(xxhash64(col(id)), lit(docParts))),
        docsLake, PartCol, appendBatchId)
    }
    guarded(indexLake) {
      VersionedLake.append(newBanded, indexLake, "band", appendBatchId)
    }
    pairs
  }

  /** The ELEMENT-form increment — incremental near-dup for any
    * modality whose identity is a fingerprint SET rather than text
    * shingles (video frame hashes, audio window hashes, feature
    * grams). State is ONE lake: the (doc, s) membership table itself,
    * which doubles as the verification corpus — element sets are
    * their own evidence, so unlike [[indexBatch]] no second lake and
    * no text re-read are needed.
    *
    * Per tick: distinct the batch memberships, candidate-join them
    * against the index on the element (batch side is tick-sized, so
    * AQE broadcasts it — the index is SCANNED once, never shuffled),
    * add within-batch candidates through the salted self-join, then
    * exact-verify from (index ∪ batch) memberships semi-joined to the
    * candidates.
    *
    * `maxElemDf`, when set, is evaluated against the memberships seen
    * SO FAR (index ∪ batch) — the only df an online pass can know.
    * An element that only later crosses the cap may therefore admit
    * early candidate pairs the one-shot capped run would skip; scores
    * stay exact either way (the cap never changes reported values,
    * only candidate generation), so the incremental pass has recall
    * ≥ the batch pass and identical pair values. With no cap the two
    * are exactly equal (DedupStreamSpec; the x_video_neardup_incr
    * gate hashes the uncapped form against the ground-truth oracle).
    */
  def indexElementsBatch(batch: DataFrame, id: String, elem: String,
      elemLake: String, threshold: Double,
      maxElemDf: Option[Long] = None,
      hotElemThreshold: Long = 100L, salts: Int = 16,
      docParts: Int = 16,
      appendBatchId: Option[Long] = None): DataFrame = {
    val spark = batch.sparkSession
    val newSets = graft.CacheRegistry.retain(
      batch.select(col(id).as("doc"), col(elem).as("s")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val haveIndex = VersionedLake.currentVersion(elemLake) >= 1
    val old =
      if (!haveIndex) None
      else Some(VersionedLake.read(spark, elemLake).select(col("doc"), col("s")))

    // stop-element cap over everything seen so far (see scaladoc)
    val all = old.map(_.unionByName(newSets)).getOrElse(newSets)
    val (candNew, candOldFn) = maxElemDf match {
      case Some(cap) =>
        val hot = all.groupBy(col("s")).agg(count(lit(1)).as("c"))
          .filter(col("c") > cap).select(col("s"))
        (newSets.join(hot, Seq("s"), "left_anti"),
          (o: DataFrame) => o.join(hot, Seq("s"), "left_anti"))
      case None => (newSets, (o: DataFrame) => o)
    }
    val selfCands = Dedup.saltedSelfPairs(candNew, Seq("s"),
      hotElemThreshold, salts)
      .select(col("doc_1").as("d1"), col("doc_2").as("d2"))
    val cands = (old match {
      case None => selfCands
      case Some(o) =>
        val cross = candNew.join(
          candOldFn(o).select(col("doc").as("odoc"), col("s")), Seq("s"))
          .filter(col("doc") =!= col("odoc"))
          .select(least(col("doc"), col("odoc")).as("d1"),
            greatest(col("doc"), col("odoc")).as("d2"))
        selfCands.unionByName(cross)
    }).dropDuplicates("d1", "d2")

    // verify against the touched docs' FULL element sets (hot included)
    val candIds = cands
      .select(explode(array(col("d1"), col("d2"))).as("doc")).distinct()
    val verifyItems = all.join(candIds, Seq("doc"), "left_semi")
      .dropDuplicates("doc", "s") // re-delivery: batch may already be indexed
    val pairs = Dedup.verifySetPairs(cands, verifyItems, threshold)
      .localCheckpoint(true)

    if (appendBatchId.forall(_ > VersionedLake.committedBatchId(elemLake)))
      VersionedLake.append(
        newSets.withColumn(PartCol, pmod(xxhash64(col("doc")), lit(docParts))),
        elemLake, PartCol, appendBatchId)
    pairs
  }

  /** The HAMMING-form increment — incremental near-dup for 64-bit
    * perceptual/structural fingerprints (pHash images, SimHash text):
    * the pigeonhole-blocked Hamming-ball scan of
    * [[Dedup.hammingPairs]], made online. State is one lake of the
    * PRE-CHUNKED signatures — (doc, h, chunk, cv) rows partitioned by
    * chunk, the same maxHamming+1-way split the batch operator blocks
    * on, so the cross-increment candidate join is a plain (chunk, cv)
    * equi-join against the lake (batch side tick-sized → AQE
    * broadcasts it; the index is scanned, never shuffled) and the
    * exact Hamming verify needs no second lookup — both hashes ride
    * the candidate row. Pigeonhole blocking is recall-COMPLETE (two
    * hashes within Hamming ≤ k agree on at least one of k+1 chunks),
    * so across increments this emits exactly the all-pairs Hamming
    * ball of everything ingested — the x_phash_neardup_incr gate
    * hashes two image increments against the same ground-truth oracle
    * as the one-shot gate.
    */
  def indexHammingBatch(batch: DataFrame, id: String, hash: String,
      hashLake: String, maxHamming: Int,
      hotChunkThreshold: Long = 100L, salts: Int = 16,
      appendBatchId: Option[Long] = None): DataFrame = {
    val spark = batch.sparkSession
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    require(bitsPer >= 1, s"maxHamming must be <= 63, got $maxHamming")
    val mask = (1L << bitsPer) - 1
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("h"), c * bitsPer).bitwiseAND(lit(mask)).as("cv"))
    }
    val chunkedNew = graft.CacheRegistry.retain(
      batch.select(col(id).as("doc"), col(hash).as("h")).dropDuplicates("doc")
        .select(col("doc"), col("h"), explode(array(chunkCols: _*)).as("ck"))
        .select(col("doc"), col("h"), col("ck.chunk").as("chunk"),
          col("ck.cv").as("cv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val selfPairs = Dedup.saltedSelfPairs(chunkedNew, Seq("chunk", "cv"),
      hotChunkThreshold, salts)
      .select(col("doc_1").as("d1"), col("doc_2").as("d2"),
        col("h_1").as("h1"), col("h_2").as("h2"))
    val allPairs =
      if (VersionedLake.currentVersion(hashLake) < 1) selfPairs
      else {
        val old = VersionedLake.read(spark, hashLake)
          .select(col("doc").as("odoc"), col("h").as("oh"),
            col("chunk").cast("int").as("chunk"), col("cv"))
        val cross = chunkedNew.join(old, Seq("chunk", "cv"))
          .filter(col("doc") =!= col("odoc"))
          .select(least(col("doc"), col("odoc")).as("d1"),
            greatest(col("doc"), col("odoc")).as("d2"),
            when(col("doc") < col("odoc"), col("h")).otherwise(col("oh")).as("h1"),
            when(col("doc") < col("odoc"), col("oh")).otherwise(col("h")).as("h2"))
        selfPairs.unionByName(cross)
      }
    // Hamming filter BEFORE dedup — same cost argument as the batch op
    val pairs = allPairs
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("d1", "d2")
      .select(col("d1"), col("d2"), col("hamming"))
      .localCheckpoint(true)
    if (appendBatchId.forall(_ > VersionedLake.committedBatchId(hashLake)))
      VersionedLake.append(chunkedNew, hashLake, "chunk", appendBatchId)
    pairs
  }

  /** RETRACT documents from the dedup state (takedown shape): remove
    * their rows from whichever state lakes this operator family owns —
    * the MinHash docs+index lakes, an element-membership lake, or a
    * chunked-hash lake (pass the lakes that exist for your form; each
    * is a copy-on-write MERGE touching only the partitions that hold
    * the docs). Retracted documents stop matching FUTURE increments
    * immediately; pairs already emitted are history (filter them
    * downstream against the retraction list — emitted facts are not
    * silently rewritten). Pre-delete versions stay time-travel-
    * readable until vacuumed. */
  def retract(docs: DataFrame, id: String,
      docsLake: Option[String] = None, indexLake: Option[String] = None,
      elemLake: Option[String] = None, hashLake: Option[String] = None,
      batchId: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    // the docs lake keeps the caller's id column name; the derived
    // index/element/hash lakes all carry it as `doc`
    def scrub(lake: String, joinCol: String, keyCols: Seq[String],
        partCol: String): Unit = {
      if (VersionedLake.currentVersion(lake) < 1) return
      if (batchId.exists(_ <= VersionedLake.committedBatchId(lake))) return
      val ids = docs.select(col(id).as(joinCol)).distinct()
      val changes = VersionedLake.read(spark, lake)
        .join(ids, Seq(joinCol), "left_semi")
        .withColumn("_deleted", lit(true))
      VersionedLake.mergeUpsert(spark, lake, changes, keyCols, partCol,
        batchId = batchId)
    }
    docsLake.foreach(scrub(_, id, Seq(id), PartCol))
    indexLake.foreach(scrub(_, "doc", Seq("doc", "band"), "band"))
    elemLake.foreach(scrub(_, "doc", Seq("doc", "s"), PartCol))
    hashLake.foreach(scrub(_, "doc", Seq("doc", "chunk"), "chunk"))
  }

  /** Drive [[indexElementsBatch]] from a stream of (id, element)
    * fingerprint rows — same pairs-lake/exactly-once contract as
    * [[start]]. */
  def startElements(stream: DataFrame, id: String, elem: String,
      elemLake: String, pairsLake: String, checkpointDir: String,
      threshold: Double, maxElemDf: Option[Long] = None,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(stream.isStreaming, "startElements expects a streaming DataFrame")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        val pairs = indexElementsBatch(b.toDF(), id, elem, elemLake,
          threshold, maxElemDf, appendBatchId = Some(batchId))
        if (batchId > VersionedLake.committedBatchId(pairsLake))
          VersionedLake.append(
            pairs.withColumn(PartCol, pmod(xxhash64(col("d1")), lit(16))),
            pairsLake, PartCol, Some(batchId))
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          Seq(elemLake -> PartCol, pairsLake -> PartCol).foreach { case (l, pc) =>
            try { VersionedLake.compactPartitions(b.sparkSession, l, pc); () }
            catch { case scala.util.control.NonFatal(_) => () }
          }
        ()
      }
      .start()
  }

  /** Drive [[indexHammingBatch]] from a stream of (id, 64-bit hash)
    * fingerprints — same pairs-lake/exactly-once contract as
    * [[start]]. */
  def startHashes(stream: DataFrame, id: String, hash: String,
      hashLake: String, pairsLake: String, checkpointDir: String,
      maxHamming: Int, compactEvery: Int = 0,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(stream.isStreaming, "startHashes expects a streaming DataFrame")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        val pairs = indexHammingBatch(b.toDF(), id, hash, hashLake,
          maxHamming, appendBatchId = Some(batchId))
        if (batchId > VersionedLake.committedBatchId(pairsLake))
          VersionedLake.append(
            pairs.withColumn(PartCol, pmod(xxhash64(col("d1")), lit(16))),
            pairsLake, PartCol, Some(batchId))
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          Seq(hashLake -> "chunk", pairsLake -> PartCol).foreach { case (l, pc) =>
            try { VersionedLake.compactPartitions(b.sparkSession, l, pc); () }
            catch { case scala.util.control.NonFatal(_) => () }
          }
        ()
      }
      .start()
  }

  /** Drive [[indexBatch]] from a stream of documents; verified pairs
    * land in `pairsLake` (a versioned lake like the state lakes, so
    * downstream curation reads them with time travel / CDC). All three
    * appends share the micro-batch id, so a crash anywhere in the tick
    * re-delivers into watermark-guarded no-ops. */
  def start(stream: DataFrame, id: String, text: String,
      docsLake: String, indexLake: String, pairsLake: String,
      checkpointDir: String, n: Int, threshold: Double,
      numPerm: Int = 32, bands: Int = 16,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(stream.isStreaming, "DedupStream.start expects a streaming DataFrame")
    require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        val pairs = indexBatch(b.toDF(), id, text, docsLake, indexLake,
          n, threshold, numPerm, bands, appendBatchId = Some(batchId))
        if (batchId > VersionedLake.committedBatchId(pairsLake))
          VersionedLake.append(
            pairs.withColumn(PartCol, pmod(xxhash64(col("d1")), lit(16))),
            pairsLake, PartCol, Some(batchId))
        // self-maintenance, the streamingCommit(compactEvery) contract:
        // fold one-file-per-tick growth in the state lakes back to one
        // file per partition; a lost OCC race or IO error just defers
        // to a later tick — maintenance must never fail a data batch.
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          Seq(docsLake -> PartCol, indexLake -> "band", pairsLake -> PartCol)
            .foreach { case (lake, pc) =>
              try { VersionedLake.compactPartitions(b.sparkSession, lake, pc); () }
              catch { case scala.util.control.NonFatal(_) => () }
            }
        ()
      }
      .start()
  }
}
