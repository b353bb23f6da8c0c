package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup
import graft.sources.VersionedLake
import graft.sources.VersionedLake.BloomSpec

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
  * equi-join the batch's buckets against the index, then EXACT-verify
  * candidates by re-reading only the touched documents' texts from
  * the docs lake. So each tick costs O(batch + candidates), not
  * O(corpus).
  *
  * EVERY per-tick state read is candidate-bounded at the FILE level,
  * not just logically: the lakes this operator creates record
  * per-file Bloom filters for their candidate-read keys (bucket and
  * doc on the index, the id on the docs lake), so each read goes
  * through [[VersionedLake.readPoints]] — manifest-level partition
  * pruning composed with per-file Bloom admission — and a small tick
  * against a long-lived lake opens only the files that might hold its
  * candidates, never the whole index ([[pointRead]] documents the
  * fallbacks; DedupStreamSpec pins the file-count reduction). The
  * docs-lake hash-partition count is recorded as an immutable table
  * property, so partition pruning never silently disagrees with the
  * count the writer hashed with ([[VersionedLake.requireProps]] fails
  * a mismatched tick loudly).
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

  /** Table property recording the hash-partition count a lake was
    * written with — what makes read-side partition pruning safe. */
  private val PartsProp = "parts"

  /** Keys collected to the driver for a Bloom-set candidate read; past
    * it [[pointRead]] falls back to partition-level pruning. One
    * constant shared with every other candidate-bounded path
    * ([[VersionedLake.MaxPointKeys]]) so the bound can't drift. */
  private def MaxPointKeys = VersionedLake.MaxPointKeys

  private def mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** The recorded hash-partition count of a lake, when its creator
    * recorded one ([[PartsProp]]). Pre-props lakes return None and
    * their reads skip partition pruning — pruning with a GUESSED
    * count would silently miss files. */
  private def recordedParts(lake: String): Option[Int] =
    VersionedLake.tableProps(lake).get(PartsProp).map(_.toInt)

  /** The candidate-bounded state read every tick makes: given the
    * tick's candidate keys as a one- or two-column frame
    * (`k` = the key cast to string — the Bloom probe form, one row per
    * DISTINCT candidate: every producer below builds `keyed` from a
    * distinct id/hash set, and the over-cap probe counts raw rows, so
    * a duplicate-heavy frame would degenerate to the partition read
    * earlier than its distinct size warrants — conservative, never
    * wrong; optional `p` = the key's partition value, when the lake is
    * hash-partitioned on the key), hand the scan only the files that
    * might hold them — [[VersionedLake.readPoints]]' manifest-level
    * partition pruning composed with per-file Bloom admission.
    *
    * Falls back, never fails: a tick with more than [[MaxPointKeys]]
    * candidates keeps partition pruning but skips the per-key Bloom
    * tests (collecting an unbounded key set to the driver is the
    * degenerate case readPoints itself refuses), and a lake written
    * before the Bloom spec existed (no filter recorded for `column`)
    * reads the partition-pruned file list. Shared verbatim by
    * [[indexBatch]]/[[indexElementsBatch]]/[[indexHammingBatch]]/
    * [[retract]] and by the DedupStreamSpec I/O pins, so what the pin
    * reasons about is exactly what a tick scans. */
  private[graft] def pointRead(spark: SparkSession, lake: String,
      column: String, keyed: DataFrame): DataFrame = {
    val withParts = keyed.columns.contains("p")
    // ONE collect serves both the key set and the partition set on the
    // under-cap hot path (the common case, once per tick) — keyed's
    // lineage re-executes per job, so extra jobs here are not free
    val rows = keyed.limit(MaxPointKeys + 1).collect()
    val over = rows.length > MaxPointKeys
    val parts =
      if (!withParts) None
      // over the cap the collected rows are a truncated sample, but the
      // partition SET is still bounded (≤ the lake's partition count) —
      // a second tiny aggregate recovers it in full
      else if (over) Some(keyed.select(col("p")).distinct()
        .collect().map(_.getString(0)).toSeq)
      else Some(rows.map(_.getString(keyed.columns.indexOf("p"))).distinct.toSeq)
    if (over)
      // a truncated key list must never reach the point read — it would
      // silently miss candidates; degenerate to the partition read
      VersionedLake.read(spark, lake, partitions = parts)
    else
      // Bloom presence, key-cap degeneration, and the pre-Bloom-lake
      // fallback live in the shared helper — what this tick scans is
      // what PostingsLake.delete and AnnLake.retract scan for the same
      // key set
      VersionedLake.pointReadOrFull(spark, lake, column,
        rows.map(_.getString(keyed.columns.indexOf("k"))).toSeq,
        maxKeys = MaxPointKeys, partitions = parts)
  }

  /** (k, p) candidate-key frame for a lake hash-partitioned on `key`
    * with a RECORDED partition count; (k)-only when the count is
    * unrecorded (pre-props lake) so [[pointRead]] skips partition
    * pruning rather than guessing. */
  private def keyedByHash(ids: DataFrame, key: Column, lake: String): DataFrame =
    recordedParts(lake) match {
      case Some(n) => ids.select(key.cast("string").as("k"),
        pmod(xxhash64(key), lit(n)).cast("string").as("p"))
      case None => ids.select(key.cast("string").as("k"))
    }

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
    // guarantee as the batch operator). The index side is a
    // candidate-bounded read — only the files whose bucket Bloom might
    // hold one of the BATCH's buckets are opened, so a small tick
    // never scans the accumulated index. least/greatest keeps the
    // (d1 < d2) orientation regardless of arrival order; the
    // self-match filter makes re-delivery against an already-indexed
    // batch a no-op rather than a doc matching itself.
    val selfCands = Dedup.saltedSelfPairs(newBanded, Seq("band", "bucket"),
      hotBucketThreshold, salts)
      .select(col("doc_1").as("d1"), col("doc_2").as("d2"))
    val haveIndex = VersionedLake.currentVersion(indexLake) >= 1
    val cands = graft.CacheRegistry.retain((if (!haveIndex) selfCands else {
      val bucketKeys = newBanded
        .select(col("bucket").cast("string").as("k")).distinct()
      val old = pointRead(spark, indexLake, "bucket", bucketKeys)
        .select(col("doc").as("odoc"), col("band"), col("bucket"))
      val cross = newBanded.join(old, Seq("band", "bucket"))
        .filter(col("doc") =!= col("odoc"))
        .select(least(col("doc"), col("odoc")).as("d1"),
          greatest(col("doc"), col("odoc")).as("d2"))
      selfCands.unionByName(cross)
    }).dropDuplicates("d1", "d2").persist(mem))

    // verification corpus: the batch plus ONLY the already-ingested
    // docs that candidates name. The docs-lake read is candidate-
    // bounded at the FILE level too: partition-pruned to the
    // candidates' hash partitions and Bloom-admitted on the id, then
    // exact via the semi-join (Bloom false positives and partition
    // co-residents drop there). dropDuplicates guards the re-delivery
    // case where the batch is already in the lake: a doc appearing
    // twice would double-count every common shingle.
    val candIds = cands
      .select(explode(array(col("d1"), col("d2"))).as(id)).distinct()
    val batchDocs = batch.select(col(id), col(text))
    val verifyDocs = (if (!haveIndex ||
        VersionedLake.currentVersion(docsLake) < 1) batchDocs
      else batchDocs.unionByName(
        pointRead(spark, docsLake, id, keyedByHash(candIds, col(id), docsLake))
          .select(col(id), col(text))
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
        docsLake, PartCol, appendBatchId,
        blooms = Seq(BloomSpec(id)),
        props = Map(PartsProp -> docParts.toString))
    }
    guarded(indexLake) {
      VersionedLake.append(newBanded, indexLake, "band", appendBatchId,
        blooms = Seq(BloomSpec("bucket", m = 32768), BloomSpec("doc")))
    }
    pairs
  }

  /** The ELEMENT-form increment — incremental near-dup for any
    * modality whose identity is a fingerprint SET rather than text
    * shingles (video frame hashes, audio window hashes, feature
    * grams). State is ONE lake: the (doc, s) membership table itself,
    * which doubles as the verification corpus — element sets are
    * their own evidence, so unlike [[indexBatch]] no second lake and
    * no text re-read are needed. The lake records Bloom filters on
    * BOTH its columns (the round's multi-column spec): `s` admits the
    * cross-increment candidate join's files, `doc` admits the verify
    * read's — a small tick opens only the files its elements and
    * candidates might live in.
    *
    * Per tick: distinct the batch memberships, candidate-join them
    * against the element-Bloom-pruned index files on the element
    * (batch side is tick-sized, so AQE broadcasts it), add
    * within-batch candidates through the salted self-join, then
    * exact-verify from (pruned index ∪ batch) memberships semi-joined
    * to the candidates.
    *
    * `maxElemDf`, when set, is evaluated against the memberships seen
    * SO FAR (index ∪ batch) — the only df an online pass can know.
    * Only the BATCH's elements can generate candidates, so the cap
    * needs only THEIR cumulative df — never a full-index histogram.
    * Those counts live in a side lake (`<elemLake>__df`: one (s, c)
    * row per distinct element, Bloom-indexed on s) maintained
    * additively by each capped tick under the same batch-id guard as
    * the index itself; a tick that finds the side lake missing or
    * behind the index's watermark (earlier uncapped ticks, ad-hoc
    * calls) rebuilds it with one aggregate over the index — the
    * documented resync cost, paid only when cap maintenance lapsed.
    * After a [[retract]] the counts are upper bounds (retraction does
    * not decrement them), so a once-hot element stays capped —
    * conservative candidate generation; scores stay exact either way
    * (the cap never changes reported values, only candidate
    * generation), so the incremental pass has recall ≥ the batch pass
    * and identical pair values. With no cap the two are exactly equal
    * (DedupStreamSpec; the x_video_neardup_incr gate hashes the
    * uncapped form against the ground-truth oracle).
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
        .persist(mem))
    val haveIndex = VersionedLake.currentVersion(elemLake) >= 1

    // hot-element cap over everything seen so far, candidate-bounded:
    // cumulative df of the BATCH's elements only (see scaladoc)
    val candNew = maxElemDf match {
      case Some(cap) =>
        val cum = batchElemCounts(spark, newSets, elemLake, docParts,
          appendBatchId)
        val hot = cum.filter(col("c") > cap).select(col("s"))
        newSets.join(hot, Seq("s"), "left_anti")
      case None => newSets
    }
    val selfCands = Dedup.saltedSelfPairs(candNew, Seq("s"),
      hotElemThreshold, salts)
      .select(col("doc_1").as("d1"), col("doc_2").as("d2"))
    val cands = graft.CacheRegistry.retain((if (!haveIndex) selfCands else {
      // the index side opens only files whose element Bloom might hold
      // one of candNew's elements. No hot anti-join on the old side:
      // the equi-join on s against candNew (which already excludes hot
      // elements) makes old hot rows unmatchable — the anti-join the
      // batch operator applies there is redundant here.
      val elemKeys = candNew.select(col("s").cast("string").as("k")).distinct()
      val old = pointRead(spark, elemLake, "s", elemKeys)
        .select(col("doc").as("odoc"), col("s"))
      val cross = candNew.join(old, Seq("s"))
        .filter(col("doc") =!= col("odoc"))
        .select(least(col("doc"), col("odoc")).as("d1"),
          greatest(col("doc"), col("odoc")).as("d2"))
      selfCands.unionByName(cross)
    }).dropDuplicates("d1", "d2").persist(mem))

    // verify against the touched docs' FULL element sets (hot
    // included): the index read is partition-pruned to the candidate
    // docs' hash partitions and Bloom-admitted on doc — complete
    // because a doc's rows all live in its partition and Bloom false
    // negatives are impossible
    val candIds = cands
      .select(explode(array(col("d1"), col("d2"))).as("doc")).distinct()
    val oldVerify =
      if (!haveIndex) None
      else Some(pointRead(spark, elemLake, "doc",
        keyedByHash(candIds, col("doc"), elemLake))
        .select(col("doc"), col("s")))
    val verifyItems = oldVerify.map(newSets.unionByName(_)).getOrElse(newSets)
      .join(candIds, Seq("doc"), "left_semi")
      .dropDuplicates("doc", "s") // re-delivery: batch may already be indexed
    val pairs = Dedup.verifySetPairs(cands, verifyItems, threshold)
      .localCheckpoint(true)

    if (appendBatchId.forall(_ > VersionedLake.committedBatchId(elemLake)))
      VersionedLake.append(
        newSets.withColumn(PartCol, pmod(xxhash64(col("doc")), lit(docParts))),
        elemLake, PartCol, appendBatchId,
        blooms = Seq(BloomSpec("doc"), BloomSpec("s", m = 32768)),
        props = Map(PartsProp -> docParts.toString))
    pairs
  }

  /** The df-count side lake of an element lake ([[indexElementsBatch]]'s
    * `maxElemDf` state): one (s, c) row per distinct element ever
    * ingested, c = its membership count over all committed increments. */
  private[graft] def dfDir(elemLake: String): String = s"${elemLake}__df"

  /** Cumulative df of the BATCH's elements over (index ∪ batch) —
    * the only counts the cap needs — and the side-lake maintenance
    * that keeps the next tick's lookup candidate-bounded.
    *
    * Paths, in order of preference:
    *  - side lake in sync with the index (its batch watermark matches;
    *    replay counts as in sync): a Bloom-pruned point read of the
    *    batch's elements' rows plus this batch's own counts — nothing
    *    index-sized is touched;
    *  - side lake missing or behind (uncapped ticks in between, ad-hoc
    *    None-id calls): rebuild it with one count aggregate over the
    *    index — the documented resync cost.
    * Maintenance is guarded by the SAME batch id as the element lake's
    * append, so a replayed tick reads counts that already include the
    * batch and skips the merge — identical hot set, identical output. */
  private def batchElemCounts(spark: SparkSession, newSets: DataFrame,
      elemLake: String, docParts: Int,
      appendBatchId: Option[Long]): DataFrame = {
    val df = dfDir(elemLake)
    val batchCounts = newSets.groupBy(col("s")).agg(count(lit(1)).as("bc"))
    val dfWm = VersionedLake.committedBatchId(df)
    val replay = appendBatchId.exists(_ <= dfWm)
    val inSync = VersionedLake.currentVersion(df) >= 1 &&
      appendBatchId.isDefined &&
      (replay || dfWm == VersionedLake.committedBatchId(elemLake))
    val withPart = (t: DataFrame) => t.withColumn(PartCol,
      pmod(xxhash64(col("s")), lit(docParts)))
    if (inSync) {
      val stored = pointRead(spark, df, "s",
        keyedByHash(newSets.select(col("s")).distinct(), col("s"), df))
        .select(col("s"), col("c"))
        .join(newSets.select(col("s")).distinct(), Seq("s"), "left_semi")
      if (replay) stored // counts already include this batch
      else {
        val cum = graft.CacheRegistry.retain(
          batchCounts.join(stored, Seq("s"), "left")
            .select(col("s"),
              (col("bc") + coalesce(col("c"), lit(0L))).as("c"))
            .persist(mem))
        if (appendBatchId.forall(_ > dfWm))
          VersionedLake.mergeUpsert(spark, df,
            withPart(cum).withColumn("_deleted", lit(false)), Seq("s"),
            PartCol, batchId = appendBatchId)
        cum
      }
    } else {
      // resync: one aggregate over the index rebuilds the counts for
      // EVERY element (the side table must be complete before the next
      // tick can trust it), then the batch folds in additively
      val idxCounts =
        if (VersionedLake.currentVersion(elemLake) < 1) batchCounts.limit(0)
          .select(col("s"), col("bc").as("ic"))
        else VersionedLake.read(spark, elemLake)
          .groupBy(col("s")).agg(count(lit(1)).as("ic"))
      val all = graft.CacheRegistry.retain(
        idxCounts.join(batchCounts, Seq("s"), "full")
          .select(col("s"),
            (coalesce(col("ic"), lit(0L)) + coalesce(col("bc"), lit(0L))).as("c"))
          .persist(mem))
      if (appendBatchId.forall(_ > dfWm)) {
        if (VersionedLake.currentVersion(df) < 1)
          VersionedLake.append(withPart(all), df, PartCol, appendBatchId,
            blooms = Seq(BloomSpec("s", m = 32768)),
            props = Map(PartsProp -> docParts.toString))
        else
          VersionedLake.mergeUpsert(spark, df,
            withPart(all).withColumn("_deleted", lit(false)), Seq("s"),
            PartCol, batchId = appendBatchId)
      }
      all.join(newSets.select(col("s")).distinct(), Seq("s"), "left_semi")
    }
  }

  /** The HAMMING-form increment — incremental near-dup for 64-bit
    * perceptual/structural fingerprints (pHash images, SimHash text):
    * the pigeonhole-blocked Hamming-ball scan of
    * [[Dedup.hammingPairs]], made online. State is one lake of the
    * PRE-CHUNKED signatures — (doc, h, chunk, cv) rows partitioned by
    * chunk, the same maxHamming+1-way split the batch operator blocks
    * on, so the cross-increment candidate join is a plain (chunk, cv)
    * equi-join against the lake, and the exact Hamming verify needs no
    * second lookup — both hashes ride the candidate row. The lake
    * records Bloom filters on cv (candidate join) and doc
    * ([[retract]]), so the cross-increment read opens only files that
    * might share a chunk value with the batch. Pigeonhole blocking is
    * recall-COMPLETE (two hashes within Hamming ≤ k agree on at least
    * one of k+1 chunks), so across increments this emits exactly the
    * all-pairs Hamming ball of everything ingested — the
    * x_phash_neardup_incr gate hashes two image increments against the
    * same ground-truth oracle as the one-shot gate.
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
        .persist(mem))
    val selfPairs = Dedup.saltedSelfPairs(chunkedNew, Seq("chunk", "cv"),
      hotChunkThreshold, salts)
      .select(col("doc_1").as("d1"), col("doc_2").as("d2"),
        col("h_1").as("h1"), col("h_2").as("h2"))
    val allPairs =
      if (VersionedLake.currentVersion(hashLake) < 1) selfPairs
      else {
        // candidate-bounded index read: only files whose cv Bloom might
        // hold one of the batch's chunk values (the join filters exact)
        val cvKeys = chunkedNew.select(col("cv").cast("string").as("k")).distinct()
        val old = pointRead(spark, hashLake, "cv", cvKeys)
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
      VersionedLake.append(chunkedNew, hashLake, "chunk", appendBatchId,
        blooms = Seq(BloomSpec("cv", m = 32768), BloomSpec("doc")))
    pairs
  }

  /** RETRACT documents from the dedup state (takedown shape): remove
    * their rows from whichever state lakes this operator family owns —
    * the MinHash docs+index lakes, an element-membership lake, or a
    * chunked-hash lake (pass the lakes that exist for your form; each
    * is a copy-on-write MERGE touching only the partitions that hold
    * the docs, and the rows-to-delete read itself is candidate-bounded
    * through the lakes' doc Blooms — a takedown of a handful of ids
    * opens a handful of files, not the lake). Retracted documents stop
    * matching FUTURE increments immediately; pairs already emitted are
    * history (filter them downstream against the retraction list —
    * emitted facts are not silently rewritten). An element lake's df
    * side table is NOT decremented (counts stay upper bounds — see
    * [[indexElementsBatch]]). Pre-delete versions stay time-travel-
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
      // partition pruning only applies on the doc-hash-partitioned
      // lakes (band/chunk partitions aren't derivable from ids); the
      // doc Bloom admission applies everywhere
      val keyed =
        if (partCol == PartCol) keyedByHash(ids, col(joinCol), lake)
        else ids.select(col(joinCol).cast("string").as("k"))
      val changes = pointRead(spark, lake, joinCol, keyed)
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
