package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The training data-LOADER surface: the deterministic layout steps a
  * pretraining run performs between a curated corpus and the tensors a
  * trainer streams — fixed-length sequence packing with position ids,
  * and the per-epoch reshuffle that re-deals the corpus into loader
  * shards every epoch.
  *
  * Everything here is a pure function of document ids (md5-derived,
  * the [[graft.functions.HashRandom]] convention): identical across
  * partitionings, task retries, cluster sizes, AND engines — which is
  * what makes a 100 TB layout resumable (re-running a failed epoch
  * regenerates byte-identical shards) and lets the driver's DuckDB
  * oracle replay every step exactly.
  */
object Loader {

  /** Shared deterministic-shuffle prefix sum: each document's global
    * token offset (`gstart`) in md5-shuffle order — the same two-level
    * distributed form as [[Curation.packShards]] (256 md5-prefix range
    * buckets → parallel per-bucket running sums → bounded 256-row
    * offset broadcast), bit-identical to the single global window the
    * oracles compute. Returns (doc_id, tokens, gstart); zero-token
    * documents are dropped (they occupy no layout space). */
  private[graft] def shuffleOffsets(docs: DataFrame, id: String,
      tokens: Column): DataFrame = {
    val keyed = docs.select(
      col(id).as("doc_id"),
      tokens.cast("long").as("tokens"),
      md5(concat(lit("shuffle:"), col(id).cast("string"))).as("sk"))
      .filter(col("tokens") > 0)
      .withColumn("bucket", conv(substring(col("sk"), 1, 2), 16, 10).cast("int"))
    val inBucket = keyed.withColumn("cum",
      sum(col("tokens")).over(
        Window.partitionBy(col("bucket")).orderBy(col("sk"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = keyed.groupBy(col("bucket"))
      .agg(sum(col("tokens")).as("btotal"))
      .withColumn("boffset",
        coalesce(sum(col("btotal")).over(
          Window.partitionBy(pmod(col("bucket"), lit(1))).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boffset"))
    inBucket.join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("tokens"),
        (col("boffset") + col("cum") - col("tokens")).as("gstart"))
  }

  /** GPT-style CONCAT-AND-CHUNK packing: lay the corpus out in its
    * deterministic shuffle order, concatenate all tokens, and cut the
    * stream into fixed `seqLen`-token training sequences — documents
    * SPAN sequence boundaries (no padding, no loss of tokens), unlike
    * [[Curation.packShards]] whose shards own whole documents.
    *
    * The result is the SLICE MAP a loader needs: one row per
    * (document, sequence) intersection with
    *   - `seq_id`   — which training sequence the slice lands in,
    *   - `seq_pos`  — the slice's first position WITHIN the sequence
    *                  (the position-id the trainer assigns its first
    *                  token),
    *   - `doc_off`  — the slice's first token WITHIN the document,
    *   - `len`      — slice length in tokens.
    * Per sequence, slices tile [0, seqLen) exactly (the final partial
    * sequence tiles [0, total mod seqLen)); per document, slice
    * lengths sum to the document's token count — both invariants are
    * spec-pinned.
    *
    * 100 TB shape: the offsets come from the shared two-level prefix
    * sum (never a global single-task window); the explode emits one
    * row per OUTPUT slice (≈ tokens / seqLen + 1 per document), so
    * work is proportional to the layout being produced; everything
    * downstream of the 256-row broadcast is embarrassingly parallel. */
  def packSequences(docs: DataFrame, id: String, tokens: Column,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"sequence length must be positive, got $seqLen")
    val L = lit(seqLen)
    // integral `div`, not floor(x / double): exact at ANY global token
    // offset — double division only stays exact below 2^53, and an
    // operator whose pitch is bit-determinism at 100 TB should not
    // carry that analysis burden (LoaderSpec pins a past-2^53 offset)
    val g = shuffleOffsets(docs, id, tokens)
      .withColumn("seq_id", explode(sequence(
        expr(s"gstart div $seqLen"),
        expr(s"(gstart + tokens - 1) div $seqLen"))))
    val sliceStart = greatest(col("gstart"), col("seq_id") * L)
    val sliceEnd = least(col("gstart") + col("tokens"), (col("seq_id") + 1) * L)
    g.select(
      col("doc_id"), col("seq_id"),
      (sliceStart - col("seq_id") * L).as("seq_pos"),
      (sliceStart - col("gstart")).as("doc_off"),
      (sliceEnd - sliceStart).as("len"))
  }

  /** [[packSequences]] with the global token stream STARTING at
    * `tokenBase` — the tranche form: a batch of new documents packs
    * into sequences that continue exactly where the previous tranche's
    * stream ended (a trailing partial sequence is FILLED by the next
    * tranche, positions continuing mid-sequence). Shuffle order is
    * per-tranche: production packed datasets are append-only, so new
    * documents never re-deal earlier tranches' layout. */
  def packSequencesFrom(docs: DataFrame, id: String, tokens: Column,
      seqLen: Long, tokenBase: Long): DataFrame = {
    require(seqLen > 0, s"sequence length must be positive, got $seqLen")
    require(tokenBase >= 0, s"tokenBase must be >= 0, got $tokenBase")
    val L = lit(seqLen)
    // same integral `div` as packSequences: tokenBase grows without
    // bound in a production pack lake, so layout ids must never round
    val g = shuffleOffsets(docs, id, tokens)
      .withColumn("g0", col("gstart") + lit(tokenBase))
      .withColumn("seq_id", explode(sequence(
        expr(s"g0 div $seqLen"),
        expr(s"(g0 + tokens - 1) div $seqLen"))))
    val sliceStart = greatest(col("g0"), col("seq_id") * L)
    val sliceEnd = least(col("g0") + col("tokens"), (col("seq_id") + 1) * L)
    g.select(
      col("doc_id"), col("seq_id"),
      (sliceStart - col("seq_id") * L).as("seq_pos"),
      (sliceStart - col("g0")).as("doc_off"),
      (sliceEnd - sliceStart).as("len"))
  }

  /** The packed dataset AS A GROWING LAKE: each tranche of new
    * documents appends its slice map to a versioned lake, continuing
    * the token stream where the last tranche ended — the production
    * loader shape, where training shards are append-only and a new
    * crawl tranche never rewrites (or re-deals) what earlier epochs
    * already trained on. Slices partition by sequence BLOCK
    * (seq_id / blockSize), so a trainer asking for a sequence range
    * opens only its blocks' files.
    *
    * The continuation offset is read from the lake itself — the MAX
    * block partition's last sequence end — which manifest partition
    * pruning makes an O(one partition) read, not a scan; no side
    * ledger to drift. `batchId` arms the lake's replay watermark:
    * re-delivering a crashed tranche is a no-op (exactly-once), the
    * [[graft.sources.VersionedLake]] discipline. Returns the committed
    * version (unchanged for an empty or replayed tranche).
    *
    * Earlier tranches' slices are IMMUTABLE by construction — a new
    * tranche can only add rows to the tail sequence's partition, never
    * change committed (doc, seq, pos) rows; LoaderSpec pins that.
    *
    * CONCURRENCY (upgraded from the r17 single-writer contract): the
    * continuation offset is read before the commit, so a plain append
    * race would let two tranche writers read the same tokenBase and
    * commit overlapping (seq_id, seq_pos) slices. Each tranche
    * therefore commits under a GUARDED append
    * ([[graft.sources.VersionedLake.PendingCommit]]'s guard): at
    * commit time the tail state tokenBase was derived from — the max
    * block partition and its exact file set — is re-checked against
    * the current manifest, and any change (a concurrent tranche, a
    * compaction of the tail block) ABORTS the commit, deleting the
    * staged files; this method then re-reads the offset, re-packs, and
    * retries (up to `maxAttempts` across [[packedLakeAppendImpl]]).
    * [[packStream]]'s foreachBatch loop still serializes its own
    * tranches — the guard is what makes an out-of-band writer safe
    * instead of silently corrupting the tiling. */
  def packedLakeAppend(docs: DataFrame, id: String, tokens: Column,
      seqLen: Long, lakeDir: String, batchId: Option[Long] = None,
      blockSize: Long = 256L): Int =
    packedLakeAppendImpl(docs, id, tokens, seqLen, lakeDir, batchId,
      blockSize, () => ())

  /** Retry loop around [[packedTrancheAttempt]]; `interleave` runs
    * between the first attempt's offset read and its commit — the
    * LoaderSpec race seam (subsequent retries never interleave, or the
    * test race would never converge). */
  private[graft] def packedLakeAppendImpl(docs: DataFrame, id: String,
      tokens: Column, seqLen: Long, lakeDir: String, batchId: Option[Long],
      blockSize: Long, interleave: () => Unit, maxAttempts: Int = 5): Int = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        return packedTrancheAttempt(docs, id, tokens, seqLen, lakeDir,
          batchId, blockSize, if (attempt == 1) interleave else () => ())
      } catch {
        case e: java.util.ConcurrentModificationException => last = e
      }
    }
    throw new IllegalStateException(
      s"packedLakeAppend lost the tail-guard race $maxAttempts times on " +
        s"$lakeDir — a writer storm; serialize producers or raise attempts",
      last)
  }

  /** ONE optimistic tranche attempt: read the continuation offset,
    * pack, commit guarded on the tail state the offset came from. */
  private def packedTrancheAttempt(docs: DataFrame, id: String,
      tokens: Column, seqLen: Long, lakeDir: String, batchId: Option[Long],
      blockSize: Long, interleave: () => Unit): Int = {
    import graft.sources.VersionedLake
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val spark = docs.sparkSession
    val exists = VersionedLake.currentVersion(lakeDir) >= 1
    if (exists &&
      batchId.exists(_ <= VersionedLake.committedBatchId(lakeDir))) {
      return VersionedLake.currentVersion(lakeDir)
    }
    // tail snapshot AT OFFSET-READ TIME — the guard closure re-checks
    // exactly this state at commit time (not planAppend's base, which
    // is snapshotted later and could already include a racer's commit)
    val (tokenBase, tailId, tailFiles) = if (!exists)
      (0L, None: Option[Long], Set.empty[String])
    else {
      val v = VersionedLake.currentVersion(lakeDir)
      val entries = VersionedLake.manifestEntries(lakeDir, v)
      if (entries.isEmpty) (0L, None, Set.empty[String]) else {
        val lastBlock = entries.map(_.partition.toLong).max
        val tb = VersionedLake.read(spark, lakeDir, Some(v),
          partitions = Some(Seq(lastBlock.toString)))
          .agg(max(col("seq_id") * seqLen + col("seq_pos") + col("len")))
          .head().getLong(0)
        (tb, Some(lastBlock),
          entries.filter(_.partition == lastBlock.toString).map(_.path).toSet)
      }
    }
    // cached across the emptiness probe and the append below — the
    // two-level prefix-sum/explode pipeline must run once per tranche,
    // not once per consumer
    val slices = packSequencesFrom(docs, id, tokens, seqLen, tokenBase)
      .withColumn("block", expr(s"seq_id div $blockSize").cast("string"))
      .persist()
    try {
      if (slices.isEmpty)
        return if (exists) VersionedLake.currentVersion(lakeDir) else 0
      // first tranche: commit an EMPTY v1 first so the tranche itself
      // lands as a WATERMARKED append — if create carried the first
      // tranche's rows directly, no batch id would be recorded and a
      // crash-replay of that one micro-batch would duplicate its slices
      if (!exists)
        VersionedLake.create(slices.limit(0), lakeDir, "block",
          props = Map("seq_len" -> seqLen.toString,
            "block_size" -> blockSize.toString))
      VersionedLake.requireProps(lakeDir,
        Map("seq_len" -> seqLen.toString, "block_size" -> blockSize.toString))
      interleave()
      // conflict iff the tail moved: a LATER block exists, the tail
      // block's file set changed, or (first tranche) any block appeared
      val guard: Seq[VersionedLake.Entry] => Boolean = cur => tailId match {
        case None => cur.nonEmpty
        case Some(t) =>
          cur.exists(_.partition.toLong > t) ||
            cur.filter(_.partition == t.toString).map(_.path).toSet != tailFiles
      }
      VersionedLake.commitPending(lakeDir,
        VersionedLake.planAppend(slices, lakeDir, "block", batchId,
          guard = Some(guard)))
      VersionedLake.currentVersion(lakeDir)
    } finally {
      slices.unpersist()
      ()
    }
  }

  /** Drive [[packedLakeAppend]] from a STREAM of documents — packing
    * at ingest: each micro-batch is one tranche, landing exactly-once
    * (the batch id arms the replay watermark; a crashed tick
    * re-delivers into a no-op).
    *
    * `compactEvery` = N > 0 folds the lake's small files every N
    * micro-batches ([[compactPackedLake]]): each tranche commits at
    * least one file into the tail block partition, so a long-running
    * pack stream accumulates tranche-count files per block without
    * maintenance. Compaction rewrites LAYOUT only — the slice map is
    * byte-identical across it (LoaderSpec pins that) and the replay
    * watermark survives (every commit re-states it), so exactly-once
    * holds across the fold. Runs INSIDE foreachBatch: the streaming
    * engine serializes it with the appends, keeping the lake's
    * single-writer contract. */
  def packStream(stream: DataFrame, id: String, tokensExpr: String,
      seqLen: Long, lakeDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "Loader.packStream expects a streaming DataFrame")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        packedLakeAppend(b.toDF(), id, expr(tokensExpr), seqLen, lakeDir,
          batchId = Some(batchId))
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          compactPackedLake(b.sparkSession, lakeDir)
        ()
      }
      .start()
  }

  /** Fold a pack lake's per-tranche file growth back to one file per
    * sequence block — [[graft.sources.VersionedLake.compactPartitions]]
    * on the lake's `block` partitioning, exposed here so maintenance
    * doesn't need to know the pack lake's layout column. Rewrites
    * bytes, never the slice map: committed (doc, seq, pos) rows are
    * immutable through it, history stays time-travel readable until
    * vacuumed, and a concurrent tranche commit aborts the fold (OCC),
    * deferring it to the next cadence. Returns the committed version
    * (unchanged when every block is already compact). */
  def compactPackedLake(spark: org.apache.spark.sql.SparkSession,
      lakeDir: String, filesPerPartition: Int = 1): Int =
    graft.sources.VersionedLake.compactPartitions(spark, lakeDir, "block",
      filesPerPartition)

  /** Per-EPOCH reshuffle into loader shards: every epoch re-deals the
    * corpus into `shards` deterministic shards and orders each shard
    * internally — the "reshuffle every epoch" a trainer expects,
    * without `rand()` (resumable, retry-stable, oracle-replayable).
    * Different epochs produce different permutations of the SAME
    * corpus; the same (seed, epoch) always produces the same one.
    *
    * Returns (doc_id, shard_id, pos): shard from the md5-uniform of
    * "shard:<seed>:<epoch>:<id>" (balanced in expectation — at scale,
    * size `shards` so a shard's index fits a loader worker), pos =
    * dense 0-based rank within the shard by the independent
    * "epoch:<seed>:<epoch>:<id>" key. The only exchange is the
    * per-shard window, bounded by corpus/shards. */
  def epochShuffle(docs: DataFrame, id: String, epoch: Int, shards: Int,
      seed: Long = 42L): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val u = graft.functions.HashRandom.uniform(
      concat(lit(s"shard:$seed:$epoch:"), col(id).cast("string")))
    val orderKey = md5(concat(lit(s"epoch:$seed:$epoch:"), col(id).cast("string")))
    docs.select(col(id).as("doc_id"),
      floor(u * shards).cast("long").as("shard_id"), orderKey.as("_k"))
      .withColumn("pos", (row_number().over(
        Window.partitionBy(col("shard_id")).orderBy(col("_k"), col("doc_id")))
        - 1).cast("long"))
      .select(col("doc_id"), col("shard_id"), col("pos"))
  }

  /** The epoch layouts AS A LAKE: [[epochShuffle]] is a pure function,
    * but a trainer restart that RE-DERIVES epoch e's layout re-pays
    * the corpus-wide shuffle — so each epoch's shard manifest is
    * COMMITTED once, partitioned by (epoch, shard), and a restart
    * re-reads the committed layout instead (one manifest-pruned
    * partition per loader worker). `batchId = epoch` arms the lake's
    * replay watermark: re-submitting a committed epoch is a no-op
    * (exactly-once per epoch — "resumable mid-epoch" means workers
    * read a layout whose commit either fully happened or didn't).
    * Epochs must commit IN ORDER (the watermark is monotone — the
    * natural trainer loop); shards/seed are table properties, so a
    * writer re-deriving with different geometry is refused loudly.
    * Returns the committed version (unchanged on replay). */
  def epochLakeAppend(docs: DataFrame, id: String, epoch: Int, shards: Int,
      lakeDir: String, seed: Long = 42L): Int = {
    import graft.sources.VersionedLake
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val exists = VersionedLake.currentVersion(lakeDir) >= 1
    if (exists && epoch <= VersionedLake.committedBatchId(lakeDir)) {
      // below the watermark means EITHER a legitimate replay (some
      // version's manifest carries this epoch's batch id) or an epoch
      // that was SKIPPED while later ones committed — the latter must
      // refuse loudly, not silently return a success-looking version
      // with no layout behind it (readEpoch would serve empty). The
      // SAME predicate guards the read side ([[epochCommitted]]).
      require(epochCommitted(lakeDir, epoch),
        s"epoch $epoch was never committed to $lakeDir but later epochs " +
          "were — epochs must commit in order (the batch-id watermark is " +
          "monotone); rebuild the lake or commit epochs sequentially")
      return VersionedLake.currentVersion(lakeDir)
    }
    val props = Map("shards" -> shards.toString, "seed" -> seed.toString)
    val layout = epochShuffle(docs, id, epoch, shards, seed)
      .withColumn("part", concat(lit(s"e$epoch-s"), col("shard_id")))
    if (!exists)
      VersionedLake.create(layout.limit(0), lakeDir, "part", props = props)
    VersionedLake.requireProps(lakeDir, props)
    VersionedLake.append(layout, lakeDir, "part", Some(epoch.toLong))
    VersionedLake.currentVersion(lakeDir)
  }

  /** Is `epoch` provably committed to the lake? True when it sits at
    * or below the batch watermark AND some version's manifest carries
    * its batch id; a vacuumed (missing) manifest makes history
    * uninspectable, so it counts as possibly-committed rather than
    * refusing legitimately old epochs. The ONE predicate both sides
    * share — write-side replay detection ([[epochLakeAppend]]) and
    * read-side refusal ([[readEpoch]]/[[readEpochShard]]) must never
    * disagree on what counts as committed.
    *
    * Cost (r19 ADVICE): [[requireEpochCommitted]] runs this on EVERY
    * readEpoch/readEpochShard — a per-worker resume loop must not pay
    * O(versions) manifest-header opens per shard read. Two escapes:
    * epoch == watermark needs no walk at all (the watermark only rises
    * through a commit carrying that very batch id, so equality proves
    * commitment — the common resume case reads the newest header
    * once); older epochs consult a per-(lake, currentVersion) cache of
    * the walked id set. Only a POSITIVE cache answer is trusted: a
    * negative one re-walks fresh before refusing, so a manifest
    * vacuumed mid-session (without a version bump) can never turn the
    * documented possibly-committed lenience into a stale-cache
    * refusal — and the refusal path is about to throw anyway, so one
    * walk there costs nothing. */
  private val epochWalkCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Boolean, Set[Long])]()

  private def epochCommitted(lakeDir: String, epoch: Int): Boolean = {
    import graft.sources.VersionedLake
    val wm = VersionedLake.committedBatchId(lakeDir)
    def walk(cur: Int): (Int, Boolean, Set[Long]) = {
      val vs = 1 to cur
      val missing = vs.exists(w => !VersionedLake.manifestExists(lakeDir, w))
      val ids = vs.iterator.filter(VersionedLake.manifestExists(lakeDir, _))
        .map(w => VersionedLake.committedBatchId(lakeDir, Some(w)))
        .filter(_ >= 0L).toSet
      (cur, missing, ids)
    }
    def hit(e: (Int, Boolean, Set[Long])): Boolean =
      e._2 || e._3.contains(epoch.toLong)
    epoch.toLong <= wm && (epoch.toLong == wm || {
      val cur = VersionedLake.currentVersion(lakeDir)
      val cached = epochWalkCache.get(lakeDir)
      if (cached != null && cached._1 == cur && hit(cached)) true
      else {
        val fresh = walk(cur)
        epochWalkCache.put(lakeDir, fresh)
        hit(fresh)
      }
    })
  }

  /** Refuse a read of an epoch that was never committed: a trainer
    * restarted AHEAD of the writer would otherwise train zero batches
    * from the silently-empty partition-pruned read — at odds with the
    * loud-refusal discipline [[epochLakeAppend]] enforces on the write
    * side. */
  private def requireEpochCommitted(lakeDir: String, epoch: Int): Unit =
    if (!epochCommitted(lakeDir, epoch)) throw new IllegalArgumentException(
      s"epoch $epoch was never committed to $lakeDir (watermark " +
        s"${graft.sources.VersionedLake.committedBatchId(lakeDir)}) — run " +
        "epochLakeAppend for it first; refusing a silently-empty layout read")

  /** One epoch's full layout back from the lake — every shard's
    * partition, manifest-pruned (other epochs' files are never
    * opened). Shard count comes from the recorded table properties.
    * Refuses loudly (IllegalArgumentException) when the epoch was never
    * committed. */
  def readEpoch(spark: org.apache.spark.sql.SparkSession, lakeDir: String,
      epoch: Int): DataFrame = {
    import graft.sources.VersionedLake
    val shards = VersionedLake.tableProps(lakeDir).getOrElse("shards",
      throw new IllegalArgumentException(
        s"$lakeDir records no 'shards' property — not an epoch lake")).toInt
    requireEpochCommitted(lakeDir, epoch)
    VersionedLake.read(spark, lakeDir,
      partitions = Some((0 until shards).map(s => s"e$epoch-s$s")))
      .select(col("doc_id"), col("shard_id"), col("pos"))
  }

  /** One (epoch, shard) partition — what a single loader worker
    * resumes from: one manifest-pruned partition read, ordered by the
    * committed positions. Same loud refusal as [[readEpoch]] for an
    * uncommitted epoch (one driver-side manifest walk per call). */
  def readEpochShard(spark: org.apache.spark.sql.SparkSession,
      lakeDir: String, epoch: Int, shard: Int): DataFrame = {
    requireEpochCommitted(lakeDir, epoch)
    graft.sources.VersionedLake.read(spark, lakeDir,
      partitions = Some(Seq(s"e$epoch-s$shard")))
      .select(col("doc_id"), col("shard_id"), col("pos"))
      .orderBy(col("pos"))
  }
}
