package graft

import graft.operators.Loader
import org.apache.spark.sql.functions._

/** The loader-layout guarantees the x_pack_sequences / x_epoch_shuffle
  * gates can't see from one hashed dump: the packing's tiling
  * invariants (sequences tile exactly, documents slice losslessly,
  * long documents span), and the reshuffle's permutation contract
  * (same epoch replays identically, different epochs differ, every
  * shard's positions are dense).
  */
class LoaderSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, maxTokens: Int) = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i => (i.toLong, 1 + rnd.nextInt(maxTokens)))
      .toDF("doc_id", "tokens")
  }

  test("packSequences: sequences tile [0, L) exactly; documents slice losslessly; long docs span") {
    val L = 100L
    val docs = corpus(300, 250) // many docs longer than one sequence
    val totalTokens = docs.agg(sum("tokens")).as[Long].head()
    val slices = Loader.packSequences(docs, "doc_id", col("tokens"), L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    // global: no token lost or invented
    assert(slices.map(_._5).sum == totalTokens)

    // per sequence: slices sorted by seq_pos tile contiguously from 0,
    // summing to L (the final partial sequence to totalTokens mod L)
    val lastSeq = (totalTokens - 1) / L
    slices.groupBy(_._2).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"seq $seq starts at ${sorted.head._3}")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 == b._3,
          s"seq $seq has a gap at pos ${b._3}")
        case _ =>
      }
      val want = if (seq == lastSeq && totalTokens % L != 0) totalTokens % L else L
      assert(sorted.map(_._5).sum == want, s"seq $seq sums to ${sorted.map(_._5).sum}")
    }

    // per document: doc_off slices are contiguous from 0 and sum to tokens
    val byDoc = docs.collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    slices.groupBy(_._1).foreach { case (d, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4)
        case _ =>
      }
      assert(sorted.map(_._5).sum == byDoc(d))
    }

    // a document longer than L spans > 1 sequence
    val long = slices.groupBy(_._1).filter { case (d, _) => byDoc(d) > L }
    assert(long.nonEmpty && long.forall(_._2.map(_._2).distinct.length > 1))

    // zero-token documents occupy no layout space
    val withEmpty = docs.unionByName(Seq((9999L, 0)).toDF("doc_id", "tokens"))
    val s2 = Loader.packSequences(withEmpty, "doc_id", col("tokens"), L)
    assert(s2.filter(col("doc_id") === 9999L).count() == 0)
    assert(s2.count() == slices.length)
  }

  test("packSequencesFrom: layout ids stay exact past double's 2^53 integer range") {
    // a continuation offset beyond 2^53, deliberately NOT on a seqLen
    // boundary: the old floor(x / double) form rounds up here and
    // shifts every slice one sequence over; integral `div` must not
    val L = 1024L
    val base = (1L << 53) + 511L
    val docs = (0 until 40).map(i => (i.toLong, 100L + (i * 37) % 400))
      .toDF("doc_id", "tokens")
    val total = docs.agg(sum("tokens")).as[Long].head()
    val slices = Loader.packSequencesFrom(docs, "doc_id", col("tokens"), L, base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(slices.map(_._5).sum == total)
    // the first emitted sequence is exactly base div L, and its first
    // slice starts mid-sequence at base mod L — the double form would
    // start one sequence later with seq_pos 0
    val firstSeq = slices.map(_._2).min
    assert(firstSeq == base / L, s"first seq $firstSeq != ${base / L}")
    assert(slices.filter(_._2 == firstSeq).map(_._3).min == base % L)
    // per sequence: interior sequences tile [base mod L adjusted] — all
    // sequences strictly between first and last tile [0, L) exactly
    val lastSeq = (base + total - 1) / L
    slices.groupBy(_._2).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 == b._3, s"gap in seq $seq")
        case _ =>
      }
      if (seq > firstSeq && seq < lastSeq) {
        assert(sorted.head._3 == 0L && sorted.map(_._5).sum == L,
          s"interior seq $seq does not tile [0, $L)")
      }
    }
    // per document: lossless slicing survives the huge offset
    val byDoc = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    slices.groupBy(_._1).foreach { case (d, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      assert(sorted.map(_._5).sum == byDoc(d))
    }
  }

  test("packedLakeAppend: tranches continue the stream, earlier slices immutable, replay no-op, props guarded") {
    import graft.sources.VersionedLake
    val L = 100L
    val dir = java.nio.file.Files.createTempDirectory("graft_packlake").toString + "/lake"
    val docs = corpus(200, 150)
    val t1 = docs.filter(col("doc_id") % 2 === 0)
    val t2 = docs.filter(col("doc_id") % 2 =!= 0)
    val v1 = graft.operators.Loader.packedLakeAppend(
      t1, "doc_id", col("tokens"), L, dir, batchId = Some(0L))
    assert(v1 == 2) // v1 of the lake is the empty watermark-arming commit
    val snap1 = VersionedLake.read(spark, dir, Some(2))
      .collect().map(_.toSeq).toSet
    val total1 = t1.agg(sum("tokens")).as[Long].head()
    // tranche 1 alone == the one-shot packing of tranche 1
    val oneShot = graft.operators.Loader.packSequences(t1, "doc_id", col("tokens"), L)
      .collect().map(_.toSeq).toSet
    assert(snap1.map(_.dropRight(1)) == oneShot) // minus the block column
    val v2 = graft.operators.Loader.packedLakeAppend(
      t2, "doc_id", col("tokens"), L, dir, batchId = Some(1L))
    assert(v2 == 3)
    // tranche 2's first token lands EXACTLY at tranche 1's total —
    // the trailing partial sequence is continued, not padded
    val t2starts = VersionedLake.read(spark, dir)
      .join(t2.select(col("doc_id")), "doc_id")
      .select((col("seq_id") * L + col("seq_pos")).as("g"))
      .agg(min(col("g"))).as[Long].head()
    assert(t2starts == total1, s"tranche 2 starts at $t2starts, want $total1")
    // earlier slices are immutable: v1 re-reads identically, and v2 is
    // a strict superset (append-only layout)
    assert(VersionedLake.read(spark, dir, Some(2))
      .collect().map(_.toSeq).toSet == snap1)
    val snap2 = VersionedLake.read(spark, dir).collect().map(_.toSeq).toSet
    assert(snap1.subsetOf(snap2) && snap2.size > snap1.size)
    // no token lost across the whole lake
    val lakeTokens = VersionedLake.read(spark, dir)
      .agg(sum("len")).as[Long].head()
    assert(lakeTokens == docs.agg(sum("tokens")).as[Long].head())
    // replayed tranche is a no-op
    assert(graft.operators.Loader.packedLakeAppend(
      t2, "doc_id", col("tokens"), L, dir, batchId = Some(1L)) == 3)
    assert(VersionedLake.read(spark, dir).count() == snap2.size)
    // a different seqLen against the same lake is refused loudly
    intercept[IllegalArgumentException] {
      graft.operators.Loader.packedLakeAppend(
        t2, "doc_id", col("tokens"), 64L, dir, batchId = Some(2L))
    }
  }

  test("packedLakeAppend OCC: an interleaved tranche aborts the stale commit; the retry re-derives and the tiling holds") {
    import graft.sources.VersionedLake
    val L = 100L
    val dir = java.nio.file.Files.createTempDirectory("graft_packocc").toString + "/lake"
    val seed = corpus(30, 60).withColumn("doc_id", col("doc_id") + 9000L)
    val a = corpus(60, 50)
    val b = corpus(40, 45).withColumn("doc_id", col("doc_id") + 5000L)
    val c = corpus(20, 40).withColumn("doc_id", col("doc_id") + 7000L)
    Loader.packedLakeAppend(seed, "doc_id", col("tokens"), L, dir, blockSize = 4L)

    // Seam: writer A reads its continuation offset, writer B commits a
    // tranche underneath, A's guarded commit must ABORT (pre-fix, both
    // landed and their slices overlapped the same (seq_id, seq_pos)s).
    val err = intercept[IllegalStateException] {
      Loader.packedLakeAppendImpl(a, "doc_id", col("tokens"), L, dir, None,
        4L, () => {
          Loader.packedLakeAppend(b, "doc_id", col("tokens"), L, dir,
            blockSize = 4L)
          ()
        }, maxAttempts = 1)
    }
    assert(err.getCause.isInstanceOf[java.util.ConcurrentModificationException],
      s"cause was ${err.getCause}")
    // B landed; none of A's rows did (its staged files were deleted)
    val afterAbort = VersionedLake.read(spark, dir)
    assert(afterAbort.join(b.select("doc_id"), "doc_id").count() > 0)
    assert(afterAbort.join(a.select("doc_id"), "doc_id").count() == 0)

    // The RETRYING form: attempt 1 loses to an interleaved C, attempt 2
    // re-reads the offset and lands.
    Loader.packedLakeAppendImpl(a, "doc_id", col("tokens"), L, dir, None,
      4L, () => {
        Loader.packedLakeAppend(c, "doc_id", col("tokens"), L, dir,
          blockSize = 4L)
        ()
      })

    // tiling invariants across all four tranches: no token lost, every
    // sequence tiles contiguously from 0 (final partial excepted), no
    // (seq_id, seq_pos) double-booked
    val all = Seq(seed, a, b, c).reduce(_ unionByName _)
    val total = all.agg(sum("tokens")).as[Long].head()
    val slices = VersionedLake.read(spark, dir)
      .select("doc_id", "seq_id", "seq_pos", "doc_off", "len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(slices.map(_._5).sum == total)
    assert(slices.map(s => (s._2, s._3)).distinct.length == slices.length,
      "overlapping (seq_id, seq_pos) slices — the pre-OCC corruption")
    val lastSeq = (total - 1) / L
    slices.groupBy(_._2).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"seq $seq starts at ${sorted.head._3}")
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._3 + x._5 == y._3, s"gap in seq $seq")
        case _ =>
      }
      val want = if (seq == lastSeq && total % L != 0) total % L else L
      assert(sorted.map(_._5).sum == want, s"seq $seq sums wrong")
    }
  }

  test("packedLakeAppend OCC under real concurrency: parallel writers all land, tiling intact") {
    import graft.sources.VersionedLake
    val L = 100L
    val dir = java.nio.file.Files.createTempDirectory("graft_packrace").toString + "/lake"
    // seed so every racer takes the append path (the create race throws
    // IllegalArgumentException, which is a loud refusal, not a retry)
    Loader.packedLakeAppend(corpus(10, 40).withColumn("doc_id",
      col("doc_id") + 90000L), "doc_id", col("tokens"), L, dir, blockSize = 4L)
    // two writers, three tranches each, genuinely interleaved threads —
    // every commit rides the tail guard; raised attempts absorb repeated
    // losses under true contention
    val tranches = (0 until 6).map(t =>
      corpus(25, 35).withColumn("doc_id", col("doc_id") + lit(t * 1000L)))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { w =>
      new Thread(() =>
        try (0 until 3).foreach { i =>
          Loader.packedLakeAppendImpl(tranches(w * 3 + i), "doc_id",
            col("tokens"), L, dir, None, 4L, () => (), maxAttempts = 30)
        } catch { case t: Throwable => failures.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"writer thread failed: ${failures.peek()}")
    val all = tranches.reduce(_ unionByName _)
    val total = all.agg(sum("tokens")).as[Long].head() +
      corpus(10, 40).agg(sum("tokens")).as[Long].head()
    val slices = VersionedLake.read(spark, dir)
      .select("seq_id", "seq_pos", "len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(slices.map(_._3).sum == total, "tokens lost or double-booked")
    assert(slices.map(s => (s._1, s._2)).distinct.length == slices.length,
      "overlapping (seq_id, seq_pos) slices under concurrency")
    val lastSeq = (total - 1) / L
    slices.groupBy(_._1).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"seq $seq starts at ${sorted.head._2}")
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._2 + x._3 == y._2, s"gap in seq $seq")
        case _ =>
      }
      val want = if (seq == lastSeq && total % L != 0) total % L else L
      assert(sorted.map(_._3).sum == want, s"seq $seq sums wrong")
    }
  }

  test("packStream: micro-batches pack exactly-once; restart replays into a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.VersionedLake
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_packstream").toString
    // AvailableNow snapshots the source at START: add each tranche,
    // then run one stream to termination (the indexStream idiom)
    val ms = MemoryStream[(Long, Int)]
    def tick(): Unit = graft.operators.Loader.packStream(
      ms.toDF().toDF("doc_id", "tokens"), "doc_id", "tokens", 100L,
      s"$dir/lake", s"$dir/ckpt").awaitTermination()
    ms.addData((0 until 50).map(i => (i.toLong, 30)): _*)
    tick()
    ms.addData((50 until 80).map(i => (i.toLong, 45)): _*)
    tick()
    val got = VersionedLake.read(spark, s"$dir/lake")
      .agg(sum("len")).as[Long].head()
    assert(got == 50L * 30 + 30L * 45)
    // restart over the same checkpoint replays nothing
    tick()
    assert(VersionedLake.read(spark, s"$dir/lake")
      .agg(sum("len")).as[Long].head() == got)
  }

  test("pack-lake compaction: files collapse per block, slice map byte-identical, replay watermark survives") {
    import graft.sources.VersionedLake
    val L = 100L
    val dir = java.nio.file.Files.createTempDirectory("graft_packcomp").toString + "/lake"
    val docs = corpus(240, 150)
    // four tranches with a SMALL block size fragment every block
    (0 until 4).foreach { t =>
      graft.operators.Loader.packedLakeAppend(
        docs.filter(col("doc_id") % 4 === t), "doc_id", col("tokens"), L,
        dir, batchId = Some(t.toLong), blockSize = 8L)
    }
    val before = VersionedLake.read(spark, dir).collect().map(_.toSeq).toSet
    val filesBefore = VersionedLake.read(spark, dir).inputFiles.length
    val vComp = graft.operators.Loader.compactPackedLake(spark, dir)
    val filesAfter = VersionedLake.read(spark, dir).inputFiles.length
    assert(filesAfter < filesBefore,
      s"compaction must collapse files: $filesBefore -> $filesAfter")
    // one file per block partition (the s17 discipline)
    val blocks = VersionedLake.manifestEntries(dir, vComp).map(_.partition)
    assert(blocks.distinct.size == blocks.size, "one file per block")
    // the slice map is BYTE-IDENTICAL across the layout rewrite
    assert(VersionedLake.read(spark, dir).collect().map(_.toSeq).toSet == before)
    // pre-compaction versions stay time-travel readable
    assert(VersionedLake.read(spark, dir, Some(vComp - 1))
      .collect().map(_.toSeq).toSet == before)
    // the replay watermark survives the fold: a replayed tranche is
    // still a no-op, and the NEXT tranche continues the stream exactly
    assert(graft.operators.Loader.packedLakeAppend(
      docs.filter(col("doc_id") % 4 === 3), "doc_id", col("tokens"), L,
      dir, batchId = Some(3L), blockSize = 8L) == vComp)
    val total = docs.agg(sum("tokens")).as[Long].head()
    graft.operators.Loader.packedLakeAppend(
      corpus(10, 50).withColumn("doc_id", col("doc_id") + 1000L),
      "doc_id", col("tokens"), L, dir, batchId = Some(4L), blockSize = 8L)
    val nextStart = VersionedLake.read(spark, dir)
      .filter(col("doc_id") >= 1000L)
      .select((col("seq_id") * L + col("seq_pos")).as("g"))
      .agg(min(col("g"))).as[Long].head()
    assert(nextStart == total, s"post-compaction tranche starts at $nextStart, want $total")
  }

  test("packStream with compactEvery: maintenance folds files on cadence without changing the layout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.VersionedLake
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_packstrc").toString
    val ms = MemoryStream[(Long, Int)]
    def tick(): Unit = graft.operators.Loader.packStream(
      ms.toDF().toDF("doc_id", "tokens"), "doc_id", "tokens", 100L,
      s"$dir/lake", s"$dir/ckpt", compactEvery = 2).awaitTermination()
    ms.addData((0 until 40).map(i => (i.toLong, 30)): _*)
    tick()
    ms.addData((40 until 80).map(i => (i.toLong, 30)): _*)
    tick() // batch 1: 1 % 2 == 1 → compaction fires after the append
    val entries = VersionedLake.manifestEntries(s"$dir/lake",
      VersionedLake.currentVersion(s"$dir/lake"))
    assert(entries.groupBy(_.partition).forall(_._2.size == 1),
      "compaction cadence must leave one file per block")
    assert(VersionedLake.read(spark, s"$dir/lake")
      .agg(sum("len")).as[Long].head() == 80L * 30)
  }

  test("epochLakeAppend: committed layouts equal the derivation, replay no-op, shard reads pruned, geometry guarded") {
    import graft.sources.VersionedLake
    val dir = java.nio.file.Files.createTempDirectory("graft_epochlake").toString + "/lake"
    val docs = corpus(300, 10).select("doc_id")
    val v0 = Loader.epochLakeAppend(docs, "doc_id", epoch = 0, shards = 8, dir)
    val v1 = Loader.epochLakeAppend(docs, "doc_id", epoch = 1, shards = 8, dir)
    assert(v1 > v0)
    // committed layout == the pure derivation, per epoch
    for (e <- 0 to 1) {
      val lake = Loader.readEpoch(spark, dir, e)
        .collect().map(_.toSeq).toSet
      val derived = Loader.epochShuffle(docs, "doc_id", e, 8)
        .collect().map(_.toSeq).toSet
      assert(lake == derived && lake.size == 300, s"epoch $e diverged")
    }
    // replayed epoch is a no-op (batch-id watermark)
    assert(Loader.epochLakeAppend(docs, "doc_id", 1, 8, dir) == v1)
    assert(VersionedLake.read(spark, dir).count() == 600)
    // a single (epoch, shard) read opens ONLY its partition's files
    val shard3 = Loader.readEpochShard(spark, dir, 1, 3)
    assert(shard3.inputFiles.length <
      VersionedLake.read(spark, dir).inputFiles.length)
    val ps = shard3.select("pos").collect().map(_.getLong(0))
    assert(ps.toSeq == ps.sorted.toSeq && ps.toSet == (0L until ps.length).toSet)
    // re-deriving with different geometry is refused loudly
    intercept[IllegalArgumentException] {
      Loader.epochLakeAppend(docs, "doc_id", 2, shards = 16, dir)
    }
    intercept[IllegalArgumentException] {
      Loader.epochLakeAppend(docs, "doc_id", 2, 8, dir, seed = 7L)
    }
    // a SKIPPED epoch submitted below the watermark is refused loudly —
    // it is provably uncommitted (no manifest carries its batch id),
    // unlike a legitimate replay which no-ops
    Loader.epochLakeAppend(docs, "doc_id", 3, 8, dir) // skips epoch 2
    assert(intercept[IllegalArgumentException] {
      Loader.epochLakeAppend(docs, "doc_id", 2, 8, dir)
    }.getMessage.contains("never committed"))
    // replays of committed epochs still no-op after the gap
    val vNow = graft.sources.VersionedLake.currentVersion(dir)
    assert(Loader.epochLakeAppend(docs, "doc_id", 0, 8, dir) == vNow)
    // READING an uncommitted epoch refuses loudly too — a trainer
    // restarted ahead of the writer must not train zero batches from a
    // silently-empty partition-pruned read (r18 ADVICE)
    assert(intercept[IllegalArgumentException] {
      Loader.readEpoch(spark, dir, 2) // the skipped epoch
    }.getMessage.contains("never committed"))
    assert(intercept[IllegalArgumentException] {
      Loader.readEpochShard(spark, dir, 9, 0) // above the watermark
    }.getMessage.contains("never committed"))
    // committed epochs still read fine after the gap
    assert(Loader.readEpoch(spark, dir, 3).count() == 300)
  }

  test("epochShuffle: replay-identical within an epoch, different across epochs, dense per-shard positions") {
    val docs = corpus(500, 10).select("doc_id")
    def layout(epoch: Int) = Loader.epochShuffle(docs, "doc_id", epoch, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val e0 = layout(0)
    assert(layout(0) == e0, "same (seed, epoch) must replay bit-identically")
    val e1 = layout(1)
    assert(e0 != e1, "different epochs must permute differently")

    // every document exactly once per epoch
    assert(e0.map(_._1) == (0L until 500L).toSet && e0.size == 500)
    assert(e1.map(_._1) == (0L until 500L).toSet)

    // positions dense 0..n-1 within each shard; shard ids in range
    e0.groupBy(_._2).foreach { case (shard, ss) =>
      assert(shard >= 0 && shard < 8)
      assert(ss.map(_._3) == (0L until ss.size.toLong).toSet,
        s"shard $shard positions not dense")
    }

    // a different seed is a different deal
    val seeded = Loader.epochShuffle(docs, "doc_id", 0, 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(seeded != e0)
  }
}
