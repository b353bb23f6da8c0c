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
