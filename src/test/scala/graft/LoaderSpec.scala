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
