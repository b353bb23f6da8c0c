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
}
