package graft

import org.apache.spark.sql.functions._
import graft.operators.LearnedQuality

/** The learned quality classifier: closed-form agreement of the column
  * and scalar integer-log2 forms, genuine separation on disjoint
  * vocabularies, the unseen-token path, and the loud degenerate-corpus
  * refusal.
  */
class LearnedQualitySpec extends SparkSpec {

  test("column ilog2 equals the driver-side scalar for 1..5000") {
    import spark.implicits._
    val got = (1L to 5000L).toDF("x")
      .select(col("x"), LearnedQuality.ilog2(col("x")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 5000L).foreach { x =>
      assert(got(x) == LearnedQuality.ilog2Long(x), s"x=$x")
    }
    // anchors: exact powers of two hit f*1024 exactly
    assert(LearnedQuality.ilog2Long(1) == 0L)
    assert(LearnedQuality.ilog2Long(2) == 1024L)
    assert(LearnedQuality.ilog2Long(1024) == 10240L)
  }

  test("disjoint vocabularies separate perfectly; scores are reproducible") {
    import spark.implicits._
    val good = (0 until 10).map(i => (i.toLong, "apple banana cherry date elder fig", true))
    val bad = (10 until 20).map(i => (i.toLong, "rock metal dust gravel shale slate", false))
    val docs = (good ++ bad).toDF("doc_id", "text", "lab")
    val model = LearnedQuality.train(docs, "doc_id", "text", col("lab"))
    // balanced classes: zero prior
    assert(model.prior == 0L)
    val scored = LearnedQuality.score(model, docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lab")), Seq("doc_id"))
      .collect()
    scored.foreach { r =>
      assert(r.getAs[Boolean]("pred") == r.getAs[Boolean]("lab"),
        s"doc ${r.getAs[Long]("doc_id")} score ${r.getAs[Long]("score")}")
    }
    // retraining yields the identical model (pure functions of input)
    val again = LearnedQuality.train(docs, "doc_id", "text", col("lab"))
    assert(again.prior == model.prior && again.w0 == model.w0)
    assert(again.weights.collect().map(_.toSeq).toSet ==
      model.weights.collect().map(_.toSeq).toSet)
  }

  test("unseen tokens contribute exactly w0; empty docs score the bare prior") {
    import spark.implicits._
    val train = Seq((1L, "aa bb cc", true), (2L, "dd ee ff", false),
      (3L, "aa bb", true)).toDF("doc_id", "text", "lab")
    val model = LearnedQuality.train(train, "doc_id", "text", col("lab"))
    val probe = Seq((100L, "zz-novel-1 zz-novel-2"), (101L, "")).toDF("doc_id", "text")
    val got = LearnedQuality.score(model, probe, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // NOTE: a novel token's BUCKET may collide with a trained one
    // (256 buckets); these two spellings were checked not to
    assert(got(100L) == ((2L, model.prior + 2 * model.w0)), got.toString)
    assert(got(101L) == ((0L, model.prior)), got.toString)
  }

  test("a single-class corpus is refused loudly") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb", true), (2L, "cc", true)).toDF("doc_id", "text", "lab")
    intercept[IllegalArgumentException] {
      LearnedQuality.train(docs, "doc_id", "text", col("lab"))
    }
  }
}
