package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The multimodal plumbing must be deterministic and partition-count
  * invariant (the mapPartitions codec shape cannot leak batch
  * boundaries into results), with stable schema.
  */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.asMedia(
    Tables.documents(spark, sf("sf0.001")).limit(100), "doc_id", "text")

  test("asMedia produces binary payload + typed metadata") {
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.schema("mime").dataType.typeName == "string")
    assert(m.count() == 100)
  }

  test("decode is deterministic and partition-count invariant") {
    val d1 = Multimodal.decode(media.repartition(1)).collect().sortBy(_.media_id)
    val d4 = Multimodal.decode(media.repartition(7)).collect().sortBy(_.media_id)
    assert(d1.length == d4.length)
    d1.zip(d4).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.width == b.width && a.height == b.height)
      assert(a.features.toSeq == b.features.toSeq)
    }
    assert(d1.forall(_.features.length == Multimodal.FeatureDim))
    assert(d1.forall(d => d.width > 0 && d.height > 0 && d.n_frames > 0))
  }

  test("resizeToFit preserves aspect ratio within a bounding box") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resizeToFit(decoded, maxSide = 128).collect()
    assert(resized.forall(r => r.getAs[Int]("width") <= 128 && r.getAs[Int]("height") <= 128))
    // scaling never enlarges (den = max(width, height, maxSide))
    val orig = decoded.collect().map(d => d.media_id -> d).toMap
    resized.foreach { r =>
      val o = orig(r.getAs[Long]("media_id"))
      assert(r.getAs[Int]("width") <= o.width && r.getAs[Int]("height") <= o.height)
    }
  }

  test("sampleFrames keeps every stride-th frame index") {
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, stride = 3)
    val rows = frames.collect()
    assert(rows.forall(_.getAs[Int]("frame_idx") % 3 == 0))
    val perDoc = rows.groupBy(_.getAs[Long]("media_id"))
    val nFrames = decoded.collect().map(d => d.media_id -> d.n_frames).toMap
    perDoc.foreach { case (id, rs) =>
      assert(rs.length == (nFrames(id) + 2) / 3) // ceil(n/3)
    }
  }
}
