package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: image /
  * audio / video payloads are opaque BINARY columns plus typed
  * metadata, processed with per-partition batch iteration.
  *
  * The Spark-side design is real and tested — schema, encoders, the
  * mapPartitions batch shape (one codec init per partition, rows
  * streamed through it), partition-count-invariant results. The codec
  * itself is a clearly-marked deterministic STUB: this environment has
  * no image/audio libraries, so `stubDecode` stands in for e.g. a JPEG
  * decoder + feature extractor. Swapping in a real codec changes ONE
  * function body and nothing about the distributed plan.
  */
object Multimodal {

  /** Decoded media record: dimensions, a fixed-size feature vector, and
    * the payload content hash (provenance/dedup key in a real pipeline). */
  final case class Decoded(
      media_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      content_hash: Long,
      features: Array[Float])

  val FeatureDim = 16

  /** Wrap an id+text corpus as deterministic fake media rows
    * (media_id, payload BINARY, mime STRING) — the at-rest shape a
    * crawler would land: opaque bytes + a type tag.
    */
  def asMedia(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      encode(col(text), "utf-8").as("payload"),
      concat(lit("image/fake-"), (col(id) % 3).cast("string")).as("mime"))

  /** STUB CODEC — deterministic pure function of the payload bytes.
    * A real integration decodes the image/audio here; everything else
    * in this file is the production plumbing. The rolling hash is
    * modular (never overflows a signed 64-bit value), so the decode is
    * reproducible in plain SQL and x_multimodal_decode can be
    * oracle-checked.
    */
  private[operators] def stubDecode(payload: Array[Byte]): (Int, Int, Int, Long, Array[Float]) = {
    var h = 0L // rolling hash: h = (h*31 + byte) mod 1e9+7
    var i = 0
    while (i < payload.length) { h = (h * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    val width = ((h % 64) + 1).toInt * 16
    val height = (((h >> 8) % 64) + 1).toInt * 16
    val nFrames = (((h >> 16) % 10) + 1).toInt
    val features = Array.tabulate(FeatureDim) { k =>
      ((h >> (k * 3)) & 0xff).toFloat / 255f
    }
    (width, height, nFrames, h, features)
  }

  /** Batch decode: mapPartitions over (media_id, payload) so a real
    * codec pays its initialization once per partition and streams rows
    * — the standard shape for vectorized decode at 100 TB (no
    * collect, no per-row setup, arbitrary partition counts).
    */
  def decode(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codec: init decoder/context HERE, once per partition
        rows.map { case (id, payload) =>
          val (w, h, f, hash, feat) = stubDecode(payload)
          Decoded(id, w, h, f, hash, feat)
        }
      }
  }

  /** Resize metadata transform (pure column math over decoded rows):
    * scales dimensions to fit a bounding box, preserving aspect ratio
    * via integer arithmetic. A real pipeline would re-encode pixels in
    * the same mapPartitions pass; the planning shape is identical.
    */
  def resizeToFit(decoded: Dataset[Decoded], maxSide: Int): DataFrame =
    decoded.toDF()
      .withColumn("_scale_num", lit(maxSide))
      .withColumn("_scale_den", greatest(col("width"), col("height"), lit(maxSide)))
      .select(
        col("media_id"),
        (col("width") * col("_scale_num") / col("_scale_den")).cast("int").as("width"),
        (col("height") * col("_scale_num") / col("_scale_den")).cast("int").as("height"),
        col("n_frames"),
        col("features"))

  /** Frame sampling for video-like payloads: keep every `stride`-th
    * frame index — one output row per sampled frame (posexplode), the
    * fan-out shape frame-level training data needs.
    */
  def sampleFrames(decoded: Dataset[Decoded], stride: Int): DataFrame =
    decoded.toDF()
      .select(col("media_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)))
      .filter(col("pos") % stride === 0)
      .select(col("media_id"), col("col").as("frame_idx"), col("n_frames"))
}
