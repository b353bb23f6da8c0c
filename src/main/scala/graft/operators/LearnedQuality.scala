package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A LEARNED document-quality classifier — hashed-feature multinomial
  * Naive Bayes — the step from heuristic filtering (the Gopher rules
  * of x_quality_gopher) to a production curation stack, where a model
  * trained on labeled good/bad text scores the crawl.
  *
  * Everything is deterministic integer arithmetic so training AND
  * scoring replay bit-for-bit in any engine (the x_quality_learned
  * gate replays both in DuckDB SQL):
  *
  *  - features are word tokens hashed into `buckets` buckets by the
  *    md5 24-bit rule ([[graft.functions.HashRandom]]'s discipline —
  *    md5 is the one hash engines share);
  *  - log-probabilities use [[ilog2]], a ×1024 scaled integer log2
  *    (floor(log2 x) from the binary-string length, linear-interpolated
  *    within the octave by a division by a POWER OF TWO — exact in
  *    doubles, so no engine can disagree at a floor boundary; the
  *    same no-float-log discipline as Vocab.lmSurprise/unigramCost);
  *  - a bucket's weight is the Laplace-smoothed integer log-odds
  *    ilog2(cg+1) − ilog2(Ng+B) − ilog2(cb+1) + ilog2(Nb+B), a doc's
  *    score the sum of its tokens' weights plus the integer class
  *    prior, and the prediction is score > 0.
  *
  * Scale shape: training is one token-level hash aggregate into at
  * most `buckets` rows (the model is bucket-bounded METADATA, never
  * corpus-sized) plus two scalar total aggregates; scoring is a
  * broadcast join of the token stream against the model and one
  * per-doc hash aggregate. No shuffle keyed on anything bigger than
  * the bucket id; at 100 TB both passes are embarrassingly parallel.
  */
object LearnedQuality {

  /** Log-domain fixed-point scale: 1 bit of log2 = 1024. */
  val Scale = 1024L

  /** md5-derived 24-bit integer of a string key, mod `buckets` — the
    * cross-engine feature hash. */
  def mdBucket(key: Column, buckets: Int): Column = {
    val md = md5(key)
    val nibs = (1 to 6).map { i =>
      val c = ascii(substring(md, i, 1))
      when(c <= 57, c - 48).otherwise(c - 87) // '0'-'9' → 0-9, 'a'-'f' → 10-15
    }
    pmod(nibs.reduce((a, b) => a * 16 + b).cast("long"), lit(buckets.toLong))
  }

  /** Scaled integer log2 (×[[Scale]]) of a positive integral column:
    * f·1024 + (x·1024) div 2^f − 1024 with f = floor(log2 x) read off
    * the binary-string length. The division is by a power of two and
    * x·1024 < 2^53, so the double arithmetic is EXACT — DuckDB's
    * integer `//` replays it bit for bit. (`conv`, not the builtin
    * `bin`: the Timestream dialect registers a session UDF named
    * `bin(ts, width)` that shadows the builtin by name, and this
    * expression must work in a session with the dialect loaded.) */
  def ilog2(x: Column): Column = {
    val f = (length(conv(x.cast("string"), 10, 2)) - 1).cast("long")
    val p = pow(lit(2.0), f.cast("double"))
    f * lit(Scale) +
      floor(x.cast("double") * lit(1024.0) / p).cast("long") - lit(Scale)
  }

  /** Driver-side twin of [[ilog2]] for model scalars. */
  def ilog2Long(x: Long): Long = {
    require(x >= 1, s"ilog2 needs x >= 1, got $x")
    val f = 63 - java.lang.Long.numberOfLeadingZeros(x)
    f * Scale + (x * 1024L >> f) - Scale
  }

  /** A trained model: per-bucket integer log-odds (at most `buckets`
    * rows — broadcast-sized metadata), the integer class prior
    * ilog2(goodDocs) − ilog2(badDocs), and the unseen-bucket weight
    * `w0` (the smoothed log-odds of a bucket with zero count in both
    * classes — what a token unseen in training contributes). */
  final case class NaiveBayesModel(weights: DataFrame, prior: Long,
      w0: Long, buckets: Int)

  /** Train on (id, text, label): one token-level aggregate into
    * ≤ `buckets` weight rows plus two scalar totals. Fails loudly on a
    * degenerate corpus (a class with no documents has no odds). */
  def train(docs: DataFrame, id: String, text: String, label: Column,
      buckets: Int = 256): NaiveBayesModel = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val lab = docs.select(col(id).as("doc_id"), label.as("good"),
      col(text).as("t"))
    val tok = lab.select(col("good"), explode(split(col("t"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    // persisted: the totals action below and the weights projection
    // both consume this ≤`buckets`-row aggregate — without the persist
    // the token-level corpus scan runs twice
    val cnt = graft.CacheRegistry.retain(
      tok.select(mdBucket(col("tok"), buckets).as("b"), col("good"))
        .groupBy(col("b")).agg(
          sum(when(col("good"), 1L).otherwise(0L)).as("cg"),
          sum(when(!col("good"), 1L).otherwise(0L)).as("cb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val t = cnt.agg(coalesce(sum("cg"), lit(0L)).as("ng"),
      coalesce(sum("cb"), lit(0L)).as("nb")).head()
    val (ng, nb) = (t.getLong(0), t.getLong(1))
    val d = lab.agg(sum(when(col("good"), 1L).otherwise(0L)).as("dg"),
      sum(when(!col("good"), 1L).otherwise(0L)).as("db")).head()
    val (dg, db) = (d.getLong(0), d.getLong(1))
    require(dg > 0 && db > 0,
      s"degenerate training corpus: $dg good docs, $db bad docs")
    val weights = cnt.select(col("b"),
      (ilog2(col("cg") + lit(1L)) - lit(ilog2Long(ng + buckets)) -
        ilog2(col("cb") + lit(1L)) + lit(ilog2Long(nb + buckets))).as("w"))
    NaiveBayesModel(weights, ilog2Long(dg) - ilog2Long(db),
      ilog2Long(nb + buckets) - ilog2Long(ng + buckets), buckets)
  }

  /** Score documents under a trained model: (doc_id, n_toks, score,
    * pred). A doc with no tokens scores the bare prior. */
  def score(model: NaiveBayesModel, docs: DataFrame, id: String,
      text: String): DataFrame = {
    val tok = docs.select(col(id).as("doc_id"),
      explode(split(col(text), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val perDoc = tok
      .select(col("doc_id"), mdBucket(col("tok"), model.buckets).as("b"))
      .join(broadcast(model.weights), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("w"), lit(model.w0))).as("sw"))
    docs.select(col(id).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        (lit(model.prior) + coalesce(col("sw"), lit(0L))).as("score"))
      .withColumn("pred", col("score") > 0)
  }

  /** The [[ilog2]] arithmetic as a DuckDB SQL fragment over an
    * integral expression — shared by the gate oracle so the replay is
    * the same formula, not a reimplementation. */
  def ilog2Sql(x: String): String =
    s"((len(bin(CAST(($x) AS BIGINT)))-1) * 1024 + " +
      s"(CAST(($x) AS BIGINT) * 1024) // " +
      s"CAST(power(2, len(bin(CAST(($x) AS BIGINT)))-1) AS BIGINT) - 1024)"

  /** The [[mdBucket]] hash as a DuckDB SQL fragment. */
  def mdBucketSql(key: String, buckets: Int): String = {
    val md = s"md5($key)"
    val nibs = (1 to 6).map { k =>
      s"(CASE WHEN ascii(substr($md, $k, 1)) <= 57" +
        s" THEN ascii(substr($md, $k, 1)) - 48" +
        s" ELSE ascii(substr($md, $k, 1)) - 87 END)"
    }
    s"(CAST(${nibs.reduce((a, b) => s"(($a) * 16 + $b)")} AS BIGINT) % $buckets)"
  }
}
