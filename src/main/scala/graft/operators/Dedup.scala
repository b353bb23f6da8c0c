package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation: exact
  * (content hash), exact n-gram Jaccard (inverted shingle index),
  * MinHash+LSH (band-bucketed candidate generation with exact verify),
  * and 64-bit SimHash with pigeonhole chunk blocking.
  *
  * Scale shape: everything is explode → hash-partition joins/aggs —
  * no driver-side loops, no per-key unbounded state. The pair-candidate
  * joins key on (shingle) / (band hash) / (simhash chunk), which at
  * corpus scale is the standard inverted-index layout; ultra-frequent
  * blocking keys are the skew risk and get a frequency cap.
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column (array<string>).
    * Empty array when the text has fewer than n words.
    */
  def shingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    val grams = transform(
      sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))
    array_distinct(when(size(w) >= n, grams).otherwise(array()))
  }

  /** Exact dedup annotation: every row keeps its content hash, the
    * canonical (minimum) id of its duplicate group, and the group size.
    */
  def exactDedup(df: DataFrame, id: String, text: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("content_md5"))
    df.select(col(id), md5(col(text)).as("content_md5"))
      .withColumn("keeper_id", min(col(id)).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("is_canonical", (col(id) === col("keeper_id")).cast("boolean"))
      .orderBy(col(id))
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    * explode shingles → self-equi-join on shingle → common counts →
    * jaccard = common / (|A| + |B| - common) ≥ threshold.
    *
    * `maxShingleDf` drops blocking shingles that occur in more than
    * that many documents (stop-shingles): they generate quadratic
    * candidate pairs while carrying no discriminative signal. Off by
    * default to stay oracle-exact at test scale.
    */
  def jaccardPairs(df: DataFrame, id: String, text: String, n: Int,
      threshold: Double, maxShingleDf: Option[Long] = None): DataFrame = {
    val sh = df.select(col(id).as("doc"), explode(shingles(col(text), n)).as("s"))
    val filtered = maxShingleDf match {
      case Some(cap) =>
        val hot = sh.groupBy(col("s")).count().filter(col("count") > cap).select(col("s"))
        sh.join(hot, Seq("s"), "left_anti")
      case None => sh
    }
    val sizes = df.select(col(id).as("doc"), size(shingles(col(text), n)).cast("long").as("sz"))
    val common = filtered.as("a")
      .join(filtered.as("b"), col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc", "d2").withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard", col("common").cast("double") / (col("sz1") + col("sz2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("common"), col("sz1"), col("sz2"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  private val MinhashPrime = 1000000007L

  /** MinHash signature (array<long>, length numPerm) over word n-gram
    * shingles. Permutations are (a_k * h + b_k) mod p over xxhash64
    * shingle hashes reduced mod p; constants from a fixed seed so runs
    * are reproducible.
    */
  def minhashSignature(text: Column, n: Int, numPerm: Int): Column = {
    val rnd = new scala.util.Random(42)
    val ab = Seq.fill(numPerm)((1 + rnd.nextLong(MinhashPrime - 1), rnd.nextLong(MinhashPrime)))
    val hs = transform(shingles(text, n), s => pmod(xxhash64(s), lit(MinhashPrime)))
    array(ab.map { case (a, b) =>
      array_min(transform(hs, h => pmod(h * a + b, lit(MinhashPrime))))
    }: _*)
  }

  /** MinHash+LSH near-dup pairs: signatures → `bands` bands of
    * numPerm/bands rows hashed to a bucket → candidate pairs sharing a
    * bucket → exact Jaccard verify ≥ threshold (so precision is exact;
    * only recall depends on the banding).
    */
  def minhashLshPairs(df: DataFrame, id: String, text: String, n: Int,
      threshold: Double, numPerm: Int = 32, bands: Int = 16): DataFrame = {
    val r = numPerm / bands
    val docs = df.select(col(id).as("doc"), shingles(col(text), n).as("sh"),
      minhashSignature(col(text), n, numPerm).as("sig"))
      .filter(size(col("sh")) > 0)

    val banded = docs.select(col("doc"), col("sh"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64((0 until r).map(k => element_at(col("sig"), b * r + k + 1)) :+ b: _*))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"),
        col("a.sh").as("sh1"), col("b.sh").as("sh2"))
      .dropDuplicates("d1", "d2")

    cands
      .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("sz1", size(col("sh1")).cast("long"))
      .withColumn("sz2", size(col("sh2")).cast("long"))
      .withColumn("jaccard", col("common").cast("double") / (col("sz1") + col("sz2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("common"), col("sz1"), col("sz2"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** 64-bit SimHash over word tokens: per-bit ±1 vote weighted by each
    * token's xxhash64 bit, sign → bit. Pure higher-order expressions.
    * Takes a column NAME (spliced into a SQL expression).
    */
  def simhash64(textCol: String): Column = expr(
    s"""aggregate(
       |  transform(split($textCol, ' '), w -> xxhash64(w)),
       |  array_repeat(0L, 64),
       |  (acc, h) -> zip_with(acc, sequence(0, 63),
       |                (a, b) -> a + CASE WHEN (shiftright(h, cast(b as int)) & 1) = 1 THEN 1 ELSE -1 END),
       |  acc -> aggregate(zip_with(acc, sequence(0, 63),
       |                     (c, b) -> CASE WHEN c >= 0 THEN shiftleft(1L, cast(b as int)) ELSE 0L END),
       |                   0L, (x, y) -> x | y))""".stripMargin)

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, blocked
    * by the pigeonhole principle: split the 64-bit hash into
    * maxHamming+1 chunks — near pairs must agree exactly on at least
    * one chunk, so candidates come from equi-joins on (chunk index,
    * chunk value) instead of a cross join.
    */
  def simhashPairs(df: DataFrame, id: String, text: String, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val hashed = df.select(col(id).as("doc"), simhash64(text).as("h"))
    val mask = (1L << bitsPer) - 1
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"), shiftright(col("h"), c * bitsPer).bitwiseAND(lit(mask)).as("cv"))
    }
    val chunked = hashed
      .select(col("doc"), col("h"), explode(array(chunkCols: _*)).as("ck"))
      .select(col("doc"), col("h"), col("ck.chunk").as("chunk"), col("ck.cv").as("cv"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"),
        col("a.h").as("h1"), col("b.h").as("h2"))
      .dropDuplicates("d1", "d2")
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy(col("d1"), col("d2"))
  }
}
