package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus, one pass, no shuffle of the corpus itself.
  * Scale path: random-hyperplane LSH — each vector gets a compact
  * bucket signature; candidates come from bucket equi-joins, so the
  * corpus-side work is a hash join instead of a cross product. Both
  * use the same sequential-fold dot product (deterministic summation
  * order, mirrored in the DuckDB oracles).
  */
object Similarity {

  /** Sequential left-fold dot product of two double arrays —
    * deterministic accumulation order (parity with list_reduce). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cast float embedding to double once. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded). Query side is broadcast — the
    * corpus is scanned exactly once regardless of cluster size.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(id).as("neighbor_id"), asDouble(col(vec)).as("nv"))
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cos"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        (floor(col("cos") * 10000 + lit(0.5)) / 10000.0).as("cos_r4"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup). Brute
    * self-join at test scale; the LSH path below is the scale variant.
    */
  def cosineNearDupPairs(df: DataFrame, id: String, vec: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(id).as("doc"), asDouble(col(vec)).as("v"))
    v.as("a").join(v.as("b"), col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("d1"), col("d2"), (floor(col("cos") * 10000 + lit(0.5)) / 10000.0).as("cos_r4"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Random-hyperplane LSH bucket signatures, `tables` independent
    * hash tables of `nbits` sign bits each → rows (doc, table, bucket).
    * Hyperplanes are a tiny broadcast DataFrame — the corpus is scanned
    * once and never replicated; per-table buckets come out of one
    * groupBy over (doc, table).
    */
  def hyperplaneBuckets(df: DataFrame, id: String, vec: String, nbits: Int,
      tables: Int, dim: Int, seed: Long = 7L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = for (t <- 0 until tables; p <- 0 until nbits)
      yield (t, p, Array.fill(dim)(rnd.nextGaussian()))
    val spark = df.sparkSession
    import spark.implicits._
    val planesDf = planes.toDF("table_id", "plane_id", "w")
    df.select(col(id).as("doc"), asDouble(col(vec)).as("v"))
      .crossJoin(broadcast(planesDf))
      .withColumn("bit", when(dot(col("v"), col("w")) >= 0, lit(1L)).otherwise(lit(0L)))
      .groupBy(col("doc"), col("table_id"))
      // bit << plane_id via exact power-of-two arithmetic (nbits ≤ 32)
      .agg(sum(col("bit") * pow(lit(2.0), col("plane_id"))).cast("long").as("bucket"))
  }

  /** ANN top-k via multi-table LSH: candidates share the query's bucket
    * in ANY of the `tables` hash tables (union via dropDuplicates), then
    * exact cosine ranks the candidate set. Recall grows with `tables`,
    * candidate cost with 1/2^nbits; verified against brute force in
    * SimilaritySpec.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, nbits: Int, tables: Int, dim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = hyperplaneBuckets(corpus, id, vec, nbits, tables, dim)
      .withColumnRenamed("doc", "neighbor_id")
    val qb = hyperplaneBuckets(queries, id, vec, nbits, tables, dim)
      .withColumnRenamed("doc", "query_id")
    val cands = cb.join(broadcast(qb), Seq("table_id", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val withVecs = cands
      .join(corpus.select(col(id).as("neighbor_id"), asDouble(col(vec)).as("nv")), "neighbor_id")
      .join(broadcast(queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))), "query_id")
    withVecs
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cos"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        (floor(col("cos") * 10000 + lit(0.5)) / 10000.0).as("cos_r4"))
      .orderBy(col("query_id"), col("rank"))
  }
}
