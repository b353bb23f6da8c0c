package graft.queries

import graft.{QDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (array<float>, 64-dim). The
  * brute-force paths are DuckDB-oracle-checked with a sequential-fold
  * dot product on both sides (deterministic summation order); the LSH
  * ANN path is rows-only and recall-tested in SimilaritySpec.
  */
object SimilarityQueries {

  /** Shared DuckDB cosine: left-fold sum over an explicit index list,
    * mirroring Similarity.dot exactly. */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, 64), i -> $a[i] * $b[i])), (x, y) -> x + y)
       |  / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, 64), i -> $a[i] * $a[i])), (x, y) -> x + y))
       |   * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, 64), i -> $b[i] * $b[i])), (x, y) -> x + y)))""".stripMargin

  def defs: Seq[QDef] = Seq(

    QDef(
      "s_cosine_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      },
      Some(
        s"""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
           |), q AS (
           |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5
           |), scored AS (
           |  SELECT query_id, e.vec_id AS neighbor_id,
           |         ${cosSql("qv", "v").replace("\n", "\n    ")} AS cos
           |  FROM q JOIN e ON e.vec_id <> q.query_id
           |), ranked AS (
           |  SELECT query_id, neighbor_id, cos,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM scored
           |)
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
           |       floor(cos * 10000 + 0.5) / 10000.0 AS cos_r4
           |FROM ranked WHERE rank <= 10
           |ORDER BY query_id, rank""".stripMargin)),

    QDef(
      "s_embedding_neardup",
      (s, dir) => Similarity.cosineNearDupPairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.4),
      Some(
        s"""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
           |), pairs AS (
           |  SELECT a.vec_id AS d1, b.vec_id AS d2,
           |         ${cosSql("a.v", "b.v").replace("\n", "\n    ")} AS cos
           |  FROM e a JOIN e b ON a.vec_id < b.vec_id
           |)
           |SELECT d1, d2, floor(cos * 10000 + 0.5) / 10000.0 AS cos_r4
           |FROM pairs WHERE cos >= 0.4
           |ORDER BY d1, d2""".stripMargin)),

    QDef(
      "s_ann_lsh_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.annTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nbits = 6, tables = 8, dim = 64)
      },
      None) // recall vs brute force asserted in SimilaritySpec
  )
}
