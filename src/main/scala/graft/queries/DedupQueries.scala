package graft.queries

import graft.{QDef, Tables}
import graft.operators.Dedup

/** Dedup operators over `documents`. Exact dedup and exact n-gram
  * Jaccard are DuckDB-oracle-checked; MinHash+LSH and SimHash are
  * rows-only for the driver (their hash families aren't reproducible
  * in DuckDB SQL) and instead verified in DedupSpec: the LSH pair set
  * must equal the exact Jaccard pair set at test scale, and SimHash
  * must pair the corpus's injected near-duplicates.
  */
object DedupQueries {

  def defs: Seq[QDef] = Seq(

    QDef(
      "d_exact_dedup",
      (s, dir) => Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text"),
      Some(
        """SELECT doc_id, md5(text) AS content_md5,
          |       min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
          |       count(*) OVER (PARTITION BY md5(text)) AS n_copies,
          |       doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
          |FROM documents ORDER BY doc_id""".stripMargin)),

    QDef(
      "d_ngram_jaccard",
      (s, dir) => Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8),
      Some(
        """WITH w AS (
          |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
          |), shl AS (
          |  SELECT doc_id,
          |         CASE WHEN len(words) >= 3 THEN list_distinct(list_transform(
          |                generate_series(1, len(words) - 2),
          |                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
          |              ELSE [] END AS sh
          |  FROM w
          |), sh AS (
          |  SELECT doc_id, unnest(sh) AS s FROM shl
          |), sizes AS (
          |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS sz FROM shl
          |), pairs AS (
          |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
          |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2
          |)
          |SELECT d1, d2, common, s1.sz AS sz1, s2.sz AS sz2,
          |       CAST(common AS DOUBLE) / (s1.sz + s2.sz - common) AS jaccard
          |FROM pairs
          |JOIN sizes s1 ON d1 = s1.doc_id
          |JOIN sizes s2 ON d2 = s2.doc_id
          |WHERE CAST(common AS DOUBLE) / (s1.sz + s2.sz - common) >= 0.8
          |ORDER BY d1, d2""".stripMargin)),

    QDef(
      "d_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8),
      None), // verified in DedupSpec against the exact pair set

    QDef(
      "d_simhash",
      (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 7),
      None) // verified in DedupSpec (near-dup coverage + hamming bound)
  )
}
