package graft.queries

import graft.{QDef, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions.col

/** Dedup operators over `documents`. Exact dedup, exact n-gram Jaccard
  * and MinHash+LSH are DuckDB-oracle-checked (LSH verifies candidates
  * with exact Jaccard, and at the registered banding — 16 bands × 2
  * rows — the probability of missing a ≥0.8-Jaccard pair is < 1e-7,
  * so its output equals the exact pair set; DedupSpec asserts that
  * equality directly as well). SimHash has no DuckDB oracle (xxhash64
  * isn't reproducible there) but its pigeonhole blocking is
  * recall-complete, so DedupSpec checks it against a brute-force
  * Hamming scan.
  */
object DedupQueries {

  /** CTE chain ending in `pairs` (d1, d2, common, sz1, sz2, jaccard):
    * candidates from the (optionally df-capped) inverted shingle index,
    * exact verify via list_intersect on the full shingle sets —
    * mirroring Dedup.jaccardPairs / Dedup.minhashLshPairs exactly.
    * Shared between the pair oracles and the cluster oracle's
    * recursive closure.
    */
  private[queries] def jaccardCtes(threshold: Double, cap: Option[Long],
      src: String = "documents"): String = {
    val candSrc = cap match {
      case Some(c) =>
        s"""hot AS (
           |  SELECT s FROM sh GROUP BY s HAVING count(*) > $c
           |), f AS (
           |  SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
           |), cand AS (
           |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |  FROM f a JOIN f b ON a.s = b.s AND a.doc_id < b.doc_id
           |)""".stripMargin
      case None =>
        """cand AS (
          |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
          |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |)""".stripMargin
    }
    s"""w AS (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM $src
       |), shl AS (
       |  SELECT doc_id,
       |         CASE WHEN len(words) >= 3 THEN list_distinct(list_transform(
       |                generate_series(1, len(words) - 2),
       |                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
       |              ELSE [] END AS sh
       |  FROM w
       |), sh AS (
       |  SELECT doc_id, unnest(sh) AS s FROM shl
       |), $candSrc, scored AS (
       |  SELECT d1, d2,
       |         CAST(len(list_intersect(s1.sh, s2.sh)) AS BIGINT) AS common,
       |         CAST(len(s1.sh) AS BIGINT) AS sz1,
       |         CAST(len(s2.sh) AS BIGINT) AS sz2
       |  FROM cand
       |  JOIN shl s1 ON d1 = s1.doc_id
       |  JOIN shl s2 ON d2 = s2.doc_id
       |), pairs AS (
       |  SELECT d1, d2, common, sz1, sz2,
       |         CAST(common AS DOUBLE) / (sz1 + sz2 - common) AS jaccard
       |  FROM scored
       |  WHERE CAST(common AS DOUBLE) / (sz1 + sz2 - common) >= $threshold
       |)""".stripMargin
  }

  private def jaccardOracle(threshold: Double, cap: Option[Long]): String =
    s"""WITH ${jaccardCtes(threshold, cap)}
       |SELECT d1, d2, common, sz1, sz2, jaccard FROM pairs
       |ORDER BY d1, d2""".stripMargin

  /** Transitive closure of the near-dup pair graph as a recursive CTE:
    * every doc reaches every label in its component, min(label) is the
    * cluster id — the ground truth for Dedup.neardupClusters. */
  private[queries] def clusterCtes(threshold: Double, cap: Option[Long],
      src: String = "documents"): String =
    s"""${jaccardCtes(threshold, cap, src)},
       |nodes AS (SELECT DISTINCT doc_id AS doc FROM $src),
       |und AS (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION ALL
       |  SELECT d2, d1 FROM pairs
       |), reach(doc, label) AS (
       |  SELECT doc, doc FROM nodes
       |  UNION
       |  SELECT u.a, r.label FROM und u JOIN reach r ON r.doc = u.b
       |), comp AS (
       |  SELECT doc, min(label) AS cluster_id FROM reach GROUP BY doc
       |)""".stripMargin

  private def clusterOracle(threshold: Double, cap: Option[Long]): String =
    s"""WITH RECURSIVE ${clusterCtes(threshold, cap)}
       |SELECT doc, cluster_id,
       |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       |       doc = cluster_id AS is_canonical
       |FROM comp ORDER BY doc""".stripMargin

  def defs: Seq[QDef] = Seq(

    QDef(
      "d_exact_dedup",
      (s, dir) => Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(
        """SELECT doc_id, md5(text) AS content_md5,
          |       min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
          |       count(*) OVER (PARTITION BY md5(text)) AS n_copies,
          |       doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // Skew cap ON: stop-shingles (df > 100) are excluded from candidate
    // generation — the 100 TB guard against quadratic blowup on one hot
    // join key — while verification still scores full shingle sets.
    // The oracle applies the identical cap.
    QDef(
      "d_ngram_jaccard",
      (s, dir) => Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleDf = Some(100L))
        .orderBy(col("d1"), col("d2")),
      Some(jaccardOracle(0.8, Some(100L)))),

    QDef(
      "d_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8)
        .orderBy(col("d1"), col("d2")),
      Some(jaccardOracle(0.8, None))),

    // Incremental dedup-at-ingest, oracle-checked: the corpus arrives
    // in TWO increments (even doc_ids, then odd), each through
    // DedupStream.indexBatch against the versioned-lake index/docs
    // state the previous increment left behind. The union of emitted
    // pairs must equal the exact all-at-once Jaccard pair set — the
    // same ground truth d_minhash_lsh hashes against — so cross-
    // increment candidate generation, the candidate-bounded verify
    // re-read, and the banding's cross-batch comparability all land
    // in the hash. (Pair classes are disjoint by construction:
    // increment 1 emits even×even, increment 2 odd×anything.)
    QDef(
      "d_incremental_minhash",
      (s, dir) => {
        val out = Fixtures.dir("incremental_minhash", dir) { o =>
          val docs = Tables.documents(s, dir)
          val p1 = graft.streaming.DedupStream.indexBatch(
            docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
            s"$o/docs", s"$o/index", n = 3, threshold = 0.8,
            appendBatchId = Some(0L))
          val p2 = graft.streaming.DedupStream.indexBatch(
            docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text",
            s"$o/docs", s"$o/index", n = 3, threshold = 0.8,
            appendBatchId = Some(1L))
          p1.unionByName(p2).write.parquet(s"$o/pairs")
        }
        s.read.parquet(s"$out/pairs").orderBy(col("d1"), col("d2"))
      },
      Some(jaccardOracle(0.8, None))),

    // The PER-TICK COST gate, bench-visible by construction: the lakes
    // (4 corpus increments + 1 committed probe tick) are a cached
    // fixture, but the returned plan RE-DELIVERS the probe tick on
    // every call — watermark-guarded appends are no-ops, so each run
    // executes exactly one small tick's candidate generation, Bloom-
    // pruned state reads, and verify against a multi-increment lake.
    // That is the cost the bench tracks round-over-round (the batch
    // d_incremental_minhash gate's fixture caches its ticks, so it
    // times only a parquet read-back). The probe batch is a re-keyed
    // copy of every 37th document (ids shifted by 1e6), so the emitted
    // pair set — every near-dup pair a probe doc introduces, within
    // the probe and against all 4 earlier increments — is the exact
    // Jaccard pair set of the union corpus restricted to probe ids,
    // which DuckDB replays directly.
    QDef(
      "d_dedup_tick",
      (s, dir) => {
        def probe(docs: org.apache.spark.sql.DataFrame) =
          docs.filter(col("doc_id") % 37 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val lakes = Fixtures.dir("dedup_tick", dir) { o =>
          val docs = Tables.documents(s, dir)
          (0 until 4).foreach { t =>
            graft.streaming.DedupStream.indexBatch(
              docs.filter(col("doc_id") % 4 === t), "doc_id", "text",
              s"$o/docs", s"$o/index", n = 3, threshold = 0.8,
              appendBatchId = Some(t.toLong)).collect()
          }
          graft.streaming.DedupStream.indexBatch(
            probe(docs), "doc_id", "text",
            s"$o/docs", s"$o/index", n = 3, threshold = 0.8,
            appendBatchId = Some(4L)).collect()
        }
        graft.streaming.DedupStream.indexBatch(
          probe(Tables.documents(s, dir)), "doc_id", "text",
          s"$lakes/docs", s"$lakes/index", n = 3, threshold = 0.8,
          appendBatchId = Some(4L))
          .orderBy(col("d1"), col("d2"))
      },
      Some(
        s"""WITH u AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
           |  WHERE doc_id % 37 = 0
           |), ${jaccardCtes(0.8, None, src = "u")}
           |SELECT d1, d2, common, sz1, sz2, jaccard FROM pairs
           |WHERE d2 >= 1000000 ORDER BY d1, d2""".stripMargin)),

    // Pairs → transitive clusters → keeper per cluster: the step a
    // curation pipeline actually acts on. Oracle walks the same pair
    // graph with a recursive CTE.
    QDef(
      "d_neardup_clusters",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // total order at the gate edge — the operator itself returns
        // unordered rows (a global sort inside it would serialize the
        // mega-cluster case and every caller that doesn't need order)
        Dedup.neardupClusters(docs, "doc_id",
          Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8,
            maxShingleDf = Some(100L)))
          .orderBy(col("doc"))
      },
      Some(clusterOracle(0.8, Some(100L)))),

    // Oracle is the brute-force formulation over the SAME md5-nibble
    // simhash (pigeonhole blocking is recall-complete, so the blocked
    // Spark result must equal the all-pairs Hamming scan).
    QDef(
      "d_simhash",
      (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 7)
        .orderBy(col("d1"), col("d2")),
      Some(simhashOracle(7))),

    // Exact-substring dedup (Lee et al. 2022), keep-first: every
    // 15-gram's first (doc, pos) occurrence survives; later
    // occurrences' tokens are scrubbed. The gate hashes the FULL
    // scrubbed text plus removal accounting for all 500 docs — the
    // canonical-occurrence choice, position flagging, span merging,
    // and the higher-order token filter all land in the hash.
    QDef(
      "d_exact_substring",
      (s, dir) => Dedup.exactSubstringScrub(
        Tables.documents(s, dir), "doc_id", "text", L = 15)
        .orderBy(col("doc_id")),
      Some {
        val L = 15
        // The engine keys the canonical occurrence on
        // min(struct(doc_id, pos)); the oracle packs doc_id*1e9+pos,
        // which induces the IDENTICAL ordering on this table's small
        // numeric ids — the packing lives only here, where its domain
        // is known, not in the production operator.
        s"""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
           |), pos AS (
           |  SELECT doc_id, i - 1 AS p,
           |         array_to_string(list_slice(w, i, i + $L - 1), ' ') AS gram,
           |         doc_id * 1000000000 + (i - 1) AS okey
           |  FROM toks, UNNEST(generate_series(1, len(w) - $L + 1)) t(i)
           |  WHERE len(w) >= $L
           |), c AS (
           |  SELECT gram, min(okey) AS mk FROM pos GROUP BY gram
           |), fl AS (
           |  SELECT doc_id, list(p ORDER BY p) AS ds
           |  FROM (SELECT doc_id, p FROM pos JOIN c USING (gram) WHERE okey <> mk)
           |  GROUP BY doc_id
           |), joined AS (
           |  SELECT t.doc_id, t.w, coalesce(fl.ds, []) AS ds
           |  FROM toks t LEFT JOIN fl USING (doc_id)
           |), scrubbed AS (
           |  SELECT doc_id, w, ds,
           |         list_filter(w, (x, i) ->
           |           len(list_filter(ds, s -> s <= i - 1 AND i - 1 < s + $L)) = 0) AS keep
           |  FROM joined
           |)
           |SELECT doc_id,
           |       CAST(len(w) AS BIGINT) AS n_tokens,
           |       CAST(len(w) - len(keep) AS BIGINT) AS n_removed,
           |       CAST(len(list_filter(ds, (s, k) -> k = 1 OR ds[k - 1] < s - $L))
           |            AS BIGINT) AS n_spans,
           |       coalesce(array_to_string(keep, ' '), '') AS scrubbed_text
           |FROM scrubbed ORDER BY doc_id""".stripMargin
      })
  )

  /** DuckDB mirror of Dedup.simhash64 + an all-pairs Hamming scan:
    * md5-nibble per-bit votes (64 sum aggregates), sign → bit, hamming
    * = count of differing bits. */
  private def simhashOracle(maxHamming: Int): String = {
    val votes = (0 until 64).map { b =>
      val ni = 15 - b / 4
      s"sum(CASE WHEN ((instr('0123456789abcdef', substr(md, ${ni + 1}, 1)) - 1) >> ${b % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(",\n         ")
    val bits = (0 until 64).map(b => s"CASE WHEN v$b >= 0 THEN 1 ELSE 0 END AS b$b").mkString(",\n         ")
    val diff = (0 until 64).map(b => s"(CASE WHEN a.b$b <> b.b$b THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS md FROM documents
       |), votes AS (
       |  SELECT doc_id,
       |         $votes
       |  FROM toks GROUP BY doc_id
       |), bits AS (
       |  SELECT doc_id,
       |         $bits
       |  FROM votes
       |), pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2,
       |         CAST($diff AS BIGINT) AS hamming
       |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id
       |)
       |SELECT d1, d2, hamming FROM pairs
       |WHERE hamming <= $maxHamming
       |ORDER BY d1, d2""".stripMargin
  }
}
