package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus: inverted-index postings
  * and BM25 top-k ranking — the search half a curation pipeline needs
  * next to embedding similarity (query-set retrieval for
  * decontamination review, nearest-lexical-neighbor audits, corpus
  * exploration).
  *
  * Scale shape (per query):
  *  - the corpus-sized pass is ONE projection + explode filtered to
  *    the query's terms — the `isin` predicate prunes the token
  *    stream before any shuffle, so the postings that survive are
  *    bounded by documents-containing-query-terms, not the corpus;
  *  - document-frequency and corpus statistics are query-term-sized
  *    and 1-row aggregates, joined back by broadcast (the scalar-join
  *    idiom);
  *  - the final ranking is `ORDER BY ... LIMIT k` — Catalyst's
  *    TakeOrderedAndProject, never a global sort.
  *
  * Engine-parity discipline: BM25's idf is a logarithm, which is NOT
  * bit-portable across engines (libm vs fdlibm last-ulp differences).
  * The gate therefore hashes RANKS and integer evidence columns
  * (matched terms, summed tf, doc length) — mathematically distinct
  * scores differ by far more than one ulp, and mathematically EQUAL
  * scores tie-break deterministically on doc_id in both engines — and
  * the float score itself stays out of the hashed output.
  * TextSearchSpec pins the scoring behavior (tf monotonicity, length
  * normalization, idf ordering) in-JVM.
  */
object TextSearch {

  /** Inverted-index postings: one row per (term, doc_id) with the term
    * frequency — the classic build, a single hash aggregate. */
  def invertedIndex(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("doc_id"),
      explode(split(col(text), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-k documents for a bag-of-words query. Output: rank
    * (1-based, dense by construction), doc_id, matched_terms,
    * total_tf, dl — ties in score break on doc_id ascending.
    * `k1`/`b` are the standard Robertson parameters; idf is the
    * always-positive BM25+ form ln(1 + (N - df + 0.5)/(df + 0.5)). */
  def bm25TopK(docs: DataFrame, id: String, text: String,
      query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25TopK needs at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = query.distinct
    val toks = docs.select(col(id).as("doc_id"), split(col(text), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
    // postings restricted to the query's terms BEFORE any shuffle
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // query-term-sized document frequencies; 1-row corpus stats
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.select(size(split(col(text), " ")).as("dl0"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl0")).as("avgdl"))
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"), col("dl"))
      .agg(sum(col("w")).as("score"),
        count(lit(1)).as("matched_terms"),
        sum(col("tf")).as("total_tf"))
    // TakeOrderedAndProject does the top-k; the rank window then runs
    // over k rows only (single tiny partition — not a scale concern)
    val top = scored.orderBy(desc("score"), col("doc_id")).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(desc("score"), col("doc_id"))))
      .select(col("rank").cast("long").as("rank"), col("doc_id"),
        col("matched_terms"), col("total_tf"), col("dl").cast("long").as("dl"))
  }

  /** BM25 top-k for a QUERY TABLE — the pipeline shape of retrieval
    * (ranking thousands of benchmark prompts against the corpus for
    * decontamination review), where [[bm25TopK]]'s one-literal-query
    * `isin` form would mean one corpus pass per query.
    *
    * One corpus pass for ALL queries:
    *  - the union of every query's terms (query-table-sized) is
    *    broadcast and semi-joins the token stream, so the only
    *    corpus-sized shuffle is the per-(doc, term) tf aggregate —
    *    its size is independent of how many queries share a term;
    *  - the per-query fan-out happens AFTER that aggregate, on the
    *    postings that survived pruning, via a broadcast join against
    *    the (query, term) table;
    *  - per-query top-k is the two-phase group-limit ([[
    *    graft.operators.Curation.capPerGroup]]'s pattern): a bucketed
    *    window bounds any single task at k·buckets rows even when one
    *    query matches the whole corpus, then the per-query window
    *    ranks the pruned survivors.
    *
    * Output: (query_id, rank, doc_id, matched_terms, total_tf, dl) —
    * the same log-free hash discipline as [[bm25TopK]] (ranks and
    * integer evidence; the float score never leaves the plan). */
  def bm25TopKBatch(docs: DataFrame, id: String, text: String,
      queries: DataFrame, qid: String, qtext: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75, bucketChars: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qterms = queries
      .select(col(qid).as("query_id"),
        explode(split(col(qtext), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val allTerms = qterms.select(col("term")).distinct()
    val toks = docs.select(col(id).as("doc_id"), split(col(text), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
    // the ONE corpus-sized aggregate: per-(doc, term) tf over the
    // pruned token stream — query count never touches its size.
    // Persisted: both the document-frequency build side and the
    // scoring stream consume it, and nothing else reuses the exchange
    val tf = graft.CacheRegistry.retain(
      toks.join(broadcast(allTerms), "term")
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.select(size(split(col(text), " ")).as("dl0"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl0")).as("avgdl"))
    val scored = tf
      .join(broadcast(qterms), "term") // per-query fan-out, post-aggregate
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"), col("dl"))
      .agg(sum(col("w")).as("score"),
        count(lit(1)).as("matched_terms"),
        sum(col("tf")).as("total_tf"))
    rankTopKPerQuery(scored, k, bucketChars)
  }

  /** Two-phase per-query group-limit over a (query_id, doc_id, dl,
    * score, matched_terms, total_tf) frame: a bucketed prune bounds
    * every task, then the per-query rank runs over <= k *
    * 16^bucketChars rows. Shared by the one-shot batch form and the
    * postings-lake batch form so both rank identically. */
  private[graft] def rankTopKPerQuery(scored: DataFrame, k: Int,
      bucketChars: Int): DataFrame = {
    val bucket = substring(md5(concat(lit("bm25:"), col("doc_id").cast("string"))),
      1, bucketChars)
    val pruned = scored
      .withColumn("_pn", row_number().over(
        Window.partitionBy(col("query_id"), bucket)
          .orderBy(desc("score"), col("doc_id"))))
      .filter(col("_pn") <= k)
    pruned
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("score"), col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("matched_terms"), col("total_tf"),
        col("dl").cast("long").as("dl"))
  }

  /** Reciprocal-rank fusion (the Cormack–Clarke–Büttcher combiner) of
    * two per-query rankings — the standard HYBRID-retrieval step that
    * merges a lexical arm (BM25) with a vector arm (embedding top-k):
    * score(d) = Σ_arms 1/(c + rank_arm(d)), a missing arm contributes
    * 0, re-ranked by (score desc, doc_id).
    *
    * Engine-parity note: unlike the arms' own scores (log idf, float
    * dot products), RRF scores are sums of reciprocals of SMALL
    * INTEGERS — each term is one correctly-rounded IEEE division, so
    * any engine computes the identical doubles and the fused ranking
    * is hash-portable end to end. The per-arm source ranks ride along
    * as integer evidence (0 = not retrieved by that arm).
    *
    * Inputs need (query_id, rank, doc_id); extra columns are ignored.
    * Scale: each query's fused candidate set is bounded by the arms'
    * own k's, so the fusion windows are tiny by construction — the
    * corpus-sized work stays in the arms.
    */
  def rrfFuse(lexical: DataFrame, vector: DataFrame, k: Int,
      c: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = lexical.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("lex_rank"))
    val b = vector.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("vec_rank"))
    a.join(b, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("vec_rank")), lit(0.0)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("rrf"), col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
  }

  /** Exact PHRASE search: documents containing the token sequence
    * `phrase` contiguously, with occurrence count and first position —
    * the retrieval primitive bag-of-words BM25 cannot express (a doc
    * scoring high on {"new", "york"} need not contain "new york").
    *
    * Anchor-vote formulation, NOT a (len-1)-way positional self-join:
    * each (doc, pos, term) token matching ANY phrase word at offset
    * `off` votes for anchor = pos − off; an anchor collecting all
    * `len` DISTINCT offsets is one contiguous occurrence (a repeated
    * phrase word votes once per offset it appears at, so "a b a"
    * resolves correctly). One broadcast join of the token stream
    * against the len-row phrase table + one hash aggregate on
    * (doc, anchor) — cost is the matching tokens, never tokens², and
    * independent of phrase length.
    *
    * Output: (doc_id, n_occurrences, first_pos), 0-based positions,
    * unsorted. Empty tokens from repeated separators keep their
    * positions (they can never match a phrase word, but collapsing
    * them would shift adjacency). */
  def phraseSearch(docs: DataFrame, id: String, text: String,
      phrase: String): DataFrame = {
    val words = phrase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    require(words.nonEmpty, "phraseSearch needs a non-empty phrase")
    val spark = docs.sparkSession
    import spark.implicits._
    val pw = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("off", "term")
    docs
      .select(col(id).as("doc_id"),
        posexplode(split(col(text), " ")).as(Seq("p", "term")))
      .join(broadcast(pw), "term")
      .select(col("doc_id"), (col("p") - col("off")).as("anchor"), col("off"))
      .filter(col("anchor") >= 0)
      .groupBy(col("doc_id"), col("anchor"))
      .agg(countDistinct(col("off")).as("_nhit"))
      .filter(col("_nhit") === words.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("anchor")).cast("long").as("first_pos"))
  }

  /** ORDERED PROXIMITY ("sloppy phrase") search: a document matches
    * when the phrase's words occur IN ORDER with total token span
    * ≤ len + slop — the loose matching decontamination review and
    * search both need where exact contiguity ([[phraseSearch]]) is too
    * strict. slop = 0 degenerates to the exact phrase (spec-pinned
    * equivalence).
    *
    * Semantics are exact, not heuristic: for each occurrence p0 of the
    * first word, each later word greedily takes its SMALLEST position
    * after the previous one — the tightest chain from that start — and
    * the chain matches iff its span fits the window. Greedy-min is
    * optimal per start (any valid chain from p0 ends no earlier), so
    * "exists a window" is decided exactly.
    *
    * 100 TB shape: documents pre-filter to those containing ALL words
    * (the per-slot aggregation drops everything else), and the chain
    * fold is higher-order-function expressions over the doc's OWN
    * occurrence lists — per-doc work is |occurrences(w0)| × k bounded
    * list scans, never tokens², never a UDF, never corpus state.
    * Returns (doc_id, n_windows, first_start, min_span_tokens). */
  def proximitySearch(docs: DataFrame, id: String, text: String,
      phrase: String, slop: Int): DataFrame = {
    val words = phrase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    require(words.nonEmpty, "proximitySearch needs a non-empty phrase")
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val k = words.length
    val spark = docs.sparkSession
    import spark.implicits._
    val slots = words.zipWithIndex.map { case (w, i) => (i, w) }
      .toDF("slot", "term")
    val perSlot = docs
      .select(col(id).as("doc_id"),
        posexplode(split(col(text), " ")).as(Seq("p", "term")))
      .join(broadcast(slots), "term")
      .groupBy(col("doc_id"), col("slot"))
      .agg(sort_array(collect_list(col("p").cast("long"))).as("ps"))
    proximityFromSlotLists(perSlot, k, slop)
  }

  /** The chain-fold half of [[proximitySearch]], over prepared
    * per-(doc, slot) SORTED position lists — shared with the postings
    * lake form ([[graft.sources.PostingsLake.proximitySearch]]), whose
    * positions come from the index instead of a tokenize. */
  private[graft] def proximityFromSlotLists(perSlot: DataFrame, k: Int,
      slop: Int): DataFrame = {
    val byDoc = perSlot.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("slot"), col("ps"))))
        .as("m"))
      .filter(size(col("m")) === k)
    // greedy minimal chain per occurrence of the first word; a missing
    // step yields null and null propagates through the later filters
    def step(acc: Column, i: Int): Column =
      try_element_at(filter(element_at(col("m"), lit(i)), x => x > acc), lit(1))
    val chains = transform(element_at(col("m"), lit(0)),
      p0 => struct(p0.as("p0"), (1 until k).foldLeft(p0)(step).as("e")))
    val lim = (k - 1 + slop).toLong
    byDoc
      .withColumn("_c", filter(chains,
        c => c.getField("e").isNotNull &&
          c.getField("e") - c.getField("p0") <= lim))
      .filter(size(col("_c")) > 0)
      .select(col("doc_id"),
        size(col("_c")).cast("long").as("n_windows"),
        aggregate(col("_c"), lit(Long.MaxValue),
          (b, c) => least(b, c.getField("p0"))).as("first_start"),
        aggregate(col("_c"), lit(Long.MaxValue),
          (b, c) => least(b, c.getField("e") - c.getField("p0") + 1))
          .as("min_span_tokens"))
  }

  /** The QUERY-TABLE generalization of [[proximityFromSlotLists]]:
    * per (phrase_id, doc_id), the same greedy-minimal chain, but the
    * slot fold is a runtime `aggregate` over `sequence(1, plen - 1)`
    * instead of a compile-time unrolling — so one plan serves phrases
    * of DIFFERENT lengths in one pass. `perSlot` = (phrase_id,
    * plen: long, doc_id, slot: long, ps: sorted array<long>); a
    * missing slot (size(m) < plen) means a word never occurs and the
    * (phrase, doc) pair can't match; a null mid-fold propagates (the
    * filter-on-null-bound yields an empty list, try_element_at of it
    * null) exactly like the unrolled form's missing step. Everything
    * is HOF expressions over the doc's own occurrence lists — never
    * tokens², never a UDF. */
  private[graft] def proximityFromSlotListsBatch(perSlot: DataFrame,
      slop: Int): DataFrame = {
    val byDoc = perSlot.groupBy(col("phrase_id"), col("plen"), col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("slot"), col("ps"))))
        .as("m"))
      .filter(size(col("m")) === col("plen"))
    def chainEnd(p0: Column): Column =
      // sequence(1, 0) would DESCEND in Spark — a 1-word phrase has no
      // later slots to chain, its window is the occurrence itself
      when(col("plen") === 1L, p0).otherwise(
        aggregate(sequence(lit(1L), col("plen") - 1L), p0,
          (acc, i) => try_element_at(
            filter(element_at(col("m"), i), x => x > acc), lit(1))))
    val chains = transform(element_at(col("m"), lit(0L)),
      p0 => struct(p0.as("p0"), chainEnd(p0).as("e")))
    val lim = col("plen") - 1L + lit(slop.toLong)
    byDoc
      .withColumn("_c", filter(chains,
        c => c.getField("e").isNotNull &&
          c.getField("e") - c.getField("p0") <= lim))
      .filter(size(col("_c")) > 0)
      .select(col("phrase_id"), col("doc_id"),
        size(col("_c")).cast("long").as("n_windows"),
        aggregate(col("_c"), lit(Long.MaxValue),
          (b, c) => least(b, c.getField("p0"))).as("first_start"),
        aggregate(col("_c"), lit(Long.MaxValue),
          (b, c) => least(b, c.getField("e") - c.getField("p0") + 1))
          .as("min_span_tokens"))
  }

  /** Search-result HIGHLIGHTING: per document, the merged ±`window`
    * word spans around every query-term hit, reassembled as a snippet
    * ("… " joins disjoint spans) — what a search UI renders under each
    * result. Gaps-and-islands span merge: hits sorted per doc, a new
    * island starts when the next hit is more than 2·window away (spans
    * would not touch), islands fold to [max(0, min−window),
    * max+window]. Per-DOC windows only — state is the doc's own hits,
    * never corpus-sized. Output: (doc_id, n_hits, n_spans, snippet),
    * docs without hits absent. */
  def highlight(docs: DataFrame, id: String, text: String,
      terms: Seq[String], window: Int): DataFrame = {
    require(terms.nonEmpty, "highlight needs at least one term")
    require(window >= 0, s"window must be >= 0, got $window")
    val spark = docs.sparkSession
    import spark.implicits._
    val tq = terms.distinct.toDF("term")
    val hits = docs
      .select(col(id).as("doc_id"),
        posexplode(split(col(text), " ")).as(Seq("p", "term")))
      .join(broadcast(tq), "term")
      .select(col("doc_id"), col("p").cast("long").as("p"))
    assembleSnippets(hits,
      docs.select(col(id).as("doc_id"), split(col(text), " ").as("_w")), window)
  }

  /** The span-merge + snippet-assembly half of [[highlight]], shared
    * with the postings-lake form ([[graft.sources.PostingsLake
    * .highlight]] derives `hits` from positional postings and
    * `docWords` from a Bloom point-read of only the hit docs) so both
    * render byte-identical snippets. `hits` = (doc_id, p: long) one row
    * per query-term hit; `docWords` = (doc_id, _w: array<string>) —
    * extra docs are dropped by the inner join, missing hit docs drop
    * their rows (the lake form's contract makes that impossible). */
  private[graft] def assembleSnippets(hits: DataFrame, docWords: DataFrame,
      window: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val spans = hits
      .withColumn("_gap",
        when(col("p") - lag(col("p"), 1).over(w) > 2L * window, 1L)
          .otherwise(0L))
      .withColumn("_grp", sum(col("_gap"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(greatest(min(col("p")) - window, lit(0L)).as("s"),
        (max(col("p")) + window).as("e"),
        count(lit(1)).as("nh"))
    spans
      .groupBy(col("doc_id"))
      .agg(sum(col("nh")).as("n_hits"), count(lit(1)).as("n_spans"),
        sort_array(collect_list(struct(col("s"), col("e")))).as("_sp"))
      .join(docWords, "doc_id")
      .select(col("doc_id"), col("n_hits"), col("n_spans"),
        array_join(
          transform(col("_sp"), x =>
            array_join(slice(col("_w"), (x("s") + 1).cast("int"),
              (x("e") - x("s") + 1).cast("int")), " ")),
          " ... ").as("snippet"))
  }

  /** Retrieval EVALUATION against a relevance table — the harness that
    * turns the retrieval stack (BM25, ANN, RRF fusion) from "returns
    * rows" into a measured system. `run` is any per-query ranking
    * (query_id, rank, doc_id — the shared output shape of bm25TopK*,
    * cosineTopK renamed, rrfFuse); `qrels` is (query_id, doc_id)
    * relevance judgments. One row per JUDGED query:
    * (query_id, n_rel, hits, first_rel_rank, rr, recall_at_k) with
    * hits/recall over ranks <= k and rr = 1/first_rel_rank (0 when
    * nothing relevant retrieved — reciprocal rank, the per-query MRR
    * term).
    *
    * Engine-parity discipline: every metric is integers plus a single
    * correctly-rounded IEEE division (1/rank, hits/n_rel) — no
    * accumulated float sums — so per-query rows hash identically in
    * any engine. Corpus MEANS (MRR proper, macro recall) are sums of
    * doubles whose order the engine picks; compute them from these
    * rows when needed, but they stay out of the hash-checked surface
    * by design.
    *
    * Scale shape: two hash aggregates on query_id and one equi-join on
    * (query_id, doc_id); the run is already per-query-bounded by k and
    * qrels are judgment-sized, so nothing here is corpus-sized. */
  def retrievalMetrics(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rels = qrels.select(col("query_id"), col("doc_id")).distinct()
    val r = run.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank").cast("long").as("rank"))
    val hits = r.join(rels, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("hits"), min(col("rank")).as("first_rel_rank"))
    val nrel = rels.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    nrel.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("first_rel_rank"), lit(0L)).as("first_rel_rank"),
        coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)).as("rr"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("n_rel"))
          .as("recall_at_k"))
  }

  /** DuckDB replay of [[bm25TopKBatch]]: same formula, tie-break, and
    * rank discipline, with the query table spliced in as a CTE. */
  def bm25BatchOracleSql(src: String, idSql: String, textSql: String,
      queriesCte: String, k: Int, k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH queries AS ($queriesCte
       |), qterms AS (
       |  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
       |  FROM queries
       |), toks AS (
       |  SELECT $idSql AS doc_id,
       |         len(string_split($textSql, ' ')) AS dl,
       |         unnest(string_split($textSql, ' ')) AS term
       |  FROM $src
       |), tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM toks WHERE term IN (SELECT term FROM qterms)
       |  GROUP BY doc_id, dl, term
       |), dfs AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), stats AS (
       |  SELECT count(*) AS n_docs,
       |         avg(len(string_split($textSql, ' '))) AS avgdl
       |  FROM $src
       |), scored AS (
       |  SELECT q.query_id, tf.doc_id, tf.dl,
       |         sum(ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) *
       |             tf.tf * ${k1 + 1.0} /
       |             (tf.tf + $k1 * (${1.0 - b} + $b * tf.dl / stats.avgdl))) AS score,
       |         count(*) AS matched_terms,
       |         CAST(sum(tf.tf) AS BIGINT) AS total_tf
       |  FROM tf JOIN qterms q USING (term) JOIN dfs USING (term) CROSS JOIN stats
       |  GROUP BY q.query_id, tf.doc_id, tf.dl
       |), ranked AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       |         doc_id, matched_terms, total_tf, CAST(dl AS BIGINT) AS dl
       |  FROM scored
       |)
       |SELECT query_id, rank, doc_id, matched_terms, total_tf, dl
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** DuckDB replay of [[bm25TopK]]: identical formula and tie-break;
    * only ranks and integer evidence are emitted, so last-ulp log
    * differences cannot reach the hash. */
  def bm25OracleSql(src: String, idSql: String, textSql: String,
      query: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): String = {
    // SQL-escape embedded quotes — the oracle inlines terms as string
    // literals, and an unescaped quote would make the generated SQL
    // malformed (or worse, splice into it).
    val termList = query.distinct
      .map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT $idSql AS doc_id,
       |         len(string_split($textSql, ' ')) AS dl,
       |         unnest(string_split($textSql, ' ')) AS term
       |  FROM $src
       |), tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM toks WHERE term IN ($termList)
       |  GROUP BY doc_id, dl, term
       |), dfs AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), stats AS (
       |  SELECT count(*) AS n_docs,
       |         avg(len(string_split($textSql, ' '))) AS avgdl
       |  FROM $src
       |), scored AS (
       |  SELECT tf.doc_id, tf.dl,
       |         sum(ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) *
       |             tf.tf * ${k1 + 1.0} /
       |             (tf.tf + $k1 * (${1.0 - b} + $b * tf.dl / stats.avgdl))) AS score,
       |         count(*) AS matched_terms,
       |         CAST(sum(tf.tf) AS BIGINT) AS total_tf
       |  FROM tf JOIN dfs USING (term) CROSS JOIN stats
       |  GROUP BY tf.doc_id, tf.dl
       |)
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       |       doc_id, matched_terms, total_tf, CAST(dl AS BIGINT) AS dl
       |FROM scored ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }
}
