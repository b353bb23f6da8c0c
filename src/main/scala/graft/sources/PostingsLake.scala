package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedLake.BloomSpec

/** The inverted index AS A TABLE: BM25 retrieval state persisted in
  * versioned lakes and grown by appends — the search-engine shape for
  * a continuously-ingested corpus, where
  * [[graft.operators.TextSearch.bm25TopK]]'s tokenize-on-query form
  * would re-scan every document ever ingested on every query.
  *
  * Layout under `lakeDir`:
  *  - `postings/` — (term, doc_id, tf, dl) rows, PARTITIONED by
  *    `tp = pmod(xxhash64(term), termParts)`: a query's I/O is the
  *    partitions its terms hash into (≈ |terms|/termParts of the
  *    index), decided from manifest metadata alone. `dl` rides the
  *    posting row (classic postings layout), so scoring never joins a
  *    document table. Every commit also records per-file Bloom
  *    filters on `term` (admits a query's files WITHIN its term
  *    partitions — after many increments a partition holds one file
  *    per tick, and most of a rare term's co-partition files don't
  *    contain it) and on `doc_id` (admits a [[delete]]'s files), so
  *    both reads are candidate-bounded at the file level, and
  *    `termParts` itself is recorded as an immutable table property —
  *    a searcher or appender hashing with a different count fails
  *    loudly ([[VersionedLake.requireProps]]) instead of silently
  *    missing partitions.
  *  - `doclens/` — (doc_id, dl) rows for the corpus statistics
  *    (N, avgdl) — a two-column lake whose scan cost is the corpus's
  *    doc COUNT, not its text.
  *
  * Append-only contract: each document arrives in exactly one
  * increment (the ingest stream's natural shape), so its (doc, term)
  * tf rows are complete at append time and never need merging —
  * document frequency and corpus stats are then plain aggregates over
  * the lakes, identical to what the one-shot operator computes on the
  * union corpus. PostingsLakeSpec pins that parity exactly (ranks and
  * integer evidence, the same log-free discipline), and the
  * x_bm25_lake_incremental gate hashes a two-increment build against
  * the SAME DuckDB oracle as the one-shot x_bm25_topk.
  *
  * Both lakes inherit every versioned-lake capability: exactly-once
  * streaming appends (batch ids), time travel (search the index as of
  * any version), OCC, and compaction for per-tick file growth.
  */
object PostingsLake {

  private def postingsDir(lakeDir: String) = s"$lakeDir/postings"
  private def doclensDir(lakeDir: String) = s"$lakeDir/doclens"
  private def statsDir(lakeDir: String) = s"$lakeDir/stats"

  /** Table property marking a lake whose EVERY commit also maintained
    * the corpus-stats ledger — what lets [[search]] trust it. Recorded
    * at first append ONLY when that append carries a `batchId`: the
    * ledger is a separately-committed leg, and only the batch-id
    * watermark makes a crash between the doclens and stats commits
    * healable by redelivery. A lake created without a batchId (or by
    * pre-ledger code) never acquires the property — its searches use
    * the doclens scan — and a ledger lake REFUSES unwatermarked
    * appends/deletes, so a silently desynced ledger is impossible by
    * construction (properties are immutable after the first commit). */
  private val StatsProp = "stats"

  private def requireLedgerBatchId(op: String, hasLedger: Boolean,
      batchId: Option[Long]): Unit =
    require(!hasLedger || batchId.isDefined,
      s"$op on a corpus-stats-ledger lake requires a batchId: the ledger " +
        "is a separate commit, and only the batch-id watermark lets a " +
        "redelivered increment heal a crash between the doclens and " +
        "stats commits — an unwatermarked write could desync (N, avgdl) " +
        "for every future search with no detection path")

  /** Tokenize one increment of documents and append its postings and
    * doc lengths. Creates the lakes on first call; `batchId` arms the
    * exactly-once watermark on both AND opts the lake into the
    * corpus-stats ledger (see [[StatsProp]] — unwatermarked lakes
    * derive stats from the doclens scan instead). */
  def append(docs: DataFrame, id: String, text: String, lakeDir: String,
      termParts: Int = 64, docParts: Int = 16,
      batchId: Option[Long] = None): Unit = {
    val creating = VersionedLake.currentVersion(postingsDir(lakeDir)) < 1
    val hasLedger = !creating &&
      VersionedLake.tableProps(postingsDir(lakeDir)).contains(StatsProp)
    requireLedgerBatchId("append", hasLedger, batchId)
    val maintainLedger = hasLedger || (creating && batchId.isDefined)
    // positions ride each posting row (sorted, 0-based into the raw
    // token array — empty tokens keep their slots so adjacency never
    // shifts): the classic positional-postings layout, what lets
    // [[phraseSearch]] answer contiguity from the index alone
    val toks = docs.select(col(id).as("doc_id"), split(col(text), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        posexplode(col("toks")).as(Seq("p", "term")))
      .filter(length(col("term")) > 0)
    val postings = toks
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("p").cast("long"))).as("positions"))
      .withColumn("tp", pmod(xxhash64(col("term")), lit(termParts)))
    val doclens = docs.select(col(id).as("doc_id"),
      size(split(col(text), " ")).cast("long").as("dl"))
      .withColumn("dp", pmod(xxhash64(col("doc_id")), lit(docParts)))
    val props = Map("termParts" -> termParts.toString) ++
      (if (maintainLedger) Map(StatsProp -> "ledger") else Map.empty)
    if (batchId.forall(_ > VersionedLake.committedBatchId(postingsDir(lakeDir))))
      VersionedLake.append(postings, postingsDir(lakeDir), "tp", batchId,
        blooms = Seq(BloomSpec("term", m = 32768), BloomSpec("doc_id")),
        props = props)
    if (batchId.forall(_ > VersionedLake.committedBatchId(doclensDir(lakeDir))))
      VersionedLake.append(doclens, doclensDir(lakeDir), "dp", batchId,
        blooms = Seq(BloomSpec("doc_id")),
        props = Map("docParts" -> docParts.toString))
    // corpus-stats LEDGER: one (n_docs, sum_dl) row per increment, so
    // search derives (N, avgdl) from an increments-sized read instead
    // of scanning the doclens lake per query — at corpus scale the
    // doclens scan is the new bottleneck once tokenize-on-query is
    // gone. Deletes append NEGATIVE rows ([[delete]]), keeping the
    // ledger exact under retraction.
    if (maintainLedger &&
        batchId.forall(_ > VersionedLake.committedBatchId(statsDir(lakeDir)))) {
      val inc = doclens.agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("sdl"))
        .withColumn("sp", lit(0L))
      VersionedLake.append(inc, statsDir(lakeDir), "sp", batchId)
    }
  }

  /** Drive [[append]] from a STREAM of documents — the ingest-time
    * form of the inverted index: each micro-batch tokenizes and lands
    * exactly-once on all three lakes (postings, doclens, stats ledger
    * — the shared batch id makes a crashed tick re-deliver into
    * watermark-guarded no-ops, which is also what keeps the ledger in
    * sync; see [[StatsProp]]). `compactEvery` > 0 folds per-tick file
    * growth AND the stats ledger every N batches; maintenance never
    * fails a data batch. */
  def indexStream(stream: DataFrame, id: String, text: String,
      lakeDir: String, checkpointDir: String, termParts: Int = 64,
      docParts: Int = 16, compactEvery: Int = 0,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "PostingsLake.indexStream expects a streaming DataFrame")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        append(b.toDF(), id, text, lakeDir, termParts, docParts,
          batchId = Some(batchId))
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          try { compact(b.sparkSession, lakeDir); () }
          catch { case scala.util.control.NonFatal(_) => () }
        ()
      }
      .start()
  }

  /** Corpus statistics (N, avgdl): from the ledger when this lake has
    * maintained one since creation ([[StatsProp]]), else the doclens
    * scan (pre-ledger lakes). The ledger read is increments-sized —
    * metadata, not corpus. */
  private[graft] def corpusStats(spark: SparkSession, lakeDir: String,
      version: Option[Int]): DataFrame =
    if (version.isEmpty &&
        VersionedLake.tableProps(postingsDir(lakeDir)).contains(StatsProp))
      VersionedLake.read(spark, statsDir(lakeDir))
        .agg(sum(col("n")).as("n_docs"),
          (sum(col("sdl")).cast("double") / sum(col("n")).cast("double"))
            .as("avgdl"))
    else
      // a version-pinned search replays history: the doclens lake AT
      // that version is the unambiguous source (mapping a postings
      // version to a ledger version would re-introduce the coupling
      // the batch-id watermarks exist to avoid)
      VersionedLake.read(spark, doclensDir(lakeDir), version)
        .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

  /** The recorded termParts when the lake recorded one; pre-props
    * lakes fall back to the caller's value (the original contract). */
  private def effTermParts(lakeDir: String, callers: Int): Int =
    VersionedLake.tableProps(postingsDir(lakeDir))
      .get("termParts").map(_.toInt).getOrElse(callers)

  /** Past this many query terms, [[search]]/[[phraseSearch]] stop
    * building an `isin(terms:_*)` literal list (a plan-sized wall on
    * degenerate inputs: thousands of literals bloat analysis and
    * codegen) and restrict through a broadcast semi-join instead —
    * the same shape [[searchBatch]] always uses. Semantics identical;
    * private[graft] so the boundary spec can sit exactly on it. */
  private[graft] val MaxLiteralTerms = 1024

  /** Exact restriction of posting rows to `terms`: literal `isin` at
    * interactive term counts (codegen'd, no extra plan node), broadcast
    * left-semi past [[MaxLiteralTerms]]. */
  private def restrictToTerms(rows: DataFrame, terms: Seq[String]): DataFrame =
    if (terms.size <= MaxLiteralTerms) rows.filter(col("term").isin(terms: _*))
    else {
      val spark = rows.sparkSession
      import spark.implicits._
      rows.join(broadcast(terms.toDF("term")), Seq("term"), "left_semi")
    }

  /** The positions column, guarded IN-PATH against pre-positional rows:
    * evaluating a null-positions posting raises with `msg` instead of
    * silently missing occurrences. In-path (assert_true fused into the
    * projection) rather than an eager `filter(isNull).isEmpty` require,
    * which would read the restricted postings TWICE — once to validate,
    * once to answer — doubling every positional query's I/O. */
  private def positionsOrFail(msg: String) =
    when(assert_true(col("positions").isNotNull, lit(msg)).isNull,
      col("positions"))

  /** The postings files a query reads: its terms' hash PARTITIONS
    * (manifest-level pruning), then within them only the files whose
    * term Bloom might contain at least one query term — one shared
    * implementation for [[search]], [[prunedInputFiles]], and the
    * spec pins, so the reported list is exactly what a search scans.
    * Lakes written before the Bloom spec read partition-pruned. */
  private def queryRead(spark: SparkSession, lakeDir: String,
      query: Seq[String], termParts: Int, version: Option[Int]): DataFrame = {
    import spark.implicits._
    val terms = query.distinct
    val tp = effTermParts(lakeDir, termParts)
    // the terms' partition ids, via the SAME hash the writer used —
    // computed in-engine on a terms-sized frame, then collected
    // (query-sized metadata, not data)
    val tps = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(tp)).as("tp"))
      .distinct().collect().map(_.getLong(0).toString).toSeq
    val dir = postingsDir(lakeDir)
    val v = version.getOrElse(VersionedLake.currentVersion(dir))
    // Bloom presence is checked AT THE PINNED VERSION (a time-travel
    // search of a version written before the term Blooms existed must
    // fall back, not hit readPoints' loud unrecorded-column refusal)
    if (v >= 1 && VersionedLake.manifestEntries(dir, v)
        .exists(_.colBlooms.contains("term")))
      VersionedLake.readPoints(spark, dir, "term", terms, Some(v),
        partitions = Some(tps))
    else
      VersionedLake.read(spark, dir, Some(v), partitions = Some(tps))
  }

  /** The pruned positional read a QUERY-TABLE form makes: the union
    * of the word TABLE's partition ids (computed in-engine, collected
    * bounded by `termParts` — never the words themselves), then
    * file-level Bloom admission via [[VersionedLake.pointReadOrFull]]
    * whose maxKeys rule degrades a past-the-bound word set to the
    * partition-pruned read, never a driver blowup. Shared by
    * [[phraseSearchBatch]] and [[proximitySearchBatch]]. */
  private def batchQueryRead(spark: SparkSession, lakeDir: String,
      allWords: DataFrame, termParts: Int, version: Option[Int]): DataFrame = {
    val tp = effTermParts(lakeDir, termParts)
    val tps = allWords
      .select(pmod(xxhash64(col("term")), lit(tp)).as("tp"))
      .distinct().collect().map(_.getLong(0).toString).toSeq // <= termParts
    val dir = postingsDir(lakeDir)
    version match {
      case Some(v) => VersionedLake.read(spark, dir, Some(v),
        partitions = Some(tps))
      case None => VersionedLake.pointReadOrFull(spark, dir, "term",
        allWords, partitions = Some(tps))
    }
  }

  /** LOUD-REFUSAL guard for the batch search family: a NULL, empty, or
    * whitespace-only phrase tokenizes to zero words (its single ""
    * token is filtered before the join), so without this check it would
    * silently match nothing while carrying plen=1 — unlike the one-shot
    * forms, whose `require(words.nonEmpty)` refuses up front (r18
    * ADVICE). The phrase table is query-side and broadcast-bounded by
    * design, so the one eager probe job is cheap relative to the index
    * read it guards. */
  private def requireNoBlankPhrases(phrases: DataFrame, ptext: String,
      op: String): Unit =
    require(phrases
        .filter(col(ptext).isNull || trim(col(ptext)) === "").isEmpty,
      s"$op: phrase table contains a NULL or whitespace-only '$ptext' — " +
        "every phrase must tokenize to at least one word")

  /** ORDERED PROXIMITY for a QUERY TABLE — the sloppy-phrase twin of
    * [[phraseSearchBatch]], closing the batch family (BM25, exact
    * phrase, now proximity): thousands of decontamination-review
    * phrases decided in ONE partition-pruned positional pass over the
    * union of their words, instead of one index read per phrase
    * through [[proximitySearch]]. Per phrase, identical
    * greedy-minimal-chain semantics and evidence columns as the
    * one-shot ((phrase_id, doc_id, n_windows, first_start,
    * min_span_tokens)); phrase LENGTHS may vary freely — the chain
    * fold is a runtime `aggregate` over each phrase's own slot count
    * ([[graft.operators.TextSearch.proximityFromSlotListsBatch]]).
    *
    * Scale shape mirrors [[phraseSearchBatch]]: partition ids and
    * Bloom admission through [[batchQueryRead]], the (phrase_id, slot,
    * term) table rides a broadcast, per-doc work is bounded by the
    * phrase words' occurrence lists — never tokens². Same
    * pre-positional refusal as the other positional forms. */
  def proximitySearchBatch(spark: SparkSession, lakeDir: String,
      phrases: DataFrame, pid: String, ptext: String, slop: Int,
      termParts: Int = 64, version: Option[Int] = None): DataFrame = {
    require(slop >= 0, s"slop must be >= 0, got $slop")
    requireNoBlankPhrases(phrases, ptext, "proximitySearchBatch")
    val pw = phrases
      .select(col(pid).as("phrase_id"),
        split(regexp_replace(trim(col(ptext)), "\\s+", " "), " ").as("w"))
      .select(col("phrase_id"), size(col("w")).cast("long").as("plen"),
        posexplode(col("w")).as(Seq("slot", "term")))
      .filter(length(col("term")) > 0)
      .select(col("phrase_id"), col("plen"), col("slot").cast("long").as("slot"),
        col("term"))
    val rows = batchQueryRead(spark, lakeDir,
      pw.select(col("term")).distinct(), termParts, version)
    require(rows.columns.contains("positions"),
      s"$lakeDir records no positional postings — re-ingest to " +
        "proximity-search it")
    val perSlot = rows.join(broadcast(pw), "term")
      .select(col("phrase_id"), col("plen"), col("doc_id"), col("slot"),
        positionsOrFail(
          s"$lakeDir holds pre-positional postings for these phrases' " +
            "words — compact/re-ingest before proximity-searching them")
          .as("positions"))
      .groupBy(col("phrase_id"), col("plen"), col("doc_id"), col("slot"))
      .agg(sort_array(flatten(collect_list(col("positions")))).as("ps"))
    graft.operators.TextSearch.proximityFromSlotListsBatch(perSlot, slop)
  }

  /** BM25 top-k over the lake for a bag-of-words query — identical
    * semantics and output schema to [[graft.operators.TextSearch
    * .bm25TopK]] on the union corpus ((rank, doc_id, matched_terms,
    * total_tf, dl); BM25+ idf; ties on doc_id), but the corpus-sized
    * tokenize pass is GONE: only the query terms' partitions are read
    * (manifest-level pruning), within them only the files whose term
    * Bloom admits a query term, df comes from those postings, and the
    * corpus stats from the narrow doclens lake. `version` pins both
    * lakes to an earlier version — retrieval time travel. */
  def search(spark: SparkSession, lakeDir: String, query: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      termParts: Int = 64, version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(query.nonEmpty, "search needs at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = query.distinct
    val tf = restrictToTerms(
      queryRead(spark, lakeDir, terms, termParts, version), terms)
      .select(col("term"), col("doc_id"), col("dl"), col("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = corpusStats(spark, lakeDir, version)
    val scored = tf
      .join(broadcast(dfreq), "term")
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
    val top = scored.orderBy(desc("score"), col("doc_id")).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(desc("score"), col("doc_id"))))
      .select(col("rank").cast("long").as("rank"), col("doc_id"),
        col("matched_terms"), col("total_tf"), col("dl").cast("long").as("dl"))
  }

  /** BM25 top-k over the lake for a QUERY TABLE — the thousand-prompt
    * decontamination-review shape, ranked in ONE index pass instead of
    * one [[search]] per query (whose `isin(terms:_*)` literal list is
    * an interactive-query shape). Identical semantics and output
    * schema to [[graft.operators.TextSearch.bm25TopKBatch]] on the
    * union corpus ((query_id, rank, doc_id, matched_terms, total_tf,
    * dl); BM25+ idf; two-phase bucketed group-limit; ties on doc_id) —
    * but the corpus-sized tokenize pass is GONE:
    *
    *  - partition pruning needs only the query terms' PARTITION IDS,
    *    computed in-engine and collected bounded by `termParts` —
    *    never the terms themselves;
    *  - file-level Bloom admission collects the distinct terms only
    *    while bounded ([[VersionedLake.pointReadOrFull]]'s maxKeys
    *    rule); a past-the-bound query table degrades to the
    *    partition-pruned read, never to a driver blowup;
    *  - the posting rows then semi-filter through a broadcast of the
    *    term table (exact — pruning conservatism stays invisible), df
    *    is an aggregate over those rows, and the corpus stats come
    *    from the O(1) ledger.
    */
  def searchBatch(spark: SparkSession, lakeDir: String, queries: DataFrame,
      qid: String, qtext: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      termParts: Int = 64, version: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qterms = queries
      .select(col(qid).as("query_id"),
        explode(split(col(qtext), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val allTerms = qterms.select(col("term")).distinct()
    val tp = effTermParts(lakeDir, termParts)
    val tps = allTerms
      .select(pmod(xxhash64(col("term")), lit(tp)).as("tp"))
      .distinct().collect().map(_.getLong(0).toString).toSeq // <= termParts rows
    val dir = postingsDir(lakeDir)
    val rows = version match {
      // a version-pinned replay reads partition-pruned (Bloom presence
      // varies across history; queryRead documents the same rule)
      case Some(v) => VersionedLake.read(spark, dir, Some(v),
        partitions = Some(tps))
      case None => VersionedLake.pointReadOrFull(spark, dir, "term",
        allTerms, partitions = Some(tps))
    }
    val base = rows.join(broadcast(allTerms), "term")
      .select(col("term"), col("doc_id"), col("dl"), col("tf"))
    val dfreq = base.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = corpusStats(spark, lakeDir, version)
    val scored = base
      .join(broadcast(qterms), "term")
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
    graft.operators.TextSearch.rankTopKPerQuery(scored, k, bucketChars = 2)
  }

  /** Exact PHRASE search over the lake — contiguity answered from the
    * POSITIONAL postings alone, reading only the phrase words'
    * partitions (and, within them, only files whose term Bloom admits
    * a phrase word): |phrase| terms of I/O against a corpus-sized
    * index. Same anchor-vote algorithm and output as
    * [[graft.operators.TextSearch.phraseSearch]] ((doc_id,
    * n_occurrences, first_pos), 0-based) — the positions recorded at
    * [[append]] index the raw token array, so lake and one-shot
    * adjacency agree exactly (gate-pinned against the same oracle).
    *
    * Refuses loudly when any matched posting predates positional
    * recording (a pre-positions lake evolved by later appends would
    * otherwise silently miss old documents' occurrences). */
  def phraseSearch(spark: SparkSession, lakeDir: String, phrase: String,
      termParts: Int = 64, version: Option[Int] = None): DataFrame = {
    val words = phrase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    require(words.nonEmpty, "phraseSearch needs a non-empty phrase")
    val distinctWords = words.distinct
    val rows = restrictToTerms(
      queryRead(spark, lakeDir, distinctWords, termParts, version),
      distinctWords)
    require(rows.columns.contains("positions"),
      s"$lakeDir records no positional postings — re-ingest to phrase-search it")
    import spark.implicits._
    val pw = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("off", "term")
    rows.join(broadcast(pw), "term")
      .select(col("doc_id"),
        explode(positionsOrFail(
          s"$lakeDir holds pre-positional postings for these terms — " +
            "compact/re-ingest before phrase-searching them")).as("p"),
        col("off"))
      .select(col("doc_id"), (col("p") - col("off")).as("anchor"), col("off"))
      .filter(col("anchor") >= 0)
      .groupBy(col("doc_id"), col("anchor"))
      .agg(countDistinct(col("off")).as("_nhit"))
      .filter(col("_nhit") === words.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("anchor")).cast("long").as("first_pos"))
  }

  /** ORDERED PROXIMITY over the lake's positional postings — the
    * sloppy-phrase twin of [[phraseSearch]]: words in order within a
    * len+slop token window, decided by the same exact greedy-minimal
    * chain as [[graft.operators.TextSearch.proximitySearch]] (whose
    * fold this shares), with positions from the INDEX alone: only the
    * phrase words' partitions are read, nothing re-tokenizes, and
    * multi-tranche postings for a (doc, word) flatten into one sorted
    * list before the fold. Same pre-positional refusal as the phrase
    * forms. */
  def proximitySearch(spark: SparkSession, lakeDir: String, phrase: String,
      slop: Int, termParts: Int = 64, version: Option[Int] = None): DataFrame = {
    val words = phrase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    require(words.nonEmpty, "proximitySearch needs a non-empty phrase")
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val distinctWords = words.distinct
    val rows = restrictToTerms(
      queryRead(spark, lakeDir, distinctWords, termParts, version),
      distinctWords)
    require(rows.columns.contains("positions"),
      s"$lakeDir records no positional postings — re-ingest to proximity-search it")
    import spark.implicits._
    val slots = words.zipWithIndex.map { case (w, i) => (i, w) }
      .toDF("slot", "term")
    val perSlot = rows.join(broadcast(slots), "term")
      .select(col("doc_id"), col("slot"),
        positionsOrFail(
          s"$lakeDir holds pre-positional postings for these terms — " +
            "compact/re-ingest before proximity-searching them").as("positions"))
      .groupBy(col("doc_id"), col("slot"))
      .agg(sort_array(flatten(collect_list(col("positions")))).as("ps"))
    graft.operators.TextSearch.proximityFromSlotLists(
      perSlot, words.length, slop)
  }

  /** PHRASE search for a QUERY TABLE — the decontamination-review
    * shape (thousands of benchmark phrases checked for verbatim
    * presence) answered in ONE partition-pruned index pass, where
    * [[phraseSearch]]'s single-string form would re-probe the lake per
    * phrase. Per phrase, identical anchor-vote semantics and evidence
    * columns as the one-shot ((phrase_id, doc_id, n_occurrences,
    * first_pos), 0-based; a repeated phrase word votes once per offset,
    * so "a b a" resolves correctly); a phrase with no contiguous
    * occurrence contributes no rows, and an all-whitespace phrase can
    * never match (it has no words to vote).
    *
    * Scale shape:
    *  - partition pruning needs only the union of the phrases' words'
    *    PARTITION IDS — computed in-engine, collected bounded by
    *    `termParts`, never the words themselves;
    *  - file-level Bloom admission via [[VersionedLake.pointReadOrFull]]
    *    (its maxKeys rule: a past-the-bound word set degrades to the
    *    partition-pruned read, never a driver blowup);
    *  - the (phrase_id, off, term) table rides a broadcast; the only
    *    corpus-sized aggregate is the per-(phrase, doc, anchor) vote —
    *    cost is the matching tokens × covering phrases, never tokens².
    *
    * Same pre-positional refusal as the one-shot lake form. */
  def phraseSearchBatch(spark: SparkSession, lakeDir: String,
      phrases: DataFrame, pid: String, ptext: String,
      termParts: Int = 64, version: Option[Int] = None): DataFrame = {
    requireNoBlankPhrases(phrases, ptext, "phraseSearchBatch")
    val pw = phrases
      .select(col(pid).as("phrase_id"),
        split(regexp_replace(trim(col(ptext)), "\\s+", " "), " ").as("w"))
      .select(col("phrase_id"), size(col("w")).cast("long").as("plen"),
        posexplode(col("w")).as(Seq("off", "term")))
      .filter(length(col("term")) > 0)
      .select(col("phrase_id"), col("plen"), col("off").cast("long").as("off"),
        col("term"))
    val rows = batchQueryRead(spark, lakeDir,
      pw.select(col("term")).distinct(), termParts, version)
    require(rows.columns.contains("positions"),
      s"$lakeDir records no positional postings — re-ingest to phrase-search it")
    rows.join(broadcast(pw), "term")
      .select(col("phrase_id"), col("plen"), col("doc_id"),
        explode(positionsOrFail(
          s"$lakeDir holds pre-positional postings for these phrases' " +
            "words — compact/re-ingest before phrase-searching them")).as("p"),
        col("off"))
      .select(col("phrase_id"), col("plen"), col("doc_id"),
        (col("p") - col("off")).as("anchor"), col("off"))
      .filter(col("anchor") >= 0)
      .groupBy(col("phrase_id"), col("plen"), col("doc_id"), col("anchor"))
      .agg(countDistinct(col("off")).as("_nhit"))
      .filter(col("_nhit") === col("plen"))
      .groupBy(col("phrase_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("anchor")).cast("long").as("first_pos"))
  }

  /** Search-result HIGHLIGHTING from the lake: hit positions come from
    * the POSITIONAL POSTINGS (only the query terms' partitions are
    * read, Bloom-admitted at the file level), spans merge from those
    * positions alone, and the raw text needed for snippet assembly is
    * POINT-READ for only the hit documents through `docsLake`'s doc-id
    * Bloom ([[VersionedLake.pointReadOrFull]]) — so a handful of hits
    * against a corpus-sized lake opens a handful of text files, where
    * [[graft.operators.TextSearch.highlight]] re-tokenizes every
    * document per call. Same span rule and output ((doc_id, n_hits,
    * n_spans, snippet)), rendered by the SHARED assembly
    * ([[TextSearch.assembleSnippets]]), so lake and one-shot snippets
    * are byte-identical — the x_highlight_lake gate hashes this form
    * against x_highlight's oracle.
    *
    * `docsLake` is a versioned lake holding (id, text) rows — build it
    * with a Bloom on the id column to get the candidate-bounded text
    * read; pre-Bloom lakes degrade to a full (still partition-narrowed)
    * scan, never to a wrong snippet. Positions index the raw token
    * array (recorded at [[append]]), exactly what the one-shot form's
    * `split` produces, so adjacency and span windows agree. */
  def highlight(spark: SparkSession, lakeDir: String, docsLake: String,
      id: String, text: String, terms: Seq[String], window: Int,
      termParts: Int = 64): DataFrame = {
    require(terms.nonEmpty, "highlight needs at least one term")
    require(window >= 0, s"window must be >= 0, got $window")
    val distinctTerms = terms.distinct
    val rows = restrictToTerms(
      queryRead(spark, lakeDir, distinctTerms, termParts, None), distinctTerms)
    require(rows.columns.contains("positions"),
      s"$lakeDir records no positional postings — re-ingest to highlight from it")
    val hits = rows
      .select(col("doc_id"), explode(positionsOrFail(
        s"$lakeDir holds pre-positional postings for these terms — " +
          "compact/re-ingest before highlighting from them")).as("p"))
      .select(col("doc_id"), col("p").cast("long").as("p"))
    // ONLY the hit docs' text: Bloom-admitted files, exact inner join
    // downstream (assembleSnippets joins spans to words on doc_id)
    val docWords = VersionedLake.pointReadOrFull(spark, docsLake, id,
      hits.select(col("doc_id")).distinct())
      .select(col(id).as("doc_id"), split(col(text), " ").as("_w"))
    graft.operators.TextSearch.assembleSnippets(hits, docWords, window)
  }

  /** Fold per-increment file growth back to one file per partition in
    * both lakes (OCC compaction — concurrent appends just defer a
    * partition to the next run), and FOLD the corpus-stats ledger to a
    * single cumulative row: the ledger grows one row per increment and
    * one per delete, so after years of ticks the "increments-sized"
    * stats read would quietly become tick-count-sized —
    * the fold ([[VersionedLake.rewritePartitions]], a copy-on-write
    * content commit) keeps it O(1) while summing to exactly the same
    * (N, avgdl). The batch-id watermark is recorded per VERSION and
    * [[VersionedLake.committedBatchId]] takes the max over history, so
    * exactly-once redelivery protection survives the fold. Search
    * results are unchanged by construction; run on the `compactEvery`
    * cadence of whatever drives the appends. */
  def compact(spark: SparkSession, lakeDir: String): Unit = {
    VersionedLake.compactPartitions(spark, postingsDir(lakeDir), "tp")
    VersionedLake.compactPartitions(spark, doclensDir(lakeDir), "dp")
    if (VersionedLake.tableProps(postingsDir(lakeDir)).contains(StatsProp) &&
        VersionedLake.currentVersion(statsDir(lakeDir)) >= 1)
      VersionedLake.rewritePartitions(spark, statsDir(lakeDir), "sp", led =>
        led.groupBy(col("sp"))
          .agg(sum(col("n")).as("n"),
            coalesce(sum(col("sdl")), lit(0L)).as("sdl"))
          .select(col("n"), col("sdl"), col("sp")))
    ()
  }

  /** RETRACT documents from the index — the takedown / right-to-be-
    * forgotten operation a long-lived corpus index needs. The rows-to-
    * delete read is candidate-bounded through the doc_id Blooms (a
    * takedown of a handful of ids opens a handful of files, not the
    * index), then a copy-on-write MERGE rewrites only the term
    * partitions that actually hold the named docs' postings (and the
    * doc-length partitions holding their rows); document frequency and
    * corpus statistics are derived at query time, so the next search
    * reflects the retraction with no further bookkeeping —
    * PostingsLakeSpec pins search ≡ the one-shot operator on the
    * surviving corpus. Pre-delete versions stay time-travel-readable
    * until vacuumed (which is what makes retention policy explicit
    * rather than accidental).
    *
    * `batchId` rides the lake's INGEST sequence — deletes interleave
    * with appends in ONE monotone sequence per lake (the ledger's
    * crash-healing depends on the shared watermark, and the commit-
    * claim enforcement no-ops any id at or below it). A takedown
    * pipeline sequenced independently of ingest must not reuse this
    * surface's ids; drive [[VersionedLake.mergeUpsert]]'s `retractId`
    * namespace instead. */
  def delete(docs: DataFrame, id: String, lakeDir: String,
      batchId: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    requireLedgerBatchId("delete",
      VersionedLake.tableProps(postingsDir(lakeDir)).contains(StatsProp),
      batchId)
    val ids = docs.select(col(id).as("doc_id")).distinct()
    def candRead(dir: String): DataFrame =
      VersionedLake.pointReadOrFull(spark, dir, "doc_id", ids)
    val p = candRead(postingsDir(lakeDir))
      .join(ids, Seq("doc_id"), "left_semi")
      .withColumn("_deleted", lit(true))
    if (batchId.forall(_ > VersionedLake.committedBatchId(postingsDir(lakeDir))))
      VersionedLake.mergeUpsert(spark, postingsDir(lakeDir), p,
        Seq("term", "doc_id"), "tp", batchId = batchId)
    val d = candRead(doclensDir(lakeDir))
      .join(ids, Seq("doc_id"), "left_semi")
      .withColumn("_deleted", lit(true))
    // the removed docs' ledger correction rides as a NEGATIVE row —
    // computed from the SAME candidate-bounded read the merge deletes,
    // before the merge commits it away
    if (batchId.forall(_ > VersionedLake.committedBatchId(statsDir(lakeDir))) &&
        VersionedLake.tableProps(postingsDir(lakeDir)).contains(StatsProp)) {
      val neg = d.agg((-count(lit(1))).as("n"),
        (-coalesce(sum(col("dl")), lit(0L))).as("sdl"))
        .withColumn("sp", lit(0L))
      VersionedLake.append(neg, statsDir(lakeDir), "sp", batchId)
    }
    if (batchId.forall(_ > VersionedLake.committedBatchId(doclensDir(lakeDir))))
      VersionedLake.mergeUpsert(spark, doclensDir(lakeDir), d,
        Seq("doc_id"), "dp", batchId = batchId)
  }

  /** The pruned postings files a query would read — for I/O reasoning
    * in specs without running the search ([[queryRead]] is shared with
    * [[search]], so this list is exactly what a search scans). */
  def prunedInputFiles(spark: SparkSession, lakeDir: String,
      query: Seq[String], termParts: Int = 64): Array[String] =
    queryRead(spark, lakeDir, query, termParts, None).inputFiles
}
