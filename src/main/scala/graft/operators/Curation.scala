package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * after dedup/quality filtering: benchmark decontamination and
  * token-budget shard packing. Both are pure DataFrame plans with
  * DuckDB-oracle-checked gates (TextQueries), and both are shaped for
  * 100 TB: inverted-index joins instead of pairwise scans, and a
  * two-level distributed prefix sum instead of a global single-partition
  * window.
  *
  * Every operator here returns UNSORTED rows: a total ORDER BY is
  * presentation, not semantics, and on an input-sized result it is a
  * full-dataset range exchange the consumer never asked for. The
  * oracle gates sort at the edge; PlanSpec audits that no operator
  * plan ends in a global Sort.
  */
object Curation {

  /** Benchmark decontamination: flag training documents that share any
    * word n-gram with an evaluation/benchmark document — the standard
    * guard against test-set leakage into a pretraining corpus.
    *
    * Shape: build the benchmark's n-gram set once (typically tiny next
    * to the corpus — Spark broadcasts it under the configured
    * threshold), inverted-index join the training side's n-grams
    * against it, and aggregate per training doc. No pairwise doc scan
    * anywhere; the join key is the n-gram itself. Long n-grams (n ≥ 5
    * in practice) keep per-key fan-out near 1, which is why
    * decontamination pipelines use them — a hot-key cap would silently
    * drop true contamination, so none is applied here by design.
    *
    * Returns one row per CONTAMINATED training doc:
    * (doc_id, hits = distinct shared n-grams, bench_docs = distinct
    * benchmark docs sharing at least one n-gram).
    */
  def decontaminate(train: DataFrame, bench: DataFrame, id: String,
      text: String, n: Int): DataFrame = {
    // WordShingles (compiled per-row loop) emits each doc's DISTINCT
    // n-grams in one pass, so the per-side dropDuplicates SHUFFLE the
    // interpreted transform/slice/array_join chain needed is gone —
    // a doc's grams all live in its own pre-explode row, never across
    // partitions, so per-row distinctness IS per-doc distinctness
    def ngrams(df: DataFrame, idAlias: String) = df
      .select(col(id).as(idAlias),
        explode(graft.functions.TextFunctions.wordShingles(col(text), n)).as("g"))
    val tg = ngrams(train, "doc_id")
    val bg = ngrams(bench, "bench_id")
    tg.join(bg, "g")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("g")).as("hits"),
        count_distinct(col("bench_id")).as("bench_docs"))
  }

  /** Graded contamination: per TRAIN document, what fraction of its
    * distinct word n-grams also occur anywhere in the benchmark set —
    * the scoring form of [[decontaminate]] (which returns matched docs
    * only). Every train doc gets a row, so a pipeline can threshold at
    * any strictness without re-running the join.
    *
    * Same scale shape as decontaminate: inverted-index equi-join on
    * the n-gram (benchmark side distinct-gram set, broadcastable at
    * corpus scale), one hash aggregate per side — never a doc×doc
    * comparison.
    */
  def contaminationScore(train: DataFrame, bench: DataFrame, id: String,
      text: String, n: Int): DataFrame = {
    // same WordShingles shape as [[decontaminate]]: per-row distinct
    // grams make the per-side dropDuplicates shuffle unnecessary
    def ngrams(df: DataFrame) = df
      .select(col(id).as("doc_id"),
        explode(graft.functions.TextFunctions.wordShingles(col(text), n)).as("g"))
    // ONE pass over the train n-gram table: a LEFT join against the
    // (broadcastable) benchmark gram set marks hits, and a single
    // aggregate counts totals and hits together — the naive
    // totals-aggregate + hits-aggregate form would execute the
    // explode plan twice. DISTINCT aggregates, not plain counts:
    // per-row distinctness covers per-doc distinctness only while
    // doc ids are unique, and an input carrying the same id twice
    // (re-ingested doc, sharded text) must still score its distinct
    // gram set, not a row-weighted average
    val marked = ngrams(train)
      .join(ngrams(bench).select(col("g"), lit(1).as("_hit")).distinct(), Seq("g"), "left")
    val scored = marked.groupBy(col("doc_id"))
      .agg(count_distinct(col("g")).as("n_grams"),
        count_distinct(when(col("_hit").isNotNull, col("g"))).as("hits"))
    // left join from the full train id set: docs too short for any
    // n-gram still score, at 0
    train.select(col(id).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(0.0))
          .otherwise(floor(coalesce(col("hits"), lit(0L)).cast("double")
            / col("n_grams").cast("double")
            * 10000 + lit(0.5)) / 10000.0).as("overlap_r4"))
  }

  /** Data-mixing sampler: per-stratum target weights, fractional AND
    * upsampling (w = 1.5 → every doc once plus a second copy with
    * probability 0.5 — epoch mixing for high-quality sources). The
    * draw is the deterministic md5-uniform of "mix:<id>", so the
    * result is identical across partitionings, retries and engines;
    * weights should be exact binary fractions (0.25, 0.5, 1.5, …) so
    * `w - floor(w)` threshold comparisons are bit-exact too.
    * Returns (doc_id, stratum, n_copies); n_copies = 0 means dropped.
    * Pure codegen'd column math — embarrassingly parallel.
    */
  def mixtureSample(df: DataFrame, id: String, stratum: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(stratum) === k, lit(v)).otherwise(acc)
    }
    val u = graft.functions.HashRandom.uniform(
      concat(lit("mix:"), col(id).cast("string")))
    df.select(col(id).as("doc_id"), col(stratum).as("stratum"),
      (floor(w) + when(u < w - floor(w), 1L).otherwise(0L)).cast("long").as("n_copies"))
  }

  /** Priority sampling (Duffield–Lund–Thorup): a weighted sample of k
    * items WITHOUT replacement carrying unbiased subset-sum estimates —
    * the principled way to keep a small audited slice of a huge corpus
    * whose per-item weights (tokens, bytes) must still sum correctly
    * in expectation. priority = w / u with u the deterministic
    * md5-uniform of "prio:<id>"; keep the k highest priorities; the
    * (k+1)-th priority τ gives each kept item the estimator
    * est = max(w, τ) (Σ est is unbiased for Σ w; τ = 0 when the corpus
    * has ≤ k items, collapsing est to the exact weight).
    *
    * 100 TB shape: the priority is one codegen'd IEEE division per row
    * (hash-derived u, so identical across partitionings, retries, and
    * engines — no `rand()`); top-(k+1) is a TakeOrderedAndProject
    * (per-partition heads, driver-side merge of (k+1)-row partials —
    * the corpus is never shuffled); everything after runs on k+1 rows
    * (the unpartitioned window is bounded by construction).
    *
    * Returns (id, weight, est_weight) with est_weight half-up-rounded
    * to 2 dp (one IEEE max + round — oracle-exact).
    */
  def prioritySample(df: DataFrame, id: String, weight: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = graft.functions.HashRandom.uniform(
      concat(lit("prio:"), col(id).cast("string")))
    val pr = df.select(col(id), col(weight).cast("double").as("weight"))
      .withColumn("_prio", col("weight") / u)
    // persist the (k+1)-row take: the ranked output and the tau
    // aggregate both read it — without this the corpus is scanned twice
    val top = graft.CacheRegistry.retain(
      pr.orderBy(desc("_prio"), col(id)).limit(k + 1).persist())
    val ranked = top.withColumn("_rn",
      row_number().over(Window.orderBy(desc("_prio"), col(id))))
    val tau = ranked.agg(coalesce(
      min(when(col("_rn") === k + 1, col("_prio"))), lit(0.0)).as("_tau"))
    ranked.filter(col("_rn") <= k)
      .crossJoin(broadcast(tau))
      .select(col(id), col("weight"),
        graft.functions.Arith.r2(greatest(col("weight"), col("_tau")))
          .as("est_weight"))
  }

  /** Token-budget shard packing: lay the corpus out in its deterministic
    * shuffle order (md5 shuffle key — same convention as the dataset
    * split) and cut it into shards of ~`budget` tokens: each document's
    * shard is `floor(global_token_start / budget)` — the shard its first
    * token lands in.
    *
    * Logically this is one global running sum over the shuffle order.
    * Executing it as `Window.orderBy(...)` with no partition key would
    * collapse 100 TB into a single task, so the plan is the classic
    * two-level prefix sum instead:
    *   1. bucket = first byte of the md5 shuffle key — 256 deterministic
    *      range buckets whose ORDER matches the global key order (hex
    *      string order is byte order);
    *   2. per-bucket running sums in parallel (window PARTITIONed BY
    *      bucket);
    *   3. per-bucket totals (256 rows) → cumulative offsets on the
    *      driver-scale side, broadcast back.
    * The result is bit-identical to the single global window — the
    * oracle computes THAT form — while every big stage stays parallel.
    * At 1000 executors, widen the prefix to 2 bytes (65k buckets) the
    * same way.
    *
    * Returns (doc_id, tokens, shard_id, shard_pos) — shard_pos = token
    * offset of the document within its shard. Documents longer than
    * `budget` overflow their shard (standard packing semantics: a shard
    * owns every document STARTING in it).
    */
  def packShards(docs: DataFrame, id: String, tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"shard budget must be positive, got $budget")
    val keyed = docs.select(
      col(id).as("doc_id"),
      tokens.cast("long").as("tokens"),
      md5(concat(lit("shuffle:"), col(id).cast("string"))).as("sk"))
      .withColumn("bucket", conv(substring(col("sk"), 1, 2), 16, 10).cast("int"))
    val inBucket = keyed.withColumn("cum",
      sum(col("tokens")).over(
        Window.partitionBy(col("bucket")).orderBy(col("sk"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // 256-row side: cumulative token count of all PRECEDING buckets.
    // The single-group partition key (bucket mod 1 — non-foldable, so
    // Catalyst keeps it) makes the deliberate single-task window explicit
    // in the plan instead of tripping WindowExec's no-partition warning —
    // this side is bounded by the bucket count, never by the corpus.
    val offsets = keyed.groupBy(col("bucket"))
      .agg(sum(col("tokens")).as("btotal"))
      .withColumn("boffset",
        coalesce(sum(col("btotal")).over(
          Window.partitionBy(pmod(col("bucket"), lit(1))).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boffset"))
    inBucket.join(broadcast(offsets), "bucket")
      .withColumn("gstart", col("boffset") + col("cum") - col("tokens"))
      .withColumn("shard_id", floor(col("gstart") / budget.toDouble).cast("long"))
      .select(col("doc_id"), col("tokens"), col("shard_id"),
        (col("gstart") - col("shard_id") * budget).as("shard_pos"))
  }

  /** C4-style LINE-level dedup: split every document into fixed-width
    * word spans ("lines" — the fixture corpus has no newlines, so the
    * span width parameterizes the line notion), drop every occurrence
    * of a span that appears elsewhere in the corpus EXCEPT one global
    * keeper, and reassemble each document from its surviving spans in
    * order. The standard pretraining cleanup for boilerplate repeated
    * across pages (nav bars, license headers, cookie banners).
    *
    * Keeper rule: the occurrence with the smallest (doc_id, pos) —
    * deterministic, engine-replayable, no dependence on partitioning.
    *
    * Shape, all corpus-sized stages distributed:
    *   1. explode to (doc_id, pos, span) — narrow rows;
    *   2. global keeper per distinct span: ONE hash aggregate
    *      (min_by struct — map-side combined, shuffle carries distinct
    *      spans, not occurrences);
    *   3. equi-join occurrences to keepers on the span (broadcast when
    *      the distinct side is small, shuffle join at corpus scale) —
    *      keep occurrences that ARE their span's keeper;
    *   4. per-doc ordered reassembly: sort_array(struct(pos, span)) in
    *      a hash aggregate — per-DOC state only, never a window.
    * Returns (doc_id, text, n_spans, n_kept) with `text` rebuilt from
    * kept spans; docs whose every span was deduplicated away keep a
    * row with empty text (the caller decides whether to drop them).
    */
  /** LEAKAGE-SAFE train/val/test split: the assignment hashes the
    * document's NEAR-DUP CLUSTER id, not the document id, so two
    * near-duplicates can never straddle the train/test boundary — the
    * eval-contamination leak a per-doc split (x_train_split's shape)
    * structurally allows: a test document whose near-twin sits in
    * train is a leaked answer, and at corpus scale the per-doc split
    * leaks one for every near-dup pair.
    *
    * `pairs` is any (d1, d2) near-dup pair table (MinHash-LSH, SimHash,
    * embedding-blocked — the caller picks the notion of "too similar
    * to separate"); clusters come from [[Dedup.neardupClusters]]'s
    * scale-safe connected components, and the split is the same
    * md5-uniform hash discipline as the per-doc split, keyed on the
    * cluster representative. Singletons hash on themselves, so on a
    * mostly-unique corpus the marginal distribution matches the
    * requested percentages exactly as the per-doc form does.
    *
    * Returns (doc, cluster_id, cluster_size, split) — unsorted, like
    * every operator here. */
  def leakageSafeSplit(docs: DataFrame, id: String, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 1 && trainPct <= 100, s"bad trainPct $trainPct")
    require(valPct >= 0 && trainPct + valPct <= 100,
      s"train + val must fit in 100, got $trainPct + $valPct")
    val u = graft.functions.HashRandom.uniform(
      concat(lit("split:"), col("cluster_id").cast("string")))
    Dedup.neardupClusters(docs, id, pairs)
      .select(col("doc"), col("cluster_id"), col("cluster_size"),
        when(u < trainPct / 100.0, "train")
          .when(u < (trainPct + valPct) / 100.0, "val")
          .otherwise("test").as("split"))
  }

  def lineDedup(df: DataFrame, id: String, text: String,
      spanWords: Int): DataFrame = {
    require(spanWords >= 1, s"spanWords must be >= 1, got $spanWords")
    val spans = df
      .select(col(id).as("doc_id"), split(col(text), " ").as("w"))
      .select(col("doc_id"), posexplode(
        transform(
          sequence(lit(0), floor((size(col("w")) - 1) / spanWords).cast("int")),
          i => array_join(slice(col("w"), i * spanWords + 1, lit(spanWords)), " "))))
      .withColumnRenamed("pos", "pos").withColumnRenamed("col", "span")
    val keepers = spans
      .groupBy(col("span"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("keep"))
      .select(col("span"), col("keep.doc_id").as("k_doc"), col("keep.pos").as("k_pos"))
    spans
      .join(keepers, "span")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("doc_id") === col("k_doc") && col("pos") === col("k_pos"), 1L)
          .otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(
              when(col("doc_id") === col("k_doc") && col("pos") === col("k_pos"),
                struct(col("pos"), col("span"))))),
            x => x.getField("span")),
          " ").as("text"))
      .select(col("doc_id"), col("text"), col("n_spans"), col("n_kept"))
  }

  /** Per-group quota cap — "at most `cap` documents per source/domain",
    * the curation step that stops over-represented sources from
    * dominating a training mix. The kept subset is the `cap` SMALLEST
    * md5("cap:" ++ id) values per group: a uniform, reproducible draw
    * (insertion order would keep whatever happened to land first in
    * the files — crawl-order bias), and the same construction a SQL
    * oracle replays.
    *
    * Shape: TWO-PHASE quota, because the single `row_number() OVER
    * (PARTITION BY group)` form funnels the hottest source — by
    * definition the largest — through one task's sort, the exact skew
    * this operator exists to tame.
    *
    *   Phase 1 (pre-prune): rank within (group, bucket) where bucket =
    *     the first `bucketChars` hex chars of the md5 draw. The hash is
    *     uniform, so a mega-group splits evenly across the 16^bucketChars
    *     sub-sorts; keep per-bucket rank <= cap. Lossless: every member
    *     of the group's global cap-smallest set has fewer than `cap`
    *     group-mates hashing below it ANYWHERE, hence per-bucket rank
    *     <= cap — the global winners always survive.
    *   Phase 2 (exact): the surviving <= 16^bucketChars * cap rows per
    *     group get the exact `row_number` the oracle replays.
    *
    * The hot group's largest single-task sort drops from |group| to
    * |group| / 16^bucketChars; widen `bucketChars` to 3-4 on a
    * 1000-executor cluster the same way packShards widens its prefix.
    */
  /** Sliding-window document chunking: split each document's token
    * stream into windows of `window` tokens advancing by
    * `window - overlap` — the sequence-preparation step before
    * training (fixed-context packing) and the passage split RAG
    * retrieval indexes. The last window may be short; every token
    * appears in at least one chunk; consecutive chunks share exactly
    * `overlap` tokens (except at the tail).
    *
    * Output: (doc_id, chunk_idx, chunk_text, n_tokens) — one row per
    * chunk, in document order by chunk_idx.
    *
    * Scale shape: pure per-row column math (split once, slice per
    * window via transform over a sequence) — no shuffle, no window
    * function, embarrassingly parallel; the explode fan-out is
    * len/stride per document, the output's inherent size.
    */
  def chunkDocs(df: DataFrame, id: String, text: String,
      window: Int, overlap: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window), got $overlap (window $window)")
    val stride = window - overlap
    // number of windows: 1 + ceil(max(0, len - window) / stride)
    val n = lit(1) + ceil(
      greatest(size(col("w")) - lit(window), lit(0)).cast("double") / lit(stride))
      .cast("int")
    df.select(col(id).as("doc_id"), split(col(text), " ").as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(transform(sequence(lit(0), n - 1),
          i => slice(col("w"), i * stride + 1, lit(window)))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  def capPerGroup(df: DataFrame, group: String, id: String, cap: Int,
      bucketChars: Int = 2): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1,8], got $bucketChars")
    val hashed = df
      .withColumn("_ck", md5(concat(lit("cap:"), col(id).cast("string"))))
    val pruned = hashed
      .withColumn("_pn", row_number().over(
        Window.partitionBy(col(group), substring(col("_ck"), 1, bucketChars))
          .orderBy(col("_ck"), col(id))))
      .filter(col("_pn") <= cap)
    pruned
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(group)).orderBy(col("_ck"), col(id))))
      .filter(col("_rn") <= cap)
      .drop("_ck", "_pn", "_rn")
  }
}
