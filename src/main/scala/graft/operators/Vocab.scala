package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary-induction statistics for tokenizer training over a
  * document corpus: BPE pair counts (the counting step of every BPE
  * merge iteration) and Good-Turing count-of-counts tables (the
  * smoothing input for n-gram LM quality filters).
  *
  * Scale discipline shared by both: compress corpus → vocabulary
  * FIRST (one hash aggregate whose shuffle is vocabulary-bounded),
  * then run the per-word/per-gram expansion over the DISTINCT table
  * weighted by its frequency — at 100 TB the explode runs over the
  * vocabulary (thousands of rows), never the corpus.
  */
object Vocab {

  /** Adjacent symbol-pair counts over the initial character alphabet —
    * one BPE training iteration's statistics (the merge rule is
    * "most frequent pair"; ties broken lexicographically by the
    * caller's sort). Overlapping pairs count every occurrence
    * ("aaa" contributes "aa" twice), matching the standard algorithm.
    * Returns the full unordered (pair, cnt) table; rank/limit at the
    * consumer.
    */
  def bpePairCounts(df: DataFrame, text: String): DataFrame = {
    val wordFreq = df.select(explode(split(col(text), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
    wordFreq
      .select(col("wf"), explode(
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("cnt"))
  }

  /** One merge rule learned by [[bpeTrain]]: at `step`, the corpus's
    * most frequent adjacent symbol pair (`left`, `right`) — ties broken
    * lexicographically on the pair — was fused into `merged`, having
    * been observed `cnt` times (weighted by word frequency). */
  final case class BpeMerge(step: Int, left: String, right: String,
      merged: String, cnt: Long)

  /** Iterative BPE vocabulary induction: `k` merge rounds of
    * count-pairs → argmax → apply-merge, each deterministic (exact
    * integer counts; lexicographic tiebreak), so the whole merge
    * sequence is replayable by any engine.
    *
    * Scale shape: the corpus is compressed to the distinct-word table
    * once (the only corpus-sized aggregate); every iteration then runs
    * over the VOCABULARY — a pair-count hash aggregate (shuffle bounded
    * by the symbol-pair vocabulary), a 1-row argmax collect (the merge
    * rule — model state, the thing BPE training exists to produce), and
    * a codegen'd `replace` over the word table. Each iteration's word
    * table is persisted via [[graft.CacheRegistry]] and the previous
    * one released, so iteration i never re-runs iterations 1..i-1.
    *
    * Words are held as symbol sequences joined by `sep` (a control
    * char that never appears in text words — words containing it are
    * dropped identically by the oracle). Merge application is
    * left-to-right non-overlapping `replace(seq, a+sep+b, a+b)` —
    * exactly the standard greedy BPE merge scan ("aaa" under (a,a)
    * becomes ["aa","a"]).
    *
    * Returns the merge-rule table (step, left, right, merged, cnt) —
    * k rows, the trained vocabulary's delta from the char alphabet.
    */
  def bpeTrain(df: DataFrame, text: String, k: Int,
      sep: String = "\u001f"): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val spark = df.sparkSession
    import spark.implicits._

    // Corpus → distinct words with frequency; symbols start as chars.
    var vocab = graft.CacheRegistry.retain(
      df.select(explode(split(col(text), " ")).as("w"))
        .filter(length(col("w")) >= 2 && !col("w").contains(sep))
        .groupBy(col("w")).agg(count(lit(1)).as("wf"))
        // char alphabet via substring (not split(w, "") — that keeps a
        // trailing empty token under Spark's limit=-1 split semantics)
        .select(array_join(
          transform(sequence(lit(1), length(col("w"))),
            i => col("w").substr(i, lit(1))), sep).as("seq"), col("wf"))
        .persist())

    val merges = scala.collection.mutable.ListBuffer.empty[BpeMerge]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val syms = split(col("seq"), java.util.regex.Pattern.quote(sep))
      val pairs = vocab
        .select(col("wf"), explode(
          when(size(syms) >= 2,
            transform(sequence(lit(1), size(syms) - 1),
              i => concat(element_at(syms, i), lit(sep),
                element_at(syms, i + 1))))
            .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wf")).as("cnt"))
      // 1-row argmax: the learned merge rule (driver-side model state).
      val best = pairs.orderBy(desc("cnt"), col("pair")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val i = pair.indexOf(sep) // symbols never contain sep: one split point
        val (a, b) = (pair.substring(0, i), pair.substring(i + 1))
        merges += BpeMerge(step, a, b, a + b, cnt)
        // exact (non-regex) replace — left-to-right non-overlapping,
        // same semantics as the oracle's replace()
        val next = graft.CacheRegistry.retain(
          vocab.withColumn("seq",
            replace(col("seq"), lit(a + sep + b), lit(a + b)))
            .persist())
        next.count() // materialize before releasing the parent
        vocab.unpersist(false)
        vocab = next
        step += 1
      }
    }
    merges.toSeq.toDF()
      .select(col("step"), col("left").as("left_sym"),
        col("right").as("right_sym"), col("merged"), col("cnt"))
  }

  /** Tokenize the corpus with a TRAINED merge list ([[bpeTrain]]'s
    * output, in step order): the encode half of the BPE pipeline.
    * Returns the token-frequency table (token, cnt).
    *
    * Scale shape: one corpus-sized word aggregate, then k chained
    * non-regex `replace`s over the DISTINCT word table — a single
    * codegen'd projection, no shuffle — and one vocabulary-sized token
    * explode/aggregate. Applying merges in training order over the
    * separator representation replays training exactly, so encoding
    * the training corpus reproduces the trained segmentation.
    */
  def bpeApply(df: DataFrame, text: String,
      merges: Seq[(String, String)], sep: String = "\u001f"): DataFrame = {
    val wordFreq = df.select(explode(split(col(text), " ")).as("w"))
      .filter(length(col("w")) >= 2 && !col("w").contains(sep))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
      .select(array_join(
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))), sep).as("seq"), col("wf"))
    val encoded = merges.foldLeft(col("seq")) { case (c, (a, b)) =>
      replace(c, lit(a + sep + b), lit(a + b))
    }
    wordFreq
      .select(col("wf"), explode(split(encoded,
        java.util.regex.Pattern.quote(sep))).as("token"))
      .groupBy(col("token")).agg(sum(col("wf")).as("cnt"))
  }

  /** Production BPE encoder for ARBITRARY merge-list sizes: the same
    * token-frequency contract AND semantics as [[bpeApply]], but the
    * merge fold runs per word inside one mapPartitions pass instead of
    * a k-deep chain of `replace` expressions — a 32k-merge production
    * tokenizer is a broadcast table per executor, not a 32k-node
    * expression tree that breaks codegen (the reason [[bpeApply]] is
    * only sound for small k). This is the one place a JVM closure
    * genuinely beats a Catalyst expression: data-dependent iteration
    * over a vocabulary-sized rule table is control flow no expression
    * DAG expresses at that scale.
    *
    * Semantics note (why this is a sequential REPLAY, not a rank-heap
    * encoder): this engine's merge application — in [[bpeTrain]],
    * [[bpeApply]], and the DuckDB oracle alike — is
    * `replace(seq, a+sep+b, a+b)` on the separator-joined string,
    * which matches wherever the CHARACTERS of `a` precede a separator
    * and those of `b` follow it, even when they are fragments of
    * larger symbols (merging (d,b) fuses ["bd","bd"] into "bdbd").
    * Canonical symbol-aligned BPE would diverge on such words; the
    * engine's definition is self-consistent and deterministic, so the
    * encoder replays the identical fold: every merge, in training
    * order, as a left-to-right non-overlapping string replace
    * (`java.lang.String.replace` has exactly the semantics of Spark's
    * `replace` and DuckDB's).
    *
    * Large-k cost control: a merge can only fire at a separator whose
    * surrounding character pair equals (last char of a, first char of
    * b) — and deleting separators never changes the character
    * sequence, so a word's possible boundary digrams are fixed up
    * front. Merges are bucketed by boundary digram once per partition;
    * each word then visits ONLY the merges whose digram it contains
    * (restored to training order), so per-word cost scales with the
    * word's digram-matched rules, not with k. VocabSpec pins exact
    * parity with [[bpeApply]] at small k and runs k=512.
    *
    * Scale shape: one corpus-sized word aggregate (identical to
    * [[bpeApply]]), then embarrassingly-parallel per-word encoding
    * over the DISTINCT word table — no shuffle beyond the final
    * vocabulary-sized token aggregate; the merge table rides the
    * broadcast, not the rows.
    */
  def bpeEncodeLargeK(df: DataFrame, text: String,
      merges: Seq[(String, String)], sep: String = "\u001f"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(sep.length == 1, s"sep must be a single char, got '$sep'")
    val wordFreq = df.select(explode(split(col(text), " ")).as("w"))
      .filter(length(col("w")) >= 2 && !col("w").contains(sep))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
    val mergeArr = merges.toArray
    val bcMerges = spark.sparkContext.broadcast(mergeArr)
    val sepChar = sep.charAt(0)
    val encoded = wordFreq.as[(String, Long)].mapPartitions { rows =>
      // per-partition init: patterns/replacements materialized once,
      // merge indexes bucketed by their boundary digram
      val ms = bcMerges.value
      val patterns = new Array[String](ms.length)
      val fused = new Array[String](ms.length)
      val byDigram = new java.util.HashMap[Int, java.util.ArrayList[Integer]]()
      var i = 0
      while (i < ms.length) {
        val (a, b) = ms(i)
        patterns(i) = a + sepChar + b
        fused(i) = a + b
        val key = (a.charAt(a.length - 1).toInt << 16) | b.charAt(0).toInt
        var bucket = byDigram.get(key)
        if (bucket == null) {
          bucket = new java.util.ArrayList[Integer]()
          byDigram.put(key, bucket)
        }
        bucket.add(i)
        i += 1
      }
      rows.map { case (w, wf) =>
        (encodeWord(w, sepChar, patterns, fused, byDigram), wf)
      }
    }.toDF("tokens", "wf")
    encoded
      .select(col("wf"), explode(col("tokens")).as("token"))
      .groupBy(col("token")).agg(sum(col("wf")).as("cnt"))
  }

  /** One word through the merge fold: gather the merges whose boundary
    * digram appears among the word's adjacent character pairs, then
    * apply exactly those, in training order, as left-to-right
    * non-overlapping string replaces over the separator-joined form —
    * the same fold [[bpeApply]] builds as a Catalyst expression chain,
    * minus the provable no-ops. */
  private def encodeWord(w: String, sep: Char, patterns: Array[String],
      fused: Array[String],
      byDigram: java.util.HashMap[Int, java.util.ArrayList[Integer]]): Array[String] = {
    // candidate merges = union of the word's digram buckets, deduped
    // and restored to training order by the sorted set
    val cand = new java.util.TreeSet[Integer]()
    var j = 0
    while (j < w.length - 1) {
      val bucket = byDigram.get((w.charAt(j).toInt << 16) | w.charAt(j + 1).toInt)
      if (bucket != null) cand.addAll(bucket)
      j += 1
    }
    // separator-joined char alphabet
    val sb = new java.lang.StringBuilder(w.length * 2 - 1)
    var c = 0
    while (c < w.length) {
      if (c > 0) sb.append(sep)
      sb.append(w.charAt(c))
      c += 1
    }
    var seq = sb.toString
    val it = cand.iterator()
    // a fully-fused word (no separator left) exits early: no later
    // merge can apply
    while (it.hasNext && seq.indexOf(sep.toInt) >= 0) {
      val idx = it.next()
      seq = seq.replace(patterns(idx), fused(idx))
    }
    seq.split(java.util.regex.Pattern.quote(sep.toString))
  }

  /** The CTE chain shared by the train and encode oracles: v0 (the
    * char-alphabet word table) plus k unrolled count/argmax/replace
    * stages — `p$i` / `b$i` / `v$i` for i in 1..k. Every stage is
    * MATERIALIZED: each v$i is referenced by both p$(i+1) and v$(i+1),
    * so DuckDB's default CTE inlining would re-evaluate the chain
    * exponentially (2^k base scans); materialization keeps the oracle
    * linear in k, like the engine's persisted iteration. */
  private def bpeCtes(src: String, text: String, k: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH v0 AS MATERIALIZED (
              |  SELECT array_to_string(list_transform(
              |           generate_series(1, length(w)), i -> w[i]), chr(31)) AS seq,
              |         count(*) AS wf
              |  FROM (SELECT unnest(string_split($text, ' ')) AS w FROM $src)
              |  WHERE length(w) >= 2 AND NOT contains(w, chr(31))
              |  GROUP BY 1
              |)""".stripMargin
    for (i <- 1 to k) {
      sb ++= s""",
                |p$i AS MATERIALIZED (
                |  SELECT pair, CAST(sum(wf) AS BIGINT) AS cnt FROM (
                |    SELECT wf, unnest(list_transform(
                |             generate_series(1, len(syms) - 1),
                |             j -> syms[j] || chr(31) || syms[j + 1])) AS pair
                |    FROM (SELECT wf, string_split(seq, chr(31)) AS syms FROM v${i - 1})
                |  ) GROUP BY pair
                |),
                |b$i AS MATERIALIZED (SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
                |v$i AS MATERIALIZED (
                |  SELECT replace(seq, (SELECT pair FROM b$i),
                |                 replace((SELECT pair FROM b$i), chr(31), '')) AS seq, wf
                |  FROM v${i - 1}
                |)""".stripMargin
    }
    sb.toString
  }

  /** DuckDB replay of [[bpeApply]] over merges learned by a k-round
    * [[bpeTrain]] on the SAME corpus: the final vocabulary stage v$k
    * IS the encoded word table; unnest its symbols weighted by word
    * frequency. Rank/limit matches the gate edge. */
  def bpeEncodeOracleSql(src: String, text: String, k: Int, topN: Int): String =
    bpeCtes(src, text, k) +
      s"""
         |SELECT token, CAST(sum(wf) AS BIGINT) AS cnt FROM (
         |  SELECT wf, unnest(string_split(seq, chr(31))) AS token FROM v$k
         |)
         |GROUP BY token ORDER BY cnt DESC, token LIMIT $topN""".stripMargin

  /** DuckDB replay of [[bpeTrain]]: the same count → argmax → replace
    * loop unrolled as k CTE stages (each deterministic, so the merge
    * sequences match row-for-row). `chr(31)` is the symbol separator. */
  def bpeTrainOracleSql(src: String, text: String, k: Int): String = {
    val union = (1 to k).map { i =>
      s"""SELECT $i AS step, split_part(pair, chr(31), 1) AS left_sym,
         |       split_part(pair, chr(31), 2) AS right_sym,
         |       replace(pair, chr(31), '') AS merged, cnt FROM b$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    bpeCtes(src, text, k) + s"\n$union\nORDER BY step"
  }

  /** Statistical LM quality scoring, integer-exact: per document, the
    * mean and sum of bigram SURPRISE = ⌊c(w1·)·scale / c(w1,w2)⌋ — the
    * reciprocal of the conditional bigram probability P(w2|w1),
    * integer-scaled. High surprise = improbable word transitions under
    * the corpus's own bigram statistics (gibberish, boilerplate
    * splices, wrong-language fragments) — the role a KenLM perplexity
    * filter plays in CCNet-style pipelines.
    *
    * Why not perplexity itself: perplexity is a log-domain mean, and
    * log is not bit-portable across engines — a hash gate would flake
    * on last-ulp differences. Surprise is a monotone transform of the
    * same per-bigram quantity computed ENTIRELY in integer arithmetic
    * (counts, one scaled division, floor), so Spark and DuckDB agree
    * bit-for-bit and the quality ORDERING is preserved.
    *
    * Scale shape: two vocabulary-sized count aggregates (bigram and
    * bigram-left tables), then one join of the corpus bigram stream
    * against them — the join keys are vocabulary entries, so AQE
    * broadcast/skew handling applies; per-doc aggregation is one hash
    * aggregate. Scoring the corpus against its own counts means no
    * zero-count branch (every scored bigram was counted).
    */
  def lmSurprise(df: DataFrame, id: String, text: String,
      scale: Long = 1000L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val grams = df.select(col(id).as("doc_id"), split(col(text), " ").as("w"))
      .select(col("doc_id"), explode(
        when(size(col("w")) >= 2,
          transform(sequence(lit(0), size(col("w")) - 2),
            i => struct(element_at(col("w"), i + 1).as("w1"),
              element_at(col("w"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val bi = grams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val left = bi.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val scored = grams
      .join(bi, Seq("w1", "w2"))
      .join(left, Seq("w1"))
      .select(col("doc_id"),
        // `div`, not `/`: Spark's `/` on longs divides in DOUBLE and a
        // floor of that can disagree with true integer division right
        // at integer boundaries; `div` is exact like DuckDB's `//`
        expr(s"(c1 * ${scale}L) div c2").cast("long").as("surprise"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("surprise")).as("surprise_sum"))
    df.select(col(id).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprise_sum"), lit(0L)).as("surprise_sum"),
        when(col("n_bigrams").isNotNull,
          expr("surprise_sum div n_bigrams").cast("long"))
          .otherwise(lit(0L)).as("surprise_avg"))
  }

  /** DuckDB replay of [[lmSurprise]] — identical integer arithmetic. */
  def lmSurpriseOracleSql(src: String, idSql: String, textSql: String,
      scale: Long = 1000L): String =
    s"""WITH grams AS (
       |  SELECT $idSql AS doc_id, w[i] AS w1, w[i + 1] AS w2
       |  FROM (SELECT $idSql, string_split($textSql, ' ') AS w FROM $src),
       |       UNNEST(generate_series(1, len(w) - 1)) t(i)
       |), bi AS (
       |  SELECT w1, w2, count(*) AS c2 FROM grams GROUP BY w1, w2
       |), lft AS (
       |  SELECT w1, sum(c2) AS c1 FROM bi GROUP BY w1
       |), scored AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |         CAST(sum(c1 * $scale // c2) AS BIGINT) AS surprise_sum
       |  FROM grams JOIN bi USING (w1, w2) JOIN lft USING (w1)
       |  GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |       CAST(coalesce(s.surprise_sum, 0) AS BIGINT) AS surprise_sum,
       |       CAST(CASE WHEN s.n_bigrams IS NOT NULL
       |                 THEN s.surprise_sum // s.n_bigrams ELSE 0 END AS BIGINT)
       |         AS surprise_avg
       |FROM (SELECT DISTINCT $idSql AS doc_id FROM $src) d
       |LEFT JOIN scored s USING (doc_id)""".stripMargin

  // --- unigram-LM (SentencePiece-style) tokenizer ------------------------

  /** A trained unigram piece: corpus count from the last EM round and
    * the integer Viterbi cost derived from it. */
  final case class UnigramPiece(piece: String, cnt: Long, cost: Long)

  /** floor(log2(x)) for x >= 1 via the binary-string length — the one
    * integer log both engines evaluate identically (Spark `bin`,
    * DuckDB `bin`: no leading zeros, so length-1 IS the bit position).
    * No float log anywhere in the tokenizer. */
  private[graft] def floorLog2(x: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(x)

  /** Integer Viterbi cost of a piece with count c out of total T:
    * floorLog2((T·1024) div c) — the scaled-integer surrogate for
    * −log2 p(piece) (same discipline as [[lmSurprise]]'s integer
    * surprise: `div`, not float division, so DuckDB `//` replays it
    * bit for bit). c <= T makes every cost >= 10 > 0, so Viterbi
    * always prefers fewer pieces at equal probability mass. A
    * zero-count survivor (a character no optimal path used this
    * round — never pruned, for totality) prices one worse than a
    * count-1 piece: finite, so every word stays segmentable. */
  private[graft] def unigramCost(c: Long, total: Long): Long =
    if (c > 0) floorLog2((total * 1024L) / c)
    else floorLog2(total * 1024L) + 1L

  /** Forward/backward Viterbi DP over one word under a piece→cost
    * model (single chars are always in the model, so every position is
    * reachable). fwd(i) = cheapest segmentation of w[0,i); bwd(i) = of
    * w[i,n). INF marks out-of-vocab pieces. */
  private def unigramDp(w: String, cost: String => Long, maxLen: Int): (Array[Long], Array[Long]) = {
    val n = w.length
    val INF = 1000000000000L
    val fwd = Array.fill(n + 1)(INF)
    val bwd = Array.fill(n + 1)(INF)
    fwd(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val c = cost(w.substring(j, i))
        if (fwd(j) != INF && c < INF && fwd(j) + c < fwd(i)) fwd(i) = fwd(j) + c
        j += 1
      }
      i += 1
    }
    bwd(n) = 0L
    i = n - 1
    while (i >= 0) {
      var k = math.min(n, i + maxLen)
      while (k > i) {
        val c = cost(w.substring(i, k))
        if (bwd(k) != INF && c < INF && c + bwd(k) < bwd(i)) bwd(i) = c + bwd(k)
        k -= 1
      }
      i -= 1
    }
    (fwd, bwd)
  }

  /** The pieces lying on ANY optimal segmentation of `w` — the
    * "lattice support" membership test fwd(j) + cost + bwd(i) ==
    * fwd(n). This is the hard-EM count definition: deterministic (no
    * tie-break needed, unlike 1-best backtracking) and replayable by
    * two SQL folds plus a per-substring filter — no recursion. One
    * output entry per position pair, so a piece used twice counts
    * twice. */
  private[graft] def unigramOnPath(w: String, cost: String => Long,
      maxLen: Int): Seq[String] = {
    val (fwd, bwd) = unigramDp(w, cost, maxLen)
    val best = fwd(w.length)
    val out = Seq.newBuilder[String]
    var j = 0
    while (j < w.length) {
      var i = j + 1
      val top = math.min(w.length, j + maxLen)
      while (i <= top) {
        val p = w.substring(j, i)
        val c = cost(p)
        if (c < 1000000000000L && fwd(j) + c + bwd(i) == best) out += p
        i += 1
      }
      j += 1
    }
    out.result()
  }

  /** Canonical Viterbi segmentation: walk left to right, at each
    * position take the LONGEST piece on an optimal path. Safe (the
    * on-path invariant transfers: fwd(i) = fwd(j) + cost exactly when
    * the membership test passes) and deterministic — the greedy rule
    * is the tie-break, identical in the SQL replay's recursive walk. */
  private[graft] def unigramSegmentWord(w: String, cost: String => Long,
      maxLen: Int): Seq[String] = {
    val (fwd, bwd) = unigramDp(w, cost, maxLen)
    val best = fwd(w.length)
    val out = Seq.newBuilder[String]
    var j = 0
    while (j < w.length) {
      var i = math.min(w.length, j + maxLen)
      var chosen = -1
      while (chosen < 0 && i > j) {
        val c = cost(w.substring(j, i))
        if (c < 1000000000000L && fwd(j) + c + bwd(i) == best) chosen = i
        else i -= 1
      }
      // single chars are always in the vocab, so chosen is found
      out += w.substring(j, chosen)
      j = chosen
    }
    out.result()
  }

  /** Unigram-LM vocabulary induction (Kudo 2018, hard-EM variant):
    * seed with the most frequent substrings, then alternate
    * (E) count each piece's occurrences on optimal Viterbi
    * segmentations of the word vocabulary — the lattice-support
    * count, computed by forward+backward integer DP — and
    * (M) re-derive integer costs from the counts, pruning the
    * lowest-count multi-char pieces down to `vocabSize` (single
    * characters are never pruned, so segmentation totality holds).
    *
    * All arithmetic is integer-exact ([[unigramCost]]), so the entire
    * training run — seed selection, every round's counts, the final
    * cost table — replays in SQL (the x_unigram_train oracle unrolls
    * the rounds like bpeTrainOracleSql unrolls merges).
    *
    * Scale shape: the corpus compresses to the distinct-word table
    * once (the only corpus-sized aggregate, same as [[bpeTrain]]);
    * seeding explodes substrings of the WORD VOCABULARY; each round
    * is a mapPartitions DP over that word table with the (model-sized)
    * cost map broadcast, then a vocabulary-bounded count aggregate.
    * Driver state is the model itself — the thing training exists to
    * produce. Returns (piece, cnt, cost) sorted by piece. */
  def unigramTrain(df: DataFrame, text: String, vocabSize: Int, rounds: Int,
      maxLen: Int = 6, seedSize: Int = 500): DataFrame = {
    require(vocabSize >= 1 && rounds >= 1 && maxLen >= 2 && seedSize >= vocabSize,
      s"bad unigram params: vocabSize=$vocabSize rounds=$rounds maxLen=$maxLen seedSize=$seedSize")
    val spark = df.sparkSession
    import spark.implicits._
    val wordFreq = graft.CacheRegistry.retain(
      df.select(explode(split(col(text), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("wf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // seed counts: every substring occurrence (overlapping) of every
    // distinct word, weighted by word frequency — vocabulary-sized work
    val subCounts = wordFreq
      .select(col("wf"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))),
          j => transform(
            sequence(j, least(length(col("w")), j + lit(maxLen - 1))),
            i => col("w").substr(j, i - j + 1))))).as("p"))
      .groupBy(col("p")).agg(sum(col("wf")).as("cnt"))
    val chars = subCounts.filter(length(col("p")) === 1)
      .as[(String, Long)].collect().sortBy(_._1)
    val multi = subCounts.filter(length(col("p")) > 1)
      .orderBy(desc("cnt"), col("p")).limit(seedSize)
      .as[(String, Long)].collect()
    var model: Map[String, Long] = (chars ++ multi).toMap // piece -> cnt

    (1 to rounds).foreach { _ =>
      val total = model.values.sum
      val costs = model.map { case (p, c) => p -> unigramCost(c, total) }
      val bc = spark.sparkContext.broadcast(costs)
      val L = maxLen
      val counted = wordFreq.as[(String, Long)]
        .mapPartitions { it =>
          val m = bc.value
          def cost(p: String): Long = m.getOrElse(p, 1000000000000L)
          it.flatMap { case (w, wf) =>
            unigramOnPath(w, cost, L).map(p => (p, wf))
          }
        }
        .toDF("p", "wf")
        .groupBy(col("p")).agg(sum(col("wf")).as("cnt"))
        .as[(String, Long)].collect().toMap
      // M-step + prune: chars always survive (with their new counts —
      // 0 if no optimal path uses a bare char this round); multi-char
      // pieces keep the top slots by (cnt desc, piece asc)
      val charPieces = chars.map { case (p, _) => p -> counted.getOrElse(p, 0L) }
      val multiPieces = model.keysIterator
        .filter(_.length > 1)
        .map(p => p -> counted.getOrElse(p, 0L))
        .filter(_._2 > 0)
        .toSeq.sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - charPieces.length))
      model = (charPieces ++ multiPieces).toMap
    }
    val total = model.values.sum
    model.toSeq.sortBy(_._1)
      .map { case (p, c) => UnigramPiece(p, c, unigramCost(c, total)) }
      .toDF("piece", "cnt", "cost")
      .orderBy(col("piece"))
  }

  /** LOSS-RANKED pruning of a trained unigram model to an EXACT
    * target size — the SentencePiece elimination step that
    * [[unigramTrain]]'s count-ranked per-round prune approximates.
    * Each multi-char piece is priced by the corpus loss its removal
    * would cause: Σ_w wf(w) · (bestCost(w, model∖{p}) − bestCost(w)),
    * summed over the words whose optimal lattice uses p (for every
    * other word removal changes nothing, so the delta is exactly 0
    * and never computed). The target is met in ONE elimination:
    * keep every single character (segmentation totality — chars are
    * never candidates and carry loss 0) plus the highest-loss
    * multi-char pieces, ties broken by (loss desc, cnt desc, piece
    * asc) so the result is deterministic; surviving costs are
    * re-derived from the survivors' counts (the M-step discipline).
    * All arithmetic is the trainer's integer kind, so the whole
    * pricing — including the per-(word, piece) masked re-DP —
    * replays in SQL ([[unigramPruneOracleSql]], the
    * x_unigram_prune gate).
    *
    * Scale shape: pricing is a mapPartitions over the DISTINCT-WORD
    * table (the corpus never re-enters after the one word-frequency
    * aggregate), each word re-running its O(|w|·maxLen) DP once per
    * distinct multi-char piece on its optimal lattice — vocabulary-
    * sized work with the model broadcast, like a training round.
    *
    * `model` is (piece, cnt) as trained; returns (piece, cnt, cost,
    * loss) at exactly `targetSize` rows (or fewer if the model was
    * already smaller). */
  def unigramPrune(df: DataFrame, text: String, model: Seq[(String, Long)],
      targetSize: Int, maxLen: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val chars = model.filter(_._1.length == 1).sortBy(_._1)
    require(targetSize >= chars.length,
      s"targetSize $targetSize is below the ${chars.length} never-pruned single chars")
    val total = model.iterator.map(_._2).sum
    val costs = model.map { case (p, c) => p -> unigramCost(c, total) }.toMap
    val bc = spark.sparkContext.broadcast(costs)
    val L = maxLen
    val wordFreq = df.select(explode(split(col(text), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
    val losses = wordFreq.as[(String, Long)].mapPartitions { it =>
      val m = bc.value
      val INF = 1000000000000L
      def cost(p: String): Long = m.getOrElse(p, INF)
      it.flatMap { case (w, wf) =>
        val (fwd, _) = unigramDp(w, cost, L)
        val best = fwd(w.length)
        unigramOnPath(w, cost, L).distinct.filter(_.length > 1).map { p =>
          def masked(q: String): Long = if (q == p) INF else cost(q)
          val (fx, _) = unigramDp(w, masked, L)
          (p, wf * (fx(w.length) - best))
        }
      }
    }.toDF("p", "dl").groupBy(col("p")).agg(sum(col("dl")).as("loss"))
      .as[(String, Long)].collect().toMap // model-bounded metadata
    val survivors = chars.map { case (p, c) => (p, c, 0L) } ++
      model.filter(_._1.length > 1)
        .map { case (p, c) => (p, c, losses.getOrElse(p, 0L)) }
        .sortBy { case (p, c, l) => (-l, -c, p) }
        .take(targetSize - chars.length)
    val newTotal = survivors.iterator.map(_._2).sum
    survivors.sortBy(_._1)
      .map { case (p, c, l) => (p, c, unigramCost(c, newTotal), l) }
      .toDF("piece", "cnt", "cost", "loss")
      .orderBy(col("piece"))
  }

  /** Segment a corpus with a trained unigram model — the production
    * encoder: cost map broadcast, one mapPartitions pass, per-word
    * memoization within a partition (the Zipf head hits the cache).
    * Output per doc: piece count, total integer cost, and the
    * canonical segmentation (pieces joined by '·' inside a word,
    * words by ' '). */
  def unigramEncode(df: DataFrame, id: String, text: String,
      model: Seq[(String, Long)], maxLen: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.toMap)
    val L = maxLen
    df.select(col(id).cast("long").as("doc_id"), col(text).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        def cost(p: String): Long = m.getOrElse(p, 1000000000000L)
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        it.map { case (docId, t) =>
          val words = t.split(" ").filter(_.nonEmpty)
          val segs = words.map(w =>
            memo.getOrElseUpdate(w, unigramSegmentWord(w, cost, L)))
          val nPieces = segs.iterator.map(_.size.toLong).sum
          val totalCost = segs.iterator.flatMap(_.iterator).map(cost).sum
          (docId, nPieces, totalCost, segs.map(_.mkString("·")).mkString(" "))
        }
      }
      .toDF("doc_id", "n_pieces", "total_cost", "segmented")
  }

  private val UnigramInfSql = "CAST(1000000000000 AS BIGINT)"

  /** The forward Viterbi fold as a DuckDB expression over word column
    * `w` of length `n` and piece-cost map `mp`: a list_reduce whose
    * accumulator is the fwd array itself (element j+1 = fwd(j)).
    * `costOf` renders a candidate substring expression into its cost
    * (the default map lookup, or the masked form the prune oracle
    * prices removals with). */
  private def fwdSqlCost(w: String, n: String, L: Int,
      costOf: String => String): String =
    s"""list_reduce(
       |  list_prepend([CAST(0 AS BIGINT)],
       |    list_transform(generate_series(1, $n), i -> [CAST(i AS BIGINT)])),
       |  (acc, x) -> list_append(acc,
       |    list_min(list_transform(
       |      generate_series(greatest(0, x[1] - $L), x[1] - 1),
       |      j -> acc[j + 1] +
       |        ${costOf(s"substr($w, j + 1, x[1] - j)")}))))""".stripMargin

  private def fwdSql(w: String, n: String, L: Int): String =
    fwdSqlCost(w, n, L, s => s"coalesce(mp[$s][1], $UnigramInfSql)")

  /** The backward fold: accumulator element (n-k)+1 = bwd(k). */
  private def bwdSql(w: String, n: String, L: Int): String =
    s"""list_reduce(
       |  list_prepend([CAST(0 AS BIGINT)],
       |    list_transform(generate_series(1, $n), t -> [CAST(t AS BIGINT)])),
       |  (acc, x) -> list_append(acc,
       |    list_min(list_transform(
       |      generate_series($n - x[1] + 1, least($n, $n - x[1] + $L)),
       |      k -> coalesce(mp[substr($w, $n - x[1] + 1, k - ($n - x[1]))][1], $UnigramInfSql)
       |        + acc[$n - k + 1]))))""".stripMargin

  /** DuckDB replay of [[unigramTrain]] — the whole training run
    * unrolled round by round (the bpeTrainOracleSql discipline): seed
    * substring counts and top-`seedSize` selection, then per round the
    * integer cost table (length(bin(..)) is the shared float-free
    * log2), the forward/backward DP folds over every distinct word,
    * the lattice-support piece counting, and the prune. Output =
    * (piece, cnt, cost) of the final model, matching the operator
    * row for row. */
  def unigramTrainOracleSql(src: String, textSql: String, vocabSize: Int,
      rounds: Int, maxLen: Int = 6, seedSize: Int = 500): String =
    s"""WITH ${unigramTrainCtes(src, textSql, vocabSize, rounds, maxLen, seedSize)}
       |SELECT p AS piece, cnt, cost FROM costF ORDER BY piece""".stripMargin

  /** The training replay as a CTE chain ending in `costF`
    * (p, cnt, cost — the final model) — shared by the train oracle and
    * the encode oracle, which segments under the model it just
    * re-derived (the oracle text must be data-independent, so the
    * trained model cannot be inlined; re-deriving it IS the parity
    * statement). */
  private def unigramTrainCtes(src: String, textSql: String, vocabSize: Int,
      rounds: Int, maxLen: Int, seedSize: Int): String = {
    val costCase =
      s"""CASE WHEN cnt > 0 THEN length(bin(total * 1024 // cnt)) - 1
         |     ELSE length(bin(total * 1024)) END""".stripMargin
    def roundCtes(r: Int): String = {
      val R = r + 1
      s"""t$r AS MATERIALIZED (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM model$r),
         |cost$r AS MATERIALIZED (
         |  SELECT p, cnt, CAST($costCase AS BIGINT) AS cost FROM model$r, t$r),
         |m$r AS MATERIALIZED (
         |  SELECT MAP(list(p ORDER BY p), list(cost ORDER BY p)) AS mp FROM cost$r),
         |dp$R AS MATERIALIZED (
         |  SELECT w, wf, length(w) AS n,
         |         ${fwdSql("w", "length(w)", maxLen)} AS fwd,
         |         ${bwdSql("w", "length(w)", maxLen)} AS bwd
         |  FROM wf, m$r),
         |cnt$R AS MATERIALIZED (
         |  SELECT p, CAST(sum(wf) AS BIGINT) AS cnt FROM (
         |    SELECT d.wf, substr(d.w, tj.j + 1, tl.l) AS p
         |    FROM dp$R d, m$r,
         |         UNNEST(generate_series(0, d.n - 1)) tj(j),
         |         UNNEST(generate_series(1, $maxLen)) tl(l)
         |    WHERE tj.j + tl.l <= d.n
         |      AND len(mp[substr(d.w, tj.j + 1, tl.l)]) > 0
         |      AND d.fwd[tj.j + 1] + mp[substr(d.w, tj.j + 1, tl.l)][1]
         |          + d.bwd[d.n - (tj.j + tl.l) + 1] = d.fwd[d.n + 1]
         |  ) GROUP BY p),
         |chars$R AS MATERIALIZED (
         |  SELECT c.p, coalesce(k.cnt, 0) AS cnt
         |  FROM chars0 c LEFT JOIN cnt$R k USING (p)),
         |multi$R AS MATERIALIZED (
         |  SELECT p, cnt FROM (
         |    SELECT p, cnt, row_number() OVER (ORDER BY cnt DESC, p) AS rn
         |    FROM cnt$R WHERE length(p) > 1 AND cnt > 0)
         |  WHERE rn <= $vocabSize - (SELECT count(*) FROM chars0)),
         |model$R AS MATERIALIZED (
         |  SELECT p, cnt FROM chars$R UNION ALL SELECT p, cnt FROM multi$R)""".stripMargin
    }
    s"""wf AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS wf
       |  FROM (SELECT unnest(string_split($textSql, ' ')) AS w FROM $src)
       |  WHERE length(w) > 0 GROUP BY w),
       |sub AS MATERIALIZED (
       |  SELECT p, CAST(sum(wf) AS BIGINT) AS cnt FROM (
       |    SELECT wf.wf, substr(wf.w, tj.j, tl.l) AS p
       |    FROM wf,
       |         UNNEST(generate_series(1, length(wf.w))) tj(j),
       |         UNNEST(generate_series(1, $maxLen)) tl(l)
       |    WHERE tj.j + tl.l - 1 <= length(wf.w)
       |  ) GROUP BY p),
       |chars0 AS MATERIALIZED (SELECT p, cnt FROM sub WHERE length(p) = 1),
       |multi0 AS MATERIALIZED (
       |  SELECT p, cnt FROM (
       |    SELECT p, cnt, row_number() OVER (ORDER BY cnt DESC, p) AS rn
       |    FROM sub WHERE length(p) > 1)
       |  WHERE rn <= $seedSize),
       |model0 AS MATERIALIZED (SELECT p, cnt FROM chars0 UNION ALL SELECT p, cnt FROM multi0),
       |${(0 until rounds).map(roundCtes).mkString(",\n")},
       |t$rounds AS MATERIALIZED (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM model$rounds),
       |costF AS MATERIALIZED (
       |  SELECT p, cnt, CAST($costCase AS BIGINT) AS cost FROM model$rounds, t$rounds)""".stripMargin
  }

  /** DuckDB replay of [[unigramPrune]]: re-derive the trained model
    * ([[unigramTrainCtes]] — the oracle text must be data-
    * independent), then per word the fwd/bwd folds, the distinct
    * multi-char on-path pieces, one MASKED forward fold per
    * (word, piece) pricing the removal, the loss aggregate, and the
    * same keep-top elimination and M-step re-costing. */
  def unigramPruneOracleSql(src: String, textSql: String, vocabSize: Int,
      rounds: Int, targetSize: Int, maxLen: Int = 6,
      seedSize: Int = 500): String = {
    val costCase =
      s"""CASE WHEN cnt > 0 THEN length(bin(total * 1024 // cnt)) - 1
         |     ELSE length(bin(total * 1024)) END""".stripMargin
    val maskCost = (s: String) =>
      s"(CASE WHEN $s = op.p THEN $UnigramInfSql" +
        s" ELSE coalesce(mp[$s][1], $UnigramInfSql) END)"
    s"""WITH ${unigramTrainCtes(src, textSql, vocabSize, rounds, maxLen, seedSize)},
       |m AS MATERIALIZED (
       |  SELECT MAP(list(p ORDER BY p), list(cost ORDER BY p)) AS mp FROM costF),
       |dp AS MATERIALIZED (
       |  SELECT w, wf, length(w) AS n,
       |         ${fwdSql("w", "length(w)", maxLen)} AS fwd,
       |         ${bwdSql("w", "length(w)", maxLen)} AS bwd
       |  FROM wf, m),
       |op AS MATERIALIZED (
       |  SELECT DISTINCT d.w, d.wf, d.n, d.fwd, substr(d.w, tj.j + 1, tl.l) AS p
       |  FROM dp d, m,
       |       UNNEST(generate_series(0, d.n - 1)) tj(j),
       |       UNNEST(generate_series(2, $maxLen)) tl(l)
       |  WHERE tj.j + tl.l <= d.n
       |    AND len(mp[substr(d.w, tj.j + 1, tl.l)]) > 0
       |    AND d.fwd[tj.j + 1] + mp[substr(d.w, tj.j + 1, tl.l)][1]
       |        + d.bwd[d.n - (tj.j + tl.l) + 1] = d.fwd[d.n + 1]),
       |mx AS MATERIALIZED (
       |  SELECT op.p, op.wf,
       |         (${fwdSqlCost("op.w", "op.n", maxLen, maskCost)
                    .replace("\n", "\n  ")})[op.n + 1]
       |           - op.fwd[op.n + 1] AS delta
       |  FROM op, m),
       |loss AS MATERIALIZED (
       |  SELECT p, CAST(sum(wf * delta) AS BIGINT) AS loss FROM mx GROUP BY p),
       |surv AS MATERIALIZED (
       |  SELECT c.p, c.cnt, CAST(0 AS BIGINT) AS loss
       |  FROM costF c WHERE length(c.p) = 1
       |  UNION ALL
       |  SELECT p, cnt, loss FROM (
       |    SELECT c.p, c.cnt, CAST(coalesce(l.loss, 0) AS BIGINT) AS loss,
       |           row_number() OVER (
       |             ORDER BY coalesce(l.loss, 0) DESC, c.cnt DESC, c.p) AS rn
       |    FROM costF c LEFT JOIN loss l USING (p) WHERE length(c.p) > 1)
       |  WHERE rn <= $targetSize - (SELECT count(*) FROM costF WHERE length(p) = 1)),
       |tS AS MATERIALIZED (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM surv)
       |SELECT p AS piece, cnt, CAST($costCase AS BIGINT) AS cost, loss
       |FROM surv, tS ORDER BY piece""".stripMargin
  }

  /** DuckDB replay of [[unigramEncode]]: re-derive the trained model
    * via [[unigramTrainCtes]] (the oracle text must be
    * data-independent), then the same fwd/bwd folds per word and the
    * canonical greedy walk (longest on-optimal-path piece at each
    * position) as a recursive CTE — one step per emitted piece. */
  def unigramEncodeOracleSql(src: String, idSql: String, textSql: String,
      vocabSize: Int, rounds: Int, maxLen: Int = 6, seedSize: Int = 500): String =
    s"""WITH RECURSIVE
       |${unigramTrainCtes(src, textSql, vocabSize, rounds, maxLen, seedSize)},
       |m AS MATERIALIZED (
       |  SELECT MAP(list(p ORDER BY p), list(cost ORDER BY p)) AS mp FROM costF),
       |words AS MATERIALIZED (
       |  SELECT doc_id, t.wi AS widx, ws[t.wi] AS w FROM (
       |    SELECT $idSql AS doc_id,
       |           list_filter(string_split($textSql, ' '), x -> length(x) > 0) AS ws
       |    FROM $src),
       |    UNNEST(generate_series(1, len(ws))) t(wi)),
       |dp AS MATERIALIZED (
       |  SELECT doc_id, widx, w, length(w) AS n,
       |         ${fwdSql("w", "length(w)", maxLen)} AS fwd,
       |         ${bwdSql("w", "length(w)", maxLen)} AS bwd
       |  FROM words, m),
       |walk AS (
       |  SELECT doc_id, widx, w, n, fwd, bwd,
       |         0 AS pos, CAST([] AS VARCHAR[]) AS pieces
       |  FROM dp
       |  UNION ALL
       |  SELECT doc_id, widx, w, n, fwd, bwd,
       |         nxt AS pos, list_append(pieces, substr(w, pos + 1, nxt - pos)) AS pieces
       |  FROM (
       |    SELECT walk.*,
       |      list_max(list_transform(generate_series(pos + 1, least(n, pos + $maxLen)),
       |        i -> CASE WHEN len(mp[substr(w, pos + 1, i - pos)]) > 0
       |                   AND fwd[pos + 1] + mp[substr(w, pos + 1, i - pos)][1]
       |                       + bwd[n - i + 1] = fwd[n + 1]
       |                  THEN i END)) AS nxt
       |    FROM walk, m
       |    WHERE pos < n)),
       |wordseg AS MATERIALIZED (
       |  SELECT walk.doc_id, widx, pieces,
       |         list_sum(list_transform(pieces, p -> mp[p][1])) AS wcost
       |  FROM walk, m WHERE pos = n),
       |perdoc AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
       |         CAST(sum(wcost) AS BIGINT) AS total_cost,
       |         string_agg(array_to_string(pieces, '·'), ' ' ORDER BY widx) AS segmented
       |  FROM wordseg GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces,
       |       CAST(coalesce(p.total_cost, 0) AS BIGINT) AS total_cost,
       |       coalesce(p.segmented, '') AS segmented
       |FROM (SELECT DISTINCT $idSql AS doc_id FROM $src) d
       |LEFT JOIN perdoc p USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Good-Turing count-of-counts for word n-grams: how many DISTINCT
    * n-grams occur exactly `freq` times. Two hash aggregates, the
    * second over the n-gram-vocabulary-sized first. */
  def ngramCountOfCounts(df: DataFrame, text: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = df.select(split(col(text), " ").as("w"))
      .select(explode(
        when(size(col("w")) >= n,
          transform(sequence(lit(0), size(col("w")) - n),
            i => array_join(slice(col("w"), i + 1, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as("g"))
    grams.groupBy(col("g")).agg(count(lit(1)).as("freq"))
      .groupBy(col("freq")).agg(count(lit(1)).as("n_grams"))
  }
}
