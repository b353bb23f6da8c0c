package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation: exact
  * (content hash), exact n-gram Jaccard (inverted shingle index),
  * MinHash+LSH (band-bucketed candidate generation with exact verify),
  * and 64-bit SimHash with pigeonhole chunk blocking.
  *
  * Scale shape: everything is explode → hash-partition joins/aggs —
  * no driver-side loops, no per-key unbounded state. Candidate
  * generation is always NARROW (doc ids + a blocking key only); the
  * full shingle sets are joined back only for the surviving candidate
  * pairs, so the big arrays never ride the candidate shuffle. The
  * pair-candidate joins key on (shingle) / (band hash) / (simhash
  * chunk) — the standard inverted-index layout; ultra-frequent
  * blocking keys are the skew risk and get a frequency cap.
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column (array<string>).
    * Empty array when the text has fewer than n words. Native
    * expression — one compiled loop per row (see
    * graft.functions.WordShingles for why not higher-order builtins).
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextFunctions.wordShingles(text, n)

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
  }

  /** The bare (doc, sh) shingle projection, repartitioned off the
    * (typically few) input files so the expensive per-doc expressions
    * parallelize. No caching — single-consumer callers (the per-tick
    * banding path) compute it exactly once either way, and a persist +
    * eager count there is one extra job per tick for nothing. */
  private def shingleProjection(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.repartition(col(id))
      .select(col(id).as("doc"), shingles(col(text), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** [[shingleProjection]] persisted (memory, spilling to disk): multi-
    * consumer callers (inverted index, sizes, signatures) would otherwise
    * recompute the dominant per-row cost per consumer — the classic
    * lineage-recompute trap. Blocks are LRU-evicted, so long-lived
    * sessions self-clean. `eagerCache` materializes the cache with one
    * count() pass for the 3+-consumer batch fan-outs where AQE would
    * otherwise race concurrent leaf stages against a cold
    * InMemoryRelation (see CacheRegistry.eager); 2-consumer or
    * tick-sized callers pass false — the extra job costs more than the
    * race there (r20: d_dedup_tick 0.67x, d_minhash_lsh 0.79x).
    */
  private def shingleSets(df: DataFrame, id: String, text: String, n: Int,
      eagerCache: Boolean = true): DataFrame = {
    val p = shingleProjection(df, id, text, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (eagerCache) graft.CacheRegistry.eager(p) else graft.CacheRegistry.retain(p)
  }

  /** Score (d1, d2, common) candidate pairs against set sizes:
    * jaccard = common / (|A| + |B| - common) ≥ threshold. All-narrow
    * columns — no shingle array ever rides a shuffle.
    */
  private def scoreJaccard(common: DataFrame, sizes: DataFrame, threshold: Double): DataFrame =
    common
      .join(sizes.select(col("doc").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jaccard", col("common").cast("double") / (col("sz1") + col("sz2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("common"), col("sz1"), col("sz2"), col("jaccard"))

  /** Exact common-shingle counts for narrow (d1, d2) candidate pairs,
    * via the inverted index: expand each pair by d1's shingles, keep
    * the ones d2 also has, count. Cost is bounded by |candidates| ×
    * shingles-per-doc — candidate-bounded, never df²-bounded.
    */
  private def commonFromIndex(cands: DataFrame, inv: DataFrame): DataFrame =
    cands
      .join(inv.select(col("doc").as("d1"), col("s")), "d1")
      .join(inv.select(col("doc").as("d2"), col("s")), Seq("d2", "s"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("common"))

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    * explode shingles → narrow self-equi-join on shingle → common
    * counts per pair → jaccard ≥ threshold.
    *
    * `maxShingleDf` drops blocking shingles occurring in more than that
    * many documents (stop-shingles): they generate quadratic candidate
    * pairs on a single skewed join key while carrying no discriminative
    * signal — the 100 TB scale guard. Reported jaccard values stay
    * EXACT under the cap: hot-shingle overlap is added back per
    * candidate pair (cost bounded by |candidates| × hot-shingles-per-
    * doc, not by the quadratic hot join). Only pairs sharing nothing
    * but stop-shingles are missed — overwhelmingly sub-threshold pairs.
    */
  def jaccardPairs(df: DataFrame, id: String, text: String, n: Int,
      threshold: Double, maxShingleDf: Option[Long] = None): DataFrame = {
    val sets = shingleSets(df, id, text, n)
    val sizes = sets.select(col("doc"), size(col("sh")).cast("long").as("sz"))
    // inv rows carry the set size so the candidate join can size-prune
    val inv = sets.select(col("doc"), size(col("sh")).cast("long").as("sz"),
      explode(col("sh")).as("s"))
    jaccardFromExploded(inv, sizes, threshold, maxShingleDf)
  }

  /** Exact set-Jaccard near-dup pairs over an ALREADY-EXTRACTED
    * element table — the modality-agnostic core of [[jaccardPairs]].
    * `items` holds one row per (id, elem) membership (duplicates
    * collapse; elem may be any equi-joinable type — a text shingle, a
    * video frame fingerprint, an audio window hash). Same inverted-
    * index candidate generation, the same provably-output-preserving
    * size prune, and the same `maxElemDf` stop-element cap with exact
    * hot-overlap correction as the n-gram form — so every fingerprint
    * modality inherits the 100 TB skew guard instead of re-deriving
    * it. Returns (d1, d2, common, sz1, sz2, jaccard), d1 < d2.
    */
  def setJaccardPairs(items: DataFrame, id: String, elem: String,
      threshold: Double, maxElemDf: Option[Long] = None): DataFrame = {
    // distinct BEFORE sizing: Jaccard is over sets, so repeated
    // memberships (a repeated frame in one video) must count once.
    // Persisted for the same reason as shingleSets — sizes, the
    // inverted index, and the hot-correction all re-read it.
    // eager: sizes, the inverted index, and the hot-correction fan out
    // of this — see CacheRegistry.eager for why population must happen
    // before AQE races the consumers' leaf stages.
    val sets = graft.CacheRegistry.eager(
      items.select(col(id).as("doc"), col(elem).as("s")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sizes = sets.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val inv = sets.join(sizes, "doc").select(col("doc"), col("sz"), col("s"))
    jaccardFromExploded(inv, sizes, threshold, maxElemDf)
  }

  /** Shared candidate-generation + exact-verify tail of the two
    * Jaccard entry points: `inv` is the (doc, sz, s) inverted index
    * (one row per distinct membership), `sizes` the (doc, sz) set
    * sizes. */
  private def jaccardFromExploded(inv: DataFrame, sizes: DataFrame,
      threshold: Double, maxElemDf: Option[Long]): DataFrame = {
    // provably output-preserving prune: jaccard ≥ t needs common ≥
    // t·(s1+s2)/(1+t) and common ≤ min(s1,s2), which forces
    // min(s1,s2)/max(s1,s2) ≥ t — mismatched-size pairs can never pass,
    // so they are dropped before the count aggregation.
    def sizeCompatible = greatest(col("a.sz"), col("b.sz")) * threshold <=
      least(col("a.sz"), col("b.sz"))
    val common = maxElemDf match {
      case Some(cap) =>
        val hot = inv.groupBy(col("s")).count().filter(col("count") > cap).select(col("s"))
        val filtered = inv.join(hot, Seq("s"), "left_anti")
        val commonCold = filtered.as("a")
          .join(filtered.as("b"),
            col("a.s") === col("b.s") && col("a.doc") < col("b.doc") && sizeCompatible)
          .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
          .agg(count(lit(1)).as("common_cold"))
        val hotInv = inv.select(col("doc"), col("s")).join(hot, Seq("s"))
        val commonHot = commonFromIndex(commonCold.select(col("d1"), col("d2")), hotInv)
          .withColumnRenamed("common", "common_hot")
        commonCold
          .join(commonHot, Seq("d1", "d2"), "left")
          .select(col("d1"), col("d2"),
            (col("common_cold") + coalesce(col("common_hot"), lit(0L))).as("common"))
      case None =>
        inv.as("a")
          .join(inv.as("b"),
            col("a.s") === col("b.s") && col("a.doc") < col("b.doc") && sizeCompatible)
          .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
          .agg(count(lit(1)).as("common"))
    }
    scoreJaccard(common, sizes, threshold)
  }

  /** All (doc_1 < doc_2) pairs of rows sharing `keyCols` — the candidate
    * self-join of every blocking scheme here — made SKEW-SAFE: keys held
    * by more than `hotKeyThreshold` docs go through a salt-replicated
    * join (left side replicated `salts` ways on a target-salt column,
    * right side hashed to one salt), so one degenerate key's quadratic
    * pair generation spreads across `salts` reducers instead of landing
    * on one. The output pair set is IDENTICAL to the naive self-join:
    * each qualifying pair (a, b) meets exactly once, at the left replica
    * whose target salt equals salt(b) — salting redistributes work,
    * never drops pairs, so recall (and the exact-pair-set oracles) are
    * untouched. Non-key columns ride along as c_1 / c_2. Shared with
    * Similarity's bucket blocking (same skew class, same guarantee).
    */
  private[graft] def saltedSelfPairs(t: DataFrame, keyCols: Seq[String],
      hotKeyThreshold: Long, salts: Int): DataFrame = {
    val payload = t.columns.filterNot(keyCols.contains).toSeq
    def rename(df: DataFrame, sfx: String): DataFrame =
      payload.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + sfx))
    def keysEq = keyCols.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val outCols = payload.flatMap(c => Seq(col(c + "_1"), col(c + "_2")))
    // 1-to-1 count tag: the skewed key's partition stays LINEAR in the
    // key's row count here (one count row per key), unlike the pair join
    val counts = t.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_kn"))
    val tagged = t.join(counts, keyCols)
    val cold = tagged.filter(col("_kn") <= hotKeyThreshold).drop("_kn")
    val hot = tagged.filter(col("_kn") > hotKeyThreshold).drop("_kn")
    val coldPairs = rename(cold, "_1").as("a")
      .join(rename(cold, "_2").as("b"), keysEq && col("a.doc_1") < col("b.doc_2"))
      .select(outCols: _*)
    val hotL = rename(hot, "_1")
      .withColumn("_ts", explode(array((0 until salts).map(lit): _*)))
    val hotR = rename(hot, "_2")
      .withColumn("_salt", pmod(xxhash64(col("doc_2")), lit(salts)))
    val hotPairs = hotL.as("a")
      .join(hotR.as("b"),
        keysEq && col("a._ts") === col("b._salt") && col("a.doc_1") < col("b.doc_2"))
      .select(outCols: _*)
    coldPairs.unionByName(hotPairs)
  }

  private val MinhashPrime = 1000000007L

  /** Permutation constants (a_k, b_k) from a fixed seed — reproducible
    * across runs and cluster layouts. */
  private def minhashPerms(numPerm: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numPerm)((1 + rnd.nextLong(MinhashPrime - 1), rnd.nextLong(MinhashPrime)))
  }

  /** MinHash+LSH near-dup pairs: signatures → `bands` bands of
    * numPerm/bands rows hashed to a bucket → narrow (doc, band, bucket)
    * rows → candidate pairs sharing a bucket → exact Jaccard verify
    * ≥ threshold.
    *
    * The banded table carries ONLY (doc, band, bucket): the signature
    * pipeline runs once per document in a single projection, and the
    * candidate self-join shuffles 3 narrow columns — shingle arrays are
    * joined back post-blocking for the (small) surviving candidate set.
    */
  def minhashLshPairs(df: DataFrame, id: String, text: String, n: Int,
      threshold: Double, numPerm: Int = 32, bands: Int = 16,
      hotBucketThreshold: Long = 100L, salts: Int = 16): DataFrame = {
    val sets = shingleSets(df, id, text, n)
    val banded = bandedFromSets(sets, numPerm, bands)

    // skew-safe banded self-join: a degenerate corpus (hundreds of
    // near-identical docs collapsing into one band bucket) would
    // otherwise hand ONE reducer bands× the quadratic pair work
    val cands = saltedSelfPairs(banded, Seq("band", "bucket"), hotBucketThreshold, salts)
      .select(col("doc_1").as("d1"), col("doc_2").as("d2"))
      .dropDuplicates("d1", "d2")
    val inv = sets.select(col("doc"), explode(col("sh")).as("s"))
    val sizes = sets.select(col("doc"), size(col("sh")).cast("long").as("sz"))
    scoreJaccard(commonFromIndex(cands, inv), sizes, threshold)
  }

  /** The LSH blocking table of [[minhashLshPairs]] on its own:
    * (doc, band, bucket) rows from the same fixed-seed permutations —
    * the PERSISTABLE index artifact. Two corpora banded with equal
    * (n, numPerm, bands) produce comparable buckets, which is what
    * lets an incremental consumer (streaming dedup-at-ingest) match
    * new documents against an index built across earlier batches. */
  def minhashBandBuckets(df: DataFrame, id: String, text: String, n: Int,
      numPerm: Int = 32, bands: Int = 16): DataFrame =
    // uncached shingle projection: bandedFromSets reads it exactly once
    // (the signature aggregate), so on the per-tick incremental path a
    // persist + eager count here was pure per-tick overhead
    bandedFromSets(shingleProjection(df, id, text, n), numPerm, bands)

  /** Exact-Jaccard verification of candidate (d1, d2) pairs against a
    * docs table: shingle both sides, count common via the inverted
    * index (candidate-bounded), score ≥ threshold. The verify stage of
    * every LSH-blocked path, exposed for consumers that generate
    * candidates their own way (e.g. against a persisted index). */
  private[graft] def verifyJaccardPairs(cands: DataFrame, docs: DataFrame,
      id: String, text: String, n: Int, threshold: Double): DataFrame = {
    // tick-sized caller (DedupStream verify): lazy persist — both
    // consumers (inv, sizes) materialize inside the one verify job, and
    // an eager count here was one more per-tick job for nothing
    val sets = shingleSets(docs, id, text, n, eagerCache = false)
    val inv = sets.select(col("doc"), explode(col("sh")).as("s"))
    val sizes = sets.select(col("doc"), size(col("sh")).cast("long").as("sz"))
    scoreJaccard(commonFromIndex(cands, inv), sizes, threshold)
  }

  /** Exact set-Jaccard scoring of candidate (d1, d2) pairs against a
    * (doc, s) membership table (assumed distinct): sizes + common via
    * the inverted index, ≥ threshold. The element-form twin of
    * [[verifyJaccardPairs]], for consumers whose elements are already
    * extracted (an incremental fingerprint index). */
  private[graft] def verifySetPairs(cands: DataFrame, items: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = items.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    scoreJaccard(commonFromIndex(cands, items), sizes, threshold)
  }

  private def bandedFromSets(sets: DataFrame, numPerm: Int, bands: Int): DataFrame = {
    val r = numPerm / bands
    // Signatures as ONE whole-stage-codegen hash aggregate over the
    // exploded shingle index: numPerm min() accumulators per doc, with
    // map-side partial aggregation (the per-row 32×transform fold it
    // replaces was interpreted lambda evaluation — same values, ~5×
    // cheaper, and the shape a 100 TB corpus pass wants).
    val hashedInv = sets.select(col("doc"), explode(col("sh")).as("s"))
      .select(col("doc"), pmod(xxhash64(col("s")), lit(MinhashPrime)).as("h"))
    val sigCols = minhashPerms(numPerm).zipWithIndex.map { case ((a, b), k) =>
      min(pmod(col("h") * a + b, lit(MinhashPrime))).as(s"m$k")
    }
    val sig = hashedInv.groupBy(col("doc")).agg(sigCols.head, sigCols.tail: _*)

    // persisted LAZILY: the candidate self-join consumes both sides;
    // without the persist the whole signature pipeline runs twice
    // (broadcast-side joins have no exchange boundary to reuse). NOT
    // eager — this is a 2-consumer site, and the r20 eager count()
    // regressed d_minhash_lsh 0.79x and (per tick) d_dedup_tick 0.67x:
    // the extra materialization job costs more than the AQE population
    // race it guards against at this fan-out.
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until r).map(k => col(s"m${b * r + k}")) :+ lit(b): _*).as("bucket"))
    }
    graft.CacheRegistry.retain(sig
      .select(col("doc"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** Duplicate-CLUSTER resolution: the near-dup operators stop at pairs,
    * but a curation pipeline keeps one document per transitive cluster.
    * Connected components over the pair graph, min-labeled (each
    * component converges to its minimum doc id).
    *
    * Two paths, chosen by MEASURED edge count (the pair graph is
    * materialized either way):
    *
    *  - edges ≤ `driverEdgeLimit` (long ids): collect the edge list and
    *    run union-find on the driver — O(E α(E)) in microseconds, zero
    *    iterative Spark jobs. This is the same size-bounded
    *    driver-materialization contract as Spark's broadcast-join
    *    threshold: bounded by pair count (near-dups are a small
    *    fraction of any real corpus), NEVER by corpus size — the
    *    corpus-sized work before (pair generation) and after (the
    *    labels join below) stays distributed.
    *  - larger graphs: min-label propagation with pointer jumping
    *    (label := label(label)) — pure DataFrame iteration (each round
    *    a hash join + min aggregate, lineage truncated by
    *    localCheckpoint), no driver-side graph walk. Labels decrease
    *    monotonically and at the fixpoint every edge connects equal
    *    labels; pointer jumping converges chains in O(log diameter)
    *    rounds. Billions of edges run here unchanged.
    *
    * Both paths produce the identical labeling (PropertySpec asserts
    * loop ≡ union-find on random graphs). Output: one row per INPUT
    * doc — (doc, cluster_id, cluster_size, is_canonical), singletons
    * included (their own cluster of 1).
    */
  def neardupClusters(docs: DataFrame, id: String, pairs: DataFrame,
      maxIters: Int = 50, driverEdgeLimit: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nodes = docs.select(col(id).as("doc")).distinct()
    // one explode, not union-of-two-selects: a union's branches are
    // separate subtrees, so an expensive un-persisted `pairs` plan
    // (e.g. the full Jaccard candidate join) would execute TWICE to
    // materialize the undirected table — explode duplicates each row
    // in-place on a single scan
    val und = pairs.select(explode(array(
        struct(col("d1").as("a"), col("d2").as("b")),
        struct(col("d2").as("a"), col("d1").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val longIds = und.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (und.count() / 2 <= driverEdgeLimit && longIds) {
      val labels = unionFindLabels(und)
      und.unpersist()
      return clusterOutput(nodes, labels)
    }
    // iterate ONLY over nodes that have edges: a singleton's label can
    // never change, so it rides along as identity at the end. In a real
    // corpus near-dup members are a small fraction of the documents —
    // the loop's join/agg tables shrink from corpus-size to
    // pair-graph-size, at any scale.
    val edgeNodes = und.select(col("a").as("doc")).distinct()
    var labels = edgeNodes.withColumn("label", col("doc")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      iter += 1
      val nbrMin = und
        .join(labels.select(col("doc").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a").as("doc")).agg(min(col("nl")).as("nbr_min"))
      val prop = labels.join(nbrMin, Seq("doc"), "left")
        .select(col("doc"), col("label").as("_old"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
      val mapping = prop.select(col("doc").as("m_doc"), col("label").as("m_label"))
      // _chg rides the checkpointed result, so the convergence test is a
      // scan of cached blocks — not another join against the old labels.
      // LAZY checkpoint: the count() below is the materializing action,
      // so each round runs ONE job, not checkpoint-then-count.
      val jumped = prop.join(mapping, prop("label") === mapping("m_doc"), "left")
        .select(prop("doc").as("doc"),
          coalesce(col("m_label"), prop("label")).as("label"),
          (col("_old") =!= coalesce(col("m_label"), prop("label"))).as("_chg"))
        .localCheckpoint(false)
      changed = jumped.filter(col("_chg")).count()
      labels = jumped.drop("_chg")
    }
    und.unpersist()
    require(changed == 0,
      s"neardupClusters did not converge within $maxIters pointer-jumping rounds")
    clusterOutput(nodes, labels)
  }

  /** Driver union-find over the (cached) undirected edge table: roots
    * are component minima because union always attaches the larger
    * root under the smaller. Returns the (doc, label) DataFrame for
    * edge-touched nodes only — same contract as the loop's labels.
    */
  private def unionFindLabels(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    und.filter(col("a") < col("b")).collect().foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      seen += a; seen += b
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    seen.iterator.map(x => (x, find(x))).toSeq.toDF("doc", "label")
  }

  /** Shared tail of [[neardupClusters]]: attach labels to ALL input
    * docs (singletons label themselves), size each cluster, flag the
    * canonical (minimum-id) member.
    *
    * Sizing is a `groupBy(cluster_id).count()` + equi-join, NOT a
    * count-over-window: a window partitioned by cluster_id puts every
    * member of a cluster in ONE task's sort buffer, so a degenerate
    * corpus that resolves to a single mega-cluster serializes on one
    * core (and spills). The hash aggregate partial-combines map-side
    * and the join redistributes only (cluster_id, size) — both stay
    * parallel however skewed the clustering. No ORDER BY here either:
    * a total sort is presentation, not semantics — gates that need
    * deterministic row order sort at the edge.
    */
  private def clusterOutput(nodes: DataFrame, labels: DataFrame): DataFrame = {
    // sizes come from the (checkpointed, pair-graph-sized) label table,
    // not from the full corpus: every member of a non-trivial cluster
    // is edge-touched, so counting labels counts the cluster — and
    // docs without a label are singletons (size 1 via the left join).
    // This also scans the nodes⋈labels join exactly once.
    val sizes = labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    nodes
      .join(labels, Seq("doc"), "left")
      .select(col("doc"), coalesce(col("label"), col("doc")).as("cluster_id"))
      .join(sizes, Seq("cluster_id"), "left")
      .select(col("doc"), col("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        (col("doc") === col("cluster_id")).cast("boolean").as("is_canonical"))
  }

  /** 64-bit SimHash per document: (doc, h). Tokens are exploded and the
    * 64 per-bit ±1 vote sums run as ONE whole-stage-codegen hash
    * aggregate with map-side partial aggregation — the scale shape for
    * a corpus-wide fingerprint pass (the per-row fold over
    * tokens×64 bits it replaces was an interpreted higher-order
    * expression, ~10× slower and codegen-opaque). Vote sums are
    * commutative integer adds, so the result is independent of
    * partitioning and row order.
    *
    * The 64 token-hash bits are the nibbles of md5(token) (bit b =
    * bit b%4 of hex digit 15 - b/4) — md5 is the one 64-bit-capable
    * hash both engines evaluate identically, which is what makes
    * d_simhash hash-checkable end to end. The DuckDB oracle extracts
    * nibbles with instr-on-hex-alphabet arithmetic; here the same 64
    * bits come from one big-endian hex parse (see below) — identical
    * values, cheaper per row.
    */
  def simhash64(df: DataFrame, id: String, text: String): DataFrame = {
    // Parse the first 16 hex digits as ONE 64-bit integer (two 32-bit
    // conv halves — conv of 16 digits would overflow the signed-long
    // cast): big-endian hex places digit i at bits 4·(15−i)..4·(15−i)+3,
    // which is exactly the nibble→bit mapping documented above, so the
    // per-token hash value is bit-identical to the nibble arithmetic —
    // at 2 substr+conv per row instead of 16 instr string scans.
    val toks = df.repartition(col(id))
      .select(col(id).as("doc"), explode(split(col(text), " ")).as("w"))
      .withColumn("md", md5(col("w")))
      .select(col("doc"),
        shiftleft(expr("cast(conv(substr(md, 1, 8), 16, 10) as long)"), 32)
          .bitwiseOR(expr("cast(conv(substr(md, 9, 8), 16, 10) as long)")).as("th"))
    // ±1 votes as plain bit sums: vote_b = 2·ones_b − n, so the
    // majority test vote_b ≥ 0 is 2·ones_b ≥ n — same h, no per-row
    // branching in the aggregate.
    val ones = (0 until 64).map { b =>
      sum(shiftright(col("th"), b).bitwiseAND(lit(1L))).as(s"o$b")
    }
    val assemble = (0 until 64).map { b =>
      when(col(s"o$b") * 2 >= col("n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce[Column](_.bitwiseOR(_))
    toks.groupBy(col("doc")).agg(count(lit(1)).as("n"), ones: _*)
      .select(col("doc"), assemble.as("h"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, blocked
    * by the pigeonhole principle: split the 64-bit hash into
    * maxHamming+1 chunks — near pairs must agree exactly on at least
    * one chunk, so candidates come from equi-joins on (chunk index,
    * chunk value) instead of a cross join. Blocking is recall-COMPLETE
    * (pigeonhole guarantees every qualifying pair shares a chunk), so
    * the result is the exact Hamming-ball pair set.
    */
  def simhashPairs(df: DataFrame, id: String, text: String, maxHamming: Int,
      hotChunkThreshold: Long = 100L, salts: Int = 16): DataFrame =
    hammingPairs(simhash64(df, id, text), maxHamming, hotChunkThreshold, salts)

  /** Hamming-ball pair scan over ANY 64-bit signature column —
    * the blocking engine behind [[simhashPairs]] (text) and
    * [[graft.operators.Multimodal.phash]] (images). Input contract:
    * columns (doc, h). Pigeonhole blocking over maxHamming+1 chunks is
    * recall-complete for every chunk count: at most maxHamming of the
    * chunk-covered bits differ for a qualifying pair, and
    * maxHamming+1 chunks leave at least one chunk untouched — an
    * equi-join on (chunk, value) finds it. Precision comes from the
    * explicit codegen'd Hamming filter on the candidate stream. */
  def hammingPairs(signatures: DataFrame, maxHamming: Int,
      hotChunkThreshold: Long = 100L, salts: Int = 16): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    require(bitsPer >= 1, s"maxHamming must be <= 63, got $maxHamming")
    // persisted LAZILY: both sides of the chunk self-join consume it, and
    // the stream side of a broadcast join has no exchange to reuse. Not
    // eager — 2-consumer site, same r20 evidence as bandedFromSets: the
    // extra count() job outweighs the AQE population race at this fan-out.
    val hashed = graft.CacheRegistry.retain(signatures
      .select(col("doc"), col("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val mask = (1L << bitsPer) - 1
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"), shiftright(col("h"), c * bitsPer).bitwiseAND(lit(mask)).as("cv"))
    }
    val chunked = hashed
      .select(col("doc"), col("h"), explode(array(chunkCols: _*)).as("ck"))
      .select(col("doc"), col("h"), col("ck.chunk").as("chunk"), col("ck.cv").as("cv"))
    // skew-safe chunk self-join: heavy chunk values (all-zero chunks in
    // real corpora, or a degenerate near-identical corpus) spread their
    // pair generation across salted reducers instead of one
    saltedSelfPairs(chunked, Seq("chunk", "cv"), hotChunkThreshold, salts)
      .select(col("doc_1").as("d1"), col("doc_2").as("d2"),
        col("h_1").as("h1"), col("h_2").as("h2"))
      // filter BEFORE dedup: the Hamming test is a codegen'd bit op on
      // the streaming join output, while dropDuplicates is a shuffle —
      // deduplicate only the (tiny) qualifying set, never the full
      // candidate stream.
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("d1", "d2")
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /** EXACT-SUBSTRING deduplication, keep-first (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * token position is a duplicate when its L-gram also occurs at an
    * earlier (doc, pos) anywhere in the corpus — the FIRST occurrence
    * of every L-gram survives, every later one is scrubbed. Catches
    * the long verbatim boilerplate/quotation overlap that
    * document-level near-dup (Jaccard/MinHash/SimHash) misses because
    * the surrounding documents differ.
    *
    * Per document the output carries the token count, how many tokens
    * were removed, the number of maximal removed SPANS, and the
    * scrubbed text (tokens covered by any non-canonical duplicated
    * L-gram deleted).
    *
    * Scale shape: the corpus-sized work is the L-gram position stream
    * — one aggregate keyed on the gram (min position key = the
    * canonical occurrence; the production variant keys on a 64-bit
    * fingerprint instead of gram text to slim the shuffle) and one
    * join of the stream against it. Flagged positions return to their
    * documents as a per-doc array (bounded by the doc's own length —
    * the same size class as the text column itself), and the scrub is
    * a higher-order filter over (token, index): no window function,
    * no driver state. Suffix arrays do this in O(n) single-node; the
    * gram-stream formulation is the shuffle-friendly equivalent with
    * the identical keep-first result.
    */
  def exactSubstringScrub(df: DataFrame, id: String, text: String,
      L: Int, fingerprint: Boolean = false): DataFrame = {
    require(L >= 2, s"L must be >= 2, got $L")
    val toks = df.select(col(id).as("doc_id"), split(col(text), " ").as("w"))
    // one row per L-gram position; the canonical occurrence is
    // min(struct(doc_id, pos)) — lexicographic struct ordering, which
    // both engines define identically, works for ANY orderable id type
    // (string ids included) and has no overflow domain, unlike the
    // earlier doc_id*1e9+pos int64 packing. With `fingerprint` the
    // shuffle key is xxhash64 of the gram — 8 bytes instead of L words
    // on the corpus-sized exchange, the production switch for 100 TB
    // (a 64-bit collision mis-flags one position with probability
    // ~n²/2⁶⁵; the text-keyed form is the exact reference and
    // DedupSpec pins their equality). The ORDER of flagging is
    // identical either way: the (doc, pos) key, not the gram, decides
    // who is first.
    val gramExpr = array_join(slice(col("w"), col("_i") + lit(1), lit(L)), " ")
    val positions = toks
      .filter(size(col("w")) >= L)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - L)).as("_i"))
      .select(col("doc_id"), col("_i").as("pos"),
        (if (fingerprint) xxhash64(gramExpr) else gramExpr).as("gram"),
        struct(col("doc_id"), col("_i").as("pos")).as("okey"))
    val canon = positions.groupBy(col("gram")).agg(min(col("okey")).as("first_okey"))
    val flagged = positions.join(canon, "gram")
      .filter(col("okey") =!= col("first_okey"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("dup_starts"))
    toks.join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("w"),
        coalesce(col("dup_starts"), array().cast("array<int>")).as("ds"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        col("w"), col("ds"))
      .withColumn("keep",
        filter(col("w"), (_, j) =>
          !exists(col("ds"), s => s <= j && j < s + lit(L))))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("keep"))).cast("long").as("n_removed"),
        // maximal removed spans: flagged start s opens a NEW span iff
        // the previous flagged start's covered range [prev, prev+L)
        // neither overlaps nor touches [s, s+L) — i.e. prev < s - L
        // (element_at is 1-based, so index j in the 0-based lambda IS
        // the previous element; the when() keeps it unevaluated at
        // j = 0 where the index would be invalid under ANSI)
        size(filter(col("ds"), (s, j) =>
          when(j === 0, lit(true))
            .otherwise(element_at(col("ds"), j) < s - lit(L))))
          .cast("long").as("n_spans"),
        array_join(col("keep"), " ").as("scrubbed_text"))
  }
}
