package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The LINK GRAPH of a crawled corpus and its authority scores — the
  * domain-reputation signal a crawl scheduler and a quality-weighting
  * stage both read (pages from well-linked hosts are worth more crawl
  * budget and more mixture weight than link-farm islands).
  *
  * Three composable steps, all deterministic and SQL-replayable (the
  * x_link_graph gate replays extraction, graph build, and every
  * PageRank round in DuckDB):
  *
  *  - [[extractHrefs]]: the href targets of `<a>` elements in all
  *    three HTML quoting forms — double-quoted, single-quoted, and
  *    unquoted (real crawl HTML mixes them); the regex dialect is the
  *    RE2-safe subset [[Markup]] established;
  *  - [[domainEdges]]: host-level (src, dst, weight) edges — absolute
  *    http(s) links only (relative/mailto/javascript links have no
  *    host and drop out via the empty-match rule both engines share),
  *    self-links dropped, weight = link count;
  *  - [[pagerank]]: damped PageRank in SCALED INTEGER arithmetic —
  *    rank and every contribution are exact integers
  *    (contribution = (d·r·w) div (100·outΣ), base = (100−d)·S/100),
  *    so engines can never disagree at a rounding boundary and the
  *    whole iteration unrolls into oracle CTEs like the quantizer's
  *    Lloyd's rounds. Dangling hosts (no outlinks) keep receiving and
  *    simply absorb mass (the classic lost-mass simplification —
  *    documented, not hidden; ranks remain a valid relative ordering).
  *
  * Scale shape: extraction is a pure projection; the edge build is one
  * hash aggregate on (src, dst); each PageRank round is the canonical
  * distributed form — edges ⋈ ranks on src (ranks are host-vocabulary
  * sized, broadcastable for web-scale edge tables), then one hash
  * aggregate on dst with map-side partial sums, so a mega-hub dst is
  * combined before the shuffle. Overflow bound (documented AND
  * enforced — [[pagerank]] fails fast instead of silently wrapping):
  * d·r·w must fit int64; total rank mass never exceeds nodes·Scale
  * (the base injection is (100−d)% of Scale and each round
  * redistributes at most the damped mass), so requiring
  * 100·nodes·Scale·maxWeight < 2^63 bounds every round's arithmetic.
  * With S = 10^6 that holds while nodes·maxWeight < ~9·10^10, far past
  * any real host graph; pick a smaller S for pathological weights. */
object LinkGraph {

  /** Rank fixed-point scale: every host starts at S. */
  val Scale = 1000000L

  /** href targets of `<a>` elements, in document order, in all three
    * HTML quoting forms: `href="…"`, `href='…'`, and unquoted
    * `href=…` (terminated by whitespace or `>`, per the HTML spec's
    * unquoted-attribute rules). The attribute name must be preceded by
    * a separator (whitespace or a closing quote) so attributes merely
    * ENDING in "href" — `data-href=`, `xhref=` — are not extracted as
    * link targets. The match keeps the surrounding quotes
    * in one capture group and strips them in a second pass, because a
    * single regex group can't alternate across quote styles in both
    * engines' dialects (the gate replays this two-step verbatim in
    * DuckDB via list_transform). */
  def extractHrefs(html: Column): Column = {
    val toks = regexp_extract_all(html,
      lit("(?is)<a[^>]*?[\\s\"']href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s\"'>]+)"), lit(1))
    transform(toks, t => {
      val first = substring(t, 1, 1)
      when(first === "\"" || first === "'",
        t.substr(lit(2), length(t) - 2)).otherwise(t)
    })
  }

  /** The DuckDB twin of [[extractHrefs]] as a SQL expression over
    * `htmlSql` — same regex, same quote-strip transform — so every
    * gate/oracle that replays extraction stays in lockstep with the
    * Spark side by construction. */
  def extractHrefsSql(htmlSql: String): String =
    s"""list_transform(
       |  regexp_extract_all($htmlSql,
       |    '(?is)<a[^>]*?[\\s"'']href\\s*=\\s*("[^"]*"|''[^'']*''|[^\\s"''>]+)', 1),
       |  t -> CASE WHEN substr(t, 1, 1) IN ('"', '''')
       |            THEN substr(t, 2, length(t) - 2) ELSE t END)""".stripMargin

  /** Lowercased host of an absolute http(s) URL; null for anything
    * else (relative, mailto, javascript, malformed). */
  def hostOf(url: Column): Column = {
    val h = regexp_extract(url, "^(?i)https?://([^/?#]+)", 1)
    when(length(h) > 0, lower(h)).otherwise(lit(null).cast("string"))
  }

  /** Host-level weighted edge list from (host, html) documents:
    * (src, dst, weight), absolute links only, self-links dropped. */
  def domainEdges(docs: DataFrame, host: String, html: String): DataFrame =
    docs.select(lower(col(host)).as("src"),
      explode(extractHrefs(col(html))).as("u"))
      .select(col("src"), hostOf(col("u")).as("dst"))
      .filter(col("dst").isNotNull && col("dst") =!= col("src"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("weight"))

  /** Scaled-integer damped PageRank over a weighted edge list.
    * Output: (host, out_weight, in_weight, rank) for every host that
    * appears on either side of an edge. `iters` rounds from a uniform
    * [[Scale]] start; `dampingPct` is the integer damping (default
    * 85 ≙ 0.85). */
  def pagerank(edges: DataFrame, iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1, 16], got $iters")
    require(dampingPct >= 0 && dampingPct <= 100, s"bad damping $dampingPct")
    val e = graft.CacheRegistry.retain(edges
      .select(col("src"), col("dst"), col("weight").cast("long").as("weight"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nodes = graft.CacheRegistry.retain(
      e.select(col("src").as("host"))
        .unionByName(e.select(col("dst").as("host"))).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Overflow guard — the scaladoc's documented bound, enforced: the
    // largest contribution numerator any round can form is
    // dampingPct·r·w with r ≤ total rank mass ≤ nodes·Scale (induction:
    // newSum ≤ n·(1−d)·S + d·oldSum, fixed point n·S), so requiring
    // 100·n·S·maxW to fit int64 (with headroom) makes every round's
    // scaled-integer arithmetic exact by construction. Both inputs are
    // model-sized aggregates over the persisted edge table.
    val nNodes = nodes.count()
    val maxW = e.agg(coalesce(max(col("weight")), lit(0L))).head().getLong(0)
    require(
      100.0 * nNodes.toDouble * Scale.toDouble * maxW.toDouble
        < Long.MaxValue.toDouble * 0.99,
      s"pagerank int64 overflow: nodes=$nNodes maxWeight=$maxW at " +
        s"Scale=$Scale — rescale weights or use a smaller Scale")
    val outd = e.groupBy(col("src")).agg(sum(col("weight")).as("outw"))
    val base = (100L - dampingPct) * Scale / 100L
    var ranks = nodes.select(col("host"), lit(Scale).as("r"))
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(ranks.withColumnRenamed("host", "src"), "src")
        .join(outd, "src")
        .select(col("dst").as("host"),
          expr(s"($dampingPct * r * weight) div (100 * outw)").as("c"))
        .groupBy(col("host")).agg(sum(col("c")).as("cs"))
      // truncate lineage each round (the standard iterative-graph
      // shape): without this, round i's plan re-executes rounds 1..i−1
      // and the DAG grows quadratically in iters
      ranks = nodes.join(contribs, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + coalesce(col("cs"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    val inw = e.groupBy(col("dst").as("host")).agg(sum(col("weight")).as("in_weight"))
    nodes
      .join(outd.withColumnRenamed("src", "host"), Seq("host"), "left")
      .join(inw, Seq("host"), "left")
      .join(ranks, Seq("host"))
      .select(col("host"),
        coalesce(col("outw"), lit(0L)).as("out_weight"),
        coalesce(col("in_weight"), lit(0L)).as("in_weight"),
        col("r").as("rank"))
  }

  /** The [[pagerank]] replay as DuckDB CTEs over an `edges` CTE
    * (src, dst, w) — rounds unrolled like the IVF quantizer's; ends
    * with `prF` (host, out_weight, in_weight, rank). */
  def pagerankOracleCtes(iters: Int, dampingPct: Int = 85): String = {
    val base = (100L - dampingPct) * Scale / 100L
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS host,
         |         CAST(sum(($dampingPct * r.r * e.w) // (100 * o.outw)) AS BIGINT) AS cs
         |  FROM edges e
         |  JOIN pr${i - 1} r ON r.host = e.src
         |  JOIN outd o ON o.src = e.src
         |  GROUP BY e.dst
         |), pr$i AS (
         |  SELECT n.host, CAST($base + coalesce(c.cs, 0) AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN c$i c USING (host)
         |)""".stripMargin
    }.mkString(",\n")
    s"""nodes AS (
       |  SELECT DISTINCT src AS host FROM edges
       |  UNION SELECT DISTINCT dst FROM edges
       |), outd AS (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY src
       |), pr0 AS (
       |  SELECT host, CAST($Scale AS BIGINT) AS r FROM nodes
       |),
       |$rounds,
       |inw AS (
       |  SELECT dst AS host, CAST(sum(w) AS BIGINT) AS iw FROM edges GROUP BY dst
       |), prF AS (
       |  SELECT n.host,
       |         CAST(coalesce(o.outw, 0) AS BIGINT) AS out_weight,
       |         CAST(coalesce(i.iw, 0) AS BIGINT) AS in_weight,
       |         p.r AS rank
       |  FROM nodes n
       |  LEFT JOIN outd o ON o.src = n.host
       |  LEFT JOIN inw i USING (host)
       |  JOIN pr$iters p USING (host)
       |)""".stripMargin
  }
}
