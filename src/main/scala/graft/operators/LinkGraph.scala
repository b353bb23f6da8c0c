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
  *  - [[extractHrefs]]: the href targets of `<a>` elements
  *    (double-quoted hrefs — the overwhelmingly dominant form; the
  *    regex dialect is the RE2-safe subset [[Markup]] established);
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
  * combined before the shuffle. Overflow bound (documented, checked):
  * d·r·w must fit int64 — with S = 10^6 that holds while
  * totalRank·maxWeight < 10^11, far past any real host graph at the
  * default damping; pick a smaller S for pathological weights. */
object LinkGraph {

  /** Rank fixed-point scale: every host starts at S. */
  val Scale = 1000000L

  /** href targets of double-quoted `<a>` elements, in document order. */
  def extractHrefs(html: Column): Column =
    regexp_extract_all(html, lit("(?is)<a[^>]*href=\"([^\"]*)\""), lit(1))

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
