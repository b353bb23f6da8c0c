package graft

import org.apache.spark.sql.functions._
import graft.operators.LinkGraph

/** Link-graph extraction and scaled-integer PageRank: hand-computed
  * ranks on a known graph, the URL-form rules, and the degree
  * accounting — the x_link_graph gate then replays the same pipeline
  * against DuckDB at corpus scale.
  */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("href extraction and host parsing: quoting, case, ports, non-http forms") {
    // all three HTML attribute-quoting forms: double, single, unquoted
    val html = "<a href=\"https://A.Example/p\">x</a> <a class=\"z\" " +
      "href=\"http://b.example:8080/q?u=1\">y</a> <a href=\"/rel\">r</a> " +
      "<a href=\"mailto:a@b\">m</a> <a href='https://single.example/s'>s</a> " +
      "<a href=https://bare.example/u>u</a> <a href = \"https://sp.example\">sp</a>"
    val row = Seq(html).toDF("h")
      .select(LinkGraph.extractHrefs(col("h")).as("us"))
      .select(explode(col("us")).as("u"))
      .select(col("u"), LinkGraph.hostOf(col("u")).as("host"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)))
    assert(row.map(_._1).toSeq ==
      Seq("https://A.Example/p", "http://b.example:8080/q?u=1", "/rel",
        "mailto:a@b", "https://single.example/s", "https://bare.example/u",
        "https://sp.example"))
    assert(row.map(_._2).toSeq ==
      Seq(Some("a.example"), Some("b.example:8080"), None, None,
        Some("single.example"), Some("bare.example"), Some("sp.example")))
  }

  test("attributes merely ending in 'href' (data-href, xhref) are not link targets") {
    val html = "<a data-href=\"https://wrong.example/d\">d</a> " +
      "<a xhref=\"https://wrong.example/x\">x</a> " +
      "<a data-href=\"https://wrong.example/d2\" href=\"https://right.example/r\">both</a> " +
      "<a title=\"t\"href=\"https://tight.example/q\">quote-separated</a>"
    val got = Seq(html).toDF("h")
      .select(explode(LinkGraph.extractHrefs(col("h"))).as("u"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("https://right.example/r", "https://tight.example/q"))
  }

  test("pagerank overflow guard fails fast on a bound-breaking weight") {
    import spark.implicits._
    // one edge whose weight alone pushes 100·n·Scale·maxW past int64
    val edges = Seq(("a", "b", Long.MaxValue / 100000L)).toDF("src", "dst", "weight")
    val e = intercept[IllegalArgumentException] {
      LinkGraph.pagerank(edges, iters = 1)
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("pagerank: hand-computed two-round ranks; dangling host absorbs; degrees") {
    // A -> B (w1), A -> C (w1), B -> A (w1); C dangling
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "weight")
    val got = LinkGraph.pagerank(edges, iters = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // r0 = 1,000,000 each; base = 150,000
    // round 1: A gets (85·1e6·1) div 100 = 850,000 → 1,000,000
    //          B, C get (85·1e6·1) div 200 = 425,000 → 575,000
    // round 2: A gets (85·575,000) div 100 = 488,750 → 638,750
    //          B, C get (85·1,000,000) div 200 = 425,000 → 575,000
    assert(got("a") == ((2L, 1L, 638750L)), got.toString)
    assert(got("b") == ((1L, 1L, 575000L)), got.toString)
    assert(got("c") == ((0L, 1L, 575000L)), got.toString)
  }

  test("domainEdges: weights aggregate across case, self and hostless links drop") {
    val docs = Seq(
      ("x.example", "<a href=\"https://Y.example/1\">a</a>" +
        "<a href=\"HTTP://y.EXAMPLE/2\">b</a>" +
        "<a href=\"https://x.example/self\">s</a>" +
        "<a href=\"/rel\">r</a>"),
      ("y.example", "<a href=\"https://x.example/back\">c</a>"))
      .toDF("host", "html")
    val e = LinkGraph.domainEdges(docs, "host", "html")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(e == Set(("x.example", "y.example", 2L), ("y.example", "x.example", 1L)), e)
  }

  test("pagerank is partition-invariant (exact integers, no float order dependence)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val html = concat(lit("<a href=\"https://h"),
      (col("doc_id") % 7).cast("string"), lit(".example/p\">x</a>"))
    val d = docs.select(concat(col("source"), lit(".example")).as("host"),
      html.as("html"))
    val a = LinkGraph.pagerank(LinkGraph.domainEdges(d, "host", "html"), 3)
      .collect().map(_.toSeq).toSet
    val b = LinkGraph.pagerank(
      LinkGraph.domainEdges(d.repartition(13), "host", "html"), 3)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
