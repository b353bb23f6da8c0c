package graft

import org.apache.spark.sql.functions._
import graft.operators.Markup

/** Markup extraction: closed-form documents with known-by-hand answers
  * for every contract in the Markup scaladoc — script/style dropping,
  * block segmentation, entity decoding, link-density boilerplate
  * removal, and the malformed-input behaviors.
  */
class MarkupSpec extends SparkSpec {

  private def extract(html: String, num: Int = 1, den: Int = 2): (String, Long, Long) = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(Markup.extractText(col("h"), num, den).as("e"))
      .select(col("e.text"), col("e.n_blocks"), col("e.n_kept"))
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  test("content blocks survive; nav and link-farm footers are dropped") {
    val html =
      """<html><head><title>My Page</title></head><body>
        |<nav><a href="/">home</a> <a href="/about">about us</a></nav>
        |<h1>A report</h1>
        |<p>Plain prose with an inline <a href="/ref">reference</a> inside a
        |longer paragraph of actual content words.</p>
        |<footer>copyright <a href="/home">back to the home page</a></footer>
        |</body></html>""".stripMargin.replace("\n", " ")
    val (text, nBlocks, nKept) = extract(html)
    val blocks = text.split("\n").toSeq
    assert(blocks == Seq("My Page", "A report",
      "Plain prose with an inline reference inside a longer paragraph of actual content words."),
      blocks.toString)
    assert(nBlocks == 5L, s"nonempty blocks: $nBlocks") // + nav + footer
    assert(nKept == 3L)
  }

  test("script/style elements vanish wholesale, even with tag-like code inside") {
    val html = "<p>keep</p><script>if (1 < 2) { x = \"<div>fake</div>\"; }</script>" +
      "<style>p { color: red; }</style><p>also keep</p>"
    val (text, _, _) = extract(html)
    assert(text == "keep\nalso keep", text)
  }

  test("unclosed script: open tag stripped, code surfaces as text (conservative)") {
    val (text, _, _) = extract("<p>a</p><script type=\"x\">var y = 3;")
    assert(text == "a\nvar y = 3;", text)
  }

  test("entities decode after tag stripping; double-encoding stays literal") {
    val (text, _, _) = extract(
      "<p>x &lt;b&gt; y &quot;q&quot; &#39;s&#39; &nbsp; z &amp;lt; w &amp; v</p>")
    assert(text == "x <b> y \"q\" 's' z &lt; w & v", text)
  }

  test("inline tags do not split blocks; nested tags inside links count as link text") {
    // link text = "bold link" (9 chars); block text = "pre bold link post"
    // (18 chars): 9*2 <= 18*1 — exactly on the boundary, kept
    val (text, nBlocks, nKept) = extract(
      "<p>pre <a href=\"/x\"><b>bold link</b></a> post</p>")
    assert(text == "pre bold link post", text)
    assert((nBlocks, nKept) == ((1L, 1L)))
    // one char less of prose tips it over the boundary: dropped
    val (t2, nb2, nk2) = extract(
      "<p>pr <a href=\"/x\"><b>bold link</b></a> post</p>")
    assert(t2 == "" && nb2 == 1L && nk2 == 0L, s"'$t2' $nb2 $nk2")
  }

  test("a malformed tag with no closing '>' is text, not markup") {
    // block segmentation consumes the well-formed '</p>' FIRST, so the
    // unterminated '<a href="/x' is left with no '>' to swallow — it
    // surfaces as text (the conservative failure, like unclosed script)
    val (text, _, _) = extract("<p>trailing <a href=\"/x</p>")
    assert(text == "trailing <a href=\"/x", text)
    val (t2, _, _) = extract("<p>end with a lone < sign</p>")
    assert(t2 == "end with a lone < sign", t2)
  }

  test("whitespace-only and link-only documents extract to empty") {
    assert(extract("  \t  ") == (("", 0L, 0L)))
    assert(extract("<div><a href=\"/a\">x</a><a href=\"/b\">y</a></div>") ==
      (("", 1L, 0L)))
  }

  test("density bound is a rational knob: 1/1 keeps everything nonempty") {
    val html = "<nav><a href=\"/\">home</a> <a href=\"/a\">about</a></nav><p>body</p>"
    val (_, nBlocks, nKept) = extract(html, num = 1, den = 1)
    assert(nBlocks == nKept && nBlocks == 2L)
  }
}
