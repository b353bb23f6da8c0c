package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markup / boilerplate extraction — the ENTRY step of a crawled-text
  * pipeline: everything downstream (quality rules, dedup, language ID)
  * assumes clean text, and feeding it raw HTML poisons all of it
  * (tag soup inflates shingle sets, nav chrome repeats across every
  * page of a site and shows up as near-dup "content").
  *
  * Deterministic, replayable column math only — regexp/replace chains
  * and higher-order array functions over Catalyst builtins, no UDFs —
  * so the same extraction replays bit-identically in any engine with
  * RE2-class regexes (the x_html_extract gate replays it in DuckDB
  * SQL). That constrains the dialect: no backreferences, no
  * lookarounds; inline flags `(?is)` and non-greedy `.*?` only.
  *
  * The pipeline (each step a documented contract, pinned in MarkupSpec):
  *
  *  1. DROP script/style ELEMENTS wholesale — their character data is
  *     code, not content, and `1 < 2` inside a script would otherwise
  *     derail tag stripping. Non-greedy match per element; an UNCLOSED
  *     `<script>` never matches, so only its open tag is stripped and
  *     its code surfaces as text (the conservative failure: garbage
  *     visible downstream beats silently deleting to end-of-document).
  *  2. SEGMENT into blocks at block-level tags (p, div, headings,
  *     list/table elements, br, semantic HTML5 containers) — the
  *     granularity boilerplate detection needs; inline tags (a, b, em,
  *     span) do NOT split.
  *  3. Per block: measure LINK TEXT (the characters inside `<a>`
  *     elements, tag-stripped and entity-decoded), strip remaining
  *     tags (→ space), decode entities, collapse whitespace.
  *     A malformed tag with no closing `>` is left as text.
  *  4. KEEP a block iff its text is nonempty and its link density
  *     (link chars / text chars) is at most num/den — evaluated as
  *     the INTEGER comparison ll·den ≤ len·num, so engines never
  *     disagree on a float boundary. Nav bars, link farms, and
  *     "terms / privacy / contact" footers fail this; prose with an
  *     inline link passes.
  *  5. Entities: the named set the wild actually uses (&lt; &gt;
  *     &quot; &#39; &nbsp; and LAST &amp; — so `&amp;lt;` decodes to
  *     the literal `&lt;`, not `<`). Decoding happens AFTER tag
  *     stripping: `&lt;b&gt;` is content, never markup.
  *
  * Scale shape: pure per-row expressions — no shuffle, no state,
  * whole-stage-codegen'd projection over the corpus scan. At 100 TB
  * this is the cheapest kind of operator there is; the only knob that
  * matters is that it runs BEFORE the shuffling stages so they see
  * 5-10× less text.
  */
object Markup {

  /** Block-level elements whose open/close tags split text into
    * boilerplate-scoreable blocks. */
  val BlockTags: Seq[String] = Seq(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "dl", "dt", "dd",
    "table", "tr", "td", "th", "thead", "tbody",
    "br", "hr", "form",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "blockquote", "pre", "title")

  private val blockTagRe = s"(?i)</?(${BlockTags.mkString("|")})([ \t][^>]*)?/?>"

  /** Decode the common named/numeric entities; `&amp;` LAST so
    * double-encoded entities surface as their literal entity text. */
  def decodeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }
  }

  /** Remove every well-formed tag, replacing it with `repl` (space to
    * preserve word boundaries in flow text, empty inside measured link
    * text). A `<` with no closing `>` is not a tag and stays. */
  def stripTags(c: Column, repl: String = " "): Column =
    regexp_replace(c, "<[^>]*>", repl)

  /** Drop script/style elements wholesale (non-greedy, per element). */
  def dropScriptStyle(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")

  /** Tag-stripped, entity-decoded, whitespace-collapsed text of a
    * fragment — the per-block normal form. */
  private def blockText(c: Column): Column =
    trim(regexp_replace(decodeEntities(stripTags(c)), "\\s+", " "))

  /** Extract the content text of an HTML document and score its
    * blocks: returns a struct column
    * `(text, n_blocks, n_kept)` where `text` is the newline-joined
    * kept blocks, `n_blocks` counts nonempty blocks, and `n_kept`
    * those that passed the link-density gate (density ≤ num/den,
    * default 1/2). */
  def extractText(html: Column, num: Int = 1, den: Int = 2): Column = {
    require(num >= 0 && den >= 1, s"bad density bound $num/$den")
    val blocks = split(
      regexp_replace(dropScriptStyle(html), blockTagRe, "\n"), "\n")
    val scored = transform(blocks, b => {
      val linkLen = aggregate(
        regexp_extract_all(b, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
        lit(0L),
        (acc, a) => acc + length(decodeEntities(stripTags(a, ""))))
      struct(blockText(b).as("txt"), linkLen.as("ll"))
    })
    val nonempty = filter(scored, s => length(s.getField("txt")) > lit(0))
    val kept = filter(nonempty,
      s => s.getField("ll") * lit(den.toLong) <=
        length(s.getField("txt")).cast("long") * lit(num.toLong))
    struct(
      array_join(transform(kept, _.getField("txt")), "\n").as("text"),
      size(nonempty).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"))
  }
}
