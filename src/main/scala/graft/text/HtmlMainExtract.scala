package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MAIN-CONTENT HTML extraction — the boilerplate-stripping step
  * between [[HtmlExtract]]'s WET-style full text and training-data
  * quality: navigation chrome, link farms, footers and sidebars
  * survive a plain tag strip and then pollute dedup signatures
  * (every page of a site shares its nav text) and quality scores.
  * The classifier is the public jusText / Boilerpipe heuristic family
  * (Pomikálek 2011; Kohlschütter et al., WSDM 2010) reduced to a
  * DETERMINISTIC, integer-only rule set so a templated fixture can
  * replay the expected output closed-form in SQL:
  *
  *  1. SUBTREE PRUNING — everything inside `<head>`, `<nav>`,
  *     `<header>`, `<footer>`, `<aside>`, `<form>`, `<noscript>`
  *     is dropped wholesale (HTML5 semantic boilerplate containers),
  *     tracked by a depth counter over matching open/close tags; an
  *     unclosed pruned container swallows to end of input EXCEPT that
  *     an opening `<body>` resets the skip (the escape hatch for the
  *     ubiquitous unclosed `<head>`). Self-closing forms (`<nav/>`)
  *     prune nothing. Script/style/comment/CDATA/DOCTYPE drop exactly
  *     as in [[HtmlExtract]].
  *  2. BLOCK SEGMENTATION — text is split into blocks at block-level
  *     tag boundaries (p, div, h1–h6, li, ul, ol, dl, dt, dd, table,
  *     thead, tbody, tfoot, tr, td, th, blockquote, pre, article,
  *     section, main, figure, figcaption, fieldset, address, hr,
  *     title, body, html — open OR close). Inline tags (a, b, i,
  *     span, …) contribute the usual one space and do NOT split
  *     blocks.
  *  3. BLOCK CLASSIFICATION — a block is KEPT iff
  *       (a) `3 * linkChars <= totalChars` (link density ≤ 1/3,
  *           exact integer test; chars = non-space chars of the
  *           collapsed text, linkChars = those inside `<a>` — the
  *           anchor state survives block boundaries, so an anchor
  *           wrapping block-level content (`<a><div>…</div></a>`,
  *           the card-link pattern) counts in every block it spans;
  *           a new `<a>` auto-closes any open one, the browser
  *           no-nested-anchors rule), and
  *       (b) it has at least `minWords` whitespace-separated words
  *           (default 2 — kills orphan labels like "Menu" while
  *           keeping headings).
  *     Kept blocks join with a single `\n` in document order.
  *
  * Entity decode, NBSP-aware whitespace collapse and garbage safety
  * (never throws; unclosed constructs swallow; malformed bytes decode
  * with replacement characters) are shared with [[HtmlExtract]] —
  * same helpers, same contracts. Like HtmlText this is a codegen'd
  * scalar EXPRESSION, not mapPartitions: the WARC scan, this column
  * and downstream filters stay in one WholeStageCodegen span, and at
  * 100 TB the classifier runs where the bytes already are — no
  * shuffle, no UDF serialization boundary.
  *
  * Reference scope note: the reference pipeline stops at raw text
  * ingestion; main-content extraction is part of the
  * beyond-the-reference crawl-curation suite (SURVEY §2 F2/E2).
  */
object HtmlMainExtract {

  /** Containers whose entire subtree is boilerplate by construction. */
  private val pruned: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("head", "nav", "header", "footer", "aside", "form",
      "noscript").foreach(s.add)
    s
  }

  /** Tags that terminate a text block (open or close). */
  private val blockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
      "ol", "dl", "dt", "dd", "table", "thead", "tbody", "tfoot",
      "tr", "td", "th", "blockquote", "pre", "article", "section",
      "main", "figure", "figcaption", "fieldset", "address", "hr",
      "title", "body", "html").foreach(s.add)
    s
  }

  /** Parse a tag from its '<': returns (indexAfter, lowercased name,
    * isClose, isSelfClosing), honoring quoted attribute values like
    * [[HtmlExtract.skipTag]] but also reporting close/self-close —
    * the pruning depth counter needs both.
    */
  private def parseTag(s: String, from: Int): (Int, String, Boolean, Boolean) = {
    var i = from + 1
    var close = false
    if (i < s.length && s.charAt(i) == '/') { close = true; i += 1 }
    val n0 = i
    while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-'))
      i += 1
    val name = s.substring(n0, i).toLowerCase(java.util.Locale.ROOT)
    var quote: Char = 0
    var lastNonWs: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>')
        return (i + 1, name, close, lastNonWs == '/')
      if (!Character.isWhitespace(c)) lastNonWs = c
      i += 1
    }
    (s.length, name, close, false)
  }

  /** The main-content pass over decoded HTML (see object doc for the
    * exact rule set).
    */
  def extractMain(html: String, minWords: Int = 2): String = {
    val s = html
    val out = new java.lang.StringBuilder(s.length / 4 + 16)
    // current block accumulator: run-collapsed like HtmlExtract, plus
    // integer char counters for the density test
    val cur = new java.lang.StringBuilder(256)
    var total = 0
    var link = 0
    var anchorDepth = 0
    var skipDepth = 0
    def isWs(c: Char): Boolean = Character.isWhitespace(c) || c == '\u00A0'
    def appendSpace(): Unit =
      if (cur.length > 0 && cur.charAt(cur.length - 1) != ' ') cur.append(' ')
    def appendChar(c: Char): Unit = {
      cur.append(c)
      total += 1
      if (anchorDepth > 0) link += 1
    }
    def flushBlock(): Unit = {
      var end = cur.length
      while (end > 0 && cur.charAt(end - 1) == ' ') end -= 1
      if (end > 0 && total > 0 && 3 * link <= total) {
        // collapsed text: words = spaces + 1
        var words = 1
        var k = 0
        while (k < end) { if (cur.charAt(k) == ' ') words += 1; k += 1 }
        if (words >= minWords) {
          if (out.length > 0) out.append('\n')
          out.append(cur, 0, end)
        }
      }
      cur.setLength(0)
      total = 0
      link = 0
      // anchorDepth is NOT reset here: an anchor wrapping block-level
      // content (<a><div>promo</div></a>, the card-link pattern) must
      // keep counting linkChars past the block boundary — browsers
      // reconstruct active formatting elements into the next block the
      // same way. Only a real </a> trims the depth, so a block-level
      // link farm cannot evade the density kill by splitting blocks.
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (HtmlExtract.startsWithIgnoreCase(s, i, "<!--")) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) s.length else e + 3
          if (skipDepth == 0) appendSpace()
        } else if (HtmlExtract.startsWithIgnoreCase(s, i, "<![cdata[")) {
          val e = s.indexOf("]]>", i + 9)
          i = if (e < 0) s.length else e + 3
          if (skipDepth == 0) appendSpace()
        } else if (HtmlExtract.startsWithIgnoreCase(s, i, "<!") ||
            HtmlExtract.startsWithIgnoreCase(s, i, "<?")) {
          val (ni, _) = HtmlExtract.skipTag(s, i)
          i = ni
          if (skipDepth == 0) appendSpace()
        } else if (i + 1 < s.length &&
            (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '/')) {
          val (ni, name, isClose, selfClose) = parseTag(s, i)
          i = ni
          // raw-text bodies are opaque regardless of pruning state
          if (!isClose && name == "script") i = HtmlExtract.skipRawText(s, i, "</script")
          else if (!isClose && name == "style") i = HtmlExtract.skipRawText(s, i, "</style")
          if (pruned.contains(name)) {
            // pruned containers are block-level: any VISIBLE form of
            // their tags (open, stray close, self-close) is a block
            // boundary — keeps main's token stream a sub-stream of
            // the WET one
            if (selfClose) {
              if (skipDepth == 0) flushBlock()
            } else if (!isClose) {
              if (skipDepth == 0) flushBlock()
              skipDepth += 1
            } else {
              if (skipDepth > 0) skipDepth -= 1
              if (skipDepth == 0) flushBlock()
            }
          } else if (name == "body" && !isClose && skipDepth > 0) {
            // escape hatch: an unclosed <head> must not swallow the
            // document body
            skipDepth = 0
          } else if (skipDepth == 0) {
            if (blockTags.contains(name)) flushBlock()
            else if (name == "a") {
              // HTML forbids nested anchors: a new <a> auto-closes any
              // open one (the browser rule), so depth is 0 or 1 and an
              // author's forgotten </a> poisons at most the text up to
              // the next anchor, not the rest of the document.
              if (isClose) anchorDepth = 0
              else if (!selfClose) anchorDepth = 1
              appendSpace()
            } else appendSpace()
          }
        } else {
          if (skipDepth == 0) appendChar('<')
          i += 1
        }
      } else if (skipDepth > 0) {
        i += 1
      } else if (c == '&') {
        val (rep, ni) = HtmlExtract.entity(s, i)
        if (rep == null) { appendChar('&'); i = ni }
        else {
          var k = 0
          while (k < rep.length) {
            val rc = rep.charAt(k)
            if (isWs(rc)) appendSpace() else appendChar(rc)
            k += 1
          }
          i = ni
        }
      } else if (isWs(c)) {
        appendSpace(); i += 1
      } else {
        appendChar(c); i += 1
      }
    }
    flushBlock()
    out.toString
  }

  /** decode + extract in one call (the per-row kernel). */
  def extractMainBytes(body: Array[Byte], contentType: String,
                       minWords: Int): String =
    extractMain(HtmlExtract.decodeBody(body, contentType), minWords)

  /** Column facade: main-content text extracted from an HTML body
    * (binary) under the Content-Type header's charset.
    */
  def htmlMainText(body: Column, contentType: Column,
                   minWords: Int = 2): Column =
    Bridge.column(HtmlMainText(Bridge.expression(body),
      Bridge.expression(contentType), minWords))
}

/** Codegen'd (body: binary, contentType: string) → main-content text;
  * `minWords` is a plan-time constant (part of the operator, not a
  * column).
  */
case class HtmlMainText(left: Expression, right: Expression, minWords: Int)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_main_text"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.kernel($x, $y);")
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    kernel(x.asInstanceOf[Array[Byte]], y.asInstanceOf[UTF8String])

  def kernel(body: Array[Byte], contentType: UTF8String): UTF8String =
    UTF8String.fromString(
      HtmlMainExtract.extractMainBytes(body, contentType.toString, minWords))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HtmlMainText =
    copy(left = l, right = r)
}
