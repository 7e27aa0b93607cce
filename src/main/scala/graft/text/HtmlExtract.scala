package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — the Common Crawl "WET" step between the
  * WARC source ([[graft.sources.Warc.httpResponses]] ends at raw body
  * bytes) and every text/dedup operator: charset decode driven by the
  * Content-Type header, script/style/comment/CDATA drop, tag strip,
  * entity decode, whitespace normalization.
  *
  * HTML is not RE2-expressible (quoted attribute values may contain
  * `>`, script bodies may contain `<`), so the tokenizer is a
  * hand-rolled single-pass JVM scanner — but packaged as a codegen'd
  * Catalyst EXPRESSION (the HashExprs kernel stance), not
  * mapPartitions: one virtual call per row, the surrounding
  * filter/project pipeline stays fused, and the operator composes
  * with partition pruning and pushdown like any scalar function.
  *
  * Extraction semantics (documented, oracle-replayable on templated
  * fixtures):
  *  - every dropped construct (tag, comment, script/style/CDATA
  *    block, DOCTYPE/processing instruction) contributes ONE space —
  *    block tags therefore separate words; an inline tag splits
  *    `fan<i>tastic</i>` into `fan tastic` (the WET trade: word-safe
  *    beats word-joined, and downstream scoring tokenizes on
  *    whitespace anyway);
  *  - character entities decode (the core named set + numeric
  *    dec/hex); an unknown or unterminated entity stays literal
  *    (honest pass-through, never a guess);
  *  - all whitespace runs (including NBSP) collapse to single spaces,
  *    leading/trailing trimmed.
  *
  * Garbage safety: never throws — an unclosed comment/script/tag
  * swallows to end of input (the prefix already emitted is kept),
  * malformed bytes decode with the charset's replacement character.
  */
object HtmlExtract {

  /** Charset named by a Content-Type header's `charset=` parameter
    * (case-insensitive, optional quotes), UTF-8 when absent/unknown —
    * the header is authoritative in HTTP; meta-tag sniffing is a
    * fallback real crawls mostly don't need and we don't guess at.
    */
  def charsetOf(contentType: String): java.nio.charset.Charset = {
    val dflt = java.nio.charset.StandardCharsets.UTF_8
    if (contentType == null) return dflt
    val lower = contentType.toLowerCase(java.util.Locale.ROOT)
    val i = lower.indexOf("charset=")
    if (i < 0) return dflt
    var v = contentType.substring(i + 8).trim
    val sc = v.indexOf(';')
    if (sc >= 0) v = v.substring(0, sc).trim
    v = v.stripPrefix("\"").stripSuffix("\"").stripPrefix("'").stripSuffix("'")
    try {
      val cs = java.nio.charset.Charset.forName(v.trim)
      cs
    } catch { case _: Exception => dflt }
  }

  /** Decode body bytes under the Content-Type's charset; malformed or
    * unmappable sequences become the replacement character, never an
    * exception (crawl bodies lie about their encoding all the time).
    */
  def decodeBody(body: Array[Byte], contentType: String): String = {
    val dec = charsetOf(contentType).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    try dec.decode(java.nio.ByteBuffer.wrap(body)).toString
    catch { case _: Exception => new String(body,
      java.nio.charset.StandardCharsets.UTF_8) }
  }

  private[text] val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    Seq(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'", "nbsp" -> "\u00A0", "copy" -> "©",
      "reg" -> "®", "trade" -> "™", "mdash" -> "—",
      "ndash" -> "–", "hellip" -> "…", "lsquo" -> "‘",
      "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
      "laquo" -> "«", "raquo" -> "»", "middot" -> "·",
      "bull" -> "•", "deg" -> "°", "plusmn" -> "±",
      "times" -> "×", "divide" -> "÷", "eacute" -> "é",
      "egrave" -> "è", "agrave" -> "à", "ccedil" -> "ç",
      "ntilde" -> "ñ", "uuml" -> "ü", "ouml" -> "ö",
      "auml" -> "ä", "szlig" -> "ß", "euro" -> "€",
      "pound" -> "£", "cent" -> "¢", "yen" -> "¥",
      "sect" -> "§", "para" -> "¶").foreach { case (k, v) =>
      m.put(k, v) }
    m
  }

  /** Decode one entity starting at `i` (which points at '&').
    * Returns (decoded-or-null, next-index). Null decoded = leave the
    * '&' literal and advance by one.
    */
  private[text] def entity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 32) return (null, i + 1)
    val body = s.substring(i + 1, semi)
    if (body.isEmpty) return (null, i + 1)
    if (body.charAt(0) == '#') {
      val (digits, radix) =
        if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
          (body.substring(2), 16) else (body.substring(1), 10)
      if (digits.isEmpty) return (null, i + 1)
      try {
        val cp = Integer.parseInt(digits, radix)
        if (cp <= 0 || cp > Character.MAX_CODE_POINT ||
          (cp >= 0xD800 && cp <= 0xDFFF)) (null, i + 1)
        else (new String(Character.toChars(cp)), semi + 1)
      } catch { case _: NumberFormatException => (null, i + 1) }
    } else {
      val rep = named.get(body)
      if (rep == null) (null, i + 1) else (rep, semi + 1)
    }
  }

  private[text] def startsWithIgnoreCase(s: String, i: Int, lit: String): Boolean = {
    if (i + lit.length > s.length) return false
    var k = 0
    while (k < lit.length) {
      if (Character.toLowerCase(s.charAt(i + k)) != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Skip a raw-text element (`script`/`style`) body: from just after
    * the opening tag's '>', to just after the matching close tag's
    * '>'. Unclosed → end of input.
    */
  private[text] def skipRawText(s: String, from: Int, close: String): Int = {
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '<' && startsWithIgnoreCase(s, i, close)) {
        var j = i + close.length
        while (j < s.length && s.charAt(j) != '>') j += 1
        return if (j < s.length) j + 1 else s.length
      }
      i += 1
    }
    s.length
  }

  /** Skip a tag from its '<' to just after its '>', honoring quoted
    * attribute values (a '>' inside quotes does not end the tag).
    * Returns (next-index, lowercased tag name).
    */
  private[text] def skipTag(s: String, from: Int): (Int, String) = {
    var i = from + 1
    if (i < s.length && s.charAt(i) == '/') i += 1
    val n0 = i
    while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-'))
      i += 1
    val name = s.substring(n0, i).toLowerCase(java.util.Locale.ROOT)
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return (i + 1, name)
      i += 1
    }
    (s.length, name)
  }

  /** The extraction pass over decoded HTML (see object doc for the
    * exact semantics).
    */
  def extract(html: String): String = {
    val s = html
    val out = new java.lang.StringBuilder(s.length / 2 + 16)
    // run-collapsing append: at most one space between tokens, none
    // leading; all JVM whitespace plus NBSP counts as space
    def isWs(c: Char): Boolean = Character.isWhitespace(c) || c == '\u00A0'
    def appendSpace(): Unit =
      if (out.length > 0 && out.charAt(out.length - 1) != ' ') out.append(' ')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (startsWithIgnoreCase(s, i, "<!--")) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) s.length else e + 3
          appendSpace()
        } else if (startsWithIgnoreCase(s, i, "<![cdata[")) {
          val e = s.indexOf("]]>", i + 9)
          i = if (e < 0) s.length else e + 3
          appendSpace()
        } else if (startsWithIgnoreCase(s, i, "<!") ||
            startsWithIgnoreCase(s, i, "<?")) {
          // DOCTYPE / processing instruction
          val (ni, _) = skipTag(s, i)
          i = ni
          appendSpace()
        } else if (i + 1 < s.length &&
            (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '/')) {
          val (ni, name) = skipTag(s, i)
          i = ni
          if (name == "script") i = skipRawText(s, i, "</script")
          else if (name == "style") i = skipRawText(s, i, "</style")
          appendSpace()
        } else {
          // a bare '<' that opens no tag: literal text
          out.append('<'); i += 1
        }
      } else if (c == '&') {
        val (rep, ni) = entity(s, i)
        if (rep == null) { out.append('&'); i = ni }
        else {
          var k = 0
          while (k < rep.length) {
            val rc = rep.charAt(k)
            if (isWs(rc)) appendSpace() else out.append(rc)
            k += 1
          }
          i = ni
        }
      } else if (isWs(c)) {
        appendSpace(); i += 1
      } else {
        out.append(c); i += 1
      }
    }
    // trailing space from a final tag/whitespace run
    var end = out.length
    while (end > 0 && out.charAt(end - 1) == ' ') end -= 1
    out.substring(0, end)
  }

  /** decode + extract in one call (the per-row kernel). */
  def extractBytes(body: Array[Byte], contentType: String): String =
    extract(decodeBody(body, contentType))

  /** Column facade: text extracted from an HTML body (binary) under
    * the Content-Type header's charset.
    */
  def htmlText(body: Column, contentType: Column): Column =
    Bridge.column(HtmlText(Bridge.expression(body),
      Bridge.expression(contentType)))
}

/** Codegen'd (body: binary, contentType: string) → extracted text. */
case class HtmlText(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_text"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.kernel($x, $y);")
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    kernel(x.asInstanceOf[Array[Byte]], y.asInstanceOf[UTF8String])

  def kernel(body: Array[Byte], contentType: UTF8String): UTF8String =
    UTF8String.fromString(
      HtmlExtract.extractBytes(body, contentType.toString))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HtmlText =
    copy(left = l, right = r)
}
