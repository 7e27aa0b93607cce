package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the dedup KEY a crawl pipeline groups on
  * before any content comparison (two fetches of one page usually
  * differ only in scheme case, default ports, dot-segments, percent
  * case, query order, fragments). One codegen'd expression per row,
  * no UDF (the repo contract), composing with the WARC source
  * ([[graft.sources.Warc]]) and `dedup_exact`.
  *
  * Canonical form (RFC 3986 §6 syntax-based normalization + the
  * standard crawl-key extras, each deterministic and documented):
  * lowercase scheme/host (http/https only — anything else is null,
  * not a guess); strip userinfo, fragments, trailing host dots, a
  * leading `www.`, and default ports (80/443, after leading-zero
  * strip); empty path becomes `/`; percent-escapes decode when the
  * octet is unreserved (ALPHA/DIGIT/-._~) and re-uppercase otherwise
  * (malformed escapes pass through); dot-segments resolve per RFC
  * 3986 5.2.4; query parameters split on `&`, drop empties, sort
  * byte-wise, rejoin (the SURT-style dedup-key choice: parameter
  * order is almost never semantic, and a sorted key is what the
  * exact-dedup hash needs). Non-URLs return NULL — honest absence,
  * callers filter or count them.
  */
object Urls {

  def canonical(url: Column): Column =
    Bridge.column(UrlCanonical(Bridge.expression(url)))

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode unreserved percent-escapes, uppercase the rest; malformed
    * escapes pass through verbatim. */
  private[functions] def percentNorm(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 &&
        hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) b.append(v.toChar)
        else {
          b.append('%')
          b.append(java.lang.Character.toUpperCase(s.charAt(i + 1)))
          b.append(java.lang.Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** RFC 3986 5.2.4 remove_dot_segments over a '/'-rooted path. */
  private[functions] def removeDotSegments(path: String): String = {
    val segs = path.split("/", -1) // leading "" from the root slash
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var trailingSlash = path.endsWith("/")
    var i = 1
    while (i < segs.length) {
      segs(i) match {
        case "." => if (i == segs.length - 1) trailingSlash = true
        case ".." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          if (i == segs.length - 1) trailingSlash = true
        case "" => () // collapse duplicate slashes; trailing handled above
        case seg => out += seg
      }
      i += 1
    }
    if (out.isEmpty) "/"
    else "/" + out.mkString("/") + (if (trailingSlash) "/" else "")
  }

  /** Full canonicalization; null for anything that is not an
    * http(s) URL with a host. Pure function of the input string. */
  def canonicalize(raw: String): String = {
    if (raw == null) return null
    val s = raw.trim
    val si = s.indexOf("://")
    if (si <= 0) return null
    val scheme = s.substring(0, si).toLowerCase(java.util.Locale.ROOT)
    if (scheme != "http" && scheme != "https") return null
    var rest = s.substring(si + 3)
    val hi = rest.indexOf('#')
    if (hi >= 0) rest = rest.substring(0, hi)
    val pi = rest.indexWhere(c => c == '/' || c == '?')
    val (auth, tail) =
      if (pi < 0) (rest, "") else (rest.substring(0, pi), rest.substring(pi))
    val at = auth.lastIndexOf('@')
    val hostPort = if (at >= 0) auth.substring(at + 1) else auth
    val br = hostPort.lastIndexOf(']')
    val ci = hostPort.lastIndexOf(':')
    val (host0, port0) =
      if (ci >= 0 && ci > br) (hostPort.substring(0, ci), hostPort.substring(ci + 1))
      else (hostPort, "")
    var host = host0.toLowerCase(java.util.Locale.ROOT)
    while (host.nonEmpty && host.endsWith(".")) host = host.dropRight(1)
    if (host.startsWith("www.") && host.length > 4) host = host.substring(4)
    if (host.isEmpty) return null
    val defPort = if (scheme == "http") "80" else "443"
    val port =
      if (port0.isEmpty) ""
      else if (!port0.forall(c => c >= '0' && c <= '9')) return null
      else {
        val stripped = port0.dropWhile(_ == '0')
        // RFC 3986 authority validity: a port outside 1..65535 is not
        // a URL (the same NULL-for-non-URLs contract the rest of the
        // kernel enforces), not a canonicalizable oddity.
        if (stripped.isEmpty || stripped.length > 5 || stripped.toInt > 65535)
          return null
        if (stripped == defPort) "" else ":" + stripped
      }
    val qi = tail.indexOf('?')
    val (path0, query0) =
      if (qi < 0) (tail, null) else (tail.substring(0, qi), tail.substring(qi + 1))
    val path = removeDotSegments(percentNorm(
      if (path0.isEmpty) "/" else path0))
    val query =
      if (query0 == null) null
      else {
        val parts = query0.split("&", -1).filter(_.nonEmpty)
          .map(percentNorm).sorted
        if (parts.isEmpty) null else parts.mkString("&")
      }
    scheme + "://" + host + port + path +
      (if (query == null) "" else "?" + query)
  }

  /** Lowercased, www-/trailing-dot-stripped host of a URL — the
    * grouping key one level above the canonical URL (all of a site's
    * pages). NULL for non-URLs, same contract as [[canonicalize]]
    * (whose host rules this reuses verbatim).
    */
  def hostOf(raw: String): String = {
    val c = canonicalize(raw)
    if (c == null) return null
    val start = c.indexOf("://") + 3
    // A bracketed IPv6 literal contains ':' inside the brackets, so
    // the terminator scan must first consume to the matching ']'.
    var end = start
    if (end < c.length && c.charAt(end) == '[') {
      while (end < c.length && c.charAt(end) != ']') end += 1
      if (end < c.length) end += 1 // include the ']'
      return c.substring(start, end)
    }
    while (end < c.length && c.charAt(end) != '/' && c.charAt(end) != ':' &&
      c.charAt(end) != '?') end += 1
    c.substring(start, end)
  }

  /** Common two-label public suffixes (ccSLDs) — a curated
    * PUBLIC-KNOWLEDGE subset of the Public Suffix List covering the
    * high-traffic country registries. The full PSL is refreshable
    * DATA a deployment drops in beside this (same shape: a suffix
    * set); the heuristic "registrable = 2 labels, or 3 under a known
    * ccSLD" is the standard crawl approximation.
    */
  private val ccSlds: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk",
      "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
      "com.au", "net.au", "org.au", "edu.au", "gov.au",
      "co.nz", "net.nz", "org.nz", "co.in", "net.in", "org.in",
      "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
      "com.mx", "com.ar", "com.tr", "co.za", "com.sg", "com.hk",
      "co.kr", "com.tw", "co.th", "com.my", "co.id", "com.vn")
      .foreach(s.add)
    s
  }

  /** Registrable domain of a URL (the per-SITE quota/dedup key a
    * crawl pipeline caps on — C4/Gopher group by this, not by host,
    * so cdn1./cdn2./www. subdomains pool together): the host's last
    * two labels, or three when the last two are a known ccSLD
    * ([[ccSlds]]). Hosts with fewer labels (bare TLD-less names,
    * localhost) and IP literals return the host itself. NULL for
    * non-URLs.
    */
  def registrableDomain(raw: String): String = {
    val host = hostOf(raw)
    if (host == null) return null
    // IP literals group as themselves: v4 dotted-quads match the
    // digits+dots shape, bracketed v6 literals keep their brackets
    // (splitting one on '.' would shred v4-mapped forms).
    if (host.startsWith("[")) return host
    if (host.forall(c => (c >= '0' && c <= '9') || c == '.')) return host
    val labels = host.split('.')
    if (labels.length <= 2) return host
    val lastTwo = labels(labels.length - 2) + "." + labels(labels.length - 1)
    val take = if (ccSlds.contains(lastTwo)) 3 else 2
    if (labels.length <= take) host
    else labels.takeRight(take).mkString(".")
  }

  /** Column facade: host key. */
  def host(url: Column): Column =
    Bridge.column(UrlHost(Bridge.expression(url)))

  /** Column facade: registrable-domain key. */
  def domain(url: Column): Column =
    Bridge.column(UrlDomain(Bridge.expression(url)))
}

/** Codegen'd host extraction: NULL for non-URLs (result re-check,
  * the UrlCanonical pattern).
  */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_host"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  def kernel(u: UTF8String): UTF8String = {
    val r = Urls.hostOf(u.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => s"""
      ${ev.value} = $ref.kernel($x);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
}

/** Codegen'd registrable-domain extraction: NULL for non-URLs. */
case class UrlDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_domain"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  def kernel(u: UTF8String): UTF8String = {
    val r = Urls.registrableDomain(u.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => s"""
      ${ev.value} = $ref.kernel($x);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlDomain =
    copy(child = newChild)
}

/** Codegen'd canonicalization expression: NULL output for non-URLs,
  * so doGenCode re-checks the result (the shared UnaryKernelCodegen
  * assumes non-null kernels and cannot be reused here).
  */
case class UrlCanonical(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_canonical"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  def kernel(u: UTF8String): UTF8String = {
    val r = Urls.canonicalize(u.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => s"""
      ${ev.value} = $ref.kernel($x);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlCanonical =
    copy(child = newChild)
}
