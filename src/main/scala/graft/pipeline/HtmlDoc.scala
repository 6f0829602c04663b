package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML tree parser — just enough DOM for the news-crawl selector
  * port ([[NewsCrawl]]): tag tree, attributes, class tokens, stripped text.
  *
  * Exists because this container has no HTML library (jsoup is not on the
  * classpath and nothing may be added); the subset implemented mirrors what
  * BeautifulSoup's `html.parser` provides to `extract_news_job.py`:
  * case-insensitive tag names, void elements, comments/doctype skipping,
  * raw `<script>`/`<style>` content, quoted attributes, and unclosed-tag
  * recovery (pop to the nearest matching open tag, else ignore).
  *
  * Entity decoding covers all numeric character references (decimal + hex,
  * astral included) and the named entities that actually occur in news
  * titles/URLs; unknown named references pass through verbatim (the
  * html.parser behavior for invalid refs). Still not a general-purpose
  * parser: no CDATA, no foreign content. Driver-side only — ingestion
  * parses a few hundred KB per crawl, never executor data.
  */
final class HtmlNode(val tag: String,
                     val attrs: Map[String, String],
                     val parent: Option[HtmlNode]) {
  private[pipeline] val childNodes = ArrayBuffer.empty[HtmlNode]
  private[pipeline] val textParts = ArrayBuffer.empty[(Int, String)] // (pos among children, text)

  def children: Seq[HtmlNode] = childNodes.toSeq

  /** Pre-order document-order descendants (self excluded). */
  def descendants: Iterator[HtmlNode] =
    childNodes.iterator.flatMap(c => Iterator.single(c) ++ c.descendants)

  def findAll(p: HtmlNode => Boolean): Seq[HtmlNode] = descendants.filter(p).toSeq
  def findFirst(p: HtmlNode => Boolean): Option[HtmlNode] = {
    val it = descendants.filter(p)
    if (it.hasNext) Some(it.next()) else None
  }

  def attr(name: String): Option[String] = attrs.get(name.toLowerCase(java.util.Locale.ROOT))
  def hasAttr(name: String): Boolean =
    attrs.contains(name.toLowerCase(java.util.Locale.ROOT))
  def hasClass(c: String): Boolean =
    attr("class").exists(_.split("\\s+").contains(c))

  /** All descendant text, each text node trimmed, concatenated — the
    * behavior of bs4's `get_text(strip=True)` with the default separator.
    */
  def text: String = {
    val sb = new StringBuilder
    def walk(n: HtmlNode): Unit = {
      // interleave text parts and child nodes in document order
      var ti = 0
      val parts = n.textParts
      for (ci <- 0 to n.childNodes.size) {
        while (ti < parts.size && parts(ti)._1 == ci) {
          sb.append(parts(ti)._2.trim); ti += 1
        }
        if (ci < n.childNodes.size) walk(n.childNodes(ci))
      }
    }
    walk(this)
    sb.toString
  }
}

object HtmlDoc {

  private val Void = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")
  private val RawText = Set("script", "style")

  /** Locale-safe lowercase for tag/attribute names: a Turkish default
    * locale turns "SCRIPT" into "scr\u0131pt" under String.toLowerCase,
    * which would skip the raw-text branch entirely.
    */
  private def lc(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  private val AttrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+)))?""".r

  /** Full HTML4 named-entity table from commons-text (ships with Spark),
    * plus XML's `apos` — the coverage bs4's decoding actually exercises on
    * news markup. Kept as a plain map so decoding stays a SINGLE regex pass
    * (a numeric pre-pass followed by a library unescape would double-decode
    * `&#38;amp;` into `&` where html.unescape yields the literal `&amp;`).
    */
  private val Named: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    import org.apache.commons.text.translate.EntityArrays
    (EntityArrays.BASIC_UNESCAPE.asScala ++
      EntityArrays.ISO8859_1_UNESCAPE.asScala ++
      EntityArrays.HTML40_EXTENDED_UNESCAPE.asScala)
      .map { case (k, v) =>
        k.toString.stripPrefix("&").stripSuffix(";") -> v.toString
      }.toMap + ("apos" -> "'")
  }

  /** HTML5's windows-1252 remapping for C1 numeric references — `&#146;`
    * means \u2019 in real-world markup, not the U+0092 control char (HTML5
    * invalid-charref table, the behavior of html.parser/bs4).
    */
  private val C1Remap: Map[Int, String] = Map(
    0x80 -> "\u20AC", 0x82 -> "\u201A", 0x83 -> "\u0192", 0x84 -> "\u201E",
    0x85 -> "\u2026", 0x86 -> "\u2020", 0x87 -> "\u2021", 0x88 -> "\u02C6",
    0x89 -> "\u2030", 0x8A -> "\u0160", 0x8B -> "\u2039", 0x8C -> "\u0152",
    0x8E -> "\u017D", 0x91 -> "\u2018", 0x92 -> "\u2019", 0x93 -> "\u201C",
    0x94 -> "\u201D", 0x95 -> "\u2022", 0x96 -> "\u2013", 0x97 -> "\u2014",
    0x98 -> "\u02DC", 0x99 -> "\u2122", 0x9A -> "\u0161", 0x9B -> "\u203A",
    0x9C -> "\u0153", 0x9E -> "\u017E", 0x9F -> "\u0178")

  private val EntityRe = """&(#[xX]?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);""".r

  /** Decode character references the way html.parser does: full named
    * table, numeric decimal/hex with the C1 remap, U+FFFD for NUL /
    * surrogate / out-of-range / overflowing references; unknown named refs
    * pass through verbatim.
    */
  private[pipeline] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s // fast path: no references at all
    EntityRe.replaceAllIn(s, m => {
      val body = m.group(1)
      val out =
        if (body.charAt(0) == '#') {
          val (digits, radix) =
            if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
              (body.substring(2), 16) else (body.substring(1), 10)
          try {
            val cp = Integer.parseInt(digits, radix)
            if (C1Remap.contains(cp)) C1Remap(cp)
            else if (cp == 0 || (cp >= 0xD800 && cp <= 0xDFFF) || cp > 0x10FFFF) "\uFFFD"
            else new String(Character.toChars(cp))
          } catch { case _: NumberFormatException => "\uFFFD" } // overflowing digits
        } else Named.getOrElse(body, m.matched)
      java.util.regex.Matcher.quoteReplacement(out)
    })
  }

  /** Parse an HTML fragment/document; returns a synthetic root node. */
  def parse(html: String): HtmlNode = {
    val root = new HtmlNode("#root", Map.empty, None)
    var cur = root
    var i = 0
    val n = html.length
    // ASCII-only lowercase copy for case-insensitive raw-text close-tag
    // search: length-stable (String.toLowerCase is not — U+0130 grows, and
    // a Turkish default locale changes I entirely) so indexes map 1:1 back
    // into `html`; built once, not per script tag
    lazy val asciiLower: String = {
      val cs = new Array[Char](n)
      var k = 0
      while (k < n) {
        val c = html.charAt(k)
        cs(k) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        k += 1
      }
      new String(cs)
    }

    def addText(upTo: Int): Unit = {
      if (upTo > i) {
        val t = decodeEntities(html.substring(i, upTo))
        if (t.exists(!_.isWhitespace)) cur.textParts += ((cur.childNodes.size, t))
      }
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(n); i = n }
      else {
        addText(lt)
        i = lt
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n && html.charAt(i + 1) == '/') {
          val end = html.indexOf('>', i)
          val name = lc(html.substring(i + 2, if (end < 0) n else end).trim)
          // recovery: close up to the nearest matching open tag, else ignore
          var probe: Option[HtmlNode] = Some(cur)
          while (probe.exists(p => p.tag != name && p.tag != "#root")) probe = probe.get.parent
          probe.filter(_.tag == name).foreach(m => cur = m.parent.getOrElse(root))
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n && html.charAt(i + 1).isLetter) {
          // find tag end respecting quoted attribute values
          var j = i + 1
          var quote: Char = 0
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val c = html.charAt(j)
            if (quote == 0 && (c == '"' || c == '\'')) quote = c
            else if (quote != 0 && c == quote) quote = 0
            j += 1
          }
          val inner = html.substring(i + 1, math.min(j, n))
          val selfClosed = inner.endsWith("/")
          val body = if (selfClosed) inner.dropRight(1) else inner
          val nameEnd = body.indexWhere(c => c.isWhitespace)
          val (name, attrStr) =
            if (nameEnd < 0) (lc(body.trim), "")
            else (lc(body.substring(0, nameEnd)), body.substring(nameEnd))
          val attrs = AttrRe.findAllMatchIn(attrStr).map { m =>
            val v = Option(m.group(2)).orElse(Option(m.group(3)))
              .orElse(Option(m.group(4))).getOrElse("")
            lc(m.group(1)) -> decodeEntities(v) // hrefs carry &amp; routinely
          }.toMap
          val node = new HtmlNode(name, attrs, Some(cur))
          cur.childNodes += node
          i = if (j < n) j + 1 else n
          if (RawText.contains(name)) {
            // raw content: skip to the matching close tag, keep no text
            val close = asciiLower.indexOf(s"</$name", i)
            val end = if (close < 0) n else html.indexOf('>', close)
            i = if (close < 0) n else (if (end < 0) n else end + 1)
          } else if (!selfClosed && !Void.contains(name)) {
            cur = node
          }
        } else {
          // stray '<' — treat as text
          cur.textParts += ((cur.childNodes.size, "<"))
          i += 1
        }
      }
    }
    root
  }
}
