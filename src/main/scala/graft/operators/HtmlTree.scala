package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Tolerant HTML tree extraction — the reference's real selector
  * semantics, which the q28 regexes only approximated. The reference
  * selects fields by (tag, attrs-dict) over a PARSED tree
  * (scrap_tokopedia.py:50-73 selector table; :228-277 extraction) and
  * filters catalog anchors by whether their SUBTREE contains a nested
  * invalid-product shadow marker (:199-203). Anchored regex matches the
  * happy path but is brittle where a tree is not:
  *
  *  - attribute ORDER and EXTRA attributes (a dict subset match);
  *  - `class` matching any one TOKEN of a multi-class attribute
  *    (BeautifulSoup's multi-valued class semantics);
  *  - `get_text(strip=True)` concatenating text across NESTED elements
  *    (`<h1 ...>Na<b>me</b></h1>` -> "Name"; `[^<]*` regex gets "");
  *  - descendant CONTAINMENT for the shadow-marker exclusion, which no
  *    single regex over the serialized page expresses.
  *
  * This is a small, deterministic, dependency-free parser (tag soup
  * tolerant: unclosed tags, void elements, comments, single/unquoted
  * attribute values, raw script/style text, basic entities), driven
  * per partition via the mm_resize batched-codec shape — a parser is
  * whole-row imperative work no codegen'd expression family expresses,
  * the documented case for dropping out of Catalyst. One pass, no
  * shuffle; at 100 TB the extract stays embarrassingly parallel.
  */
object HtmlTree {

  sealed trait Node
  final case class Text(s: String) extends Node
  final case class Elem(
      tag: String,
      attrs: Map[String, String],
      children: ArrayBuffer[Node]) extends Node

  /** Tags that never take children (HTML void elements). */
  private val VoidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Tags whose content is raw text up to the matching close tag. */
  private val RawText = Set("script", "style")

  private def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  /** Parse a page into a synthetic root element. Never throws: any
    * malformed construct degrades to text or is skipped, mirroring the
    * tolerance of the reference's `html.parser` backend.
    */
  def parse(html: String): Elem = {
    val root = Elem("", Map.empty, ArrayBuffer.empty)
    val stack = ArrayBuffer[Elem](root)
    val n = html.length
    var i = 0
    var textStart = 0
    def flushText(until: Int): Unit =
      if (until > textStart) {
        val t = decodeEntities(html.substring(textStart, until))
        if (t.nonEmpty) stack.last.children += Text(t)
      }
    def isNameChar(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') { i += 1 }
      else if (html.startsWith("<!--", i)) {
        flushText(i)
        val end = html.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
        textStart = i
      } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        flushText(i)
        val end = html.indexOf('>', i + 1)
        i = if (end < 0) n else end + 1
        textStart = i
      } else if (i + 1 < n && html.charAt(i + 1) == '/') {
        flushText(i)
        var j = i + 2
        val t0 = j
        while (j < n && isNameChar(html.charAt(j))) j += 1
        val tag = html.substring(t0, j).toLowerCase
        val end = html.indexOf('>', j)
        i = if (end < 0) n else end + 1
        textStart = i
        // close the nearest open element of this tag (tolerates
        // interleaved/missing closes); an unmatched close is ignored
        val at = stack.lastIndexWhere(_.tag == tag)
        if (at > 0) stack.remove(at, stack.length - at)
      } else if (i + 1 < n && isNameChar(html.charAt(i + 1))) {
        flushText(i)
        var j = i + 1
        val t0 = j
        while (j < n && isNameChar(html.charAt(j))) j += 1
        val tag = html.substring(t0, j).toLowerCase
        // attributes: name [= "v" | 'v' | bare], any order, any extras
        val attrs = Map.newBuilder[String, String]
        var selfClose = false
        var done = false
        while (!done && j < n) {
          while (j < n && html.charAt(j).isWhitespace) j += 1
          if (j < n && html.charAt(j) == '>') { j += 1; done = true }
          else if (j < n && html.charAt(j) == '/') {
            j += 1
            if (j < n && html.charAt(j) == '>') { j += 1; selfClose = true; done = true }
          } else if (j < n) {
            val a0 = j
            while (j < n && isNameChar(html.charAt(j))) j += 1
            if (j == a0) j += 1 // junk char: skip, stay tolerant
            else {
              val aname = html.substring(a0, j).toLowerCase
              while (j < n && html.charAt(j).isWhitespace) j += 1
              if (j < n && html.charAt(j) == '=') {
                j += 1
                while (j < n && html.charAt(j).isWhitespace) j += 1
                if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val q = html.charAt(j)
                  val v0 = j + 1
                  var k = v0
                  while (k < n && html.charAt(k) != q) k += 1
                  attrs += aname -> decodeEntities(html.substring(v0, math.min(k, n)))
                  j = if (k < n) k + 1 else n
                } else {
                  // unquoted value: ends at whitespace or '>' ONLY —
                  // '/' is a legal value character (href=/p/item);
                  // HTML5 treats a trailing x/ in src=x/> as part of
                  // the value, and void/self-closing handling does not
                  // depend on it
                  val v0 = j
                  while (j < n && !html.charAt(j).isWhitespace &&
                    html.charAt(j) != '>') j += 1
                  attrs += aname -> decodeEntities(html.substring(v0, j))
                }
              } else attrs += aname -> ""
            }
          }
        }
        i = j
        textStart = i
        val el = Elem(tag, attrs.result(), ArrayBuffer.empty)
        stack.last.children += el
        if (!selfClose && !VoidTags(tag)) {
          if (RawText(tag)) {
            // raw text content up to the matching close tag —
            // case-insensitive scan WITHOUT allocating a lowercase
            // copy of the page per script/style element
            val close = s"</$tag"
            var at = -1
            var k = i
            while (at < 0 && k <= n - close.length) {
              if (html.regionMatches(true, k, close, 0, close.length)) at = k
              k += 1
            }
            val end = if (at < 0) n else at
            if (end > i) el.children += Text(html.substring(i, end))
            val gt = html.indexOf('>', if (at < 0) n - 1 else at)
            i = if (at < 0 || gt < 0) n else gt + 1
            textStart = i
          } else stack += el
        }
      } else { i += 1 } // lone '<' in text
    }
    flushText(n)
    root
  }

  /** BeautifulSoup's attrs-dict match: every required attribute present
    * and equal — except `class`, which matches when the required value
    * is any one whitespace token of the element's class list OR equals
    * the whole space-joined attribute string (BS4 accepts both; the
    * reference's ALL_PRODUCTS selector class is itself a two-token
    * string containing a space — scrap_tokopedia.py:231 — which only
    * the whole-string form can ever match).
    */
  def matches(e: Elem, tag: String, attrs: Map[String, String]): Boolean =
    e.tag == tag && attrs.forall { case (k, v) =>
      if (k == "class")
        e.attrs.get("class").exists(c => c == v || c.split("\\s+").contains(v))
      else e.attrs.get(k).contains(v)
    }

  /** First matching element in document order (soup.find). */
  def findFirst(root: Elem, tag: String, attrs: Map[String, String]): Option[Elem] = {
    var found: Option[Elem] = None
    def walk(e: Elem): Unit =
      if (found.isEmpty) {
        if (matches(e, tag, attrs)) found = Some(e)
        else e.children.foreach { case c: Elem => walk(c); case _ => () }
      }
    root.children.foreach { case c: Elem => walk(c); case _ => () }
    found
  }

  /** All matching elements in document order (soup.find_all). */
  def findAll(root: Elem, tag: String, attrs: Map[String, String]): Seq[Elem] = {
    val out = ArrayBuffer.empty[Elem]
    def walk(e: Elem): Unit = {
      if (matches(e, tag, attrs)) out += e
      e.children.foreach { case c: Elem => walk(c); case _ => () }
    }
    root.children.foreach { case c: Elem => walk(c); case _ => () }
    out.toSeq
  }

  /** Does the element's SUBTREE (strictly below it) contain a match —
    * the shadow-marker containment test (link_tag.find(...)).
    */
  def containsDescendant(e: Elem, tag: String, attrs: Map[String, String]): Boolean =
    e.children.exists {
      case c: Elem => matches(c, tag, attrs) || containsDescendant(c, tag, attrs)
      case _ => false
    }

  /** get_text(strip=True): every text segment in document order,
    * stripped, whitespace-only segments dropped, joined with "".
    */
  def textOf(e: Elem): String = {
    val sb = new StringBuilder
    def walk(n: Node): Unit = n match {
      case Text(s) => val t = s.trim; if (t.nonEmpty) sb.append(t)
      case el: Elem => el.children.foreach(walk)
    }
    e.children.foreach(walk)
    sb.toString
  }

  // ---- the reference's selector table (scrap_tokopedia.py:45-73) ----

  val ProductName: (String, Map[String, String]) =
    ("h1", Map("class" -> "css-j63za0", "data-testid" -> "lblPDPDetailProductName"))
  val ProductPrice: (String, Map[String, String]) =
    ("div", Map("class" -> "price", "data-testid" -> "lblPDPDetailProductPrice"))
  val ProductDetail: (String, Map[String, String]) =
    ("div", Map("data-testid" -> "lblPDPDescriptionProduk"))
  val ProductOriginalPrice: (String, Map[String, String]) =
    ("span", Map("data-testid" -> "lblPDPDetailOriginalPrice"))
  val ProductDiscountPct: (String, Map[String, String]) =
    ("span", Map("data-testid" -> "lblPDPDetailDiscountPercentage"))
  val InvalidProductMarker: (String, Map[String, String]) =
    ("div", Map("class" -> "_4A0sz2e6IddlQgpD0HR6qw=="))

  /** One product page -> typed row, the reference's parse rules
    * verbatim (scrap_tokopedia.py:252-266): required name/price, the
    * optional fields null when their tag is absent, "Rp"/"." stripped
    * to int, "%" stripped then /100.
    */
  final case class Product(
      p_partkey: Long,
      name: String,
      price: Option[Long],
      originalprice: Option[Long],
      discountpercentage: Option[Double],
      detail: String)

  private def rpToLong(s: String): Option[Long] =
    scala.util.Try(s.replace("Rp", "").replace(".", "").toLong).toOption

  def extractProduct(key: Long, html: String): Product = {
    val root = parse(html)
    def pick(sel: (String, Map[String, String])): Option[String] =
      findFirst(root, sel._1, sel._2).map(textOf)
    Product(
      key,
      pick(ProductName).orNull,
      pick(ProductPrice).flatMap(rpToLong),
      pick(ProductOriginalPrice).flatMap(rpToLong),
      pick(ProductDiscountPct)
        .flatMap(s => scala.util.Try(s.replace("%", "").toDouble / 100).toOption),
      pick(ProductDetail).orNull)
  }

  // ---- whole-page main-content extraction (boilerplate removal) ----

  /** Chrome subtrees a main-content extractor drops wholesale — the
    * C4/RefinedWeb text-extraction rule set: non-content machinery
    * (script/style/noscript/template), site navigation and chrome
    * (nav/header/footer/aside), and input surfaces (form). Comments
    * are already dropped by [[parse]]. Generalizes the reference's
    * per-field `get_text` (scrap_tokopedia.py:231-277) to the
    * whole-page corpus case: instead of selecting the few nodes to
    * KEEP, drop the known-chrome nodes and keep the rest.
    */
  private val PrunedTags = Set(
    "script", "style", "noscript", "template", "nav", "header", "footer",
    "aside", "form", "iframe", "svg", "button", "select", "option",
    // document metadata: the head (and a stray title outside one) is
    // page METADATA, not body content
    "head", "title")

  /** Tags that open/close a LINE in the assembled text — the block-level
    * elements of the HTML rendering model (plus the void line breakers
    * br/hr). Inline elements (a, b, i, span, ...) contribute to the
    * current line.
    */
  private val BlockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "thead", "tbody", "tr", "td", "th", "section", "article",
    "main", "blockquote", "pre", "figure", "figcaption", "dl", "dt", "dd",
    "address", "br", "hr", "body", "html")

  /** One page's extracted main content: kept lines joined with \n, the
    * kept-line count, and the count of lines dropped by the
    * link-density rule (chrome-subtree pruning is not counted — those
    * lines never assemble).
    */
  final case class PageText(main_text: String, n_lines: Int, n_boiler_lines: Int)

  /** Whole-page main-content extraction — the text-extraction leg
    * between "raw crawl" and the quality gates (q31/q72/q75): the C4 /
    * RefinedWeb preprocessing step that turns a fetched page into the
    * clean text every downstream corpus operator consumes.
    *
    * Deterministic three-rule pipeline over the parsed tree:
    *  1. PRUNE chrome subtrees ([[PrunedTags]]) and comments.
    *  2. ASSEMBLE LINES: walk what remains in document order; block
    *     elements ([[BlockTags]]) break lines, inline elements flow
    *     into the current one; each line's whitespace is normalized
    *     (runs collapse to one space, ends trimmed) and empty lines
    *     drop.
    *  3. LINK-DENSITY FLAG: a line whose anchor-contributed
    *     non-whitespace characters are MORE THAN `maxLinkDensity` of
    *     its total (strict — an exactly-half-linked line is kept) is
    *     boilerplate (link farms, "related products" strips, pager
    *     rows — the classic jusText/boilerpipe signal) and is dropped
    *     from `main_text`, counted in `n_boiler_lines`.
    *
    * Per-partition map work like every HtmlTree entry point: one pass,
    * no shuffle, embarrassingly parallel at 100 TB.
    */
  def extractMainText(html: String, maxLinkDensity: Double = 0.5): PageText = {
    val root = parse(html)
    val kept = ArrayBuffer.empty[String]
    var boiler = 0
    val sb = new StringBuilder
    var total = 0L
    var linked = 0L
    var linkDepth = 0
    def flush(): Unit = {
      if (sb.nonEmpty) {
        val line = normalizeWs(sb.toString)
        if (line.nonEmpty) {
          if (linked.toDouble > maxLinkDensity * total) boiler += 1
          else kept += line
        }
      }
      sb.setLength(0); total = 0L; linked = 0L
    }
    def walk(n: Node): Unit = n match {
      case Text(s) =>
        sb.append(s)
        var nw = 0
        var i = 0
        while (i < s.length) { if (!s.charAt(i).isWhitespace) nw += 1; i += 1 }
        total += nw
        if (linkDepth > 0) linked += nw
      case e: Elem =>
        if (!PrunedTags(e.tag)) {
          val block = BlockTags(e.tag)
          if (block) flush()
          val isLink = e.tag == "a"
          if (isLink) linkDepth += 1
          e.children.foreach(walk)
          if (isLink) linkDepth -= 1
          if (block) flush()
        }
    }
    root.children.foreach(walk)
    flush()
    PageText(kept.mkString("\n"), kept.length, boiler)
  }

  /** Collapse whitespace runs to one space and trim — the line
    * normalization of [[extractMainText]] (allocation-light: returns
    * the input when already normal).
    */
  private def normalizeWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) { if (sb.nonEmpty) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Catalog link collection with the nested shadow-marker exclusion
    * (scrap_tokopedia.py:196-204): every anchor matching the product
    * selector whose subtree does NOT contain the invalid-product
    * marker, in document order, href attribute.
    */
  def collectValidLinks(
      html: String,
      anchor: (String, Map[String, String]),
      marker: (String, Map[String, String]) = InvalidProductMarker): Seq[String] = {
    val root = parse(html)
    findAll(root, anchor._1, anchor._2)
      .filterNot(containsDescendant(_, marker._1, marker._2))
      .flatMap(_.attrs.get("href"))
  }
}
