package graft.core

import graft.json.{JArr, JsonParser, JsonValue}
import ErrorCode._

/** HTML `<script type="application/ld+json">` extraction (W3C JSON-LD 1.1
  * API § HTML Content Algorithms). The reference declares the
  * `extract_all_scripts` option but never implements HTML handling and skips
  * every HTML test (/root/reference/tests/test.rs:174-176) — this implements
  * the public W3C algorithm from scratch, beyond reference parity, because
  * schema.org-in-HTML is the dominant real-world JSON-LD carrier for a
  * web-scale KG pipeline.
  *
  * Semantics:
  *  - scripts whose `type` attribute's media type (before any `;` parameter)
  *    is `application/ld+json` are candidates, in document order;
  *  - a fragment identifier on the document URL selects the candidate with
  *    that `id` — absent → `loading document failed`;
  *  - `extractAllScripts` concatenates every candidate's content into one
  *    array (a script whose content is itself an array is spliced, not
  *    nested — spec: "an array is formed by concatenating");
  *  - otherwise the FIRST candidate alone is the document;
  *  - unparseable script content → `invalid script element`.
  *
  * The scanner is a minimal, non-validating HTML tokenizer: script element
  * content is raw text in HTML (no character references), terminated by the
  * first case-insensitive `</script`. It does not build a DOM — at corpus
  * scale this runs per document inside the expansion mapPartitions, so it
  * must allocate like a lexer, not a parser.
  */
object HtmlScripts {

  final case class Script(attrs: Map[String, String], content: String)

  /** All `<script>` elements (any type), document order. */
  def scripts(html: String): Vector[Script] = tags(html, "script")

  /** The first `<base href>` in the markup (outside comments), resolved by
    * the caller against the document URL — the HTML "fallback base URL"
    * rule the JSON-LD 1.1 API's HTML content algorithms require when
    * establishing the base IRI of an HTML-carried document. A real parser
    * honors only the first `base` element with an `href`, anywhere a
    * document-order scan finds it (same lexer-grade approximation as the
    * script scanner).
    */
  def baseHref(html: String): Option[String] =
    tags(html, "base").collectFirst { case t if t.attrs.contains("href") => t.attrs("href") }

  /** `<name ...>` elements in document order. Script elements consume their
    * raw-text content through the first `</script`; other elements are
    * attribute-only (content empty).
    */
  private def tags(html: String, name: String): Vector[Script] = {
    val out = Vector.newBuilder[Script]
    val needle = "<" + name
    val n = html.length
    var i = 0
    while (i < n) {
      val open = indexOfIgnoreCase(html, needle, i)
      if (open < 0) return out.result()
      // skip `<!-- … -->` spans: commented-out markup is never instantiated
      // as an element by a real HTML parser, so a script inside a comment
      // must not become a document. The `-->` search starts at comment+2 so
      // the spec's abruptly-closed comments (`<!-->`, `<!--->`) terminate
      // immediately instead of swallowing the document. An unterminated
      // comment runs to EOF (HTML comment state). Comments inside
      // already-consumed script content can't reach here — `i` jumps past
      // the close tag after each script. Known lexer limitation (this is a
      // non-DOM scanner): a `<!--` inside an RCDATA element (<textarea>,
      // <title>) or inside an attribute value is treated as a comment
      // opener even though a real tokenizer would not — same class of
      // approximation as the rest of this minimal scanner.
      val comment = html.indexOf("<!--", i)
      if (comment >= 0 && comment < open) {
        val commentEnd = html.indexOf("-->", comment + 2)
        i = if (commentEnd < 0) n else commentEnd + 3
      } else {
      val afterTag = open + needle.length
      // must be a real tag: "<script>" or "<script ..." (not "<scriptx")
      if (afterTag < n && (html.charAt(afterTag) == '>' || html.charAt(afterTag).isWhitespace || html.charAt(afterTag) == '/')) {
        var j = afterTag
        val attrs = Map.newBuilder[String, String]
        var gtPos = -1
        while (gtPos < 0 && j < n) {
          val c = html.charAt(j)
          if (c == '>') gtPos = j
          else if (c.isWhitespace || c == '/') j += 1
          else {
            // attribute name
            var k = j
            while (k < n && !html.charAt(k).isWhitespace && html.charAt(k) != '=' && html.charAt(k) != '>' && html.charAt(k) != '/') k += 1
            val name = html.substring(j, k).toLowerCase
            j = k
            while (j < n && html.charAt(j).isWhitespace) j += 1
            if (j < n && html.charAt(j) == '=') {
              j += 1
              while (j < n && html.charAt(j).isWhitespace) j += 1
              if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                val q = html.charAt(j)
                val end = html.indexOf(q, j + 1)
                if (end < 0) return out.result() // unterminated — stop scanning
                attrs += name -> html.substring(j + 1, end)
                j = end + 1
              } else {
                var k2 = j
                while (k2 < n && !html.charAt(k2).isWhitespace && html.charAt(k2) != '>') k2 += 1
                attrs += name -> html.substring(j, k2)
                j = k2
              }
            } else attrs += name -> ""
          }
        }
        if (gtPos < 0) return out.result()
        if (name == "script") {
          // XHTML self-closing <script .../> is a genuinely EMPTY element
          // (the loader accepts application/xhtml+xml): content is "",
          // not everything up to some later </script>
          if (gtPos > afterTag && html.charAt(gtPos - 1) == '/') {
            out += Script(attrs.result(), "")
            i = gtPos + 1
          } else {
          val close = indexOfIgnoreCase(html, "</script", gtPos + 1)
          val contentEnd = if (close < 0) n else close
          out += Script(attrs.result(), html.substring(gtPos + 1, contentEnd))
          val closeGt = if (close < 0) n else html.indexOf('>', close)
          i = if (closeGt < 0) n else closeGt + 1
          }
        } else {
          out += Script(attrs.result(), "")
          i = gtPos + 1
        }
      } else i = afterTag
      }
    }
    out.result()
  }

  private def isJsonLdType(s: Script): Boolean =
    s.attrs.get("type").exists { t =>
      val essence = { val semi = t.indexOf(';'); if (semi >= 0) t.substring(0, semi) else t }
      essence.trim.equalsIgnoreCase("application/ld+json")
    }

  private def parseScript(s: Script): JsonValue =
    try JsonParser.parse(s.content)
    catch { case e: Exception => throw JsonLdError(InvalidScriptElement, e.getMessage) }

  /** Extract the JSON-LD document carried by `html` (see object doc). */
  def extract(html: String, fragment: Option[String], extractAllScripts: Boolean): JsonValue = {
    val candidates = scripts(html).filter(isJsonLdType)
    fragment match {
      case Some(id) =>
        val hit = candidates.find(_.attrs.get("id").contains(id)).getOrElse(
          throw JsonLdError(LoadingDocumentFailed, s"no application/ld+json script with id=$id"))
        parseScript(hit)
      case None if extractAllScripts =>
        if (candidates.isEmpty)
          throw JsonLdError(LoadingDocumentFailed, "no application/ld+json script element found")
        val arr = new JArr()
        candidates.foreach { s =>
          parseScript(s) match {
            case a: JArr => a.foreach(arr.push) // splice, don't nest
            case other => arr.push(other)
          }
        }
        arr
      case None =>
        candidates.headOption.map(parseScript).getOrElse(
          throw JsonLdError(LoadingDocumentFailed, "no application/ld+json script element found"))
    }
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var k = 0
      while (k < m && Character.toLowerCase(s.charAt(i + k)) == needle.charAt(k)) k += 1
      if (k == m) return i
      i += 1
    }
    -1
  }
}
