package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.json._

/** HTML script extraction (W3C JSON-LD 1.1 API HTML content algorithms) —
  * scanner corners plus the expand-API integration for text/html documents.
  */
class HtmlScriptsSpec extends AnyFunSuite {

  private val html =
    """<!DOCTYPE html>
      |<html><head>
      |<SCRIPT TYPE="application/ld+json">
      |{"@context": {"@vocab": "http://v/"}, "@id": "http://n/1", "name": "first"}
      |</SCRIPT>
      |<script type="text/javascript">var x = "<script>not me</sc" + "ript>";</script>
      |<script id=second type='application/ld+json;charset=UTF-8'>
      |[{"@context": {"@vocab": "http://v/"}, "@id": "http://n/2", "name": "second"},
      | {"@context": {"@vocab": "http://v/"}, "@id": "http://n/3", "name": "third"}]
      |</script>
      |</head><body><p>schema.org carrier page</p></body></html>
      |""".stripMargin

  test("scanner: tags and attributes, case-insensitive, quoting variants") {
    val all = HtmlScripts.scripts(html)
    assert(all.size == 3)
    assert(all(0).attrs("type") == "application/ld+json")
    assert(all(1).attrs("type") == "text/javascript")
    assert(all(2).attrs("id") == "second")
    assert(all(2).attrs("type").startsWith("application/ld+json;"))
  }

  test("default extraction takes the FIRST application/ld+json script only") {
    val v = HtmlScripts.extract(html, None, extractAllScripts = false)
    assert(v.asObj.exists(_.get("@id").contains(JStr("http://n/1"))))
  }

  test("extractAllScripts concatenates, splicing array-valued scripts") {
    val v = HtmlScripts.extract(html, None, extractAllScripts = true)
    val ids = v.asArr.get.iterator.flatMap(_.asObj).flatMap(_.get("@id")).toVector
    assert(ids == Vector(JStr("http://n/1"), JStr("http://n/2"), JStr("http://n/3")))
  }

  test("fragment identifier selects the script by id; missing id fails to load") {
    val v = HtmlScripts.extract(html, Some("second"), extractAllScripts = false)
    assert(v.asArr.exists(_.size == 2))
    val err = intercept[JsonLdError] {
      HtmlScripts.extract(html, Some("nope"), extractAllScripts = false)
    }
    assert(err.code == ErrorCode.LoadingDocumentFailed)
  }

  test("unparseable script content is the invalid-script-element error") {
    val bad = """<script type="application/ld+json">{not json</script>"""
    val err = intercept[JsonLdError] {
      HtmlScripts.extract(bad, None, extractAllScripts = false)
    }
    assert(err.code == ErrorCode.InvalidScriptElement)
  }

  test("no candidate scripts at all fails to load") {
    val err = intercept[JsonLdError] {
      HtmlScripts.extract("<html><body>plain</body></html>", None, extractAllScripts = false)
    }
    assert(err.code == ErrorCode.LoadingDocumentFailed)
  }

  test("scripts inside HTML comments are never extracted") {
    // a real HTML parser never instantiates commented-out markup, so
    // `<!-- <script …> -->` must not yield a phantom document
    val commentedOnly =
      """<html><head>
        |<!-- <script type="application/ld+json">{"@id": "http://n/phantom"}</script> -->
        |</head></html>""".stripMargin
    assert(HtmlScripts.scripts(commentedOnly).isEmpty)
    val err = intercept[JsonLdError] {
      HtmlScripts.extract(commentedOnly, None, extractAllScripts = true)
    }
    assert(err.code == ErrorCode.LoadingDocumentFailed)
    // commented script before AND after a live one: only the live one survives
    val mixed =
      """<!-- <script type="application/ld+json">{"@id": "http://n/ghost1"}</script> -->
        |<script type="application/ld+json">{"@id": "http://n/live"}</script>
        |<!-- <script type="application/ld+json">{"@id": "http://n/ghost2"}</script> -->""".stripMargin
    val live = HtmlScripts.scripts(mixed)
    assert(live.size == 1 && live(0).content.contains("http://n/live"))
    // unterminated comment swallows the rest of the input (HTML comment state)
    val unterminated =
      """<!-- <script type="application/ld+json">{"@id": "http://n/x"}</script>"""
    assert(HtmlScripts.scripts(unterminated).isEmpty)
    // comment-lookalike INSIDE script raw text does not hide later scripts
    val rawText =
      """<script type="text/javascript">var s = "<!--";</script>
        |<script type="application/ld+json">{"@id": "http://n/after"}</script>""".stripMargin
    val after = HtmlScripts.scripts(rawText)
    assert(after.size == 2 && after(1).content.contains("http://n/after"))
    // abruptly-closed comments (`<!-->`, `<!--->`) are COMPLETE comments
    // per the HTML spec — they must not swallow a following live script
    val abrupt1 = """<!--><script type="application/ld+json">{"@id": "http://n/a1"}</script>"""
    assert(HtmlScripts.scripts(abrupt1).size == 1)
    val abrupt2 = """<!---><script type="application/ld+json">{"@id": "http://n/a2"}</script>"""
    assert(HtmlScripts.scripts(abrupt2).size == 1)
  }

  test("scanner: attribute syntax variants (unquoted, spaced =, missing type, media params)") {
    // unquoted attribute value (valid HTML): still a candidate
    val unquoted = """<script type=application/ld+json>{"@id": "http://n/u"}</script>"""
    val u = HtmlScripts.scripts(unquoted)
    assert(u.size == 1 && u(0).attrs("type") == "application/ld+json")
    assert(HtmlScripts.extract(unquoted, None, extractAllScripts = false)
      .asObj.exists(_.get("@id").contains(JStr("http://n/u"))))
    // whitespace around '=' (valid per the HTML attribute grammar)
    val spaced = "<script type = \"application/ld+json\">{\"@id\": \"http://n/s\"}</script>"
    assert(HtmlScripts.extract(spaced, None, extractAllScripts = false)
      .asObj.exists(_.get("@id").contains(JStr("http://n/s"))))
    // a script with NO type attribute is a classic-script, never a candidate
    val untyped =
      """<script>{"@id": "http://n/no"}</script>
        |<script type="application/ld+json">{"@id": "http://n/yes"}</script>""".stripMargin
    val v = HtmlScripts.extract(untyped, None, extractAllScripts = true)
    val ids = v.asArr.get.iterator.flatMap(_.asObj).flatMap(_.get("@id")).toVector
    assert(ids == Vector(JStr("http://n/yes")))
    // profile media-type parameter (not just charset) is still a candidate
    val profiled =
      """<script type='application/ld+json;profile=http://www.w3.org/ns/json-ld#expanded'>
        |[{"@id": "http://n/p"}]</script>""".stripMargin
    val p = HtmlScripts.extract(profiled, None, extractAllScripts = true)
    assert(p.asArr.get.iterator.flatMap(_.asObj).flatMap(_.get("@id")).toVector ==
      Vector(JStr("http://n/p")))
    // empty script body is not a JSON document -> invalid script element
    val empty = """<script type="application/ld+json"></script>"""
    val err = intercept[JsonLdError] {
      HtmlScripts.extract(empty, None, extractAllScripts = false)
    }
    assert(err.code == ErrorCode.InvalidScriptElement)
  }

  test("fuzz: the scanner never throws anything but JsonLdError on hostile markup") {
    // corpus operators must degrade to error-channel rows, never kill a task
    val rnd = new scala.util.Random(20260817L)
    val alphabet = "<script type=\"application/ld+json\">{}[]'= /abc\t\n!--base href"
    var i = 0
    while (i < 3000) {
      val s = Array.fill(rnd.nextInt(80))(alphabet(rnd.nextInt(alphabet.length))).mkString
      try {
        HtmlScripts.scripts(s)
        HtmlScripts.baseHref(s)
        HtmlScripts.extract(s, if (rnd.nextBoolean()) Some("x") else None, rnd.nextBoolean())
      } catch { case _: JsonLdError => /* the only acceptable failure */ }
      i += 1
    }
    // targeted hostiles: unterminated constructs at every truncation point
    val page = """<script type="application/ld+json" id='a'>{"x":1}</script>"""
    (0 until page.length).foreach { cut =>
      val s = page.substring(0, cut)
      try { HtmlScripts.extract(s, None, extractAllScripts = true) }
      catch { case _: JsonLdError => }
    }
    // same truncation sweep over a comment-wrapped page
    val cpage = """<!-- <script type="application/ld+json">{"x":1}</script> --><script type="application/ld+json">{"y":2}</script>"""
    (0 until cpage.length).foreach { cut =>
      try { HtmlScripts.extract(cpage.substring(0, cut), None, extractAllScripts = true) }
      catch { case _: JsonLdError => }
    }
  }

  private def remoteHtml(url: String) = JsonLdInput.Remote(RemoteDocument(
    contentType = "text/html", contextUrl = None,
    document = JStr(html), documentUrl = url))

  test("expand API on a text/html RemoteDocument: first script by default") {
    val out = JsonLdApi.expand(remoteHtml("http://example.org/page.html"), JsonLdOptions())
    assert(out.size == 1)
    assert(out(0).asObj.get.get("@id").contains(JStr("http://n/1")))
    assert(out(0).asObj.get.contains("http://v/name"))
  }

  test("expand API with extractAllScripts: all nodes from all scripts") {
    val out = JsonLdApi.expand(remoteHtml("http://example.org/page.html"),
      JsonLdOptions(extractAllScripts = true))
    val ids = out.iterator.flatMap(_.asObj).flatMap(_.get("@id")).toSet
    assert(ids == Set[JsonValue](JStr("http://n/1"), JStr("http://n/2"), JStr("http://n/3")))
  }

  test("expand API with a fragment documentUrl targets that script") {
    val out = JsonLdApi.expand(remoteHtml("http://example.org/page.html#second"), JsonLdOptions())
    val ids = out.iterator.flatMap(_.asObj).flatMap(_.get("@id")).toSet
    assert(ids == Set[JsonValue](JStr("http://n/2"), JStr("http://n/3")))
  }

  test("XHTML self-closing script is an empty element, not a content sink") {
    // a self-closed ld+json script has no content → invalid script element
    // (empty string is not a JSON document); crucially it must NOT swallow
    // the rest of the markup, so the next script stays extractable
    val page = """<script type="application/ld+json"/><script type="application/ld+json">{"@id": "http://n/9"}</script>"""
    val all = HtmlScripts.scripts(page)
    assert(all.size == 2 && all(0).content == "" && all(1).content.contains("http://n/9"))
    val err = intercept[JsonLdError] {
      HtmlScripts.extract(page, None, extractAllScripts = false)
    }
    assert(err.code.rendered == "invalid script element")
    // a fragment id still reaches the second, valid script
    val page2 = """<script type="application/ld+json" id="a"/><script type="application/ld+json" id="b">{"@id": "http://n/9"}</script>"""
    val byId = HtmlScripts.extract(page2, Some("b"), extractAllScripts = false)
    assert(byId.asObj.get.get("@id").contains(JStr("http://n/9")))
  }

  test("baseHref: first base with href wins; commented-out and href-less base elements are ignored") {
    assert(HtmlScripts.baseHref("""<head><base href="http://b.example/dir/"></head>""")
      == Some("http://b.example/dir/"))
    assert(HtmlScripts.baseHref("""<BASE HREF='rel/dir/'>""") == Some("rel/dir/"))
    assert(HtmlScripts.baseHref("""<base target="_top"><base href="http://second/">""")
      == Some("http://second/"))
    assert(HtmlScripts.baseHref("""<!-- <base href="http://no/"> --><base href="http://yes/">""")
      == Some("http://yes/"))
    assert(HtmlScripts.baseHref("""<basefont size=3><p>no base here</p>""").isEmpty)
    assert(HtmlScripts.baseHref("no markup at all").isEmpty)
  }

  test("expand API on text/html honors <base href> when resolving relative IRIs (HTML fallback base URL)") {
    // absolute base href replaces the document URL wholesale
    val absPage =
      """<head><base href="http://kb.example/data/"></head>
        |<script type="application/ld+json">{"@id": "item1", "http://v/name": "n"}</script>""".stripMargin
    val absOut = JsonLdApi.expand(JsonLdInput.Remote(RemoteDocument(
      contentType = "text/html", contextUrl = None,
      document = JStr(absPage), documentUrl = "http://example.org/page.html")), JsonLdOptions())
    assert(absOut(0).asObj.get.get("@id").contains(JStr("http://kb.example/data/item1")))
    // relative base href resolves against the document URL first
    val relPage =
      """<base href="sub/">
        |<script type="application/ld+json">{"@id": "item2", "http://v/name": "n"}</script>""".stripMargin
    val relOut = JsonLdApi.expand(JsonLdInput.Remote(RemoteDocument(
      contentType = "text/html", contextUrl = None,
      document = JStr(relPage), documentUrl = "http://example.org/dir/page.html")), JsonLdOptions())
    assert(relOut(0).asObj.get.get("@id").contains(JStr("http://example.org/dir/sub/item2")))
    // no base element: document URL stays the base
    val nonePage =
      """<script type="application/ld+json">{"@id": "item3", "http://v/name": "n"}</script>"""
    val noneOut = JsonLdApi.expand(JsonLdInput.Remote(RemoteDocument(
      contentType = "text/html", contextUrl = None,
      document = JStr(nonePage), documentUrl = "http://example.org/dir/page.html")), JsonLdOptions())
    assert(noneOut(0).asObj.get.get("@id").contains(JStr("http://example.org/dir/item3")))
  }
}
