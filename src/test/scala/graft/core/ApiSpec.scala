package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.json._

/** API-level paths not reachable from the fixture harness: Reference inputs
  * (remote document load), HTTP Link-header contexts (contextUrl), raw-text
  * documents, and the expandContext-by-reference option
  * (/root/reference/src/lib.rs:376-454).
  */
class ApiSpec extends AnyFunSuite {
  private val loader = new DocumentLoader.MapLoader(Map(
    "http://example.org/doc/a.jsonld" ->
      """{"@context":{"@vocab":"http://v/"},"@id":"rel-id","name":"remote doc"}""",
    "http://example.org/ctx/link.jsonld" ->
      """{"@context":{"linked":"http://linked/term"}}"""
  ))

  test("JsonLdInput.Ref loads the remote document; its URL becomes the base") {
    val out = JsonLdApi.expand(JsonLdInput.Ref("http://example.org/doc/a.jsonld"), JsonLdOptions(), loader)
    val node = out(0).asObj.get
    // @id resolves against the document URL (original_base_url path)
    assert(node.get("@id").contains(JStr("http://example.org/doc/rel-id")))
    assert(node.contains("http://v/name"))
  }

  test("unknown Reference → loading document failed") {
    val err = intercept[JsonLdError] {
      JsonLdApi.expand(JsonLdInput.Ref("http://example.org/doc/missing.jsonld"), JsonLdOptions(), loader)
    }
    assert(err.code == ErrorCode.LoadingDocumentFailed)
  }

  test("RemoteDocument contextUrl (HTTP Link header) is applied before expansion") {
    val doc = RemoteDocument(
      contentType = "application/json",
      contextUrl = Some("http://example.org/ctx/link.jsonld"),
      document = JsonParser.parse("""{"linked":"x"}"""),
      documentUrl = "http://example.org/doc/plain.json")
    val out = JsonLdApi.expand(JsonLdInput.Remote(doc), JsonLdOptions(), loader)
    assert(out(0).asObj.get.contains("http://linked/term"))
  }

  test("options.base overrides the document URL for base_iri but not original_base_url") {
    val doc = RemoteDocument("application/ld+json", None,
      JsonParser.parse("""{"@context":{"@vocab":"http://v/"},"@id":"x","p":"y"}"""),
      "http://docs.example/d.jsonld")
    val out = JsonLdApi.expand(JsonLdInput.Remote(doc), JsonLdOptions(base = Some("http://base.example/")), loader)
    assert(out(0).asObj.get.get("@id").contains(JStr("http://base.example/x")))
  }

  test("expandContext by reference") {
    val out = JsonLdApi.expand(JsonLdInput.Doc(JsonParser.parse("""{"linked":"z"}""")),
      JsonLdOptions(expandContext = Some(JsonOrRef.Ref("http://example.org/ctx/link.jsonld"))), loader)
    assert(out(0).asObj.get.contains("http://linked/term"))
  }

  test("toRdf ∘ fromRdf is the identity on every vendored toRdf fixture output") {
    val dir = java.nio.file.Paths.get("src/test/resources/w3c/toRdf")
    val cases = java.nio.file.Files.list(dir).iterator()
    var n = 0
    cases.forEachRemaining { p =>
      if (p.toString.endsWith("-out.nq")) {
        val triples = BnodeCanon.parseNQuads(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        val back = ToRdf.toRdf(JsonLdApi.fromRdf(triples), JsonLdOptions())
        assert(BnodeCanon.toCanonicalNQuads(back) == BnodeCanon.toCanonicalNQuads(triples),
          s"round-trip mismatch for $p")
        n += 1
      }
    }
    assert(n >= 10)
  }

  test("flatten is idempotent modulo bnode relabeling (flatten ∘ flatten ≍ flatten)") {
    val docTxt = """{"@context":{"@vocab":"http://v/"},
      "@id":"http://s/a","nested":{"p":"x","deeper":{"q":"y"}},
      "g":{"@id":"http://s/g1","@graph":[{"@id":"http://s/b","r":"z"}]}}"""
    val opts = JsonLdOptions(base = Some("http://base/doc"))
    val once = JsonLdApi.flatten(JsonLdInput.Doc(JsonParser.parse(docTxt)), None, opts).asArr.get
    val twice = JsonLdApi.flatten(JsonLdInput.Doc(once.deepCopy), None, opts).asArr.get
    assert(JsonEq.jsonLdEq(once, twice), s"\nonce:  $once\ntwice: $twice")
  }

  test("fromRdf rejects ill-formed rdf:JSON literals with the reference error string") {
    val nq = """<http://e/a> <http://e/p> "{not json"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> ."""
    val err = intercept[JsonLdError] { JsonLdApi.fromRdf(BnodeCanon.parseNQuads(nq)) }
    assert(err.code.rendered == "invalid JSON literal")
  }

  test("fromRdf named-graph + list + native types integration") {
    val nq =
      """<http://e/a> <http://e/p> _:l0 .
        |_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
        |<http://e/a> <http://e/q> "v" <http://e/g> .
        |""".stripMargin
    val out = JsonLdApi.fromRdf(BnodeCanon.parseNQuads(nq), JsonLdOptions(useNativeTypes = true))
    val byId = out.iterator.map(_.asObj.get).map(o => o.get("@id").flatMap(_.asString).get -> o).toMap
    val list = byId("http://e/a").get("http://e/p").get.asArr.get(0).asObj.get.get("@list").get.asArr.get
    assert(list.size == 1 && list(0).asObj.get.get("@value").contains(JNum(7)))
    assert(byId("http://e/g").get("@graph").get.asArr.get.size == 1)
  }

  test("compactToRelative gates only the document-URL fallback (lib.rs:323-331)") {
    // RemoteDocument input, no options.base: context_base = document URL.
    // compactToRelative=true → @id relativized against it; false → absolute.
    // (With options.base SET, the base always wins and the flag is moot —
    // fixture c0026 pins that quirk.)
    val doc = RemoteDocument("application/ld+json", None,
      JsonParser.parse("""{"@id":"http://example.org/dir/other","http://p/p":"v"}"""),
      "http://example.org/dir/doc.jsonld")
    val ctx = JsonParser.parse("""{"@context":{"p":"http://p/p"}}""")
    val rel = JsonLdApi.compact(JsonLdInput.Remote(doc), Some(ctx), JsonLdOptions())
    assert(rel.asObj.get.get("@id").contains(JStr("other")), s"got $rel")
    val abs = JsonLdApi.compact(JsonLdInput.Remote(doc), Some(ctx),
      JsonLdOptions(compactToRelative = false))
    assert(abs.asObj.get.get("@id").contains(JStr("http://example.org/dir/other")), s"got $abs")
  }

  test("compact round-trips its own expansion (expand ∘ compact ≍ expand)") {
    val docTxt = """{"@context":{"@vocab":"http://v/","items":{"@container":"@list"},"label":{"@container":"@language"}},
      "@id":"http://s/","items":[1,2],"label":{"en":"hi"},"plain":"v","typed":{"@value":"x","@type":"http://t/"}}"""
    val opts = JsonLdOptions(base = Some("http://base/doc"))
    val expanded = JsonLdApi.expand(JsonLdInput.Doc(JsonParser.parse(docTxt)), opts)
    val ctx = JsonParser.parse("""{"@context":{"@vocab":"http://v/","items":{"@container":"@list"},"label":{"@container":"@language"}}}""")
    val compacted = JsonLdApi.compact(JsonLdInput.Doc(expanded.deepCopy), Some(ctx), opts)
    val reexpanded = JsonLdApi.expand(JsonLdInput.Doc(compacted), opts)
    assert(JsonEq.jsonLdEq(expanded, reexpanded),
      s"\nexpanded:   $expanded\nreexpanded: $reexpanded")
  }
}
