package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.json._
import java.net.InetSocketAddress

/** HttpDocumentLoader against a local fixture HTTP server (loopback only —
  * zero egress): the reference's redirect / Link-header / alternate-link
  * rules (/root/reference/src/remote/defaultdocumentloader.rs:19-131).
  */
class HttpLoaderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val hitCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private def respond(ex: HttpExchange, status: Int, body: String, headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private val ldDoc = """{"@context":{"@vocab":"http://v/"},"@id":"http://s/","name":"served"}"""

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
    server.createContext("/real.jsonld", (ex: HttpExchange) =>
      respond(ex, 200, ldDoc, "Content-Type" -> "application/ld+json"))
    server.createContext("/see-other", (ex: HttpExchange) =>
      respond(ex, 303, "", "Location" -> s"$base/real.jsonld"))
    server.createContext("/moved", (ex: HttpExchange) =>
      respond(ex, 302, "", "Location" -> s"$base/real.jsonld"))
    server.createContext("/moved-then-303", (ex: HttpExchange) =>
      respond(ex, 302, "", "Location" -> s"$base/see-other"))
    server.createContext("/plain.json", (ex: HttpExchange) =>
      respond(ex, 200, """{"linked":"x"}""",
        "Content-Type" -> "application/json",
        "Link" -> s"""<$base/ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context""""))
    server.createContext("/ctx.jsonld", (ex: HttpExchange) =>
      respond(ex, 200, """{"@context":{"linked":"http://linked/term"}}""",
        "Content-Type" -> "application/ld+json"))
    server.createContext("/two-links.json", (ex: HttpExchange) =>
      respond(ex, 200, """{"a":1}""",
        "Content-Type" -> "application/json",
        "Link" -> s"""<$base/ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context"""",
        "Link" -> s"""<$base/ctx2.jsonld>; rel="http://www.w3.org/ns/json-ld#context""""))
    server.createContext("/turtle", (ex: HttpExchange) =>
      respond(ex, 200, "<http://s/> <http://p/> <http://o/> .",
        "Content-Type" -> "text/turtle",
        "Link" -> s"""<$base/real.jsonld>; rel="alternate"; type="application/ld+json""""))
    server.createContext("/turtle-no-alt", (ex: HttpExchange) =>
      respond(ex, 200, "<http://s/> <http://p/> <http://o/> .",
        "Content-Type" -> "text/turtle"))
    server.createContext("/page.html", (ex: HttpExchange) =>
      respond(ex, 200, "<html></html>",
        "Content-Type" -> "text/html",
        // HTML never follows alternate links (reference skips the scan for html)
        "Link" -> s"""<$base/real.jsonld>; rel="alternate"; type="application/ld+json""""))
    server.createContext("/embedded.html", (ex: HttpExchange) =>
      respond(ex, 200,
        """<html><head><script type="application/ld+json">
          |{"@context": {"@vocab": "http://v/"}, "@id": "http://n/embedded", "name": "page"}
          |</script></head><body>x</body></html>""".stripMargin,
        "Content-Type" -> "text/html"))
    server.createContext("/counted.jsonld", (ex: HttpExchange) => {
      hitCount.incrementAndGet()
      respond(ex, 200, ldDoc, "Content-Type" -> "application/ld+json")
    })
    server.createContext("/profiled.jsonld", (ex: HttpExchange) =>
      respond(ex, 200, ldDoc,
        "Content-Type" -> "application/ld+json; profile=\"http://www.w3.org/ns/json-ld#expanded\""))
    server.createContext("/ld-with-link", (ex: HttpExchange) =>
      respond(ex, 200, ldDoc,
        "Content-Type" -> "application/ld+json",
        "Link" -> s"""<$base/ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context""""))
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def loader = new HttpDocumentLoader()

  test("plain load of application/ld+json") {
    val doc = loader.load(s"$base/real.jsonld")
    assert(doc.contentType == "application/ld+json")
    assert(doc.documentUrl == s"$base/real.jsonld")
    assert(doc.contextUrl.isEmpty)
    assert(doc.document.asObj.exists(_.contains("name")))
  }

  test("303 See Other: body from the target, documentUrl frozen at the 303 URL") {
    val doc = loader.load(s"$base/see-other")
    assert(doc.document.asObj.exists(_.contains("name")))
    assert(doc.documentUrl == s"$base/see-other")
  }

  test("302 Found: documentUrl follows to the final URL") {
    val doc = loader.load(s"$base/moved")
    assert(doc.documentUrl == s"$base/real.jsonld")
  }

  test("302 then 303: documentUrl is the URL that returned the 303") {
    val doc = loader.load(s"$base/moved-then-303")
    assert(doc.document.asObj.exists(_.contains("name")))
    assert(doc.documentUrl == s"$base/see-other")
  }

  test("application/json honors the context Link header, and expansion applies it") {
    val doc = loader.load(s"$base/plain.json")
    assert(doc.contextUrl.contains(s"$base/ctx.jsonld"))
    val out = JsonLdApi.expand(JsonLdInput.Remote(doc), JsonLdOptions(), loader)
    assert(out(0).asObj.get.contains("http://linked/term"))
  }

  test("two context Link headers → multiple context link headers error") {
    val err = intercept[JsonLdError] { loader.load(s"$base/two-links.json") }
    assert(err.code == ErrorCode.MultipleContextLinkHeaders)
  }

  test("context Link header is ignored for application/ld+json") {
    val doc = loader.load(s"$base/ld-with-link")
    assert(doc.contextUrl.isEmpty)
  }

  test("alternate-link recursion: non-JSON media type follows rel=alternate type=application/ld+json") {
    val doc = loader.load(s"$base/turtle")
    assert(doc.contentType == "application/ld+json")
    assert(doc.documentUrl == s"$base/real.jsonld")
    assert(doc.document.asObj.exists(_.contains("name")))
  }

  test("non-JSON type without an alternate link fails") {
    val err = intercept[JsonLdError] { loader.load(s"$base/turtle-no-alt") }
    assert(err.code == ErrorCode.LoadingDocumentFailed)
  }

  test("HTML never follows alternate links (parity with the reference's skip)") {
    val err = intercept[JsonLdError] { loader.load(s"$base/page.html") }
    assert(err.code == ErrorCode.LoadingDocumentFailed)
  }

  test("htmlEnabled loader delivers markup as raw text; expand extracts the embedded script") {
    val l = new HttpDocumentLoader(htmlEnabled = true)
    val doc = l.load(s"$base/embedded.html")
    assert(doc.contentType == "text/html")
    assert(doc.document.isInstanceOf[JStr])
    val out = JsonLdApi.expand(JsonLdInput.Remote(doc), JsonLdOptions(), l)
    assert(out.size == 1)
    assert(out(0).asObj.get.get("@id").contains(JStr("http://n/embedded")))
  }

  test("Content-Type profile parameter is surfaced") {
    val doc = loader.load(s"$base/profiled.jsonld")
    assert(doc.profile.contains("http://www.w3.org/ns/json-ld#expanded"))
  }

  test("response cache: repeated loads of the same IRI hit the server once, trees don't alias") {
    val l = loader // one instance — the cache is per-loader
    hitCount.set(0)
    val d1 = l.load(s"$base/counted.jsonld")
    val d2 = l.load(s"$base/counted.jsonld")
    assert(hitCount.get() == 1, s"expected a single upstream hit, got ${hitCount.get()}")
    assert(d1.document == d2.document)
    // mutating one returned tree must not leak into the next load (fresh parse per hit)
    d1.document.asObj.get.put("mutated", JStr("yes"))
    val d3 = l.load(s"$base/counted.jsonld")
    assert(!d3.document.asObj.get.contains("mutated"))
    assert(hitCount.get() == 1)
  }

  test("disk cache: a SECOND loader instance serves from disk with zero network hits") {
    val dir = java.nio.file.Files.createTempDirectory("graft-http-disk").toString
    hitCount.set(0)
    val first = new HttpDocumentLoader(diskCacheDir = Some(dir))
    val d1 = first.load(s"$base/counted.jsonld")
    assert(hitCount.get() == 1)
    // fresh instance = simulated driver restart: in-memory LRU is empty,
    // the disk entry must satisfy the load without touching the network
    val second = new HttpDocumentLoader(diskCacheDir = Some(dir))
    val d2 = second.load(s"$base/counted.jsonld")
    assert(hitCount.get() == 1, s"disk-cached load still hit the server (${hitCount.get()} hits)")
    assert(d2.document == d1.document)
    assert(d2.contentType == d1.contentType && d2.documentUrl == d1.documentUrl)
    // corrupt entry degrades to a refetch, never a failure
    val files = new java.io.File(dir).listFiles((_, n) => n.endsWith(".graftcache"))
    assert(files.nonEmpty, "disk cache wrote no entry")
    files.foreach { f => java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3)) }
    val third = new HttpDocumentLoader(diskCacheDir = Some(dir))
    val d3 = third.load(s"$base/counted.jsonld")
    assert(d3.document == d1.document)
    assert(hitCount.get() == 2, "corrupt disk entry should have refetched once")
  }

  test("disk cache honors maxCacheEntries by evicting oldest entries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-http-evict").toString
    val l = new HttpDocumentLoader(diskCacheDir = Some(dir), maxCacheEntries = 2)
    // three distinct IRIs (same endpoint, different query strings → distinct keys)
    l.load(s"$base/real.jsonld")
    Thread.sleep(20) // mtime granularity
    l.load(s"$base/real.jsonld?v=2")
    Thread.sleep(20)
    l.load(s"$base/real.jsonld?v=3")
    val files = new java.io.File(dir).listFiles((_, n) => n.endsWith(".graftcache"))
    assert(files.length == 2, s"expected 2 surviving entries, got ${files.length}")
  }

  test("driver-side resolution: pool first, HTTP fetcher for unknown IRIs, failures dropped") {
    val resolved = graft.spark.RemoteContextPool.resolveAll(
      Vector(
        "http://graft.example/ctx/vocab.jsonld", // vendored pool
        s"$base/ctx.jsonld",                     // fetched over loopback HTTP
        s"$base/missing.jsonld"),                // 404 → dropped, not fatal
      fetcher = Some(loader))
    assert(resolved.contains("http://graft.example/ctx/vocab.jsonld"))
    assert(resolved.get(s"$base/ctx.jsonld").exists(_.contains("http://linked/term")))
    assert(!resolved.contains(s"$base/missing.jsonld"))
    assert(resolved.size == 2)
  }

  test("Link parser: multiple links in one header, commas inside quotes, rel lists") {
    val links = HttpDocumentLoader.parseLinkHeader(
      """</a>; rel="alternate stylesheet"; title="x, y", <http://h/b>; rel=next; type="text/plain"""",
      "http://h/base/")
    assert(links.size == 2)
    assert(links(0).target == "http://h/a")
    assert(links(0).relValues == Set("alternate", "stylesheet"))
    assert(links(0).attrs("title") == "x, y")
    assert(links(1).target == "http://h/b")
    assert(links(1).relValues == Set("next"))
    assert(links(1).attrs("type") == "text/plain")
  }
}
