package graft.core

import graft.json.JsonParser
import ErrorCode._

/** Driver-side HTTP document loader implementing the reference's fetch rules
  * (/root/reference/src/remote/defaultdocumentloader.rs:19-131) on
  * `java.net.http.HttpClient` — no extra dependencies:
  *
  *  - Accept header `application/ld+json[;profile="p1 p2"], application/json`
  *    (:50-63)
  *  - redirects are followed, EXCEPT that 300 (Multiple Choices) and 303
  *    (See Other) freeze `documentUrl` at the URL that returned them while
  *    the body still comes from following the chain — the reference stops
  *    its redirect policy on those statuses and re-fetches with a
  *    follow-everything client (:19-24, :66-84); one fetch with a frozen
  *    documentUrl is behavior-identical
  *  - `application/ld+json` responses are returned as-is; context Link
  *    headers are deliberately ignored for them (:99)
  *  - `application/json` / `*+json` responses honor a
  *    `rel="http://www.w3.org/ns/json-ld#context"` Link header; more than
  *    one such header is the `multiple context link headers` error (:97-109)
  *  - any other non-HTML type follows a `rel="alternate"
  *    type="application/ld+json"` Link recursively (:110-124); without one —
  *    and for HTML types always — loading fails with "No JSON representation
  *    of resource found"
  *  - the Content-Type `profile` parameter is surfaced on the
  *    RemoteDocument (:131)
  *
  * Scale note (north_rule): this loader is for DRIVER-side resolution only.
  * Executors always read the broadcast map-backed pool
  * ([[graft.spark.RemoteContextPool]]); no per-row HTTP happens on the
  * cluster. In production the driver resolves the distinct context IRIs
  * through this loader once, then broadcasts.
  */
final class HttpDocumentLoader(
    requestProfile: Seq[String] = Nil,
    maxRedirects: Int = 10,
    maxAlternateDepth: Int = 4,
    maxCacheEntries: Int = 1024,
    htmlEnabled: Boolean = false,
    diskCacheDir: Option[String] = None
) extends DocumentLoader {
  import HttpDocumentLoader._

  // java.net.http.HttpClient is not serializable and never ships to
  // executors (driver-side only) — recreate after deserialization
  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NEVER)
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .build()

  /** Per-loader LRU response cache (the reference wraps its clients in an
    * HTTP cache middleware, defaultdocumentloader.rs:25-33; this is the
    * in-process analog). The entry stores the raw body TEXT, not the parsed
    * tree — JObj is mutable and callers may rewrite what load() returns, so
    * every hit re-parses into a fresh tree. Keyed by the requested IRI.
    */
  private final case class CacheEntry(contentType: String, contextUrl: Option[String],
      body: String, documentUrl: String, profile: Option[String], rawText: Boolean = false)
  @transient private lazy val cache: java.util.Map[String, CacheEntry] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, CacheEntry](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, CacheEntry]): Boolean =
          size() > maxCacheEntries
      })

  private val accept: String = {
    val sb = new StringBuilder("application/ld+json")
    if (requestProfile.nonEmpty)
      sb.append(";profile=\"").append(requestProfile.mkString(" ")).append('"')
    sb.append(", application/json")
    sb.toString
  }

  def load(iri: String): RemoteDocument = {
    var entry = cache.get(iri)
    if (entry == null) {
      entry = diskGet(iri).orNull
      if (entry == null) {
        entry = loadRec(iri, 0)
        diskPut(iri, entry)
      }
      cache.put(iri, entry)
    }
    // fresh parse per hit: the tree is mutable and callers may rewrite it.
    // HTML bodies stay raw text (JStr) — script extraction happens at the
    // API layer (HtmlScripts), driven by options.extractAllScripts.
    val doc: graft.json.JsonValue =
      if (entry.rawText) graft.json.JStr(entry.body)
      else parseBody(entry.body, entry.documentUrl)
    RemoteDocument(entry.contentType, entry.contextUrl, doc, entry.documentUrl, entry.profile)
  }

  private def loadRec(iri: String, depth: Int): CacheEntry = {
    // manual redirect loop so the 300/303 documentUrl-freeze rule is exact
    var url = iri
    var docUrl = iri
    var frozen = false
    var redirects = 0
    var resp: java.net.http.HttpResponse[String] = null
    while (resp == null) {
      val r =
        try client.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
            .header("Accept", accept).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        catch {
          case e: Exception =>
            throw JsonLdError(LoadingDocumentFailed, s"$url: ${e.getMessage}")
        }
      val sc = r.statusCode()
      if (sc >= 300 && sc < 400) {
        val loc = r.headers().firstValue("Location")
        if (redirects >= maxRedirects || loc.isEmpty)
          throw JsonLdError(LoadingDocumentFailed, s"unresolvable redirect at $url (status $sc)")
        if (sc == 300 || sc == 303) frozen = true
        url = resolveAgainst(url, loc.get)
        if (!frozen) docUrl = url
        redirects += 1
      } else if (sc >= 200 && sc < 300) {
        if (!frozen) docUrl = url
        resp = r
      } else {
        throw JsonLdError(LoadingDocumentFailed, s"$url returned status $sc")
      }
    }

    val ctHeader = resp.headers().firstValue("Content-Type")
    if (ctHeader.isEmpty)
      throw JsonLdError(LoadingDocumentFailed, "Content-Type header is missing")
    val (essence, params) = parseContentType(ctHeader.get)
    val profile = params.get("profile")
    import scala.jdk.CollectionConverters._
    lazy val links = resp.headers().allValues("Link").asScala.toVector
      .flatMap(v => parseLinkHeader(v, url))

    essence match {
      case "application/ld+json" =>
        parseBody(resp.body(), url) // validate before caching
        CacheEntry(essence, None, resp.body(), docUrl, profile)
      case t if t == "application/json" || t.endsWith("+json") =>
        val ctx = links.filter(_.relValues.contains("http://www.w3.org/ns/json-ld#context"))
        if (ctx.size > 1)
          throw JsonLdError(MultipleContextLinkHeaders, url)
        parseBody(resp.body(), url) // validate before caching
        CacheEntry(essence, ctx.headOption.map(_.target), resp.body(), docUrl, profile)
      case t if t == "text/html" || t == "application/xhtml+xml" =>
        // reference parity: its loader has no HTML path and fails here
        // (defaultdocumentloader.rs:116-126). Opt-in htmlEnabled delivers the
        // markup as raw text for the engine's HtmlScripts extraction instead.
        if (htmlEnabled) CacheEntry(essence, None, resp.body(), docUrl, profile, rawText = true)
        else throw JsonLdError(LoadingDocumentFailed, "No JSON representation of resource found")
      case _ =>
        links.find(l => l.relValues.contains("alternate") &&
            l.attrs.get("type").contains("application/ld+json")) match {
          case Some(alt) if depth < maxAlternateDepth => loadRec(alt.target, depth + 1)
          case _ =>
            throw JsonLdError(LoadingDocumentFailed, "No JSON representation of resource found")
        }
    }
  }

  private def parseBody(text: String, url: String): graft.json.JsonValue =
    try JsonParser.parse(text)
    catch { case e: Exception => throw JsonLdError(LoadingDocumentFailed, s"$url: ${e.getMessage}") }

  // ---- optional disk-persistent response cache ----
  // The reference wraps its HTTP clients in a DISK cache middleware
  // (defaultdocumentloader.rs:25-33) so contexts survive process restarts;
  // this is the analog: one content-addressed file per IRI (sha-256 of the
  // IRI as the file name) under `diskCacheDir`, honoring `maxCacheEntries`
  // by oldest-mtime eviction. Cache failures are never fatal — a corrupt or
  // unwritable entry just degrades to a refetch.

  private def diskFile(iri: String): Option[java.io.File] = diskCacheDir.map { dir =>
    val md = java.security.MessageDigest.getInstance("SHA-256")
    // the key covers the full loader CONFIGURATION, not just the IRI: an
    // entry fetched with a different Accept header (requestProfile), under
    // htmlEnabled, or through different redirect/alternate-link budgets may
    // hold a different response than this loader would fetch —
    // config-mismatched entries must miss, not serve
    val key = s"$iri\u0000$accept\u0000$htmlEnabled\u0000$maxRedirects\u0000$maxAlternateDepth"
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    new java.io.File(dir, hex + ".graftcache")
  }

  private def diskGet(iri: String): Option[CacheEntry] = diskFile(iri).flatMap { f =>
    if (!f.isFile) None
    else try {
      val fileLen = f.length()
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(new java.io.FileInputStream(f)))
      try {
        def str(): String = {
          val len = in.readInt()
          // length field must fit the file: a corrupt header must degrade
          // to a refetch, not attempt a multi-GB allocation (OutOfMemoryError
          // is not NonFatal and would escape the catch below)
          if (len < 0 || len > fileLen)
            throw new java.io.IOException(s"corrupt cache entry: len=$len file=$fileLen")
          val b = new Array[Byte](len); in.readFully(b); new String(b, "UTF-8")
        }
        def opt(): Option[String] = if (in.readBoolean()) Some(str()) else None
        val ct = str(); val ctx = opt(); val body = str()
        val docUrl = str(); val prof = opt(); val raw = in.readBoolean()
        Some(CacheEntry(ct, ctx, body, docUrl, prof, raw))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None } // corrupt entry → refetch
  }

  private def diskPut(iri: String, e: CacheEntry): Unit = diskFile(iri).foreach { f =>
    try {
      f.getParentFile.mkdirs()
      val tmp = java.io.File.createTempFile(f.getName, ".tmp", f.getParentFile)
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp)))
      try {
        def str(s: String): Unit = { val b = s.getBytes("UTF-8"); out.writeInt(b.length); out.write(b) }
        def opt(o: Option[String]): Unit = { out.writeBoolean(o.isDefined); o.foreach(str) }
        str(e.contentType); opt(e.contextUrl); str(e.body)
        str(e.documentUrl); opt(e.profile); out.writeBoolean(e.rawText)
      } finally out.close()
      // atomic publish: a concurrent reader never observes a half-written entry
      java.nio.file.Files.move(tmp.toPath, f.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val files = f.getParentFile.listFiles((_, name) => name.endsWith(".graftcache"))
      if (files != null && files.length > maxCacheEntries)
        files.sortBy(_.lastModified).take(files.length - maxCacheEntries).foreach(_.delete())
    } catch { case scala.util.control.NonFatal(_) => () } // cache write is best-effort
  }
}

object HttpDocumentLoader {

  /** One parsed RFC 8288 link value. `relValues` splits the rel attribute on
    * spaces (a rel can carry several relation types).
    */
  final case class Link(target: String, attrs: Map[String, String]) {
    def relValues: Set[String] =
      attrs.get("rel").map(_.split(" ").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
  }

  private def resolveAgainst(base: String, ref: String): String =
    Url.resolve(ref, Url.parse(base)).map(_.serialize).getOrElse(ref)

  /** Content-Type header → (lowercased essence, params). Quoted parameter
    * values are unquoted (enough for `profile="..."`).
    */
  def parseContentType(value: String): (String, Map[String, String]) = {
    val parts = value.split(";")
    val essence = parts(0).trim.toLowerCase
    val params = parts.iterator.drop(1).flatMap { p =>
      val eq = p.indexOf('=')
      if (eq < 0) None
      else {
        val k = p.substring(0, eq).trim.toLowerCase
        var v = p.substring(eq + 1).trim
        if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\"")) v = v.substring(1, v.length - 1)
        Some(k -> v)
      }
    }.toMap
    (essence, params)
  }

  /** Minimal RFC 8288 Link header parser: comma-separated link-values, each
    * `<target>; attr=value; attr="quoted value"`. Commas inside <> or quoted
    * strings do not split. Relative targets resolve against `baseUrl`.
    */
  def parseLinkHeader(header: String, baseUrl: String): Vector[Link] = {
    val out = Vector.newBuilder[Link]
    var i = 0
    val n = header.length
    while (i < n) {
      // skip whitespace / separators to the next '<'
      while (i < n && header.charAt(i) != '<') i += 1
      if (i < n) {
        val close = header.indexOf('>', i)
        if (close < 0) return out.result()
        val target = header.substring(i + 1, close).trim
        i = close + 1
        val attrs = Map.newBuilder[String, String]
        var done = false
        while (!done && i < n) {
          header.charAt(i) match {
            case ',' => done = true; i += 1
            case ';' =>
              i += 1
              // attr name
              val eq = {
                var j = i
                while (j < n && header.charAt(j) != '=' && header.charAt(j) != ',' && header.charAt(j) != ';') j += 1
                j
              }
              if (eq < n && header.charAt(eq) == '=') {
                val name = header.substring(i, eq).trim.toLowerCase
                i = eq + 1
                while (i < n && header.charAt(i) == ' ') i += 1
                val value =
                  if (i < n && header.charAt(i) == '"') {
                    val sb = new StringBuilder
                    i += 1
                    while (i < n && header.charAt(i) != '"') {
                      if (header.charAt(i) == '\\' && i + 1 < n) { sb.append(header.charAt(i + 1)); i += 2 }
                      else { sb.append(header.charAt(i)); i += 1 }
                    }
                    i += 1 // closing quote
                    sb.toString
                  } else {
                    var j = i
                    while (j < n && header.charAt(j) != ';' && header.charAt(j) != ',') j += 1
                    val v = header.substring(i, j).trim
                    i = j
                    v
                  }
                attrs += name -> value
              } else i = eq
            case ' ' | '\t' => i += 1
            case _ => i += 1
          }
        }
        out += Link(resolveAgainst(baseUrl, target), attrs.result())
      }
    }
    out.result()
  }
}
