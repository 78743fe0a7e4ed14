package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.json._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Runs the vendored W3C-style fixture corpus (FIXTURES.md §2):
  *   src/test/resources/w3c/expand/<id>-{in,out}.jsonld [-options.json | -error.txt]
  *   src/test/resources/w3c/toRdf/<id>-{in.jsonld,out.nq}
  *   src/test/resources/w3c/contexts/<host>/<path>  (vendored remote docs)
  * Expand comparisons use the ported json_ld_eq
  * (/root/reference/tests/util/mod.rs:6-41); toRdf comparisons are
  * set-equality on canonicalized triples.
  */
class W3CSuiteSpec extends AnyFunSuite {
  private val root = Paths.get("src/test/resources/w3c")

  private def readFile(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")

  /** Vendored remote documents: contexts/<name>.jsonld served as
    * http://example.org/ctx/<name>.jsonld
    */
  lazy val loader: DocumentLoader = {
    val dir = root.resolve("contexts")
    val docs: Map[String, String] =
      if (Files.isDirectory(dir))
        Files.list(dir).iterator.asScala.filter(_.toString.endsWith(".jsonld")).map { p =>
          s"http://example.org/ctx/${p.getFileName}" -> readFile(p)
        }.toMap
      else Map.empty
    new DocumentLoader.MapLoader(docs)
  }

  private def listCases(dir: Path, suffix: String = "-in.jsonld"): Vector[String] =
    if (!Files.isDirectory(dir)) Vector.empty
    else Files.list(dir).iterator.asScala.map(_.getFileName.toString)
      .filter(_.endsWith(suffix)).map(_.stripSuffix(suffix)).toVector.sorted

  private def optionsFor(dir: Path, id: String, defaultBase: String): JsonLdOptions = {
    val p = dir.resolve(s"$id-options.json")
    var opts = JsonLdOptions(base = Some(defaultBase))
    if (Files.exists(p)) {
      val o = JsonParser.parse(readFile(p)).asObj.get
      o.get("base").foreach(b => opts = opts.copy(base = b.asString))
      o.get("processingMode").foreach(m =>
        opts = opts.copy(processingMode =
          if (m.asString.contains("json-ld-1.0")) ProcessingMode.JsonLd10 else ProcessingMode.JsonLd11))
      o.get("ordered").foreach(x => opts = opts.copy(ordered = x.asBool.get))
      o.get("rdfDirection").foreach(x => opts = opts.copy(rdfDirection = x.asString))
      o.get("produceGeneralizedRdf").foreach(x => opts = opts.copy(produceGeneralizedRdf = x.asBool.get))
      o.get("useNativeTypes").foreach(x => opts = opts.copy(useNativeTypes = x.asBool.get))
      o.get("useRdfType").foreach(x => opts = opts.copy(useRdfType = x.asBool.get))
      o.get("compactArrays").foreach(x => opts = opts.copy(compactArrays = x.asBool.get))
      o.get("compactToRelative").foreach(x => opts = opts.copy(compactToRelative = x.asBool.get))
      o.get("expandContext").foreach {
        case JStr(iri) => opts = opts.copy(expandContext = Some(JsonOrRef.Ref(iri)))
        case obj: JObj => opts = opts.copy(expandContext = Some(JsonOrRef.Obj(obj)))
        case _ =>
      }
    }
    opts
  }

  // ---- expand ----
  private val expandDir = root.resolve("expand")
  for (id <- listCases(expandDir)) {
    val errFile = expandDir.resolve(s"$id-error.txt")
    if (Files.exists(errFile)) {
      test(s"expand/$id (negative)") {
        val input = JsonParser.parse(readFile(expandDir.resolve(s"$id-in.jsonld")))
        val opts = optionsFor(expandDir, id, s"http://example.org/t/$id-in.jsonld")
        val expected = readFile(errFile).trim
        val err = intercept[JsonLdError] {
          JsonLdApi.expand(JsonLdInput.Doc(input), opts, loader)
        }
        assert(err.code.rendered == expected, s"got: ${err.render}")
      }
    } else {
      test(s"expand/$id") {
        val input = JsonParser.parse(readFile(expandDir.resolve(s"$id-in.jsonld")))
        val opts = optionsFor(expandDir, id, s"http://example.org/t/$id-in.jsonld")
        val expected = JsonParser.parse(readFile(expandDir.resolve(s"$id-out.jsonld")))
        val actual = JsonLdApi.expand(JsonLdInput.Doc(input), opts, loader)
        assert(JsonEq.jsonLdEq(actual, expected, ordered = opts.ordered),
          s"\nexpected: ${JsonWriter.write(expected)}\nactual:   ${JsonWriter.write(actual)}")
      }
    }
  }

  test("ordered and unordered expansion agree (as sets) on every positive expand fixture") {
    // `ordered` only fixes map-entry PROCESSING order (spec: deterministic
    // output ordering); it must never change the result set. Any divergence
    // means some code path depends on map insertion order for semantics.
    for (id <- listCases(expandDir)
         if !Files.exists(expandDir.resolve(s"$id-error.txt"))) {
      val base = s"http://example.org/t/$id-in.jsonld"
      val opts = optionsFor(expandDir, id, base)
      def run(ordered: Boolean) = JsonLdApi.expand(
        JsonLdInput.Doc(JsonParser.parse(readFile(expandDir.resolve(s"$id-in.jsonld")))),
        opts.copy(ordered = ordered), loader)
      val unord = run(ordered = false)
      val ord = run(ordered = true)
      assert(JsonEq.jsonLdEq(ord, unord, ordered = false),
        s"fixture $id: ordered expansion changed the RESULT, not just its order\nordered:   ${JsonWriter.write(ord)}\nunordered: ${JsonWriter.write(unord)}")
    }
  }

  // ---- toRdf ----
  private val toRdfDir = root.resolve("toRdf")
  for (id <- listCases(toRdfDir)) {
    test(s"toRdf/$id") {
      val input = JsonParser.parse(readFile(toRdfDir.resolve(s"$id-in.jsonld")))
      val opts = optionsFor(toRdfDir, id, s"http://example.org/t/$id-in.jsonld")
      val expected = BnodeCanon.parseNQuads(readFile(toRdfDir.resolve(s"$id-out.nq")))
      val expanded = JsonLdApi.expand(JsonLdInput.Doc(input), opts, loader)
      val actual = ToRdf.toRdf(expanded, opts)
      val actualC = BnodeCanon.toCanonicalNQuads(actual)
      val expectedC = BnodeCanon.toCanonicalNQuads(expected)
      assert(actualC == expectedC, s"\nexpected:\n$expectedC\nactual:\n$actualC")
    }
  }

  test("flatten preserves the RDF graph on every positive expand fixture (canonical quads)") {
    // flattening rearranges the tree into a node map and relabels blank
    // nodes, but the GRAPH must be untouched: toRdf(flatten(in)) must equal
    // toRdf(expand(in)) after canonical bnode labeling. Runs the flatten
    // node-map machinery against every expansion shape the suite covers.
    for (id <- listCases(expandDir)
         if !Files.exists(expandDir.resolve(s"$id-error.txt"))) {
      val opts = optionsFor(expandDir, id, s"http://example.org/t/$id-in.jsonld")
      val input = () => JsonParser.parse(readFile(expandDir.resolve(s"$id-in.jsonld")))
      val expanded = JsonLdApi.expand(JsonLdInput.Doc(input()), opts, loader)
      val flattened = JsonLdApi.flatten(JsonLdInput.Doc(input()), None, opts, loader).asArr
        .getOrElse(fail(s"fixture $id: flatten did not return an array"))
      val qExpanded = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(expanded, opts))
      val qFlattened = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(flattened, opts))
      assert(qExpanded == qFlattened,
        s"fixture $id: flatten changed the graph\nexpand:\n$qExpanded\nflatten:\n$qFlattened")
    }
  }

  // ---- flatten ----
  // flatten/<id>-{in,out}.jsonld [-context.jsonld] : expand(in), flatten,
  // optionally compact against the context (same shaping as the compact API)
  private val flattenDir = root.resolve("flatten")
  for (id <- listCases(flattenDir)) {
    test(s"flatten/$id") {
      val input = JsonParser.parse(readFile(flattenDir.resolve(s"$id-in.jsonld")))
      val opts = optionsFor(flattenDir, id, s"http://example.org/t/$id-in.jsonld")
      val ctxFile = flattenDir.resolve(s"$id-context.jsonld")
      val ctx = if (Files.exists(ctxFile)) Some(JsonParser.parse(readFile(ctxFile))) else None
      val expected = JsonParser.parse(readFile(flattenDir.resolve(s"$id-out.jsonld")))
      val actual = JsonLdApi.flatten(JsonLdInput.Doc(input), ctx, opts, loader)
      assert(JsonEq.jsonLdEq(actual, expected, ordered = false),
        s"\nexpected: ${JsonWriter.write(expected)}\nactual:   ${JsonWriter.write(actual)}")
    }
  }

  // ---- fromRdf ----
  // fromRdf/<id>-in.nq + <id>-out.jsonld [+ <id>-options.json]
  private val fromRdfDir = root.resolve("fromRdf")
  for (id <- listCases(fromRdfDir, suffix = "-in.nq")) {
    val errFile = fromRdfDir.resolve(s"$id-error.txt")
    if (Files.exists(errFile)) {
      test(s"fromRdf/$id (negative)") {
        val dataset = BnodeCanon.parseNQuads(readFile(fromRdfDir.resolve(s"$id-in.nq")))
        val opts = optionsFor(fromRdfDir, id, s"http://example.org/t/$id-in.nq")
        val expected = readFile(errFile).trim
        val err = intercept[JsonLdError] { JsonLdApi.fromRdf(dataset, opts) }
        assert(err.code.rendered == expected, s"got: ${err.render}")
      }
    } else
    test(s"fromRdf/$id") {
      val dataset = BnodeCanon.parseNQuads(readFile(fromRdfDir.resolve(s"$id-in.nq")))
      val opts = optionsFor(fromRdfDir, id, s"http://example.org/t/$id-in.nq")
      val expected = JsonParser.parse(readFile(fromRdfDir.resolve(s"$id-out.jsonld")))
      val actual = JsonLdApi.fromRdf(dataset, opts)
      assert(JsonEq.jsonLdEq(actual, expected, ordered = false),
        s"\nexpected: ${JsonWriter.write(expected)}\nactual:   ${JsonWriter.write(actual)}")
    }
  }

  test("toRdf of fromRdf is the identity on every toRdf fixture's expected quads") {
    // the corpus-scale j06 gate, replayed over the suite's hand-derived
    // .nq files (lists, typed literals, named graphs, unicode escapes):
    // parsing the quads, serializing to JSON-LD, and converting back must
    // reproduce the exact canonical dataset
    for (id <- listCases(toRdfDir)) {
      val quads = BnodeCanon.parseNQuads(readFile(toRdfDir.resolve(s"$id-out.nq")))
      val opts = optionsFor(toRdfDir, id, s"http://example.org/t/$id-in.jsonld")
      val back = ToRdf.toRdf(JsonLdApi.fromRdf(quads, opts), opts)
      assert(BnodeCanon.toCanonicalNQuads(back) == BnodeCanon.toCanonicalNQuads(quads),
        s"fixture $id: toRdf∘fromRdf is not the identity")
    }
  }

  test("sweep 3: fromRdf∘toRdf round-trips under the full options grid (identity / convergence)") {
    // the identity test above runs each dataset only under its OWN fixture
    // options; this sweep replays every toRdf expected output AND every
    // positive fromRdf input under all 12 combinations of
    // useNativeTypes × useRdfType × rdfDirection. Invariants:
    //  - useNativeTypes=false: toRdf∘fromRdf is the IDENTITY (no combo may
    //    lose or rewrite a single quad — rdf:type goes through @type or a
    //    plain property, i18n/compound direction literals survive whether
    //    or not the deserializer understands them, generalized-RDF bnode
    //    predicates and ill-formed lists pass through verbatim)
    //  - useNativeTypes=true: native conversion legitimately rewrites
    //    lexical forms (canonical "1.0E0"^^xsd:double → native 1 →
    //    "1"^^xsd:integer), so identity is replaced by CONVERGENCE: a
    //    second round trip must be a fixpoint (loss would also converge,
    //    which is why the unt=false identity leg carries the loss check)
    val grid = for {
      unt <- Seq(false, true)
      urt <- Seq(false, true)
      dir <- Seq(None, Some("i18n-datatype"), Some("compound-literal"))
    } yield (unt, urt, dir)
    val datasets =
      listCases(toRdfDir).map(id => s"toRdf/$id" ->
        (() => (BnodeCanon.parseNQuads(readFile(toRdfDir.resolve(s"$id-out.nq"))),
                optionsFor(toRdfDir, id, s"http://example.org/t/$id-in.jsonld")))) ++
      listCases(fromRdfDir, suffix = "-in.nq")
        .filter(id => !Files.exists(fromRdfDir.resolve(s"$id-error.txt")))
        .map(id => s"fromRdf/$id" ->
        (() => (BnodeCanon.parseNQuads(readFile(fromRdfDir.resolve(s"$id-in.nq"))),
                optionsFor(fromRdfDir, id, s"http://example.org/t/$id-in.nq"))))
    var combos = 0
    for ((label, load) <- datasets) {
      val (quads, baseOpts) = load()
      val qIn = BnodeCanon.toCanonicalNQuads(quads)
      for ((unt, urt, dir) <- grid) {
        combos += 1
        val opts = baseOpts.copy(useNativeTypes = unt, useRdfType = urt, rdfDirection = dir)
        val q1 = ToRdf.toRdf(JsonLdApi.fromRdf(quads, opts), opts)
        val c1 = BnodeCanon.toCanonicalNQuads(q1)
        if (!unt)
          assert(c1 == qIn,
            s"$label unt=$unt urt=$urt dir=$dir: round trip changed the dataset\nin:\n$qIn\nout:\n$c1")
        else {
          val q2 = ToRdf.toRdf(JsonLdApi.fromRdf(q1, opts), opts)
          val c2 = BnodeCanon.toCanonicalNQuads(q2)
          assert(c2 == c1,
            s"$label unt=$unt urt=$urt dir=$dir: round trip is not convergent\ntrip1:\n$c1\ntrip2:\n$c2")
        }
      }
    }
    info(s"$combos (dataset, options) combinations round-trip")
  }

  test("sweep 4: wildcard framing preserves the merged graph on every fixture input, under all @embed modes") {
    // framing runs over the MERGED node map (Framing.frame: frameDefault
    // =false), and the empty frame is the universal wildcard — every node
    // matches, nothing is filtered, no @default invents values. So for ANY
    // input and ANY @embed mode the framed output must describe exactly the
    // union of the input's per-graph triples:
    //   quads(expand(frame(in, {@embed: m}))) | graph-stripped, deduped
    //     == quads(expand(in))                | graph-stripped, deduped
    // @once/@always only move WHERE a node is spelled out (embedded once /
    // duplicated) — never which statements exist. @never is deliberately
    // NOT in this grid: the spec reduces even top-level matches to bare
    // node references (pinned by fr0016), so data drops BY DESIGN there —
    // its no-invention side is covered by sweep 5's fixture frames.
    // Runs every positive expand input + every frame input + every positive
    // compact input (the suite's full shape zoo) through the framing
    // machinery x 2 embed modes.
    def mergedCanonical(ts: Vector[Triple]): String =
      BnodeCanon.toCanonicalNQuads(ts.map(_.copy(graph = "")).distinct)
    val inputs: Vector[(String, Path, String)] =
      listCases(expandDir).filter(id => !Files.exists(expandDir.resolve(s"$id-error.txt")))
        .map(id => (s"expand/$id", expandDir, id)) ++
      listCases(frameDir).map(id => (s"frame/$id", frameDir, id)) ++
      listCases(compactDir).filter(id => !Files.exists(compactDir.resolve(s"$id-error.txt")))
        .map(id => (s"compact/$id", compactDir, id))
    def hasRelativeIri(v: JsonValue): Boolean = v match {
      case a: JArr => a.iterator.exists(hasRelativeIri)
      case o: JObj => o.iterator.exists { case (k, vv) =>
        (k == "@id" && vv.asString.exists(id => !id.contains(':'))) || hasRelativeIri(vv)
      }
      case _ => false
    }
    var combos = 0
    var skips = 0
    for ((label, dir, id) <- inputs) {
      val opts = optionsFor(dir, id, s"http://example.org/t/$id-in.jsonld")
      // 1.0-mode docs exercise constructs framing (a 1.1 spec) rejects;
      // relative-IRI expansions are dropped by toRdf on the input side but
      // re-resolved against base on the output side — both skipped, counted
      if (opts.processingMode == ProcessingMode.JsonLd10) skips += 1
      else {
        val expandedIn = JsonLdApi.expand(
          JsonLdInput.Doc(JsonParser.parse(readFile(dir.resolve(s"$id-in.jsonld")))), opts, loader)
        if (hasRelativeIri(expandedIn)) skips += 1
        else {
          val qIn = mergedCanonical(ToRdf.toRdf(expandedIn.deepCopy.asArr.get, opts))
          for (embed <- Seq("@once", "@always")) {
            combos += 1
            val framed =
              try JsonLdApi.frame(JsonLdInput.Doc(expandedIn.deepCopy),
                JObj("@embed" -> JStr(embed)), opts, loader)
              catch { case e: JsonLdError =>
                fail(s"$label embed=$embed: framing threw ${e.render}") }
            val re =
              try JsonLdApi.expand(JsonLdInput.Doc(framed), opts, loader)
              catch { case e: JsonLdError =>
                fail(s"$label embed=$embed: re-expansion threw ${e.render}\nframed: ${JsonWriter.write(framed)}") }
            val qOut = mergedCanonical(ToRdf.toRdf(re, opts))
            assert(qOut == qIn,
              s"$label embed=$embed: wildcard framing changed the merged graph\nframed: ${JsonWriter.write(framed)}\nquads(in):\n$qIn\nquads(framed):\n$qOut")
          }
        }
      }
    }
    info(s"$combos (input, embed) combinations merged-graph-preserving ($skips 1.0-mode or base-sensitive inputs skipped)")
  }

  test("sweep 5: framing any input against any fixture frame is total, expandable, and never invents ground statements") {
    // cross-product robustness + soundness over every (input, frame) pair
    // the suite knows (frame inputs + every positive expand input, x every
    // fixture frame — most pairs are "wrong" frames for the doc, exactly
    // the shapes a targeted fixture never tries):
    //  - frame() must complete (any failure is a crash bug: framing has no
    //    spec-defined input-dependent errors outside frame validation)
    //  - the framed output must itself be expandable
    //  - framing SELECTS and RESHAPES — it must never fabricate data: when
    //    the frame declares no @default anywhere, every GROUND quad (no
    //    bnode in any position) of the framed output must already be a
    //    quad of the input's merged graph. (@default legitimately adds
    //    values; bnode quads are excluded because relabeling breaks
    //    per-quad set comparison.)
    def hasDefault(v: JsonValue): Boolean = v match {
      case o: JObj => o.iterator.exists { case (k, vv) => k == "@default" || hasDefault(vv) }
      case a: JArr => a.iterator.exists(hasDefault)
      case _ => false
    }
    def groundQuads(ts: Vector[Triple]): Set[Triple] =
      ts.map(_.copy(graph = ""))
        .filter(t => !t.subj.startsWith("_:") && !t.pred.startsWith("_:") && t.objKind != "bnode")
        .toSet
    def hasRelIri(v: JsonValue): Boolean = v match {
      case a: JArr => a.iterator.exists(hasRelIri)
      case o: JObj => o.iterator.exists { case (k, vv) =>
        (k == "@id" && vv.asString.exists(id => !id.contains(':'))) || hasRelIri(vv)
      }
      case _ => false
    }
    val frames = listCases(frameDir)
      .filter(id => !Files.exists(frameDir.resolve(s"$id-error.txt"))) // negative frames throw by design
      .map { id =>
        val f = JsonParser.parse(readFile(frameDir.resolve(s"$id-frame.jsonld")))
        (id, f, hasDefault(f))
      }
    val inputs: Vector[(String, Path, String)] =
      listCases(frameDir).map(id => (s"frame/$id", frameDir, id)) ++
      listCases(expandDir).filter(id => !Files.exists(expandDir.resolve(s"$id-error.txt")))
        .map(id => (s"expand/$id", expandDir, id))
    var combos = 0
    var skips = 0
    for ((label, dir, id) <- inputs) {
      val opts = optionsFor(dir, id, s"http://example.org/t/$id-in.jsonld")
      if (opts.processingMode == ProcessingMode.JsonLd10) skips += 1
      else {
        val expandedIn = JsonLdApi.expand(
          JsonLdInput.Doc(JsonParser.parse(readFile(dir.resolve(s"$id-in.jsonld")))), opts, loader)
        if (hasRelIri(expandedIn)) skips += 1
        else {
          val qIn = groundQuads(ToRdf.toRdf(expandedIn.deepCopy.asArr.get, opts))
          for ((frId, frameDoc, frDefault) <- frames) {
            combos += 1
            val framed =
              try JsonLdApi.frame(JsonLdInput.Doc(expandedIn.deepCopy), frameDoc.deepCopy, opts, loader)
              catch { case e: JsonLdError =>
                fail(s"in=$label frame=$frId: framing threw ${e.render}") }
            val re =
              try JsonLdApi.expand(JsonLdInput.Doc(framed), opts, loader)
              catch { case e: JsonLdError =>
                fail(s"in=$label frame=$frId: re-expansion threw ${e.render}\nframed: ${JsonWriter.write(framed)}") }
            if (!frDefault) {
              val qOut = groundQuads(ToRdf.toRdf(re, opts))
              val invented = qOut -- qIn
              assert(invented.isEmpty,
                s"in=$label frame=$frId: framing INVENTED ground statements\n${invented.mkString("\n")}\nframed: ${JsonWriter.write(framed)}")
            }
          }
        }
      }
    }
    info(s"$combos (input, frame) combinations total+sound ($skips 1.0-mode or base-sensitive inputs skipped)")
  }

  test("every frame fixture's output is itself expandable without error") {
    // framed output embeds @context and preserve-null artifacts; a
    // compliant processor must be able to consume it
    for (id <- listCases(frameDir)
         if !Files.exists(frameDir.resolve(s"$id-error.txt"))) {
      val out = JsonParser.parse(readFile(frameDir.resolve(s"$id-out.jsonld")))
      val opts = optionsFor(frameDir, id, s"http://example.org/t/$id-in.jsonld")
      JsonLdApi.expand(JsonLdInput.Doc(out), opts, loader) // must not throw
    }
  }

  // ---- frame ----
  // frame/<id>-{in,frame,out}.jsonld : frame(in, frame) compared with json_ld_eq
  // frame/<id>-error.txt replaces -out: the rendered error string expected
  private val frameDir = root.resolve("frame")
  for (id <- listCases(frameDir)) {
    val errFile = frameDir.resolve(s"$id-error.txt")
    if (Files.exists(errFile)) {
      test(s"frame/$id (negative)") {
        val input = JsonParser.parse(readFile(frameDir.resolve(s"$id-in.jsonld")))
        val frameDoc = JsonParser.parse(readFile(frameDir.resolve(s"$id-frame.jsonld")))
        val opts = optionsFor(frameDir, id, s"http://example.org/t/$id-in.jsonld")
        val expected = readFile(errFile).trim
        val err = intercept[JsonLdError] {
          JsonLdApi.frame(JsonLdInput.Doc(input), frameDoc, opts, loader)
        }
        assert(err.code.rendered == expected, s"got: ${err.render}")
      }
    } else
    test(s"frame/$id") {
      val input = JsonParser.parse(readFile(frameDir.resolve(s"$id-in.jsonld")))
      val frameDoc = JsonParser.parse(readFile(frameDir.resolve(s"$id-frame.jsonld")))
      val opts = optionsFor(frameDir, id, s"http://example.org/t/$id-in.jsonld")
      val expected = JsonParser.parse(readFile(frameDir.resolve(s"$id-out.jsonld")))
      val actual = JsonLdApi.frame(JsonLdInput.Doc(input), frameDoc, opts, loader)
      assert(JsonEq.jsonLdEq(actual, expected, ordered = false),
        s"\nexpected: ${JsonWriter.write(expected)}\nactual:   ${JsonWriter.write(actual)}")
    }
  }

  // ---- compact ----
  // compact/<id>-{in,context,out}.jsonld : expand(in) then compact with context
  // compact/<id>-error.txt replaces -out: the rendered error string expected
  private val compactDir = root.resolve("compact")

  test("compactPreExpanded equals compact on every positive compact fixture") {
    // the pre-expanded entry point (used by the corpus-scale j09 query)
    // must never drift from the canonical compact() path
    for (id <- listCases(compactDir)
         if !Files.exists(compactDir.resolve(s"$id-error.txt"))) {
      val input = JsonParser.parse(readFile(compactDir.resolve(s"$id-in.jsonld")))
      val ctx = JsonParser.parse(readFile(compactDir.resolve(s"$id-context.jsonld")))
      val opts = optionsFor(compactDir, id, s"http://example.org/t/$id-in.jsonld")
      val viaCompact = JsonLdApi.compact(
        JsonLdInput.Doc(input.deepCopy), Some(ctx.deepCopy), opts, loader)
      val expanded = JsonLdApi.expand(JsonLdInput.Doc(input.deepCopy), opts, loader)
      val viaPre = JsonLdApi.compactPreExpanded(expanded, Some(ctx.deepCopy), opts, loader)
      assert(JsonEq.jsonLdEq(viaPre, viaCompact, ordered = false),
        s"fixture $id: compactPreExpanded diverged from compact\nvia compact: ${JsonWriter.write(viaCompact)}\nvia pre:     ${JsonWriter.write(viaPre)}")
    }
  }

  test("compact fixtures round-trip: expanding the compacted output reproduces the expanded input") {
    // compaction against a context must be information-preserving modulo
    // that context: expand(compact(expand(in), ctx)) == expand(in). The
    // -out files embed their @context, so expanding them directly replays
    // the full inverse path across every term-selection/container/scoped-
    // context shape the suite covers. Two tiers: structural json_ld_eq
    // where the representation is unique; canonical-quads equality where
    // the spec legitimately changes shape (e.g. a multi-node @graph
    // container compacts via @included — c0017 — which is the same GRAPH
    // but not the same expanded document).
    var quadTier = 0
    for (id <- listCases(compactDir)
         if !Files.exists(compactDir.resolve(s"$id-error.txt"))) {
      val opts = optionsFor(compactDir, id, s"http://example.org/t/$id-in.jsonld")
      val expandedIn = JsonLdApi.expand(
        JsonLdInput.Doc(JsonParser.parse(readFile(compactDir.resolve(s"$id-in.jsonld")))), opts, loader)
      val reExpanded =
        try JsonLdApi.expand(
          JsonLdInput.Doc(JsonParser.parse(readFile(compactDir.resolve(s"$id-out.jsonld")))), opts, loader)
        catch { case e: JsonLdError => fail(s"fixture $id: re-expanding the compacted output threw: ${e.render}") }
      if (!JsonEq.jsonLdEq(reExpanded, expandedIn, ordered = false)) {
        quadTier += 1
        val qIn = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(expandedIn, opts))
        val qOut = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(reExpanded, opts))
        assert(qIn == qOut,
          s"fixture $id: compacted output diverges from the input even as RDF\nquads(in):\n$qIn\nquads(out):\n$qOut")
      }
    }
    info(s"$quadTier fixture(s) round-trip at the canonical-quads tier (shape-changing but graph-preserving)")
  }

  test("cross-product sweep: compacting any fixture input under any fixture context preserves the graph") {
    // fuzz-grade invariant: compaction is a re-REPRESENTATION — for ANY
    // context, expand(compact(expand(in), ctx)) must describe the same RDF
    // graph. Pairs every positive compact input with every fixture context
    // (~4.5k combinations), comparing canonical quads.
    val ids = listCases(compactDir).filter(id => !Files.exists(compactDir.resolve(s"$id-error.txt")))
    var combos = 0
    for (inId <- ids) {
      val opts = optionsFor(compactDir, inId, s"http://example.org/t/$inId-in.jsonld")
      val expandedIn = JsonLdApi.expand(
        JsonLdInput.Doc(JsonParser.parse(readFile(compactDir.resolve(s"$inId-in.jsonld")))), opts, loader)
      // toRdf CONSUMES its input (see ToRdf.toRdf) — quad it from a copy
      val qIn = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(expandedIn.deepCopy.asArr.get, opts))
      for (ctxId <- ids) {
        combos += 1
        val ctx = JsonParser.parse(readFile(compactDir.resolve(s"$ctxId-context.jsonld")))
        val compacted =
          try JsonLdApi.compactPreExpanded(expandedIn.deepCopy.asArr.get, Some(ctx), opts, loader)
          catch { case e: JsonLdError =>
            fail(s"in=$inId ctx=$ctxId: compaction threw ${e.render}") }
        val re =
          try JsonLdApi.expand(JsonLdInput.Doc(compacted), opts, loader)
          catch { case e: JsonLdError =>
            fail(s"in=$inId ctx=$ctxId: re-expansion threw ${e.render}\ncompacted: ${JsonWriter.write(compacted)}") }
        val qRe = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(re, opts)) // re not reused
        assert(qRe == qIn,
          s"in=$inId ctx=$ctxId: graph changed through compaction\ncompacted: ${JsonWriter.write(compacted)}\nquads(in):\n$qIn\nquads(re):\n$qRe")
        // leg 2: compactArrays=false exercises the always-array emit paths
        // (and the kept @graph wrapper) — the graph must still be untouched
        val optsNA = opts.copy(compactArrays = false)
        val compactedNA =
          try JsonLdApi.compactPreExpanded(expandedIn.deepCopy.asArr.get, Some(ctx.deepCopy), optsNA, loader)
          catch { case e: JsonLdError =>
            fail(s"in=$inId ctx=$ctxId compactArrays=false: compaction threw ${e.render}") }
        val reNA =
          try JsonLdApi.expand(JsonLdInput.Doc(compactedNA), optsNA, loader)
          catch { case e: JsonLdError =>
            fail(s"in=$inId ctx=$ctxId compactArrays=false: re-expansion threw ${e.render}\ncompacted: ${JsonWriter.write(compactedNA)}") }
        val qNA = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(reNA, optsNA))
        assert(qNA == qIn,
          s"in=$inId ctx=$ctxId compactArrays=false: graph changed through compaction\ncompacted: ${JsonWriter.write(compactedNA)}\nquads(in):\n$qIn\nquads(re):\n$qNA")
        // leg 3: `ordered` fixes map-entry PROCESSING order only — it must
        // never change the compacted RESULT (mirror of the ordered-expansion
        // sweep; any divergence is insertion-order-dependent semantics)
        val compactedOrd =
          try JsonLdApi.compactPreExpanded(expandedIn.deepCopy.asArr.get, Some(ctx.deepCopy),
            opts.copy(ordered = true), loader)
          catch { case e: JsonLdError =>
            fail(s"in=$inId ctx=$ctxId ordered=true: compaction threw ${e.render}") }
        assert(JsonEq.jsonLdEq(compactedOrd, compacted, ordered = false),
          s"in=$inId ctx=$ctxId: ordered compaction changed the RESULT, not just its order\nordered:   ${JsonWriter.write(compactedOrd)}\nunordered: ${JsonWriter.write(compacted)}")
      }
    }
    info(s"$combos (input, context) combinations graph-preserving")
  }

  test("cross-product sweep 2: every positive EXPAND input stays graph-preserving under every compact context") {
    // the same invariant over a much wilder input space: the expand suite's
    // 160+ inputs (nests, reverses, graph containers, JSON literals,
    // protected terms, language/index maps ...) × every compact-suite
    // context (~10k combinations).
    val ctxIds = listCases(compactDir).filter(id => !Files.exists(compactDir.resolve(s"$id-error.txt")))
    val contexts = ctxIds.map(id => id -> JsonParser.parse(readFile(compactDir.resolve(s"$id-context.jsonld"))))
    var combos = 0
    var prefixConfusions = 0
    var relativeSkips = 0
    // inputs whose EXPANDED form carries relative IRIs (possible via
    // "@base": null) are inherently base-sensitive: compacting against a
    // context without that @base configuration legitimately changes how the
    // relative reference resolves on re-expansion — skip them, counted
    def hasRelativeIri(v: JsonValue): Boolean = v match {
      case a: JArr => a.iterator.exists(hasRelativeIri)
      case o: JObj => o.iterator.exists { case (k, vv) =>
        (k == "@id" && vv.asString.exists(id => !id.contains(':'))) || hasRelativeIri(vv)
      }
      case _ => false
    }
    for (inId <- listCases(expandDir)
         if !Files.exists(expandDir.resolve(s"$inId-error.txt"))) {
      val opts = optionsFor(expandDir, inId, s"http://example.org/t/$inId-in.jsonld")
      // 1.0-mode inputs legitimately REJECT the 1.1 contexts this sweep
      // pairs them with (e.g. @type containers -> invalid container
      // mapping) - not a data-preservation question
      if (opts.processingMode == ProcessingMode.JsonLd10) { relativeSkips += 1 }
      else {
      val expandedIn = JsonLdApi.expand(
        JsonLdInput.Doc(JsonParser.parse(readFile(expandDir.resolve(s"$inId-in.jsonld")))), opts, loader)
      if (hasRelativeIri(expandedIn)) { relativeSkips += 1 }
      else {
      val qIn = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(expandedIn.deepCopy.asArr.get, opts))
      for ((ctxId, ctx) <- contexts) {
        combos += 1
        val compactedOpt =
          try Some(JsonLdApi.compactPreExpanded(expandedIn.deepCopy.asArr.get, Some(ctx.deepCopy), opts, loader))
          catch {
            // the ONE loud, spec-designed compaction failure: an absolute
            // IRI in the data that would read as a compact IRI under this
            // context (e.g. scheme "pre" colliding with prefix "pre") must
            // throw rather than emit an ambiguous document — a legitimate
            // outcome for the invariant ("graph preserved OR loud error,
            // never silent corruption")
            case e: JsonLdError if e.code == ErrorCode.IRIConfusedWithPrefix => None
            case e: JsonLdError =>
              fail(s"in=expand/$inId ctx=$ctxId: compaction threw ${e.render}")
          }
        val compacted = compactedOpt.getOrElse { prefixConfusions += 1; null }
        if (compacted != null) {
        val re =
          try JsonLdApi.expand(JsonLdInput.Doc(compacted), opts, loader)
          catch { case e: JsonLdError =>
            fail(s"in=expand/$inId ctx=$ctxId: re-expansion threw ${e.render}\ncompacted: ${JsonWriter.write(compacted)}") }
        val qRe = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(re, opts))
        assert(qRe == qIn,
          s"in=expand/$inId ctx=$ctxId: graph changed through compaction\ncompacted: ${JsonWriter.write(compacted)}\nquads(in):\n$qIn\nquads(re):\n$qRe")
        }
      }
      }
      }
    }
    info(s"$combos (expand input, context) combinations graph-preserving ($prefixConfusions loud prefix-confusion rejections; $relativeSkips base-sensitive or 1.0-mode inputs skipped)")
  }

  test("sweep 6: flattened documents stay graph-preserving under every compact context") {
    // flatten emits a shape no raw fixture has — a top-level node ARRAY
    // with issuer-relabeled bnodes and named-graph nodes carrying @graph —
    // and the flatten(input, ctx) API compacts exactly that shape. For any
    // context the result must still describe the input's RDF graph:
    //   quads(expand(compact(flatten(expand(in)), ctx))) == quads(expand(in))
    val ctxIds = listCases(compactDir).filter(id => !Files.exists(compactDir.resolve(s"$id-error.txt")))
    val contexts = ctxIds.map(id => id -> JsonParser.parse(readFile(compactDir.resolve(s"$id-context.jsonld"))))
    def hasRelIri2(v: JsonValue): Boolean = v match {
      case a: JArr => a.iterator.exists(hasRelIri2)
      case o: JObj => o.iterator.exists { case (k, vv) =>
        (k == "@id" && vv.asString.exists(id => !id.contains(':'))) || hasRelIri2(vv)
      }
      case _ => false
    }
    var combos = 0
    var prefixConfusions = 0
    var skips = 0
    for (inId <- listCases(expandDir)
         if !Files.exists(expandDir.resolve(s"$inId-error.txt"))) {
      val opts = optionsFor(expandDir, inId, s"http://example.org/t/$inId-in.jsonld")
      if (opts.processingMode == ProcessingMode.JsonLd10) skips += 1
      else {
        val expandedIn = JsonLdApi.expand(
          JsonLdInput.Doc(JsonParser.parse(readFile(expandDir.resolve(s"$inId-in.jsonld")))), opts, loader)
        if (hasRelIri2(expandedIn)) skips += 1
        else {
          val qIn = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(expandedIn.deepCopy.asArr.get, opts))
          val flattened = Flatten.flattenExpanded(expandedIn)
          for ((ctxId, ctx) <- contexts) {
            combos += 1
            val compactedOpt =
              try Some(JsonLdApi.compactPreExpanded(flattened.deepCopy.asArr.get, Some(ctx.deepCopy), opts, loader))
              catch {
                case e: JsonLdError if e.code == ErrorCode.IRIConfusedWithPrefix =>
                  prefixConfusions += 1; None
                case e: JsonLdError =>
                  fail(s"in=expand/$inId ctx=$ctxId: flattened compaction threw ${e.render}")
              }
            compactedOpt.foreach { compacted =>
              val re =
                try JsonLdApi.expand(JsonLdInput.Doc(compacted), opts, loader)
                catch { case e: JsonLdError =>
                  fail(s"in=expand/$inId ctx=$ctxId: re-expansion threw ${e.render}\ncompacted: ${JsonWriter.write(compacted)}") }
              val qRe = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(re, opts))
              assert(qRe == qIn,
                s"in=expand/$inId ctx=$ctxId: graph changed through flatten+compaction\ncompacted: ${JsonWriter.write(compacted)}\nquads(in):\n$qIn\nquads(re):\n$qRe")
            }
          }
        }
      }
    }
    info(s"$combos (flattened input, context) combinations graph-preserving ($prefixConfusions loud prefix-confusion rejections; $skips 1.0-mode or base-sensitive inputs skipped)")
  }

  test("sweep 8: frameExpansion mode never changes the GRAPH of an ordinary (non-frame) document") {
    // frameExpansion relaxes validation for FRAMES (keyword value patterns,
    // empty maps, @default) and legitimately changes the expanded TREE of
    // ordinary documents in quad-invisible ways (the spec keeps @id-only
    // nodes that normal mode nulls out — t0021). The invariant that must
    // hold is graph-level: the quads may not differ, or frame-pattern
    // semantics leaked into normal value handling.
    for (id <- listCases(expandDir)
         if !Files.exists(expandDir.resolve(s"$id-error.txt"))) {
      val opts = optionsFor(expandDir, id, s"http://example.org/t/$id-in.jsonld")
      val plain = JsonLdApi.expand(
        JsonLdInput.Doc(JsonParser.parse(readFile(expandDir.resolve(s"$id-in.jsonld")))), opts, loader)
      val framed = JsonLdApi.expand(
        JsonLdInput.Doc(JsonParser.parse(readFile(expandDir.resolve(s"$id-in.jsonld")))),
        opts.copy(frameExpansion = true), loader)
      val qPlain = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(plain, opts))
      val qFramed = BnodeCanon.toCanonicalNQuads(ToRdf.toRdf(framed, opts))
      assert(qFramed == qPlain,
        s"fixture $id: frameExpansion changed the graph of an ordinary document\nplain:\n$qPlain\nframed:\n$qFramed")
    }
  }

  test("sweep 7: an empty expandContext is a no-op on every positive expand fixture") {
    // expandContext merges an external context into the INITIAL active
    // context; the empty context must leave every result untouched (any
    // divergence means initialization state leaks into expansion)
    for (id <- listCases(expandDir)
         if !Files.exists(expandDir.resolve(s"$id-error.txt"))) {
      val opts = optionsFor(expandDir, id, s"http://example.org/t/$id-in.jsonld")
      if (opts.expandContext.isEmpty) {
        val plain = JsonLdApi.expand(
          JsonLdInput.Doc(JsonParser.parse(readFile(expandDir.resolve(s"$id-in.jsonld")))), opts, loader)
        val withEmpty = JsonLdApi.expand(
          JsonLdInput.Doc(JsonParser.parse(readFile(expandDir.resolve(s"$id-in.jsonld")))),
          opts.copy(expandContext = Some(JsonOrRef.Obj(new JObj()))), loader)
        assert(JsonEq.jsonLdEq(withEmpty, plain, ordered = false),
          s"fixture $id: empty expandContext changed the result\nplain:     ${JsonWriter.write(plain)}\nwithEmpty: ${JsonWriter.write(withEmpty)}")
      }
    }
  }

  for (id <- listCases(compactDir)) {
    val errFile = compactDir.resolve(s"$id-error.txt")
    if (Files.exists(errFile)) {
      test(s"compact/$id (negative)") {
        val input = JsonParser.parse(readFile(compactDir.resolve(s"$id-in.jsonld")))
        val ctx = JsonParser.parse(readFile(compactDir.resolve(s"$id-context.jsonld")))
        val opts = optionsFor(compactDir, id, s"http://example.org/t/$id-in.jsonld")
        val expected = readFile(errFile).trim
        val err = intercept[JsonLdError] {
          JsonLdApi.compact(JsonLdInput.Doc(input), Some(ctx), opts, loader)
        }
        assert(err.code.rendered == expected, s"got: ${err.render}")
      }
    } else {
      test(s"compact/$id") {
        val input = JsonParser.parse(readFile(compactDir.resolve(s"$id-in.jsonld")))
        val ctx = JsonParser.parse(readFile(compactDir.resolve(s"$id-context.jsonld")))
        val opts = optionsFor(compactDir, id, s"http://example.org/t/$id-in.jsonld")
        val expected = JsonParser.parse(readFile(compactDir.resolve(s"$id-out.jsonld")))
        val actual = JsonLdApi.compact(
          JsonLdInput.Doc(input), Some(ctx), opts, loader)
        assert(JsonEq.jsonLdEq(actual, expected, ordered = false),
          s"\nexpected: ${JsonWriter.write(expected)}\nactual:   ${JsonWriter.write(actual)}")
      }
    }
  }
}
