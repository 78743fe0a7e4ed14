package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.json._

/** Property-based invariants (SURVEY.md §5 test strategy). Uses raw
  * ScalaCheck generators with fixed seeds (scalatestplus bridge is not in
  * the offline cache).
  */
class PropertySpec extends AnyFunSuite {
  private def forAll[T](gen: Gen[T], n: Int = 60)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  // --- generators ---
  private val genScalar: Gen[JsonValue] = Gen.oneOf(
    Gen.const(JNull),
    Gen.oneOf(true, false).map(JBool(_)),
    Gen.chooseNum(-1e6, 1e6).map(d => JNum(math.round(d * 100) / 100.0)),
    Gen.alphaNumStr.map(JStr.apply))

  private def genJson(depth: Int): Gen[JsonValue] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      4 -> genScalar,
      2 -> Gen.listOfN(3, genJson(depth - 1)).map(xs => JArr.from(xs)),
      2 -> Gen.listOfN(3, Gen.zip(Gen.identifier, genJson(depth - 1))).map { kvs =>
        val o = new JObj(); kvs.foreach { case (k, v) => o.put(k, v) }; o
      })

  private val genDoc: Gen[JObj] = Gen.listOfN(4, Gen.zip(Gen.identifier, genJson(2))).map { kvs =>
    val o = new JObj()
    o.put("@context", JObj("@vocab" -> JStr("http://v/")))
    o.put("@id", JStr("http://subject/"))
    kvs.foreach { case (k, v) => o.put(k, v) }
    o
  }

  test("canonical labels are multiset-insensitive: duplicate triples hash like their deduplicated set") {
    // a repeated identical value in a document emits the same triple twice
    // out of toRdf, while a fromRdf round trip dedups it — both
    // representations of the SAME graph must canonicalize identically
    // (bug #16, generative sweep)
    val t1 = Triple("_:a", "http://p/", "literal", "x", "", "", "")
    val t2 = Triple("_:a", "http://p/", "bnode", "_:b", "", "", "")
    val t3 = Triple("_:b", "http://q/", "literal", "y", "", "", "")
    val once = BnodeCanon.toCanonicalNQuads(Vector(t1, t2, t3))
    val dup = BnodeCanon.toCanonicalNQuads(Vector(t1, t1, t2, t3, t3))
    assert(once == dup)
  }

  // --- generative semantic sweep: random VALID expanded-form documents ---
  // The fixture-corpus sweeps in W3CSuiteSpec replay curated inputs; this
  // generates fresh expanded-form documents (nodes, typed/lang/direction/
  // JSON-ish values, node refs, nested nodes, lists incl. nested/empty,
  // named graphs, shared bnode labels, @index) and asserts the SEMANTIC
  // invariants, not just no-crash:
  //   1. flatten preserves canonical quads
  //   2. compaction under each probe context preserves canonical quads
  //      (or rejects loudly with IRI-confused-with-prefix)
  //   3. toRdf∘fromRdf is the identity on the document's quads
  //   4. wildcard framing preserves the merged graph
  private val genIriG: Gen[String] = Gen.oneOf("http://a/", "http://b/x", "http://c/y#f", "http://d/p")
  private val genPropG: Gen[String] = Gen.frequency(
    // wave I: a blank-node PREDICATE rides every invariant leg — generalized
    // RDF is the engine default (reference lib.rs:234), so bnode-predicate
    // quads must survive flatten/compaction/fromRdf/framing round trips,
    // and produceGeneralizedRdf=false must drop exactly them (leg 3d)
    8 -> Gen.oneOf("http://p/1", "http://p/2", "http://p/3", "http://v/data"),
    1 -> Gen.const("_:pb"))
  private val genValueG: Gen[JObj] = Gen.frequency(
    3 -> Gen.zip(Gen.oneOf("s1", "s2", ""), Gen.option(Gen.oneOf("en", "ar", "de-de")))
      .map { case (s, lang) =>
        val o = JObj("@value" -> JStr(s)); lang.foreach(l => o.put("@language", JStr(l))); o
      },
    2 -> Gen.chooseNum(-3, 3).map(n => JObj("@value" -> JNum(n.toDouble))),
    1 -> Gen.oneOf(true, false).map(b => JObj("@value" -> JBool(b))),
    1 -> Gen.zip(Gen.oneOf("s", "t"), genIriG).map { case (s, dt) =>
      JObj("@value" -> JStr(s), "@type" -> JStr(dt)) },
    1 -> Gen.const(JObj("@value" -> JStr("x"), "@direction" -> JStr("rtl"))),
    1 -> Gen.const(JObj("@value" -> JStr("xd"), "@language" -> JStr("en"),
      "@direction" -> JStr("ltr"))),
    1 -> Gen.const(JObj("@value" -> JStr("ix"), "@index" -> JStr("vi"))),
    // JSON literals: raw object / array / empty-array / scalar values —
    // the whole-raw-value-literalization corner (bug #12 family)
    1 -> Gen.oneOf[JsonValue](
      JObj("a" -> JNum(1.0), "b" -> JArr(JBool(true), JNull)),
      JArr(JNum(2.0)), new JArr(), JStr("jstr"), JNum(0.0))
      .map(j => JObj("@value" -> j, "@type" -> JStr("@json"))))
  private def genItemG(depth: Int): Gen[JObj] = {
    val base = Seq(
      4 -> genValueG,
      2 -> Gen.oneOf(genIriG, Gen.oneOf("_:n1", "_:n2", "_:n3")).map(id => JObj("@id" -> JStr(id))))
    val deep =
      if (depth <= 0) Nil
      else Seq(
        2 -> genNodeG(depth - 1, allowGraph = false),
        1 -> Gen.chooseNum(0, 2).flatMap(n => Gen.listOfN(n, genItemG(depth - 1)))
          .map(items => JObj("@list" -> JArr.from(items))))
    Gen.frequency(base ++ deep: _*)
  }
  private def genNodeG(depth: Int, allowGraph: Boolean): Gen[JObj] = for {
    id <- Gen.option(Gen.oneOf(genIriG, Gen.oneOf("_:n1", "_:n2", "_:n3")))
    types <- Gen.option(Gen.listOfN(1, genIriG))
    idx <- Gen.option(Gen.const("k1"))
    nProps <- Gen.chooseNum(0, 3)
    props <- Gen.listOfN(nProps, Gen.zip(genPropG,
      Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, genItemG(depth)))))
    // @reverse: arrays of NODE objects only (value objects are invalid
    // there) — full nested nodes, so @json literals, lists, and @index can
    // ride adjacent to the reverse edge (the @json/@reverse-adjacency
    // candidate from the round-5 sweep notes)
    reverse <- if (depth > 0) Gen.option(Gen.zip(genPropG,
      Gen.chooseNum(1, 2).flatMap(n =>
        Gen.listOfN(n, genNodeG(depth - 1, allowGraph = false)))))
    else Gen.const(None)
    included <- if (depth > 0) Gen.option(Gen.listOfN(1, genNodeG(0, allowGraph = false)))
    else Gen.const(None)
    graph <- if (allowGraph && id.isDefined)
      Gen.option(Gen.listOfN(2, genNodeG(0, allowGraph = false)))
    else Gen.const(None)
  } yield {
    val o = new JObj()
    id.foreach(i => o.put("@id", JStr(i)))
    types.foreach(ts => o.put("@type", JArr.from(ts.map(JStr.apply))))
    idx.foreach(i => o.put("@index", JStr(i)))
    props.foreach { case (p, items) =>
      if (!o.contains(p)) o.put(p, JArr.from(items))
    }
    reverse.foreach { case (p, refs) => o.put("@reverse", JObj(p -> JArr.from(refs))) }
    included.foreach(ns => o.put("@included", JArr.from(ns)))
    graph.foreach(g => o.put("@graph", JArr.from(g)))
    o
  }
  private val genExpandedDocG: Gen[JArr] =
    Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, genNodeG(2, allowGraph = true))).map(JArr.from(_))

  // --- generated probe CONTEXTS: random VALID term definitions ---
  // The hand-written probe contexts above each pin one feature; this
  // generator composes them (containers incl. @graph combos, @id/@vocab/
  // @json/@none coercions, language+direction defaults, reverse terms,
  // prefix terms, term-selection collisions when several terms map to the
  // same IRI) so compaction's term-selection machinery is exercised on
  // combinations no fixture spells out. Only VALID shapes are generated:
  // @container @type limits coercion to @id/@vocab, language/direction
  // never combine with a type coercion, @prefix rides a /-terminated IRI.
  private val genTermNameG: Gen[String] = Gen.oneOf("t1", "t2", "u", "ex", "K")
  private val genCtxTermG: Gen[JsonValue] = for {
    iri <- Gen.oneOf("http://p/1", "http://p/2", "http://p/3", "http://v/data", "http://b/x", "http://p/")
    kind <- Gen.chooseNum(0, 13)
    defn <- kind match {
      case 0 | 1 => Gen.const(JStr(iri): JsonValue)
      case 2 => Gen.const(JObj("@reverse" -> JStr(iri)): JsonValue)
      case 3 => Gen.oneOf("@set", "@index").map(c =>
        JObj("@reverse" -> JStr(iri), "@container" -> JStr(c)): JsonValue)
      case 4 => Gen.const(JObj("@id" -> JStr("http://p/"), "@prefix" -> JBool(true)): JsonValue)
      // property-scoped context inside a generated term (wave G); wave H
      // lets the scoped name COLLIDE with an outer term name (t1/u) so a
      // protected outer term is sometimes redefined — identical redefs must
      // pass, differing ones must reject loudly (never corrupt)
      case 5 => for {
        iri2 <- Gen.oneOf("http://p/2", "http://p/3", "http://v/data")
        subName <- Gen.oneOf("s1", "s2", "inner", "t1", "u")
        subDef <- Gen.frequency[JsonValue](
          2 -> Gen.const(JStr(iri2)),
          1 -> Gen.const(JObj("@id" -> JStr(iri2), "@container" -> JStr("@list"))),
          1 -> Gen.const(JObj("@id" -> JStr(iri2), "@type" -> JStr("@json"))))
      } yield JObj("@id" -> JStr(iri), "@context" -> JObj(subName -> subDef)): JsonValue
      // @nest routing: compacted term rides under the "@nest" bucket
      case 6 => Gen.const(JObj("@id" -> JStr(iri), "@nest" -> JStr("@nest")): JsonValue)
      // type-scoped context: term maps to a TYPE IRI the doc generator
      // emits, its scoped ctx re-terms properties of matching nodes
      case 7 => Gen.oneOf("http://p/1", "http://p/2").map(i2 =>
        JObj("@id" -> JStr("http://b/x"), "@context" -> JObj("tsub" -> JStr(i2))): JsonValue)
      // wave I: property-based index container (@index TERM KEY) — node
      // values route into a map keyed by the compacted value of the index
      // PROPERTY (the c0053-c0055 data-loss family, on generated docs;
      // value objects must stay OUT of the map or re-expansion's
      // 13.8.3.7.2 invalid-value-object check fires)
      case 8 => Gen.oneOf("http://p/2", "http://p/3").map(ip =>
        JObj("@id" -> JStr(iri), "@container" -> JStr("@index"),
          "@index" -> JStr(ip)): JsonValue)
      case _ =>
        for {
          container <- Gen.option(Gen.oneOf[JsonValue](
            JStr("@list"), JStr("@set"), JStr("@index"), JStr("@id"), JStr("@type"),
            JStr("@language"), JStr("@graph"),
            JArr(JStr("@graph"), JStr("@id")), JArr(JStr("@graph"), JStr("@index")),
            JArr(JStr("@id"), JStr("@set")), JArr(JStr("@graph"), JStr("@id"), JStr("@set"))))
          cKey = container.map(JsonWriter.write).getOrElse("")
          coercion <-
            if (cKey.contains("@type"))
              Gen.oneOf[Option[JsonValue]](Some(JStr("@id")), Some(JStr("@vocab")), None)
            else if (cKey.contains("@language")) Gen.const(None: Option[JsonValue])
            else Gen.option(Gen.oneOf[JsonValue](
              JStr("@id"), JStr("@vocab"), JStr("@json"), JStr("@none"), JStr("http://a/")))
          lang <- if (coercion.isEmpty && !cKey.contains("@type") && !cKey.contains("@language"))
              Gen.option(Gen.oneOf[JsonValue](JStr("en"), JStr("de-DE"), JNull))
            else Gen.const(None: Option[JsonValue])
          dir <- if (coercion.isEmpty && !cKey.contains("@type") && !cKey.contains("@language"))
              Gen.option(Gen.oneOf[JsonValue](JStr("rtl"), JNull))
            else Gen.const(None: Option[JsonValue])
        } yield {
          val o = JObj("@id" -> JStr(iri))
          container.foreach(c => o.put("@container", c.deepCopy))
          coercion.foreach(t => o.put("@type", t))
          lang.foreach(l => o.put("@language", l))
          dir.foreach(d => o.put("@direction", d))
          o: JsonValue
        }
    }
  } yield defn
  private val genCtxG: Gen[JObj] = for {
    n <- Gen.chooseNum(1, 3)
    terms <- Gen.listOfN(n, Gen.zip(genTermNameG, genCtxTermG))
    vocab <- Gen.option(Gen.oneOf[JsonValue](JStr("http://p/"), JStr("http://qv/")))
    lang <- Gen.option(Gen.const(JStr("de")))
    dir <- Gen.option(Gen.const(JStr("ltr")))
    base <- Gen.option(Gen.const(JStr("http://b/")))
    // keyword aliases (wave G): compaction must emit through the alias and
    // re-expansion must honor it — @none aliases rewrite index-map keys
    alias <- Gen.option(Gen.oneOf[(String, String)](
      "idA" -> "@id", "typA" -> "@type", "revA" -> "@reverse",
      "grA" -> "@graph", "nstA" -> "@nest", "noneA" -> "@none",
      // wave I: the value-/container-keyword aliases — compaction must EMIT
      // through them (list/set/value objects, index keys, lang/dir members)
      // and re-expansion must read them back
      "lstA" -> "@list", "setA" -> "@set", "valA" -> "@value",
      "idxA" -> "@index", "lngA" -> "@language", "dirA" -> "@direction"))
    // wave H: protect every term in the context — compaction itself never
    // checks protection, but scoped contexts inside generated terms (case 5
    // collisions) now hit the redefinition check on both the compaction and
    // the re-expansion side, which must agree
    prot <- Gen.option(Gen.const(JBool(true)))
  } yield {
    val o = new JObj()
    vocab.foreach(v => o.put("@vocab", v))
    lang.foreach(l => o.put("@language", l))
    dir.foreach(d => o.put("@direction", d))
    base.foreach(b => o.put("@base", b))
    prot.foreach(p => o.put("@protected", p))
    alias.foreach { case (k, kw) => o.put(k, JStr(kw)) }
    terms.foreach { case (k, v) => o.put(k, v) }
    o
  }

  test("generative sweep: random valid expanded documents hold the flatten/compact/fromRdf/frame invariants") {
    val opts = JsonLdOptions(base = Some("http://base/doc"))
    val probeContexts: Vector[(String, JObj)] = Vector(
      "empty" -> new JObj(),
      "vocab" -> JObj("@vocab" -> JStr("http://p/")),
      "json-typed" -> JObj(
        "ex" -> JStr("http://p/"),
        "data" -> JObj("@id" -> JStr("http://v/data"), "@type" -> JStr("@json"))),
      "set+lang" -> JObj(
        "p1" -> JObj("@id" -> JStr("http://p/1"), "@container" -> JStr("@set")),
        "@language" -> JStr("en")),
      "list" -> JObj("lst" -> JObj("@id" -> JStr("http://p/2"), "@container" -> JStr("@list"))),
      "index-map" -> JObj("ix" -> JObj("@id" -> JStr("http://p/1"), "@container" -> JStr("@index"))),
      "id-map" -> JObj("idm" -> JObj("@id" -> JStr("http://p/2"), "@container" -> JStr("@id"))),
      "type-map" -> JObj("tm" -> JObj("@id" -> JStr("http://p/3"), "@container" -> JStr("@type"))),
      "lang-map" -> JObj("lm" -> JObj("@id" -> JStr("http://p/3"), "@container" -> JStr("@language"))),
      "graph-ctr" -> JObj("g" -> JObj("@id" -> JStr("http://p/1"), "@container" -> JStr("@graph"))),
      "reverse-term" -> JObj("rt" -> JObj("@reverse" -> JStr("http://p/2"))),
      // scoped contexts: the bug-#10/#17 interaction surface
      "prop-scoped" -> JObj("ps" -> JObj("@id" -> JStr("http://p/1"),
        "@context" -> JObj("inner" -> JStr("http://p/2"), "@vocab" -> JStr("http://qv/")))),
      "scoped-null" -> JObj("sn" -> JObj("@id" -> JStr("http://p/2"), "@context" -> JNull)),
      "type-scoped" -> JObj("TT" -> JObj("@id" -> JStr("http://b/x"),
        "@context" -> JObj("p1" -> JStr("http://p/1")))),
      "prefix" -> JObj("pfx" -> JObj("@id" -> JStr("http://p/"), "@prefix" -> JBool(true))),
      // @base relativization: compaction emits RELATIVE @id values against
      // the context @base (compactToRelative default), re-expansion must
      // resolve them back — exercises makeRelative∘resolve through the full
      // compaction path ("relative-IRI docs with matched bases")
      "base-rel" -> JObj("@base" -> JStr("http://b/"), "@vocab" -> JStr("http://p/")),
      // base equal to a generated IRI: makeRelative(self) = "" (the
      // empty-reference corner) and "http://c/y#f" relativizes to "#f"
      "base-self" -> JObj("@base" -> JStr("http://d/p")),
      "base-frag" -> JObj("@base" -> JStr("http://c/y")),
      // scoped-context probe widening (round-5 sweep notes): property-scoped
      // contexts that introduce CONTAINERS, reverse terms, @json coercion,
      // and nested scopes; a type-scoped context that opts INTO propagation
      "ps-list" -> JObj("pl" -> JObj("@id" -> JStr("http://p/1"),
        "@context" -> JObj("inner2" -> JObj("@id" -> JStr("http://p/2"),
          "@container" -> JStr("@list"))))),
      "ps-reverse" -> JObj("pr" -> JObj("@id" -> JStr("http://p/1"),
        "@context" -> JObj("rin" -> JObj("@reverse" -> JStr("http://p/3"))))),
      "ps-json" -> JObj("pj" -> JObj("@id" -> JStr("http://p/2"),
        "@context" -> JObj("jd" -> JObj("@id" -> JStr("http://v/data"),
          "@type" -> JStr("@json"))))),
      "ps-nested" -> JObj("pn" -> JObj("@id" -> JStr("http://p/1"),
        "@context" -> JObj("mid" -> JObj("@id" -> JStr("http://p/2"),
          "@context" -> JObj("leaf" -> JStr("http://p/3")))))),
      "ts-propagate" -> JObj("TT2" -> JObj("@id" -> JStr("http://b/x"),
        "@context" -> JObj("@propagate" -> JBool(true),
          "p2c" -> JStr("http://p/2")))),
      "ps-idmap" -> JObj("pm" -> JObj("@id" -> JStr("http://p/3"),
        "@context" -> JObj("im" -> JObj("@id" -> JStr("http://p/1"),
          "@container" -> JStr("@id"))))))
    def canon(ts: Vector[Triple]): String = BnodeCanon.toCanonicalNQuads(ts)
    def mergedCanon(ts: Vector[Triple]): String =
      BnodeCanon.toCanonicalNQuads(ts.map(_.copy(graph = "")).distinct)
    forAll(Gen.zip(genExpandedDocG, Gen.listOfN(2, genCtxG)), n = 250) { case (doc, genCtxs) =>
      // per-doc probe set: the fixed feature probes + two GENERATED contexts
      // (term-selection/coercion/container combinations — wave F), + wave I:
      // the two generated contexts composed as a context ARRAY (sequential
      // merge — later term defs override, aliases/defaults accumulate) and a
      // null-reset array (the leading null must leave a clean slate)
      val probeContextsAll: Vector[(String, JsonValue)] =
        probeContexts ++ genCtxs.zipWithIndex.map { case (c, i) =>
          s"gen-$i ${JsonWriter.write(c)}" -> (c: JsonValue)
        } ++ Vector[(String, JsonValue)](
          s"gen-arr ${JsonWriter.write(genCtxs(0))} ++ ${JsonWriter.write(genCtxs(1))}" ->
            JArr(genCtxs(0).deepCopy, genCtxs(1).deepCopy),
          s"gen-null-reset ${JsonWriter.write(genCtxs(1))}" ->
            JArr(JNull, genCtxs(1).deepCopy))
      val expanded = JsonLdApi.expand(JsonLdInput.Doc(doc.deepCopy), opts)
      val triples = ToRdf.toRdf(expanded.deepCopy.asArr.get, opts)
      val qIn = canon(triples)
      // 1. flatten
      val qFlat = canon(ToRdf.toRdf(Flatten.flattenExpanded(expanded.deepCopy.asArr.get), opts))
      assert(qFlat == qIn, s"flatten changed the graph\ndoc: ${JsonWriter.write(doc)}\nin:\n$qIn\nflat:\n$qFlat")
      // 1b. ordered expansion must produce the same RESULT (set-equal) on
      //     generated docs — any divergence is insertion-order-dependent
      //     semantics (mirrors the fixture ordered-equivalence sweep)
      val expandedOrd = JsonLdApi.expand(JsonLdInput.Doc(doc.deepCopy), opts.copy(ordered = true))
      assert(JsonEq.jsonLdEq(expandedOrd, expanded, ordered = false),
        s"ordered expansion changed the RESULT\ndoc: ${JsonWriter.write(doc)}\nordered:   ${JsonWriter.write(expandedOrd)}\nunordered: ${JsonWriter.write(expanded)}")
      // 1c. frameExpansion on an ordinary document may keep extra tree
      //     shape but must never change the GRAPH (sweep-8 analog)
      val expandedFr = JsonLdApi.expand(JsonLdInput.Doc(doc.deepCopy), opts.copy(frameExpansion = true))
      val qFr = canon(ToRdf.toRdf(expandedFr, opts))
      assert(qFr == qIn,
        s"frameExpansion changed the graph of an ordinary generated doc\ndoc: ${JsonWriter.write(doc)}\nin:\n$qIn\nframeExp:\n$qFr")
      // 1e. wave J: expandContext is a NO-OP on expanded-form input —
      //     absolute-IRI keys, keyword keys, and value objects ignore the
      //     supplied terms, aliases, and @vocab/@language/@direction/@base
      //     defaults. (A generated scoped-term collision can reject at
      //     context processing — loud reject, skip, same tolerance as the
      //     compaction probes.)
      try {
        val expandedEC = JsonLdApi.expand(JsonLdInput.Doc(doc.deepCopy),
          opts.copy(expandContext = Some(JsonOrRef.Obj(genCtxs(0).deepCopy.asInstanceOf[JObj]))))
        assert(JsonEq.jsonLdEq(expandedEC, expanded, ordered = false),
          s"expandContext changed the expansion of an expanded-form doc\nctx: ${JsonWriter.write(genCtxs(0))}\ndoc: ${JsonWriter.write(doc)}\nwith:    ${JsonWriter.write(expandedEC)}\nwithout: ${JsonWriter.write(expanded)}")
      } catch {
        case e: JsonLdError if e.code == ErrorCode.ProtectedTermRedefinition => // loud reject
      }
      // 1d. the FLATTENED form (issuer-relabeled top-level array, named
      //     graphs as @graph nodes) must stay graph-preserving under
      //     compaction too (sweep-6 analog; bounded probe subset)
      val flattenedForCompact = Flatten.flattenExpanded(expanded.deepCopy.asArr.get)
      val flattenProbes = Set("vocab", "list", "graph-ctr", "ps-nested", "base-rel")
      for ((label, ctx) <- probeContexts if flattenProbes(label)) {
        val cOpt =
          try Some(JsonLdApi.compactPreExpanded(flattenedForCompact.deepCopy.asArr.get,
            Some(JObj("@context" -> ctx.deepCopy)), opts))
          catch {
            case e: JsonLdError if e.code == ErrorCode.IRIConfusedWithPrefix => None
            case e: JsonLdError =>
              fail(s"flatten+ctx=$label: compaction threw ${e.render}\ndoc: ${JsonWriter.write(doc)}")
          }
        cOpt.foreach { c =>
          val re =
            try JsonLdApi.expand(JsonLdInput.Doc(c), opts)
            catch { case e: JsonLdError =>
              fail(s"flatten+ctx=$label: re-expansion threw ${e.render}\ncompacted: ${JsonWriter.write(c)}") }
          val qRe = canon(ToRdf.toRdf(re, opts))
          assert(qRe == qIn,
            s"flatten+ctx=$label: graph changed\ndoc: ${JsonWriter.write(doc)}\ncompacted: ${JsonWriter.write(c)}\nin:\n$qIn\nre:\n$qRe")
        }
      }
      // 2. compaction round-trips
      for ((label, ctx) <- probeContextsAll) {
        val compactedOpt =
          try Some(JsonLdApi.compactPreExpanded(expanded.deepCopy.asArr.get,
            Some(JObj("@context" -> ctx.deepCopy)), opts))
          catch {
            case e: JsonLdError if e.code == ErrorCode.IRIConfusedWithPrefix => None
            // wave H: generated scoped contexts may redefine a protected
            // outer term — a loud reject is the spec'd outcome.
            case e: JsonLdError if e.code == ErrorCode.ProtectedTermRedefinition => None
            case e: JsonLdError =>
              fail(s"ctx=$label: compaction threw ${e.render}\ndoc: ${JsonWriter.write(doc)}")
          }
        compactedOpt.foreach { compacted =>
          // SPEC ASYMMETRY (wave-H finding, adjudicated against the
          // reference expand.rs:105 vs :152 and the spec's literal text):
          // property-scoped contexts are processed with overrideProtected on
          // the MAP path (expansion step 13ff) but NOT on the SCALAR path
          // (step 8.2) — while COMPACTION always overrides (12.x). So
          // compaction can route a scalar under a scoped-context term whose
          // scoped context redefines a protected term, and re-expansion of
          // that scalar rejects loudly. The reject is engine-correct; skip.
          val reOpt =
            try Some(JsonLdApi.expand(JsonLdInput.Doc(compacted), opts))
            catch {
              case e: JsonLdError if e.code == ErrorCode.ProtectedTermRedefinition => None
              case e: JsonLdError =>
                fail(s"ctx=$label: re-expansion threw ${e.render}\ndoc: ${JsonWriter.write(doc)}\ncompacted: ${JsonWriter.write(compacted)}")
            }
          reOpt.foreach { re =>
          val qRe = canon(ToRdf.toRdf(re, opts))
          assert(qRe == qIn,
            s"ctx=$label: graph changed through compaction\ndoc: ${JsonWriter.write(doc)}\ncompacted: ${JsonWriter.write(compacted)}\nin:\n$qIn\nre:\n$qRe")
          // compactArrays=false leg: the always-array emit paths (and kept
          // @graph wrapper) must preserve the same graph on these shapes
          val optsNA = opts.copy(compactArrays = false)
          val compactedNA =
            try JsonLdApi.compactPreExpanded(expanded.deepCopy.asArr.get,
              Some(JObj("@context" -> ctx.deepCopy)), optsNA)
            catch { case e: JsonLdError =>
              fail(s"ctx=$label compactArrays=false: compaction threw ${e.render}\ndoc: ${JsonWriter.write(doc)}") }
          val reNA =
            try JsonLdApi.expand(JsonLdInput.Doc(compactedNA), optsNA)
            catch { case e: JsonLdError =>
              fail(s"ctx=$label compactArrays=false: re-expansion threw ${e.render}\ndoc: ${JsonWriter.write(doc)}\ncompacted: ${JsonWriter.write(compactedNA)}") }
          val qNA = canon(ToRdf.toRdf(reNA, optsNA))
          assert(qNA == qIn,
            s"ctx=$label compactArrays=false: graph changed\ndoc: ${JsonWriter.write(doc)}\ncompacted: ${JsonWriter.write(compactedNA)}\nin:\n$qIn\nre:\n$qNA")
          // ordered=true must not change the compacted RESULT
          val compactedOrd =
            try JsonLdApi.compactPreExpanded(expanded.deepCopy.asArr.get,
              Some(JObj("@context" -> ctx.deepCopy)), opts.copy(ordered = true))
            catch { case e: JsonLdError =>
              fail(s"ctx=$label ordered=true: compaction threw ${e.render}\ndoc: ${JsonWriter.write(doc)}") }
          assert(JsonEq.jsonLdEq(compactedOrd, compacted, ordered = false),
            s"ctx=$label: ordered compaction changed the RESULT\ndoc: ${JsonWriter.write(doc)}\nordered:   ${JsonWriter.write(compactedOrd)}\nunordered: ${JsonWriter.write(compacted)}")
          }
        }
      }
      // 3. toRdf ∘ fromRdf identity
      val qBack = canon(ToRdf.toRdf(JsonLdApi.fromRdf(triples, opts), opts))
      assert(qBack == qIn, s"toRdf∘fromRdf not identity\ndoc: ${JsonWriter.write(doc)}\nin:\n$qIn\nback:\n$qBack")
      // 3b. useNativeTypes rewrites lexical forms, so identity becomes
      //     CONVERGENCE: a second round trip must be a fixpoint (mirrors
      //     W3CSuiteSpec sweep 3's unt=true leg on generated shapes)
      val optsN = opts.copy(useNativeTypes = true)
      val qN1 = ToRdf.toRdf(JsonLdApi.fromRdf(triples, optsN), optsN)
      val qN2 = ToRdf.toRdf(JsonLdApi.fromRdf(qN1, optsN), optsN)
      assert(canon(qN2) == canon(qN1),
        s"toRdf∘fromRdf not convergent under useNativeTypes\ndoc: ${JsonWriter.write(doc)}\ntrip1:\n${canon(qN1)}\ntrip2:\n${canon(qN2)}")
      // 3c. rdfDirection options-grid legs: direction-bearing literals are
      //     rewritten to i18n datatypes / compound-literal bnodes on the way
      //     out; fromRdf under the same mode must reconstruct them so a
      //     second toRdf reproduces the exact dataset
      for (dirMode <- Seq("i18n-datatype", "compound-literal")) {
        val optsD = opts.copy(rdfDirection = Some(dirMode))
        val tD = ToRdf.toRdf(expanded.deepCopy.asArr.get, optsD)
        val qD = canon(tD)
        val qDBack = canon(ToRdf.toRdf(JsonLdApi.fromRdf(tD, optsD), optsD))
        assert(qDBack == qD,
          s"rdfDirection=$dirMode: toRdf∘fromRdf not identity\ndoc: ${JsonWriter.write(doc)}\nin:\n$qD\nback:\n$qDBack")
      }
      // 3d. produceGeneralizedRdf=false drops EXACTLY the bnode-predicate
      //     quads (ToRdf.scala:87) — and, because the deserialization
      //     algorithm skips the whole property-values pair BEFORE list
      //     conversion, the rdf:first/rest chains of @list values under a
      //     dropped predicate vanish with it (nested node objects do NOT:
      //     they are node-map entries with their own kept quads). Derive the
      //     expected set by pruning dropped edges plus the list chains
      //     reachable only from them.
      val optsNG = opts.copy(produceGeneralizedRdf = false)
      val qNG = canon(ToRdf.toRdf(expanded.deepCopy.asArr.get, optsNG))
      val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      val bySubj = triples.groupBy(_.subj)
      def isChainNode(b: String): Boolean = {
        val ts = bySubj.getOrElse(b, Vector.empty)
        ts.nonEmpty && ts.forall(t => t.pred == rdfNs + "first" || t.pred == rdfNs + "rest")
      }
      val removedNG = scala.collection.mutable.Set[Triple]()
      def dropChain(b: String): Unit =
        if (b.startsWith("_:") && isChainNode(b))
          for (t <- bySubj.getOrElse(b, Vector.empty) if !removedNG(t)) {
            removedNG += t
            if (t.objKind == "bnode") dropChain(t.objValue)
          }
      for (t <- triples if t.pred.startsWith("_:")) {
        removedNG += t
        if (t.objKind == "bnode") dropChain(t.objValue)
      }
      val qKept = canon(triples.filterNot(removedNG))
      assert(qNG == qKept,
        s"produceGeneralizedRdf=false did not drop exactly the bnode-predicate edges + their list chains\ndoc: ${JsonWriter.write(doc)}\ngot:\n$qNG\nwant:\n$qKept")
      // 4. wildcard framing preserves the merged graph
      val framed = JsonLdApi.frame(JsonLdInput.Doc(expanded.deepCopy), new JObj(), opts)
      val qFrame = mergedCanon(ToRdf.toRdf(JsonLdApi.expand(JsonLdInput.Doc(framed), opts), opts))
      assert(qFrame == mergedCanon(triples),
        s"wildcard framing changed the merged graph\ndoc: ${JsonWriter.write(doc)}\nframed: ${JsonWriter.write(framed)}")
      // 5. SELECTIVE frames must stay total, expandable, and sound (no
      //    invented ground statements — the sweep-5 invariant, on shapes
      //    the fixture corpus never produces)
      // "ground" excludes bnodes in EVERY position (framing may relabel
      // blank nodes, incl. bnode predicates — wave I)
      val groundIn: Set[Triple] = triples.map(_.copy(graph = ""))
        .filter(t => !t.subj.startsWith("_:") && t.objKind != "bnode" &&
          !t.pred.startsWith("_:")).toSet
      val selectiveFrames = Seq(
        JObj("@type" -> JStr("http://b/x")),
        JObj("http://p/1" -> JArr(new JObj())),
        JObj("@requireAll" -> JBool(true), "@type" -> JStr("http://d/p"),
          "http://p/2" -> JArr(new JObj())))
      for (fr <- selectiveFrames) {
        val out = JsonLdApi.frame(JsonLdInput.Doc(expanded.deepCopy), fr.deepCopy, opts)
        val reOut = JsonLdApi.expand(JsonLdInput.Doc(out), opts)
        val groundOut = ToRdf.toRdf(reOut, opts).map(_.copy(graph = ""))
          .filter(t => !t.subj.startsWith("_:") && t.objKind != "bnode" &&
            !t.pred.startsWith("_:")).toSet
        val invented = groundOut -- groundIn
        assert(invented.isEmpty,
          s"selective framing INVENTED statements\nframe: ${JsonWriter.write(fr)}\ndoc: ${JsonWriter.write(doc)}\n${invented.mkString("\n")}")
      }
    }
  }

  // --- wave H: generated COMPACT-FORM input documents ---
  // Every other sweep enters through EXPANDED-form docs, so Expansion's
  // author-facing readers (language/index/id/type container maps, term-keyed
  // lists, @nest hoisting, keyword aliases, null-dropped members,
  // relative-IRI resolution, default @language) are exercised only by
  // fixtures. This generator produces VALID compact-form documents against a
  // feature-dense context; expansion must ACCEPT them (a throw is a
  // generator bug or an engine bug — either way a failure), and the result
  // must hold the semantic invariants.
  private val compactDocCtx: JObj = JObj(
    "@vocab" -> JStr("http://p/"),
    "@base" -> JStr("http://b/dir/doc"),
    "@language" -> JStr("en"),
    "lm" -> JObj("@id" -> JStr("http://p/1"), "@container" -> JStr("@language")),
    "ix" -> JObj("@id" -> JStr("http://p/2"), "@container" -> JStr("@index")),
    "pix" -> JObj("@id" -> JStr("http://p/5"), "@container" -> JStr("@index"),
      "@index" -> JStr("http://p/prop")),
    "idm" -> JObj("@id" -> JStr("http://p/3"), "@container" -> JStr("@id")),
    "tm" -> JObj("@id" -> JStr("http://p/4"), "@container" -> JStr("@type")),
    "lst" -> JObj("@id" -> JStr("http://p/1"), "@container" -> JStr("@list")),
    "iri" -> JObj("@id" -> JStr("http://p/2"), "@type" -> JStr("@id")),
    "typed" -> JObj("@id" -> JStr("http://p/3"), "@type" -> JStr("http://a/")),
    "jd" -> JObj("@id" -> JStr("http://v/data"), "@type" -> JStr("@json")),
    "pfx" -> JObj("@id" -> JStr("http://p/"), "@prefix" -> JBool(true)),
    "gc" -> JObj("@id" -> JStr("http://p/1"), "@container" -> JStr("@graph")),
    // wave J: graph id-map / graph index-map containers — map READING in
    // expansion (each value is a named/indexed graph)
    "gci" -> JObj("@id" -> JStr("http://p/4"),
      "@container" -> JArr(JStr("@graph"), JStr("@id"))),
    "gcx" -> JObj("@id" -> JStr("http://p/6"),
      "@container" -> JArr(JStr("@graph"), JStr("@index"))),
    "rt" -> JObj("@reverse" -> JStr("http://p/2")),
    "nst" -> JObj("@id" -> JStr("http://p/3"), "@nest" -> JStr("meta")),
    "meta" -> JStr("@nest"),
    "idA" -> JStr("@id"), "tA" -> JStr("@type"), "vA" -> JStr("@value"),
    "lA" -> JStr("@language"))
  private val genCScalarG: Gen[JsonValue] = Gen.oneOf[JsonValue](
    JStr("a"), JStr(""), JNum(2.5), JNum(-7.0), JBool(true))
  private val genCValueObjG: Gen[JsonValue] = Gen.oneOf[JsonValue](
    JObj("@value" -> JStr("v1"), "@language" -> JStr("de")),
    JObj("@value" -> JStr("v2"), "@direction" -> JStr("rtl")),
    JObj("@value" -> JStr("v3"), "@type" -> JStr("http://a/")),
    JObj("@value" -> JNum(1.0), "@index" -> JStr("vi")),
    // aliased keyword keys inside a value object
    JObj("vA" -> JStr("v4"), "lA" -> JStr("ar")))
  private def genCEntryG(depth: Int): Gen[(String, JsonValue)] = {
    val nodeG: Gen[JsonValue] =
      if (depth > 0) genCNodeG(depth - 1).map(n => n: JsonValue)
      else Gen.oneOf[JsonValue](JObj("@id" -> JStr("http://a/leaf")), JObj("idA" -> JStr("rel-leaf")))
    val mapOf: (Seq[String], Gen[JsonValue]) => Gen[JsonValue] = (keys, vg) =>
      Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, Gen.zip(Gen.oneOf(keys), vg))).map { kvs =>
        val m = new JObj(); kvs.foreach { case (k, v) => m.put(k, v) }; m
      }
    Gen.frequency[(String, JsonValue)](
      // language map: string / array-of-strings values, @none bucket
      2 -> mapOf(Seq("en", "de-DE", "@none"), Gen.oneOf[JsonValue](
        JStr("hallo"), JArr(JStr("x"), JStr("y")))).map("lm" -> _),
      // index map: scalars, arrays, value objects, nodes
      2 -> mapOf(Seq("i1", "i2", "@none"), Gen.frequency[JsonValue](
        2 -> genCScalarG, 1 -> genCValueObjG, 1 -> nodeG,
        1 -> genCScalarG.map(s => JArr(s)))).map("ix" -> _),
      // property-based index map: node-object values only (scalars are the
      // spec-13.8.3.7.2 invalid-value-object corner, pinned by t0099)
      1 -> mapOf(Seq("k1", "k2"), nodeG).map("pix" -> _),
      // id map: node objects, keys incl. relative IRIs / bnodes / @none
      2 -> mapOf(Seq("http://a/n1", "_:b9", "rel9", "@none"), nodeG).map("idm" -> _),
      // type map: node objects, keys are terms / compact IRIs / @none
      2 -> mapOf(Seq("T1", "pfx:T", "@none"), nodeG).map("tm" -> _),
      // list container: bare scalar (auto-wrapped), array, explicit @list
      2 -> Gen.frequency[JsonValue](
        1 -> genCScalarG,
        2 -> Gen.listOfN(2, genCScalarG).map(JArr.from(_)),
        1 -> Gen.listOfN(2, genCScalarG).map(xs => JObj("@list" -> JArr.from(xs))),
        1 -> Gen.const(JObj("@list" -> JArr(JArr(JStr("nested")))))).map("lst" -> _),
      // @type:@id coercion: strings are node refs (relative / compact IRIs)
      2 -> Gen.oneOf[JsonValue](JStr("rel2"), JStr("http://a/z"), JStr("pfx:q"),
        JArr(JStr("rel3"), JStr("#frag"))).map("iri" -> _),
      1 -> Gen.oneOf[JsonValue](JStr("5"), JNum(3.0)).map("typed" -> _),
      // @json coercion: the raw value IS the literal
      1 -> Gen.oneOf[JsonValue](JObj("x" -> JNum(1.0), "y" -> JNull),
        JArr(JBool(false), JNull), JStr("rawstr"), JNum(0.0)).map("jd" -> _),
      // graph container
      1 -> Gen.frequency[JsonValue](2 -> nodeG,
        1 -> nodeG.map(n => JArr(n))).map("gc" -> _),
      // graph id-map: keys NAME the graphs (IRI / bnode / @none default)
      1 -> mapOf(Seq("http://a/g1", "_:gb", "@none"), nodeG).map("gci" -> _),
      // graph index-map: keys index anonymous graphs
      1 -> mapOf(Seq("gi1", "@none"), nodeG).map("gcx" -> _),
      // reverse term: node objects only
      1 -> Gen.frequency[JsonValue](2 -> nodeG,
        1 -> nodeG.map(n => JArr(n))).map("rt" -> _),
      // explicit @reverse map: @id-coerced term admits plain-string refs
      1 -> Gen.oneOf[JsonValue](
        JObj("iri" -> JStr("http://a/r1")),
        JObj("pfx:r" -> JObj("@id" -> JStr("http://a/r2")))).map("@reverse" -> _),
      // nest bucket in INPUT form: members hoisted during expansion
      1 -> Gen.zip(genCScalarG, genCScalarG).map { case (a, b) =>
        "meta" -> (JObj("nst" -> a, "other" -> b): JsonValue) },
      // vocab-resolved key / compact-IRI key / node @index / null-drop
      2 -> genCScalarG.map("other" -> _),
      1 -> genCScalarG.map("pfx:sub" -> _),
      1 -> Gen.const("@index" -> (JStr("k"): JsonValue)),
      1 -> Gen.oneOf("lm", "iri", "other").map(t => t -> (JNull: JsonValue)),
      1 -> (if (depth > 0) genCNodeG(depth - 1).map(n => "@included" -> (JArr(n): JsonValue))
            else genCScalarG.map("other" -> _)))
  }
  private def genCNodeG(depth: Int): Gen[JObj] = for {
    idKey <- Gen.oneOf("@id", "idA")
    id <- Gen.option(Gen.oneOf("http://a/n1", "rel1", "#f", "_:cb1", "../up", "?q=1"))
    typKey <- Gen.oneOf("@type", "tA")
    types <- Gen.option(Gen.oneOf[JsonValue](JStr("T1"), JStr("pfx:T"),
      JArr(JStr("T1"), JStr("http://b/x"))))
    nEntries <- Gen.chooseNum(0, 3)
    entries <- Gen.listOfN(nEntries, genCEntryG(depth))
  } yield {
    val o = new JObj()
    id.foreach(i => o.put(idKey, JStr(i)))
    types.foreach(t => o.put(typKey, t.deepCopy))
    entries.foreach { case (k, v) => if (!o.contains(k)) o.put(k, v) }
    o
  }
  private val genCompactDocG: Gen[JObj] = for {
    node <- genCNodeG(2)
    shape <- Gen.chooseNum(0, 2)
    extra <- genCNodeG(0)
  } yield {
    val o = new JObj()
    o.put("@context", compactDocCtx.deepCopy)
    shape match {
      case 0 => node.keys.foreach(k => o.put(k, node.getOrNull(k)))
      case 1 => o.put("@graph", JArr(node, extra))
      case _ => // named graph: node under @graph of an identified node
        o.put("@id", JStr("http://g/1")); o.put("@graph", JArr(node))
    }
    o
  }

  test("generative sweep: compact-form input documents expand soundly and round-trip") {
    val opts = JsonLdOptions(base = Some("http://base/doc"))
    def canon(ts: Vector[Triple]): String = BnodeCanon.toCanonicalNQuads(ts)
    // Expansion is idempotent UP TO the spec's free-floating drop: a @graph
    // container can wrap a subject-only node ({"@id": x} states no quads),
    // and re-expanding that graph object drops the member (expansion step
    // 8.1/13.x free-floating rule, active property @graph). Mirror exactly
    // that drop before comparing (wave-H finding, engine-correct both ways).
    def pruneIdOnlyGraphMembers(v: JsonValue): JsonValue = v match {
      case o: JObj =>
        val out = new JObj()
        o.keys.foreach { k =>
          val child = pruneIdOnlyGraphMembers(o.getOrNull(k))
          child match {
            case arr: JArr if k == "@graph" =>
              val kept = new JArr()
              arr.iterator.foreach {
                case m: JObj if m.size == 0 || (m.size == 1 && m.contains("@id")) => // dropped
                case m => kept.push(m)
              }
              out.put(k, kept)
            case c => out.put(k, c)
          }
        }
        out
      case a: JArr => JArr.from(a.iterator.map(pruneIdOnlyGraphMembers).toVector)
      case other => other
    }
    forAll(Gen.zip(genCompactDocG, genCtxG), n = 250) { case (doc, genCtx) =>
      val expanded =
        try JsonLdApi.expand(JsonLdInput.Doc(doc.deepCopy), opts)
        catch { case e: JsonLdError =>
          fail(s"expansion rejected a generated-valid compact doc: ${e.render}\ndoc: ${JsonWriter.write(doc)}") }
      // 1. expansion is idempotent on its own output (up to the @graph
      //    free-floating drop, mirrored by the prune above)
      val again = JsonLdApi.expand(JsonLdInput.Doc(expanded.deepCopy), opts)
      assert(JsonEq.jsonLdEq(again, pruneIdOnlyGraphMembers(expanded.deepCopy), ordered = false),
        s"expansion not idempotent\ndoc: ${JsonWriter.write(doc)}\nonce:  ${JsonWriter.write(expanded)}\ntwice: ${JsonWriter.write(again)}")
      // 2. ordered expansion must produce the same result
      val expandedOrd = JsonLdApi.expand(JsonLdInput.Doc(doc.deepCopy), opts.copy(ordered = true))
      assert(JsonEq.jsonLdEq(expandedOrd, expanded, ordered = false),
        s"ordered expansion changed the RESULT\ndoc: ${JsonWriter.write(doc)}")
      val triples = ToRdf.toRdf(expanded.deepCopy.asArr.get, opts)
      val qIn = canon(triples)
      // 3. flatten preserves quads
      val qFlat = canon(ToRdf.toRdf(Flatten.flattenExpanded(expanded.deepCopy.asArr.get), opts))
      assert(qFlat == qIn, s"flatten changed the graph\ndoc: ${JsonWriter.write(doc)}\nin:\n$qIn\nflat:\n$qFlat")
      // 4. toRdf ∘ fromRdf identity
      val qBack = canon(ToRdf.toRdf(JsonLdApi.fromRdf(triples, opts), opts))
      assert(qBack == qIn, s"toRdf∘fromRdf not identity\ndoc: ${JsonWriter.write(doc)}\nin:\n$qIn\nback:\n$qBack")
      // 5. compaction round-trips: the doc's OWN context is the richest
      //    probe (it re-emits the container maps the input was written in)
      val ownProbes = Seq(
        "own" -> compactDocCtx, "empty" -> new JObj(),
        "vocab" -> JObj("@vocab" -> JStr("http://p/")))
      for ((label, ctx) <- ownProbes) {
        val compacted =
          try JsonLdApi.compactPreExpanded(expanded.deepCopy.asArr.get,
            Some(JObj("@context" -> ctx.deepCopy)), opts)
          catch { case e: JsonLdError =>
            fail(s"ctx=$label: compaction threw ${e.render}\ndoc: ${JsonWriter.write(doc)}") }
        val re =
          try JsonLdApi.expand(JsonLdInput.Doc(compacted), opts)
          catch { case e: JsonLdError =>
            fail(s"ctx=$label: re-expansion threw ${e.render}\ndoc: ${JsonWriter.write(doc)}\ncompacted: ${JsonWriter.write(compacted)}") }
        val qRe = canon(ToRdf.toRdf(re, opts))
        assert(qRe == qIn,
          s"ctx=$label: graph changed through compaction\ndoc: ${JsonWriter.write(doc)}\ncompacted: ${JsonWriter.write(compacted)}\nin:\n$qIn\nre:\n$qRe")
      }
      // 6. wave I: a GENERATED context PREPENDED as a context array — the
      //    array is processed sequentially, so compactDocCtx overrides every
      //    colliding default (@vocab/@language/@base) while the generated
      //    noise terms, aliases, @protected and a surviving @direction
      //    default stay active. The document never uses the generated term
      //    names, so expansion must ACCEPT, and the doc-2 graph must hold the
      //    flatten / fromRdf invariants on its own quads.
      val doc2 = doc.deepCopy.asInstanceOf[JObj]
      doc2.put("@context", JArr(genCtx.deepCopy, compactDocCtx.deepCopy))
      val exp2 =
        try JsonLdApi.expand(JsonLdInput.Doc(doc2.deepCopy), opts)
        catch { case e: JsonLdError =>
          fail(s"expansion rejected a prepended-generated-ctx doc: ${e.render}\ndoc: ${JsonWriter.write(doc2)}") }
      val t2 = ToRdf.toRdf(exp2.deepCopy.asArr.get, opts)
      val qIn2 = canon(t2)
      val qFlat2 = canon(ToRdf.toRdf(Flatten.flattenExpanded(exp2.deepCopy.asArr.get), opts))
      assert(qFlat2 == qIn2,
        s"gen-prepend: flatten changed the graph\ndoc: ${JsonWriter.write(doc2)}\nin:\n$qIn2\nflat:\n$qFlat2")
      val qBack2 = canon(ToRdf.toRdf(JsonLdApi.fromRdf(t2, opts), opts))
      assert(qBack2 == qIn2,
        s"gen-prepend: toRdf∘fromRdf not identity\ndoc: ${JsonWriter.write(doc2)}\nin:\n$qIn2\nback:\n$qBack2")
      // compaction against the SAME array context must round-trip the graph.
      // ProtectedTermRedefinition is a spec'd loud reject (compaction's
      // TYPE-scoped activation passes overrideProtected=false per the
      // spec's literal text — step 5.2.3 names no override — so a generated
      // scoped context colliding with a generated protected term rejects;
      // same tolerance as the main sweep's probe loop)
      val c2 =
        try JsonLdApi.compactPreExpanded(exp2.deepCopy.asArr.get,
          Some(JObj("@context" -> JArr(genCtx.deepCopy, compactDocCtx.deepCopy))), opts)
        catch {
          case e: JsonLdError if e.code == ErrorCode.ProtectedTermRedefinition => null
          case e: JsonLdError =>
            fail(s"gen-prepend: compaction threw ${e.render}\ndoc: ${JsonWriter.write(doc2)}")
        }
      val re2 = if (c2 == null) null else
        try JsonLdApi.expand(JsonLdInput.Doc(c2), opts)
        catch {
          // the wave-H scalar-path protection asymmetry applies here too:
          // compaction may route content under a generated scoped term whose
          // re-expansion rejects — a loud reject is engine-correct
          case e: JsonLdError if e.code == ErrorCode.ProtectedTermRedefinition => null
          case e: JsonLdError =>
            fail(s"gen-prepend: re-expansion threw ${e.render}\ndoc: ${JsonWriter.write(doc2)}\ncompacted: ${JsonWriter.write(c2)}")
        }
      if (re2 != null) {
        val qRe2 = canon(ToRdf.toRdf(re2, opts))
        assert(qRe2 == qIn2,
          s"gen-prepend: graph changed through compaction\ndoc: ${JsonWriter.write(doc2)}\ncompacted: ${JsonWriter.write(c2)}\nin:\n$qIn2\nre:\n$qRe2")
      }
    }
  }

  // --- generative frame sweep: random VALID frames against generated docs ---
  // The framing fuzz below throws arbitrary junk at frame() and only demands
  // no-crash; this sweep generates WELL-FORMED frames (type/id selectors,
  // nested property frames, value patterns, @embed/@explicit/@requireAll/
  // @omitDefault flags, @default fillers) so the invariants can be semantic:
  //   - framing never throws on a valid (doc, frame) pair
  //   - the framed output is expandable
  //   - without @default anywhere, framing never INVENTS ground statements
  //     (the bug-#5 family: value patterns must filter, not fabricate)
  private def genFramePropG(depth: Int): Gen[JsonValue] = Gen.frequency(
    3 -> Gen.const(JArr(new JObj())), // present-wildcard
    1 -> Gen.const(new JArr()),       // match-none
    2 -> (if (depth > 0) genFrameG(depth - 1).map(f => JArr(f))
          else Gen.const(JArr(new JObj()))),
    1 -> Gen.oneOf( // value patterns: exact, wildcard-lang, typed-wildcard
      JArr(JObj("@value" -> JStr("s1"))),
      JArr(JObj("@value" -> new JObj(), "@language" -> JArr(JStr("en")))),
      JArr(JObj("@value" -> new JObj(), "@type" -> JArr(JStr("http://a/"))))),
    1 -> Gen.const(JArr(JObj("@default" -> JStr("dflt")))))
  private def genFrameG(depth: Int): Gen[JObj] = for {
    typeSel <- Gen.option(Gen.oneOf[JsonValue](
      JStr("http://b/x"),                     // concrete type selector
      JObj("@default" -> JStr("http://b/x")), // default-type: matches any
      new JObj(),                             // wildcard (type present)
      new JArr()))                            // match-none
    idSel <- Gen.option(Gen.oneOf[JsonValue](
      JStr("http://a/"),
      JArr(JStr("http://d/p"), JStr("http://b/x"))))
    nProps <- Gen.chooseNum(0, 2)
    props <- Gen.listOfN(nProps, Gen.zip(genPropG, genFramePropG(depth)))
    embed <- Gen.option(Gen.oneOf("@once", "@always", "@never"))
    explicit <- Gen.option(Gen.oneOf(true, false))
    requireAll <- Gen.option(Gen.oneOf(true, false))
    omitDefault <- Gen.option(Gen.oneOf(true, false))
    // wave J: @graph recursion — frame the node's named graph with a
    // wildcard subframe (generated docs carry named graphs)
    graphFr <- Gen.option(Gen.const(JArr(new JObj()): JsonValue))
    // wave K: @reverse selectors — match nodes that are the OBJECT of the
    // property (wildcard, and a typed subframe)
    revFr <- Gen.option(Gen.oneOf[JsonValue](
      JObj("http://p/1" -> JArr(new JObj())),
      JObj("http://v/data" -> JArr(JObj("@type" -> JArr(JStr("http://b/x")))))))
  } yield {
    val o = new JObj()
    idSel.foreach(v => o.put("@id", v))
    typeSel.foreach(v => o.put("@type", v))
    graphFr.foreach(g => o.put("@graph", g.deepCopy))
    revFr.foreach(r => o.put("@reverse", r.deepCopy))
    props.foreach { case (p, v) => if (!o.contains(p)) o.put(p, v) }
    embed.foreach(e => o.put("@embed", JStr(e)))
    explicit.foreach(e => o.put("@explicit", JBool(e)))
    requireAll.foreach(r => o.put("@requireAll", JBool(r)))
    omitDefault.foreach(od => o.put("@omitDefault", JBool(od)))
    o
  }
  private def frameHasDefault(v: JsonValue): Boolean = v match {
    case o: JObj => o.iterator.exists { case (k, vv) => k == "@default" || frameHasDefault(vv) }
    case a: JArr => a.iterator.exists(frameHasDefault)
    case _ => false
  }

  test("generative frame sweep: valid random frames are total, expandable, and never invent ground statements") {
    val opts = JsonLdOptions(base = Some("http://base/doc"))
    forAll(Gen.zip(genExpandedDocG, Gen.listOfN(3, genFrameG(2))), n = 200) { case (doc, frames) =>
      val expanded = JsonLdApi.expand(JsonLdInput.Doc(doc.deepCopy), opts)
      val groundIn: Set[Triple] = ToRdf.toRdf(expanded.deepCopy.asArr.get, opts)
        .map(_.copy(graph = ""))
        .filter(t => !t.subj.startsWith("_:") && t.objKind != "bnode" &&
          !t.pred.startsWith("_:")).toSet
      for (fr <- frames) {
        val framed =
          try JsonLdApi.frame(JsonLdInput.Doc(expanded.deepCopy), fr.deepCopy, opts)
          catch { case e: JsonLdError =>
            fail(s"framing threw ${e.render}\nframe: ${JsonWriter.write(fr)}\ndoc: ${JsonWriter.write(doc)}") }
        val reOut =
          try JsonLdApi.expand(JsonLdInput.Doc(framed), opts)
          catch { case e: JsonLdError =>
            fail(s"framed output not expandable: ${e.render}\nframe: ${JsonWriter.write(fr)}\nframed: ${JsonWriter.write(framed)}") }
        if (!frameHasDefault(fr)) {
          val groundOut = ToRdf.toRdf(reOut, opts).map(_.copy(graph = ""))
            .filter(t => !t.subj.startsWith("_:") && t.objKind != "bnode" &&
              !t.pred.startsWith("_:")).toSet
          val invented = groundOut -- groundIn
          assert(invented.isEmpty,
            s"framing INVENTED ground statements\nframe: ${JsonWriter.write(fr)}\ndoc: ${JsonWriter.write(doc)}\n${invented.mkString("\n")}")
        }
      }
    }
  }

  // --- wave L: processingMode json-ld-1.0 on the 1.0 feature subset ---
  // 1.0's differences live almost entirely in CONTEXT processing; on pure
  // expanded-form input stripped of 1.1-only constructs (@direction, @json
  // literals, @included, nested lists), 1.0 and 1.1 expansion must agree
  // exactly, toRdf must emit the same quads, and compaction against
  // 1.0-legal probe contexts must round-trip the graph under 1.0 mode.
  test("generative sweep: json-ld-1.0 mode agrees with 1.1 on the 1.0 feature subset") {
    def strip11(v: JsonValue): JsonValue = v match {
      case o: JObj if o.contains("@value") =>
        if (o.get("@type").flatMap(_.asString).contains("@json")) JObj("@value" -> JStr("j10"))
        else {
          val out = new JObj()
          o.iterator.foreach { case (k, vv) => if (k != "@direction") out.put(k, vv.deepCopy) }
          if (out.size == 0) JObj("@value" -> JStr("j10")) else out
        }
      case o: JObj =>
        val out = new JObj()
        o.iterator.foreach { case (k, vv) =>
          if (k == "@included") () // 1.1-only: drop
          else if (k == "@list") {
            val items = (strip11(vv) match {
              case a: JArr => a.iterator.toVector
              case other => Vector(other)
            }).filterNot(_.asObj.exists(_.contains("@list"))) // 1.0 list-of-lists is an error
            out.put(k, JArr.from(items))
          } else out.put(k, strip11(vv))
        }
        out
      case a: JArr => JArr.from(a.iterator.map(strip11).toVector)
      case other => other
    }
    val opts11 = JsonLdOptions(base = Some("http://base/doc"))
    val opts10 = opts11.copy(processingMode = ProcessingMode.JsonLd10)
    // 1.0-legal probe contexts only (no scoped/protected/@prefix/@json/
    // @graph containers/@id-@type maps/@direction)
    val probe10: Vector[(String, JObj)] = Vector(
      "empty" -> new JObj(),
      "vocab" -> JObj("@vocab" -> JStr("http://p/")),
      "set+lang" -> JObj(
        "p1" -> JObj("@id" -> JStr("http://p/1"), "@container" -> JStr("@set")),
        "@language" -> JStr("en")),
      "list" -> JObj("lst" -> JObj("@id" -> JStr("http://p/2"), "@container" -> JStr("@list"))),
      "index-map" -> JObj("ix" -> JObj("@id" -> JStr("http://p/1"), "@container" -> JStr("@index"))),
      "lang-map" -> JObj("lm" -> JObj("@id" -> JStr("http://p/3"), "@container" -> JStr("@language"))),
      "reverse-term" -> JObj("rt" -> JObj("@reverse" -> JStr("http://p/2"))),
      "id-coerce" -> JObj("ic" -> JObj("@id" -> JStr("http://p/1"), "@type" -> JStr("@id"))))
    def canon(ts: Vector[Triple]): String = BnodeCanon.toCanonicalNQuads(ts)
    forAll(genExpandedDocG, n = 150) { doc0 =>
      val doc = strip11(doc0.deepCopy)
      val e10 =
        try JsonLdApi.expand(JsonLdInput.Doc(doc.deepCopy), opts10)
        catch { case e: JsonLdError =>
          fail(s"1.0 expansion rejected a 1.0-safe doc: ${e.render}\ndoc: ${JsonWriter.write(doc)}") }
      val e11 = JsonLdApi.expand(JsonLdInput.Doc(doc.deepCopy), opts11)
      assert(JsonEq.jsonLdEq(e10, e11, ordered = false),
        s"1.0 and 1.1 expansion disagree on a 1.0-safe doc\ndoc: ${JsonWriter.write(doc)}\n1.0: ${JsonWriter.write(e10)}\n1.1: ${JsonWriter.write(e11)}")
      val q10 = canon(ToRdf.toRdf(e10.deepCopy.asArr.get, opts10))
      val q11 = canon(ToRdf.toRdf(e11.deepCopy.asArr.get, opts11))
      assert(q10 == q11,
        s"1.0 and 1.1 toRdf disagree\ndoc: ${JsonWriter.write(doc)}\n1.0:\n$q10\n1.1:\n$q11")
      for ((label, ctx) <- probe10) {
        val compacted =
          try JsonLdApi.compactPreExpanded(e10.deepCopy.asArr.get,
            Some(JObj("@context" -> ctx.deepCopy)), opts10)
          catch { case e: JsonLdError =>
            fail(s"1.0 ctx=$label: compaction threw ${e.render}\ndoc: ${JsonWriter.write(doc)}") }
        val re =
          try JsonLdApi.expand(JsonLdInput.Doc(compacted), opts10)
          catch { case e: JsonLdError =>
            fail(s"1.0 ctx=$label: re-expansion threw ${e.render}\ndoc: ${JsonWriter.write(doc)}\ncompacted: ${JsonWriter.write(compacted)}") }
        val qRe = canon(ToRdf.toRdf(re, opts10))
        assert(qRe == q10,
          s"1.0 ctx=$label: graph changed through compaction\ndoc: ${JsonWriter.write(doc)}\ncompacted: ${JsonWriter.write(compacted)}\nin:\n$q10\nre:\n$qRe")
      }
    }
  }

  // --- wave L: remotely-loaded generated contexts ---
  // A generated context fetched by IRI (MapLoader) must behave exactly like
  // the same context inline — including a CHAINED remote reference (a
  // remote context whose @context is itself a remote IRI, the recursion/
  // cycle-set path) and a second expansion exercising the loaded-context
  // cache. The compact-form doc generator supplies the document body.
  test("generative sweep: remotely-loaded generated contexts behave like inline ones") {
    val opts = JsonLdOptions(base = Some("http://base/doc"))
    // ADJUDICATED: @base is EXCLUDED from this equivalence. The remote-
    // contexts cycle set is threaded as one shared mutable set (reference
    // context.rs:94-100 FrozenSet; spec 4.1.2 step 5.7 gates @base on that
    // set being empty), so after ANY remote element the @base of every
    // LATER inline element in the same array is ignored too — remote and
    // inline context arrays legitimately resolve relative @ids differently
    // whenever @base appears. Strip @base on both sides; everything else
    // (terms, aliases, defaults, @protected, chains) must agree exactly.
    def noBase(c: JObj): JObj = {
      val d = c.deepCopy.asInstanceOf[JObj]; d.removeKey("@base"); d
    }
    forAll(Gen.zip(genCompactDocG, genCtxG), n = 120) { case (doc, genCtx0) =>
      val genCtx = noBase(genCtx0)
      val docCtxNB = noBase(compactDocCtx)
      val ctxAUrl = "http://ctx.example/a"
      val ctxChainUrl = "http://ctx.example/chain"
      val loader = new DocumentLoader.MapLoader(Map(
        ctxAUrl -> JsonWriter.write(JObj("@context" -> genCtx.deepCopy)),
        // a remote context whose @context is a STRING is a redirection (the
        // alternate-recursion path); an ARRAY there is `invalid remote
        // context` per reference context.rs:116-122 — engine matches
        ctxChainUrl -> JsonWriter.write(JObj("@context" -> JStr(ctxAUrl)))))
      def withCtx(ctxVal: JsonValue): JObj = {
        val d = doc.deepCopy.asInstanceOf[JObj]
        d.put("@context", ctxVal)
        d
      }
      val inline = withCtx(JArr(genCtx.deepCopy, docCtxNB.deepCopy))
      val remote = withCtx(JArr(JStr(ctxAUrl), docCtxNB.deepCopy))
      val chained = withCtx(JArr(JStr(ctxChainUrl), docCtxNB.deepCopy))
      val eInline =
        try JsonLdApi.expand(JsonLdInput.Doc(inline), opts, loader)
        catch { case e: JsonLdError =>
          fail(s"inline expansion threw ${e.render}\ndoc: ${JsonWriter.write(inline)}") }
      for ((label, d) <- Seq("remote" -> remote, "chained" -> chained)) {
        val eRemote =
          try JsonLdApi.expand(JsonLdInput.Doc(d.deepCopy), opts, loader)
          catch { case e: JsonLdError =>
            fail(s"$label expansion threw ${e.render}\ndoc: ${JsonWriter.write(d)}") }
        assert(JsonEq.jsonLdEq(eRemote, eInline, ordered = false),
          s"$label context expansion diverged from inline\nctx: ${JsonWriter.write(genCtx)}\ndoc: ${JsonWriter.write(doc)}\nremote: ${JsonWriter.write(eRemote)}\ninline: ${JsonWriter.write(eInline)}")
        // second pass: the loaded-context cache must not change the result
        val eAgain = JsonLdApi.expand(JsonLdInput.Doc(d.deepCopy), opts, loader)
        assert(JsonEq.jsonLdEq(eAgain, eInline, ordered = false),
          s"$label context second expansion diverged (cache path)\ndoc: ${JsonWriter.write(d)}")
      }
      // @import: {"@import": U, ...own} must equal the MANUAL merge of the
      // imported map with the importing context, own entries winning
      // (context-processing @import step; import targets may not carry
      // @import/@propagate themselves — genCtxG emits neither)
      val importUrl = "http://ctx.example/imp"
      val loaderImp = new DocumentLoader.MapLoader(Map(
        importUrl -> JsonWriter.write(JObj("@context" -> genCtx.deepCopy))))
      val importing = docCtxNB.deepCopy.asInstanceOf[JObj]
      importing.put("@import", JStr(importUrl))
      val merged = {
        val m = genCtx.deepCopy.asInstanceOf[JObj]
        docCtxNB.iterator.foreach { case (k, v) => m.put(k, v.deepCopy) }
        m
      }
      val eImp =
        try JsonLdApi.expand(JsonLdInput.Doc(withCtx(importing)), opts, loaderImp)
        catch { case e: JsonLdError =>
          fail(s"@import expansion threw ${e.render}\nimported: ${JsonWriter.write(genCtx)}\ndoc: ${JsonWriter.write(doc)}") }
      val eMerged = JsonLdApi.expand(JsonLdInput.Doc(withCtx(merged)), opts, DocumentLoader.empty)
      assert(JsonEq.jsonLdEq(eImp, eMerged, ordered = false),
        s"@import diverged from the manual merge\nimported: ${JsonWriter.write(genCtx)}\ndoc: ${JsonWriter.write(doc)}\nimport: ${JsonWriter.write(eImp)}\nmerge:  ${JsonWriter.write(eMerged)}")
    }
  }

  // --- wave K: generative HTML script embedding ---
  // Generated docs rendered into <script type="application/ld+json"> blocks
  // across markup variants (tag case, attribute quoting, decoy classic
  // scripts with comment-lookalike raw text, ghost scripts inside HTML
  // comments, <base href>, fragment selection) must expand through the
  // text/html Remote path to exactly the graph of the directly-expanded
  // JSON. Scanner corners are unit-pinned in HtmlScriptsSpec; this leg
  // checks the END-TO-END wiring (extraction, splicing, base resolution)
  // on document shapes no fixture spells out.
  test("generative sweep: HTML-embedded documents expand to the same graph as direct JSON") {
    def canon(ts: Vector[Triple]): String = BnodeCanon.toCanonicalNQuads(ts)
    def quadsOf(v: JsonValue, opts: JsonLdOptions): String =
      canon(ToRdf.toRdf(JsonLdApi.expand(JsonLdInput.Doc(v), opts).deepCopy.asArr.get, opts))
    def remoteQuads(html: String, url: String, opts: JsonLdOptions): String = {
      val remote = JsonLdInput.Remote(RemoteDocument("text/html", None, JStr(html), url))
      canon(ToRdf.toRdf(JsonLdApi.expand(remote, opts).deepCopy.asArr.get, opts))
    }
    forAll(Gen.zip(genExpandedDocG, genExpandedDocG, Gen.chooseNum(0, 2)), n = 120) {
      case (docA0, docB, variant) =>
        // one relative-@id node so the effective base is observable
        val docA = docA0.deepCopy.asInstanceOf[JArr]
        docA.push(JObj("@id" -> JStr("relnode"),
          "http://p/1" -> JArr(JObj("@value" -> JNum(1.0)))))
        val sA = JsonWriter.write(docA)
        val sB = JsonWriter.write(docB)
        val url = "http://host/a/page.html"
        val (html, effectiveBase) = variant match {
          case 0 => (
            s"""<!DOCTYPE html><html><head>
               |<!-- <script type="application/ld+json">{"@id": "http://n/ghost"}</script> -->
               |<script type="application/ld+json">$sA</script>
               |<script type="text/javascript">var s = "<!--";</script>
               |<script type="application/ld+json">$sB</script>
               |</head><body></body></html>""".stripMargin, url)
          case 1 => (
            s"""<html><head><base href="sub/">
               |<SCRIPT TYPE='application/ld+json;charset=UTF-8'>$sA</SCRIPT>
               |<SCRIPT TYPE="application/ld+json">$sB</SCRIPT>
               |</head></html>""".stripMargin, "http://host/a/sub/")
          case _ => (
            s"""<html><body>
               |<script>classic();</script>
               |<script type=application/ld+json>$sA</script>
               |<script id=two type = "application/ld+json">$sB</script>
               |</body></html>""".stripMargin, url)
        }
        val optsDirect = JsonLdOptions(base = Some(effectiveBase))
        val optsRemote = JsonLdOptions() // base governed by documentUrl/<base href>
        // default: FIRST candidate script only
        val qFirst = remoteQuads(html, url, optsRemote)
        val qDirectA = quadsOf(docA.deepCopy, optsDirect)
        assert(qFirst == qDirectA,
          s"variant=$variant first-script graph diverged\nhtml-base: $effectiveBase\ndocA: $sA\nhtml:\n$qFirst\ndirect:\n$qDirectA")
        // extractAllScripts: splice of both docs in document order
        val qAll = remoteQuads(html, url, optsRemote.copy(extractAllScripts = true))
        val combined = JArr.from(docA.deepCopy.asArr.get.iterator.toVector ++
          docB.deepCopy.asArr.get.iterator.toVector)
        val qDirectAll = quadsOf(combined, optsDirect)
        assert(qAll == qDirectAll,
          s"variant=$variant all-scripts graph diverged\ndocA: $sA\ndocB: $sB\nhtml:\n$qAll\ndirect:\n$qDirectAll")
        // fragment selection picks the identified script only (variant 2)
        if (variant == 2) {
          val qFrag = remoteQuads(html, url + "#two", optsRemote)
          val qDirectB = quadsOf(docB.deepCopy, optsDirect)
          assert(qFrag == qDirectB,
            s"fragment-selected graph diverged\ndocB: $sB\nhtml:\n$qFrag\ndirect:\n$qDirectB")
        }
    }
  }

  test("keyword-heavy fuzz: expand→toRdf→canonicalize never fails with anything but a clean JsonLdError") {
    // crash-fuzz for branches the curated fixtures miss: random documents
    // built from JSON-LD keywords, aliases, IRIs, bnodes, and junk. Spec
    // violations MUST surface as JsonLdError (→ pipeline error channel);
    // any other exception is an engine bug that would kill an executor task.
    val keys = Gen.oneOf(
      "@id", "@type", "@value", "@language", "@list", "@set", "@reverse", "@graph",
      "@index", "@nest", "@context", "@direction", "@included", "@json", "@none",
      "a", "ex:p", "_:b0", "http://p/q", "@foo", "", ":", "x:y")
    val scalars: Gen[JsonValue] = Gen.oneOf(
      Gen.const(JNull), Gen.oneOf(true, false).map(JBool(_)),
      Gen.oneOf("", "v", "en", "rtl", "ltr", "@none", "http://e/x", "_:b1", "rel", "x:y", "@id").map(JStr.apply),
      Gen.chooseNum(-5, 5).map(n => JNum(n.toDouble)))
    def tree(depth: Int): Gen[JsonValue] =
      if (depth <= 0) scalars
      else Gen.frequency(
        3 -> scalars,
        2 -> Gen.listOfN(2, tree(depth - 1)).map(JArr.from(_)),
        3 -> Gen.listOfN(3, Gen.zip(keys, tree(depth - 1))).map { kvs =>
          val o = new JObj(); kvs.foreach { case (k, v) => o.put(k, v) }; o
        })
    val opts = JsonLdOptions(base = Some("http://base/doc"))
    // random compaction contexts: term → IRI / keyword alias / full definition
    val defnObj: Gen[JsonValue] = Gen.listOfN(2, Gen.zip(
      Gen.oneOf("@id", "@type", "@container", "@language", "@direction", "@reverse", "@prefix", "@nest", "@index"),
      Gen.oneOf("http://d/", "@id", "@vocab", "@list", "@set", "@language", "@index", "en", "rtl", "true", "@nest", "x:y")
        .map(JStr.apply))).map { kvs => val o = new JObj(); kvs.foreach { case (k, v) => o.put(k, v) }; o }
    val ctxGen: Gen[JObj] = Gen.listOfN(3, Gen.zip(
      Gen.oneOf("t", "u", "ex", "id2", "@vocab", "@language", "@base"),
      Gen.frequency[JsonValue](
        3 -> Gen.oneOf("http://c/", "@id", "@type", "http://c/x", "x:y", "en").map(JStr.apply),
        1 -> Gen.const(JNull),
        2 -> defnObj))).map { kvs =>
      val inner = new JObj(); kvs.foreach { case (k, v) => inner.put(k, v) }
      JObj("@context" -> inner)
    }
    forAll(Gen.zip(tree(4), ctxGen), n = 400) { case (doc, ctx) =>
      try {
        val expanded = JsonLdApi.expand(JsonLdInput.Doc(doc), opts)
        val triples = ToRdf.toRdf(expanded, opts)
        BnodeCanon.canonicalize(triples, scopeSalt = "fuzz")
        JsonLdApi.compact(JsonLdInput.Doc(expanded.deepCopy), Some(ctx), opts)
        ()
      } catch {
        case _: JsonLdError => // clean spec error — fine
        case e: Throwable => fail(s"engine threw ${e.getClass.getName}: ${e.getMessage}\ninput: ${JsonWriter.write(doc)}\nctx: ${JsonWriter.write(ctx)}")
      }
    }
  }

  test("framing fuzz: arbitrary frames against arbitrary documents never crash the engine") {
    val frameKeys = Gen.oneOf(
      "@id", "@type", "@embed", "@explicit", "@requireAll", "@omitDefault", "@default",
      "@value", "@language", "@reverse", "@graph", "http://p/q", "ex:p", "a")
    val frameVals: Gen[JsonValue] = Gen.oneOf(
      Gen.const(JNull), Gen.oneOf(true, false).map(JBool(_)),
      Gen.oneOf("@always", "@never", "@once", "@null", "http://e/x", "ex:T", "T", "en", "").map(JStr.apply),
      Gen.const(new JObj()))
    def frameTree(depth: Int): Gen[JsonValue] =
      if (depth <= 0) frameVals
      else Gen.frequency(
        2 -> frameVals,
        1 -> Gen.listOfN(2, frameTree(depth - 1)).map(JArr.from(_)),
        2 -> Gen.listOfN(2, Gen.zip(frameKeys, frameTree(depth - 1))).map { kvs =>
          val o = new JObj(); kvs.foreach { case (k, v) => o.put(k, v) }; o
        })
    val docGen = Gen.oneOf(
      """{"@context":{"ex":"http://example.org/"},"@graph":[{"@id":"ex:a","@type":"ex:T","ex:p":{"@id":"ex:b"}},{"@id":"ex:b","ex:q":"v"}]}""",
      """{"@context":{"ex":"http://example.org/"},"ex:p":[{"ex:q":{"ex:r":"deep"}},{"@id":"ex:c"}]}""",
      """{"@id":"http://s/","http://p/q":[{"@value":"x","@language":"en"},{"@list":[1,2]}]}""")
    val opts = JsonLdOptions(base = Some("http://base/doc"))
    forAll(Gen.zip(docGen, frameTree(3)), n = 300) { case (docTxt, frame) =>
      val frameObj = frame match { case o: JObj => o; case other => JObj("@graph" -> other) }
      try {
        JsonLdApi.frame(JsonLdInput.Doc(JsonParser.parse(docTxt)), frameObj, opts)
        ()
      } catch {
        case _: JsonLdError =>
        case e: Throwable => fail(s"frame threw ${e.getClass.getName}: ${e.getMessage}\nframe: ${JsonWriter.write(frameObj)}")
      }
    }
  }

  test("fromRdf fuzz: arbitrary datasets (incl. broken rdf:first/rest shapes) serialize cleanly") {
    val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val genTerm = Gen.oneOf("_:b0", "_:b1", "_:b2", "http://s/a", "http://s/b", RDF + "nil")
    val genPred = Gen.oneOf(RDF + "first", RDF + "rest", RDF + "type", "http://p/p", "http://p/q")
    val genObj: Gen[(String, String, String, String)] = Gen.oneOf(
      genTerm.map(t => if (t.startsWith("_:")) ("bnode", t, "", "") else ("iri", t, "", "")),
      Gen.oneOf("v", "42", "true").map(l => ("literal", l, "http://www.w3.org/2001/XMLSchema#string", "")),
      Gen.const(("literal", "x", RDF + "langString", "en")))
    val genTriple = for {
      s <- genTerm; p <- genPred; o <- genObj
      g <- Gen.oneOf("", "_:g0", "http://g/")
    } yield Triple(s, p, o._1, o._2, o._3, o._4, g)
    val opts = JsonLdOptions()
    forAll(Gen.listOfN(8, genTriple), n = 300) { ts =>
      try {
        val out = JsonLdApi.fromRdf(ts.toVector, opts)
        JsonLdApi.expand(JsonLdInput.Doc(out), opts) // result must re-expand cleanly
        ()
      } catch {
        case _: JsonLdError =>
        case e: Throwable => fail(s"fromRdf threw ${e.getClass.getName}: ${e.getMessage}\ntriples: $ts")
      }
    }
  }

  // --- wave K: fromRdf identity sweep on generated DATASETS ---
  // The fromRdf fuzz above only demands no-crash on broken shapes; this
  // sweep asserts the strong invariant: toRdf∘fromRdf is the IDENTITY on
  // the distinct quad set of EVERY valid dataset — datasets reach shapes no
  // document can produce (multiply-referenced list chains that must NOT
  // fold into @list, chains crossed between graphs, rdf:nil as a subject
  // with properties, rdf:type on list nodes), so fromRdf's list-folding
  // decisions are each forced to be reversible.
  test("fromRdf identity sweep: toRdf∘fromRdf is the identity on generated datasets") {
    val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val genTermK = Gen.oneOf("_:b0", "_:b1", "_:b2", "http://s/a", "http://s/b", RDF + "nil")
    // bnode PREDICATES (generalized RDF) and a bnode graph name COLLIDING
    // with a node label ride the identity too
    val genPredK = Gen.oneOf(RDF + "first", RDF + "rest", RDF + "type", "http://p/p", "http://p/q", "_:b1")
    val genObjK: Gen[(String, String, String, String)] = Gen.oneOf(
      genTermK.map(t => if (t.startsWith("_:")) ("bnode", t, "", "") else ("iri", t, "", "")),
      Gen.oneOf("v", "42", "true").map(l => ("literal", l, "http://www.w3.org/2001/XMLSchema#string", "")),
      Gen.const(("literal", "7", "http://www.w3.org/2001/XMLSchema#integer", "")),
      Gen.const(("literal", "x", RDF + "langString", "en")))
    val genGraphK = Gen.oneOf("", "", "_:g0", "http://g/", "_:b0")
    val genTripleK = for {
      s <- genTermK; p <- genPredK; o <- genObjK; g <- genGraphK
    } yield Triple(s, p, o._1, o._2, o._3, o._4, g)
    // a deliberate WELL-FORMED chain (foldable) + optional extra references
    // that must VETO the fold (multiply-referenced / cross-graph)
    val genChainK: Gen[Vector[Triple]] = for {
      len <- Gen.chooseNum(1, 3)
      g <- genGraphK
      item <- genObjK
      // 0: none, 1: second head ref, 2: mid ref, 3: cross-graph ref,
      // 4: chain label also used as a PREDICATE (same graph), 5: chain label
      // also names a GRAPH — 4 and 5 are reference positions usage tracking
      // never counts (ADVICE round-5: both previously still folded, splitting
      // the label or dropping the named graph)
      extraRef <- Gen.chooseNum(0, 5)
    } yield {
      val nodes = (0 until len).map(i => s"_:c$i").toVector
      val chain = nodes.zipWithIndex.flatMap { case (n, i) =>
        Vector(
          Triple(n, RDF + "first", item._1, item._2, item._3, item._4, g),
          Triple(n, RDF + "rest",
            if (i == len - 1) "iri" else "bnode",
            if (i == len - 1) RDF + "nil" else nodes(i + 1), "", "", g))
      }
      val head = Triple("http://s/a", "http://p/p", "bnode", nodes.head, "", "", g)
      val extra = extraRef match {
        case 1 => Vector(Triple("http://s/b", "http://p/q", "bnode", nodes.head, "", "", g))
        case 2 if len > 1 => Vector(Triple("http://s/b", "http://p/q", "bnode", nodes(1), "", "", g))
        case 3 => Vector(Triple("http://s/b", "http://p/q", "bnode", nodes.head, "", "", "http://g2/"))
        case 4 => Vector(Triple("http://s/b", nodes.head, "iri", "http://o/x", "", "", g))
        case 5 => Vector(Triple("http://s/b", "http://p/q", "literal", "gv",
          "http://www.w3.org/2001/XMLSchema#string", "", nodes.head))
        case _ => Vector.empty
      }
      chain ++ Vector(head) ++ extra
    }
    // direction-bearing shapes: i18n-datatyped literals and compound-literal
    // bnode clusters (rdf:value/rdf:language/rdf:direction, referenced once)
    val genI18nK: Gen[Triple] = for {
      s <- genTermK
      dt <- Gen.oneOf("https://www.w3.org/ns/i18n#en_rtl",
        "https://www.w3.org/ns/i18n#_ltr", "https://www.w3.org/ns/i18n#de-de_rtl")
      g <- genGraphK
    } yield Triple(s, "http://p/p", "literal", "dtext", dt, "", g)
    val genCompoundK: Gen[Vector[Triple]] = for {
      g <- genGraphK
      withLang <- Gen.oneOf(false, true)
    } yield {
      val cl = "_:cl0"
      Vector(
        Triple("http://s/a", "http://p/q", "bnode", cl, "", "", g),
        Triple(cl, RDF + "value", "literal", "ctext",
          "http://www.w3.org/2001/XMLSchema#string", "", g),
        Triple(cl, RDF + "direction", "literal", "rtl",
          "http://www.w3.org/2001/XMLSchema#string", "", g)) ++
        (if (withLang) Vector(Triple(cl, RDF + "language", "literal", "en",
          "http://www.w3.org/2001/XMLSchema#string", "", g)) else Vector.empty)
    }
    val opts = JsonLdOptions()
    forAll(Gen.zip(Gen.listOfN(8, genTripleK), genChainK, Gen.oneOf(false, true),
      genI18nK, genCompoundK), n = 300) {
      case (noise, chain, useRdfType, i18n, compound) =>
        val optsK = opts.copy(useRdfType = useRdfType)
        val dataset = (noise.toVector ++ chain).distinct
        val back =
          try ToRdf.toRdf(JsonLdApi.fromRdf(dataset, optsK), optsK)
          catch { case e: Throwable =>
            fail(s"round trip threw ${e.getClass.getName}: ${e.getMessage}\ndataset: $dataset") }
        val qIn = BnodeCanon.toCanonicalNQuads(dataset)
        val qBack = BnodeCanon.toCanonicalNQuads(back.distinct)
        assert(qBack == qIn,
          s"toRdf∘fromRdf not identity on a dataset (useRdfType=$useRdfType)\nin:\n$qIn\nback:\n$qBack\ndataset: $dataset")
        // rdfDirection legs: i18n-datatyped + compound-literal shapes must
        // survive the mode that INTERPRETS them (reconstructed to
        // @direction values and re-emitted identically) and the mode that
        // does not (ordinary typed literals / plain bnode clusters)
        for (dirMode <- Seq(None, Some("i18n-datatype"), Some("compound-literal"))) {
          val optsD = JsonLdOptions(rdfDirection = dirMode)
          val datasetD = (dataset :+ i18n) ++ compound
          val backD =
            try ToRdf.toRdf(JsonLdApi.fromRdf(datasetD, optsD), optsD)
            catch { case e: Throwable =>
              fail(s"rdfDirection=$dirMode round trip threw ${e.getClass.getName}: ${e.getMessage}\ndataset: $datasetD") }
          val qInD = BnodeCanon.toCanonicalNQuads(datasetD.distinct)
          val qBackD = BnodeCanon.toCanonicalNQuads(backD.distinct)
          assert(qBackD == qInD,
            s"rdfDirection=$dirMode: toRdf∘fromRdf not identity\nin:\n$qInD\nback:\n$qBackD\ndataset: $datasetD")
        }
        // useNativeTypes rewrites lexical forms: double round trip must be a
        // fixpoint on datasets (mirrors the doc-derived convergence leg)
        val optsN = opts.copy(useNativeTypes = true)
        val datasetN = dataset :+ Triple("http://s/a", "http://p/p", "literal", "007",
          "http://www.w3.org/2001/XMLSchema#integer", "", "")
        val n1 = ToRdf.toRdf(JsonLdApi.fromRdf(datasetN, optsN), optsN)
        val n2 = ToRdf.toRdf(JsonLdApi.fromRdf(n1, optsN), optsN)
        assert(BnodeCanon.toCanonicalNQuads(n2.distinct) == BnodeCanon.toCanonicalNQuads(n1.distinct),
          s"useNativeTypes not convergent on a dataset\ntrip1:\n${BnodeCanon.toCanonicalNQuads(n1.distinct)}\ntrip2:\n${BnodeCanon.toCanonicalNQuads(n2.distinct)}")
    }
  }

  // Deterministic regressions for the two fold-veto gaps the round-5 ADVICE
  // named (reference positions usage tracking never counts): a foldable
  // chain node that is ALSO (a) a predicate in the same graph, or (b) a
  // graph name while chained in the default graph. Pre-fix, (a) folded the
  // chain and left the predicate referencing a vanished label, and (b)
  // removed the default-graph node entry that CARRIED the named graph —
  // dropping the graph's contents entirely.
  test("fromRdf fold veto: chain labels colliding with predicate / graph-name positions") {
    val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    def chain(g: String) = Vector(
      Triple("http://s/a", "http://p/p", "bnode", "_:c0", "", "", g),
      Triple("_:c0", RDF + "first", "literal", "v",
        "http://www.w3.org/2001/XMLSchema#string", "", g),
      Triple("_:c0", RDF + "rest", "iri", RDF + "nil", "", "", g))
    val opts = JsonLdOptions()
    // (a) _:c0 also a predicate in the SAME graph as its chain
    for (g <- Seq("", "http://g/")) {
      val ds = chain(g) :+ Triple("http://s/b", "_:c0", "iri", "http://o/x", "", "", g)
      val back = ToRdf.toRdf(JsonLdApi.fromRdf(ds, opts), opts)
      assert(BnodeCanon.toCanonicalNQuads(back.distinct) == BnodeCanon.toCanonicalNQuads(ds),
        s"predicate-position collision broke identity (g='$g')")
    }
    // (b) _:c0 chained in the DEFAULT graph while also naming a graph
    val dsB = chain("") :+ Triple("http://s/b", "http://p/q", "literal", "gv",
      "http://www.w3.org/2001/XMLSchema#string", "", "_:c0")
    val backB = ToRdf.toRdf(JsonLdApi.fromRdf(dsB, opts), opts)
    assert(BnodeCanon.toCanonicalNQuads(backB.distinct) == BnodeCanon.toCanonicalNQuads(dsB),
      "graph-name collision broke identity (named graph dropped)")
  }

  // --- wave K: canonicalization permutation sweep ---
  // The canonicalizer's core guarantee: isomorphic graphs get identical
  // labels. Generate random bnode graphs — including dense symmetric
  // shapes (uniform-predicate cycles and cliques, where first-degree
  // hashes collide and the WL refinement / tie-breaking paths must do the
  // work) — and assert any label permutation canonicalizes identically,
  // with and without a scope salt.
  test("canonicalization sweep: random label permutations canonicalize identically") {
    val labels = Vector("_:a0", "_:a1", "_:a2", "_:a3", "_:a4", "_:a5")
    val genEdgeC: Gen[Triple] = for {
      si <- Gen.chooseNum(0, labels.size - 1)
      pred <- Gen.oneOf("http://p/e", "http://p/f", "_:a0")
      obj <- Gen.frequency[(String, String, String, String)](
        4 -> Gen.chooseNum(0, labels.size - 1).map(oi => ("bnode", labels(oi), "", "")),
        1 -> Gen.const(("iri", "http://o/x", "", "")),
        1 -> Gen.oneOf("v1", "v2").map(l =>
          ("literal", l, "http://www.w3.org/2001/XMLSchema#string", "")))
      g <- Gen.oneOf("", "", "http://g/", "_:a5")
    } yield Triple(labels(si), pred, obj._1, obj._2, obj._3, obj._4, g)
    // symmetric backbone: a uniform cycle over k nodes (same predicate,
    // same literal decorations) — an automorphic core the random edges
    // then partially break
    val genCycleC: Gen[Vector[Triple]] = for {
      k <- Gen.chooseNum(2, labels.size)
      decorate <- Gen.oneOf(false, true)
    } yield {
      val cyc = (0 until k).map { i =>
        Triple(labels(i), "http://p/next", "bnode", labels((i + 1) % k), "", "", "")
      }.toVector
      if (decorate) cyc ++ (0 until k).map(i =>
        Triple(labels(i), "http://p/tag", "literal", "same",
          "http://www.w3.org/2001/XMLSchema#string", "", "")).toVector
      else cyc
    }
    val rnd = new scala.util.Random(4242)
    forAll(Gen.zip(genCycleC, Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, genEdgeC))), n = 400) {
      case (cycle, edges) =>
        val graph = (cycle ++ edges).distinct
        val perm = rnd.shuffle(labels)
        val mapping = labels.zip(perm).toMap
        def relabel(s: String): String = mapping.getOrElse(s, s)
        val permuted = graph.map(t => t.copy(
          subj = relabel(t.subj), pred = relabel(t.pred),
          objValue = if (t.objKind == "bnode") relabel(t.objValue) else t.objValue,
          graph = relabel(t.graph)))
        assert(BnodeCanon.toCanonicalNQuads(graph) == BnodeCanon.toCanonicalNQuads(permuted),
          s"canonical labels depend on input label names\ngraph: $graph\nperm: $mapping")
        val c1 = BnodeCanon.canonicalize(graph, scopeSalt = "s1")
        val c2 = BnodeCanon.canonicalize(permuted, scopeSalt = "s1")
        assert(c1.toSet == c2.toSet,
          s"salted canonicalization depends on input label names\ngraph: $graph\nperm: $mapping")
    }
  }

  test("expansion is idempotent: expand(expand(x)) == expand(x)") {
    forAll(genDoc) { doc =>
      val opts = JsonLdOptions(base = Some("http://base/doc"))
      val once = JsonLdApi.expand(JsonLdInput.Doc(doc), opts)
      val twice = JsonLdApi.expand(JsonLdInput.Doc(once.deepCopy.asInstanceOf[JArr]), opts)
      assert(JsonEq.jsonLdEq(once, twice), s"\nonce:  $once\ntwice: $twice")
    }
  }

  test("json round-trip: parse(write(x)) jsonLdEq x") {
    forAll(genJson(3)) { v =>
      val back = JsonParser.parse(JsonWriter.write(v))
      assert(JsonEq.jsonLdEq(v, back))
    }
  }

  test("addValue accumulates every value exactly once") {
    forAll(Gen.listOfN(6, genScalar)) { vs =>
      val o = new JObj()
      vs.foreach(v => Util.addValue(o, "k", v, asArray = true))
      val arr = o.get("k").get.asArr.get
      assert(arr.size == vs.size)
      assert(arr.toVector == vs.toVector)
    }
  }

  test("container parse round-trips the 17 valid container shapes") {
    val valid = Seq(
      Seq("@list") -> Container.list,
      Seq("@set") -> Container.set,
      Seq("@graph") -> Container.graph,
      Seq("@graph", "@set") -> Container.setGraph,
      Seq("@id") -> Container.id,
      Seq("@index") -> Container.index,
      Seq("@id", "@set") -> Container.ids,
      Seq("@index", "@set") -> Container.indexes,
      Seq("@graph", "@id") -> Container.idGraph,
      Seq("@graph", "@index") -> Container.indexGraph,
      Seq("@graph", "@id", "@set") -> Container.idsGraph,
      Seq("@graph", "@index", "@set") -> Container.indexesGraph,
      Seq("@language") -> Container.language,
      Seq("@type") -> Container.typ,
      Seq("@language", "@set") -> Container.languages,
      Seq("@type", "@set") -> Container.types)
    for ((input, expected) <- valid) {
      assert(Container.parse(input) == expected, input.toString)
      // order-insensitive
      assert(Container.parse(input.reverse) == expected, input.reverse.toString)
    }
    for (bad <- Seq(Seq("@list", "@set"), Seq("@graph", "@language"), Seq("@foo"), Seq.empty[String], Seq("@id", "@index")))
      intercept[JsonLdError](Container.parse(bad))
  }

  test("TermKey ordering: shortest-first then lexicographic (/root/reference/src/lib.rs:126-131)") {
    forAll(Gen.listOf(Gen.alphaNumStr)) { keys =>
      val sorted = keys.sorted(TermKeyOrdering)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.length < b.length || (a.length == b.length && a <= b))
        case _ =>
      }
    }
  }

  test("URL resolution: RFC 3986 §5.4 normal + abnormal examples") {
    val base = Url.parse("http://a/b/c/d;p?q").get
    val cases = Seq(
      "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g", "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g", "?y" -> "http://a/b/c/d;p?y", "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s", "g#s" -> "http://a/b/c/g#s", ";x" -> "http://a/b/c/;x",
      "" -> "http://a/b/c/d;p?q", "." -> "http://a/b/c/", "./" -> "http://a/b/c/",
      ".." -> "http://a/b/", "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/", "../../g" -> "http://a/g",
      "../../../g" -> "http://a/g", "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g", "/../g" -> "http://a/g", "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g", "g.." -> "http://a/b/c/g..", "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g", "./g/." -> "http://a/b/c/g/", "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h", "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y")
    for ((ref, expected) <- cases)
      assert(Url.resolve(ref, Some(base)).map(_.serialize).contains(expected), s"ref=$ref")
  }

  test("fastParse agrees with the general parser on every shape (accepted AND bailed)") {
    val genScheme = Gen.oneOf("http", "https", "ftp", "ws", "urn", "ex", "HTTP", "a+b")
    val genHost = Gen.oneOf("graft.example", "h", "Example.COM", "h:8080", "u@h", "[::1]", "127.0.0.1", "")
    val genPath = Gen.oneOf("", "/", "/doc/doc-000000000042/span/3", "/a/b", "/a/./b", "/../x", "/p.q/r", "//double", "/UPPER/Case")
    val genTail = Gen.oneOf("", "?q=1", "#frag", "?q#f", "#f?q", "?", "#")
    val genUrl = for {
      s <- genScheme; h <- genHost; p <- genPath; t <- genTail
      sep <- Gen.oneOf("://", ":", ":/")
    } yield s + sep + h + p + t
    forAll(genUrl, n = 300) { u =>
      assert(Url.parse(u) == Url.parseGeneral(u), s"input=$u")
    }
    // targeted shapes around the fast-path boundaries
    for (u <- Seq(
      "http://graft.example/doc/doc-000000000001/span/7",
      "http://graft.example/ns#hasMedia", "http://graft.example/entity/Spark",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
      "http://h", "http://h/", "http://h?q", "http://h#f", "http://h/p?", "http://h/p#",
      "http://h/p?a?b#c#d", "http://h/p.x", "http://h./p", "http://h:80/p", "http://H/p",
      " http://h/p", "http://h/p ", "mailto:a@b", "urn:x:y", "_:b0", "rel/ative", ""))
      assert(Url.parse(u) == Url.parseGeneral(u), s"input=$u")
  }

  test("JObj behaves as an insertion-ordered map across the flat/spill boundary (model test)") {
    // model: java LinkedHashMap (the previous backing implementation).
    // Random op sequences crossing the 8-key spill threshold must agree on
    // iteration order, lookups, and size at every step.
    val keys = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l")
    val genOp: Gen[(Int, Int)] = Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(0, keys.size - 1))
    forAll(Gen.listOfN(60, genOp), n = 80) { ops =>
      val sut = new JObj()
      val model = new java.util.LinkedHashMap[String, JsonValue]()
      var step = 0
      for ((op, ki) <- ops) {
        val k = keys(ki)
        op match {
          case 0 | 1 => // put (twice as likely as remove)
            val v = JNum(step.toDouble)
            sut.put(k, v); model.put(k, v)
          case 2 =>
            val a = sut.removeKey(k)
            val b = Option(model.remove(k))
            assert(a == b, s"removeKey($k) mismatch at step $step")
        }
        step += 1
        assert(sut.size == model.size)
        assert(sut.contains(k) == model.containsKey(k))
        locally {
          import scala.jdk.CollectionConverters._
          val m = model.entrySet.iterator.asScala.map(e => (e.getKey, e.getValue)).toVector
          assert(sut.iterator.toVector == m,
            s"order diverged after step ${step - 1} op=$op key=$k ops=${ops.take(step).map { case (o, j) => s"$o:${keys(j)}" }.mkString(" ")}")
        }
      }
      import scala.jdk.CollectionConverters._
      val modelEntries = model.entrySet.iterator.asScala.map(e => (e.getKey, e.getValue)).toVector
      assert(sut.iterator.toVector == modelEntries, "iteration order diverged")
      assert(sut.keyArray.toVector == modelEntries.map(_._1))
      assert(sut.sortedEntries == modelEntries.sortBy(_._1))
      for (k <- keys) assert(sut.get(k) == Option(model.get(k)))
    }
  }

  test("FastJson ≡ Jackson on every vendored fixture (tree + key order)") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/test/resources/w3c")
    val files = Files.walk(root).iterator.asScala
      .filter(p => { val s = p.toString; s.endsWith(".jsonld") || s.endsWith(".json") })
      .toVector
    assert(files.size > 100, "fixture corpus unexpectedly small")
    for (f <- files) {
      val s = new String(Files.readAllBytes(f), "UTF-8")
      val fast = FastJson.parse(s)
      val jack = JsonParser.parseJackson(s)
      // serialized comparison: JsonWriter iterates insertion order, so this
      // checks values AND key order, not just order-insensitive equality
      assert(JsonWriter.write(fast) == JsonWriter.write(jack), s"parser divergence on $f")
    }
  }

  test("FastJson ≡ Jackson on generated documents and escape-heavy strings") {
    val genTree = genJson(3)
    forAll(genTree, n = 200) { v =>
      val s = JsonWriter.write(v)
      assert(JsonWriter.write(FastJson.parse(s)) == JsonWriter.write(JsonParser.parseJackson(s)), s"input=$s")
    }
    for (s <- Seq(
      """"a\"b\\c\/d\b\f\n\r\te"""", """"\u0041\u00e9\u4e2d\ud83d\ude00"""",
      """"\ud800"""", """{"k\u0041":1}""", "\"\\u0000\"",
      """[0,-0,1e5,1E+5,1e-5,0.5,-0.25,123456789012345678901234567890,1e999,-1e999]""",
      "[0.1,2.5e-308,1.7976931348623157e308]",
      "{\"a\":1,\"a\":2}", "[[[[[1]]]]]", "  {\"a\" : [ 1 , 2 ] }  ", "\"\""))
      assert(JsonWriter.write(FastJson.parse(s)) == JsonWriter.write(JsonParser.parseJackson(s)), s"input=$s")
  }

  test("FastJson depth cap: hostile nesting fails cleanly, legal nesting parses") {
    def nestedArr(d: Int) = "[" * d + "1" + "]" * d
    def nestedObj(d: Int) = "{\"k\":" * d + "1" + "}" * d
    assert(FastJson.parse(nestedArr(FastJson.MaxDepth)) != null)
    assert(FastJson.parse(nestedObj(FastJson.MaxDepth - 1)) != null)
    for (bad <- Seq(nestedArr(FastJson.MaxDepth + 1), nestedObj(FastJson.MaxDepth + 1), nestedArr(100000))) {
      val e = intercept[IllegalArgumentException](FastJson.parse(bad))
      assert(e.getMessage.contains("nesting too deep"))
    }
    // siblings at legal depth do not accumulate (depth is per-branch)
    assert(FastJson.parse(("[" + nestedArr(FastJson.MaxDepth - 1) + "," + nestedArr(FastJson.MaxDepth - 1) + "]")) != null)
  }

  test("FastJson rejects what strict JSON rejects") {
    for (bad <- Seq(
      "", "   ", "{\"a\":1,}", "[1,]", "[,1]", "[1 2]", "\"unterminated", "01", "1.", ".5", "+1",
      "{a:1}", "{\"a\" 1}", "{\"a\":}", "nul", "tru", "falsee{", "{\"a\":1}x", "-", "1e", "1e+",
      "\"\\u12\"", "\"\\q\"", "\"raw\ncontrol\"", "{", "[", "{\"a\"", "()", "'single'"))
      assert(
        (try { FastJson.parse(bad); false } catch { case _: Exception => true }),
        s"FastJson accepted malformed input: $bad")
  }

  test("fastValid accepts exactly when the general parser accepts AND fastParse would") {
    // fastValid is the zero-alloc acceptance scan used by isIri: it must
    // never accept anything the general parser rejects, and must stay in
    // lock-step with fastParse's acceptance set.
    val genScheme = Gen.oneOf("http", "https", "ftp", "ws", "urn", "ex", "HTTP", "a+b")
    val genHost = Gen.oneOf("graft.example", "h", "Example.COM", "h:8080", "u@h", "[::1]", "127.0.0.1", "")
    val genPath = Gen.oneOf("", "/", "/doc/doc-000000000042/span/3", "/a/b", "/a/./b", "/../x", "/p.q/r", "//double", "/UPPER/Case")
    val genTail = Gen.oneOf("", "?q=1", "#frag", "?q#f", "#f?q", "?", "#")
    val genUrl = for {
      s <- genScheme; h <- genHost; p <- genPath; t <- genTail
      sep <- Gen.oneOf("://", ":", ":/")
    } yield s + sep + h + p + t
    forAll(genUrl, n = 300) { u =>
      if (Url.fastValid(u)) assert(Url.parseGeneral(u).isDefined, s"fastValid accepted, general rejected: $u")
    }
    for (u <- Seq(
      "http://graft.example/doc/doc-000000000001/span/7",
      "http://graft.example/ns#hasMedia", "http://h", "http://h/", "http://h?q",
      "http://h/p?a?b#c#d", "http://h/p.x", "http://h:80/p", "http://H/p",
      " http://h/p", "http://h/p ", "mailto:a@b", "urn:x:y", "_:b0", "rel/ative", ""))
      assert(Url.fastValid(u) == Url.parseGeneral(u).isDefined || !Url.fastValid(u), s"input=$u")
  }

  test("makeRelative matches url-crate make_relative (incl. the leading-empty-segment case)") {
    def rel(base: String, target: String): Option[String] =
      Url.parse(base).get.makeRelative(Url.parse(target).get)
    // regression: "" splits to one empty segment, not zero — without the
    // cancelling leading segments this rendered "a" instead of "../a"
    assert(rel("http://example.org/t/f.jsonld", "http://example.org/a").contains("../a"))
    assert(rel("http://h/a/b/c", "http://h/a/b/d").contains("d"))
    assert(rel("http://h/a/b/c", "http://h/a/x/y").contains("../x/y"))
    assert(rel("http://h/a/b/c", "http://h/a/b/c").contains(""))
    assert(rel("http://h/p/f", "http://h/p/f?q=1").contains("?q=1"))
    assert(rel("http://h/p/f", "http://h/p/f#frag").contains("#frag"))
    assert(rel("http://h/a", "http://h/a/b/c").contains("a/b/c"))
    assert(rel("http://h/x", "https://h/x").isEmpty) // scheme mismatch
    assert(rel("http://h1/x", "http://h2/x").isEmpty) // authority mismatch
  }

  test("isIri matches the url-crate acceptance shape") {
    assert(Iri.isIri("http://example.com/x"))
    assert(Iri.isIri("ex:foo")) // any valid scheme parses
    assert(Iri.isIri("urn:a:b"))
    assert(!Iri.isIri("foo")) // relative → error
    assert(!Iri.isIri("_:b0")) // scheme must start with a letter
    assert(!Iri.isIri("http://")) // special scheme needs a host
    assert(!Iri.isIri("1http://x/"))
  }

  test("canonicalization: isomorphic bnode graphs get identical labels, regardless of input label names") {
    def graph(a: String, b: String) = Vector(
      Triple(a, "http://p/knows", "bnode", b, "", "", ""),
      Triple(b, "http://p/knows", "bnode", a, "", "", ""),
      Triple(a, "http://p/name", "literal", "x", ToRdf.XsdString, "", ""))
    val g1 = BnodeCanon.canonicalize(graph("_:alpha", "_:beta"))
    val g2 = BnodeCanon.canonicalize(graph("_:n1", "_:n2"))
    assert(BnodeCanon.toCanonicalNQuads(g1) == BnodeCanon.toCanonicalNQuads(g2))
    assert(g1.toSet == g2.toSet)
  }

  test("jcsNumber: ECMAScript Number::toString table (RFC 8785 §appendix; ECMA-262 §7.1.12.1)") {
    // hand-derived from the ECMAScript algorithm; several are the published
    // JCS test vectors. Java's Double.toString gets every exponential case
    // wrong ("1.0E22"), which is why the formatter exists.
    val table = Seq(
      0.0 -> "0", -0.0 -> "0",
      1.0 -> "1", -1.0 -> "-1",
      0.5 -> "0.5", -0.5 -> "-0.5",
      123.45 -> "123.45",
      1e15 -> "1000000000000000",
      1e16 -> "10000000000000000",          // beyond 2^53: still decimal notation
      1e21 -> "1e+21",                       // first exponential magnitude
      1e22 -> "1e+22",
      2.5e22 -> "2.5e+22",
      1e-6 -> "0.000001",                    // last decimal magnitude
      1e-7 -> "1e-7",
      1.5e-7 -> "1.5e-7",
      0.002 -> "0.002",
      0.30000000000000004 -> "0.30000000000000004", // 17-digit shortest repr
      5e-324 -> "5e-324",                    // min subnormal (shortest repr, not Java's "4.9E-324")
      1.7976931348623157e308 -> "1.7976931348623157e+308") // max double
    for ((n, expected) <- table)
      assert(ToRdf.jcsNumber(n) == expected, s"jcsNumber($n)")
    // canonicalJson routes non-whole / huge numbers through jcsNumber
    assert(ToRdf.canonicalJson(JNum(1e22)) == "1e+22")
    assert(ToRdf.canonicalJson(JNum(1e16)) == "10000000000000000")
    assert(ToRdf.canonicalJson(JNum(3.0)) == "3")
  }
}
