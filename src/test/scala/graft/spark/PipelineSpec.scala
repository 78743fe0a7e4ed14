package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{JsonLdOptions, Triple, BnodeCanon}

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("synthetic generator is deterministic and satisfies the span invariant") {
    val d1 = SyntheticDocs.generateDoc(7L)
    val d2 = SyntheticDocs.generateDoc(7L)
    assert(d1 == d2)
    assert(d1.spans.map(_.offset) == d1.spans.map(_.offset).sorted)
    assert(d1.spans.map(_.offset).distinct.size == d1.spans.size)
  }

  test("expandDoc emits triples for every jsonld/media span family and no errors on the synthetic corpus") {
    val loader = RemoteContextPool.fullLoader
    var triples = 0
    var errors = 0
    (0L until 200L).foreach { i =>
      val (ts, es) = ExpandStage.expandDoc(SyntheticDocs.generateDoc(i), loader, JsonLdOptions(), ExpandStage.aliasDictionary)
      triples += ts.size
      errors += es.size
    }
    assert(errors == 0, s"expansion errors on synthetic corpus: $errors")
    assert(triples > 500)
  }

  test("hostile deeply-nested span lands in the error channel; the rest of the doc survives") {
    val loader = RemoteContextPool.fullLoader
    val hostile = "[" * 100000 + "1" + "]" * 100000
    val doc = Doc("doc-hostile", Vector(
      Span("jsonld", hostile, null, 10),
      Span("jsonld", """{"@context":{"@vocab":"http://v/"},"@id":"http://e/a","p":"ok"}""", null, 20)))
    val (ts, es) = ExpandStage.expandDoc(doc, loader, JsonLdOptions(), ExpandStage.aliasDictionary)
    assert(es.size == 1 && es.head.span_offset == 10, s"errors: $es")
    assert(ts.exists(t => t.obj_value == "ok"), "healthy span in the same doc must still expand")
  }

  test("end-to-end: generate → expand → materialize → finalize, with lineage") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val docs = SyntheticDocs.generate(spark, 300, 4)
    val report = Materialize.run(docs, out, buckets = 4)
    assert(report.processed == 4 && report.skipped == 0)
    assert(report.triples > 300)
    val graph = Materialize.finalizeGraph(spark, out)
    assert(graph.count() > 0)
    // rdf:type hot predicate present (skew knob)
    val preds = Canonicalize.predicateCounts(spark.read.parquet(s"$out/triples").as[TripleRow]).collect()
    assert(preds.exists(_.getString(0) == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"))
    // lineage: one row per bucket, all done
    val lineage = spark.read.parquet(s"$out/lineage")
    assert(lineage.filter(col("status") === "done").count() == 4)
  }

  test("resume skips completed buckets and reaches the same graph") {
    val out1 = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft-full").toString
    val docs = SyntheticDocs.generate(spark, 200, 4)
    // crash at bucket 2
    intercept[RuntimeException] { Materialize.run(docs, out1, buckets = 4, failAtBucket = Some(2)) }
    val resumed = Materialize.run(docs, out1, buckets = 4)
    assert(resumed.skipped == 2 && resumed.processed == 2)
    val full = Materialize.run(docs, out2, buckets = 4)
    val g1 = Materialize.finalizeGraph(spark, out1).drop("first_doc").orderBy("subj", "pred", "obj_value").collect()
    val g2 = Materialize.finalizeGraph(spark, out2).drop("first_doc").orderBy("subj", "pred", "obj_value").collect()
    assert(g1.toSeq == g2.toSeq)
    // attempts: resumed buckets recorded attempt 1 (first completion)
    val lineage = spark.read.parquet(s"$out1/lineage")
    assert(lineage.count() == 4)
  }

  test("distributed canonicalization (iterative joins) is deterministic, complete, and structure-preserving") {
    import spark.implicits._
    def mk(doc: String): Seq[TripleRow] = Seq(
      TripleRow("_:b0", "http://p/knows", "bnode", "_:b1", "", "", "", doc),
      TripleRow("_:b1", "http://p/name", "literal", "x", "http://www.w3.org/2001/XMLSchema#string", "", "", doc),
      TripleRow(s"http://s/$doc", "http://p/root", "bnode", "_:b0", "", "", "", doc))
    val raw = spark.createDataset(mk("d1") ++ mk("d2"))
    val out = Canonicalize.global(raw, rounds = 3, scoped = true).as[TripleRow].collect().toVector
    assert(!out.exists(t => t.subj.startsWith("_:b") || (t.obj_kind == "bnode" && t.obj_value.startsWith("_:b"))))
    // doc-scoped: same structure in different docs → different labels
    val d1Labels = out.filter(_.doc_id == "d1").flatMap(t => Seq(t.subj, t.obj_value)).filter(_.startsWith("_:")).toSet
    val d2Labels = out.filter(_.doc_id == "d2").flatMap(t => Seq(t.subj, t.obj_value)).filter(_.startsWith("_:")).toSet
    assert(d1Labels.intersect(d2Labels).isEmpty)
    assert(d1Labels.size == 2 && d2Labels.size == 2)
    // determinism
    val out2 = Canonicalize.global(raw, rounds = 3, scoped = true).as[TripleRow].collect().toVector
    assert(out.sortBy(_.toString) == out2.sortBy(_.toString))
    // global scope: identical structures merge to identical labels
    val merged = Canonicalize.global(raw, rounds = 3, scoped = false).as[TripleRow].collect().toVector
    def anon(s: String) = if (s.startsWith("http://s/")) "S" else s
    val m1 = merged.filter(_.doc_id == "d1").map(t => (anon(t.subj), t.pred, t.obj_value)).toSet
    val m2 = merged.filter(_.doc_id == "d2").map(t => (anon(t.subj), t.pred, t.obj_value)).toSet
    assert(m1 == m2)
  }

  test("relabel-role pruning: subj-only output matches the full run on every pass-through column") {
    import spark.implicits._
    // mix of bnode subjects/objects/graphs so every relabel role is exercised
    val raw = spark.createDataset(Seq(
      TripleRow("_:b0", "http://p/knows", "bnode", "_:b1", "", "", "_:g0", "d1"),
      TripleRow("_:b1", "http://p/name", "literal", "x", "http://www.w3.org/2001/XMLSchema#string", "", "", "d1"),
      TripleRow("http://s/d1", "http://p/root", "bnode", "_:b0", "", "", "", "d1"),
      TripleRow("_:b0", "http://p/knows", "bnode", "_:b1", "", "", "", "d2"),
      TripleRow("http://s/iri", "http://p/plain", "literal", "y", "", "", "", "d3")))
    val full = Canonicalize.global(raw, rounds = 3, scoped = true).as[TripleRow].collect().toVector
    val subjOnly = Canonicalize.global(raw, rounds = 3, scoped = true, relabelRoles = Set("subj"))
      .as[TripleRow].collect().toVector
    assert(subjOnly.size == full.size, "role pruning must be non-expanding (labeled is unique per node)")
    // subj + every non-relabeled column identical to the full run; obj/graph
    // keep their ORIGINAL labels in the pruned run
    def key(t: TripleRow) = (t.subj, t.pred, t.obj_kind, t.obj_datatype, t.obj_lang, t.doc_id)
    assert(subjOnly.map(key).sorted == full.map(key).sorted)
    assert(subjOnly.count(_.obj_value.startsWith("_:b")) == raw.collect().count(_.obj_kind == "bnode"))
    assert(full.count(_.obj_value.startsWith("_:b")) == 0)
    // the j02 invariants are bit-identical: per-pred row counts and
    // distinct-subject counts
    def agg(ts: Vector[TripleRow]) =
      ts.groupBy(_.pred).map { case (p, rows) => (p, rows.size, rows.map(_.subj).distinct.size) }.toSet
    assert(agg(subjOnly) == agg(full))
  }

  test("distributed canonicalization: automorphic bnodes get distinct deterministic labels") {
    import spark.implicits._
    // _:a and _:b are structurally indistinguishable (automorphic pair)
    val raw = spark.createDataset(Seq(
      TripleRow("http://s/", "http://p/x", "bnode", "_:a", "", "", "", "d1"),
      TripleRow("http://s/", "http://p/x", "bnode", "_:b", "", "", "", "d1"),
      TripleRow("_:a", "http://p/q", "literal", "v", "", "", "", "d1"),
      TripleRow("_:b", "http://p/q", "literal", "v", "", "", "", "d1")))
    val out1 = Canonicalize.global(raw, rounds = 2, scoped = true).as[TripleRow].collect().toVector
    val labels = out1.filter(_.obj_kind == "bnode").map(_.obj_value).toSet
    assert(labels.size == 2, s"automorphic bnodes must stay distinct: $labels")
    assert(labels.forall(_.startsWith("_:c")))
    val out2 = Canonicalize.global(raw, rounds = 2, scoped = true).as[TripleRow].collect().toVector
    assert(out1.sortBy(_.toString) == out2.sortBy(_.toString))
    // the local canonicalizer also keeps them distinct
    val local = graft.core.BnodeCanon.canonicalize(Vector(
      graft.core.Triple("http://s/", "http://p/x", "bnode", "_:a", "", "", ""),
      graft.core.Triple("http://s/", "http://p/x", "bnode", "_:b", "", "", ""),
      graft.core.Triple("_:a", "http://p/q", "literal", "v", "", "", ""),
      graft.core.Triple("_:b", "http://p/q", "literal", "v", "", "", "")), scopeSalt = "d1")
    assert(local.filter(_.objKind == "bnode").map(_.objValue).toSet.size == 2)
  }

  test("deep-bnode corpus forces WL refinement to iterate (2 rounds) and stays bijective") {
    import spark.implicits._
    val ctxB = spark.sparkContext.broadcast(RemoteContextPool.pool)
    val docs = SyntheticDocs.generateDeepBnodes(spark, 30, 4)
    val triples = ExpandStage.triples(ExpandStage.run(docs, ctxB)).cache()
    val inRows = triples.collect().toVector
    assert(inRows.nonEmpty)
    val (canonDf, rounds) = Canonicalize.globalWithRounds(triples, rounds = 3, scoped = true)
    // the chains collide on first-degree AND first-neighbor signatures:
    // exactly two neighbor-hash rounds must run before full separation
    assert(rounds == 2, s"expected 2 WL refinement rounds on the deep corpus, got $rounds")
    val out = canonDf.as[TripleRow].collect().toVector
    assert(out.size == inRows.size)
    // bijective per doc: same number of distinct bnode labels before and after
    def bnodeCount(rows: Vector[TripleRow]) = rows.groupBy(_.doc_id).view.mapValues { ts =>
      ts.flatMap(t => Seq(t.subj, if (t.obj_kind == "bnode") t.obj_value else null))
        .filter(s => s != null && s.startsWith("_:")).toSet.size
    }.toMap
    assert(bnodeCount(out) == bnodeCount(inRows))
    // determinism across runs
    val out2 = Canonicalize.globalWithRounds(triples, rounds = 3, scoped = true)._1
      .as[TripleRow].collect().toVector
    assert(out.sortBy(_.toString) == out2.sortBy(_.toString))
    // context: how many rounds the DEFAULT corpus needs (informational — the
    // deep corpus above is the pinned refinement exercise)
    val flat = ExpandStage.triples(ExpandStage.run(SyntheticDocs.generate(spark, 50, 4), ctxB))
    info(s"default-corpus refinement rounds: ${Canonicalize.globalWithRounds(flat, rounds = 3, scoped = true)._2}")
    triples.unpersist()
  }

  test("j12 pin: canonical labelset hash of the fixed deep-bnode corpus matches SparkEntry's constants") {
    // re-derives the j12 constants from the same code path the query runs:
    // 120-doc deep-bnode corpus → expand → scoped canonicalization →
    // order-independent sum of per-row xxhash64. Any label-assignment change
    // (hash inputs, tie-break, scope seeding, refinement depth) moves the
    // hash — this test names the new value so the pin can be consciously
    // re-derived, while the j12 query itself just empties at verify time.
    val row = graft.SparkEntry.j12LabelsetSummary(spark).head()
    val (n, h) = (row.getLong(0), BigDecimal(row.getDecimal(1)))
    info(s"deep-bnode 120-doc canonical pin: n_triples=$n labelset_hash=$h")
    assert(n == graft.SparkEntry.J12ExpectedTriples,
      s"triple count drifted: got $n, pinned ${graft.SparkEntry.J12ExpectedTriples}")
    assert(h == graft.SparkEntry.J12ExpectedHash,
      s"canonical labelset hash drifted: got $h, pinned ${graft.SparkEntry.J12ExpectedHash}")
  }

  test("span-sequence invariant: pipeline output preserves (kind,text,media_ref,order) per doc") {
    import spark.implicits._
    val docs = SyntheticDocs.generate(spark, 100, 4).cache()
    // the pipeline never mutates docs; verify the round-trip through parquet
    val out = java.nio.file.Files.createTempDirectory("graft-inv").toString
    docs.write.parquet(s"$out/docs")
    val back = spark.read.parquet(s"$out/docs").as[Doc]
    val orig = docs.collect().map(d => d.doc_id -> d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))).toMap
    val rt = back.collect().map(d => d.doc_id -> d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))).toMap
    assert(orig == rt)
  }

  test("distributed canonicalization is a valid bijective relabeling on every toRdf fixture") {
    // canonical N-Quads are invariant under any BIJECTIVE bnode relabeling —
    // so Canonicalize.global (doc-scoped iterative joins) must leave
    // BnodeCanon.toCanonicalNQuads unchanged per fixture. A label collision
    // (merging distinct bnodes) or a scope mix-up breaks the equality.
    import spark.implicits._
    import graft.core.{BnodeCanon, Triple}
    val dir = java.nio.file.Paths.get("src/test/resources/w3c/toRdf")
    import scala.jdk.CollectionConverters._
    val fixtures = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith("-out.nq")).toVector.sorted
      .map { f =>
        val id = f.stripSuffix("-out.nq")
        id -> BnodeCanon.parseNQuads(new String(
          java.nio.file.Files.readAllBytes(dir.resolve(f)), "UTF-8"))
      }
      .filter(_._2.exists(t => t.subj.startsWith("_:") || t.objKind == "bnode" || t.graph.startsWith("_:")))
    assert(fixtures.nonEmpty, "expected bnode-bearing toRdf fixtures")
    val rows = fixtures.flatMap { case (id, ts) =>
      ts.map(t => TripleRow(t.subj, t.pred, t.objKind, t.objValue, t.objDatatype, t.objLang, t.graph, id))
    }
    val relabeled = Canonicalize.global(rows.toDS(), rounds = 3, scoped = true)
      .select("doc_id", "subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang", "graph")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.toVector.map(r =>
        Triple(r.getString(1), r.getString(2), r.getString(3), r.getString(4),
          r.getString(5), r.getString(6), r.getString(7)))).toMap
    fixtures.foreach { case (id, original) =>
      val canonOrig = BnodeCanon.toCanonicalNQuads(original)
      val canonRelabeled = BnodeCanon.toCanonicalNQuads(relabeled(id))
      assert(canonOrig == canonRelabeled,
        s"fixture $id: distributed relabeling changed the canonical graph\norig:\n$canonOrig\nrelabeled:\n$canonRelabeled")
    }
  }

  test("j09 compact roundtrip holds for EVERY doc that has a jsonld span (not just most)") {
    import spark.implicits._
    // j09 filters to docs whose spans ALL roundtrip; if compaction lost
    // information anywhere, its row count would drop below the number of
    // docs that have a jsonld span at all
    val surviving = graft.SparkEntry.queries("j09_compact_roundtrip")(spark, "/root/testdata/sf0.001").count()
    val withJsonld = SyntheticDocs.generate(spark, 500L, 8)
      .filter(_.spans.exists(_.kind == "jsonld")).count()
    assert(withJsonld > 300, s"corpus shape changed: only $withJsonld/500 docs with jsonld spans")
    assert(surviving == withJsonld,
      s"compact∘expand roundtrip failed on ${withJsonld - surviving} of $withJsonld docs")
  }
}
