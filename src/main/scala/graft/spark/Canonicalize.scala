package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** URDNA2015-style blank-node labeling expressed as iterative DataFrame
  * joins (north_rule): the distributed formulation of
  * graft.core.BnodeCanon for corpora where blank nodes span rows.
  *
  * Shape per round (hash refinement / color refinement):
  *   edges ⋈ hashes(on subj bnode) ⋈ hashes(on obj bnode) →
  *   groupBy(node) over sort_array(collect_list(signature)) → sha2.
  * All joins are equi-joins on the bnode key — well-distributed (bnode ids
  * are hashes), so no salting needed here; AQE handles residual skew. Only
  * the bnode-adjacent subgraph participates: the first `filter` keeps the
  * shuffled volume proportional to bnode density, not corpus size.
  *
  * The fixpoint is driver-orchestrated (Catalyst has no iteration); each
  * round is checkpoint-friendly (localCheckpoint) to cut lineage — the
  * ICDE-2016 iterative-dataflow pattern (PAPERS.md).
  */
object Canonicalize {

  /** Relabel `_:` ids in `triples`. `scoped` = true keys bnodes by
    * (doc_id, label) — doc-local bnode spaces; false = one global space.
    */
  def global(triples: Dataset[TripleRow], rounds: Int = 3, scoped: Boolean = true): DataFrame =
    globalWithRounds(triples, rounds, scoped)._1

  /** [[global]], additionally reporting how many WL refinement rounds
    * actually ran (0 when first-degree signatures separate every bnode — the
    * overwhelmingly common doc-scoped case; > 0 when signature collisions
    * forced neighbor-hash refinement). The count is known eagerly: the
    * fixpoint loop is driver-orchestrated, so it has executed by the time
    * this returns. j11 uses it as a self-check that its corpus really
    * exercises the refinement path.
    */
  def globalWithRounds(triples: Dataset[TripleRow], rounds: Int = 3, scoped: Boolean = true): (DataFrame, Int) = {
    val spark = triples.sparkSession
    import spark.implicits._
    val t = triples.toDF()
    val scopeCol = if (scoped) col("doc_id") else lit("")

    // Materialize the keyed triples ONCE: they are read again by the final
    // relabel joins (and the bnode-presence probe), and `triples` is usually
    // an un-cached expand pipeline — without this the full expansion re-runs
    // per consumer (measured: j02 paid the expand 2-3×). In the production
    // materializer the equivalent durable step is the staged parquet table;
    // localCheckpoint is the single-box query-shaped analog.
    val withKeys = t
      .withColumn("subj_key", when(col("subj").startsWith("_:"), concat(scopeCol, lit("|"), col("subj"))))
      .withColumn("obj_key", when(col("obj_kind") === "bnode", concat(scopeCol, lit("|"), col("obj_value"))))
      .withColumn("graph_key", when(col("graph").startsWith("_:"), concat(scopeCol, lit("|"), col("graph"))))
      .localCheckpoint(false)

    // hash-side dedup: labels must depend on the quad SET — a document
    // repeating an identical value emits the same triple twice, and the
    // duplicate signature would hash the same graph to different labels
    // than its deduplicated equivalent (mirrors BnodeCanon.canonicalize;
    // the relabel joins below still run over the un-deduped withKeys, so
    // output rows and counts are untouched). One extra exchange over the
    // bnode-adjacent subset only.
    val bnodeTriples = withKeys.filter(col("subj_key").isNotNull || col("obj_key").isNotNull || col("graph_key").isNotNull)
      .dropDuplicates()
    if (bnodeTriples.isEmpty) return (withKeys.drop("subj_key", "obj_key", "graph_key"), 0)

    // directed incidence list: one row per (bnode, role) occurrence
    val objSig = concat_ws("", col("obj_kind"), col("obj_value"), col("obj_datatype"), col("obj_lang"))
    val inc = bnodeTriples.select(
      explode(array(
        struct(col("subj_key").as("node"), lit("s").as("role"), col("pred"),
          when(col("obj_key").isNotNull, lit(null).cast("string")).otherwise(objSig).as("other_lit"),
          col("obj_key").as("other_node"),
          when(col("graph_key").isNotNull, lit("_")).otherwise(col("graph")).as("g")),
        struct(col("obj_key").as("node"), lit("o").as("role"), col("pred"),
          when(col("subj_key").isNotNull, lit(null).cast("string")).otherwise(col("subj")).as("other_lit"),
          col("subj_key").as("other_node"),
          when(col("graph_key").isNotNull, lit("_")).otherwise(col("graph")).as("g")),
        struct(col("graph_key").as("node"), lit("g").as("role"), col("pred"),
          lit(null).cast("string").as("other_lit"), lit(null).cast("string").as("other_node"),
          lit("").as("g"))
      )).as("e"))
      .select("e.*")
      .filter(col("node").isNotNull)
    // NOT checkpointed: in the overwhelmingly common fixpoint-skip case the
    // incidence list is consumed exactly once (round-0 hashes), so
    // materializing it is pure cost — a full extra write+read of the
    // bnode-adjacent corpus at scale; when refinement rounds do run, each
    // recomputes a cheap explode+filter over the ALREADY-checkpointed keyed
    // triples instead. (Local sf0.1 wall time moves only ~5% — within host
    // drift — but the saved materialization is real at 100 TB.)

    // Scope-seeded node hash: the node key is "<scope>|<label>", and folding
    // the scope prefix into every hash separates structurally-identical
    // bnodes from DIFFERENT scopes at round 0. Without it, cross-doc
    // collisions (identical chain shapes repeated across documents — list
    // tails, boilerplate structures) force corpus-wide refinement rounds
    // whose count GROWS with corpus size; with it, refinement depth is
    // bounded by within-doc structure only. In global mode the scope prefix
    // is "" for every node — a no-op, so identical structures still merge.
    def nodeHash(sigs: org.apache.spark.sql.Column) =
      sha2(concat_ws("\u0000", substring_index(col("node"), "|", 1), sigs), 256)

    // round 0: first-degree signatures
    var hashes = inc
      .withColumn("sig", concat_ws("|", col("role"), col("pred"),
        coalesce(col("other_lit"), when(col("other_node").isNotNull, lit("_")), lit("")), col("g")))
      .groupBy("node")
      .agg(nodeHash(concat_ws("\n", sort_array(collect_list(col("sig"))))).as("h"))
      .localCheckpoint(false)

    // refinement rounds: include neighbor hashes. Weisfeiler-Lehman-style
    // refinement is monotone in the number of distinct colors, so the loop
    // stops at the fixpoint (distinct-hash count unchanged) — one cheap
    // countDistinct per round instead of blindly paying every join pass at
    // corpus scale. `rounds` stays the hard cap for pathological graphs.
    val firstCounts = hashes.agg(countDistinct("h"), count(lit(1))).head()
    var distinctHashes = firstCounts.getLong(0)
    val totalNodes = firstCounts.getLong(1)
    // first-degree hashes already separate every node ⇒ refinement is the
    // identity — skip the join rounds entirely (the overwhelmingly common
    // case for doc-scoped bnodes; same skip as BnodeCanon.canonicalize)
    var converged = distinctHashes == totalNodes
    var r = 0
    while (r < rounds && !converged) {
      val withNbr = inc.join(hashes.withColumnRenamed("node", "other_node").withColumnRenamed("h", "nbr_h"),
        Seq("other_node"), "left")
      hashes = withNbr
        .withColumn("sig", concat_ws("|", col("role"), col("pred"),
          coalesce(col("other_lit"), concat(lit("#"), col("nbr_h")), lit("")), col("g")))
        .groupBy("node")
        .agg(nodeHash(concat_ws("\n", sort_array(collect_list(col("sig"))))).as("h"))
        .localCheckpoint(false)
      val d = hashes.agg(countDistinct("h")).head().getLong(0)
      // stop at the WL fixpoint (count unchanged) OR at full separation
      // (count == nodes): refinement past either is the identity, and each
      // skipped round is a full corpus-scale join pass
      converged = d == distinctHashes || d == totalNodes
      distinctHashes = d
      r += 1
    }

    // Deterministic tie-break for automorphic nodes + final content label.
    // NOTE (bug #23 scope): this orderBy(node) consults INPUT node keys, so
    // for WL-stable automorphic groups the corpus-scale labels are
    // deterministic but not isomorphism-invariant — unlike BnodeCanon,
    // which breaks such ties with budget-capped individualization-
    // refinement. Corpus-scale individualization would need a recursive
    // per-orbit join loop; ties are scoped per document (scope key), the
    // pipeline's bnode labels are themselves generator-deterministic, and
    // j02/j12 consume these labels only through within-mode comparisons,
    // so the label-dependence is bounded and documented rather than fixed.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("scope"), col("h")).orderBy(col("node"))
    val labeled = hashes
      .withColumn("scope", substring_index(col("node"), "|", 1))
      .withColumn("rank", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("scope"), col("h"))))
      .withColumn("label", concat(lit("_:c"),
        substring(sha2(concat_ws("|", col("scope"), col("h"),
          when(col("n") > 1, col("rank").cast("string")).otherwise(lit(""))), 256), 1, 16)))
      .select(col("node"), col("label"))

    // relabel via three equi-joins on the bnode key
    val relabeled = withKeys
      .join(labeled.withColumnRenamed("node", "subj_key").withColumnRenamed("label", "subj_label"), Seq("subj_key"), "left")
      .join(labeled.withColumnRenamed("node", "obj_key").withColumnRenamed("label", "obj_label"), Seq("obj_key"), "left")
      .join(labeled.withColumnRenamed("node", "graph_key").withColumnRenamed("label", "graph_label"), Seq("graph_key"), "left")
      .select(
        coalesce(col("subj_label"), col("subj")).as("subj"),
        col("pred"),
        col("obj_kind"),
        coalesce(col("obj_label"), col("obj_value")).as("obj_value"),
        col("obj_datatype"), col("obj_lang"),
        coalesce(col("graph_label"), col("graph")).as("graph"),
        col("doc_id"))
    (relabeled, r)
  }

  /** Skew-aware per-predicate profile: two-phase (salted partial → final)
    * aggregation for the rdf:type-style hot predicates (north_rule: skew
    * handled explicitly — a plain groupBy(pred) sends every rdf:type row to
    * one reducer; the salt spreads it over `salt` reducers first).
    */
  def predicateCounts(triples: Dataset[TripleRow], salt: Int = 32): DataFrame = {
    val t = triples.toDF()
    t.groupBy(col("pred"), pmod(xxhash64(col("subj")), lit(salt)).as("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("pred"))
      .agg(sum(col("partial")).as("n"))
  }
}
