package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * split assignment and per-group quota sampling. Both are pure relational
  * plans (no UDFs), so Catalyst codegens them and DuckDB can oracle the math
  * (SparkEntry d10/d11).
  *
  * These extend the engine beyond the reference's per-document scope
  * (/root/reference/src/lib.rs has no relational layer); they exist because a
  * KG/training corpus at 100 TB needs reproducible splits and per-source
  * caps, not because the reference prescribes them.
  */
object CurationOps {

  /** Deterministic train/val/test assignment from a multiplicative hash of a
    * non-negative integral key column. Map-only — no shuffle, no RNG state —
    * so the assignment is reproducible across runs, engines, partitionings,
    * and cluster sizes (the property that matters when the corpus is
    * re-materialized incrementally at 100 TB: a document's split never
    * changes as the table grows).
    *
    * The multiplier is Knuth's 2^32-phi constant; key*A mod 100 is NOT a
    * cryptographic hash — keys correlated with content (e.g. time-ordered
    * ids) still land uniformly across buckets, which is all a split needs.
    */
  def splitByKey(df: DataFrame, keyCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages ($trainPct, $valPct)")
    val bucket: Column = (col(keyCol) * lit(2654435761L)) % 100
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Keep at most `quota` rows per group, deterministically (lowest
    * `orderCol` first). One shuffle on the group key + a per-group sort —
    * the standard per-source cap in corpus curation ("no more than N pages
    * per domain").
    *
    * Scale note: a pathologically hot group (one domain = 30% of the corpus)
    * concentrates its sort in one task. AQE's skew-join split does not apply
    * to window sorts, so for that shape pre-filter with an approximate
    * per-partition cap first: groups can only shrink, so any partition-local
    * top-(quota) pass is a correct pre-filter before the global window.
    */
  def perGroupQuota(df: DataFrame, groupCol: String, orderCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val w = Window.partitionBy(groupCol).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= quota).drop("__rn")
  }

  /** Lowercased word tokens (letters/digits/apostrophes), empties dropped —
    * the shared tokenizer for [[wordShingles]] and [[vocabTopK]]. Kept ANSI-
    * mirrorable (lower + regex split) so DuckDB can replay it exactly.
    */
  private def wordTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9']+"), t => length(t) > 0)

  /** Word-level n-gram shingles as (id, shingle) rows. The token array is
    * materialized through a checkpoint boundary before the transform/slice
    * fan-out — without it Catalyst's projection collapse inlines the regex
    * split into every shingle index (the d04 lesson: O(tokens × shingles)
    * recompute). Docs shorter than n tokens produce no rows (they cannot
    * match an n-gram).
    */
  def wordShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n > 0, "shingle length must be positive")
    val toks = docs.select(col(idCol).as("id"), wordTokens(col(textCol)).as("toks"))
      .localCheckpoint(false)
    toks.select(col("id"), explode(
      when(size(col("toks")) >= n,
        transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
        .otherwise(array().cast("array<string>"))).as("shingle"))
  }

  /** Benchmark decontamination: ids of corpus docs sharing at least one
    * n-token shingle with any benchmark doc (the standard leakage guard
    * before training — e.g. 8–13-gram overlap with an eval set).
    *
    * Scale shape: benchmark sets are tiny next to a 100 TB corpus, so the
    * distinct benchmark shingle table is broadcast — the corpus side is a
    * map-only explode + broadcast semi-join with NO corpus shuffle; the only
    * shuffle is the final distinct over the (small) contaminated id set.
    */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 8): DataFrame = {
    val benchShingles = wordShingles(benchmark, idCol, textCol, n)
      .select(col("shingle")).distinct()
    wordShingles(corpus, idCol, textCol, n)
      .join(broadcast(benchShingles), Seq("shingle"), "left_semi")
      .select(col("id").as(idCol)).distinct()
  }

  /** Corpus vocabulary: top-k word tokens by frequency, ties broken by token
    * text so the cut is deterministic. Map-side partial aggregation means the
    * token shuffle carries (token, partial count), and the top-k is a
    * TakeOrderedAndProject (per-partition heap + driver merge of k rows) —
    * never a global sort of the vocabulary.
    */
  def vocabTopK(docs: DataFrame, textCol: String = "text", k: Int = 50): DataFrame =
    docs.select(explode(wordTokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(k)
}
