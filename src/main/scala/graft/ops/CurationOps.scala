package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * split assignment and per-group quota sampling. Both are pure relational
  * plans (no UDFs in the hashing/quota math), so Catalyst codegens them and
  * DuckDB can oracle the arithmetic (SparkEntry d10/d11).
  *
  * These extend the engine beyond the reference's per-document scope
  * (/root/reference/src/lib.rs has no relational layer); they exist because a
  * KG/training corpus at 100 TB needs reproducible splits and per-source
  * caps, not because the reference prescribes them.
  */
object CurationOps {

  // ---- ANSI-expressible 64-bit mix (exactly replayable in DuckDB) ----

  private val Chunk = 1L << 31
  // multipliers < 2^30 keep every product < 2^62 and every sum < 3×2^61 —
  // no Long overflow for ANY input, ANSI mode or not. The values are odd
  // integers near 2^31 × {√2−1, 1/φ², √5−2, 1−√2/2}: C/2^31 must be FAR
  // from small-denominator rationals, or strided key families alias (first
  // attempt used 2^29−3, making 100·C1/2^31 ≈ 25.0000 — stride-100 keys
  // cycled through four buckets; OpsSpec pins the fixed families)
  private val C1 = 889516853L
  private val C2 = 820263983L
  private val C3 = 506952445L
  private val C4 = 628974379L

  /** One mixing round: split into (low 31 bits, rest) and recombine with two
    * odd multipliers. The 2^31 split/carry is what breaks the "(k*A) mod m
    * depends only on k mod m" linearity of a single multiplicative hash —
    * the final bucket depends on ALL bits of the key, not its low decimal
    * digits. shiftright is exact here: (k - pmod(k, 2^31)) is an exact
    * multiple of 2^31, so the arithmetic shift is the exact quotient for
    * negative values too.
    */
  private def mixRound(k: Column, cLo: Long, cHi: Long): Column = {
    val lo = pmod(k, lit(Chunk))
    lo * lit(cLo) + shiftright(k - lo, 31) * lit(cHi)
  }

  /** Two chunked multiply-add rounds over a 64-bit key. Not cryptographic —
    * buckets of structured key families (sequential, stride-N, snowflake-
    * style timestamp<<22|worker|seq) spread near-uniformly, which is all a
    * split needs (distribution pinned for those families in OpsSpec). Total
    * for all Long inputs; overflow-free by the < 2^30 multiplier bound.
    */
  private[ops] def mix64(key: Column): Column =
    mixRound(mixRound(key.cast("long"), C1, C2), C3, C4)

  /** Deterministic train/val/test assignment from a mixed hash of an
    * integral key column. Map-only — no shuffle, no RNG state — so the
    * assignment is reproducible across runs, engines, partitionings, and
    * cluster sizes (the property that matters when the corpus is
    * re-materialized incrementally at 100 TB: a document's split never
    * changes as the table grows).
    *
    * HASH VERSION: this is hash v2 (the chunked two-round mix above, since
    * round 4). It is NOT assignment-compatible with v1 (the single
    * multiplicative `(key*2654435761) % 100` of rounds ≤ 3): a corpus
    * materialized under v1 must be re-split wholesale — never extended
    * incrementally under v2, or train/test contaminate across versions.
    * The "split never changes" promise holds within one hash version.
    *
    * Null or non-integral keys fail the JOB (raise_error), not silently
    * land in a bucket: a nullable key column would otherwise route every
    * null (and, in non-ANSI mode, every uncastable string) to one split,
    * producing a skewed, meaningless partition with no signal.
    */
  def splitByKey(df: DataFrame, keyCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages ($trainPct, $valPct)")
    require(!df.columns.contains("split"),
      "splitByKey: input already has a 'split' column — rename it first")
    val bucket: Column = pmod(mix64(col(keyCol)), lit(100L))
    // bucket is null iff cast(key as long) was null: a null key, or a
    // non-integral key under non-ANSI cast semantics
    df.withColumn("split",
      when(bucket.isNull, raise_error(concat(
          lit(s"splitByKey: null or non-integral key in '$keyCol': "),
          coalesce(col(keyCol).cast("string"), lit("NULL")))))
        .when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Keep at most `quota` rows per group, deterministically (lowest
    * `orderCol` first; deterministic when orderCol is unique per group, the
    * same contract the plain window formulation had). Two stages:
    *
    *  1. Partition-local exact pre-filter: sortWithinPartitions(group, order)
    *     — a Tungsten local sort, spill-safe, NO shuffle — then a streaming
    *     keep-first-quota pass per (group, partition) in O(1) memory. Exact
    *     because groups only shrink: a row outside its partition's per-group
    *     top-quota can never be in the global top-quota.
    *  2. The global window (one shuffle on the group key + per-group sort)
    *     over the pre-filtered rows.
    *
    * The pre-filter is the hot-group guard at 100 TB: one domain that is 30%
    * of the corpus would otherwise concentrate the window sort in a single
    * task (AQE's skew split does not apply to window sorts). After stage 1
    * the hot group contributes at most quota × partitions rows to that task.
    */
  def perGroupQuota(df: DataFrame, groupCol: String, orderCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    require(!df.columns.contains("__rn"),
      "perGroupQuota: input already has a '__rn' column — rename it first")
    val gi = df.schema.fieldIndex(groupCol)
    val pre = df.sortWithinPartitions(col(groupCol), col(orderCol))
      .mapPartitions { it =>
        var cur: Any = null
        var started = false
        var n = 0
        it.filter { r =>
          val g = r.get(gi)
          if (!started || g != cur) { started = true; cur = g; n = 0 }
          n += 1
          n <= quota
        }
      }(Encoders.row(df.schema))
    val w = Window.partitionBy(groupCol).orderBy(col(orderCol))
    pre.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= quota).drop("__rn")
  }

  /** Lowercased word tokens (letters/digits/apostrophes), empties dropped —
    * the columnar tokenizer for [[vocabTopK]] (single use inside one
    * generator expression → evaluated once per row). Kept ANSI-mirrorable
    * (lower + regex split) so DuckDB can replay it exactly.
    */
  private def wordTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9']+"), t => length(t) > 0)

  /** Single-pass JVM shingler: tokenize + slide in one call per row. Exact
    * parity with [[wordTokens]] (ASCII/regex-identical: Locale.ROOT
    * lowercase, split on `[^a-z0-9']+` with trailing empties kept then
    * non-empties filtered — the d12 DuckDB oracle replays the same regex).
    *
    * Why a UDF and not the columnar HOF formulation: a `transform` lambda
    * that references the token array re-evaluates the regex split per
    * shingle index (the d04 lesson: O(tokens × shingles) recompute), and the
    * earlier fix — localCheckpoint as an optimizer barrier — materialized
    * the full tokenized corpus into NON-REPLICATED executor block storage
    * with truncated lineage: any executor loss failed the job, and the
    * corpus-side storage cost contradicted the map-only decontamination
    * claim. One JVM call per row has neither problem: map-only, no storage,
    * fully recoverable, and the tokenizer runs exactly once per document.
    */
  private val shinglesUdf = udf { (text: String, n: Int) =>
    if (text == null) Array.empty[String]
    else {
      val toks = text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9']+", -1).filter(_.nonEmpty)
      if (toks.length < n) Array.empty[String]
      else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
    }
  }

  /** Word-level n-gram shingles as (id, shingle) rows. Docs shorter than n
    * tokens produce no rows (they cannot match an n-gram). The shingle array
    * is the generator input of ONE explode, so it is computed once per row
    * (a UDF alongside an explode in the same select would instead re-run per
    * exploded element — measured in BENCH.md).
    */
  def wordShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n > 0, "shingle length must be positive")
    docs.select(col(idCol).as("id"), explode(shinglesUdf(col(textCol), lit(n))).as("shingle"))
  }

  /** Benchmark decontamination: ids of corpus docs sharing at least one
    * n-token shingle with any benchmark doc (the standard leakage guard
    * before training — e.g. 8–13-gram overlap with an eval set).
    *
    * Scale shape: benchmark sets are tiny next to a 100 TB corpus, so the
    * distinct benchmark shingle table is broadcast — the corpus side is a
    * map-only shingle explode + broadcast semi-join with NO corpus shuffle
    * and NO corpus-side materialization; the only shuffle is the final
    * distinct over the (small) contaminated id set.
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
