package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication family for training-data pipelines. Every operator is a
  * shuffle-conscious DataFrame program:
  *  - exact: single groupBy on the text (or its 64-bit fingerprint at scale);
  *  - MinHash+LSH: shingle → per-band min-hash signature → band-bucket
  *    self-join (candidates only meet inside a bucket — never a cross join);
  *  - SimHash: 64-bit signature, banded into 4×16-bit exact-match blocks
  *    (any pair within Hamming distance 3 shares ≥1 block by pigeonhole);
  *  - n-gram Jaccard: exact verification on LSH candidates only.
  */
object DedupOps {

  /** Exact dedup: keep the first doc per identical text. At 100 TB, group on
    * the 64-bit fingerprint, not the raw text — 8-byte shuffle keys.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Character shingles of length k, as a distinct array. */
  private def shingles(text: Column, k: Int): Column = {
    val t = regexp_replace(lower(text), "\\s+", " ")
    array_distinct(filter(
      transform(sequence(lit(0), greatest(length(t) - k, lit(0))), i => t.substr(i + 1, lit(k))),
      s => length(s) === k))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min over shingle hashes. Computed columnar (no explode → no shuffle):
    * transform+aggregate inside one projection.
    */
  def minhashSignature(text: Column, k: Int = 5, numHashes: Int = 32): Column = {
    val sh = shingles(text, k)
    val hashes = (0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))
    }
    array(hashes: _*)
  }

  /** MinHash+LSH near-dup candidate pairs with estimated Jaccard ≥ threshold.
    * bands × rowsPerBand = numHashes; a pair lands in a bucket iff one band
    * matches exactly. The band-bucket groupBy is the only shuffle.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5
  ): DataFrame = {
    val rowsPerBand = numHashes / bands
    // materialize signatures ONCE: without the checkpoint boundary Catalyst
    // inlines the 32-hash expression into every band and into both sides of
    // the candidate self-join, recomputing shingles O(bands × pairs) times
    val sig = docs.select(col(idCol).as("id"), col(textCol).as("txt"),
      minhashSignature(col(textCol), k, numHashes).as("sig"))
      .localCheckpoint(false)
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))): _*)))
      .withColumnRenamed("col", "bucket").withColumnRenamed("pos", "band")
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val pairs = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
    val est = pairs.withColumn("est_jaccard",
      size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), (c: org.apache.spark.sql.Column) => c)).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
    // verification joins texts back by id — candidate texts only, never the
    // full corpus through the band shuffle
    val txt = sig.select(col("id"), col("txt"))
    est.join(txt.withColumnRenamed("id", "id_a").withColumnRenamed("txt", "txt_a"), Seq("id_a"))
      .join(txt.withColumnRenamed("id", "id_b").withColumnRenamed("txt", "txt_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("est_jaccard"),
        round(jaccard(col("txt_a"), col("txt_b"), k), 6).as("jaccard"))
  }

  /** Exact n-gram Jaccard between two text columns (verification stage). */
  def jaccard(a: Column, b: Column, k: Int = 5): Column = {
    val sa = shingles(a, k)
    val sb = shingles(b, k)
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / greatest(size(array_union(sa, sb)).cast("double"), lit(1.0))
  }

  /** 64-bit SimHash from token hashes: per-bit majority vote, expressed as a
    * sum over signed bit contributions (pure Column program, codegen'd).
    */
  def simhash(text: Column): Column = {
    val toks = filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)
    val tokHashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val vote = aggregate(tokHashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash near-dup pairs within Hamming distance `maxHamming` (≤ 3 with 4
    * bands): candidates share one exact 16-bit band, then verified by
    * bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    // checkpoint: the 64-bit vote expression must not be inlined per band/pair
    val sig = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sh")).localCheckpoint(false)
    val banded = sig.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("col", "block").withColumnRenamed("pos", "band")
    val a = banded.select(col("band"), col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "block")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming")).distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup: normalized dot product ≥ threshold, over
    * LSH-bucketed candidates (random-hyperplane signs; see SimilarityOps).
    */
  def embeddingNearDup(embeddings: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.95, planes: Int = 12): DataFrame = {
    val cand = SimilarityOps.lshCandidates(embeddings, idCol, vecCol, planes)
    cand.withColumn("cosine", round(SimilarityOps.cosine(col("vec_a"), col("vec_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
