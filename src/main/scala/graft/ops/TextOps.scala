package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline, expressed as
  * codegen'd Column expressions (no UDFs on the hot path) so Catalyst keeps
  * them inside WholeStageCodegen and pushes the projections to the scan.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token estimate: word pieces + standalone punctuation. */
  def tokenCountBpe(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"), c => length(trim(c)) > 0))

  /** Quality-score components (length / punctuation ratio / stopword ratio /
    * mean word length) combined into [0,1]; deterministic and SQL-mirrorable.
    */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(text), "[^a-z0-9']+")
    val stops = filter(toks, t => t.isInCollection(stopwords))
    size(stops).cast("double") / greatest(size(filter(toks, t => length(t) > 0)).cast("double"), lit(1.0))
  }

  def meanWordLen(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))
  }

  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(1.0)).otherwise(lit(0.4))
    val stopOk = when(stopwordRatio(text).between(0.05, 0.6), lit(1.0)).otherwise(lit(0.5))
    val wordOk = when(meanWordLen(text).between(2.5, 12.0), lit(1.0)).otherwise(lit(0.5))
    round(lenScore * 0.4 + punctOk * 0.2 + stopOk * 0.2 + wordOk * 0.2, 6)
  }

  /** Canonical text normalization for dedup keys and downstream tokenizers:
    * lowercase + collapse runs of whitespace to one space + trim. The
    * whitespace class is spelled explicitly ([ \t\n\r\f]) rather than \s —
    * Java's \s includes \x0B (vertical tab) while RE2's does not, and the
    * DuckDB oracle replays this regex verbatim.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[ \\t\\n\\r\\f]+", " "))

  /** n-gram-heuristic language ID over small stopword lists; returns the
    * best-scoring language code or "und".
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "est", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "con", "por"))

  def langId(text: Column): Column = {
    val toks = filter(split(lower(text), "[^a-zà-ÿäöüß]+"), t => length(t) > 0)
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isInCollection(markers))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Document fingerprint: 64-bit rolling-style hash of the normalized text
    * (xxhash64 over collapsed whitespace + lowercase) — the cheap exact-dup
    * key at 100 TB (8 bytes/doc instead of the full text in the shuffle).
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  /** All text features for a documents table. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.withColumn("tokens_ws", tokenCountWs(t))
      .withColumn("tokens_bpe", tokenCountBpe(t))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_id", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
