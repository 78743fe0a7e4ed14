package graft.spark

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.JsonLdOptions

/** Structured Streaming lift of the expansion stage. The per-document engine
  * is stateless (SURVEY.md §2.2: "expansion is a stateless mapPartitions, so
  * it lifts to Structured Streaming mechanically") — the same typed transform
  * runs unchanged on a streaming Dataset[Doc]; watermark + windowed
  * aggregation give per-predicate rates with late-data tolerance.
  */
object StreamingPipeline {

  final case class TimedDoc(doc: Doc, ingest_ts: java.sql.Timestamp)

  /** streaming Dataset[TimedDoc] → streaming triples with event time. */
  def expandStream(
      docs: Dataset[TimedDoc],
      resolvedContexts: Broadcast[Map[String, String]],
      options: JsonLdOptions = JsonLdOptions()
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val aliases = ExpandStage.aliasDictionary
    docs.mapPartitions { it =>
      val loader = RemoteContextPool.loaderFor(resolvedContexts.value)
      val state = new graft.core.ApiState(options, loader)
      it.flatMap { td =>
        val (ts, _) = ExpandStage.expandDoc(td.doc, state, aliases)
        ts.iterator.map(t => (td.ingest_ts, t))
      }
    }.toDF("ingest_ts", "triple")
      .select(col("ingest_ts"), col("triple.*"))
  }

  /** Windowed per-predicate triple counts with a watermark: late rows beyond
    * the watermark are dropped; state is bounded by (window × predicates).
    */
  def predicateRates(triples: DataFrame, watermark: String = "10 seconds", window: String = "5 seconds"): DataFrame =
    triples
      .withWatermark("ingest_ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ingest_ts"), window), col("pred"))
      .agg(count(lit(1)).as("n"))
}
