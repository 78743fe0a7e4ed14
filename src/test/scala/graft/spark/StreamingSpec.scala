package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming expand: docs stream → triples stream → watermarked windowed predicate counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingPipeline.TimedDoc]
    val ctxB = spark.sparkContext.broadcast(RemoteContextPool.pool)
    val triples = StreamingPipeline.expandStream(input.toDS(), ctxB)
    val rates = StreamingPipeline.predicateRates(triples, watermark = "1 minute", window = "1 minute")
    val q = rates.writeStream.outputMode("update").format("memory").queryName("pred_rates").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
      input.addData((0L until 50L).map(i => StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(i), t0)))
      q.processAllAvailable()
      val rows = spark.table("pred_rates").collect()
      assert(rows.nonEmpty)
      val total = rows.map(_.getAs[Long]("n")).sum
      assert(total > 100, s"expected >100 triples in window counts, got $total")
      // second micro-batch accumulates into the same window
      input.addData(Seq(StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(999L), t0)))
      q.processAllAvailable()
      val total2 = spark.table("pred_rates").collect().map(_.getAs[Long]("n")).sum
      assert(total2 >= total)
    } finally q.stop()
  }

  test("streaming dedup drops in-horizon duplicates with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingPipeline.TimedDoc]
    val deduped = StreamingPipeline.dedupStream(input.toDS(), watermark = "1 minute")
    val q = deduped.writeStream.outputMode("append").format("memory").queryName("dedup_stream").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
      val d1 = SyntheticDocs.generateDoc(1L)
      val d2 = SyntheticDocs.generateDoc(2L)
      input.addData(Seq(
        StreamingPipeline.TimedDoc(d1, t0),
        StreamingPipeline.TimedDoc(d1.copy(doc_id = "dup-of-1"), t0), // same content, new id
        StreamingPipeline.TimedDoc(d2, t0)))
      q.processAllAvailable()
      // duplicate content within the horizon: only one survivor per hash
      val ids = spark.table("dedup_stream").select("doc_id").as[String].collect().toSet
      assert(ids.size == 2, s"expected 2 unique docs, got $ids")
      assert(ids.contains(d2.doc_id))
      assert(ids.contains(d1.doc_id) ^ ids.contains("dup-of-1"))
    } finally q.stop()
  }
}
