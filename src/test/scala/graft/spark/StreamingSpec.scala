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
}
