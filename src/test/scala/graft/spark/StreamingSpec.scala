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

  test("late data beyond the watermark is dropped from windowed predicate counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingPipeline.TimedDoc]
    val ctxB = spark.sparkContext.broadcast(RemoteContextPool.pool)
    val triples = StreamingPipeline.expandStream(input.toDS(), ctxB)
    val rates = StreamingPipeline.predicateRates(triples, watermark = "10 seconds", window = "1 minute")
    val q = rates.writeStream.outputMode("append").format("memory").queryName("late_rates").start()
    try {
      val early = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
      val late = java.sql.Timestamp.valueOf("2026-01-01 00:10:00")
      input.addData(Seq(StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(1L), early)))
      q.processAllAvailable()
      // advance the watermark far past the first window...
      input.addData(Seq(StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(2L), late)))
      q.processAllAvailable()
      val closed = spark.table("late_rates").collect().map(_.getAs[Long]("n")).sum
      assert(closed > 0, "first window should have closed and emitted in append mode")
      // ...then a doc far behind the watermark: its rows must be discarded
      input.addData(Seq(StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(3L), early)))
      q.processAllAvailable()
      input.addData(Seq(StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(4L), late)))
      q.processAllAvailable()
      val after = spark.table("late_rates").collect()
        .filter(_.getAs[org.apache.spark.sql.Row]("window")
          .getAs[java.sql.Timestamp]("start").before(java.sql.Timestamp.valueOf("2026-01-01 00:05:00")))
        .map(_.getAs[Long]("n")).sum
      assert(after == closed, s"late rows leaked into the closed window: $closed -> $after")
    } finally q.stop()
  }

  test("subjectFragments: custom flatMapGroupsWithState sessionization emits once per subject on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingPipeline.TimedDoc]
    val ctxB = spark.sparkContext.broadcast(RemoteContextPool.pool)
    val triples = StreamingPipeline.expandStream(input.toDS(), ctxB)
    val frags = StreamingPipeline.subjectFragments(triples, watermark = "1 second", gapMs = 5000L)
    val q = frags.writeStream.outputMode("append").format("memory").queryName("subj_frags").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
      val later = java.sql.Timestamp.valueOf("2026-01-01 00:10:00")
      input.addData(Seq(
        StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(1L), t0),
        StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(2L), t0)))
      q.processAllAvailable()
      assert(spark.table("subj_frags").isEmpty, "nothing should emit before the gap passes")
      // push the watermark far past last-seen + gap, then one more batch so
      // the timed-out state is swept
      input.addData(Seq(StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(3L), later)))
      q.processAllAvailable()
      input.addData(Seq(StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(4L), later)))
      q.processAllAvailable()
      val rows = spark.table("subj_frags").collect()
      assert(rows.nonEmpty, "timed-out subjects should have emitted fragments")
      // one fragment per subject, counts positive, pred cardinality sane
      val bySubj = rows.groupBy(_.getAs[String]("subj"))
      assert(bySubj.values.forall(_.length == 1), "a subject emitted more than one fragment")
      rows.foreach { r =>
        assert(r.getAs[Long]("n_triples") > 0)
        assert(r.getAs[Int]("n_preds") > 0)
        assert(r.getAs[Long]("first_ms") <= r.getAs[Long]("last_ms"))
      }
    } finally q.stop()
  }

  test("materializeStream: durable per-batch triple sink with idempotent lineage gating") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-mat").toString
    val input = MemoryStream[StreamingPipeline.TimedDoc]
    val ctxB = spark.sparkContext.broadcast(RemoteContextPool.pool)
    val q = StreamingPipeline.materializeStream(input.toDS(), ctxB, outDir)
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
      input.addData((0L until 20L).map(i => StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(i), t0)))
      q.processAllAvailable()
      input.addData(Seq(StreamingPipeline.TimedDoc(SyntheticDocs.generateDoc(99L), t0)))
      q.processAllAvailable()
      val triples = spark.read.parquet(s"$outDir/triples")
      assert(triples.count() > 0)
      val lineage = spark.read.parquet(s"$outDir/stream_lineage").collect()
      assert(lineage.length >= 1)
      assert(lineage.map(_.getAs[Long]("n_triples")).sum == triples.count())
      // replaying an already-committed batch id must be a no-op (the
      // at-least-once foreachBatch contract under restart)
      val before = triples.count()
      val someBatch = lineage.head.getAs[Long]("batch_id")
      val replay = StreamingPipeline.appendTriplesBatch(
        spark.read.parquet(s"$outDir/triples/batch=$someBatch"), someBatch, outDir)
      assert(!replay)
      assert(spark.read.parquet(s"$outDir/triples").count() == before)
    } finally q.stop()
  }

  test("lineage gate is O(1) per batch: the lineage table is read once per JVM, not once per batch") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-o1").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
    def batchDf(tag: String) = Seq((t0, s"http://s/$tag", "http://p/x", "o"))
      .toDF("ingest_ts", "subj", "pred", "obj")
    assert(StreamingPipeline.lineageReloadCount(outDir) == 0L)
    assert(StreamingPipeline.appendTriplesBatch(batchDf("a"), 0L, outDir))
    assert(StreamingPipeline.appendTriplesBatch(batchDf("b"), 1L, outDir))
    assert(StreamingPipeline.appendTriplesBatch(batchDf("c"), 2L, outDir))
    assert(!StreamingPipeline.appendTriplesBatch(batchDf("a"), 0L, outDir)) // replay → no-op
    // the whole sequence cost exactly ONE lineage load (batch 2+ and the
    // replay check hit the driver cache — the O(batches²) rescan is gone)
    assert(StreamingPipeline.lineageReloadCount(outDir) == 1L)
    // a fresh driver JVM (simulated by cache invalidation) re-reads lineage
    // ONCE and still refuses committed ids — restart idempotence intact
    StreamingPipeline.invalidateLineageCache(outDir)
    assert(!StreamingPipeline.appendTriplesBatch(batchDf("a"), 0L, outDir))
    assert(StreamingPipeline.appendTriplesBatch(batchDf("d"), 3L, outDir))
    assert(StreamingPipeline.lineageReloadCount(outDir) == 2L)
    val lineage = spark.read.parquet(s"$outDir/stream_lineage")
    assert(lineage.select("batch_id").as[Long].collect().toSet == Set(0L, 1L, 2L, 3L))
    // outDir deleted and recreated inside the SAME JVM (notebook rerun /
    // test cleanup): the cached committed ids must not refuse the new
    // run's batch 0 — the per-batch existence check drops the stale cache
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val fs = f.listFiles; if (fs != null) fs.foreach(rm) }
      f.delete(); ()
    }
    rm(new java.io.File(outDir))
    assert(StreamingPipeline.appendTriplesBatch(batchDf("fresh"), 0L, outDir),
      "stale committed-id cache refused batch 0 of a recreated outDir")
    assert(spark.read.parquet(s"$outDir/triples/batch=0").count() == 1L)
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
