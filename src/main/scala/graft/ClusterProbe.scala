package graft

import org.apache.spark.sql.SparkSession
import graft.spark.{ExpandStage, RemoteContextPool, SyntheticDocs}

/** spark-submit entry for the N-vs-4N *executor* scaling evidence
  * (north_rule): master comes from spark-submit — run with
  * `--master local-cluster[1,8,6144]` (N) and `--master local-cluster[4,8,6144]`
  * (4N); each executor is its own JVM, as on a real cluster.
  *
  *   args: <docs> <partitions> <reps>
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 300000L
    val parts = if (args.length > 1) args(1).toInt else 64
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().appName("graft-cluster-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ctxB = spark.sparkContext.broadcast(RemoteContextPool.pool)

    def timed(docs: Long): (Double, Long) = {
      val ds = SyntheticDocs.generate(spark, docs, parts)
      val t0 = System.nanoTime()
      val c = ExpandStage.triples(ExpandStage.run(ds, ctxB)).count()
      ((System.nanoTime() - t0) / 1e9, c)
    }
    // warmup scaled to total cores so every executor JVM gets the same per-core
    // JIT warmup regardless of cluster size (a fixed warmup under-warms the
    // 4N leg: its reps kept speeding up 5.6→4.9→4.5 s). 25k docs/core: with
    // reps=1 the timed run no longer rides a previous rep's warmup, so the
    // pre-timed warm must carry the full C2 ramp on its own
    val warm = 25000L * spark.sparkContext.defaultParallelism
    timed(warm)
    val results = (1 to reps).map { rep =>
      val (t, c) = timed(n)
      println(f"[cluster-probe] rep=$rep master=${spark.sparkContext.master} docs=$n triples=$c sec=$t%.3f thr=${c / t}%.0f")
      t
    }
    println(f"[cluster-probe] BEST master=${spark.sparkContext.master} sec=${results.min}%.3f")
    spark.stop()
  }
}
