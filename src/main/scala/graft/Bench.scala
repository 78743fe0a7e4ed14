package graft

import org.apache.spark.sql.SparkSession
import graft.spark.{ExpandStage, RemoteContextPool, SyntheticDocs}

/** Benchmark entry point (driver contract): one JSON line
  * {"metric":"total","value":sec,"unit":"sec","queries":{...},"sf":...}
  * plus extra keys: pipeline triples/sec and the N→4N scaling evidence
  * required by BASELINE.md — measured with real separate executor JVMs via
  * spark-submit local-cluster[1,8,*] vs local-cluster[4,8,*] on the same
  * input (falls back to a thread-level proxy if spark-submit is missing).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One timed pipeline run: expand `n` synthetic docs → count triples.
    * Returns (seconds, triples).
    */
  private def pipelineRun(spark: SparkSession, n: Long, parts: Int): (Double, Long) = {
    val ctxB = spark.sparkContext.broadcast(RemoteContextPool.pool)
    val docs = SyntheticDocs.generate(spark, n, parts)
    val t0 = System.nanoTime()
    val count = ExpandStage.triples(ExpandStage.run(docs, ctxB)).count()
    ((System.nanoTime() - t0) / 1e9, count)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)

    val headline = Vector(
      "q01_agg_pricing", "q03_join_broadcast_topn", "q04_join_multi", "q05_window_first_order",
      "q12_rollup", "d01_dedup_exact", "d03_text_features", "d04_minhash_lsh", "d05_simhash_pairs",
      "e01_knn_bruteforce", "e02_ann_lsh", "j01_expand_triples", "j02_graph_pipeline")
    val all = SparkEntry.queries
    val results = headline.flatMap { name =>
      all.get(name).map { fn =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }

    // pipeline throughput at the benchmark parallelism
    val (tPipe, nTriples) = pipelineRun(spark, 40000, cpus)
    val triplesPerSec = nTriples / tPipe
    spark.stop()

    // Scaling evidence (north_rule: N vs 4N executors via spark-submit).
    // local-cluster gives real separate executor JVMs: 1×8-core executor vs
    // 4×8-core executors on the same input. Falls back to NaN if spark-submit
    // is unavailable.
    def clusterRun(executors: Int): Double = {
      val jar = new java.io.File("target/scala-2.13/jsonldrsspark_2.13-0.1.0.jar")
      if (!jar.exists()) return Double.NaN
      val cmd = Seq("/opt/spark/bin/spark-submit",
        "--master", s"local-cluster[$executors,8,6144]",
        "--conf", "spark.executor.memory=5g",
        "--conf", "spark.executor.extraJavaOptions=-Xms5g -XX:+AlwaysPreTouch",
        "--conf", "spark.driver.memory=4g",
        "--conf", "spark.sql.shuffle.partitions=64",
        "--conf", "spark.ui.enabled=false",
        "--class", "graft.ClusterProbe", jar.getPath, "300000", "64", "3")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_HOME", "/opt/spark")
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor()
      val Best = """.*\[cluster-probe\] BEST .* sec=([0-9.]+).*""".r
      out.linesIterator.collectFirst { case Best(sec) => sec.toDouble }.getOrElse(Double.NaN)
    }
    // best-of-3 reps inside each submission strips JIT/host noise (the
    // sandbox host throughput drifts ±30% minute-to-minute; see BENCH.md)
    var mode = "local-cluster-executors"
    var t1x = clusterRun(1)
    var t4x = clusterRun(4)
    if (t1x.isNaN || t4x.isNaN) {
      // fallback: thread-level proxy in fresh in-process sessions
      mode = "local-threads"
      def threadRun(n: Int): Double = {
        val s = session(n)
        try { pipelineRun(s, 30000, n); val (t, _) = pipelineRun(s, 300000, n); t }
        finally s.stop()
      }
      t1x = threadRun(8)
      t4x = threadRun(32)
    }
    val efficiency = (t1x / t4x) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    val pipe = f"""{"docs":40000,"triples":$nTriples,"sec":$tPipe%.3f,"triples_per_sec":$triplesPerSec%.1f}"""
    val scaling = f"""{"mode":"$mode","executors_n":1,"executors_4n":4,"cores_per_executor":8,"docs":300000,"t_n_sec":$t1x%.3f,"t_4n_sec":$t4x%.3f,"efficiency_n_to_4n":$efficiency%.3f}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline":$pipe,"scaling":$scaling}""")
  }
}
