package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` for SparkEntry queries into a
  * directory (one `<query><suffix>.txt` per query) — the plan evidence the
  * optimization rounds commit under `plans/`. Same session knobs as Bench so
  * the plans match what the driver measures. Queries with eager side effects
  * (j10 stage write, e07 index build) run those effects as part of plan
  * construction — harmless, they are idempotent overwrites.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r06"
    val suffix = if (args.length > 1) args(1) else "_before"
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val w = new java.io.PrintWriter(s"$outDir/$n$suffix.txt", "UTF-8")
        try w.println(txt) finally w.close()
        println(s"[plandump] $n ok")
      } catch { case e: Throwable => println(s"[plandump] $n FAILED: $e") }
    }
    spark.stop()
  }
}
