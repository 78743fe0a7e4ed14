package graft

import org.apache.spark.sql.SparkSession

/** Supplementary benchmark (opt guide §1.4): time SparkEntry queries against
  * the NOOP sink — computes every column of every row and discards it — as a
  * cross-check on the driver's `.count()` methodology (count lets the
  * optimizer prune columns and, e.g., eliminate a final sort; noop pays the
  * full result). NOT part of the driver contract; `graft.Bench` is frozen
  * and unchanged. Usage: runMain graft.BenchExtra <query...> (each name may
  * repeat for warm reps).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus).config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      spark.sparkContext.setJobDescription(s"noop: $name")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[bx-noop] $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
