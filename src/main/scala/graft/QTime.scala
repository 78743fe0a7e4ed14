package graft

import org.apache.spark.sql.SparkSession
/** Dev utility: time individual SparkEntry queries at sf0.1 (local[32]). */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", "false")
      // same knobs as Bench so QTime numbers are representative
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      println(f"[qtime] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
