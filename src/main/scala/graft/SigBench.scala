package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B of the random-hyperplane LSH signature stage: the old
  * interpreted-HOF formulation (`zip_with` + `transform(sequence)` +
  * `aggregate`, reconstructed here verbatim) vs the native codegen
  * [[graft.functions.VecLshSignature]]. Same table, same planes, alternating
  * reps so host drift hits both arms equally (BENCH.md measurement rule).
  */
object SigBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val planes = if (args.nonEmpty) args(0).toInt else 12
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-sigbench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").localCheckpoint(true)
    val n = emb.count()

    // the pre-round-2 interpreted formulation, kept only for this A/B
    def planeSignHof(vec: org.apache.spark.sql.Column, p: Int) = {
      val weighted = zip_with(vec, transform(sequence(lit(0), size(vec) - 1),
        i => (xxhash64(lit(p), i).cast("double") / lit(9.223372036854776e18d))),
        (v, w) => v * w)
      when(aggregate(weighted, lit(0.0d), (acc, v) => acc + v) >= 0, lit(1)).otherwise(lit(0))
    }
    def sigHof(vec: org.apache.spark.sql.Column) =
      (0 until planes).map(p => shiftleft(planeSignHof(vec, p).cast("long"), p))
        .reduce((a, b) => a.bitwiseOR(b))

    def run(label: String, col0: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      emb.select(col0.as("sig")).agg(sum("sig")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both arms, then alternate reps and keep the best per arm
    run("warm-hof", sigHof(col("embedding")))
    run("warm-native", graft.ops.SimilarityOps.lshSignature(col("embedding"), planes))
    var bestHof = Double.MaxValue
    var bestNat = Double.MaxValue
    for (_ <- 1 to 3) {
      bestHof = math.min(bestHof, run("hof", sigHof(col("embedding"))))
      bestNat = math.min(bestNat, run("native", graft.ops.SimilarityOps.lshSignature(col("embedding"), planes)))
    }
    println(f"[sigbench] rows=$n planes=$planes hof=$bestHof%.3fs native=$bestNat%.3fs speedup=${bestHof / bestNat}%.1fx")
    spark.stop()
  }
}
