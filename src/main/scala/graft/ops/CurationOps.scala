package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * split assignment and per-group quota sampling. Both are pure relational
  * plans (no UDFs), so Catalyst codegens them and DuckDB can oracle the math
  * (SparkEntry d10/d11).
  *
  * These extend the engine beyond the reference's per-document scope
  * (/root/reference/src/lib.rs has no relational layer); they exist because a
  * KG/training corpus at 100 TB needs reproducible splits and per-source
  * caps, not because the reference prescribes them.
  */
object CurationOps {

  /** Deterministic train/val/test assignment from a multiplicative hash of a
    * non-negative integral key column. Map-only — no shuffle, no RNG state —
    * so the assignment is reproducible across runs, engines, partitionings,
    * and cluster sizes (the property that matters when the corpus is
    * re-materialized incrementally at 100 TB: a document's split never
    * changes as the table grows).
    *
    * The multiplier is Knuth's 2^32-phi constant; key*A mod 100 is NOT a
    * cryptographic hash — keys correlated with content (e.g. time-ordered
    * ids) still land uniformly across buckets, which is all a split needs.
    */
  def splitByKey(df: DataFrame, keyCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages ($trainPct, $valPct)")
    val bucket: Column = (col(keyCol) * lit(2654435761L)) % 100
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Keep at most `quota` rows per group, deterministically (lowest
    * `orderCol` first). One shuffle on the group key + a per-group sort —
    * the standard per-source cap in corpus curation ("no more than N pages
    * per domain").
    *
    * Scale note: a pathologically hot group (one domain = 30% of the corpus)
    * concentrates its sort in one task. AQE's skew-join split does not apply
    * to window sorts, so for that shape pre-filter with an approximate
    * per-partition cap first: groups can only shrink, so any partition-local
    * top-(quota) pass is a correct pre-filter before the global window.
    */
  def perGroupQuota(df: DataFrame, groupCol: String, orderCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val w = Window.partitionBy(groupCol).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= quota).drop("__rn")
  }
}
