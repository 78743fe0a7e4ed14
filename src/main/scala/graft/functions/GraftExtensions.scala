package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** SparkSessionExtensions hook registering graft's native expressions as SQL
  * functions (brief: custom scalar functions registered via
  * `SparkSessionExtensions`). Activate with
  * `spark.sql.extensions=graft.functions.GraftExtensions` or
  * `.withExtensions(new GraftExtensions)`; sessions created elsewhere can use
  * the expressions directly through the typed Column helpers in
  * `SimilarityOps` (no registry needed there).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      VecCosine.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecCosine(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("vec_lsh_signature"),
      VecLshSignature.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val planes = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"vec_lsh_signature: planes must be an integer literal, got $other")
        }
        VecLshSignature(children(0), planes)
      }
    ))
  }
}
