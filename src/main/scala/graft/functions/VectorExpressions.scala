package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` embedding columns.
  *
  * Rationale (brief's extension-preference order: compose built-ins → native
  * `Expression` → UDF): the built-in formulation
  * `aggregate(zip_with(a, b, _*_), 0d, _+_) / (norm(a)*norm(b))` is three
  * interpreted higher-order functions evaluated per row — the same
  * interpreted-HOF tax measured at 30× on the minhash kernels (BENCH.md).
  * This expression participates in whole-stage codegen: one fused Java loop
  * per row, no lambda dispatch, no boxing.
  *
  * Semantics match `SimilarityOps.cosine`'s Column formulation exactly:
  * dot over the common prefix (zip_with semantics), each norm over its full
  * array, denominator clamped at 1e-12.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float>; AbstractDataType (and so ExpectsInputTypes)
  // is private[sql] in Spark 4.1, so typing is by construction: the only
  // producers are the typed helpers in SimilarityOps
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nd = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < nd) { dot += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    var nx = 0.0
    i = 0
    while (i < x.numElements()) { val v = x.getFloat(i).toDouble; nx += v * v; i += 1 }
    var ny = 0.0
    i = 0
    while (i < y.numElements()) { val v = y.getFloat(i).toDouble; ny += v * v; i += 1 }
    dot / math.max(math.sqrt(nx) * math.sqrt(ny), 1e-12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int graft_nd = java.lang.Math.min($a.numElements(), $b.numElements());
         |double graft_dot = 0.0, graft_nx = 0.0, graft_ny = 0.0;
         |for (int graft_i = 0; graft_i < graft_nd; graft_i++) {
         |  graft_dot += (double) $a.getFloat(graft_i) * (double) $b.getFloat(graft_i);
         |}
         |for (int graft_i = 0; graft_i < $a.numElements(); graft_i++) {
         |  double graft_v = (double) $a.getFloat(graft_i); graft_nx += graft_v * graft_v;
         |}
         |for (int graft_i = 0; graft_i < $b.numElements(); graft_i++) {
         |  double graft_v = (double) $b.getFloat(graft_i); graft_ny += graft_v * graft_v;
         |}
         |${ev.value} = graft_dot / java.lang.Math.max(
         |  java.lang.Math.sqrt(graft_nx) * java.lang.Math.sqrt(graft_ny), 1e-12);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VecCosine {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[VecCosine].getName, null, "vec_cosine",
    "_FUNC_(a, b) - cosine similarity between two float vectors.", "")
}
