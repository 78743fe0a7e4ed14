package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

/** Random-hyperplane LSH signature over an `array<float>` embedding: bit p of
  * the result is the sign of `dot(vec, plane_p)`, where plane `p`'s weight at
  * dimension `i` is a deterministic splitmix64-derived value in [-1, 1).
  *
  * Replaces the interpreted-HOF formulation
  * (`zip_with(vec, transform(sequence(...), xxhash64(...)), ...)` +
  * `aggregate`) that dominated the e02/e03 signature stage — higher-order
  * functions are interpreted per row AND inlined per use (BENCH.md), while
  * this expression is one fused Java loop inside whole-stage codegen.
  * `planes` must be ≤ 63 (bit-packed into one long); `seed` selects an
  * independent plane family (multi-table LSH uses one family per table).
  * `planes = 0` is the DEGENERATE configuration: zero hyperplanes → the
  * signature is the constant 0 for every vector → one bucket holding the
  * whole corpus, so bucketed LSH provably covers all pairs and degenerates
  * to exact brute force — the exactness anchor SparkEntry's e08 oracles
  * (the e05 nProbe==nCells trick applied to the hyperplane path).
  */
case class VecLshSignature(child: Expression, planes: Int, seed: Int = 0)
    extends UnaryExpression {

  require(planes >= 0 && planes <= 63, s"planes must be in [0, 63], got $planes")

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_lsh_signature"

  override def nullSafeEval(input: Any): Any =
    VecLshSignature.compute(input.asInstanceOf[ArrayData], planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val nd = ctx.freshName("nd")
      val acc = ctx.freshName("acc")
      val z = ctx.freshName("z")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      s"""
         |long $sig = 0L;
         |int $nd = $a.numElements();
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $nd; $i++) {
         |    long $z = ((long) ($seed + $p) * 0x2545F4914F6CDD1DL + (long) $i) + 0x9E3779B97F4A7C15L;
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    $acc += (double) $a.getFloat($i) * ((double) $z / 9.223372036854776E18);
         |  }
         |  if ($acc >= 0.0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecLshSignature =
    copy(child = newChild)
}

object VecLshSignature {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[VecLshSignature].getName, null, "vec_lsh_signature",
    "_FUNC_(vec, planes) - random-hyperplane LSH signature (long) of a float vector.", "")

  /** Interpreted twin of the generated code — loop order and FP accumulation
    * order are identical, so eval and codegen agree bit-for-bit.
    */
  def compute(v: ArrayData, planes: Int, seed: Int = 0): Long = {
    var sig = 0L
    val nd = v.numElements()
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var i = 0
      while (i < nd) {
        var z = ((seed + p).toLong * 0x2545F4914F6CDD1DL + i.toLong) + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        acc += v.getFloat(i).toDouble * (z.toDouble / 9.223372036854776e18)
        i += 1
      }
      if (acc >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
