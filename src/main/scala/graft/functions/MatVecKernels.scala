package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense matrix-vector rotation kernel for OPQ
  * ([[graft.operators.Opq]]): out = R * v, with the d x d rotation a
  * plan-time reference object (row-major). Cosine is
  * rotation-invariant for orthogonal R, so scoring in the rotated
  * space approximates the original cosine with whatever error the
  * downstream quantizer has THERE — which is the whole point: the
  * rotation is trained to make the quantizer's subspaces balanced and
  * decorrelated.
  *
  * Cost: d*d multiply-adds per vector (4096 at d=64) — paid once per
  * corpus vector at encode/index-build, once per query at search; both
  * are dominated by the m*ksub*dsub encode argmin (16k at defaults).
  */
object MatVecKernels {

  /** out[i] = sum_j R[i*d + j] * v[j], accumulated in doubles, rounded
    * to float per component (the rotated vector feeds float kernels).
    */
  def apply(vec: ArrayData, mat: Array[Float], d: Int): ArrayData = {
    val n = vec.numElements()
    if (n != d) {
      throw new IllegalArgumentException(
        s"mat_vec: vector has $n elements but a $d x $d matrix was configured")
    }
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) {
        s += mat(i * d + j).toDouble * vec.getFloat(j).toDouble
        j += 1
      }
      out(i) = s.toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Rotation of a float vector by a plan-time row-major d x d matrix. */
case class MatVecF(vec: Expression, mat: Array[Float], d: Int)
    extends UnaryExpression with ModelArrayEquality {

  override def child: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) if d > 0 && mat.length == d * d =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: matrix of ${mat.length} entries is not $d x $d")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "mat_vec"

  override protected def nullSafeEval(v: Any): Any =
    MatVecKernels(v.asInstanceOf[ArrayData], mat, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVecMat", mat, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.MatVecKernels.apply($v, $ref, $d);")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecF =
    copy(vec = newChild)
}
