package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH band values for a float vector: all
  * `planes` signed dot products in ONE pass over the vector, sign bits
  * packed into `bands` integers of planes/bands bits.
  *
  * Bit-identical to the composed formulation it replaces (per-plane
  * `cosine_sim(vec, w) > 0` with ±1 sign planes): sign(cosine) ==
  * sign(dot) because the norms are positive, and a zero vector yields
  * dot == 0 -> bit 0 on both paths. What changes is cost: the composed
  * plan ran `planes` separate cosine kernels, each re-walking the
  * vector and re-computing BOTH norms (3x the multiplies, `planes`
  * loop setups); this kernel accumulates every plane's dot in one walk
  * and never touches a norm.
  *
  * The ±1 sign matrix is the same splitmix-derived, plan-time-fixed
  * family as `Lsh.planeSigns` — deterministic across runs, engines,
  * and cluster sizes; it rides into generated code as a reference
  * object, not literals.
  */
case class HyperplaneBands(vec: Expression, planes: Int, bands: Int, dims: Int)
    extends UnaryExpression {

  override def child: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) if planes > 0 && bands > 0 && planes % bands == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires planes ($planes) divisible by bands ($bands)")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_bands"

  /** Flattened plane-major ±1 sign matrix, fixed at plan time. */
  @transient private lazy val signs: Array[Float] = {
    val out = new Array[Float](planes * dims)
    var p = 0
    while (p < planes) {
      val row = graft.operators.Lsh.planeSigns(p, dims)
      var j = 0
      while (j < dims) {
        out(p * dims + j) = row(j)
        j += 1
      }
      p += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBands.bandVals(input.asInstanceOf[ArrayData], signs, planes, bands, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("hyperplaneSigns", signs, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HyperplaneBands.bandVals(" +
        s"$v, $signsRef, $planes, $bands, $dims);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(vec = newChild)
}

object HyperplaneBands {

  /** Kernel shared by interpreted eval and generated code: one vector
    * walk accumulating every plane's dot, then sign-pack per band.
    */
  def bandVals(
      vec: ArrayData, signs: Array[Float], planes: Int, bands: Int, dims: Int): ArrayData = {
    val n = vec.numElements()
    // A wrong `dims` cannot be caught at type-check time (array length is
    // data-dependent), and silently banding a prefix/padded view produces
    // plausible-but-wrong buckets — fail loudly per row instead.
    if (n != dims) {
      throw new IllegalArgumentException(
        s"hyperplane_bands: vector has $n elements but dims=$dims was configured")
    }
    val dots = new Array[Double](planes)
    var j = 0
    while (j < n) {
      val v = vec.getFloat(j).toDouble
      if (v != 0.0) {
        var p = 0
        while (p < planes) {
          dots(p) += v * signs(p * dims + j)
          p += 1
        }
      }
      j += 1
    }
    val bitsPerBand = planes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var i = 0
      while (i < bitsPerBand) {
        if (dots(b * bitsPerBand + i) > 0.0) acc |= 1L << i
        i += 1
      }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
