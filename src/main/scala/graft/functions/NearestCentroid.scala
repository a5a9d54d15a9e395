package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Coarse-quantizer assignment as ONE kernel: argmax-cosine over k
  * centroids carried as a flat reference object.
  *
  * Why this exists: the literal formulation ([[graft.operators.Ivf]]'s
  * original `nearestClusters`) builds an array of k struct(cosine_sim,
  * id) sub-expressions — k inlined kernels PER ROW in the generated
  * code. That is fine at the k=8–64 this repo serves locally, but the
  * IVF regime at 100 TB wants k in the thousands (cells ~ corpus/k
  * bounds both inverted-list length and SemDeDup's within-cell pair
  * count), where a k-element expression tree explodes the generated
  * method past JIT/constant-pool limits and falls out of codegen
  * entirely. Here the centroid matrix rides into the generated code as
  * ONE reference object (the [[PqKernels]] codebook pattern) and the
  * argmax is a static loop — generated-code size is O(1) in k.
  *
  * Semantics are BIT-IDENTICAL to the literal argmax it replaces for
  * every NON-NULL vector (spec-pinned over real embeddings, incl.
  * duplicate-centroid ties and k=1024): per-centroid cosine
  * accumulates doubles in index order exactly like [[CosineSim]]
  * (zero-norm → 0.0; a vector shorter than `dims` compares its
  * prefix), and the argmax uses `Double.compare` — ties on sim keep
  * the SMALLEST centroid id, matching the struct-sort tie-break.
  * Ordering fine print: `Double.compare` and Spark's
  * nanSafeCompareDoubles agree on NaN (greatest) but DISAGREE on
  * ±0.0 (-0.0 < 0.0 vs equal); a -0.0 sim is unreachable from
  * float-array cosines (the dot is +0.0 or its magnitude is far
  * above the underflow threshold of the norm quotient), so the edge
  * cannot fire — recheck this if the input type ever widens.
  * DELIBERATE divergence: a NULL vector yields a NULL cluster (the
  * standard null-intolerant expression contract) where the literal
  * form accidentally produced cluster 0 from all-NULL sims.
  */
object NearestCentroidKernel {

  def nearest(vec: ArrayData, flat: Array[Float], k: Int, dims: Int): Int = {
    // the query side of every cosine is loop-invariant: hoisting its
    // norm and prefix length drops one of the three FMAs from the
    // k*dims hot loop, bit-identically (nx accumulates in the same
    // index order whether or not dot/ny interleave)
    val n = math.min(vec.numElements(), dims)
    var nx = 0.0
    var i = 0
    while (i < n) {
      val xi = vec.getFloat(i).toDouble
      nx += xi * xi
      i += 1
    }
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val base = c * dims
      var dot = 0.0
      var ny = 0.0
      var j = 0
      while (j < n) {
        val xj = vec.getFloat(j).toDouble
        val yj = flat(base + j).toDouble
        dot += xj * yj
        ny += yj * yj
        j += 1
      }
      val sim = if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
      if (java.lang.Double.compare(sim, bestSim) > 0) { bestSim = sim; best = c }
      c += 1
    }
    best
  }
}

/** Nearest-centroid id (argmax cosine, ties → smallest id) of a float
  * vector against a flat centroid-major matrix of k*dims floats.
  */
case class NearestCentroid(vec: Expression, centroids: Array[Float], k: Int, dims: Int)
    extends UnaryExpression with ModelArrayEquality {

  override def child: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) if k > 0 && dims > 0 && centroids.length == k * dims =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: centroid matrix of ${centroids.length} floats does not factor " +
          s"as k=$k * dims=$dims")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroidKernel.nearest(v.asInstanceOf[ArrayData], centroids, k, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCentroidKernel.nearest($v, $cRef, $k, $dims);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(vec = newChild)
}
