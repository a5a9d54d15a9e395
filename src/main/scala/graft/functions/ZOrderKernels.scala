package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering kernel — the MULTI-column data-skipping
  * lever ([[graft.sources.Clustered.saveZOrder]]). Range-clustering on
  * one key makes that key's row-group min/max tight and every other
  * key's useless; interleaving the bits of several keys' QUANTILE
  * BUCKETS into one sort value makes each row group a small
  * hyper-rectangle in the multi-key space, so a selective predicate on
  * ANY of the clustered keys skips most row groups (at the cost of
  * per-key skipping that is weaker than a dedicated single-key sort —
  * the standard trade, e.g. the Z-ordering in Delta/Iceberg compaction).
  *
  * Buckets are QUANTILE ranks, not equal-width slices: each key is
  * binary-searched against its own sorted boundary array (built from a
  * mergeable quantile sketch at write time — one pass, no global sort),
  * so skew in the raw domain cannot collapse the z-space onto a few
  * codes. Boundaries ride into generated code as one flattened
  * reference object (stride = boundaries per key).
  *
  * Bit interleave, k=2 keys at b bits each: bit j of bucket0 lands at
  * position 2j, bit j of bucket1 at 2j+1 → a 2b-bit z-value whose
  * prefix order recursively tiles the plane (the Morton curve).
  */
object ZOrderKernels {

  /** Quantile bucket of `v`: the count of boundaries <= v, via binary
    * search over the sorted slice bounds[off, off+len). Range [0, len].
    */
  def bucketOf(v: Long, bounds: Array[Long], off: Int, len: Int): Int = {
    var lo = 0
    var hi = len // invariant: bounds(off+i) <= v for i < lo; > v for i >= hi
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(off + mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Morton-interleave two bucket ids at `bits` bits each. */
  def interleave2(b0: Int, b1: Int, bits: Int): Long = {
    var z = 0L
    var j = 0
    while (j < bits) {
      z |= ((b0 >>> j) & 1L) << (2 * j)
      z |= ((b1 >>> j) & 1L) << (2 * j + 1)
      j += 1
    }
    z
  }

  /** The full kernel: bucket both keys against their boundary slices
    * (shared stride layout: key i's boundaries at [i*stride, i*stride +
    * stride)), interleave at ceil(log2(stride+1)) bits.
    */
  def zValue2(v0: Long, v1: Long, bounds: Array[Long], stride: Int): Long = {
    val bits = 32 - Integer.numberOfLeadingZeros(stride) // log2(stride+1) rounded up
    interleave2(
      bucketOf(v0, bounds, 0, stride),
      bucketOf(v1, bounds, stride, stride),
      bits)
  }
}

/** Z-value of two LONG keys against plan-time quantile boundaries — the
  * sort key [[graft.sources.Clustered.saveZOrder]] clusters on. The
  * flattened boundary array (key 0 at [0, stride), key 1 at [stride,
  * 2*stride), each slice sorted ascending) is a codegen reference
  * object.
  */
case class ZValue2(k0: Expression, k1: Expression, bounds: Array[Long], stride: Int)
    extends BinaryExpression with ModelArrayEquality {

  override def left: Expression = k0
  override def right: Expression = k1

  override def checkInputDataTypes(): TypeCheckResult =
    (k0.dataType, k1.dataType) match {
      case (LongType, LongType) if stride > 0 && bounds.length == 2 * stride =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: boundary array of ${bounds.length} does not split as 2 * stride=$stride")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, bigint), got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "z_value2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.zValue2(a.asInstanceOf[Long], b.asInstanceOf[Long], bounds, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zOrderBounds", bounds, "long[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderKernels.zValue2($a, $b, $ref, $stride);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue2 =
    copy(k0 = newLeft, k1 = newRight)
}
