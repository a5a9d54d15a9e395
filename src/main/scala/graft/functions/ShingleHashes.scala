package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Native hashed 3-shingle SET of a token array: one pass building each
  * shingle's bytes in a reusable buffer, one XXH64 per shingle, then
  * sort + dedupe — the per-doc set representation exact-Jaccard
  * verification joins on.
  *
  * Output is SORTED ASCENDING and DISTINCT, which is what lets
  * [[JaccardSim]] compute |A∩B| with a linear merge instead of hash-set
  * intersection. Empty (not null) for docs with fewer than 3 tokens, so
  * verify-join payloads stay total. Replaces
  * array_distinct(transform(shingles(toks), xxhash64)) — three chained
  * CodegenFallback higher-order functions and a per-shingle string
  * allocation.
  */
case class ShingleHashes(tokens: Expression) extends UnaryExpression {

  override def child: Expression = tokens

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShingleHashes.hashes($s);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(tokens = newChild)
}

object ShingleHashes {

  /** Kernel shared by interpreted eval and generated code: sorted
    * distinct XXH64 values of all word 3-shingles.
    */
  def hashes(toks: ArrayData): ArrayData = {
    val walk = new ShingleWalk(toks)
    if (walk.count == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hs = new Array[Long](walk.count)
    var i = 0
    while (walk.next()) {
      hs(i) = XXH64.hashUnsafeBytes(walk.buf, Platform.BYTE_ARRAY_OFFSET, walk.len, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w - 1)) {
        hs(w) = hs(r)
        w += 1
      }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }
}
