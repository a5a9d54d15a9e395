package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Native order-independent document fingerprint: XOR fold of the XXH64
  * of every word 3-shingle (multiset — every occurrence folds), one pass
  * with the shared reusable-buffer shingle walk. NULL when the doc has
  * no shingles (callers fall back, e.g. to a whole-text hash).
  *
  * XOR is commutative/associative, so the fingerprint is partition- and
  * order-deterministic by construction — the property the q33
  * fingerprint family is built on. Same CodegenFallback-fold
  * replacement story as [[MinhashSig]] (ScaleProbe8 class: ~13x).
  */
case class ShingleXor64(tokens: Expression) extends UnaryExpression {

  override def child: Expression = tokens

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "shingle_xor64"

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) null
    else ShingleXor64.fold(t.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toksCode = tokens.genCode(ctx)
    val r = ctx.freshName("xorResult")
    ev.copy(code =
      code"""
         |${toksCode.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = -1L;
         |if (!${toksCode.isNull}) {
         |  java.lang.Long $r = graft.functions.ShingleXor64.fold(${toksCode.value});
         |  if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.longValue(); }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleXor64 =
    copy(tokens = newChild)
}

object ShingleXor64 {

  /** Kernel shared by interpreted eval and generated code. */
  def fold(toks: ArrayData): java.lang.Long = {
    val w = new ShingleWalk(toks)
    if (w.count == 0) return null
    var acc = 0L
    while (w.next()) {
      acc ^= XXH64.hashUnsafeBytes(w.buf, Platform.BYTE_ARRAY_OFFSET, w.len, 42L)
    }
    java.lang.Long.valueOf(acc)
  }
}
