package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a token array: per-token XXH64, 64
  * bit-majority counters, sign bits folded into one long — all PER ROW.
  *
  * Scale rationale: simhash needs only a document's OWN tokens, so the
  * explode → 64-column hash-aggregate formulation pays a full shuffle of
  * every token row (3M rows at sf0.1; the corpus token count at 100 TB)
  * to reassemble per-doc state this expression computes in place. The
  * signature stage becomes a zero-shuffle codegen'd projection; the only
  * remaining exchange in simhash dedup is the capped band self-join —
  * the one that actually needs cross-row data.
  *
  * Semantics: NULL for null or zero-token inputs (such docs previously
  * vanished at the explode — callers filter IS NOT NULL, keeping the
  * decision-table population identical). Every token occurrence counts
  * (multiset, not set). Null tokens are skipped.
  */
case class SimHash64(tokens: Expression) extends UnaryExpression {

  override def child: Expression = tokens

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "simhash64"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) null
    else SimHash64.hash(t.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toksCode = tokens.genCode(ctx)
    val r = ctx.freshName("simhashResult")
    ev.copy(code =
      code"""
         |${toksCode.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = -1L;
         |if (!${toksCode.isNull}) {
         |  java.lang.Long $r = graft.functions.SimHash64.hash(${toksCode.value});
         |  if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.longValue(); }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(tokens = newChild)
}

object SimHash64 {

  /** Kernel shared by interpreted eval and generated code. Returns null
    * for zero-token inputs.
    */
  def hash(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    if (n == 0) return null
    val counters = new Array[Int](64)
    var seen = 0
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      if (s != null) {
        seen += 1
        val h = XXH64.hashUTF8String(s, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    if (seen == 0) return null
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) > 0) out |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
}
