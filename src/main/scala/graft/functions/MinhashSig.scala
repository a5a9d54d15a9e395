package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Native Catalyst minhash signature over a token array: k xxhash64-seeded
  * minima across all word 3-shingles, in ONE tight pass.
  *
  * Scale rationale: the minhash signature fold is the hottest per-row
  * compute in the dedup family — every document pays
  * O(shingles × k hashes). The declarative formulation
  * (aggregate/transform/zip_with over concat_ws shingles) is correct but
  * runs as CodegenFallback: interpreted lambda frames, a boxed Long per
  * hash, and a k-element array allocation per shingle. This expression
  * compiles into WholeStageCodegen and hashes each shingle's bytes k
  * times from one reusable byte buffer — no boxing, no per-shingle
  * arrays, no expression-tree walks.
  *
  * Semantics: NULL for null input or documents with fewer than 3 tokens
  * (no shingles — callers filter sig IS NOT NULL before banding, so empty
  * docs can never bucket together). Null tokens hash as empty strings
  * (production tokenizers never emit them). Seeds are 0..k-1; the exact
  * hash values differ from the declarative xxhash64(i, s) chain — this is
  * the rows-only production path, the oracle-gated md5 family is a
  * separate pipeline.
  */
case class MinhashSig(tokens: Expression, k: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = k

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) if k.foldable && k.dataType == IntegerType =>
      val kv = k.eval()
      if (kv != null && kv.asInstanceOf[Int] > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a positive literal k")
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int literal), got " +
          s"${tokens.dataType.simpleString} and ${k.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  @transient private lazy val kVal: Int = k.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) null
    else MinhashSig.sig(t.asInstanceOf[ArrayData], kVal)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toksCode = tokens.genCode(ctx)
    val r = ctx.freshName("sigResult")
    val ad = classOf[ArrayData].getName
    val kernel = "graft.functions.MinhashSig" // static forwarder to the object kernel
    ev.copy(code =
      code"""
         |${toksCode.code}
         |boolean ${ev.isNull} = true;
         |$ad ${ev.value} = null;
         |if (!${toksCode.isNull}) {
         |  $ad $r = $kernel.sig(${toksCode.value}, $kVal);
         |  if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): MinhashSig =
    copy(tokens = newLeft, k = newRight)
}

object MinhashSig {

  /** Kernel shared by interpreted eval and generated code: one pass over
    * the 3-shingles, k seeded XXH64 hashes per shingle from a reusable
    * byte buffer. Returns null when the doc has no shingles.
    */
  def sig(toks: ArrayData, k: Int): ArrayData = {
    val w = new ShingleWalk(toks)
    if (w.count == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    while (w.next()) {
      var j = 0
      while (j < k) {
        val h = XXH64.hashUnsafeBytes(w.buf, Platform.BYTE_ARRAY_OFFSET, w.len, j.toLong)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
