package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Deterministic TEXT-DERIVED embedding: the feature-hashing ("hashing
  * trick") projection of a token multiset into a unit-norm float
  * vector, as one zero-shuffle codegen'd kernel (the [[SimHash64]]
  * shape, real-valued output instead of sign bits).
  *
  * Per token occurrence: h = XXH64(token, seed 42) — the engine's
  * standard token hash; bucket (h >>> 1) mod dims accumulates sign
  * 2*(h & 1) - 1. The accumulated integer histogram L2-normalizes to
  * the output vector (all-cancelled histograms return the zero vector,
  * which every cosine kernel in the engine already maps to sim 0).
  *
  * Why this exists: the synthetic embeddings table is label-driven, so
  * SemDeDup/ANN over it never see vectors that MEAN anything about the
  * documents they curate. This featurizer ties the two corpora: a
  * bag-of-words projection is token-ORDER-independent, so paraphrases
  * (same words, reordered) map to identical vectors, and texts sharing
  * most tokens land at high cosine — the planted-paraphrase semantics
  * DedupSpec pins end-to-end through semDeDup. The md5-law twin
  * (q80_text_embed_md5's explode+aggregate formulation) puts the same
  * bucket/sign/normalize pipeline under the DuckDB hash gate.
  *
  * NULL for null input or zero usable tokens (the [[SimHash64]]
  * contract); null tokens are skipped.
  */
case class HashedProjection(tokens: Expression, dims: Int)
    extends UnaryExpression {

  override def child: Expression = tokens

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) if dims > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires dims > 0, got $dims")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "hashed_projection"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) null
    else HashedProjection.project(t.asInstanceOf[ArrayData], dims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toksCode = tokens.genCode(ctx)
    val r = ctx.freshName("hashedProj")
    ev.copy(code =
      code"""
         |${toksCode.code}
         |boolean ${ev.isNull} = true;
         |ArrayData ${ev.value} = null;
         |if (!${toksCode.isNull}) {
         |  ArrayData $r = graft.functions.HashedProjection.project(${toksCode.value}, $dims);
         |  if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedProjection =
    copy(tokens = newChild)
}

object HashedProjection {

  /** Kernel shared by interpreted eval and generated code. Returns null
    * for zero-usable-token inputs.
    */
  def project(toks: ArrayData, dims: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return null
    val acc = new Array[Long](dims)
    var seen = 0
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      if (s != null) {
        seen += 1
        val h = XXH64.hashUTF8String(s, 42L)
        val idx = ((h >>> 1) % dims).toInt
        acc(idx) += (if ((h & 1L) == 1L) 1L else -1L)
      }
      i += 1
    }
    if (seen == 0) return null
    normalize(acc)
  }

  /** Integer histogram -> unit-norm float vector; the SHARED tail of the
    * xxh kernel and the md5-law twin (exact integer sum of squares, one
    * sqrt, one correctly-rounded division per component — engine-order
    * independent, which is what lets the twin sit under the hash gate).
    */
  def normalize(acc: Array[Long]): ArrayData = {
    var ss = 0.0
    var i = 0
    while (i < acc.length) { ss += acc(i).toDouble * acc(i).toDouble; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Float](acc.length)
    if (norm > 0.0) {
      i = 0
      while (i < acc.length) { out(i) = (acc(i).toDouble / norm).toFloat; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
