package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: one pass over the string's UTF-8 bytes,
  * emitting non-empty tokens split on runs of ASCII whitespace.
  *
  * Byte-exact contract: identical output to
  * `filter(split(text, "\\s+"), x -> x != "")` — Java regex `\s` is
  * exactly { space, \t, \n, vertical-tab 0x0B, \f, \r }, all single-byte ASCII, and
  * UTF-8 continuation/lead bytes of multi-byte characters are >= 0x80,
  * so a byte-level scan can never split inside a multi-byte character.
  * The parity is what keeps every tokenizing query hash-green against
  * the DuckDB oracle's regexp_split_to_array (spec-pinned on real data
  * plus whitespace-zoo edge cases).
  *
  * Scale rationale: tokenization is the flat per-row cost under EVERY
  * text operator (token counts, quality, lang-id, shingles, the whole
  * dedup family, the curation stage table). The declarative
  * split+filter pair allocates the full split array, then re-allocates
  * through an interpreted ArrayFilter lambda (CodegenFallback, which
  * also drags its whole projection out of WholeStageCodegen). This
  * expression is codegen-friendly and allocates once per row (the byte
  * copy) plus one slice header per token.
  */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "ws_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WsTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WsTokens.tokens($s);")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

object WsTokens {

  private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** Kernel shared by interpreted eval and generated code. The input's
    * bytes are copied once (getBytes copies whenever the string views a
    * shared row/vector buffer), and every token is a zero-copy slice of
    * that private array.
    */
  def tokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
    }
    new GenericArrayData(out.toArray)
  }
}
