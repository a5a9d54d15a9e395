package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native symmetric-int8 quantization of a float vector into PACKED bytes:
  * one BINARY value of exactly `dims` bytes, each the signed code
  * `floor(x * 127 / amax + 0.5)` (same correctly-rounded rule as the
  * array-typed [[graft.operators.Similarity.quantizeInt8]] — floor(+0.5)
  * because HALF_UP vs away-from-zero disagree on negative halves across
  * engines). All-zero vectors take the declared zero lane: all-zero bytes.
  *
  * Scale rationale: this is the STORAGE form of the int8 story. The
  * array<int> codes the q73 oracle gates are 4-16 bytes per dim on disk
  * and in every exchange; packed bytes are 1 byte per dim — a 64-dim
  * embedding goes 256+ B -> 64 B, the 4-16x that decides whether a
  * 100 TB corpus's codes fit the cluster's page cache. The dequant scale
  * (amax/127) is a separate DOUBLE column — and cosine ranking never
  * reads it, because per-vector scales cancel in dot/sqrt(norm*norm).
  */
case class Int8Codes(vec: Expression) extends UnaryExpression {

  override def child: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def prettyName: String = "int8_codes"

  override protected def nullSafeEval(v: Any): Any =
    Int8Codes.pack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.functions.Int8Codes.pack($v);")

  override protected def withNewChildInternal(newChild: Expression): Int8Codes =
    copy(vec = newChild)
}

object Int8Codes {
  /** Two passes over one small in-L1 float array: amax, then codes. */
  def pack(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var amax = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > amax) amax = a
      i += 1
    }
    if (amax != 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(v.getFloat(i).toDouble * 127.0 / amax + 0.5).toInt.toByte
        i += 1
      }
    }
    out
  }
}

/** Native cosine similarity over two PACKED int8 code vectors (BINARY
  * columns from [[Int8Codes]]): pure integer dot and norms in long
  * arithmetic, one double division at the end. Per-vector quantization
  * scales cancel in dot/sqrt(nx*ny), so this ranks identically to
  * dequantized cosine without ever touching the scale column.
  *
  * Value-exact vs routing the codes through the float kernel
  * ([[CosineSim]] over CAST(codes AS ARRAY<FLOAT>)): every |code| <= 127,
  * so products and sums are exact integers well under 2^53 in both
  * paths — the spec pins bit-equal doubles. Unequal lengths compare over
  * the common prefix, like the float kernel (callers validate dims).
  */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two binary arguments, got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "int8_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Int8Cosine.sim(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Int8Cosine.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Int8Cosine =
    copy(left = newLeft, right = newRight)
}

object Int8Cosine {
  /** Signed-byte dot/norms in long; exact-integer doubles at the end so
    * the result bit-matches the float kernel over cast codes.
    */
  def sim(x: Array[Byte], y: Array[Byte]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0L
    var nx = 0L
    var ny = 0L
    var i = 0
    while (i < n) {
      val xi = x(i).toLong
      val yi = y(i).toLong
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0L || ny == 0L) 0.0
    else dot.toDouble / math.sqrt(nx.toDouble * ny.toDouble)
  }
}
