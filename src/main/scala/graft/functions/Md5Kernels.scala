package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Native kernels for the md5-portable hash family the oracle-gated
  * dedup twins run on (dedup_minhash_md5 / dedup_jaccard_md5 /
  * dedup_simhash_md5 / corpus_curate_md5).
  *
  * The portability contract is on the VALUES — every hash must equal
  * what ANSI SQL computes from the md5 hex string — not on the Spark
  * plan that produces them. These kernels reproduce, bit for bit, the
  * declarative md5+conv fold they replace (spec-pinned by exact
  * equality AND by the driver's hash-compare gate, whose oracle SQL is
  * untouched), while walking each document once with a reusable shingle
  * buffer and one MessageDigest per row — the same CodegenFallback-fold
  * removal that made the xxhash paths ~13x (ScaleProbe8).
  *
  * Nibble layout (md5 hex is big-endian nibbles of the 16 digest
  * bytes): `conv(substr(hex,1,15),16,10)` = digest bytes 0..6 plus the
  * HIGH nibble of byte 7 (60 bits, h1); `conv(substr(hex,16,8),16,10)`
  * = the LOW nibble of byte 7, bytes 8..10, and the HIGH nibble of
  * byte 11 (32 bits, h2). Kirsch-Mitzenmacher: h_j = h1 + j*h2.
  */
object Md5Kernels {

  private def newDigest(): MessageDigest = MessageDigest.getInstance("MD5")

  /** (h1, h2) of the digest of buf[0..len) — see nibble layout above.
    * Writes the digest into `out16` (reused across calls).
    */
  private def h1h2(
      md: MessageDigest, buf: Array[Byte], len: Int, out16: Array[Byte]): (Long, Long) = {
    md.reset()
    md.update(buf, 0, len)
    md.digest(out16, 0, 16)
    var h1 = 0L
    var i = 0
    while (i < 7) {
      h1 = (h1 << 8) | (out16(i) & 0xffL)
      i += 1
    }
    h1 = (h1 << 4) | ((out16(7) & 0xf0L) >>> 4)
    var h2 = out16(7) & 0x0fL
    h2 = (h2 << 8) | (out16(8) & 0xffL)
    h2 = (h2 << 8) | (out16(9) & 0xffL)
    h2 = (h2 << 8) | (out16(10) & 0xffL)
    h2 = (h2 << 4) | ((out16(11) & 0xf0L) >>> 4)
    (h1, h2)
  }

  /** Walks the 3-shingles of `toks` through one digest, calling `f` with
    * (h1, h2) per shingle. Returns the shingle count.
    */
  private def eachShingle(toks: ArrayData)(f: (Long, Long) => Unit): Int = {
    val w = new ShingleWalk(toks)
    if (w.count == 0) return 0
    val md = newDigest()
    val out16 = new Array[Byte](16)
    while (w.next()) {
      val (a, b) = h1h2(md, w.buf, w.len, out16)
      f(a, b)
    }
    w.count
  }

  /** Minhash signature: elementwise min of h1 + j*h2 over all shingles;
    * null when the doc has no shingles.
    */
  def minhashSig(toks: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = eachShingle(toks) { (h1, h2) =>
      var j = 0
      while (j < k) {
        val h = h1 + j.toLong * h2
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }
    if (n == 0) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Sorted distinct h1 values of all shingles (the jaccard set). */
  def shingleHashes(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hs = new Array[Long](n - 2)
    var w0 = 0
    eachShingle(toks) { (h1, _) => hs(w0) = h1; w0 += 1 }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** Sorted distinct h1 values of all k-token windows — the passage-
    * dedup window set ([[KgramMd5Hashes]]); empty for docs with < k
    * tokens. Same nibble contract as [[shingleHashes]] at any width.
    */
  def kgramHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hs = new Array[Long](n - k + 1)
    val walk = new ShingleWalk(toks, k)
    val md = newDigest()
    val out16 = new Array[Byte](16)
    var w0 = 0
    while (walk.next()) {
      val (h1, _) = h1h2(md, walk.buf, walk.len, out16)
      hs(w0) = h1
      w0 += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** 60-bit simhash from per-TOKEN h1 values (bit-majority); null for
    * zero-token docs.
    */
  def simhash60(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    if (n == 0) return null
    val md = newDigest()
    val out16 = new Array[Byte](16)
    val counters = new Array[Int](60)
    var seen = 0
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      if (s != null) {
        seen += 1
        val bytes = s.getBytes
        val (h1, _) = h1h2(md, bytes, bytes.length, out16)
        var j = 0
        while (j < 60) {
          if (((h1 >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    if (seen == 0) return null
    var out = 0L
    var j = 0
    while (j < 60) {
      if (counters(j) > 0) out |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
}

/** k-minima md5-KM minhash signature (see [[Md5Kernels]]). */
case class MinhashMd5Sig(tokens: Expression, k: Expression)
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
  override def prettyName: String = "minhash_md5_sig"

  @transient private lazy val kVal: Int = k.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) null
    else Md5Kernels.minhashSig(t.asInstanceOf[ArrayData], kVal)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toksCode = tokens.genCode(ctx)
    val r = ctx.freshName("sigResult")
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
         |${toksCode.code}
         |boolean ${ev.isNull} = true;
         |$ad ${ev.value} = null;
         |if (!${toksCode.isNull}) {
         |  $ad $r = graft.functions.Md5Kernels.minhashSig(${toksCode.value}, $kVal);
         |  if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashMd5Sig =
    copy(tokens = newLeft, k = newRight)
}

/** Sorted distinct md5-h1 shingle set (see [[Md5Kernels]]). */
case class ShingleMd5Hashes(tokens: Expression) extends UnaryExpression {

  override def child: Expression = tokens

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_md5_hashes"

  override protected def nullSafeEval(input: Any): Any =
    Md5Kernels.shingleHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Kernels.shingleHashes($s);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMd5Hashes =
    copy(tokens = newChild)
}

/** Sorted distinct md5-h1 hashes of all k-token windows (see
  * [[Md5Kernels.kgramHashes]]) — the passage-dedup window set; k is a
  * positive literal so codegen bakes it in.
  */
case class KgramMd5Hashes(tokens: Expression, k: Expression)
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
  override def prettyName: String = "kgram_md5_hashes"

  @transient private lazy val kVal: Int = k.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) null
    else Md5Kernels.kgramHashes(t.asInstanceOf[ArrayData], kVal)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toksCode = tokens.genCode(ctx)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
         |${toksCode.code}
         |boolean ${ev.isNull} = ${toksCode.isNull};
         |$ad ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.Md5Kernels.kgramHashes(${toksCode.value}, $kVal);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KgramMd5Hashes =
    copy(tokens = newLeft, k = newRight)
}

/** 60-bit md5 simhash (see [[Md5Kernels]]). */
case class SimHashMd5(tokens: Expression) extends UnaryExpression {

  override def child: Expression = tokens

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_md5"

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) null
    else Md5Kernels.simhash60(t.asInstanceOf[ArrayData])
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
         |  java.lang.Long $r = graft.functions.Md5Kernels.simhash60(${toksCode.value});
         |  if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.longValue(); }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(tokens = newChild)
}
