package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types._

/** Shared bloom-filter bit math for the aggregate (build) and the scalar
  * membership probe. Deterministic by construction: the k probe positions
  * of a 64-bit key are fixed functions of the key, so the same corpus
  * always builds the same filter — no RNG, no seed drift across runs.
  *
  * Position derivation is Kirsch–Mitzenmacher double hashing (same scheme
  * as MinhashMd5Sig): g_i = h1 + i*h2 over the bit-index space, with
  * h1 = key and h2 = splitmix64(key) forced odd. numBits must be a power
  * of two so the modulo is a mask.
  */
object BloomKernel {
  /** splitmix64 finalizer — mixes the raw key into an independent stream. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(bytes: Array[Byte], key: Long, numHashes: Int): Unit = {
    val mask = bytes.length.toLong * 8 - 1
    val h2 = mix64(key) | 1L
    var i = 0
    var g = key
    while (i < numHashes) {
      val pos = (g & mask).toInt
      bytes(pos >>> 3) = (bytes(pos >>> 3) | (1 << (pos & 7))).toByte
      g += h2
      i += 1
    }
  }

  /** Membership probe — true means "maybe present", false means "definitely
    * absent". Called from generated code (see [[BloomContains.doGenCode]]).
    */
  def contains(bytes: Array[Byte], key: Long, numHashes: Int): Boolean = {
    val mask = bytes.length.toLong * 8 - 1
    val h2 = mix64(key) | 1L
    var i = 0
    var g = key
    while (i < numHashes) {
      val pos = (g & mask).toInt
      if ((bytes(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      g += h2
      i += 1
    }
    true
  }
}

/** Native bloom-filter build aggregate: `bloom_agg(key, numBits, numHashes)`
  * folds a BIGINT key column into a `binary` bloom filter of numBits bits
  * (numBits must be a power of two; the blob is numBits/8 bytes).
  *
  * Scale rationale: the decontamination / anti-join prefilter pattern needs
  * the SMALL side (an eval-benchmark shingle set, a blocklist, a seen-ids
  * table) represented compactly enough to broadcast when the full string or
  * even hash table no longer fits the broadcast threshold. A bloom filter is
  * bits-per-key instead of bytes-per-row: 100M keys fit in 128 MB at 10
  * bits/key. The aggregate is a standard partial agg — each task folds its
  * partition into a local filter, merge is a byte-wise OR — so the build
  * never shuffles the keys themselves.
  */
case class BloomAgg(
    keyExpr: Expression,
    numBitsExpr: Expression,
    numHashesExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val numBits: Long =
    numBitsExpr.eval(InternalRow.empty).asInstanceOf[Number].longValue()
  private lazy val numHashes: Int =
    numHashesExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(keyExpr, numBitsExpr, numHashesExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT key")
    else if (!numBitsExpr.foldable || !numHashesExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires literal numBits/numHashes")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = {
    require(numBits >= 8 && (numBits & (numBits - 1)) == 0,
      s"bloom_agg numBits must be a power of two >= 8, got $numBits")
    // 2^33 bits = 1 GiB per buffer — anything larger silently overflows
    // the byte-array Int length; refuse loudly instead
    require(numBits <= (1L << 33),
      s"bloom_agg numBits capped at 2^33 (1 GiB), got $numBits")
    new Array[Byte]((numBits / 8).toInt)
  }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val k = keyExpr.eval(input)
    if (k != null) BloomKernel.set(buffer, k.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) { buffer(i) = (buffer(i) | other(i)).toByte; i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(keyExpr = newChildren(0), numBitsExpr = newChildren(1), numHashesExpr = newChildren(2))

  override def prettyName: String = "bloom_agg"
}

/** Membership probe against a [[BloomAgg]]-built filter:
  * `bloom_contains(bloom, key, numHashes)` — false is definitive, true may
  * be a false positive (callers confirm survivors with an exact join).
  * Codegen'd so the probe runs inside WholeStageCodegen on the big side's
  * scan — the hot path touches k cache lines per row and nothing else.
  *
  * USAGE RULE (ScaleProbe9): pass the bloom as a LITERAL (collect the
  * 1-row build first), never as a column riding a join row — UnsafeRow
  * .getBinary COPIES the blob on every eval, so an in-plan 1-row
  * crossJoin attach costs one multi-MB allocation per probed row and
  * melts at corpus scale, while a Literal is one object per task that
  * generated code references directly.
  */
case class BloomContains(
    bloomExpr: Expression,
    keyExpr: Expression,
    numHashesExpr: Expression,
) extends TernaryExpression {

  override def first: Expression = bloomExpr
  override def second: Expression = keyExpr
  override def third: Expression = numHashesExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloomExpr.dataType == BinaryType && keyExpr.dataType == LongType &&
      numHashesExpr.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint, int), got " +
          children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(bloom: Any, key: Any, k: Any): Any =
    BloomKernel.contains(
      bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, key, k) => {
      s"${ev.value} = graft.functions.BloomKernel.contains($bloom, $key, $k);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomContains =
    copy(bloomExpr = newFirst, keyExpr = newSecond, numHashesExpr = newThird)
}
