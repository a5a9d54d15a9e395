package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import scala.collection.mutable

/** Misra-Gries frequent-items state: at most k counters TOTAL, regardless
  * of the key domain size. Offer beyond capacity triggers the classic
  * batch decrement (subtract the minimum surviving count, drop zeros);
  * merge adds counterpart counts then re-trims by the (k+1)-th largest
  * (Agarwal et al. 2013, "Mergeable Summaries"). Counts are LOWER bounds
  * with total undercount <= n/(k+1), so any item with true frequency
  * > n/(k+1) is guaranteed present in the final summary.
  */
final class MgBuffer(val k: Int) {
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

  def offer(item: UTF8String, w: Long): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + w)
      case None =>
        // store a COPY: the incoming UTF8String may point into a reused
        // row buffer that the next input row overwrites
        counts.update(item.clone(), w)
        if (counts.size > k) trim()
    }
  }

  /** Drop to <= k counters by subtracting the (k+1)-th largest count. */
  def trim(): Unit = {
    if (counts.size <= k) return
    val sorted = counts.values.toArray.sorted(Ordering[Long].reverse)
    val cut = sorted(k) // (k+1)-th largest
    val dead = counts.iterator.collect { case (t, c) if c <= cut => t }.toArray
    dead.foreach(counts.remove)
    counts.mapValuesInPlace((_, c) => c - cut)
  }

  def mergeFrom(o: MgBuffer): Unit = {
    o.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    trim()
  }
}

/** Native Misra-Gries heavy-hitters aggregate:
  * `heavy_hitters(item, k)` returns array<struct<token string,
  * lower_count bigint>> of at most k candidates, every item with true
  * frequency > n/(k+1) guaranteed included, ordered by lower_count DESC
  * then token (deterministic rendering of the final state).
  *
  * Scale rationale: a groupBy(key).count() over an UNBOUNDED key domain
  * (n-grams, URLs, shingles) builds hash state proportional to the
  * domain in every task before the exchange; this aggregate holds k
  * counters TOTAL per partition and merges map-side — frequent-item
  * discovery with O(k) memory at any corpus size. Counts are lower
  * bounds; callers wanting exact figures recount the <= k candidates
  * with a second cheap pass and filter by the guarantee threshold —
  * that confirmed output is deterministic and oracle-comparable (the
  * same sketch-prefilter + exact-confirm move as bloom decontamination).
  */
case class HeavyHitters(
    itemExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[MgBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(itemExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("lower_count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (itemExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a STRING item")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MgBuffer = {
    require(k >= 1, s"heavy_hitters k must be >= 1, got $k")
    new MgBuffer(k)
  }

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val item = itemExpr.eval(input)
    if (item != null) buffer.offer(item.asInstanceOf[UTF8String], 1L)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val rows = buffer.counts.toArray
      .sortBy { case (t, c) => (-c, t.toString) }
      .map { case (t, c) => InternalRow(t, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    val items = buffer.counts.toArray
    val bytes = items.map(_._1.getBytes)
    val size = 8 + items.length * 12 + bytes.map(_.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buffer.k).putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length).put(b).putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new MgBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      b.counts.update(UTF8String.fromBytes(arr), bb.getLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(itemExpr = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "heavy_hitters"
}
