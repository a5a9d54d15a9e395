package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded top-k accumulator: at most 2k candidate pairs held, trimmed back
  * to k by partial sort. Total order: sim DESC, then id ASC (deterministic
  * across partition orders).
  */
final class TopKBuffer(val k: Int) {
  var ids = new Array[Long](2 * k)
  var sims = new Array[Double](2 * k)
  var n = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(id: Long, sim: Double): Unit = {
    if (n == 2 * k) trim()
    ids(n) = id; sims(n) = sim; n += 1
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.ids(i), o.sims(i)); i += 1 }
  }

  /** Keep only the best k entries (sorted). */
  def trim(): Unit = {
    val idx = Array.range(0, n).sortWith((a, b) => better(sims(a), ids(a), sims(b), ids(b)))
    val keep = math.min(k, n)
    val nid = new Array[Long](2 * k)
    val nsim = new Array[Double](2 * k)
    var i = 0
    while (i < keep) { nid(i) = ids(idx(i)); nsim(i) = sims(idx(i)); i += 1 }
    ids = nid; sims = nsim; n = keep
  }
}

/** Native bounded top-k-by-score aggregate: `top_k_by_score(id, score, k)`
  * returns array<struct<neighbor_id bigint, sim double>> of the k highest
  * scores (ties broken by lower id).
  *
  * Scale rationale: window `row_number() OVER (ORDER BY score DESC)` fully
  * sorts every group; this aggregate keeps a bounded heap per group per
  * partition and merges heaps map-side — memory O(k), no sort, standard
  * partial aggregation. The scale-correct per-key top-k.
  */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(math.max(k, 1))

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null)
      buffer.insert(id.asInstanceOf[Number].longValue(), score.asInstanceOf[Number].doubleValue())
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    buffer.trim()
    val rows = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      rows(i) = InternalRow(buffer.ids(i), buffer.sims(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    buffer.trim()
    val bb = ByteBuffer.allocate(8 + buffer.n * 16)
    bb.putInt(buffer.k).putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.ids(i)).putDouble(buffer.sims(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { b.insert(bb.getLong(), bb.getDouble()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1), kExpr = newChildren(2))

  override def prettyName: String = "top_k_by_score"
}
