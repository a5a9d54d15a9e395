package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Structural equality for Catalyst expressions that carry a primitive
  * MODEL array (centroid matrix, PQ codebook, z-order bounds) as a
  * constructor field.
  *
  * Why this exists (r16 ADVICE closure): Scala's synthesized case-class
  * `equals` compares an `Array[_]` field by REFERENCE, so two
  * semantically identical expressions built from equal-content model
  * arrays never compare equal. Catalyst leans on expression equality
  * everywhere — `canonicalized`/`semanticEquals` for plan matching,
  * subexpression elimination for generated-code reuse, attribute-map
  * lookups — so reference-based equality silently defeats CSE and
  * plan canonicalization whenever the same kernel assignment appears
  * more than once in a plan (e.g. a cluster-id used in both a
  * projection and a groupBy key, each re-deriving the model from the
  * same training run).
  *
  * The fix keeps the primitive `float[]`/`long[]` fields (codegen and
  * eval want flat arrays, and `ctx.addReferenceObj` ships them as-is)
  * and overrides `equals`/`hashCode` to walk the case-class product,
  * comparing primitive arrays by CONTENT (`java.util.Arrays`) and
  * everything else — child expressions, scalar shape params — by `==`,
  * exactly reproducing case-class semantics otherwise. Mixed into
  * every kernel expression with a model-array field; the synthesized
  * case-class methods are suppressed by these explicit overrides.
  *
  * Cost note: content comparison of a k*dims model is O(model size),
  * but equality on two DIFFERENT models short-circuits at the first
  * differing element, and `hashCode` memoizes its O(model size) walk
  * in a lazy val — nothing in TreeNode or the synthesized case class
  * caches hashCode, and planner hash structures (ExpressionSet,
  * attribute maps, CSE) call it repeatedly per plan, which at k=1024 ×
  * 64-float centroids would be 65k multiply-adds per call. Expressions
  * are immutable, so one computation is sound; `@transient` because a
  * serialized kernel re-derives it on the executor rather than
  * shipping a stale int.
  */
trait ModelArrayEquality extends Expression {

  override def equals(other: Any): Boolean = other match {
    case that: ModelArrayEquality if that.getClass == this.getClass =>
      (this eq that) || {
        val a = this.productIterator
        val b = that.productIterator
        var same = true
        while (same && a.hasNext && b.hasNext) same = fieldEquals(a.next(), b.next())
        same && !a.hasNext && !b.hasNext
      }
    case _ => false
  }

  @transient private lazy val memoizedHash: Int = {
    var h = getClass.getName.hashCode
    productIterator.foreach(f => h = h * 31 + fieldHash(f))
    h
  }

  override def hashCode(): Int = memoizedHash

  private def fieldEquals(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Array[Float], y: Array[Float]) => java.util.Arrays.equals(x, y)
    case (x: Array[Double], y: Array[Double]) => java.util.Arrays.equals(x, y)
    case (x: Array[Long], y: Array[Long]) => java.util.Arrays.equals(x, y)
    case (x: Array[Int], y: Array[Int]) => java.util.Arrays.equals(x, y)
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case _ => a == b
  }

  private def fieldHash(f: Any): Int = f match {
    case x: Array[Float] => java.util.Arrays.hashCode(x)
    case x: Array[Double] => java.util.Arrays.hashCode(x)
    case x: Array[Long] => java.util.Arrays.hashCode(x)
    case x: Array[Int] => java.util.Arrays.hashCode(x)
    case x: Array[Byte] => java.util.Arrays.hashCode(x)
    case null => 0
    case other => other.hashCode()
  }
}
