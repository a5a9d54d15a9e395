package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The md5 kernels' entire correctness claim is VALUE-identity with the
  * declarative ANSI md5+conv formulations the oracle SQL mirrors — these
  * specs pin that identity expression-by-expression on random docs
  * (incl. multi-byte tokens), on top of the driver's hash-compare gate.
  */
class Md5KernelsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private val k = 16

  private def docsDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val vocab = Seq("spark", "data", "Grüße", "日本語", "q", "hash", "x", "yz")
    (0 until 40).map(i => Seq.fill(rnd.nextInt(50))(vocab(rnd.nextInt(vocab.size))))
      .toDF("toks")
  }

  private def shingles3 = {
    val t = col("toks")
    when(size(t) >= 3,
      transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", slice(t, i + lit(1), lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

  test("minhash_md5_sig equals the declarative md5+conv KM fold exactly") {
    val declSig =
      when(size(shingles3) === 0, lit(null).cast("array<long>"))
        .otherwise(aggregate(
          shingles3,
          array_repeat(lit(Long.MaxValue), k),
          (acc, s) => {
            val h1 = conv(substring(md5(s), 1, 15), 16, 10).cast("long")
            val h2 = conv(substring(md5(s), 16, 8), 16, 10).cast("long")
            zip_with(
              acc,
              transform(sequence(lit(0), lit(k - 1)), j => h1 + j.cast("long") * h2),
              (a, h) => least(a, h))
          }))
    val got = docsDf.select(
      gfunctions.minhash_md5_sig(col("toks"), k).as("native"),
      declSig.as("decl")).collect()
    got.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"${r.getSeq[Long](0)} != ${r.getSeq[Long](1)}")
    }
    assert(got.exists(!_.isNullAt(0)), "some docs must produce signatures")
  }

  test("shingle_md5_hashes equals the declarative distinct h1 set (as sets)") {
    val declSet = array_distinct(
      transform(shingles3, s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
    val got = docsDf.select(
      gfunctions.shingle_md5_hashes(col("toks")).as("native"),
      declSet.as("decl")).collect()
    got.foreach { r =>
      val native = r.getSeq[Long](0)
      val decl = r.getSeq[Long](1)
      assert(native == native.distinct.sorted, "kernel output is sorted distinct")
      assert(native.toSet == decl.toSet, s"set mismatch: $native vs $decl")
    }
  }

  test("simhash_md5 equals the declarative explode + bit-majority aggregate") {
    import spark.implicits._
    val ids = docsDf.withColumn("doc_id", monotonically_increasing_id())
    val tok = ids.select(col("doc_id"), explode(col("toks")).as("t"))
      .withColumn("h", conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until 60).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j")
    }
    val fold = (0 until 60)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val decl = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fold.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = ids
      .select(col("doc_id"), gfunctions.simhash_md5(col("toks")).as("simhash"))
      .filter(col("simhash").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == decl, "per-row kernel must match the aggregate value-for-value")
    assert(native.nonEmpty)
  }
}
