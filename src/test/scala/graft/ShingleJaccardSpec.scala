package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShingleJaccardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private def refHashes(tokens: Seq[String]): Seq[Long] =
    tokens.sliding(3).filter(_.length == 3).map { sh =>
      val bytes = sh.mkString(" ").getBytes("UTF-8")
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    }.toSeq.distinct.sorted

  test("shingle_hashes matches the reference: sorted, distinct, multi-byte safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Seq("spark", "data", "Grüße", "日本語", "q", "repeat", "repeat")
    val docs = (0 until 30).map(i => Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    val got = docs.toDF("toks")
      .select(gfunctions.shingle_hashes(col("toks")).as("sh"))
      .collect().map(_.getSeq[Long](0))
    docs.zip(got).foreach { case (d, g) =>
      assert(g.toSeq == refHashes(d), s"mismatch for $d")
    }
  }

  test("jaccard_sim equals the declarative intersect/union division exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val pairs = (0 until 50).map { _ =>
      val base = Seq.fill(30 + rnd.nextInt(40))(s"t${rnd.nextInt(30)}")
      val mut = base.map(t => if (rnd.nextInt(10) == 0) s"m${rnd.nextInt(30)}" else t)
      (base, mut)
    }
    val df = pairs.toDF("a", "b").select(
      gfunctions.shingle_hashes(col("a")).as("sa"),
      gfunctions.shingle_hashes(col("b")).as("sb"))
    val got = df.select(
      gfunctions.jaccard_sim(col("sa"), col("sb")).as("native"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb")))).as("declarative"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getDouble(0) == r.getDouble(1), s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("shingle_xor64 matches the reference fold; order-independent; null under 3 tokens") {
    import spark.implicits._
    def refXor(tokens: Seq[String]): Option[Long] = {
      val hs = tokens.sliding(3).filter(_.length == 3).map { sh =>
        val bytes = sh.mkString(" ").getBytes("UTF-8")
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      }.toSeq
      if (hs.isEmpty) None else Some(hs.reduce(_ ^ _))
    }
    val rnd = new scala.util.Random(41)
    val docs = (0 until 25).map(i => Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(12)}"))
    val got = docs.toDF("toks")
      .select(gfunctions.shingle_xor64(col("toks")).as("f"))
      .collect()
    docs.zip(got).foreach { case (d, r) =>
      refXor(d) match {
        case None => assert(r.isNullAt(0), s"expected null for $d")
        case Some(want) => assert(r.getLong(0) == want, s"mismatch for $d")
      }
    }
  }

  test("jaccard_sim edge cases: identical -> 1.0, disjoint -> 0.0, both empty -> null") {
    import spark.implicits._
    val a = Seq.fill(20)("x y z".split(" ")).flatten
    val b = Seq.fill(20)("p q r".split(" ")).flatten
    val rows = Seq((a, a), (a, b), (Seq.empty[String], Seq.empty[String]))
    val got = rows.toDF("a", "b").select(
      gfunctions.jaccard_sim(
        gfunctions.shingle_hashes(col("a")),
        gfunctions.shingle_hashes(col("b"))).as("j"))
      .collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).getDouble(0) == 0.0)
    assert(got(2).isNullAt(0))
  }
}
