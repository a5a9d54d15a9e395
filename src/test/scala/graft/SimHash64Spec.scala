package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimHash64Spec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  /** Independent reference: per-token XXH64(seed 42) bit-majority. */
  private def ref(tokens: Seq[String]): Option[Long] = {
    if (tokens.isEmpty) return None
    val counters = new Array[Int](64)
    tokens.foreach { t =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(org.apache.spark.unsafe.types.UTF8String.fromString(t), 42L)
      (0 until 64).foreach { j =>
        if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
      }
    }
    Some((0 until 64).foldLeft(0L)((acc, j) => if (counters(j) > 0) acc | (1L << j) else acc))
  }

  test("simhash64 matches the reference bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Seq("spark", "data", "Grüße", "日本語", "query", "x", "hash")
    val docs = (0 until 30).map(i => Seq.fill(1 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size))))
    val got = docs.toDF("toks")
      .select(gfunctions.simhash64(col("toks")).as("sh"))
      .collect().map(_.getLong(0))
    docs.zip(got).foreach { case (d, g) => assert(ref(d).contains(g), s"mismatch for $d") }
  }

  test("simhash64 is NULL for empty or null token arrays") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], null).toDF("toks")
      .select(gfunctions.simhash64(col("toks")).as("sh"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("simhash64 runs inside WholeStageCodegen and identical docs collide") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toked = docs.select(col("doc_id"), gfunctions.ws_tokens(col("text")).as("toks"))
      .localCheckpoint()
    val df = toked.select(gfunctions.simhash64(col("toks")).as("sh"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [simhash64"),
      s"expected codegen'd projection in:\n$plan")
    assert(df.filter(col("sh").isNotNull).count() > 0)
  }

  test("identical token multisets collide exactly; token order is irrelevant") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val doc = (0 until 100).map(i => s"tok${rnd.nextInt(80)}")
    val m = Seq(("a", doc), ("b", doc), ("shuffled", rnd.shuffle(doc)))
      .toDF("id", "toks")
      .select(col("id"), gfunctions.simhash64(col("toks")).as("sh"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"), "identical docs collide at hamming 0")
    assert(m("a") == m("shuffled"), "simhash is a bag-of-tokens signature")
    // radius behavior on realistic near-dups is pinned through the real
    // operator in DedupSpec ("near dups within radius")
  }
}
