package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinhashSigSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  /** Independent reference: k seeded XXH64 minima over the 3-shingle
    * byte strings — must match the kernel's reusable-buffer path exactly.
    */
  private def ref(tokens: Seq[String], k: Int): Option[Seq[Long]] = {
    if (tokens.length < 3) return None
    val mins = Array.fill(k)(Long.MaxValue)
    tokens.sliding(3).foreach { sh =>
      val bytes = sh.mkString(" ").getBytes("UTF-8")
      (0 until k).foreach { j =>
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, j.toLong)
        if (h < mins(j)) mins(j) = h
      }
    }
    Some(mins.toSeq)
  }

  test("minhash_sig matches the reference hash-by-hash, incl. multi-byte tokens") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Seq("spark", "data", "Grüße", "日本語", "a", "query-engine", "x")
    val docs = (0 until 40).map(i => Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    val got = docs.toDF("toks")
      .select(gfunctions.minhash_sig(col("toks"), 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    docs.zip(got).foreach { case (d, g) =>
      assert(ref(d, 16).contains(g.toSeq), s"mismatch for $d")
    }
  }

  test("minhash_sig is NULL for docs with fewer than 3 tokens and for null input") {
    import spark.implicits._
    val df = Seq(Seq("a", "b"), Seq.empty[String], null)
      .toDF("toks").select(gfunctions.minhash_sig(col("toks"), 16).as("sig"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("minhash_sig runs inside WholeStageCodegen (no fallback)") {
    // over a MATERIALIZED toks column (the stage-table shape Curate and
    // the checkpointed dedup pipelines feed it): the projection is just
    // the native expression, so it must sit in a codegen span. (Fused
    // with split/filter tokenization the Project falls back — those
    // higher-order functions are CodegenFallback — but the kernel still
    // runs as the same tight static loop.)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toked = docs.select(col("doc_id"),
      filter(split(col("text"), "\\s+"), x => x =!= lit("")).as("toks"))
      .localCheckpoint()
    val df = toked.select(gfunctions.minhash_sig(col("toks"), 16).as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [minhash_sig"),
      s"expected codegen'd projection in:\n$plan")
    // identical docs must produce identical signatures through that path
    val sigs = df.collect().filter(!_.isNullAt(0)).map(_.getSeq[Long](0))
    assert(sigs.nonEmpty && sigs.forall(_.length == 16))
  }

  test("identical token arrays collide; disjoint vocabularies do not") {
    import spark.implicits._
    val a = Seq.fill(30)("alpha beta gamma delta".split(" ")).flatten.toSeq
    val b = Seq.fill(30)("zeta eta theta iota".split(" ")).flatten.toSeq
    val rows = Seq(("a1", a), ("a2", a), ("b1", b))
    val got = rows.toDF("id", "toks")
      .select(col("id"), gfunctions.minhash_sig(col("toks"), 16).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a1") == got("a2"), "identical docs share the full signature")
    assert(got("a1") != got("b1"), "disjoint docs must not share all minima")
  }
}
