package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WsTokensSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private def declarative = filter(split(col("text"), "\\s+"), x => x =!= lit(""))

  test("ws_tokens is byte-identical to filter(split) on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val diff = docs
      .select(gfunctions.ws_tokens(col("text")).as("a"), declarative.as("b"))
      .filter(not(col("a") === col("b")))
      .count()
    assert(diff == 0L, "native tokenizer diverged from the declarative pair")
  }

  test("ws_tokens parity on the whitespace zoo (every \\s byte, unicode, empties)") {
    import spark.implicits._
    val gruesse = "Grüße"
    val nihongo = "日本語"
    val zoo = Seq(
      "a b\tc\nd\re\ff",
      "vtabsplit",               // vertical tab IS Java \s
      "  leading and trailing  ",
      "\t\n\r \f",                     // whitespace only -> zero tokens
      "",                              // empty -> zero tokens
      "single",
      s"$gruesse $nihongo  mix ed", // U+00A0 is NOT Java \s
      "a  b   c",
      "x\r\ny",
    )
    val got = zoo.toDF("text")
      .select(gfunctions.ws_tokens(col("text")).as("a"), declarative.as("b"))
      .collect()
    got.zip(zoo).foreach { case (r, s) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"diverged on ${s.replace("\n", "\\n")}")
    }
    assert(got(1).getSeq[String](0) == Seq("vtab", "split"))
    assert(got(3).getSeq[String](0).isEmpty && got(4).getSeq[String](0).isEmpty)
    assert(got(6).getSeq[String](0) == Seq(gruesse, nihongo, "mix ed"))
  }

  test("ws_tokens runs inside WholeStageCodegen (no fallback)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val df = docs.select(size(gfunctions.ws_tokens(col("text"))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [size(ws_tokens"),
      s"expected codegen'd projection in:\n$plan")
    assert(df.collect().forall(_.getInt(0) >= 0))
  }
}
