package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-frame semantics for the one-scan profiler: null accounting,
  * exact distincts, min/max string rendering, and the single-scan plan.
  */
class ProfileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  import operators.Profile

  private lazy val planted = {
    import spark.implicits._
    Seq(
      (1L, Option("aa"), Option(10L)),
      (2L, Option("bb"), Option(20L)),
      (3L, Option("aa"), None),
      (4L, None, Option(20L)),
      (5L, None, Option(5L)),
    ).toDF("id", "s", "v")
  }

  test("profile: nulls, distincts, and min/max per column on a planted frame") {
    val rows = Profile.profileOn(planted, Seq("id", "s", "v"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(rows("id") === ((5L, 0L, 5L, "1", "5")))
    assert(rows("s") === ((5L, 2L, 2L, "aa", "bb")))
    assert(rows("v") === ((5L, 1L, 3L, "5", "20")))
  }

  test("profile plan reads the table once (one scan, no per-column jobs)") {
    val plan = Profile.profileOn(planted, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    // multi-column DISTINCT aggregation plans through a single Expand
    // over one scan — a per-column union would show N scans
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 2,
      s"profiler re-scans its input:\n$plan")
  }

  test("q101 histogram: bucket law, open last bucket, cumulative and ppm shares") {
    import spark.implicits._
    // 2 docs of 5 tokens (bucket 0), 1 of 16 (bucket 1), 1 of 400 (capped
    // into bucket 15 although 400/16 = 25)
    val docs = Seq(
      Seq.fill(5)("w").mkString(" "),
      Seq.fill(5)("x").mkString(" "),
      Seq.fill(16)("y").mkString(" "),
      Seq.fill(400)("z").mkString(" "),
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Profile.tokenHistogramOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      0L -> ((2L, 2L, 500000L)),
      1L -> ((1L, 3L, 250000L)),
      15L -> ((1L, 4L, 250000L))))
  }

  test("profile survives hostile column names; rejects duplicates (r18 ADVICE)") {
    import spark.implicits._
    // a space, a reserved word, a single quote, and a backtick — all
    // legal parquet/DataFrame column names a public entry point meets
    val hostile = Seq((1L, "a", 2L, 3L), (2L, "b", 2L, 4L))
      .toDF("my col", "select", "it's", "ba`ck")
    val rows = Profile.profileOn(hostile, Seq("my col", "select", "it's", "ba`ck"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows === Map("my col" -> 2L, "select" -> 2L, "it's" -> 1L, "ba`ck" -> 2L))
    intercept[IllegalArgumentException] {
      Profile.profileOn(hostile, Seq("select", "select"))
    }
  }

  test("q101 histogram: null text is out of the law's domain (r18 ADVICE)") {
    import spark.implicits._
    val docs = Seq(
      (0L, Seq.fill(5)("w").mkString(" ")),
      (1L, null.asInstanceOf[String]),
      (2L, Seq.fill(5)("x").mkString(" ")),
    ).toDF("doc_id", "text")
    val got = Profile.tokenHistogramOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the null-text doc contributes to NO bucket and not to the total:
    // 2 docs, both bucket 0, share exactly 10^6 ppm
    assert(got === Map(0L -> ((2L, 2L, 1000000L))))
  }

  test("q106 dup inflation: planted template farm vs clean source; null text out of domain") {
    import spark.implicits._
    val docs = Seq(
      // source "farm": 4 docs, 2 distinct texts -> 500000 ppm duplicated
      (0L, "tpl one", "farm"), (1L, "tpl one", "farm"),
      (2L, "tpl two", "farm"), (3L, "tpl two", "farm"),
      // source "clean": 2 docs, both distinct -> 0 ppm
      (4L, "alpha", "clean"), (5L, "beta", "clean"),
      // null text contributes to NO source's counts
      (6L, null.asInstanceOf[String], "clean"),
    ).toDF("doc_id", "text", "source")
    val got = Profile.dupInflationOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "farm" -> ((4L, 2L, 500000L)),
      "clean" -> ((2L, 2L, 0L))))
  }

  test("q97 on the real corpus: doc_id is a unique non-null key") {
    val rows = operators.Profile.q97.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n, nulls, distinct) = rows("doc_id")
    assert(nulls === 0L)
    assert(distinct === n)
  }
}
