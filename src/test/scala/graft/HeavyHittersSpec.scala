package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MgBuffer

/** Misra-Gries kernel laws plus the q48/q49 corpus-index operators. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private def u(s: String) = UTF8String.fromString(s)

  test("kernel: every item above n/(k+1) survives arbitrary decrement pressure") {
    // 10k stream over 500 distinct keys (>> k=16 counters): "hot" takes
    // 20% of the stream, the rest is uniform noise.
    val b = new MgBuffer(16)
    val rnd = new scala.util.Random(7)
    var n = 0
    (0 until 10000).foreach { i =>
      val item = if (i % 5 == 0) "hot" else s"noise${rnd.nextInt(500)}"
      b.offer(u(item), 1L)
      n += 1
    }
    assert(b.counts.size <= 16, "state stays bounded")
    assert(b.counts.contains(u("hot")), "a 20% item must survive k=16 pressure")
    val lower = b.counts(u("hot"))
    assert(lower <= 2000L && lower > 2000L - n / 17,
      s"count is a lower bound within n/(k+1): $lower")
  }

  test("kernel: merged partial summaries keep the guarantee") {
    val whole = new MgBuffer(8)
    val parts = (0 until 4).map(_ => new MgBuffer(8))
    val rnd = new scala.util.Random(13)
    (0 until 8000).foreach { i =>
      val item = if (i % 4 == 0) "heavy" else s"n${rnd.nextInt(300)}"
      parts(i % 4).offer(u(item), 1L)
      whole.offer(u(item), 1L)
    }
    val merged = new MgBuffer(8)
    parts.foreach(merged.mergeFrom)
    assert(merged.counts.size <= 8)
    assert(merged.counts.contains(u("heavy")), "25% item survives the 4-way merge")
    assert(whole.counts.contains(u("heavy")))
  }

  test("q49 returns exactly the tokens above the guarantee threshold, exactly counted") {
    // skewed corpus: 'alpha' ~ 1/3 of tokens, 'beta' ~ 1/6, a wide noise
    // tail far below n/65
    val docs = (0L until 200L).map { i =>
      val body = (0 until 30).map { j =>
        if (j % 3 == 0) "alpha" else if (j % 6 == 1) "beta" else s"w${(i * 31 + j) % 997}"
      }.mkString(" ")
      (i, body, "en", "s", body.length.toLong)
    }
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/heavy", docs)
    val got = operators.TextAnalysis.q49.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.documents(spark, dir)
      .select(explode(gfunctions.ws_tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val want = exact.filter { case (_, n) => n * 65 > total }
    assert(got == want, s"confirmed heavy set must equal the exact rule: got $got want $want")
    assert(got.contains("alpha") && got.contains("beta"))
  }

  test("q51 scores corpus-typical transitions above gibberish") {
    // 50 docs repeat the same fluent pattern; 1 doc is unique gibberish
    // (every transition rare); 1 doc is too short for bigrams.
    val fluent = (0 until 30).map(i => Seq("the", "cat", "sat")(i % 3)).mkString(" ")
    val rows =
      (0L until 50L).map(i => (i, fluent, "en", "s", fluent.length.toLong)) ++
        Seq(
          (50L, (0 until 30).map(i => s"zx$i").mkString(" "), "en", "s", 100L),
          (51L, "one", "en", "s", 3L))
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/fluency", rows)
    val got = operators.TextAnalysis.q51.run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val (nFluent, avgFluent) = got(0L)
    val (nGib, avgGib) = got(50L)
    assert(nFluent == 29 && nGib == 29)
    assert(avgFluent > avgGib * 10,
      s"fluent $avgFluent must dominate gibberish $avgGib")
    assert(got(51L) == ((0L, 0L)), "bigram-less doc scores zero, not null")
  }

  test("q54 ranks an off-distribution source far above in-distribution ones") {
    // sources a/b share one distribution and dominate the corpus; source c
    // is a small disjoint-vocabulary injection (the spam/template-change
    // scenario). Compare SIZE-NORMALIZED deviation (l1_dev / n_tokens) —
    // a and b drift a little too, since the corpus mean includes c's mass.
    val shared = (0 until 40).map(i => s"w${i % 10}").mkString(" ")
    val alien = (0 until 40).map(i => s"z${i % 10}").mkString(" ")
    val rows =
      (0L until 40L).map(i => (i, shared, "en", if (i % 2 == 0) "a" else "b", 100L)) :+
        (40L, alien, "en", "c", 100L)
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/drift", rows)
    val got = operators.TextAnalysis.q54.run(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def normDev(s: String): Double = { val (ts, l1) = got(s); l1.toDouble / ts }
    assert(normDev("c") > 10 * math.max(normDev("a"), normDev("b")),
      s"disjoint-vocab source must dominate the drift ranking: $got")
    assert(got("a") == got("b"), "identically distributed sources drift equally")
  }

  test("q48 postings carry df, cf, and the ascending posting head") {
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/postings", Seq(
      (3L, "aa bb aa", "en", "s", 8L),
      (1L, "aa cc", "en", "s", 5L),
      (2L, "aa", "en", "s", 2L),
      (4L, "aa", "en", "s", 2L),
      (5L, "aa", "en", "s", 2L),
      (6L, "aa", "en", "s", 2L),
      (7L, "aa", "en", "s", 2L),
    ))
    val got = operators.TextAnalysis.q48.run(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got("aa") == ((7L, 8L, "1,2,3,4,5")), s"head truncates at 5 ascending ids: $got")
    assert(got("bb") == ((1L, 1L, "3")))
    assert(got("cc") == ((1L, 1L, "1")))
  }
}
