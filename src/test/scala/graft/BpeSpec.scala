package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Bpe

/** BPE merge training: the driver-side merge loop against a
  * hand-computed reference, the deterministic tie law, the inference
  * segmenter, and the fertility table under learned merges. The
  * round-1 pair/tie law is additionally hash-gated by q91_bpe_pairs.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  test("trainMerges matches the hand-computed reference on the planted vocabulary") {
    // vocab: aaab x3, ab x2
    // round 1: (a,a) = 2 occurrences x3 = 6 beats (a,b) = 3+2 = 5 -> merge (a,a)
    //          aaab -> [aa, a, b] (left-to-right, non-overlapping)
    // round 2: (aa,a) = 3, (a,b) = 3+2 = 5 -> merge (a,b); states [aa, ab], [ab]
    // round 3: (aa,ab) = 3 -> merge; states [aaab], [ab]
    // round 4: no adjacent pair anywhere -> early stop
    val vocab = Seq(("aaab", 3L), ("ab", 2L))
    val merges = Bpe.trainMerges(vocab, nMerges = 10)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")),
      s"hand-computed reference broken: $merges")
  }

  test("tie law: equal counts resolve by (left, right) lexicographic ASC") {
    val merges = Bpe.trainMerges(Seq(("ab", 2L), ("cd", 2L)), nMerges = 1)
    assert(merges == Seq(("a", "b")))
    // and count DESC strictly dominates the lexicographic order
    val m2 = Bpe.trainMerges(Seq(("ab", 2L), ("cd", 3L)), nMerges = 1)
    assert(m2 == Seq(("c", "d")))
  }

  test("pair counting is occurrence-weighted and counts overlapping positions") {
    val counts = Bpe.pairCounts(Seq((Array("a", "a", "a"), 2L)))
    assert(counts == Map(("a", "a") -> 4L), "aaa has (a,a) twice, weighted by count 2")
  }

  test("symbols are codepoints: supplementary-plane pieces never split into surrogates") {
    // "😀" is ONE codepoint (two UTF-16 chars). The gated pair law and
    // the DuckDB oracle both count codepoints (Spark substring/length
    // and DuckDB index codepoints), so the driver loop must too — a
    // char split would count a (\uD83D, \uDE00) surrogate pair the
    // gated round-1 table can never contain.
    val merges = Bpe.trainMerges(Seq(("😀😀", 3L), ("ab", 2L)), nMerges = 1)
    assert(merges == Seq(("😀", "😀")),
      s"round-1 merge must pair whole codepoints: $merges")
    // inference: the single-codepoint piece is ONE symbol (no merge
    // applies), not two lone surrogates
    assert(Bpe.segment("😀", Map.empty).toSeq == Seq("😀"))
  }

  test("segment applies merges lowest-rank-first; unseen words stay at char level") {
    val rank = Seq(("a", "a"), ("a", "b"), ("aa", "ab")).zipWithIndex.toMap
    assert(Bpe.segment("aaab", rank).toSeq == Seq("aaab"))
    assert(Bpe.segment("aab", rank).toSeq == Seq("aa", "b"))
    assert(Bpe.segment("ab", rank).toSeq == Seq("ab"))
    assert(Bpe.segment("xyz", rank).toSeq == Seq("x", "y", "z"))
    assert(Bpe.segment("a", rank).toSeq == Seq("a"))
  }

  test("round-1 selection equals the hash-gated q91_bpe_pairs law on a planted corpus") {
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/bpe", Seq(
      (1L, "aaab aaab aaab ab ab", "en", "s1", 20L),
      (2L, "xyz", "en", "s2", 3L),
    ))
    val top = Bpe.qBpePairs.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(top.head == ((1, "a", "a", 6L)), s"rank-1 pair must be the first merge: ${top.head}")
    // the fit over the same corpus starts with exactly that pair
    val merges = Bpe.fit(Tables.documents(spark, dir), nMerges = 1)
    assert(merges == Seq(("a", "a")))
  }

  test("fertility under learned merges: trained words compress to 1, unseen words stay at char fertility") {
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/bpe_fert", Seq(
      (1L, "aaab aaab aaab ab ab", "en", "s1", 20L),
      (2L, "xyz", "en", "s2", 3L),
    ))
    val docs = Tables.documents(spark, dir)
    val merges = Bpe.fit(docs, nMerges = 10)
    val got = Bpe.fertilityUnder(docs, merges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // s1: 5 pieces, every one segments to a single learned subword
    assert(got("s1") == ((5L, 5L, 1000000L, 1.0)), s"s1: ${got("s1")}")
    // s2: "xyz" never seen with enough mass... (it IS in the fit vocab,
    // but x/y/z pairs lose every round to the a-family) — it may merge
    // or not depending on nMerges; with 10 rounds the loop exhausts the
    // a-family then merges xyz too. Pin the INVARIANTS instead: counts
    // are exact and compression is subwords/pieces in ppm.
    val (p2, sw2, cppm2, f2) = got("s2")
    assert(p2 == 1L && sw2 >= 1L && sw2 <= 3L)
    assert(cppm2 == 1000000L * sw2 / p2)
    assert(f2 == sw2.toDouble / 1L)
  }
}
