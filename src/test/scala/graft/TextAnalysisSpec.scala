package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plants known documents in a temp dir shaped like a testdata sf dir, then
  * runs the real query entries over it — the same code path the driver runs.
  */
object PlantedDocs {
  def write(spark: SparkSession, dir: String, rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private def planted(name: String, rows: Seq[(Long, String, String, String, Long)]): String =
    PlantedDocs.write(spark, s"/tmp/graft-test/$name", rows)

  test("q32 classifies planted texts by stopword profile") {
    val dir = planted("langid", Seq(
      (1L, "the cat and a dog is in the house of cards", "en", "s", 40L),
      (2L, "der hund und die katze ist nicht mit dem mann", "de", "s", 45L),
      (3L, "el perro y los gatos que por con para casa", "es", "s", 42L),
      (4L, "le chat et les chiens est dans pour une maison", "fr", "s", 46L),
      (5L, "xyzzy qwerty plugh", "zh", "s", 18L),
    ))
    val got = operators.TextAnalysis.q32.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("en", "en", 1L), ("de", "de", 1L), ("es", "es", 1L), ("fr", "fr", 1L), ("zh", "und", 1L)))
  }

  test("q32_v2 scores planted texts with the char-bigram model; exact ties break by fixed order") {
    val dir = planted("langid2", Seq(
      (1L, "the theory of the thin thread is sound", "en", "s", 38L),
      (2L, "schein eichen und schlecht scheichen unter die sonne", "de", "s", 52L),
      (3L, "los osos el lago la arena que busca", "es", "s", 35L),
      // no feature bigram anywhere: every score 0 -> und
      (4L, "zzz xxx www yyy", "zh", "s", 15L),
      // the AMBIGUOUS doc: exactly one en hit ("he", w=1.2) and one de
      // hit ("ei", w=1.2) over the same length -> s_en == s_de EXACTLY
      // (same IEEE ops on the same ints); the fixed tie-break keeps en
      (5L, "heei", "zh", "s", 4L),
    ))
    val rows = operators.TextAnalysis.q32v2.run(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getString(6)))).toMap
    assert(rows(1L)._5 == "en" && rows(1L)._1 > rows(1L)._2, s"got ${rows(1L)}")
    assert(rows(2L)._5 == "de" && rows(2L)._2 > rows(2L)._1, s"got ${rows(2L)}")
    assert(rows(3L)._5 == "es", s"got ${rows(3L)}")
    assert(rows(4L)._5 == "und" &&
      rows(4L)._1 == 0.0 && rows(4L)._2 == 0.0 && rows(4L)._3 == 0.0 && rows(4L)._4 == 0.0,
      "no feature evidence must stay undecided, never default to a language")
    // the tie is EXACT in doubles, and the argmax order resolves it
    assert(rows(5L)._1 == rows(5L)._2 && rows(5L)._1 > 0.0, s"got ${rows(5L)}")
    assert(rows(5L)._5 == "en", "fixed tie-break: en wins an exact score tie")
  }

  test("q71 counts BPE-style pieces and fertility against hand-counted docs") {
    val dir = planted("bpe", Seq(
      // don|'|t| |stop|,| |it|'|s| |2024|! -> 10 pieces, 4 ws tokens
      (1L, "don't stop, it's 2024!", "en", "sA", 22L),
      // plain|words|only -> 3 pieces = 3 ws tokens (fertility 1.0)
      (2L, "plain words only", "en", "sB", 16L),
      // x1y2 -> x|1|y|2 = 4 pieces, 1 ws token
      (3L, "x1y2", "en", "sB", 4L),
    ))
    val got = operators.TextAnalysis.q71.run(spark, dir)
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("sA") == ((1L, 10L, 10.0, 2.5)), s"got ${got("sA")}")
    assert(got("sB") == ((2L, 7L, 3.5, 7.0 / 4.0)), s"got ${got("sB")}")
  }

  test("q72 quality classifier keeps clean prose and gates spammy docs") {
    val clean = "the cat sat on a mat and the dog is in the house of the " +
      "town and a bird is of the air to see in a tree"
    val digitSpam = "98765 43210 11111 22222 33333 44444 55555 66666 77777 88888"
    val punctSpam = "!!! ??? ;;; ... !!! ??? ;;; ... !!! ???"
    val shouty = "BUY NOW LIMITED OFFER CLICK HERE WIN BIG PRIZES TODAY ONLY"
    val dir = planted("qclass", Seq(
      (1L, clean, "en", "s", clean.length.toLong),
      (2L, digitSpam, "en", "s", digitSpam.length.toLong),
      (3L, punctSpam, "en", "s", punctSpam.length.toLong),
      (4L, shouty, "en", "s", shouty.length.toLong),
      (5L, "", "en", "s", 0L),
    ))
    val got = operators.TextAnalysis.q72.run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got(1L)._2 == 1L, s"clean prose must keep, got ${got(1L)}")
    assert(got(2L)._2 == 0L, s"digit spam must gate, got ${got(2L)}")
    assert(got(3L)._2 == 0L, s"punct spam must gate, got ${got(3L)}")
    assert(got(4L)._2 == 0L, s"all-caps shouting must gate, got ${got(4L)}")
    assert(got(5L) == ((0.0, 0L)), s"empty doc scores 0 via the zero guards, got ${got(5L)}")
    assert(got(1L)._1 > got(4L)._1 && got(4L)._1 > got(2L)._1,
      "score must order clean > shouty > digit spam")
  }

  test("q42 vocab head orders by count then token, with doc frequency") {
    val dir = planted("vocab", Seq(
      (1L, "aa bb aa cc", "en", "s", 11L),
      (2L, "aa bb", "en", "s", 5L),
      (3L, "dd", "en", "s", 2L),
    ))
    val got = operators.TextAnalysis.q42.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("aa", 3L, 2L), ("bb", 2L, 2L), ("cc", 1L, 1L), ("dd", 1L, 1L)),
      s"count desc then lexical tie order; got $got")
  }

  test("q30 token counts on planted docs") {
    val dir = planted("tokens", Seq(
      (1L, "one two three", "en", "a", 13L),
      (2L, "  padded   spaces   here  ", "en", "a", 26L),
      (3L, "solo", "en", "b", 4L),
    ))
    val got = operators.TextAnalysis.q30.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(r.fieldIndex("sum_tokens")))).toMap
    assert(got("a") == 6L) // empties from extra whitespace dropped
    assert(got("b") == 1L)
  }

  test("q33 fingerprint is deterministic and shingle-order-sensitive") {
    val dir = planted("fp", Seq(
      (1L, "alpha beta gamma delta", "en", "s", 22L),
      (2L, "alpha beta gamma delta", "en", "s", 22L),
      (3L, "delta gamma beta alpha", "en", "s", 22L),
      (4L, "xy", "en", "s", 2L), // <3 tokens -> text-hash fallback
    ))
    val fps = operators.TextAnalysis.q33.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("fingerprint"))).toMap
    assert(fps(1L) == fps(2L), "identical texts must fingerprint identically")
    assert(fps(1L) != fps(3L), "reversed word order must change the fingerprint")
    assert(fps.contains(4L), "short docs still get a fingerprint")
  }

  test("q35 tf-idf surfaces the document's distinctive term") {
    val filler = "data spark query table join" // appears in every doc -> low idf
    val dir = planted("tfidf", Seq(
      (1L, s"$filler zebra zebra zebra", "en", "s", 30L),
      (2L, s"$filler quartz quartz", "en", "s", 28L),
      (3L, filler, "en", "s", 27L),
    ))
    val got = operators.TextAnalysis.q35.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "zebra", "term unique to doc 1 and repeated must win")
    assert(got(2L) == "quartz")
    assert(got.contains(3L), "all-common-terms doc still gets a (low-idf) top term")
  }

  test("q36 pii scrub counts planted emails, urls, and phones") {
    val dir = planted("pii", Seq(
      (1L, "contact me at jane.doe@example.com or +6281234567 today", "en", "s", 55L),
      (2L, "see https://example.com/page?q=1 for details", "en", "s", 44L),
      (3L, "nothing sensitive here", "en", "s", 22L),
    ))
    val r = operators.TextAnalysis.q36.run(spark, dir).collect().head
    assert(r.getLong(r.fieldIndex("n_emails")) == 1L)
    assert(r.getLong(r.fieldIndex("n_urls")) == 1L)
    assert(r.getLong(r.fieldIndex("n_phones")) == 1L)
    assert(r.getLong(r.fieldIndex("redacted_chars")) > 0L)
  }

  test("q37 repetition ratio separates repetitive from diverse docs") {
    val dir = planted("rep", Seq(
      (1L, "spam spam spam spam spam spam spam spam", "en", "a", 39L),
      (2L, "eight totally distinct interesting words appear here now", "en", "b", 56L),
    ))
    val got = operators.TextAnalysis.q37.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("repetition_ratio"))).toMap
    assert(got("a") == 7.0 / 8.0, "8 tokens, 1 distinct")
    assert(got("b") == 0.0, "all distinct")
  }

  test("q92 PII redaction: planted spans redact, lookalikes survive, counts are staged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b-c9@x-mail.org or ops at corp dot net"),
      (2L, "server 10.0.0.1 port 8080 up v1.2.3"),
      (3L, "ref 1234567890 code 12345678 year 2026"),
      (4L, "chain 1.2.3.4.5 tail"), // leftmost quad wins, fifth group survives
      (5L, "clean text with nothing to hide"),
    ).toDF("doc_id", "text")
    val got = operators.TextAnalysis.piiRedact(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((1L, 0L, 0L, "mail <EMAIL> or ops at corp dot net")))
    assert(got(2L) == ((0L, 1L, 0L, "server <IP> port 8080 up v1.2.3")))
    assert(got(3L) == ((0L, 0L, 1L, "ref <NUM> code 12345678 year 2026")))
    assert(got(4L) == ((0L, 1L, 0L, "chain <IP>.5 tail")))
    assert(got(5L) == ((0L, 0L, 0L, "clean text with nothing to hide")))
  }

  test("q93 repair composition: boilerplate lines carrying PII vanish before redaction counts them") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique alpha\ncontact us at spam@corp.com"),
      (2L, "unique beta\ncontact us at spam@corp.com"),
      (3L, "unique gamma\ncontact us at spam@corp.com"),
      (4L, "keep me 10.0.0.1 here\nunique delta"),
    ).toDF("doc_id", "text")
    val got = operators.TextAnalysis.repairFrom(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(6)))).toMap
    // the shared contact line (df 3 > 2) is REMOVED as boilerplate, so
    // its email never reaches the redactor — repair order matters
    assert(got(1L) == ((2L, 1L, 0L, 0L, "unique alpha")))
    assert(got(2L) == ((2L, 1L, 0L, 0L, "unique beta")))
    // the unique IP line survives dedup and redacts
    assert(got(4L) == ((2L, 0L, 0L, 1L, "keep me <IP> here\nunique delta")))
  }

  test("q34 shingle counts: n tokens -> n-2 shingles") {
    val dir = planted("ngram", Seq(
      (1L, "a b c d e", "en", "s", 9L), // 3 shingles
      (2L, "a b c d e", "en", "s", 9L), // duplicates collapse in n_distinct
    ))
    val r = operators.TextAnalysis.q34.run(spark, dir).collect().head
    assert(r.getLong(r.fieldIndex("n_shingles")) == 6L)
    assert(r.getLong(r.fieldIndex("n_distinct")) == 3L)
  }
}
