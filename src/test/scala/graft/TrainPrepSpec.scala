package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-corpus semantics for the training-prep operators: benchmark
  * decontamination, deterministic mixture sampling, sequence packing.
  */
class TrainPrepSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private def planted(name: String, rows: Seq[(Long, String, String, String, Long)]): String =
    PlantedDocs.write(spark, s"/tmp/graft-test/$name", rows)

  test("q38 flags corpus docs sharing an 8-gram with the benchmark slice") {
    // doc_id % 20 == 0 -> benchmark member (docs 0 and 20). Decontam
    // n-grams are 8 tokens wide (TrainPrep.DecontamN), so only a
    // contiguous 8-token verbatim span flags — a shared phrase shorter
    // than that stays clean.
    val benchA = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 toks
    val benchB = "held out eval question here with trailing filler tokens padding ok" // 11 toks
    val dir = planted("contam", Seq(
      (0L, benchA, "en", "s", 22L),
      (20L, benchB, "en", "s", 27L),
      // embeds benchA's first 8 tokens verbatim -> exactly one hit
      (1L, "zzz1 zzz2 alpha beta gamma delta epsilon zeta eta theta yyy", "en", "s", 24L),
      // shares a 7-token span with benchA: UNDER the width, stays clean
      (2L, "alpha beta gamma delta epsilon zeta eta other words here now", "en", "s", 33L),
      (3L, benchB, "en", "s", 27L), // verbatim bench copy
      (4L, "only seven tokens in this doc here", "en", "s", 2L), // <8 tokens: no grams
    ))
    val got = operators.TrainPrep.q38.run(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(!got.contains(0L) && !got.contains(20L), "benchmark docs are not graded")
    assert(got(1L) == ((4L, 1L, 1L)), s"one overlapping 8-gram -> contaminated, got ${got(1L)}")
    assert(got(2L) == ((4L, 0L, 0L)), s"7-token overlap is under the width, got ${got(2L)}")
    assert(got(3L) == ((4L, 4L, 1L)), "verbatim eval copy: every 8-gram hits")
    assert(got(4L) == ((0L, 0L, 0L)), "short doc has no 8-grams and stays clean")
  }

  test("q88 fuzzy decontam flags a paraphrased benchmark doc that q38 PROVABLY misses") {
    // the q38 blind spot by construction: inserting a junk token every
    // 7 original tokens breaks EVERY verbatim 8-gram (any 8 consecutive
    // tokens span at least one insertion), while the 3-shingle minhash
    // estimate stays at/above tau — the exact reason dedup needed
    // minhash beside exact, applied to decontamination
    val benchWords = (0 until 64).map(i => s"w$i")
    val bench = benchWords.mkString(" ")
    val para = benchWords.zipWithIndex.flatMap { case (w, i) =>
      if (i % 7 == 0) Seq(s"junk$i", w) else Seq(w)
    }.mkString(" ")
    val dir = planted("fuzzycontam", Seq(
      (0L, bench, "en", "s", 300L), // the benchmark item (doc_id % 20 == 0)
      (1L, para, "en", "s", 340L), // its paraphrase — corpus side
      (2L, "completely different words about other things entirely here", "en", "s", 60L),
    ))
    // q38 provably misses: zero verbatim 8-grams survive the insertions
    val exact = operators.TrainPrep.q38.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exact(1L) == 0L, s"spec setup: the paraphrase must share NO 8-gram, got ${exact(1L)} hits")
    // q88 flags it — and only it
    val fuzzy = operators.TrainPrep.q88.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(!fuzzy.contains(0L), "benchmark docs are not graded")
    assert(fuzzy(1L)._1, s"paraphrase must be fuzzily contaminated: ${fuzzy(1L)}")
    assert(fuzzy(1L)._3 >= 0.5, s"estimated jaccard at/above tau: ${fuzzy(1L)}")
    assert(fuzzy(2L) == ((false, 0L, 0.0)), s"unrelated doc stays clean: ${fuzzy(2L)}")
  }

  test("q41 fixed-size sample equals the sort-based reference and ignores text edits") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rows = (0L until 300L).map(i =>
      (i, s"text body $i", Seq("en", "de", "fr")((i % 3).toInt), "s", 12L))
    val dir = planted("sample-topk", rows)
    val got = operators.TrainPrep.q41.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    // per-stratum size is exactly min(K, stratum size); here 20 < 100
    val sizes = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes == Map("en" -> 20, "de" -> 20, "fr" -> 20), s"got $sizes")

    // the bounded-heap aggregate must equal the full-sort formulation
    val h = conv(substring(md5(concat(lit("smp2:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val ref = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), h.as("hv"))
      .withColumn("sample_rank",
        row_number().over(Window.partitionBy("lang").orderBy("hv", "doc_id")).cast("long"))
      .filter(col("sample_rank") <= 20)
      .select("lang", "sample_rank", "doc_id")
      .orderBy("lang", "sample_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == ref, "heap order must equal (hash, doc_id) sort order")

    // content-independent: rewriting every text changes nothing
    val dir2 = planted("sample-topk-edit", rows.map { case (i, _, l, s0, n) =>
      (i, s"completely different body $i", l, s0, n) })
    val edited = operators.TrainPrep.q41.run(spark, dir2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == edited, "membership keys on doc_id, never content")
  }

  test("q43 epoch shuffle is a reproducible sharded permutation with no global sort") {
    val rows = (0L until 400L).map(i => (i, s"doc body $i", "en", "s", 10L))
    val dir = planted("shuffle", rows)
    val got = operators.TrainPrep.q43.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // a permutation: every doc exactly once
    assert(got.map(_._1).sorted == (0L until 400L), "each doc appears exactly once")
    // shard positions are contiguous 1..n within each shard
    got.groupBy(_._2).foreach { case (shard, members) =>
      assert(members.map(_._3).sorted == (1L to members.size),
        s"shard $shard positions must be contiguous")
    }
    // reproducible and content-independent
    val edited = planted("shuffle-edit", rows.map { case (i, _, l, s0, n) =>
      (i, s"rewritten $i", l, s0, n) })
    val again = operators.TrainPrep.q43.run(spark, edited).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.sorted == again.sorted, "permutation keys on doc_id, never content")

    // scale property: the prod plan sorts only WITHIN shards (window
    // sort, global=false) — no corpus-wide range exchange
    val prod = operators.TrainPrep.q43.runProd(spark, dir)
      .queryExecution.executedPlan.toString
    val globalSorts = "Sort \\[.*\\], true".r.findAllIn(prod).size
    assert(globalSorts == 0, s"epoch shuffle must not globally sort:\n$prod")
  }

  test("q39 sampling is deterministic, content-independent, and rate-accurate") {
    val en = (100L until 2100L).map(i => (i, s"text body number $i", "en", "s", 20L))
    val de = (3000L until 3100L).map(i => (i, s"deutscher text $i", "de", "s", 18L))
    val fr = (4000L until 5000L).map(i => (i, s"texte francais $i", "fr", "s", 18L))
    val dir = planted("sample", en ++ de ++ fr)

    val kept = operators.TrainPrep.q39.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val again = operators.TrainPrep.q39.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(kept == again, "same corpus -> identical sample")

    val byLang = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLang("de") == 100, "de threshold is 2^60: every doc kept")
    val enRate = byLang("en").toDouble / 2000
    assert(enRate > 0.44 && enRate < 0.56, s"en rate ~1/2, got $enRate")
    val frRate = byLang("fr").toDouble / 1000
    assert(frRate > 0.08 && frRate < 0.17, s"fr rate ~1/8, got $frRate")

    // Membership keys on doc_id, not text: rewriting every document
    // must not change which ids survive (the audit/repro contract).
    val dir2 = planted("sample2",
      (en ++ de ++ fr).map { case (id, _, l, s, n) => (id, s"REVISED $id", l, s, n) })
    val kept2 = operators.TrainPrep.q39.run(spark, dir2)
      .collect().map(_.getLong(0)).toSet
    assert(kept.map(_._1).toSet == kept2, "sample membership survives text edits")
  }

  test("q40 packs docs into 2048-token shards by global offset") {
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val dir = planted("pack", Seq(
      (1L, words(1000), "en", "s", 1L),
      (2L, words(1500), "en", "s", 1L),
      (3L, words(2000), "en", "s", 1L),
      (4L, "", "en", "s", 0L), // zero tokens: spans no shard
      (5L, words(10), "en", "s", 1L),
    ))
    val got = operators.TrainPrep.q40.run(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((0L, 0L, 1L)))
    assert(got(2L) == ((1000L, 0L, 2L)), "1000..2500 straddles the 2048 cut")
    assert(got(3L) == ((2500L, 1L, 2L)), "2500..4500 straddles 4096")
    assert(got(4L) == ((4500L, 2L, 0L)), "empty doc occupies no shard")
    assert(got(5L) == ((4500L, 2L, 1L)))
  }

  test("q40 production prefix sum equals the single-window plan at scale") {
    val rows = (0L until 10000L).map { i =>
      val n = (i % 37 + 1).toInt
      (i, Seq.fill(n)("t").mkString(" "), "en", "s", n.toLong)
    }
    val dir = planted("packbig", rows)
    val oracle = operators.TrainPrep.q40.run(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val prod = operators.TrainPrep.q40.runProd(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(oracle == prod, "two-pass distributed offsets must be exact")
  }

  test("q40 prod parity holds with exchange reuse disabled") {
    // The pid join in packTokensProd must NOT depend on the planner
    // deduplicating the range exchange across the local/offsets branches:
    // perDoc is materialized once, so even when every branch would
    // otherwise re-execute its own exchange, both see one pid assignment.
    val rows = (0L until 3000L).map { i =>
      val n = (i % 23 + 1).toInt
      (i, Seq.fill(n)("t").mkString(" "), "en", "s", n.toLong)
    }
    val dir = planted("packnoreuse", rows)
    val prev = spark.conf.get("spark.sql.exchange.reuse", "true")
    try {
      spark.conf.set("spark.sql.exchange.reuse", "false")
      val oracle = operators.TrainPrep.q40.run(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      val prod = operators.TrainPrep.q40.runProd(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(oracle == prod, "offsets must be exact without exchange reuse")
    } finally spark.conf.set("spark.sql.exchange.reuse", prev)
  }

  test("q79 packs by tokenizer PIECES, and the two-pass prod prefix sum stays exact on them") {
    // Punctuation-rich rows so pieces diverge hard from whitespace
    // words — the unit under test. "don't stop, it's 2024!" is 4 ws
    // tokens but 10 pieces under the portable pre-tokenizer.
    val rows = (0L until 4000L).map { i =>
      val n = (i % 19 + 1).toInt
      (i, Seq.fill(n)(s"w$i-x.y,z!").mkString(" "), "en", "s", n.toLong)
    }
    val dir = planted("packpieces", rows)
    val oracle = operators.TrainPrep.q79.run(spark, dir).collect()
    // the unit really is pieces: "w0-x.y,z!" splits as
    // [w][0][-][x][.][y][,][z][!] = 9 pieces per 1 ws word
    val byId = oracle.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) == 9L && byId(1L) == 18L, s"piece counts: ${byId(0L)}, ${byId(1L)}")
    // prod (range partition → local sums → broadcast bases) is exact
    val prod = operators.TrainPrep.q79.runProd(spark, dir).collect()
    assert(oracle.map(_.toString).sorted.toSeq == prod.map(_.toString).sorted.toSeq,
      "two-pass distributed piece offsets must equal the single-window form")
  }

  test("q61 caps each source at the quota, chosen by hash order") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // source A: 40 docs (25 cut), source B: 15 (all kept, at the quota
    // boundary), source C: 3 (all kept, under quota)
    val rows =
      (0L until 40L).map(i => (i, s"text $i", "en", "A", 10L)) ++
        (40L until 55L).map(i => (i, s"text $i", "en", "B", 10L)) ++
        (55L until 58L).map(i => (i, s"text $i", "en", "C", 10L))
    val dir = planted("quota", rows)
    val got = operators.TrainPrep.q61.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))).toMap
    assert(got.size == 58, "every doc gets a verdict row")
    val keptBySource = got.values.groupBy(_._1).view
      .mapValues(_.count(_._3 == 1L)).toMap
    assert(keptBySource == Map("A" -> 15, "B" -> 15, "C" -> 3), s"got $keptBySource")
    // kept docs carry ranks 1..n_kept; cut docs carry no rank
    got.values.groupBy(_._1).foreach { case (src, vs) =>
      val ranks = vs.flatMap(_._2).toSeq.sorted
      assert(ranks == (1L to ranks.size).toSeq, s"source $src ranks: $ranks")
    }
    assert(got.values.forall(v => v._2.isDefined == (v._3 == 1L)),
      "rank present exactly on kept docs")
    // heap order equals the window-rank reference on the same hashes
    val hv = conv(substring(md5(concat(lit("quo:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val ref = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), hv.as("hv"))
      .withColumn("rk", row_number().over(Window.partitionBy("source").orderBy("hv", "doc_id")))
      .filter(col("rk") <= 15)
      .collect().map(r => r.getLong(0) -> r.getInt(3).toLong).toMap
    assert(got.filter(_._2._3 == 1L).map { case (id, v) => id -> v._2.get } == ref,
      "bounded heap must equal the sort-based rank")
  }

  test("q60 flags eval docs whose passages leak from the train split") {
    // 40 docs share one 20-token body: with the 80/10/10 id-hash split,
    // deterministically some land in train and some in val/test — every
    // eval copy then has ALL windows leaked. Unique-text and short docs
    // in the eval splits must stay clean.
    val shared = (1 to 20).map(i => s"leak$i").mkString(" ")
    val rows =
      (0L until 40L).map(i => (i, shared, "en", "s", shared.length.toLong)) ++
        (40L until 80L).map(i => (i, (1 to 20).map(j => s"u${i}w$j").mkString(" "), "en", "s", 100L)) ++
        (80L until 90L).map(i => (i, "too short", "en", "s", 9L))
    val dir = planted("leakage", rows)
    val splits = operators.TrainPrep.q52.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((0L until 40L).exists(splits(_) == "train") &&
      (0L until 40L).exists(splits(_) != "train"),
      s"planted ids must straddle the split: ${splits.filterKeys(_ < 40)}")
    val got = operators.TrainPrep.q60.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == splits.filter(_._2 != "train").keySet,
      "exactly the val/test docs are graded")
    got.foreach { case (id, (split, nw, nl, leaked)) =>
      assert(split == splits(id), s"doc $id split mismatch")
      if (id < 40) {
        assert(nw == 13L && nl == 13L && leaked == 1L,
          s"eval copy of the shared body must fully leak, got doc $id -> ($nw, $nl, $leaked)")
      } else if (id < 80) {
        assert(nl == 0L && leaked == 0L, s"unique doc $id must stay clean, got ($nw, $nl)")
      } else {
        assert(nw == 0L && nl == 0L && leaked == 0L,
          s"short doc $id has no windows, got ($nw, $nl, $leaked)")
      }
    }
  }

  test("q77 chunk geometry: overlap, tail suppression, short docs, empties") {
    import spark.implicits._
    def doc(id: Long, n: Int): (Long, String) = (id, (1 to n).map(i => s"t$i").mkString(" "))
    val docs = Seq(
      doc(1L, 5),      // n < window: one chunk, all tokens
      doc(2L, 128),    // n == window: exactly one chunk
      doc(3L, 129),    // one token past the window: a second chunk must carry it
      doc(4L, 100),    // window 128 covers it: start=96 would add nothing -> suppressed
      doc(5L, 300),    // full ladder: starts 0,96,192,288
      (6L, ""),        // empty doc: no chunks
      (7L, "   \t  ")  // whitespace-only: no chunks
    ).toDF("doc_id", "text")
    val got = operators.TrainPrep.chunkWindows(docs, window = 128, stride = 96)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))

    val byDoc = got.groupBy(_._1).view.mapValues(_.toSeq).toMap
    assert(byDoc(1L).map(t => (t._2, t._3, t._4)) == Seq((0L, 0L, 5L)), "short doc: one 5-token chunk")
    assert(byDoc(1L).head._5 == "t1 t2 t3 t4 t5")
    assert(byDoc(2L).map(_._2) == Seq(0L), "n == window: exactly one chunk")
    assert(byDoc(3L).map(t => (t._2, t._3, t._4)) == Seq((0L, 0L, 128L), (1L, 96L, 33L)),
      "129 tokens: second chunk starts at 96 and carries the 33-token tail")
    assert(byDoc(4L).map(_._2) == Seq(0L),
      "100 tokens: the start-96 window adds no new tokens and must be suppressed")
    assert(byDoc(5L).map(t => (t._3, t._4)) == Seq((0L, 128L), (96L, 128L), (192L, 108L)),
      "300 tokens: chunk at 192 reaches the end (192+128 > 300), so start 288 is suppressed")
    assert(!byDoc.contains(6L) && !byDoc.contains(7L), "empty and whitespace-only docs yield nothing")

    // consecutive chunks overlap by window - stride tokens
    val c5 = byDoc(5L).map(_._5.split(" ").toSeq)
    assert(c5(0).takeRight(32) == c5(1).take(32), "adjacent chunks share 32 tokens of context")

    // stride > window would silently drop inter-chunk tokens — rejected
    intercept[IllegalArgumentException] {
      operators.TrainPrep.chunkWindows(docs, window = 128, stride = 200)
    }
  }

  test("q86 temperature mixture: alpha edges, exact ppm rates, clamp, and the keep law") {
    // sources a:16, b:4, c:1 — m is the 1-doc source, so rates are the
    // textbook n^(alpha-1) ratios in exact ppm
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/tempmix",
      (0L until 16L).map(i => (i, s"doc $i", "en", "a", 5L)) ++
        (100L until 104L).map(i => (i, s"doc $i", "en", "b", 5L)) :+
        ((200L, "doc 200", "en", "c", 7L)))
    def rates(alpha2: Int): Map[String, Long] =
      operators.TrainPrep.tempMixture(spark, dir, alpha2).collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
    // α = ½: w = isqrt(n) → a: 1e6·4·1/16 = 250000, b: 1e6·2·1/4 = 500000
    assert(rates(1) == Map("a" -> 250000L, "b" -> 500000L, "c" -> 1000000L))
    // α = 1 reduces to proportional: every source at its natural rate (keep all)
    assert(rates(2) == Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
    // α = 0 reduces to uniform: expected kept count = n_m for every source
    assert(rates(0) == Map("a" -> 62500L, "b" -> 250000L, "c" -> 1000000L))
    // the keep law: salted 60-bit md5 mod 1e6 under the rate, recomputed
    // independently here
    def uppm(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"tmx:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000L
    }
    val got = operators.TrainPrep.tempMixture(spark, dir, 1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    got.foreach { case (id, rate, kept) =>
      assert(kept == (uppm(id) < rate), s"keep law forked at doc $id")
    }
    // isqrt floor non-monotonicity: n=8 (w 2) vs n=9 (w 3) — the raw
    // rate for the 9-doc source exceeds 1 and must clamp to 1e6
    val dir2 = PlantedDocs.write(spark, "/tmp/graft-test/tempmix2",
      (0L until 8L).map(i => (i, s"x $i", "en", "x", 3L)) ++
        (100L until 109L).map(i => (i, s"y $i", "en", "y", 3L)))
    assert(rates2(dir2) == Map("x" -> 1000000L, "y" -> 1000000L))
    def rates2(d: String): Map[String, Long] =
      operators.TrainPrep.tempMixture(spark, d, 1).collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
  }

  test("q96 semantic decontam: paraphrase-by-embedding flags what no n-gram can") {
    import spark.implicits._
    // bench members are vec_id % 41 == 0 (ids 0 and 41). Corpus:
    //   1: same direction as bench 0 (scaled)      -> sim 1.0, flagged
    //   2: orthogonal to both benches              -> sim 0.0, clean
    //   3: 45 degrees off bench 0                  -> sim ~0.707, flagged
    //   4: opposite of bench 0                     -> max sim 0, clean
    //   5: same direction as bench 41 (scaled)     -> sim 1.0 via the
    //      SECOND bench member — the max is over ALL of them
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (41L, Array(0f, 0f, 1f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(1f, 1f, 0f, 0f)),
      (4L, Array(-1f, 0f, 0f, 0f)),
      (5L, Array(0f, 0f, 3f, 0f)),
    ).toDF("vec_id", "embedding")
    val got = operators.TrainPrep.embedContaminationOn(emb).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L), "bench members must not self-report")
    assert(got(1L)._1 === 1.0 && got(1L)._2)
    assert(got(2L)._1 === 0.0 && !got(2L)._2)
    assert(math.abs(got(3L)._1 - math.sqrt(0.5)) < 1e-12 && got(3L)._2)
    assert(got(4L)._1 === 0.0 && !got(4L)._2) // max(-1, 0) over the two benches
    assert(got(5L)._1 === 1.0 && got(5L)._2)
  }

  test("q107 contamination audit: each rung attributes hits to its bench item (r19)") {
    // bench 0 has a verbatim copier -> hits on ALL three rungs;
    // bench 20 has a word-for-word REORDERING -> no 8-gram, no shingle,
    // semantic-only (the q99 blind-spot case, now attributed to the
    // leaking ITEM); bench 40 is untouched -> zeros on every rung.
    def t(p: String) = (1 to 12).map(i => s"$p$i").mkString(" ")
    val a = t("a"); val b = t("b")
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/contamreport", Seq(
      (0L, a, "en", "s", a.length.toLong),
      (1L, a, "en", "s", a.length.toLong),
      (20L, b, "en", "s", b.length.toLong),
      (21L, b.split(" ").reverse.mkString(" "), "en", "s", b.length.toLong),
      (40L, t("c"), "en", "s", 40L),
      (41L, t("x"), "en", "s", 40L),
    ))
    val got = operators.TrainPrep.q107.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === Set(0L, 20L, 40L), "one row per bench item")
    assert(got(0L) === ((1L, 1L, 1L)), s"verbatim copy hits every rung: ${got(0L)}")
    assert(got(20L) === ((0L, 0L, 1L)),
      s"a reordering leaks ONLY through the semantic rung: ${got(20L)}")
    assert(got(40L) === ((0L, 0L, 0L)), s"untouched item reports clean: ${got(40L)}")
  }

  test("q99 text-side semantic decontam: a reordered paraphrase flags at sim ~1") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // bench member doc 0; doc 1 is its word-for-word REORDERING — the
    // bag-of-words projection maps both to the same unit vector, so no
    // n-gram or shingle gate is needed to see they're the same item.
    // doc 2 shares no tokens with the bench doc.
    val toked = Seq(
      (0L, Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")),
      (1L, Seq("zeta", "epsilon", "delta", "gamma", "beta", "alpha")),
      (2L, Seq("completely", "different", "vocabulary", "here", "now", "ok")),
    ).toDF("doc_id", "toks")
    val emb = operators.Dedup.textEmbedMd5From(toked)
    val got = operators.TrainPrep.textSemanticContaminationOn(emb).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got.keySet === Set(1L, 2L), "bench members must not self-report")
    // identical vectors, but the unit-norm components are not exactly
    // representable, so the self-dot rounds to 1 within one ulp — the
    // SAME double both engines compute (the parity the gate grades)
    assert(got(1L)._1 >= 1.0 - 1e-15 && got(1L)._1 <= 1.0 && got(1L)._2,
      s"paraphrase must flag within one ulp of 1.0: ${got(1L)}")
    // every flag is exactly the threshold law — no hidden second rule
    got.values.foreach { case (ms, f) =>
      assert(f === (ms >= operators.TrainPrep.SemTau))
    }
  }

  test("q99 vector-level law: orthogonal stays clean, near-copy flags") {
    import spark.implicits._
    // hand-built unit vectors on the e0..e7 schema: bench doc 20 points
    // along e0; doc 21 matches it, doc 22 is orthogonal
    def row(id: Long, v: Seq[Double]) = (id, v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7))
    val emb = Seq(
      row(20L, Seq(1d, 0d, 0d, 0d, 0d, 0d, 0d, 0d)),
      row(21L, Seq(1d, 0d, 0d, 0d, 0d, 0d, 0d, 0d)),
      row(22L, Seq(0d, 1d, 0d, 0d, 0d, 0d, 0d, 0d)),
    ).toDF("doc_id", "e0", "e1", "e2", "e3", "e4", "e5", "e6", "e7")
    val got = operators.TrainPrep.textSemanticContaminationOn(emb).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got(21L) === ((1.0, true)))
    assert(got(22L) === ((0.0, false)))
  }

  test("q110 contamination trend: planted new-leak / cleared / worse / stable across the refresh (r20)") {
    // The refresh law (Snapshot.nextSnapshotDocsOn): drop doc_id % 31,
    // append " rev2" to doc_id % 17's text; bench = doc_id % 20 == 0
    // with its CURRENT text. Plants exercise each status:
    //  - bench 20 contains the 8-gram "a b c d e f g rev2"; corpus doc
    //    17 has only the 7 tokens "a b c d e f g" TODAY (no 8-grams at
    //    all) but the refresh appends " rev2" -> the item STARTS
    //    leaking: (0, 1, new_leak).
    //  - bench 40 shares its 8-gram with corpus doc 31, which the
    //    refresh DROPS: (1, 0, cleared).
    //  - bench 80 matches corpus doc 21 in both snapshots AND gains
    //    doc 34 (revised % 17) next: (1, 2, worse).
    //  - bench 60 never overlaps: (0, 0, stable).
    // No planted id is % 41 == 0, so the added-slice leg is empty.
    val dir = planted("contamtrend", Seq(
      (20L, "a b c d e f g rev2", "en", "s", 18L),
      (17L, "a b c d e f g", "en", "s", 13L),
      (40L, "p q r s t u v w", "en", "s", 15L),
      (31L, "p q r s t u v w", "en", "s", 15L),
      (80L, "m1 m2 m3 m4 m5 m6 m7 m8 zz n1 n2 n3 n4 n5 n6 n7 rev2", "en", "s", 52L),
      (21L, "m1 m2 m3 m4 m5 m6 m7 m8", "en", "s", 23L),
      (34L, "n1 n2 n3 n4 n5 n6 n7", "en", "s", 20L),
      (60L, "z1 z2 z3 z4 z5 z6 z7 z8", "en", "s", 23L),
    ))
    val rows110 = operators.TrainPrep.q110.run(spark, dir).collect()
    rows110.foreach(r => info(s"q110 planted: $r"))
    val got = rows110
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.keySet === Set(20L, 40L, 60L, 80L), "one row per bench item")
    assert(got(20L) === ((0L, 1L, "new_leak")),
      s"the revision INTRODUCES the overlap, got ${got(20L)}")
    assert(got(40L) === ((1L, 0L, "cleared")),
      s"the dropped doc takes its leak with it, got ${got(40L)}")
    assert(got(80L) === ((1L, 2L, "worse")),
      s"a second doc starts hitting after the refresh, got ${got(80L)}")
    assert(got(60L) === ((0L, 0L, "stable")))
    // fuzzy rung (columns 4-6): doc 31 is a VERBATIM copy of bench 40
    // (identical token set -> identical minhash signature -> est 1.0,
    // provably), and the refresh drops it -> cleared; in the next
    // snapshot doc 17's revised text becomes IDENTICAL to bench 20 ->
    // est 1.0. The remaining cells are deterministic under the md5
    // minhash law (doc 17's 7/8-jaccard overlap with bench 20 and doc
    // 21's 8/17 subset overlap with bench 80 both happen to estimate
    // >= 0.5 on this planted vocabulary — pinned as observed; any
    // engine drift from these values means the law forked)
    val fz = rows110
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    assert(fz(40L) === ((1L, 0L, "cleared")),
      s"verbatim copy dropped -> fuzzy cleared, got ${fz(40L)}")
    assert(fz(20L) === ((1L, 1L, "stable")), s"got ${fz(20L)}")
    assert(fz(80L) === ((1L, 1L, "stable")), s"got ${fz(80L)}")
    assert(fz(60L) === ((0L, 0L, "stable")),
      "disjoint vocabularies can never band-collide into a fuzzy match")
    // sem rung (columns 7-9): identical token set -> IDENTICAL unit
    // vector under the bag-of-words law -> sim exactly 1.0. Bench 20
    // is the showcase: its CURRENT 7-token overlap with doc 17 sits
    // under tau at 8 dims, the revision makes the texts identical ->
    // a genuinely SEMANTIC new_leak the exact rung also sees
    val sm = rows110
      .map(r => r.getLong(0) -> ((r.getLong(7), r.getLong(8), r.getString(9)))).toMap
    assert(sm(20L) === ((0L, 1L, "new_leak")), s"got ${sm(20L)}")
    assert(sm(40L) === ((1L, 0L, "cleared")), s"got ${sm(40L)}")
    assert(sm(60L) === ((0L, 0L, "stable")), s"got ${sm(60L)}")
    assert(sm(80L) === ((0L, 0L, "stable")), s"got ${sm(80L)}")
  }
}
