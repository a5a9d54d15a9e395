package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-prep pipeline: the staged DAG must reproduce the
  * unstaged composition byte-for-byte, resume after a killed stage, and
  * the manifest must honor every upstream gate (curation verdicts,
  * per-source quota, train-only split) plus the pack/shuffle geometry.
  */
class TrainPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Planted corpus hitting every gate at once: a benchmark doc (id%20=0),
    * a doc quoting its opening 8-gram (contaminated), an exact-dup
    * pair, a too-short doc, a wrong-lang doc, 20 unique keepers in ONE
    * source (quota = 15 cuts 5), and 2 keepers in another source.
    * Token vocabularies are doc-local (d<id>t<i>) so no accidental
    * shingle overlap or near-dup exists.
    */
  private def mkDocs(): DataFrame = {
    import spark.implicits._
    def toks(id: Long, n: Int) = (0 until n).map(i => s"d${id}t$i").mkString(" ")
    val base = Seq(
      (20L, toks(20, 60), "en", "sB"),
      (3L, toks(3, 30) + " " + toks(20, 60).split(" ").take(10).mkString(" "), "en", "sB"),
      (5L, toks(5, 40), "en", "sB"),
      (7L, toks(5, 40), "en", "sB"), // same text as 5 -> exact_dup
      (9L, "ab cd", "en", "sB"),
      (11L, toks(11, 40), "de", "sB"),
      (13L, toks(13, 25), "en", "sC"),
      (15L, toks(15, 25), "en", "sC"),
    )
    val sA = (101L to 126L).filter(_ % 20 != 0).take(20)
      .map(id => (id, toks(id, 30), "en", "sA"))
    (base ++ sA)
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def rows(df: DataFrame): Map[Long, (Long, Long, Long, Long, Long, Long)] =
    df.collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    }.toMap

  test("manifest honors curation, quota, and split gates with exact pack/shuffle geometry") {
    import org.apache.spark.sql.functions._
    val docs = mkDocs()
    val m = rows(operators.TrainPipeline.manifest(docs))
    assert(m.nonEmpty)

    // gate exclusions: bench, contaminated, exact-dup loser, short, wrong-lang
    val verdicts = operators.Curate.curateDecontam(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(verdicts(3L) == "contaminated" && verdicts(9L) == "too_short" &&
      verdicts(11L) == "wrong_lang" && verdicts(7L) == "exact_dup")
    assert(!m.contains(20L), "benchmark doc must never reach the manifest")
    Seq(3L, 7L, 9L, 11L).foreach(id =>
      assert(!m.contains(id), s"gated doc $id leaked into the manifest"))
    val keptIds = verdicts.filter(_._2 == "kept").keySet
    assert(m.keySet.subsetOf(keptIds), "every manifest doc is curation-kept")

    // quota: at most 15 sA docs survive; sA had 20 kept-eligible docs
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = m.keySet.groupBy(srcOf)
    assert(bySrc.getOrElse("sA", Set.empty).size <= operators.TrainPrep.SourceQuota)
    val quotaKeptSA = operators.TrainPrep
      .sourceQuotaOf(docs.join(
        operators.Curate.curateDecontam(docs).filter(col("verdict") === "kept")
          .select("doc_id"), Seq("doc_id"), "left_semi"))
      .filter(col("kept") === 1).collect().map(_.getLong(0))
      .count(id => srcOf(id) == "sA")
    assert(quotaKeptSA == operators.TrainPrep.SourceQuota,
      "sA must be cut to exactly the quota")

    // split: only train docs are packed
    m.keySet.foreach { id =>
      val split = docs.sparkSession.range(1)
        .select(operators.TrainPrep.splitOf(lit(id)).as("s")).collect()(0).getString(0)
      assert(split == "train", s"doc $id in manifest has split $split")
    }

    // pack geometry: offsets are the running token sum in doc_id order
    var offset = 0L
    m.toSeq.sortBy(_._1).foreach { case (id, (nTok, start, shardId, nShards, _, _)) =>
      assert(start == offset, s"doc $id start_offset $start != running sum $offset")
      assert(shardId == start / 2048L)
      val expShards =
        if (nTok == 0) 0L else (start + nTok - 1) / 2048L - start / 2048L + 1L
      assert(nShards == expShards)
      offset += nTok
    }

    // shuffle geometry: per-shard positions are 1..n contiguous
    m.values.groupBy(_._5).foreach { case (_, gs) =>
      val ps = gs.map(_._6).toSeq.sorted
      assert(ps == (1L to ps.size).toSeq, s"shuffle positions not contiguous: $ps")
    }
  }

  test("temperature stage: alpha=1 is keep-all (== the pre-temp quota->split chain); alpha=1/2 upweights small sources") {
    import org.apache.spark.sql.functions._
    val docs = mkDocs()
    val decisions = operators.Curate.curateDecontam(docs).localCheckpoint()
    // the pre-temp chain, reconstructed: quota survivors -> rank keep
    // (the r20 q103 stage sits between quota and temp) -> train split
    val kept = decisions.filter(col("verdict") === "kept").select("doc_id")
    val quotaKept = operators.TrainPrep.sourceQuotaOf(
        docs.select("doc_id", "source").join(kept, Seq("doc_id"), "left_semi"))
      .filter(col("kept") === 1)
      .select("doc_id", "source")
      .localCheckpoint()
    val preTemp = quotaKept
      .join(operators.Graph.crawlPriorityKeepOf(docs).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .filter(operators.TrainPrep.splitOf(col("doc_id")) === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // alpha = 1 (alpha2 = 2): w = n -> every rate is 10^6 -> keep-all
    val at1 = operators.TrainPipeline.trainIds(docs, decisions, tempAlpha2 = 2)
      .collect().map(_.getLong(0)).toSet
    assert(at1 == preTemp, "alpha=1 must reproduce the pre-temp chain exactly")
    val rates1 = operators.TrainPrep.tempMixtureOf(quotaKept, alpha2 = 2)
      .select("rate_ppm").distinct().collect().map(_.getLong(0)).toSet
    assert(rates1 == Set(1000000L), "alpha=1 rates are all exactly 10^6")
    // alpha = 1/2 (the pipeline default): the min-count source keeps
    // fully; larger sources sample at 10^6*sqrt(n)*n_m/(n*w_m) ppm
    val rates = operators.TrainPrep.tempMixtureOf(quotaKept, alpha2 = 1)
      .select("source", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = quotaKept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (mSrc, nM) = counts.toSeq.sortBy { case (s, n) => (n, s) }.head
    val wM = math.sqrt(nM.toDouble).toLong
    assert(rates(mSrc) == 1000000L, "the min-count source keeps fully")
    counts.foreach { case (src, n) =>
      val w = math.sqrt(n.toDouble).toLong
      assert(rates(src) == math.min(1000000L, 1000000L * w * nM / (n * wM)),
        s"rate law broken for $src")
    }
    // and the default manifest only ever SHRINKS the pre-temp doc set
    val atHalf = operators.TrainPipeline.trainIds(docs, decisions)
      .collect().map(_.getLong(0)).toSet
    assert(atHalf.subsetOf(preTemp))
  }

  test("staged pipeline matches the unstaged composition and resumes after a killed stage") {
    val run = "/tmp/graft-test/trainprep-staged"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(run))
    val docs = mkDocs()
    val oneShot = rows(operators.TrainPipeline.manifest(docs))

    val (m1, reports1) = operators.TrainPipeline.trainPrepStaged(spark, docs, run)
    assert(reports1.map(_.name) == Seq("staged", "contam", "contam_fuzzy", "contam_sem",
      "exact", "near",
      "clusters", "decisions", "quota", "rank", "temp", "split", "pack", "shuffle", "manifest"))
    assert(reports1.forall(r => r.attempts == 1 && !r.resumed))
    assert(rows(m1) == oneShot, "staged manifest matches the unstaged composition")

    // kill the quota stage mid-pipeline (no _SUCCESS = crashed mid-write),
    // clearing its downstream like Airflow's clear-with-downstream; the
    // resume re-reads all eight curation stages from their markers and
    // recomputes only the training-prep tail
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$run/quota/_SUCCESS"))
    Seq("temp", "split", "pack", "shuffle", "manifest").foreach { st =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$run/$st"))
    }
    val (m2, reports2) = operators.TrainPipeline.trainPrepStaged(spark, docs, run)
    val byName = reports2.map(r => r.name -> r.resumed).toMap
    // rank's marker was never cleared and the stage has no dependence
    // on quota, so the resume REUSES the graph sweeps — exactly the
    // expensive-stage reuse the checkpointing exists for
    Seq("staged", "contam", "contam_fuzzy", "contam_sem", "exact", "near", "clusters",
        "decisions", "rank").foreach(s =>
      assert(byName(s), s"stage $s must resume from its marker"))
    Seq("quota", "temp", "split", "pack", "shuffle", "manifest").foreach(s =>
      assert(!byName(s), s"stage $s must recompute"))
    assert(rows(m2) == oneShot, "resumed run reproduces the identical manifest")
  }
}
