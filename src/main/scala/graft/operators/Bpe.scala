package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** BPE MERGE TRAINING (r17 judge item) — the tokenizer-FIT step q71
  * left open: q71 counts pieces under a FIXED pre-tokenizer; a training
  * pipeline also fits the merge table (Sennrich et al. 2016). The fit
  * follows the IVF-centroids model discipline exactly:
  *
  *  - DISTRIBUTED COUNTING: one corpus scan aggregates pre-tokenizer
  *    piece frequencies (map-side combined; pieces are the
  *    [[TextAnalysis.BpePattern]] runs, the q71 law);
  *  - BOUNDED DRIVER-SIDE MODEL FIT: the top-[[TrainVocab]] pieces by
  *    (count DESC, piece ASC) collect — the vocabulary-with-counts is
  *    the fit sample, bounded like [[Ivf.trainingSample]] — and the
  *    merge loop runs on the driver: each round counts adjacent symbol
  *    pairs over the (piece, count) states (occurrence-weighted, exact
  *    integers), picks the max under the DETERMINISTIC tie law
  *    (count DESC, then (left, right) lexicographic ASC), and merges
  *    it left-to-right non-overlapping in every piece;
  *  - the MERGE TABLE is the model artifact — an ordered Seq of
  *    (left, right), replayable and versionable like centroids.
  *
  * Application (inference) is per DISTINCT piece, not per occurrence:
  * [[segLens]] maps the distinct-piece table through the standard
  * lowest-rank-first merge loop (mapPartitions — an iterative
  * algorithm no Catalyst expression can host, the HtmlTree/ImageIO
  * convention), and occurrence counts re-attach by join. At 100 TB the
  * merge loop therefore runs |vocabulary| times, never |corpus| times,
  * and only (piece, count) rows cross exchanges.
  *
  * Gates: `q91_bpe_pairs` puts the FIRST merge round — the pair-count
  * law and the tie law — under the HARD gate (pure ANSI: pieces,
  * adjacent char pairs, counts, rank). The learned multi-round table
  * is inherently iterative/driver-side, so `q91_bpe_train` (per-source
  * fertility under the learned merges) is rows-only with BpeSpec
  * pinning the merges against a hand-computed reference and the
  * round-1 selection against the gated law.
  */
object Bpe {

  /** Fit-sample bound: the merge loop sees the top-V pieces by
    * (count DESC, piece ASC). Heavy-tailed piece distributions put all
    * merge-relevant mass in the head (the [[Ivf.trainingSample]]
    * argument); the gate's round-1 twin runs UNCAPPED, and BpeSpec's
    * corpus sits far under the cap so fit == uncapped fit there.
    */
  private[graft] val TrainVocab = 4096

  /** Merge-table size: enough to give every frequent pattern a
    * subword while the fit stays a sub-second driver loop. */
  private[graft] val NMerges = 256

  private def piecesCol = regexp_extract_all(col("text"), lit(TextAnalysis.BpePattern), lit(0))

  /** Distributed piece counting — ONE map-side-combined aggregate. */
  def pieceCounts(docs: DataFrame): DataFrame =
    docs.select(explode(piecesCol).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** One round of pair counting over (symbols, count) piece states:
    * every adjacent position contributes the piece's count (overlaps
    * included — "aaa" carries (a,a) twice). Exposed for the spec.
    */
  private[graft] def pairCounts(
      words: Seq[(Array[String], Long)]): Map[(String, String), Long] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
    words.foreach { case (syms, c) =>
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        m.update(k, m.getOrElse(k, 0L) + c)
        i += 1
      }
    }
    m.toMap
  }

  /** Merge one pair left-to-right, non-overlapping. */
  private[graft] def mergeOnce(
      syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** A piece's initial symbols, split on CODEPOINTS — the unit the
    * gated pair law counts (Spark `substring`/`length` and DuckDB both
    * index codepoints). A UTF-16 char split would turn one
    * supplementary-plane symbol (emoji — a single piece under
    * BpePattern's symbol branch) into two lone surrogates, forking the
    * fit from its own gated round-1 law.
    */
  private def codepoints(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** The driver-side merge loop over a bounded (piece, count) sample.
    * Tie law: count DESC, then (left, right) lexicographic ASC — fully
    * deterministic, spec-pinned against a hand-computed reference.
    * Stops early when no adjacent pair remains.
    */
  def trainMerges(vocab: Seq[(String, Long)], nMerges: Int = NMerges): Seq[(String, String)] = {
    var words = vocab.map { case (w, c) => (codepoints(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = pairCounts(words)
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Fit from a corpus: distributed counting, bounded collect, driver
    * loop. The collect order (count DESC, piece ASC) is part of the
    * model's determinism contract.
    */
  def fit(docs: DataFrame, nMerges: Int = NMerges, vocabCap: Int = TrainVocab): Seq[(String, String)] =
    trainMerges(
      pieceCounts(docs)
        .orderBy(col("cnt").desc, col("w").asc)
        .limit(vocabCap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      nMerges)

  /** Apply a learned merge table to one piece: repeatedly merge the
    * LOWEST-RANK adjacent pair (leftmost on rank ties) until none
    * applies — the standard BPE inference loop.
    */
  private[graft] def segment(w: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = codepoints(w)
    var go = syms.length >= 2
    while (go) {
      var bestI = -1
      var bestR = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestR) { bestR = r; bestI = i }
        i += 1
      }
      if (bestI < 0) go = false
      else {
        syms = (syms.take(bestI) :+ (syms(bestI) + syms(bestI + 1))) ++ syms.drop(bestI + 2)
        go = syms.length >= 2
      }
    }
    syms
  }

  /** Subword counts per DISTINCT piece under a merge table — the
    * mapPartitions codec (iterative merge loop; no Catalyst host), run
    * once per distinct piece. The merge table rides the task closure
    * like any bounded model artifact.
    */
  def segLens(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    words.select(col("w")).as[String]
      .mapPartitions(it => it.map(w => (w, segment(w, rank).length.toLong)))
      .toDF("w", "n_sub")
  }

  /** Per-source fertility under the learned merges: subwords per
    * whitespace token beside q71's fixed-pre-tokenizer fertility.
    * compression_ppm = 10^6 · subwords div pieces measures how much the
    * merge table compresses the piece stream (10^6 = no merges apply).
    */
  def fertilityUnder(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val perSrcWord = docs
      .select(col("source"), explode(piecesCol).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // read by the distinct-piece seg AND the re-attach join
    val lens = segLens(perSrcWord.select("w").distinct(), merges)
    val ws = docs.groupBy("source").agg(
      sum(size(graft.gfunctions.ws_tokens(col("text"))).cast("long")).as("n_ws"))
    perSrcWord
      .join(lens, Seq("w"))
      .groupBy("source")
      .agg(
        sum(col("cnt")).as("sum_pieces"),
        sum(col("cnt") * col("n_sub")).as("sum_subwords"))
      .join(ws, Seq("source"))
      .select(
        col("source"), col("sum_pieces"), col("sum_subwords"),
        expr("1000000 * sum_subwords div sum_pieces").as("compression_ppm"),
        (col("sum_subwords").cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .cast("double") / col("n_ws")).as("fertility"))
  }

  // ------------------------------------------------------------- queries

  private val mergeCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, String)]]

  private[graft] def cachedMerges(s: SparkSession, d: String): Seq[(String, String)] =
    mergeCache.getOrElseUpdate(d, fit(Tables.documents(s, d)))

  /** Per-source fertility under the merges LEARNED from the same
    * corpus. Rows-only by design (an iterative learned model has no
    * ANSI formulation); the pair/tie law is hash-gated by
    * q91_bpe_pairs and the loop by BpeSpec's hand-computed reference.
    */
  val qBpeTrain = GraftQuery(
    "q91_bpe_train",
    (s, d) => fertilityUnder(Tables.documents(s, d), cachedMerges(s, d)).orderBy("source"),
    None,
    prod = Some((s, d) => fertilityUnder(Tables.documents(s, d), cachedMerges(s, d))),
  )

  /** How many top pairs the round-1 gate emits. */
  private[graft] val PairsTopK = 32

  /** The FIRST merge round under the HARD gate: adjacent-char pair
    * counts over every piece occurrence (the exact table round 1 of
    * [[trainMerges]] ranks, uncapped) with the tie law as the emitted
    * order — rank 1 IS the first learned merge. The char-pair domain is
    * bounded by charset² — the global rank window ranks a tiny
    * aggregate, never corpus rows.
    */
  val qBpePairs = GraftQuery(
    "q91_bpe_pairs",
    (s, d) => {
      val pairs = Tables.documents(s, d)
        .select(explode(piecesCol).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
      pairs
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("a").asc, col("b").asc)))
        .filter(col("rk") <= PairsTopK)
        .select(col("rk").cast("int").as("rk"), col("a"), col("b"), col("cnt"))
        .orderBy("rk")
    },
    Some(s"""WITH p AS (
        SELECT unnest(regexp_extract_all(text, '${TextAnalysis.BpePattern}')) AS w
        FROM documents),
      pr AS (
        SELECT substr(w, CAST(i AS INT), 1) AS a, substr(w, CAST(i AS INT) + 1, 1) AS b
        FROM p CROSS JOIN UNNEST(range(1, len(w))) AS u(i)
        WHERE len(w) >= 2),
      c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM pr GROUP BY a, b),
      r AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, a, b) AS INT) AS rk, a, b, cnt
        FROM c)
      SELECT rk, a, b, cnt FROM r WHERE rk <= $PairsTopK ORDER BY rk"""),
  )

  def all: Seq[GraftQuery] = Seq(qBpeTrain, qBpePairs)
}
