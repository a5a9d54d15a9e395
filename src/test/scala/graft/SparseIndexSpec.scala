package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.{Similarity, SparseIndex}

/** Persisted sparse (BM25) index lifecycle — write / serve / append /
  * replay / compact. The LAW is q85's (hash-gated there and via the
  * registry's sparse_index_bm25 whose oracle is q85's own SQL over the
  * full corpus); these specs pin the LIFECYCLE: serving parity with the
  * in-memory plan, append ≡ rebuild (the df + totals merge), idempotent
  * batch replay incl. the crash window, compaction GC + parity, and the
  * partition pruning that makes a serve touch buckets, not the corpus.
  */
class SparseIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private def toked(rows: Seq[(Long, String)]): DataFrame =
    tokedAll(rows).filter(size(col("toks")) > 0)

  /** Tokenized WITHOUT the eligibility filter — feeds the write paths
    * raw so the specs can prove the INDEX enforces the population law.
    */
  private def tokedAll(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), graft.gfunctions.ws_tokens(col("text")).as("toks"))
  }

  // Shared-vocabulary corpus: every doc reachable from every query doc.
  private val corpusRows = Seq(
    (1L, "zebra lion tiger"),
    (2L, "zebra zebra lion"),
    (3L, "lion tiger puma wolf"),
    (10L, "zebra tiger"),
    (11L, "puma wolf"),
    (12L, "zebra lion tiger puma wolf bear"),
  )

  private def served(dir: String, k: Int = 5): Seq[(Long, Int, Long, Long)] =
    SparseIndex.bm25Search(spark, dir, toked(corpusRows).orderBy("doc_id").limit(3), k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq

  private def inMemory(k: Int = 5): Seq[(Long, Int, Long, Long)] =
    Similarity.bm25SearchMd5From(toked(corpusRows).localCheckpoint(), k, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq

  test("write -> serve equals the in-memory q85 plan, and the scan prunes buckets") {
    val dir = "/tmp/graft-test/sparse_idx_base"
    SparseIndex.writeIndex(toked(corpusRows), dir)
    val q = SparseIndex.bm25Search(
      spark, dir, toked(corpusRows).orderBy("doc_id").limit(3), 5)
    val got = q.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == inMemory(), "persisted serve must not change a single ranked row or score")
    // the scale property: the postings fetch statically prunes to the
    // query terms' hash buckets (the fetch stage is pinned behind a
    // localCheckpoint inside bm25Search, so assert on the isolated
    // pruned-read plan the serve runs)
    val someHs = SparseIndex.postingsOf(toked(corpusRows))
      .select("h").distinct().limit(3).collect().map(_.getLong(0))
    val plan = SparseIndex.prunedPostings(spark, dir, someHs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("bkt"),
      s"expected a bkt partition filter in the postings scan:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("In(h"),
      s"expected the h IN filter pushed to parquet:\n$plan")
  }

  test("append == rebuild on served rows (df and totals merge across the batch boundary)") {
    val full = "/tmp/graft-test/sparse_idx_full"
    val split = "/tmp/graft-test/sparse_idx_split"
    SparseIndex.writeIndex(toked(corpusRows), full)
    // base gets 4 docs, the append the other 2 — df('zebra') and the
    // (S, N) totals are only correct if both merge across the boundary
    val (baseRows, deltaRows) = corpusRows.partition(_._1 <= 3L)
    SparseIndex.writeIndex(toked(baseRows), split)
    SparseIndex.appendIndex(toked(deltaRows), split)
    assert(served(split) == served(full),
      "an appended index must serve exactly like a rebuilt one")
    // totals merged: one (S, N) pair equal to the full corpus's
    val t = SparseIndex.readTotals(spark, split).collect().head
    val dls = corpusRows.map(_._2.split(" ").length.toLong)
    assert((t.getLong(0), t.getLong(1)) == ((dls.sum, dls.size.toLong)),
      s"merged totals wrong: $t")
  }

  test("idempotent batch append: replay is a no-op; the landed-but-unmarked crash window self-heals") {
    val dir = "/tmp/graft-test/sparse_idx_batch"
    val (baseRows, deltaRows) = corpusRows.partition(_._1 <= 3L)
    SparseIndex.writeIndex(toked(baseRows), dir)
    SparseIndex.appendIndexBatch(toked(deltaRows), dir, 0L, "ns1-")
    val once = served(dir)
    // full replay (marker present): no duplication
    SparseIndex.appendIndexBatch(toked(deltaRows), dir, 0L, "ns1-")
    assert(served(dir) == once, "a marked batch replay must not re-land rows")
    // crash window: data landed, marker lost — replay must re-mark, not re-land
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_appends/ns1-0")
    assert(fs.delete(marker, false), "spec setup: marker must exist to delete")
    SparseIndex.appendIndexBatch(toked(deltaRows), dir, 0L, "ns1-")
    assert(fs.exists(marker), "replay must restore the marker")
    assert(served(dir) == once, "the crash-window replay must not duplicate rows")
    // tf really is duplicated if the fence fails: double-landing doubles
    // every tf and df — assert the postings row count directly too
    val nPostings = SparseIndex.readPostings(spark, dir).count()
    val expected = corpusRows.map(_._2.split(" ").distinct.length).sum
    assert(nPostings == expected, s"postings rows $nPostings != $expected")
  }

  /** Every parquet data file under `root` must be h-sorted — the
    * row-group-pruning layout invariant, checked on the FILES, not the
    * plan (r17 review: the pre-fix sort ran before the repartition and
    * was silently destroyed by it).
    */
  private def assertHSorted(root: String): Unit = {
    import scala.jdk.CollectionConverters._
    val base = new java.io.File(root)
    val files = scala.util.Using.resource(java.nio.file.Files.walk(base.toPath)) { walk =>
      walk.iterator().asScala
        .map(_.toFile).filter(f => f.getName.endsWith(".parquet") && f.getPath.contains("bkt="))
        .toSeq
    }
    assert(files.nonEmpty, s"no bucket data files under $root")
    files.foreach { f =>
      val hs = spark.read.parquet(f.getAbsolutePath)
        .select("h").collect().map(_.getLong(0))
      assert(hs.sameElements(hs.sorted), s"${f.getPath} is not h-sorted")
    }
  }

  test("an empty streamed batch marks but lands nothing; the index stays readable (both lanes)") {
    // r17 review: foreachBatch can deliver a zero-row batch (restart
    // replay, upstream filter); an empty partitioned write is a
    // data-less visible dir that bricks every later read of the union
    val dir = "/tmp/graft-test/sparse_idx_empty"
    SparseIndex.writeIndex(toked(corpusRows), dir)
    val before = served(dir)
    SparseIndex.appendIndexBatch(toked(Seq.empty), dir, 5L, "nsE-")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_appends/nsE-5")),
      "the empty batch still commits (marker) so a replay stays fenced")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_appends_data/nsE-5")),
      "no data-less directory lands")
    assert(served(dir) == before, "serving survives the empty batch")
    // the IVF lane shares the guard
    import spark.implicits._
    val idxDir = "/tmp/graft-test/ivf_idx_empty"
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    operators.Ivf.writeIndex(emb, operators.Ivf.train(emb, k = 4, iters = 1), idxDir)
    val n = operators.Ivf.readIndex(spark, idxDir).count()
    operators.Ivf.appendIndexBatch(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), idxDir, 7L, "nsE-")
    assert(operators.Ivf.readIndex(spark, idxDir).count() == n,
      "IVF index stays readable and unchanged after an empty batch")
  }

  test("zero-token docs never enter the index: mixed batch lands only eligible docs (r17 ADVICE)") {
    // the q85 population law (len(toks) > 0) is enforced at the write
    // paths themselves — a streamed batch carrying empty docs used to
    // inflate n_docs and drift served scores from the gated oracle
    val mixed = "/tmp/graft-test/sparse_idx_mixed"
    val clean = "/tmp/graft-test/sparse_idx_clean"
    val (baseRows, deltaRows) = corpusRows.partition(_._1 <= 3L)
    val emptyDocs = Seq((90L, ""), (91L, "   \t "))
    // mixed lifecycle: empty docs ride along at every write path
    SparseIndex.writeIndex(tokedAll(baseRows ++ emptyDocs.take(1)), mixed)
    SparseIndex.appendIndexBatch(tokedAll(deltaRows ++ emptyDocs.drop(1)), mixed, 0L, "nsM-")
    SparseIndex.writeIndex(toked(baseRows), clean)
    SparseIndex.appendIndexBatch(toked(deltaRows), clean, 0L, "nsM-")
    assert(served(mixed) == served(clean),
      "empty-toks docs must not change a served row")
    val t = SparseIndex.readTotals(spark, mixed).collect().head
    val dls = corpusRows.map(_._2.split(" ").length.toLong)
    assert((t.getLong(0), t.getLong(1)) == ((dls.sum, dls.size.toLong)),
      s"totals must count only eligible docs: $t")
    // an all-empty batch degenerates to the empty-batch path: marker, no data
    SparseIndex.appendIndexBatch(tokedAll(emptyDocs), mixed, 1L, "nsM-")
    val fs = new org.apache.hadoop.fs.Path(mixed)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$mixed/_appends/nsM-1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$mixed/_appends_data/nsM-1")))
  }

  test("mega-document query: the budget ranks on the df sidecar BEFORE any postings fetch (r17 judge item)") {
    // a query doc with hundreds of distinct terms used to drag EVERY
    // one of its term lists just to learn which 16 survive the budget;
    // with the _df sidecar the fetch is bounded at KeywordQueryTerms
    // lists per query
    val dir = "/tmp/graft-test/sparse_idx_mega"
    val terms = (0 until 400).map(i => s"term$i")
    // the mega doc (doc_id 0) carries every term; the rest of the
    // corpus spreads term df so the 16-rarest budget is a real choice
    val megaRows = Seq((0L, terms.mkString(" "))) ++
      (1 to 40).map(i => (i.toLong, terms.take(10 * i).mkString(" ")))
    SparseIndex.writeIndex(toked(megaRows), dir)
    val queryFrame = toked(megaRows).filter(col("doc_id") === 0L)
    // the spec seam: the budget survivors, computed sidecar-only
    val qterms = queryFrame
      .select(col("doc_id").as("query_id"), explode(col("toks")).as("tok"))
      .select(col("query_id"), operators.ExprUtil.md5Hash60(col("tok")).as("h"))
      .distinct()
    val units = graft.sources.Generations.liveRoots(
      graft.sources.IndexLayout.fsOf(spark, dir), dir,
      graft.sources.IndexLayout.AppendsDataSubdir)
    val budgeted = SparseIndex.budgetTerms(spark, units, qterms).collect()
    assert(qterms.count() == 400L, "spec setup: the query really has 400 distinct terms")
    assert(budgeted.length == Similarity.KeywordQueryTerms,
      s"the fetch set must be budgeted to ${Similarity.KeywordQueryTerms} lists, " +
        s"got ${budgeted.length}")
    // ...and the budgeted serve still equals the in-memory q85 law
    val got = SparseIndex.bm25Search(spark, dir, queryFrame, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val want = Similarity.bm25SearchMd5From(toked(megaRows).localCheckpoint(), 5, 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "budget-before-fetch must not change a served row")
  }

  test("bm25Search rejects an over-sized query set with a readable error (r17 ADVICE)") {
    val dir = "/tmp/graft-test/sparse_idx_guard"
    SparseIndex.writeIndex(toked(corpusRows), dir)
    import spark.implicits._
    val tooMany = (0 until SparseIndex.MaxServeQueries + 1)
      .map(i => (i.toLong, "zebra")).toDF("doc_id", "text")
      .select(col("doc_id"), graft.gfunctions.ws_tokens(col("text")).as("toks"))
    val e = intercept[IllegalArgumentException](
      SparseIndex.bm25Search(spark, dir, tooMany, 5))
    assert(e.getMessage.contains("MaxServeQueries"))
    assert(e.getMessage.contains("bm25SearchMd5From"),
      "the error must point at the batch-scoring alternative")
  }

  test("compaction folds batches and totals, GCs batch data, and serving is unchanged") {
    val dir = "/tmp/graft-test/sparse_idx_compact"
    val (baseRows, deltaRows) = corpusRows.partition(_._1 <= 3L)
    SparseIndex.writeIndex(toked(baseRows), dir)
    SparseIndex.appendIndexBatch(toked(deltaRows), dir, 0L, "nsC-")
    // the h-sort layout invariant holds for the base AND the landed batch
    assertHSorted(dir)
    val before = served(dir)
    SparseIndex.compactIndex(spark, dir)
    assert(served(dir) == before, "a fold must not change a served row")
    // ...and survives the fold into the new generation
    assertHSorted(graft.sources.IndexLayout.liveRoot(spark, dir))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_appends_data/nsC-0")),
      "folded batch data must be GC'd")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_appends/nsC-0")),
      "the replay marker is immortal")
    // totals folded into ONE base-root row
    val root = graft.sources.IndexLayout.liveRoot(spark, dir)
    assert(spark.read.parquet(s"$root/${SparseIndex.TotalsSubdir}").count() == 1L)
    // the df sidecar folded too: one merged (h, df) table equal to the
    // full corpus's derived df
    val foldedDf = spark.read.parquet(s"$root/${SparseIndex.DfSubdir}")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wantDf = SparseIndex.postingsOf(toked(corpusRows))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(foldedDf == wantDf, "folded _df sidecar must equal derived df")
    // a post-GC replay of the folded batch stays a no-op
    SparseIndex.appendIndexBatch(toked(deltaRows), dir, 0L, "nsC-")
    assert(served(dir) == before, "a replay of a folded batch must not re-land")
    // and the lifecycle keeps going: append after compaction serves merged
    SparseIndex.appendIndexBatch(toked(Seq((20L, "zebra bear"))), dir, 1L, "nsC-")
    val t = SparseIndex.readTotals(spark, dir).collect().head
    val dls = corpusRows.map(_._2.split(" ").length.toLong) :+ 2L
    assert((t.getLong(0), t.getLong(1)) == ((dls.sum, dls.size.toLong)),
      s"post-compact append totals wrong: $t")
  }
}
