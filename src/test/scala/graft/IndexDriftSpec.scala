package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.{IndexDrift, Ivf, SparseIndex}

/** The drift monitor's planted trip/no-trip semantics (the LAW is
  * hash-gated by q90_cell_drift over the portable sparse bucket
  * edition): an in-distribution append stays under the staleness
  * threshold, an off-distribution append trips it — on BOTH persisted
  * layouts the monitor serves (sparse `bkt` postings and learned-IVF
  * `cluster` lists).
  */
class IndexDriftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private def toked(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), graft.gfunctions.ws_tokens(col("text")).as("toks"))
  }

  test("sparse index: a template-collapse append trips, a same-vocabulary append does not") {
    // base + in-distribution batch: 20 distinct tokens per doc from a
    // 500-token vocabulary — postings spread hash-uniformly over the 64
    // buckets. Off-distribution batch: every doc is the SAME 3-token
    // template (the crawl-template-collapse failure mode) — all its
    // postings mass lands in <= 3 buckets.
    def diverse(ids: Range) = ids.map { i =>
      (i.toLong, (0 until 20).map(j => s"t${(i * 7 + j) % 500}").mkString(" "))
    }
    val dir = "/tmp/graft-test/drift_sparse"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    SparseIndex.writeIndex(toked(diverse(0 until 200)), dir)
    SparseIndex.appendIndexBatch(toked(diverse(1000 until 1150)), dir, 0L, "in-")
    SparseIndex.appendIndexBatch(
      toked((2000 until 2040).map(i => (i.toLong, "spam buy now"))), dir, 0L, "off-")
    val got = IndexDrift.cellDrift(spark, dir, "bkt").collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    val (inPpm, inStale) = got("in-0")
    val (offPpm, offStale) = got("off-0")
    assert(!inStale, s"in-distribution append must stay quiet, got $inPpm ppm")
    assert(offStale, s"template-collapse append must trip, got $offPpm ppm")
    assert(offPpm > 5 * inPpm, s"separation: off $offPpm vs in $inPpm")
  }

  test("IVF index: a single-cell vector flood trips, a same-manifold append does not") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").localCheckpoint()
    val dir = "/tmp/graft-test/drift_ivf"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val centroids = Ivf.train(emb, k = 8)
    Ivf.writeIndex(emb.filter(col("vec_id") % 2 === 0), centroids, dir)
    // in-distribution: the odd half of the same corpus
    Ivf.appendIndexBatch(emb.filter(col("vec_id") % 2 === 1), dir, 0L, "in-")
    // off-distribution: flood the RAREST base cell (flooding the
    // dominant cell is correctly low-drift — mass goes where mass was);
    // the flood vector is that cell's own centroid, so its assignment
    // is the cell by construction
    val rare = Ivf.readIndex(spark, dir).groupBy("cluster").count()
      .orderBy(col("count").asc, col("cluster").asc).limit(1)
      .collect().head.getInt(0)
    val flood = (10000 until 10100).map(i => (i.toLong, centroids(rare)))
      .toDF("vec_id", "embedding")
    Ivf.appendIndexBatch(flood, dir, 0L, "off-")
    val got = IndexDrift.cellDrift(spark, dir, "cluster").collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(!got("in-0")._2, s"same-manifold append must stay quiet: ${got("in-0")}")
    assert(got("off-0")._2, s"single-cell flood must trip: ${got("off-0")}")
  }

  test("cellDrift refuses an index with no un-folded appends (drift is pre-compaction evidence)") {
    val dir = "/tmp/graft-test/drift_nofold"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    SparseIndex.writeIndex(toked(Seq((1L, "alpha beta"), (2L, "gamma delta"))), dir)
    val e = intercept[IllegalArgumentException](
      IndexDrift.cellDrift(spark, dir, "bkt").collect())
    assert(e.getMessage.contains("compaction"))
  }

  test("cellDrift ignores folded batches a crashed post-flip GC left behind") {
    // Compaction's crash window: generation flipped (_folded records the
    // batch) but the batch data dir was not yet GC'd. The batch's rows
    // are ALREADY IN the base, so measuring it against that base
    // self-dampens — the monitor must skip it, not report it quiet.
    val dir = "/tmp/graft-test/drift_folded"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def diverse(ids: Range) = ids.map { i =>
      (i.toLong, (0 until 20).map(j => s"t${(i * 7 + j) % 500}").mkString(" "))
    }
    SparseIndex.writeIndex(toked(diverse(0 until 200)), dir)
    SparseIndex.appendIndexBatch(toked(diverse(1000 until 1100)), dir, 0L, "fold-")
    // preserve the batch dir across compaction, then restore it — the
    // exact on-disk state of a compaction killed between flip and GC
    val batchDir = new java.io.File(s"$dir/_appends_data/fold-0")
    val stash = new java.io.File("/tmp/graft-test/drift_folded_stash")
    org.apache.commons.io.FileUtils.deleteQuietly(stash)
    org.apache.commons.io.FileUtils.copyDirectory(batchDir, stash)
    SparseIndex.compactIndex(spark, dir)
    org.apache.commons.io.FileUtils.copyDirectory(stash, batchDir)
    // the folded batch must not be measured...
    val e = intercept[IllegalArgumentException](
      IndexDrift.cellDrift(spark, dir, "bkt").collect())
    assert(e.getMessage.contains("un-folded"))
    // ...while a genuinely new append beside it still is, alone
    SparseIndex.appendIndexBatch(
      toked((3000 until 3040).map(i => (i.toLong, "spam buy now"))), dir, 0L, "new-")
    val rows = IndexDrift.cellDrift(spark, dir, "bkt").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("new-0"),
      s"only the un-folded batch is evidence: ${rows.map(_.getString(0)).mkString(",")}")
    assert(rows.head.getBoolean(4), "the template-collapse append still trips")
  }
}
