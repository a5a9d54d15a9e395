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
}
