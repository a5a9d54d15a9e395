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

  /** In-distribution corpus law shared by the drift tests: 20 distinct
    * tokens per doc from a 500-token vocabulary — postings spread
    * hash-uniformly over the buckets for ANY consecutive id range.
    */
  private def diverse(ids: Range) = ids.map { i =>
    (i.toLong, (0 until 20).map(j => s"t${(i * 7 + j) % 500}").mkString(" "))
  }

  test("sparse index: a template-collapse append trips, a same-vocabulary append does not") {
    // base + in-distribution batch: 20 distinct tokens per doc from a
    // 500-token vocabulary — postings spread hash-uniformly over the 64
    // buckets. Off-distribution batch: every doc is the SAME 3-token
    // template (the crawl-template-collapse failure mode) — all its
    // postings mass lands in <= 3 buckets.
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

  test("streamed appends are drift evidence: an off-distribution micro-batch trips") {
    // The r17 streaming ingest lane lands micro-batches through the
    // same appendIndexBatch path, so the monitor covers a LIVE stream
    // with zero extra plumbing — the retrain trigger works at
    // micro-batch latency, not just for batch appends.
    import spark.implicits._
    val base = "/tmp/graft-test/drift_stream"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val in = s"$base/in"; val ckpt = s"$base/ck"; val idx = s"$base/index"
    SparseIndex.writeIndex(toked(diverse(0 until 200)), idx)
    val schema = toked(diverse(0 until 1)).schema
    // wave 1 in-distribution, wave 2 the template collapse — one FILE
    // each (maxFilesPerTrigger 1), so they land as separate batches
    toked(diverse(1000 until 1100)).coalesce(1)
      .write.mode("append").parquet(in)
    toked((2000 until 2040).map(i => (i.toLong, "spam buy now"))).coalesce(1)
      .write.mode("append").parquet(in)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = streaming.Streams.sparseIndexAppendStream(src, idx, Some(ckpt))
    try q.processAllAvailable() finally q.stop()
    val rows = IndexDrift.cellDrift(spark, idx, "bkt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(4)))
    assert(rows.length == 2, s"two streamed batches measured: ${rows.mkString(",")}")
    // identify the waves by size: 100 diverse docs x ~20 postings vs
    // 40 template docs x 3 postings
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    assert(!big._3, s"the in-distribution micro-batch stays quiet: $big")
    assert(small._3, s"the template-collapse micro-batch trips: $small")
  }

  test("the retrain loop closes: a tripped quantizer retrained on the drifted corpus goes quiet") {
    // q90 gives the index lifecycle its retrain TRIGGER; this pins the
    // full decision loop — a new modality trips, retrain-equals-rebuild
    // on the corpus INCLUDING the drifted appends, and appends drawn
    // from the NEW steady-state mixture no longer trip (the retrained
    // quantizer's base histogram IS that mixture). A pure-modality
    // batch stays off-distribution even post-retrain — correctly: the
    // monitor flags distribution change, not unknown vectors.
    import spark.implicits._
    val dir = "/tmp/graft-test/drift_retrain"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // modality A: dense pseudo-random vectors from a fixed integer law
    // (distribution identical over ANY consecutive id range)
    def textish(ids: Range) = ids.map { i =>
      (i.toLong, Array.tabulate(8)(j => (((i * 31 + j * 7) % 11) - 5).toFloat))
    }.toDF("vec_id", "embedding")
    // modality B: axis-aligned spikes modality A never produces
    def spikes(ids: Range) = ids.map { i =>
      val v = Array.fill(8)(0f); v(i % 4) = if (i % 2 == 0) 1f else -1f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val base = textish(0 until 500)
    Ivf.writeIndex(base, Ivf.train(base, k = 8), dir)
    Ivf.appendIndexBatch(spikes(10000 until 10100), dir, 0L, "mod-")
    val tripped = IndexDrift.cellDrift(spark, dir, "cluster").collect()
    assert(tripped.head.getBoolean(4), s"the new modality must trip: ${tripped.head}")
    // retrain = rebuild on base + drifted appends (the lifecycle rule)
    val all = base.unionByName(spikes(10000 until 10100)).localCheckpoint()
    Ivf.writeIndex(all, Ivf.train(all, k = 8), dir)
    // steady state: appends carry the same 5:1 mixture the retrained
    // base now holds — quiet; a pure-spike batch beside it still trips
    Ivf.appendIndexBatch(
      textish(20000 until 20250).unionByName(spikes(30000 until 30050)), dir, 0L, "mix-")
    Ivf.appendIndexBatch(spikes(40000 until 40100), dir, 0L, "pure-")
    val after = IndexDrift.cellDrift(spark, dir, "cluster").collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(!after("mix-0"), s"the steady-state mixture is in-distribution post-retrain: $after")
    assert(after("pure-0"), s"a pure-modality batch is still a distribution change: $after")
  }

  test("cellDrift ignores folded batches a crashed post-flip GC left behind") {
    // Compaction's crash window: generation flipped (_folded records the
    // batch) but the batch data dir was not yet GC'd. The batch's rows
    // are ALREADY IN the base, so measuring it against that base
    // self-dampens — the monitor must skip it, not report it quiet.
    val dir = "/tmp/graft-test/drift_folded"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
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
