package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the SERVED hybrid
  * retrieval claim as measured bytes — "the dense serve touches nprobe
  * int8 lists + a candidate rerank; the sparse serve touches ≤ 16
  * budgeted lists per query once for BOTH scorings; nothing rescans a
  * corpus" (Similarity.hybridIndexServe's 100 TB shape note).
  *
  * Setup: 1M docs, 16 tokens each over a 200k-term long-tail
  * vocabulary (the ScaleProbe32 corpus), md5-law 8-dim embeddings
  * derived from the same tokens (what the in-memory q87 law uses, so
  * the two modes rank the SAME data). Build both indexes once, then
  * run the 8-query three-leg hybrid two ways:
  *  - PERSISTED, production settings: dense from the IVF int8 index at
  *    nprobe 8 of 64 + exact float rerank at 20x oversample; TF-IDF +
  *    BM25 from the sparse postings index over ONE shared budget/fetch
  *    (sparseSearch2); rrfFuse;
  *  - IN-MEMORY q87 (hybridRrf3From) — what every serve pays without
  *    the indexes: a corpus × query brute-force dense leg plus a full
  *    re-explode/re-aggregate of the corpus for the sparse legs.
  * Measured per mode: wall, input bytes READ, shuffle-write bytes,
  * plus fused top-k overlap (production nprobe is approximate by
  * design — the overlap is the recall price the byte cut buys).
  */
object ScaleProbe34 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val nDocs = 1000000L
    val k = 5
    val nQueries = 8
    spark.range(0, nDocs).select(
      col("id").as("doc_id"),
      transform(sequence(lit(0), lit(15)),
        j => concat(lit("t"), pmod(xxhash64(col("id") * 16 + j), lit(200000))))
        .as("toks"))
      .write.mode("overwrite").parquet("/tmp/graft-probe34/toked.parquet")
    val toked = spark.read.parquet("/tmp/graft-probe34/toked.parquet")
    operators.Dedup.textEmbedMd5From(toked)
      .write.mode("overwrite").parquet("/tmp/graft-probe34/emb.parquet")
    val emb = spark.read.parquet("/tmp/graft-probe34/emb.parquet")
    val vecs = operators.Similarity.embVecs(emb)

    val (dd, sd) = ("/tmp/graft-probe34/dense", "/tmp/graft-probe34/sparse")
    val t0 = System.nanoTime()
    val centroids = operators.Ivf.train(vecs, k = 64, dims = operators.Dedup.TextEmbedDims)
    operators.Ivf.writeIndex(vecs, centroids, dd)
    operators.SparseIndex.writeIndex(toked, sd)
    println(f"[probe34] build both indexes: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      "(IVF k=64 int8 + sparse postings, 1M docs)")

    val input = new java.util.concurrent.atomic.AtomicLong
    val shuffle = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        input.addAndGet(s.stageInfo.taskMetrics.inputMetrics.bytesRead)
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    def measured(label: String)(body: => Array[org.apache.spark.sql.Row])
        : Array[org.apache.spark.sql.Row] = {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      input.set(0L); shuffle.set(0L)
      val t = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      println(f"[probe34] $label: $wall%.1f s, input read ${input.get / 1048576.0}%.1f MiB, " +
        f"shuffle write ${shuffle.get / 1048576.0}%.1f MiB, ${rows.length} rows")
      rows
    }

    val queryToked = toked.filter(col("doc_id") < nQueries)
    val qFloat = vecs.filter(col("vec_id") < nQueries)
    val served = measured("persisted 3-leg serve (nprobe 8/64, shared sparse fetch)") {
      val dense = operators.Ivf.searchIndexRerank(
          spark, dd, qFloat, vecs, centroids, k = k, nprobe = 8, oversample = 20)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
      val (tfidf, bm25) = operators.SparseIndex.sparseSearch2(spark, sd, queryToked, k)
      operators.Similarity.rrfFuse(Seq(
        dense,
        tfidf.select(col("query_id"), col("neighbor_id"), col("rank")),
        bm25.select(col("query_id"), col("neighbor_id"), col("rank"))), k).collect()
    }
    val inMem = measured("in-memory q87 (no indexes)") {
      operators.Similarity.hybridRrf3From(toked.localCheckpoint(), k, nQueries).collect()
    }
    // fusion output key columns by POSITION, type-agnostic (rank/ids
    // surface as int or long depending on the leg that won the union)
    val servedSet = served.map(r => (r.get(0).toString, r.get(1).toString)).toSet
    val inMemSet = inMem.map(r => (r.get(0).toString, r.get(1).toString)).toSet
    println(f"[probe34] fused top-$k overlap: ${(servedSet & inMemSet).size} / ${inMemSet.size} " +
      f"(${(servedSet & inMemSet).size.toDouble / inMemSet.size}%.3f — the nprobe-8 recall price)")
    spark.stop()
  }
}
