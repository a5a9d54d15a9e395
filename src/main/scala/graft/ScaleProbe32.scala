package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the persisted
  * sparse index's SERVING claim as measured bytes — "a serve touches
  * |query terms| buckets of slim postings rows, never the corpus".
  *
  * Setup: 1M docs, 16 tokens each over a 200k-term long-tail
  * vocabulary (xxhash-deterministic). Build the index once, then serve
  * the 8-query BM25 more-like-this two ways:
  *  - from the PERSISTED index (bucket-pruned fetch + derived df +
  *    totals sidecar);
  *  - the in-memory q85 plan (re-explodes and re-aggregates the whole
  *    corpus per run — what every serve pays without the index).
  * Measured per mode: wall, input bytes READ (the pruning claim),
  * shuffle-write bytes — plus a 40-row result-parity check, so the
  * receipt is for the SAME answer.
  */
object ScaleProbe32 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val nDocs = 1000000L
    spark.range(0, nDocs).select(
      col("id").as("doc_id"),
      transform(sequence(lit(0), lit(15)),
        j => concat(lit("t"), pmod(xxhash64(col("id") * 16 + j), lit(200000))))
        .as("toks"))
      .write.mode("overwrite").parquet("/tmp/graft-probe32/toked.parquet")
    val toked = spark.read.parquet("/tmp/graft-probe32/toked.parquet")

    val idx = "/tmp/graft-probe32/index"
    val t0 = System.nanoTime()
    operators.SparseIndex.writeIndex(toked, idx)
    val buildS = (System.nanoTime() - t0) / 1e9
    val idxBytes = {
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(idx)).getLength
    }
    println(f"[probe32] build: $buildS%.1f s, index ${idxBytes / 1048576.0}%.1f MiB " +
      f"on disk (1M docs x 16 tokens, 200k-term vocabulary)")

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
      println(f"[probe32] $label: $wall%.1f s, input read ${input.get / 1048576.0}%.1f MiB, " +
        f"shuffle write ${shuffle.get / 1048576.0}%.1f MiB, ${rows.length} rows")
      rows
    }

    val queries = toked.filter(col("doc_id") < 8)
    val served = measured("persisted serve (bucket-pruned)") {
      operators.SparseIndex.bm25Search(spark, idx, queries, 5)
        .collect()
    }
    val inMem = measured("in-memory q85 (no index)") {
      operators.Similarity.bm25SearchMd5From(toked.localCheckpoint(), 5, 8)
        .collect()
    }
    val same = served.map(_.toSeq).toSeq == inMem.map(_.toSeq).toSeq
    println(s"[probe32] result parity served == in-memory: $same")
    spark.stop()
  }
}
