package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): SemDeDup END TO
  * END at the 100 TB-shaped k — the composition the r15 verdict asked
  * for. ScaleProbe28 measured the pair BOUND at k=64 and ScaleProbe29
  * the assignment KERNEL at k=1024 in isolation; this probe runs
  * `semDeDup` itself at k=1024 over the full 400k corpus (+400 planted
  * near-dup pairs): sampled training (Ivf.train's bounded md5 sample,
  * ~100k vectors at sampleFactor=100), corpus assignment through the
  * NearestCentroid kernel, the real within-cell pair join, exact
  * cosine verify, lower-id pruning — wall, shuffle-write bytes,
  * cell-histogram receipt (measured pair count vs the C(N,2) naive and
  * vs the N^2/2k even-cell idealization), and planted recall, all in
  * one run.
  *
  * The claim under test: at k that grows with the corpus (the paper's
  * regime), the executed pair count tracks N^2/(2k) with REAL uneven
  * k-means cells, the exchange stays id-slim, and recall holds — i.e.
  * the two r15 receipts compose, there is no cliff between "bound
  * computable" and "pipeline executable" at serving-scale k.
  */
object ScaleProbe30 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def vecs(n: Long): org.apache.spark.sql.DataFrame =
      spark.range(0, n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          j => (pmod(xxhash64(col("id") * 64 + j), lit(2000)).cast("double") / 1000.0 - 1.0)
            .cast("float")).as("embedding"))

    val baseN = 400000L
    val plantedN = 400L
    val base = vecs(baseN)
    val planted = base.filter(col("vec_id") < plantedN).select(
      (col("vec_id") + 10000000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.001f)).as("embedding"))
    base.unionByName(planted)
      .write.mode("overwrite").parquet("/tmp/graft-probe30/embeddings.parquet")
    val emb = spark.read.parquet("/tmp/graft-probe30/embeddings.parquet")
    val n = emb.count()

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val k = 1024
    val t0 = System.nanoTime()
    val centroids = operators.Ivf.train(emb, k = k, iters = 1)
    val trainS = (System.nanoTime() - t0) / 1e9

    // the histogram receipt: what the cell structure promises
    val t1 = System.nanoTime()
    val hist = emb
      .select(operators.Ivf.clusterOf(col("embedding"), centroids).cast("int").as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(
        sum(expr("n * (n - 1) div 2")).as("cell_pairs"),
        max("n").as("max_cell"),
        count(lit(1)).as("n_cells"))
      .collect()(0)
    val histS = (System.nanoTime() - t1) / 1e9
    val cellPairs = hist.getLong(0)
    val naive = n * (n - 1) / 2
    val even = n.toDouble * n / (2.0 * k)
    println(f"[probe30] ${n / 1000}%dk vecs, k=$k: train $trainS%.1f s (~${100L * k / 1000}%dk sample), " +
      f"assign+hist $histS%.1f s; within-cell pairs ${cellPairs / 1e6}%.1f M " +
      f"vs naive ${naive / 1e9}%.1f B (${naive.toDouble / cellPairs}%.0f x cut) " +
      f"vs even-cell N^2/2k ${even / 1e6}%.1f M (ratio ${cellPairs / even}%.2f); " +
      f"max cell ${hist.getLong(1)}, ${hist.getLong(2)} of $k cells occupied")

    // the pipeline itself: the promise executed. Drain the async
    // listener bus BEFORE resetting the counter (and again before
    // reading it): pending StageCompleted events from the train/
    // histogram jobs above would otherwise leak into this receipt.
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    shuffleBytes.set(0L)
    val t2 = System.nanoTime()
    val decisions = operators.Dedup.semDeDup(emb, centroids)
    val flaggedPlanted = decisions.filter(col("is_dup") && col("vec_id") >= 10000000L).count()
    val e2eS = (System.nanoTime() - t2) / 1e9
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    println(f"[probe30] semDeDup end-to-end k=$k: $e2eS%.1f s, " +
      f"shuffle write ${shuffleBytes.get / 1048576.0}%.1f MiB, " +
      f"planted recall ${flaggedPlanted.toDouble / plantedN}%.3f ($flaggedPlanted/$plantedN)")
    spark.stop()
  }
}
