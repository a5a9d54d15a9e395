package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): SemDeDup's scale
  * story, measured on the axes that matter at 100 TB.
  *
  * Part 1 (structural, 400k vectors): the candidate bound is the cell
  * histogram — sum over cells of C(n,2) against the naive C(N,2) — and
  * it is computable from ONE assignment pass + one aggregate, no pair
  * join executed. This is the number that decides feasibility: the
  * paper's regime (k grows with the corpus) keeps pairs ~ N^2/(2k),
  * and the probe prints the measured reduction with k-means's real
  * (uneven) cells, not the even-cell idealization.
  *
  * Part 2 (end-to-end, 40k + 400 planted near-dup pairs): wall,
  * shuffle-write bytes (SparkListener, bit-stable), planted recall for
  * the k-means partitioner AND the sign-grid twin on the same corpus —
  * the measured version of the paper's motivation: learned cells keep
  * semantic neighborhoods together; a fixed sign grid splits a
  * neighborhood whenever a near-zero component flips sign.
  */
object ScaleProbe28 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def vecs(n: Long): org.apache.spark.sql.DataFrame =
      spark.range(0, n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          j => (pmod(xxhash64(col("id") * 64 + j), lit(2000)).cast("double") / 1000.0 - 1.0)
            .cast("float")).as("embedding"))

    // ---- part 1: the pair bound at 400k, from the histogram alone
    val big = vecs(400000L)
    val k1 = 64
    val t0 = System.nanoTime()
    val centroids1 = operators.Ivf.train(big, k = k1, iters = 1)
    val trainS = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val hist = big
      .select(operators.Ivf.clusterOf(col("embedding"), centroids1).cast("int").as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(
        sum(expr("n * (n - 1) div 2")).as("cell_pairs"),
        max("n").as("max_cell"),
        count(lit(1)).as("n_cells"))
      .collect()(0)
    val assignS = (System.nanoTime() - t1) / 1e9
    val cellPairs = hist.getLong(0)
    val naive = 400000L * 399999L / 2
    println(f"[probe28] 400k vecs, k=$k1: train $trainS%.1f s (sampled), assign+hist $assignS%.1f s; " +
      f"within-cell pairs ${cellPairs / 1e6}%.1f M vs naive ${naive / 1e6}%.1f M " +
      f"(${naive.toDouble / cellPairs}%.0f x reduction), max cell ${hist.getLong(1)}, ${hist.getLong(2)} cells")

    // ---- part 2: end-to-end with planted near-dups, k-means vs grid
    val baseN = 40000L
    val base = vecs(baseN)
    val planted = base.filter(col("vec_id") < 400).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.001f)).as("embedding"))
    val corpus = base.unionByName(planted)
    corpus.write.mode("overwrite").parquet("/tmp/graft-probe28/embeddings.parquet")
    val emb = spark.read.parquet("/tmp/graft-probe28/embeddings.parquet")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val k2 = 64
    val centroids2 = operators.Ivf.train(emb, k = k2, iters = 1)
    def recallOf(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      shuffleBytes.set(0L)
      val t = System.nanoTime()
      val flaggedPlanted = df.filter(col("is_dup") && col("vec_id") >= 1000000L).count()
      val secs = (System.nanoTime() - t) / 1e9
      Thread.sleep(2000)
      println(f"[probe28] $tag: $secs%.1f s, shuffle write ${shuffleBytes.get / 1048576.0}%.1f MiB, " +
        f"planted recall ${flaggedPlanted.toDouble / 400}%.3f (${flaggedPlanted}/400)")
    }
    recallOf(s"semdedup k-means k=$k2 (40.4k vecs)")(
      operators.Dedup.semDeDup(emb, centroids2))
    recallOf("semdedup sign-grid twin (same corpus)")(
      operators.Dedup.semDeDupGrid(emb))
    spark.stop()
  }
}
