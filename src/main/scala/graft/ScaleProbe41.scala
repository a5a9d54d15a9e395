package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): q104's canonical
  * selection on the PATHOLOGICAL corpus — ONE cluster swallowing all
  * 1M docs (the all-identical-boilerplate shape scraped corpora
  * actually produce, and exactly the case the r19 verdict's minor
  * flagged). Claims under test (Cluster.canonicalByQuality scaladoc,
  * r20 rewrite):
  *
  *  - the r19 per-cluster `row_number` window MUST funnel the whole
  *    mega-cluster through one task (rank needs the group's total
  *    order — a single sorted partition);
  *  - the r20 `max_by(struct(score, -doc_id))` argmax combines
  *    map-side: every input partition contributes ONE candidate row,
  *    so the cluster_id exchange carries ~numPartitions rows instead
  *    of the corpus, and no task sorts anything;
  *  - both shapes pick the IDENTICAL canonical (argmax by score, tie
  *    min id) — the swap is a plan change, not a law change.
  *
  * Receipt (this box, local[32], 1M docs in one cluster):
  * the window shape's peak task processes the full 1M rows (the
  * single-group sort), the argmax shape's peak task ~1/32 of them;
  * both return the same canonical; see SURVEY §6 for the run line.
  */
object ScaleProbe41 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    val nDocs = 1000000L
    // one cluster holds the corpus; deterministic md5-derived scores
    val asg = spark.range(0, nDocs).select(col("id").as("doc_id"),
      lit(0L).as("cluster_id"), lit(nDocs).as("cluster_size"))
      .localCheckpoint()
    val scored = spark.range(0, nDocs).select(col("id").as("doc_id"),
      (conv(substring(md5(col("id").cast("string")), 1, 13), 16, 10).cast("long") / 1e15)
        .as("score"))
      .localCheckpoint()

    val shuffle = new java.util.concurrent.atomic.AtomicLong
    val peakTask = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          shuffle.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          val read = t.taskMetrics.shuffleReadMetrics.recordsRead
          peakTask.getAndUpdate(p => math.max(p, read))
          ()
        }
      }
    })
    def measured(tag: String)(body: => Long): Long = {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      shuffle.set(0L); peakTask.set(0L)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      println(f"[probe41] $tag: $wall%.1f s, shuffle ${shuffle.get / 1048576.0}%.1f MiB, " +
        f"peak task shuffle-read ${peakTask.get}%d rows")
      r
    }

    // the r19 shape, reconstructed verbatim: rank window per cluster
    val viaWindow = measured("r19 row_number window (single-group sort)") {
      asg.join(scored, Seq("doc_id"))
        .withColumn("qrank", row_number().over(
          Window.partitionBy("cluster_id")
            .orderBy(col("score").desc_nulls_last, col("doc_id"))))
        .filter(col("qrank") === 1)
        .select("doc_id").collect()(0).getLong(0)
    }
    // the r20 shape: the shipped operator
    val viaArgmax = measured("r20 max_by argmax (map-side combined)") {
      operators.Cluster.canonicalByQuality(asg, scored)
        .filter(col("keep") === 1L)
        .select("doc_id").collect()(0).getLong(0)
    }
    println(s"[probe41] canonical via window: $viaWindow, via argmax: $viaArgmax")
    require(viaWindow == viaArgmax,
      "the skew-safe swap must pick the identical canonical")

    spark.stop()
  }
}
