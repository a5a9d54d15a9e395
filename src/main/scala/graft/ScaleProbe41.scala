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
  *    mega-cluster through one task AND SORT it there (rank needs
  *    the group's total order — a single sorted partition, and Spark
  *    has no skew rescue for window sorts);
  *  - the r20 `max_by(struct(score, -doc_id))` argmax combines
  *    map-side (the groupBy exchange carries ~one candidate per
  *    input partition), and the join-back that attaches the keep
  *    flag is a HASH JOIN — divisible work that AQE's skew-join
  *    SPLITS once the skewed partition crosses the threshold,
  *    where the window's sort can never be split;
  *  - both shapes pick the IDENTICAL canonical (argmax by score, tie
  *    min id) — the swap is a plan change, not a law change.
  *
  * Measurement note (a finding in its own right): if the rank is
  * immediately FILTERED (`qrank = 1`), Spark 3.5+'s
  * InferWindowGroupLimit pre-filters each map partition to its
  * per-group top-1 BEFORE the exchange — measured peak task read 32
  * rows, i.e. the filtered shape is already skew-safe. q104 emits a
  * per-row KEEP FLAG (every member row survives, flagged), so the
  * group-limit rewrite does NOT apply to it and the full-group
  * single-task sort is real — the probe therefore measures the
  * ALL-ROWS output shape both ways (noop write of the full flagged
  * frame), which is what the operator actually ships.
  */
object ScaleProbe41 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    // Lower AQE's skew-join threshold to this probe's data volume so
    // the 100 TB behavior is visible at 1M rows: a mega-cluster
    // partition over the threshold gets SPLIT on the argmax shape's
    // join-back (hash probe — divisible work), while the window
    // shape's single-group SORT has no skew rescue in Spark at all.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

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

    // the r19 shape, reconstructed verbatim: rank window per cluster,
    // EVERY row emitted with its keep flag (q104's actual output — no
    // rank filter, so no WindowGroupLimit rescue)
    def windowShape = asg.join(scored, Seq("doc_id"))
      .withColumn("qrank", row_number().over(
        Window.partitionBy("cluster_id")
          .orderBy(col("score").desc_nulls_last, col("doc_id"))))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("score"),
        (col("qrank") === 1).cast("long").as("keep"))
    measured("r19 row_number window, all-rows output (single-group sort)") {
      windowShape.write.format("noop").mode("overwrite").save(); 0L
    }
    // the r20 shape: the shipped operator, same all-rows output
    measured("r20 max_by argmax, all-rows output (map-side combined)") {
      operators.Cluster.canonicalByQuality(asg, scored)
        .write.format("noop").mode("overwrite").save(); 0L
    }
    val argmaxPlan = operators.Cluster.canonicalByQuality(asg, scored)
      .queryExecution.executedPlan.toString
    println("[probe41] argmax joins: " + argmaxPlan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort"))
      .map(_.trim.take(110)).mkString(" | "))

    val viaWindow = windowShape.filter(col("keep") === 1L)
      .select("doc_id").collect()(0).getLong(0)
    val viaArgmax = operators.Cluster.canonicalByQuality(asg, scored)
      .filter(col("keep") === 1L)
      .select("doc_id").collect()(0).getLong(0)
    println(s"[probe41] canonical via window: $viaWindow, via argmax: $viaArgmax")
    require(viaWindow == viaArgmax,
      "the skew-safe swap must pick the identical canonical")

    spark.stop()
  }
}
