package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the sparse-
  * retrieval SKEW case the q83/q85 term budget does NOT bound. The
  * 16-rarest-terms rule bounds the postings join at M LISTS per query
  * — but not list LENGTH: on a boilerplate-heavy corpus (small shared
  * vocabulary — scraped template pages, log lines), even a query's
  * "rarest" terms can carry mega-postings, and the join drags
  * df(t) ≈ N rows per such term.
  *
  * Setup: 1M synthetic docs over a two-tier vocabulary — 50
  * boilerplate terms (df ≈ 0.16·N each) and 50k tail terms
  * (df ≈ 160) — each doc carrying 8 of each. Every query doc
  * therefore holds 8 mega-terms and 8 tail terms, and the 16-term
  * budget keeps them ALL.
  *
  * Measured: the more-like-this pipeline (q83 shape) end to end, raw
  * vs composed with an upstream STOPWORD-DF CUTOFF (terms with
  * df > N/10 dropped from the token streams before the pipeline — the
  * df pass that identifies them is one cheap aggregate). Wall +
  * shuffle-write bytes + the postings rows the budgeted terms drag.
  */
object ScaleProbe31 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.DataFrame

    val nDocs = 1000000L
    // doc i: 8 boilerplate terms (of 50) + 8 tail terms (of 50k),
    // deterministically from xxhash64 — no RNG, replay-stable
    val toked: DataFrame = spark.range(0, nDocs).select(
      col("id").as("doc_id"),
      concat(
        transform(sequence(lit(0), lit(7)),
          j => concat(lit("bp"), pmod(xxhash64(col("id") * 8 + j), lit(50)))),
        transform(sequence(lit(0), lit(7)),
          j => concat(lit("t"), pmod(xxhash64(col("id") * 8 + j + 31337), lit(50000)))))
        .as("toks"))
    toked.write.mode("overwrite").parquet("/tmp/graft-probe31/toked.parquet")
    val docs = spark.read.parquet("/tmp/graft-probe31/toked.parquet")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def measured(label: String)(body: => Long): Unit = {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      println(f"[probe31] $label: $wall%.1f s, " +
        f"shuffle write ${shuffleBytes.get / 1048576.0}%.1f MiB, $rows result rows")
    }

    // the postings the budget keeps, raw: 8 mega-lists per query
    val h = operators.ExprUtil.md5Hash60(col("tok"))
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), h.as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("h").agg(count(lit(1)).as("df"))
    val qdf = tf.filter(col("doc_id") < 8).join(df, Seq("h"))
    val dragged = qdf.orderBy(col("df").asc).limit(16 * 8)
      .agg(sum("df")).collect()(0).getLong(0)
    println(f"[probe31] 1M docs, two-tier vocab (50 bp / 50k tail): " +
      f"the 8 queries' budgeted terms drag ~${dragged / 1e6}%.1f M postings rows raw")

    measured("more-like-this RAW (budget only)") {
      operators.Similarity.keywordSearchMd5From(
        docs.localCheckpoint(), k = 5, queries = 8).count()
    }

    // composed stopword-df cutoff: one df aggregate finds terms with
    // df > N/10; their hashes broadcast into a token-stream filter
    val cutoff = nDocs / 10
    val stopSeq = df.filter(col("df") > cutoff).select("h")
      .collect().map(_.getLong(0)).toSeq
    println(s"[probe31] stopword cutoff df > $cutoff drops ${stopSeq.size} terms")
    val filtered = docs.select(
      col("doc_id"),
      filter(col("toks"), t =>
        !operators.ExprUtil.md5Hash60(t).isin(stopSeq: _*)).as("toks"))
      .filter(size(col("toks")) > 0)

    measured("more-like-this with upstream df cutoff") {
      operators.Similarity.keywordSearchMd5From(
        filtered.localCheckpoint(), k = 5, queries = 8).count()
    }
    spark.stop()
  }
}
