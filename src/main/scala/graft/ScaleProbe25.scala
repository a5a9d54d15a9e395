package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the q75 oracle/prod
  * trade, measured on the axis that scales. At sf0.1 the zero-exchange
  * prod plan measures SLOWER (1.43 vs 1.04 s) because a page-cached
  * local exchange is nearly free while the in-row sorted-run fold pays
  * per-doc string sorts — wall time on this box cannot show what the
  * plan shape buys. What it CAN show structurally is the exchange
  * volume itself: the oracle plan shuffles every doc's distinct grams
  * TWICE (bigram and trigram (doc_id, gram, count) rows past map-side
  * combine), the prod plan shuffles NOTHING. Shuffle-write bytes come
  * from a SparkListener over the real runs — the 100 TB number is that
  * column, like ScaleProbe22's row-group counts vs its flat local
  * timings.
  */
object ScaleProbe25 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val n = 1000000L
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
      "hash", "merge", "batch", "spark", "line", "sort", "window", "query", "join",
      "small", "big", "data", "column", "customer", "order", "group", "stream",
      "filter", "vector", "the", "a")
    val vocabSql = vocab.map(w => s"'$w'").mkString("array(", ", ", ")")
    // 60-240 tokens per doc, deterministic token stream
    val docs = spark.range(0, n).select(
      col("id").as("doc_id"),
      concat_ws(" ", expr(
        s"transform(sequence(0, 60 + CAST(pmod(id * 37, 181) AS INT)), " +
          s"j -> element_at($vocabSql, 1 + CAST(pmod(id * 131 + j * 17, ${vocab.size}) AS INT)))"))
        .as("text"),
      lit("en").as("lang"), lit("probe").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val base = "/tmp/graft-probe25"
    docs.write.mode("overwrite").parquet(s"$base/documents.parquet")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def measured(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // one warm pass for JIT/codegen, then the measured pass
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(2000)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drains async
      println(f"[probe25] $tag: $secs%.2f s warm, " +
        f"shuffle write ${shuffleBytes.get / 1048576.0}%.1f MiB")
    }
    val q = operators.TextAnalysis.q75
    measured("oracle plan (explode + 2 keyed aggregates)")(q.run(spark, base))
    measured("prod plan (in-row sorted-run folds)")(q.runProd(spark, base))
    spark.stop()
  }
}
