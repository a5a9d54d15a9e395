package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): q89 line-level
  * dedup-with-removal at volume — the claim under test is the scale
  * shape in [[operators.Dedup.lineDedup]]'s doc: "document TEXT never
  * crosses an exchange" (the df count ships (doc_id, pos, h) triples;
  * the rewrite joins a position map of AFFECTED docs only).
  *
  * Setup: 1M docs × ~22 lines (~540 MiB of text). Body lines are
  * unique by construction (position-keyed token law); every 3rd doc
  * carries a shared FOOTER line and every 10th a shared NAV line —
  * the C4/RefinedWeb boilerplate population. Measured:
  * wall, total shuffle-write bytes vs the corpus text size, repaired
  * doc count, and planted-boilerplate removal (footer/nav gone
  * everywhere, unique lines intact).
  */
object ScaleProbe35 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val nDocs = 1000000L
    spark.range(0, nDocs).select(
      col("id").as("doc_id"),
      concat_ws("\n",
        concat_ws("\n", transform(sequence(lit(0), lit(19)), j =>
          concat(lit("tok"), col("id") * 20 + j, lit(" alpha beta gamma")))),
        when(pmod(col("id"), lit(3)) === 0,
          lit("subscribe to our newsletter today")).otherwise(lit("")),
        when(pmod(col("id"), lit(10)) === 0,
          lit("home products about contact")).otherwise(lit(""))).as("text"))
      .write.mode("overwrite").parquet("/tmp/graft-probe35/docs.parquet")
    val docs = spark.read.parquet("/tmp/graft-probe35/docs.parquet")
    val textBytes = docs.select(sum(length(col("text")))).collect()(0).getLong(0)
    println(f"[probe35] corpus: $nDocs docs, ${textBytes / 1048576.0}%.0f MiB of text")

    val shuffle = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    shuffle.set(0L)
    val t0 = System.nanoTime()
    val out = operators.Dedup.lineDedup(docs).localCheckpoint()
    val repaired = out.filter(col("n_removed") > 0).count()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    println(f"[probe35] lineDedup: $wall%.1f s (${nDocs / wall}%.0f docs/s), " +
      f"shuffle write ${shuffle.get / 1048576.0}%.1f MiB " +
      f"(${100.0 * shuffle.get / (textBytes.toDouble)}%.1f%% of the text bytes)")
    println(s"[probe35] repaired docs: $repaired (expect ~400k: every 3rd + every 10th)")

    // planted boilerplate is gone everywhere; unique lines intact
    val leftover = out
      .filter(col("clean_text").contains("subscribe to our newsletter today") ||
        col("clean_text").contains("home products about contact"))
      .count()
    val intact = out.filter(col("doc_id") === 7)
      .select(col("clean_text")).collect()(0).getString(0)
    // split with -1: Scala drops trailing empties by default, and the
    // kept-by-law structural empties here ARE trailing
    println(s"[probe35] boilerplate leftovers: $leftover (expect 0); " +
      s"doc 7 keeps ${intact.split("\n", -1).length} lines " +
      "(expect 22: its 20 unique lines + the two structural empties, kept by law)")
    spark.stop()
  }
}
