package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): semantic
  * decontamination at volume on the PRODUCTION path — the claim under
  * test is the q96/q99 scale shape ([[operators.TrainPrep]] scaladoc):
  * "the eval set rides ONE broadcast, the corpus is scanned once with
  * the codegen'd kernel, and the only exchange is the per-doc
  * (id, double) max aggregate."
  *
  * Setup: 1M docs × 20 tokens (~240 MiB of text) from a position-keyed
  * token law; every doc_id % 10000 == 0 is a benchmark member (100
  * docs — the eval-set asymmetry); every doc_id % 10000 == 7 is that
  * law's text REORDERED from the preceding bench doc (100 planted
  * rewrites that share whole-doc token bags but scrambled order).
  * Production featurizer = [[operators.Dedup.textEmbeddings]] (the
  * XXH64 hashing-trick kernel at 64 dims, zero shuffle) + the
  * cosine_sim kernel against the broadcast bench vectors. Measured:
  * wall, shuffle bytes vs corpus text bytes, and planted-reorder
  * recall at tau = 0.99 (bag-identical reorders land at cosine 1).
  */
object ScaleProbe37 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val nDocs = 1000000L
    // token law: doc d, position j -> "tok<(d*17+j*131) % 50021>" —
    // docs get near-unique bags; the planted rewrite at d%10000==7
    // reuses the bag of bench doc d-7 in REVERSED position order
    def tokenOf(dCol: String) =
      s"concat('tok', CAST(($dCol * 17 + j * 131) % 50021 AS STRING))"
    spark.range(0, nDocs).createOrReplaceTempView("ids")
    val docs = spark.sql(
      s"""SELECT id AS doc_id,
        CASE WHEN id % 10000 = 7 THEN
          concat_ws(' ', transform(sequence(19, 0, -1), j -> ${tokenOf("(id - 7)")}))
        ELSE
          concat_ws(' ', transform(sequence(0, 19), j -> ${tokenOf("id")}))
        END AS text
      FROM ids""")
    docs.write.mode("overwrite").parquet("/tmp/graft-probe37/docs.parquet")
    val corpus = spark.read.parquet("/tmp/graft-probe37/docs.parquet")
    val textBytes = corpus.select(sum(length(col("text")))).collect()(0).getLong(0)
    println(f"[probe37] corpus: $nDocs docs, ${textBytes / 1048576.0}%.0f MiB of text, " +
      "100 bench members, 100 planted reorders")

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
    val emb = operators.Dedup.textEmbeddings(corpus)
    val bench = emb.filter(col("vec_id") % 10000 === 0)
      .select(col("vec_id").as("bench_id"), col("embedding").as("bv"))
    val flagged = emb.filter(col("vec_id") % 10000 =!= 0)
      .crossJoin(broadcast(bench))
      .select(col("vec_id"), graft.gfunctions.cosine_sim(col("embedding"), col("bv")).as("sim"))
      .groupBy("vec_id")
      .agg(max("sim").as("max_sim"))
      .filter(col("max_sim") >= 0.99)
      .localCheckpoint()
    val nFlagged = flagged.count()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    println(f"[probe37] semantic decontam: $wall%.1f s (${nDocs / wall}%.0f docs/s), " +
      f"shuffle ${shuffle.get / 1048576.0}%.1f MiB " +
      f"(${100.0 * shuffle.get / textBytes}%.2f%% of text bytes) — " +
      "one kernel scan x 100-vector broadcast, (id, double) agg only")
    val reordersCaught = flagged.filter(col("vec_id") % 10000 === 7).count()
    println(s"[probe37] flagged: $nFlagged total; planted-reorder recall " +
      s"$reordersCaught/100 (bag-identical reorder must land at cosine 1)")
    spark.stop()
  }
}
