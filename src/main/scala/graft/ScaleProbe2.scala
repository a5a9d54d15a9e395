package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): synthesizes a corpus
  * far larger than the driver testdata, plants duplicates, and measures
  * dedup runtime + recall. Run with `sbt "runMain graft.ScaleProbe2"`.
  */
object ScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-scale-emb"
    // 50k pseudo-random 64-dim vectors + 500 planted near-dup pairs
    val base = spark.range(0, 50000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64(col("id") * 64 + j), lit(2000)).cast("double") / 1000.0 - 1.0).cast("float")).as("embedding"),
      lit(0).as("label"))
    val dups = base.filter(col("vec_id") < 500).select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.001f)).as("embedding"),
      lit(1).as("label"))
    base.unionByName(dups).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val flagged = operators.Dedup.embeddingCosineDecisions(Tables.embeddings(spark, dir))
      .filter(col("is_dup")).count()
    println(f"[probe2] embedding dedup 50.5k vecs: ${(System.nanoTime()-t0)/1e9}%.1f s, flagged=$flagged (expect ~500)")
    spark.stop()
  }
}
