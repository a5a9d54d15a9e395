package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): synthesizes a corpus
  * far larger than the driver testdata, plants duplicates, and measures
  * dedup runtime + recall. Run with `sbt "runMain graft.ScaleProbe"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/tmp/graft-scale"
    // 100k docs, ~60 tokens each from a 5k vocab; 1% exact dups, 1% near dups
    val vocabSize = 5000
    val docs = spark.range(0, 100000).select(
      col("id").as("doc_id"),
      // deterministic pseudo-text: 60 hash-derived vocab words
      concat_ws(" ", (0 until 60).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id") * 1000 + j), lit(vocabSize)))): _*).as("text"),
      lit("en").as("lang"), lit("s").as("source"), lit(300L).as("n_chars"))
    // plant: docs 0-999 duplicated as 200000+i (exact), 300000+i (one token changed)
    val base = docs.filter(col("doc_id") < 1000)
    val exactDups = base.select((col("doc_id") + 200000).as("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val nearDups = base.select((col("doc_id") + 300000).as("doc_id"),
      regexp_replace(col("text"), "^w[0-9]+ ", "zzz ").as("text"), col("lang"), col("source"), col("n_chars"))
    docs.unionByName(exactDups).unionByName(nearDups)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val d1 = time("minhash 102k docs") {
      val df = operators.Dedup.minhashDecisions(Tables.documents(spark, dir))
      df.filter(col("is_dup")).count()
    }
    println(s"[probe] minhash dups flagged: $d1 (expect ~2000: 1000 exact + ~1000 near)")
    val d2 = time("simhash 102k docs") {
      operators.Dedup.simhashDecisions(Tables.documents(spark, dir)).filter(col("is_dup")).count()
    }
    println(s"[probe] simhash dups flagged: $d2")
    val d3 = time("exact 102k docs") {
      operators.Dedup.exact(Tables.documents(spark, dir)).filter(col("n_copies") > 1).count()
    }
    println(s"[probe] exact dup groups: $d3 (expect 1000)")
    spark.stop()
  }
}
