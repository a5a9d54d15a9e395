package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): jaccard dedup and ANN
  * over the corpora synthesized by ScaleProbe/ScaleProbe2 (run those first).
  */
object ScaleProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe3] $name: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val n1 = time("jaccard 102k docs") {
      operators.Dedup.jaccardDecisions(Tables.documents(spark, "/tmp/graft-scale"))
        .filter(col("is_dup")).count()
    }
    println(s"[probe3] jaccard dups flagged: $n1 (expect ~2000)")
    val emb = Tables.embeddings(spark, "/tmp/graft-scale-emb")
    val qs = emb.filter(col("vec_id") < 8)
    val n2 = time("ann_lsh 50.5k corpus, 8 queries") {
      operators.Similarity.lshTopK(emb, qs).count()
    }
    println(s"[probe3] lsh topk rows: $n2")
    val n3 = time("ann_brute 50.5k corpus, 8 queries") {
      operators.Similarity.bruteForceTopK(emb, qs).count()
    }
    println(s"[probe3] brute topk rows: $n3")
    spark.stop()
  }
}
