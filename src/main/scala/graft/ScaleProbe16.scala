package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): brute-force ANN
  * scoring throughput, float kernel over raw embeddings vs the packed
  * int8 path (int8_codes + int8_cosine), at a corpus size where the
  * candidate-scoring loop dominates. Same top-k shape as ann_*_topk
  * (corpus x broadcast queries through the bounded-heap rank).
  *
  * What the int8 story buys at 100 TB is primarily MEMORY (1 byte/dim in
  * scans/broadcasts/exchanges -> more of the index per executor page
  * cache); this probe records whether the integer kernel also holds or
  * beats float THROUGHPUT on the scoring loop, plus the recall cost
  * (expected: none — recall@10 = 1.0 at this scale in the specs).
  */
object ScaleProbe16 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.gfunctions.{cosine_sim, int8_codes, int8_cosine}

    // 200k synthetic 64-dim vectors (deterministic), 32 queries
    val dims = 64
    val n = 200000L
    val emb = spark.range(0, n).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dims - 1}), " +
        "j -> CAST(sin(CAST(id * 131 + j * 17 AS DOUBLE)) AS FLOAT))").as("embedding"))
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 32)

    def time(tag: String)(f: => Long): Long = {
      var out = 0L
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        out = f
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"[probe16] $tag: ${runs(1)}%.2f s (median of 3, ${n / 1000}k x 32 queries)")
      out
    }

    def countTop(df: org.apache.spark.sql.DataFrame): Long = df.count()

    val floatTop = time("float brute-force top-10") {
      countTop(operators.Similarity.bruteForceTopK(emb, queries))
    }
    val int8Top = time("packed int8 brute-force top-10") {
      countTop(operators.Similarity.int8TopK(emb, queries))
    }
    assert(floatTop == int8Top, s"row counts diverged: $floatTop vs $int8Top")

    // recall of the int8 ranking vs float truth at this scale
    def tops(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ft = tops(operators.Similarity.bruteForceTopK(emb, queries))
    val it = tops(operators.Similarity.int8TopK(emb, queries))
    val recall = ft.map { case (q, t) => it(q).intersect(t).size.toDouble / t.size }
    println(f"[probe16] int8 recall@10 vs float truth: ${recall.sum / recall.size}%.3f")

    // two-phase: coarse int8 scan keeps k*10 candidates, float rerank
    val rrTime = time("int8-coarse + float-rerank top-10") {
      countTop(operators.Similarity.int8RerankTopK(emb, queries))
    }
    assert(rrTime == floatTop, s"rerank row count diverged: $rrTime vs $floatTop")
    val rt = tops(operators.Similarity.int8RerankTopK(emb, queries))
    val rrRecall = ft.map { case (q, t) => rt(q).intersect(t).size.toDouble / t.size }
    println(f"[probe16] rerank recall@10 vs float truth: ${rrRecall.sum / rrRecall.size}%.3f")
    spark.stop()
  }
}
