package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): what sampled IVF
  * training buys, measured. Ivf.train's Lloyd iterations posexplode
  * EVERY corpus vector (dims rows each) into a (cluster, pos) aggregate
  * and score k centroid cosines per row — at 100 TB that is iters
  * full-corpus passes to fit a model of k*dims floats. The r13
  * trainingSample bounds the fit to ~sampleFactor vectors per centroid
  * (salted-hash deterministic keep). This probe records the cost side
  * (train wall, full vs sampled) AND the quality side (recall@10 of the
  * resulting IVF search vs exact brute force) at a corpus size where the
  * difference is visible — the spec pins determinism and floors at
  * driver scale; this is the receipt that the default sizing holds at
  * 200k too.
  */
object ScaleProbe18 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val dims = 64
    val n = 200000L
    val k = 64
    val nprobe = 8
    val emb = spark.range(0, n).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dims - 1}), " +
        "j -> CAST(sin(CAST(id * 131 + j * 17 AS DOUBLE)) AS FLOAT))").as("embedding"))
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 32)

    def tops(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = tops(operators.Similarity.bruteForceTopK(emb, queries))
    def recallOf(m: Map[Long, Set[Long]]): Double = {
      val rs = truth.map { case (q, t) => m.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      rs.sum / rs.size
    }

    def trainTimed(tag: String, sampleFactor: Long): Array[Array[Float]] = {
      val t0 = System.nanoTime()
      val c = operators.Ivf.train(emb, k = k, iters = 3, sampleFactor = sampleFactor)
      println(f"[probe18] $tag train (k=$k, iters=3): ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      c
    }

    val sampledN = operators.Ivf.trainingSample(emb, k, 100L).count()
    println(s"[probe18] corpus $n vectors; default sample keeps $sampledN (~100x$k)")

    val cSampled = trainTimed("SAMPLED (factor=100)", 100L)
    val cFull = trainTimed("FULL    (factor=0)  ", 0L)

    def serveTimed(tag: String, c: Array[Array[Float]]): Unit = {
      val t0 = System.nanoTime()
      val r = recallOf(tops(operators.Ivf.topK(emb, queries, c, k = 10, nprobe = nprobe)))
      println(f"[probe18] $tag IVF search (nprobe=$nprobe): recall@10 $r%.3f, " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    serveTimed("sampled-trained", cSampled)
    serveTimed("full-trained   ", cFull)
    spark.stop()
  }
}
