package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the COMPLETE
  * persisted-index ladder side by side — int8, PQ, residual PQ, OPQ —
  * on one corpus through the REAL write/serve paths, so the §6 ladder
  * claims (bytes, build cost, serve cost, recall after rerank) are one
  * table from one run instead of stitched across probes.
  *
  * Corpus = the ScaleProbe16/20 200k-vector dense manifold (PQ's worst
  * case, so coarse recalls separate and the rerank contract is doing
  * real work). k=64 sampled-train quantizer shared by all four layouts;
  * every serve is two-phase (coarse over the pruned lists at nprobe=8,
  * float rerank) with the layout's documented default oversample —
  * int8 10x, the PQ family 20x — scaled by the ScaleProbe20 finding
  * (dense manifolds need hundreds) to a uniform 100x so recall is
  * comparable across rungs at a realistic dense-corpus operating point.
  */
object ScaleProbe24 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val dims = 64
    val n = 200000L
    val emb = spark.range(0, n).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dims - 1}), " +
        "j -> CAST(sin(CAST(id * 131 + j * 17 AS DOUBLE)) AS FLOAT))").as("embedding"))
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 32)
    val base = "/tmp/graft-probe24"

    def timeOnce(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe24] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def timed(f: => Long): Double = {
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      runs(1)
    }
    def dirBytes(dir: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(p => p.toString.endsWith(".parquet") && p.toString.contains("cluster="))
        .mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally s.close()
    }
    def tops(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = tops(operators.Similarity.bruteForceTopK(emb, queries))
    def recallOf(got: Map[Long, Set[Long]]): Double = {
      val rs = truth.map { case (q, t) => got(q).intersect(t).size.toDouble / t.size }
      rs.sum / rs.size
    }

    // one shared coarse quantizer (sampled train) for all four layouts
    var centroids: Array[Array[Float]] = null
    timeOnce("coarse quantizer k=64 iters=3 (sampled train)") {
      centroids = operators.Ivf.train(emb, k = 64, iters = 3)
    }
    var pq: operators.Pq.Model = null
    timeOnce("model: PQ m=8 ksub=256") {
      pq = operators.Pq.train(emb, m = 8, ksub = 256, iters = 10)
    }
    var resid: operators.Pq.Model = null
    timeOnce("model: residual PQ m=8 ksub=256") {
      resid = operators.Ivf.trainResidualPq(emb, centroids, m = 8, ksub = 256, iters = 10)
    }
    var opq: operators.Opq.Model = null
    timeOnce("model: OPQ m=8 ksub=256 (4 alternations)") {
      opq = operators.Opq.train(emb, m = 8, ksub = 256, opqIters = 4)
    }

    timeOnce("build: int8 index (64 B/vec lists)") {
      operators.Ivf.writeIndex(emb, centroids, s"$base/int8")
    }
    timeOnce("build: PQ index (8 B/vec lists)") {
      operators.Ivf.writeIndexPq(emb, centroids, pq, s"$base/pq")
    }
    timeOnce("build: residual index (8 B/vec lists)") {
      operators.Ivf.writeIndexPqResid(emb, centroids, resid, s"$base/resid")
    }
    timeOnce("build: OPQ index (8 B/vec lists)") {
      operators.Ivf.writeIndexOpq(emb, centroids, opq, s"$base/opq")
    }
    Seq("int8", "pq", "resid", "opq").foreach { l =>
      println(f"[probe24] $l list bytes: ${dirBytes(s"$base/$l") / 1048576.0}%.1f MiB")
    }

    // two-phase serve from disk, nprobe=8 of 64, uniform 100x oversample
    val ov = 100
    def serve(layout: String): org.apache.spark.sql.DataFrame = layout match {
      case "int8" =>
        operators.Ivf.searchIndexRerank(spark, s"$base/int8", queries, emb,
          operators.Ivf.readCentroids(spark, s"$base/int8"), nprobe = 8, oversample = ov)
      case "pq" =>
        operators.Ivf.searchIndexPqRerank(spark, s"$base/pq", queries, emb,
          nprobe = 8, oversample = ov)
      case "resid" =>
        operators.Ivf.searchIndexPqResidRerank(spark, s"$base/resid", queries, emb,
          nprobe = 8, oversample = ov)
      case "opq" =>
        operators.Ivf.searchIndexOpqRerank(spark, s"$base/opq", queries, emb,
          nprobe = 8, oversample = ov)
    }
    Seq("int8", "pq", "resid", "opq").foreach { l =>
      val t = timed(serve(l).count())
      val r = recallOf(tops(serve(l)))
      println(f"[probe24] $l two-phase serve (nprobe=8, rerank@${ov}x): " +
        f"$t%.2f s warm (median of 3), recall@10 $r%.3f")
    }
    spark.stop()
  }
}
