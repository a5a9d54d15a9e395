package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the filtered-ANN
  * selectivity caveat, measured. Ivf.searchIndexFiltered documents that
  * a selective predicate thins the probed inverted lists, so recall at
  * fixed nprobe drops with selectivity and the remedy is raising
  * nprobe. This probe turns that sentence into numbers: recall@10 of
  * the filtered serve vs brute int8 over the pre-filtered corpus, at
  * selectivities 1/2, 1/10, 1/100, each at nprobe=2 (the default) and
  * nprobe=k (full probe — isolates list-pruning loss from scoring,
  * which is int8 in both paths).
  *
  * The quantizer is trained through the DEFAULT sampled path (the r13
  * trainingSample keeps ~100x8 of the 200k vectors), so the probe also
  * exercises sampled training at scale end-to-end.
  */
object ScaleProbe19 {
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

    val t0 = System.nanoTime()
    val centroids = operators.Ivf.train(emb, k = 8, iters = 1) // sampled by default
    println(f"[probe19] sampled train k=8 over ${n / 1000}k vecs: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    def tops(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def recallAt(dir: String, pred: org.apache.spark.sql.Column,
        truth: Map[Long, Set[Long]], nprobe: Int): Double = {
      val got = tops(operators.Ivf.searchIndexFiltered(
        spark, dir, queries, pred, k = 10, nprobe = nprobe))
      val rs = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      rs.sum / rs.size
    }

    // UNCORRELATED filters (label independent of embedding space): the
    // filter thins every list uniformly, so the true filtered neighbors
    // stay inside the lists the query probes anyway
    Seq(2L, 10L, 100L).foreach { m =>
      val labeled = emb.withColumn("label", (col("vec_id") % m).cast("int"))
      val dir = s"/tmp/graft-probe19/index_m$m"
      operators.Ivf.writeIndex(labeled, centroids, dir, Seq("label"))
      val truth = tops(operators.Similarity.int8TopK(labeled.filter(col("label") === 0), queries))
      println(f"[probe19] uncorrelated 1/$m%-3d: recall@10 nprobe=2 " +
        f"${recallAt(dir, col("label") === 0, truth, 2)}%.3f, " +
        f"nprobe=8 (full) ${recallAt(dir, col("label") === 0, truth, 8)}%.3f")
    }

    // CORRELATED filter (label = the vector's own cluster): a predicate
    // that concentrates survivors in lists the query may NOT probe — the
    // caveat's actual failure mode. Averaged over filtering to each of
    // the 8 clusters: at nprobe=2 recall ~= the chance the kept cluster
    // is among the query's two probes; full probe restores it.
    val plain = "/tmp/graft-probe19/index_plain"
    operators.Ivf.writeIndex(emb, centroids, plain)
    val clusterOf = spark.read.parquet(plain).select(col("vec_id"), col("cluster"))
    val labeled = emb.join(clusterOf, "vec_id").withColumn("label", col("cluster")).drop("cluster")
      .localCheckpoint()
    val dirC = "/tmp/graft-probe19/index_corr"
    operators.Ivf.writeIndex(labeled, centroids, dirC, Seq("label"))
    val byCluster = (0 until 8).map { c =>
      val truth = tops(operators.Similarity.int8TopK(labeled.filter(col("label") === c), queries))
      (recallAt(dirC, col("label") === c, truth, 2), recallAt(dirC, col("label") === c, truth, 8))
    }
    val at2 = byCluster.map(_._1).sum / 8
    val at8 = byCluster.map(_._2).sum / 8
    println(f"[probe19] correlated (label = own cluster, avg over 8): " +
      f"recall@10 nprobe=2 $at2%.3f, nprobe=8 (full) $at8%.3f")
    spark.stop()
  }
}
