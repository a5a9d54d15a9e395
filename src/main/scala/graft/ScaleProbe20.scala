package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): product quantization
  * at the 200k dense-corpus scale ScaleProbe16 used for int8 — the same
  * questions one rung down the compression ladder.
  *
  *  1. STORAGE — on-disk bytes of the persisted index lists at each code
  *     form (float32 / packed int8 / PQ m=8): the claim "8 B/vector, 8x
  *     below int8, 32x below float32" measured on real parquet, where
  *     encoding + compression can eat naive ratios.
  *  2. TRAINING — sampled per-subspace k-means cost at ksub=256 (the
  *     classic FAISS operating point) vs the corpus-sized encode pass.
  *  3. THROUGHPUT — ADC brute scan (m LUT lookups/candidate) vs the int8
  *     integer kernel (dims multiplies/candidate) vs float.
  *  4. RECALL — coarse PQ on the DENSE manifold (expected: decays well
  *     below int8's 0.62 — the cells are 8x coarser) and the oversample
  *     the float rerank needs to recover it on this worst-case corpus
  *     (swept 20x/100x/500x at m=8; m=16 for the coarse comparison).
  */
object ScaleProbe20 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.gfunctions.int8_codes

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
      println(f"[probe20] $tag: ${runs(1)}%.2f s (median of 3, ${n / 1000}k x 32 queries)")
      out
    }
    def timeOnce(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe20] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // ---- 1. storage: persisted list bytes per code form
    def dirBytes(dir: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(p => p.toString.endsWith(".parquet") && p.toString.contains("cluster="))
        .mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally s.close()
    }
    val base = "/tmp/graft-probe20"
    val clusterCol = pmod(col("vec_id"), lit(8)).cast("int").as("cluster")
    emb.select(col("vec_id"), col("embedding"), clusterCol)
      .repartition(col("cluster"))
      .write.partitionBy("cluster").mode("overwrite").parquet(s"$base/float")
    emb.select(col("vec_id"), int8_codes(col("embedding")).as("codes_bin"), clusterCol)
      .repartition(col("cluster"))
      .write.partitionBy("cluster").mode("overwrite").parquet(s"$base/int8")
    var model: operators.Pq.Model = null
    timeOnce(s"PQ train m=8 ksub=256 (sampled ~100x)") {
      model = operators.Pq.train(emb, m = 8, ksub = 256, iters = 10)
    }
    timeOnce("PQ encode + cluster-aligned index write (the corpus pass)") {
      import graft.gfunctions.pq_codes
      emb.select(col("vec_id"),
        pq_codes(col("embedding"), model.codebook, model.m, model.ksub).as("codes_pq"),
        clusterCol)
        .repartition(col("cluster"))
        .write.partitionBy("cluster").mode("overwrite").parquet(s"$base/pq")
    }
    val (fB, iB, pB) = (dirBytes(s"$base/float"), dirBytes(s"$base/int8"), dirBytes(s"$base/pq"))
    println(f"[probe20] list bytes on disk: float=${fB / 1048576.0}%.1f MiB, " +
      f"int8=${iB / 1048576.0}%.1f MiB, pq=${pB / 1048576.0}%.1f MiB " +
      f"(float/pq = ${fB.toDouble / pB}%.1f x, int8/pq = ${iB.toDouble / pB}%.1f x)")

    // ---- 3. throughput: brute scans per code form. The in-memory
    // topKPq pays the corpus ENCODE inline (argmin over m*ksub
    // centroids/vector — measured ~10x the scoring cost, amortized to
    // zero in a stored-codes index); the stored-codes pair below is the
    // clean scoring-form comparison: LUT ADC (textbook; codegen keeps
    // the m*ksub+1-double table in the broadcast relation) vs the asym
    // kernel (dims multiplies, 60x less broadcast payload per query)
    val floatTop = time("float brute-force top-10") {
      operators.Similarity.bruteForceTopK(emb, queries).count()
    }
    val int8Top = time("packed int8 brute-force top-10") {
      operators.Similarity.int8TopK(emb, queries).count()
    }
    val pqTop = time("PQ asym brute-force top-10") {
      operators.Pq.topKPq(emb, queries, model).count()
    }
    import graft.gfunctions.{pq_adc_sim, pq_asym_sim, pq_lut}
    val coded = operators.Pq.encode(emb, model).localCheckpoint()
    val asymStoredTop = time("PQ asym over STORED codes top-10") {
      operators.Similarity.rankTopK(
        coded.alias("c")
          .join(
            broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))),
            col("query_id") =!= col("c.vec_id"))
          .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
            pq_asym_sim(col("c.codes_pq"), col("qvec"), model.codebook, model.m, model.ksub)
              .as("sim")),
        10).count()
    }
    val lutTop = time("PQ LUT-ADC brute-force top-10") {
      operators.Similarity.rankTopK(
        coded.alias("c")
          .join(
            broadcast(queries.select(col("vec_id").as("query_id"),
              pq_lut(col("embedding"), model.codebook, model.m, model.ksub).as("qlut"))),
            col("query_id") =!= col("c.vec_id"))
          .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
            pq_adc_sim(col("c.codes_pq"), col("qlut"), model.codebook, model.m, model.ksub)
              .as("sim")),
        10).count()
    }
    assert(floatTop == int8Top && int8Top == pqTop && pqTop == lutTop && lutTop == asymStoredTop)

    // ---- 4. recall on the dense manifold: oversample sweep at m=8 and
    // the m=16 operating point — where does the two-phase contract hold
    // on the WORST-case corpus?
    def tops(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = tops(operators.Similarity.bruteForceTopK(emb, queries))
    def recallOf(got: Map[Long, Set[Long]]): Double = {
      val rs = truth.map { case (q, t) => got(q).intersect(t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val coarse = recallOf(tops(operators.Pq.topKPq(emb, queries, model)))
    println(f"[probe20] PQ m=8 ksub=256 dense coarse recall@10: $coarse%.3f")
    Seq(20, 100, 500).foreach { ov =>
      val r = recallOf(tops(operators.Pq.pqRerankTopK(emb, queries, model, oversample = ov)))
      println(f"[probe20] PQ m=8 rerank@${ov}x recall@10: $r%.3f")
    }
    // residual refinement at the same byte budget: with a real k=64
    // coarse quantizer the residuals are small — does the textbook
    // IVFPQ trick move the dense-manifold number?
    val ivfCentroids = operators.Ivf.train(emb, k = 64, iters = 3)
    var residModel: operators.Pq.Model = null
    timeOnce("residual PQ train m=8 ksub=256 (k=64 quantizer, sampled)") {
      residModel = operators.Ivf.trainResidualPq(emb, ivfCentroids, m = 8, ksub = 256, iters = 10)
    }
    val rawSameK = recallOf(tops(
      operators.Ivf.topKPq(emb, queries, ivfCentroids, model, k = 10, nprobe = 64)))
    val residFull = recallOf(tops(
      operators.Ivf.topKPqResidual(emb, queries, ivfCentroids, residModel, k = 10, nprobe = 64)))
    println(f"[probe20] dense full-probe recall@10 at 8 B: raw PQ $rawSameK%.3f, " +
      f"residual PQ (k=64) $residFull%.3f")
    // the other refinement at the same byte budget: a learned rotation
    // (OPQ) — does decorrelating the sin-manifold's dimensions move the
    // dense number where extra cells (m=16) and residuals barely did?
    var opqModel: operators.Opq.Model = null
    timeOnce("OPQ train m=8 ksub=256 (4 Procrustes alternations, sampled)") {
      opqModel = operators.Opq.train(emb, m = 8, ksub = 256, opqIters = 4)
    }
    val opqDense = recallOf(tops(operators.Opq.topKOpq(emb, queries, opqModel)))
    println(f"[probe20] dense coarse recall@10 at 8 B: OPQ $opqDense%.3f " +
      f"(raw 0-rotation baseline above)")

    var model16: operators.Pq.Model = null
    timeOnce("PQ train m=16 ksub=256 (sampled ~100x)") {
      model16 = operators.Pq.train(emb, m = 16, ksub = 256, iters = 10)
    }
    val coarse16 = recallOf(tops(operators.Pq.topKPq(emb, queries, model16)))
    Seq(20, 100).foreach { ov =>
      val r = recallOf(tops(operators.Pq.pqRerankTopK(emb, queries, model16, oversample = ov)))
      println(f"[probe20] PQ m=16 (16 B) coarse $coarse16%.3f, rerank@${ov}x recall@10: $r%.3f")
    }
    val time20 = time("PQ-coarse + 20x float-rerank top-10") {
      operators.Pq.pqRerankTopK(emb, queries, model).count()
    }
    assert(time20 == floatTop)
    spark.stop()
  }
}
