package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): coarse-assignment
  * codegen at large k — the regime a 100 TB IVF wants (k in the
  * thousands keeps inverted lists and SemDeDup cells bounded as the
  * corpus grows).
  *
  * Compares the r15 [[graft.functions.NearestCentroid]] kernel (centroid
  * matrix as ONE codegen reference object — generated code O(1) in k)
  * against the literal struct-array argmax it replaced (k inlined
  * cosine_sim sub-expressions per row, then a per-row sort of a
  * k-struct array), on 400k vectors at k = 64 / 256 / 1024. Measured:
  * kernel 0.3 / 0.6 / 1.8 s vs literal 1.2 / 4.8 / 26.7 s — 4x / 8x /
  * 15x, the gap widening superlinearly with k (the per-row allocation
  * + sort dominates; the generated-code size risk past these k's —
  * 64KB method / constant-pool limits — is the cliff the kernel
  * removes structurally). A run that hard-fails the literal form is
  * reported rather than crashing the probe.
  */
object ScaleProbe29 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val n = 400000L
    val emb = spark.range(0, n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64(col("id") * 64 + j), lit(2000)).cast("double") / 1000.0 - 1.0)
          .cast("float")).as("embedding"))
    emb.write.mode("overwrite").parquet("/tmp/graft-probe29/embeddings.parquet")
    val corpus = spark.read.parquet("/tmp/graft-probe29/embeddings.parquet")

    val rnd = new scala.util.Random(47)
    def centroids(k: Int): Array[Array[Float]] =
      Array.fill(k)(Array.fill(64)(rnd.nextGaussian().toFloat))

    def literalArgmax(cs: Array[Array[Float]]) = {
      val scored = array(cs.zipWithIndex.toIndexedSeq.map { case (c, i) =>
        struct(graft.gfunctions.cosine_sim(col("embedding"), typedlit(c)).as("sim"),
          lit(-i).as("neg_id"))
      }: _*)
      -element_at(reverse(array_sort(scored)), 1).getField("neg_id")
    }

    def run(tag: String, assign: org.apache.spark.sql.Column): Unit =
      try {
        val df = corpus.select(assign.as("cell"))
        df.write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[probe29] $tag: $secs%.1f s (400k vectors)")
      } catch {
        case e: Throwable =>
          println(s"[probe29] $tag: FAILED ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(140)}")
      }

    for (k <- Seq(64, 256, 1024)) {
      val cs = centroids(k)
      run(s"kernel  k=$k", operators.Ivf.clusterOf(col("embedding"), cs))
      run(s"literal k=$k", literalArgmax(cs))
    }
    spark.stop()
  }
}
