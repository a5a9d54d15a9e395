package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the streaming-ingest
  * maintenance cycle on a persisted IVF index — what does a steady diet
  * of micro-batch appends do to the layout, and does compaction restore
  * it? ScaleProbe17 measured the STATIC layout cost (tasks x clusters
  * fan-out); this probe measures the same cost re-created DYNAMICALLY by
  * [[graft.operators.Ivf.appendIndexBatch]] (one file per touched
  * cluster per batch, by design) and the [[graft.operators.Ivf
  * .compactIndex]] recovery, so the append -> compact cadence rule ships
  * with numbers:
  *
  *  - base: 200k 64-dim vectors, k=64 lists, sampled train;
  *  - ingest: 20 batches x 5k vectors through the idempotent batch
  *    append (the exact code path the stream runs);
  *  - measured: per-batch append cost, list-file growth, warm pruned
  *    serve latency fresh vs fragmented vs compacted.
  */
object ScaleProbe21 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val dims = 64
    val n = 200000L
    def vecs(from: Long, until: Long) = spark.range(from, until).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dims - 1}), " +
        "j -> CAST(sin(CAST(id * 131 + j * 17 AS DOUBLE)) AS FLOAT))").as("embedding"))
    val base = vecs(0, n).localCheckpoint()
    val queries = base.filter(col("vec_id") < 32).localCheckpoint()

    def files(dir: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(p => p.toString.endsWith(".parquet") && p.toString.contains("cluster="))
        .count()
      finally s.close()
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = f
      (out, (System.nanoTime() - t0) / 1e9)
    }
    val dir = "/tmp/graft-probe21/index"
    val centroids = operators.Ivf.train(base, k = 64, iters = 3)
    val (_, wT) = timed(operators.Ivf.writeIndex(base, centroids, dir))
    println(f"[probe21] base write (200k, k=64): $wT%.1f s, ${files(dir)} list files")

    def serve(): Double = {
      // warm median-of-3 pruned serve at nprobe=8
      val ts = (0 until 3).map { _ =>
        timed(operators.Ivf.searchIndex(spark, dir, queries, k = 10, nprobe = 8).count())._2
      }.sorted
      ts(1)
    }
    println(f"[probe21] fresh warm pruned serve: ${serve()}%.2f s")

    val batchTimes = (0 until 20).map { b =>
      val delta = vecs(n + b * 5000L, n + (b + 1) * 5000L)
      timed(operators.Ivf.appendIndexBatch(delta, dir, b.toLong))._2
    }
    val sortedB = batchTimes.sorted
    println(f"[probe21] 20 x 5k-vector batch appends: median ${sortedB(10)}%.2f s, " +
      f"min ${sortedB.head}%.2f s, max ${sortedB.last}%.2f s; ${files(dir)} list files after")
    println(f"[probe21] fragmented warm pruned serve: ${serve()}%.2f s")

    val (_, cT) = timed(operators.Ivf.compactIndex(spark, dir))
    println(f"[probe21] compaction: $cT%.1f s, ${files(dir)} list files after")
    println(f"[probe21] compacted warm pruned serve: ${serve()}%.2f s")

    // the folded index serves every ingested vector exactly once
    val all = operators.Ivf.readIndex(spark, dir)
    val total = all.count()
    val dup = all.groupBy("vec_id").count().filter(col("count") > 1).count()
    println(s"[probe21] rows after cycle: $total (expect ${n + 100000}), dup keys: $dup")
    spark.stop()
  }
}
