package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the persisted IVF
  * index layout at a CLUSTER-CLASS partition count. The driver-gate specs
  * exercise writeIndex/searchIndex at k=8 inverted lists; a 1000-executor
  * deployment over a 100 TB corpus carves k~1024 lists, which turns the
  * index directory into 1024 partition dirs of small parquet files — the
  * layout claim in Ivf.writeIndex's scaladoc needs a receipt at that
  * shape, like every other scale claim in SURVEY §6.
  *
  * Assignment is synthesized as vec_id mod k through writeIndexAssigned:
  * the probe isolates LAYOUT/IO (write fan-out, directory listing,
  * static pruning, pruned-scan cost) from quantizer quality, which the
  * recall specs pin separately — and dodges paying a 1024-centroid
  * k-means whose 1024-struct literal array would also stress codegen, a
  * separate question from the on-disk layout. The SERVE path is the real
  * one: Ivf.searchIndexProbed, the exact core searchIndex/
  * searchIndexRerank run in production.
  *
  * Measures per layout (k=8 vs k=1024, same 200k x 64-dim corpus):
  *   1. index write wall (the 1024-way partitionBy fan-out),
  *   2. data-file count (the many-small-files reality),
  *   3. first pruned serve after the write (catalog listing + planning
  *      + pruned scan — the cold-cache cost a new executor pays),
  *   4. warm pruned serve (median of 3),
  *   5. full-index scan for contrast (what serving would cost WITHOUT
  *      static pruning),
  * and asserts the executed serving plan statically prunes at k=1024
  * exactly as the k=8 spec pins.
  */
object ScaleProbe17 {
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
    val nprobe = 8

    def countFiles(dir: String): Long = {
      val root = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }

    Seq(8, 1024).foreach { k =>
      val dir = s"/tmp/graft-probe17/index_k$k"
      val t0 = System.nanoTime()
      operators.Ivf.writeIndexAssigned(emb, pmod(col("vec_id"), lit(k)), dir)
      println(f"[probe17] k=$k%4d write: ${(System.nanoTime() - t0) / 1e9}%6.2f s, " +
        s"${countFiles(dir)} data files")

      // 32 queries x nprobe deterministic probes (spread over the id space)
      val probes = queries.select(
        col("vec_id").as("query_id"), int8_codes(col("embedding")).as("qcodes"),
        explode(expr(s"transform(sequence(0, ${nprobe - 1}), " +
          s"j -> CAST(pmod(vec_id * 131 + j * 37, $k) AS INT))")).as("cluster"))
        .localCheckpoint(eager = true)
      val nLists = probes.select("cluster").distinct().count()

      val t1 = System.nanoTime()
      val firstRows = operators.Ivf.searchIndexProbed(spark, dir, probes, 10).count()
      println(f"[probe17] k=$k%4d first pruned serve ($nLists%4d lists probed): " +
        f"${(System.nanoTime() - t1) / 1e9}%6.2f s ($firstRows rows)")

      val warm = (0 until 3).map { _ =>
        val t = System.nanoTime()
        operators.Ivf.searchIndexProbed(spark, dir, probes, 10).count()
        (System.nanoTime() - t) / 1e9
      }.sorted
      println(f"[probe17] k=$k%4d warm pruned serve: med ${warm(1)}%6.2f s (min ${warm(0)}%.2f)")

      val served = operators.Ivf.searchIndexProbed(spark, dir, probes, 10)
      served.count()
      val plan = served.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [cluster"),
        s"k=$k serving plan lost static pruning:\n$plan")
      println(s"[probe17] k=$k static pruning: " +
        plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("").trim.take(110))

      val full = (0 until 3).map { _ =>
        val t = System.nanoTime()
        spark.read.parquet(dir).count()
        (System.nanoTime() - t) / 1e9
      }.sorted
      println(f"[probe17] k=$k%4d full index scan (no pruning): med ${full(1)}%6.2f s")
    }
    spark.stop()
  }
}
