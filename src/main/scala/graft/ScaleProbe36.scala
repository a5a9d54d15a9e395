package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the link-graph
  * sweeps at volume — the claim under test is [[operators.Graph]]'s
  * scale shape: "each iteration is one (dst, contrib) shuffle of
  * 16-byte pairs plus one left join back to the node set; document
  * text never enters the loop."
  *
  * Setup: 1M nodes, the registry edge law (out-degree 1 + id % 3 →
  * ~2M directed edges), edges materialized once. Measured: edge build
  * cost, 5 PageRank sweeps (wall, shuffle bytes total and per sweep,
  * mass-conservation check against the truncation bound), 4 BFS
  * rounds, and 6 label-propagation rounds with the surviving label
  * count — each sweep's exchange must stay in the tens of MB for 1M
  * nodes (16-byte pairs × nodes/edges), nowhere near a text-carrying
  * or all-pairs shape.
  */
object ScaleProbe36 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val nDocs = 1000000L
    val rawNodes = spark.range(0, nDocs).select(col("id").as("doc_id"))

    val shuffle = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    shuffle.set(0L)
    var t0 = System.nanoTime()
    val (nodes, edges) = operators.Graph.materializedGraph(rawNodes)
    val nEdges = edges.count()
    println(f"[probe36] edges: $nEdges built in ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      f"shuffle ${shuffle.get / 1048576.0}%.1f MiB " +
      "(one-time materialization — the edge-table load)")

    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    shuffle.set(0L)
    t0 = System.nanoTime()
    val pr = operators.Graph.pageRankOn(nodes, edges, operators.Graph.PrIters)
      .localCheckpoint()
    val total = pr.agg(sum("pr")).collect()(0).getLong(0)
    var wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    val perSweep = shuffle.get / operators.Graph.PrIters
    println(f"[probe36] pagerank ${operators.Graph.PrIters} sweeps: $wall%.1f s, " +
      f"shuffle ${shuffle.get / 1048576.0}%.1f MiB total " +
      f"(${perSweep / 1048576.0}%.1f MiB/sweep — (id, 8B) pairs, no text)")
    val expectedMass = nDocs * operators.Graph.PrScale
    val maxLoss = operators.Graph.PrIters.toLong * nDocs * 103L
    println(s"[probe36] mass: $total of $expectedMass " +
      s"(loss ${expectedMass - total}, bound $maxLoss, " +
      s"conserved=${total <= expectedMass && total >= expectedMass - maxLoss})")

    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    shuffle.set(0L)
    t0 = System.nanoTime()
    val dep = operators.Graph.crawlDepthOn(
      nodes, edges, col("doc_id") % operators.Graph.SeedMod === 0,
      operators.Graph.BfsIters).localCheckpoint()
    val reached = dep.filter(col("depth") >= 0).count()
    wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    println(f"[probe36] bfs ${operators.Graph.BfsIters} rounds: $wall%.1f s, " +
      f"shuffle ${shuffle.get / 1048576.0}%.1f MiB; reached $reached of $nDocs")

    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    shuffle.set(0L)
    t0 = System.nanoTime()
    val lbl = operators.Graph.labelPropOn(nodes, edges, operators.Graph.CompIters)
      .localCheckpoint()
    val labels = lbl.select(countDistinct(col("comp"))).collect()(0).getLong(0)
    wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    println(f"[probe36] labelprop ${operators.Graph.CompIters} rounds: $wall%.1f s, " +
      f"shuffle ${shuffle.get / 1048576.0}%.1f MiB; $labels labels survive")
    spark.stop()
  }
}
