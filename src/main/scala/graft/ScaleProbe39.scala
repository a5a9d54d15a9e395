package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the WEIGHTED /
  * PERSONALIZED PageRank family (q102) and the crawl-priority sampler
  * (q103) at volume — the r19 claims under test:
  *
  *  - the weighted edge build pays AT MOST one window-by-src shuffle
  *    at build time, and each of the K sweeps then exchanges the same
  *    slim (dst, 8-byte) pairs as the unweighted law (ScaleProbe36's
  *    receipt) — the weight and Σw columns ride the materialized edge
  *    frame, never re-derive. MEASURED REFINEMENT: when the node
  *    source is range-partitioned on doc_id (spark.range here; a
  *    doc_id-clustered table via Clustered.save on a cluster),
  *    RangePartitioning(doc_id) satisfies the window's
  *    ClusteredDistribution(src) outright — the Σw pass plans a
  *    partition-LOCAL sort, NO exchange at all; only an
  *    unknown-partitioned source (a plain parquet scan) pays the one
  *    hash exchange. Both cases measured below;
  *  - the contribution split (w·(pr DIV sw) + (w·(pr mod sw)) DIV sw)
  *    conserves mass to the same truncation class as q94 (shed
  *    < sw per source edge-set and < 100 per node per sweep, plus
  *    teleport rounding ≤ |seeds| per sweep);
  *  - q103's keep filter is a stateless post-rank map — zero
  *    additional shuffle over the rank it samples.
  *
  * Setup mirrors ScaleProbe36: 1M nodes, the registry edge law
  * (~2M directed edges), seeds = doc_id % 97 = 0 (~10.3k of 1M).
  */
object ScaleProbe39 {
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
    def measured[T](tag: String)(body: => T): (T, Double, Long) = {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      shuffle.set(0L)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      (r, wall, shuffle.get)
    }

    val ((nodes, wedges), bWall, bBytes) = measured("build") {
      val n = rawNodes.localCheckpoint()
      (n, operators.Graph.weightedEdgesOn(n).localCheckpoint())
    }
    val nEdges = wedges.count()
    println(f"[probe39] weighted edges (range-partitioned source): $nEdges built in " +
      f"$bWall%.1f s, shuffle ${bBytes / 1048576.0}%.1f MiB — " +
      "RangePartitioning(doc_id) satisfies the window's clustering, so the " +
      "sw pass is a partition-local sort with NO exchange (a doc_id-" +
      "clustered node table gets this for free on a cluster)")

    // the unknown-partitioning case: a plain parquet scan pays the one
    // hash exchange the scaladoc budgets for
    val pqDir = "/tmp/graft-probe39/nodes_pq"
    rawNodes.write.mode("overwrite").parquet(pqDir)
    val (_, pWall, pBytes) = measured("build from parquet") {
      operators.Graph.weightedEdgesOn(spark.read.parquet(pqDir)).localCheckpoint()
    }
    println(f"[probe39] weighted edges (parquet source, unknown partitioning): " +
      f"$pWall%.1f s, shuffle ${pBytes / 1048576.0}%.1f MiB — the ONE window-by-src " +
      "exchange, paid once at build (never per sweep)")

    val seeds = col("doc_id") % operators.Graph.SeedMod === 0
    val nSeeds = nodes.filter(seeds).count()
    val (pr, wWall, wBytes) = measured("weighted sweeps") {
      operators.Graph.weightedPageRankOn(
        nodes, wedges, seeds, operators.Graph.PrIters).localCheckpoint()
    }
    val perSweep = wBytes / operators.Graph.PrIters
    println(f"[probe39] weighted-personalized pagerank ${operators.Graph.PrIters} sweeps " +
      f"($nSeeds seeds): $wWall%.1f s, shuffle ${wBytes / 1048576.0}%.1f MiB total " +
      f"(${perSweep / 1048576.0}%.1f MiB/sweep — (id, 8B) pairs, weights ride the edge frame)")

    val total = pr.agg(sum("pr")).collect()(0).getLong(0)
    val expected = nDocs * operators.Graph.PrScale
    // per sweep: < sw-truncation per source (< nDocs * 100, sw <= 21 but
    // bound by the damping class), < 100 per node damping, <= nSeeds
    // teleport-integer-division rounding
    val maxLoss = operators.Graph.PrIters.toLong * (nDocs * 121L + nSeeds)
    println(s"[probe39] mass: $total of $expected (loss ${expected - total}, " +
      s"bound $maxLoss, conserved=${total <= expected && total >= expected - maxLoss})")

    val hv = conv(substring(md5(concat(lit("cps:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val (kept, kWall, kBytes) = measured("q103 keep filter over the rank") {
      pr.filter(hv % lit(operators.Graph.PrCap) < least(col("pr"), lit(operators.Graph.PrCap)))
        .count()
    }
    println(f"[probe39] crawl-priority sample: kept $kept of $nDocs in $kWall%.1f s, " +
      f"shuffle ${kBytes / 1048576.0}%.1f MiB (stateless map over the rank — zero exchange)")

    spark.stop()
  }
}
