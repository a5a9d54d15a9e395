package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the dup-cluster
  * closure + canonical-by-quality selection (dedup_clusters / q104) at
  * 1M docs — the one r19 composition without a volume receipt of its
  * own. Claims under test (Cluster.scala scaladoc):
  *
  *  - star edges are O(n) per fingerprint family, never C(n,2) — a
  *    planted 5-doc family costs 4 prefix edges, not 10 pairs;
  *  - hash-min label propagation converges in rounds ~ component
  *    diameter (planted two-family chains have diameter ~4), each
  *    round one equi-join + one min-aggregate of slim (id, 8B) rows;
  *  - q104's canonical selection adds ONE cluster_id-keyed join +
  *    window over slim (id, score) rows on top — text never enters
  *    any exchange (fingerprints ship as 16-byte md5 keys).
  *
  * Planted population, 1M docs total:
  *  - 500k docs in 100k five-doc template families (shared 50-token
  *    prefix per family, unique tail); consecutive family PAIRS also
  *    share a 50-token suffix, chaining two families into one 10-doc
  *    component (prefix stars + suffix stars overlap — the transitive
  *    case pairwise dedup cannot see);
  *  - 500k singletons with unique text.
  * Expected: 650k star edges — 4/family prefix (400k) + 9/pair
  * suffix (450k) − 200k overlap (the even family's prefix edges ARE
  * suffix edges: both stars root at the pair's min id, and the edge
  * union is distinct) — 50k ten-doc components + 500k singletons.
  */
object ScaleProbe40 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val nFam = 100000L           // five-doc families
    val famDocs = 5L * nFam
    val nSingle = 500000L
    val nDocs = famDocs + nSingle

    // family docs: id in [0, 500k) -> fam = id DIV 5; singles follow
    val toked = spark.range(0, nDocs).select(col("id").as("doc_id"),
      expr(s"""CASE WHEN id < $famDocs THEN
          concat(
            transform(sequence(1, 50), i -> concat('f', CAST(id DIV 5 AS STRING), '_', i)),
            array(concat('u', CAST(id AS STRING))),
            transform(sequence(1, 50), i -> concat('s', CAST(id DIV 10 AS STRING), '_', i)))
        ELSE transform(sequence(1, 55), i -> concat('x', CAST(id AS STRING), '_', i))
        END""").as("toks"))
      .localCheckpoint()

    val shuffle = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    def measured[T](tag: String)(body: => T): T = {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      shuffle.set(0L)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      println(f"[probe40] $tag: $wall%.1f s, shuffle ${shuffle.get / 1048576.0}%.1f MiB")
      r
    }

    val edges = measured("star edges (prefix+suffix fingerprints over 1M docs)") {
      operators.Cluster.fingerprintStarEdgesT(toked).localCheckpoint()
    }
    val nEdges = edges.count()
    // 4 prefix edges per 5-doc family + 9 suffix edges per 10-doc pair
    // − the 4-per-pair prefix/suffix overlap the distinct collapses
    val expectEdges = 4L * nFam + 9L * (nFam / 2) - 4L * (nFam / 2)
    println(s"[probe40] edges: $nEdges (expected $expectEdges — O(n) stars, " +
      s"vs ${10L * nFam + 45L * nFam / 2} all-pairs)")
    require(nEdges == expectEdges, s"edge count $nEdges != $expectEdges")

    val asg = measured("closure + assignments (hash-min to convergence)") {
      val labels = operators.Cluster.connectedComponents(edges)
      val a = toked.select(col("doc_id"))
        .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
      val sizes = a.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      a.join(sizes, Seq("cluster_id")).localCheckpoint()
    }
    val comps = asg.select(countDistinct("cluster_id")).collect()(0).getLong(0)
    val tens = asg.filter(col("cluster_size") === 10L).count()
    println(s"[probe40] components: $comps (expected ${nFam / 2 + nSingle}); " +
      s"docs in 10-doc chained components: $tens (expected $famDocs)")
    require(comps == nFam / 2 + nSingle && tens == famDocs,
      "closure must resolve the planted chains exactly")

    // q104 on top: synthetic deterministic scores, one join + window
    val scored = spark.range(0, nDocs).select(col("id").as("doc_id"),
      (conv(substring(md5(col("id").cast("string")), 1, 13), 16, 10).cast("long") / 1e15)
        .as("score"))
    val kept = measured("q104 canonical-by-quality over the 1M assignments") {
      operators.Cluster.canonicalByQuality(asg, scored)
        .filter(col("keep") === 1L).count()
    }
    println(s"[probe40] canonicals kept: $kept (expected ${nFam / 2 + nSingle} — one per component)")
    require(kept == nFam / 2 + nSingle, "exactly one canonical per component")

    spark.stop()
  }
}
