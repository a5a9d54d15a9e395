package graft

import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): what do parquet
  * bloom filters buy a POINT PROBE on a column the range clustering
  * does nothing for? [[graft.sources.Clustered.save]] makes the sort
  * key's row-group min/max tight (ScaleProbe22), but a point predicate
  * on any OTHER high-cardinality column (doc_id, url, vec_id) finds
  * every row group's [min,max] containing it — zero skipping. Blooms
  * are membership pruning where ordering gives none.
  *
  * Setup: 5M rows clustered by user_id into 32 files, point probes on
  * doc_id (uniform, unrelated to the sort key). Measured: (a) the
  * structural skip rate straight from the footers (bloom-negative row
  * groups per probe — what the reader provably never reads), (b) warm
  * median wall time of the actual Spark point-probe scan on the bloom
  * layout vs an identical no-bloom control, (c) the write-time and
  * file-size cost of carrying the filters.
  */
object ScaleProbe26 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    // doc_id is a SPARSE unique key: 2x a permutation of [0, n) (40503
    // coprime with n) — even values present exactly once, odd values
    // in-range but ABSENT. Two deliberate properties: (a) a
    // low-cardinality column would truthfully skip nothing (every row
    // group really contains every popular value — the first version of
    // this probe measured exactly that 0); (b) absent probes must be
    // IN-RANGE, or min/max stats prune them without any bloom and the
    // receipt measures the wrong mechanism.
    val n = 5000000L
    val rows = spark.range(0, n).select(
      (col("id") * 2654435761L % 1000000).as("user_id"),
      (col("id") * 40503L % n * 2).as("doc_id"),
      col("id").as("payload"))
      .localCheckpoint()

    val base = "/tmp/graft-probe26"
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = f
      (out, (System.nanoTime() - t0) / 1e9)
    }
    def du(dir: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }

    val (_, tPlain) = timed(sources.Clustered.save(rows, s"$base/plain", "user_id", 32))
    val (_, tBloom) = timed(sources.Clustered.save(
      rows, s"$base/bloom", "user_id", 32, bloomCols = Seq("doc_id")))
    println(f"[probe26] write 5M rows: plain $tPlain%.1f s / ${du(s"$base/plain") / 1048576.0}%.1f MiB, " +
      f"bloom $tBloom%.1f s / ${du(s"$base/bloom") / 1048576.0}%.1f MiB")

    // structural skip rate: 32 point probes, footer-evaluated
    val probeIds = (0 until 32).map(i => (i * 131L * 40503L) % n * 2)
    val stats = probeIds.map(v => sources.Clustered.bloomStats(spark, s"$base/bloom", "doc_id", v))
    val total = stats.head._3
    val skipped = stats.map(_._2)
    println(f"[probe26] footer receipt: ${stats.head._1} of $total row groups carry doc_id blooms; " +
      f"point probe skips median ${skipped.sorted.apply(16)} / min ${skipped.min} / max ${skipped.max} of $total groups")

    // end-to-end: warm median-of-5 point-probe scans, bloom vs control
    def scan(dir: String): Double = {
      val ts = (0 until 5).map { i =>
        val v = probeIds(i % probeIds.size)
        timed(sources.Clustered.read(spark, dir).filter(col("doc_id") === v).count())._2
      }.sorted
      ts(2)
    }
    scan(s"$base/plain"); scan(s"$base/bloom") // warm-up
    println(f"[probe26] point-probe scan warm median: plain ${scan(s"$base/plain")}%.3f s, " +
      f"bloom ${scan(s"$base/bloom")}%.3f s")
    // absent IN-RANGE key (odd): min/max stats cannot prune it — only
    // the bloom proves absence, so the reader decodes nothing
    def scanAbsent(dir: String): Double = {
      val ts = (0 until 5).map { i =>
        timed(sources.Clustered.read(spark, dir)
          .filter(col("doc_id") === (2L * i + 1001)).count())._2
      }.sorted
      ts(2)
    }
    scanAbsent(s"$base/plain"); scanAbsent(s"$base/bloom")
    println(f"[probe26] ABSENT-key scan warm median: plain ${scanAbsent(s"$base/plain")}%.3f s, " +
      f"bloom ${scanAbsent(s"$base/bloom")}%.3f s")
    // the mechanism, not just the wall time: rows the scan DECODES for
    // an in-range absent key (scan-node numOutputRows). Stats can't
    // prune it (every group's [min,max] contains it); only the bloom
    // proves absence before decode.
    Seq("plain", "bloom").foreach { layout =>
      val df = sources.Clustered.read(spark, s"$base/$layout").filter(col("doc_id") === 1001L)
      df.collect()
      val decoded = df.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
      println(s"[probe26] $layout: scan decoded $decoded rows for the in-range absent key")
    }
    spark.stop()
  }
}
