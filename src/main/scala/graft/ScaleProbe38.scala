package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): q100's snapshot
  * diff on two genuinely PERSISTED 20M-row snapshots — the r18 verdict
  * item 6. The claim under test is Snapshot.scala's co-location
  * argument: "at 100 TB both snapshots are parquet tables; clustering
  * them on doc_id makes the join co-located and the unchanged majority
  * never leaves its executor."
  *
  * Three layouts of the SAME snapshot pair:
  *   (a) doc_id-RANGE-CLUSTERED (sources/Clustered.save) — measures
  *       the layout's cross-snapshot row-group ALIGNMENT from the
  *       parquet footers: how many nxt row groups a cur row group's
  *       key range intersects (1:1-ish for aligned layouts vs all-N
  *       for scattered). Vanilla Spark still plans a full two-sided
  *       exchange for the SMJ — a parquet scan reports unknown
  *       partitioning — so the shuffle numbers here quantify what the
  *       alignment does NOT yet buy without bucketing.
  *   (b) BUCKETED TABLES (bucketBy doc_id, the co-location answer the
  *       Graph/Clustered docs name): the diff join plans with NO
  *       exchange on either side — shuffle-write ≈ 0 for 40M rows in.
  *   (c) hash-SCATTERED control (repartition by the content hash) —
  *       the worst-case layout both for alignment and for the join.
  *
  * The synthesized next snapshot follows q100's registry law (revise
  * doc_id % 17, drop % 31, add % 41 with shifted ids) so the diff's
  * change-mix matches the gated entry's shape.
  */
object ScaleProbe38 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val n = 20000000L
    val root = "/tmp/graft-probe38"

    val cur = spark.range(0, n).select(
      col("id").as("doc_id"),
      md5(concat(lit("doc "), col("id").cast("string"))).as("h"))
    val nxt = spark.range(0, n).filter(col("id") % 31 =!= 0).select(
      col("id").as("doc_id"),
      when(col("id") % 17 === 0, md5(concat(lit("doc "), col("id").cast("string"), lit(" rev2"))))
        .otherwise(md5(concat(lit("doc "), col("id").cast("string")))).as("h"))
      .unionAll(spark.range(0, n).filter(col("id") % 41 === 0).select(
        (col("id") + lit(n)).as("doc_id"),
        md5(concat(lit("new doc "), (col("id") + lit(n)).cast("string"))).as("h")))

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
      println(f"[probe38] $tag: $wall%.1f s, shuffle ${shuffle.get / 1048576.0}%.1f MiB")
      r
    }

    // ---- (a) range-clustered snapshots: alignment + vanilla join
    measured("write 2x20M range-clustered (32 files each)") {
      sources.Clustered.save(cur, s"$root/cur_c", "doc_id", 32)
      sources.Clustered.save(nxt, s"$root/nxt_c", "doc_id", 32)
    }
    val rc = sources.Clustered.rowGroupRanges(spark, s"$root/cur_c", "doc_id")
    val rx = sources.Clustered.rowGroupRanges(spark, s"$root/nxt_c", "doc_id")
    def crossOverlap(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): (Double, Int) = {
      val per = a.map { case (mn, mx) => b.count { case (bn, bx) => mn <= bx && bn <= mx } }
      (per.sum.toDouble / per.size, per.max)
    }
    val (avgC, maxC) = crossOverlap(rc, rx)
    println(f"[probe38] clustered alignment: ${rc.size} cur x ${rx.size} nxt row groups, " +
      f"a cur group's key range intersects avg $avgC%.1f / max $maxC nxt groups " +
      "(the co-locatable 1:1-ish layout)")
    val diffC = measured("diff join over range-clustered parquet") {
      operators.Snapshot.snapshotDiffOn(
          spark.read.parquet(s"$root/cur_c"), spark.read.parquet(s"$root/nxt_c"))
        .groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    println(s"[probe38] change mix: $diffC")

    // ---- (b) bucketed tables: the zero-exchange cluster path
    spark.sql("DROP TABLE IF EXISTS probe38_cur_b")
    spark.sql("DROP TABLE IF EXISTS probe38_nxt_b")
    // a previous run's metastore is gone but its warehouse dirs remain —
    // clear the locations too, or saveAsTable refuses
    Seq("probe38_cur_b", "probe38_nxt_b").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" + t)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
    measured("write 2x20M bucketed tables (32 buckets on doc_id)") {
      cur.write.bucketBy(32, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("probe38_cur_b")
      nxt.write.bucketBy(32, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("probe38_nxt_b")
    }
    val diffB = measured("diff join over bucketed tables (co-located)") {
      operators.Snapshot.snapshotDiffOn(
          spark.table("probe38_cur_b"), spark.table("probe38_nxt_b"))
        .groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val planB = operators.Snapshot.snapshotDiffOn(
        spark.table("probe38_cur_b"), spark.table("probe38_nxt_b"))
      .queryExecution.executedPlan.toString
    println(s"[probe38] bucketed plan has exchange: ${planB.contains("Exchange")}")
    require(diffB == diffC, s"layouts must agree on the diff: $diffB vs $diffC")

    // ---- (c) hash-scattered control
    measured("write 2x20M hash-scattered control") {
      cur.repartition(32, col("h")).write.mode("overwrite").parquet(s"$root/cur_s")
      nxt.repartition(32, col("h")).write.mode("overwrite").parquet(s"$root/nxt_s")
    }
    val rsC = sources.Clustered.rowGroupRanges(spark, s"$root/cur_s", "doc_id")
    val rsX = sources.Clustered.rowGroupRanges(spark, s"$root/nxt_s", "doc_id")
    val (avgS, maxS) = crossOverlap(rsC, rsX)
    println(f"[probe38] scattered alignment: a cur group intersects " +
      f"avg $avgS%.1f / max $maxS of ${rsX.size} nxt groups (whole-domain spans)")
    val diffS = measured("diff join over scattered parquet") {
      operators.Snapshot.snapshotDiffOn(
          spark.read.parquet(s"$root/cur_s"), spark.read.parquet(s"$root/nxt_s"))
        .groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    require(diffS == diffC, s"layouts must agree on the diff: $diffS vs $diffC")

    spark.stop()
  }
}
