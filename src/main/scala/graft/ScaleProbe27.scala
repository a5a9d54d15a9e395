package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Manual scale probe (not part of the library API): the streaming
  * FILE-SINK metadata log under production micro-batch cadence. The
  * exactly-once story of a parquet `writeStream` sink rests on
  * `_spark_metadata`: one delta log file per batch, compacted every
  * `spark.sql.streaming.fileSink.log.compactInterval` (default 10)
  * batches into a `.compact` file that re-lists EVERY file the sink
  * ever wrote. Two consequences at cadence:
  *
  *  - the compact file grows linearly with total batches forever (the
  *    delta files get cleaned after `cleanupDelay`, the HISTORY does
  *    not) — so does the compaction pause, every compactInterval-th
  *    batch;
  *  - every restart replays the last compact + deltas, so recovery
  *    time grows with sink lifetime too.
  *
  * This probe drives a real MemoryStream -> parquet sink for hundreds
  * of micro-batches and records the compact-file size and per-batch
  * latency trend — the receipt behind SURVEY §4's file-sink rule:
  * bounded-lifetime sinks (per-day/per-job output dirs) can ride the
  * default log; INDEFINITE sinks must either rotate the output
  * directory on a schedule or use the foreachBatch idempotent-upsert
  * discipline the refreshing gates and the index ingest already use
  * (their exactly-once state is O(1) markers, not an O(history) log).
  */
object ScaleProbe27 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val out = "/tmp/graft-probe27/sink"
    val ckpt = "/tmp/graft-probe27/ckpt"
    Seq(out, ckpt, "/tmp/graft-probe27").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }

    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val q = ms.toDF().writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    def metaSize(): (Long, Long, Int) = {
      // (total _spark_metadata bytes, largest .compact bytes, file count)
      val dir = java.nio.file.Paths.get(s"$out/_spark_metadata")
      if (!java.nio.file.Files.exists(dir)) (0L, 0L, 0)
      else {
        val s = java.nio.file.Files.list(dir)
        try {
          val files = s.iterator()
          var total = 0L; var compact = 0L; var count = 0
          while (files.hasNext) {
            val f = files.next()
            val sz = java.nio.file.Files.size(f)
            total += sz; count += 1
            if (f.toString.endsWith(".compact")) compact = math.max(compact, sz)
          }
          (total, compact, count)
        } finally s.close()
      }
    }

    val batches = 400
    var window = List.empty[Double]
    (1 to batches).foreach { b =>
      val t0 = System.nanoTime()
      ms.addData(b.toLong)
      q.processAllAvailable()
      window = ((System.nanoTime() - t0) / 1e9) :: window.take(49)
      if (b % 50 == 0) {
        val (total, compact, count) = metaSize()
        val med = window.sorted.apply(window.size / 2)
        println(f"[probe27] batch $b%4d: _spark_metadata $total%9d B ($count files, " +
          f"largest compact $compact%8d B), median batch latency last-50 $med%.3f s")
      }
    }
    q.stop()
    val (total, compact, count) = metaSize()
    println(f"[probe27] final: $total B across $count files; compact file $compact B " +
      f"after $batches batches -> ${compact.toDouble / batches}%.1f B/batch of UNBOUNDED history")
    spark.stop()
  }
}
