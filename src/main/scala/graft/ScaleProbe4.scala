package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): skew-safe sessionize
  * equivalence under a mega-user whose one session spans many midnights.
  */
object ScaleProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-scale-ev"
    // mega-user 0: 400k events 5s apart (one session crossing ~23 days);
    // users 1..5000: 40 events each, random-ish hours apart (many sessions)
    val mega = spark.range(0, 400000).select(
      col("id").as("event_id"),
      timestamp_millis(lit(1704067200000L) + col("id") * 5000).as("ts"),
      lit(0L).as("user_id"), lit("click").as("event_type"),
      (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 100).as("value"),
      lit("{}").as("props"))
    val normal = spark.range(0, 200000).select(
      (col("id") + 1000000).as("event_id"),
      timestamp_millis(lit(1704067200000L) + pmod(xxhash64(col("id") * 7), lit(2000000L)) * 1000).as("ts"),
      (col("id") % 5000 + 1).as("user_id"), lit("view").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"))
    mega.unionByName(normal).write.mode("overwrite").parquet(s"$dir/events.parquet")

    def run(name: String, f: => org.apache.spark.sql.DataFrame): Seq[String] = {
      val t0 = System.nanoTime()
      val r = f.collect().map(_.toString).sorted.toSeq
      println(f"[probe4] $name: ${(System.nanoTime()-t0)/1e9}%.1f s, ${r.size} sessions")
      r
    }
    val a = run("oracle single-window", operators.ScrapeEtl.q25.run(spark, dir))
    val b = run("prod day-salted    ", operators.ScrapeEtl.q25.runProd(spark, dir))
    println(s"[probe4] equal=${a == b}")
    // Batch sessionize twin (secondary sort + O(1)-state fold): the 400k-event
    // mega-user must stream through the fold without a whole-user Seq.
    // Compare on the columns the twin and q25 share.
    val proj = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("user_id"), col("session_id"), col("n_events").cast("long"),
      col("duration_sec").cast("double"))
    val c = run("batch twin sec-sort ", proj(
      graft.streaming.Streams.sessionizeBatch(operators.Events.withEventTime(spark, dir))
        .withColumn("duration_sec", (col("end_ms") - col("start_ms")) / 1000.0)))
    val aProj = run("oracle projected    ", proj(operators.ScrapeEtl.q25.run(spark, dir)))
    println(s"[probe4] twin_equal=${c == aProj}")
    spark.stop()
  }
}
