package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): what range-clustered
  * parquet ([[graft.sources.Clustered]]) buys a selective scan, at a size
  * where row-group skipping has something to skip — 20M rows, ~32 files.
  *
  * Both layouts hold identical rows and identical pushed predicates; the
  * ONLY difference is row-group min/max tightness. Reported: row groups
  * whose range intersects the predicate (from the footers — what the
  * reader can possibly read) and the measured warm scan time for a
  * 1/1000-selectivity range aggregate on each layout.
  */
object ScaleProbe22 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val n = 20000000L
    // key arrives SHUFFLED (hash order), the worst case clustering fixes
    val rows = spark.range(0, n).select(
      pmod(hash(col("id")).cast("long") * 2654435761L + col("id"), lit(n)).as("user_id"),
      col("id").as("event_id"),
      (col("id") % 97).cast("double").as("amount"))
      .localCheckpoint()

    val base = "/tmp/graft-probe22"
    def timedS(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tClusered = timedS(sources.Clustered.save(rows, s"$base/clustered", "user_id", files = 32))
    val tControl = timedS(
      rows.repartition(32, col("event_id")).write.mode("overwrite").parquet(s"$base/control"))
    println(f"[probe22] write: clustered $tClusered%.1f s (range exchange + sort), " +
      f"control $tControl%.1f s (hash exchange)")

    val lo = n / 2
    val hi = lo + n / 1000 // 1/1000 selectivity
    Seq("clustered", "control").foreach { layout =>
      val ranges = sources.Clustered.rowGroupRanges(spark, s"$base/$layout", "user_id")
      val touched = ranges.count { case (mn, mx) => mn <= hi && lo <= mx }
      println(s"[probe22] $layout: ${ranges.size} row groups, $touched intersect the predicate")
    }

    def query(dir: String): Double = {
      val ts = (0 until 4).map { _ =>
        timedS {
          spark.read.parquet(dir)
            .filter(col("user_id") >= lo && col("user_id") <= hi)
            .agg(sum("amount"), count(lit(1))).collect()
        }
      }.drop(1).sorted
      ts(1)
    }
    val sums = Seq("clustered", "control").map { layout =>
      val t = query(s"$base/$layout")
      println(f"[probe22] $layout warm 1/1000-range aggregate: $t%.2f s (median of 3)")
      spark.read.parquet(s"$base/$layout")
        .filter(col("user_id") >= lo && col("user_id") <= hi)
        .agg(sum("amount")).head.getDouble(0)
    }
    assert(sums.distinct.size == 1, s"layouts must agree on the answer: $sums")
    spark.stop()
  }
}
