package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): what Z-ORDER
  * clustering ([[graft.sources.Clustered.saveZOrder]]) buys a
  * MULTI-predicate workload, at a size where row-group skipping has
  * something to skip — 20M rows, 64 files.
  *
  * Three layouts of identical rows, identical pushed predicates:
  * shuffled control, range-clustered on k0 (the single-key champion),
  * z-ordered on (k0, k1). Reported per layout and per key: row groups
  * whose footer range intersects a 1/1000-selectivity predicate, and
  * the measured warm scan time. The claim under test is the trade the
  * scaladoc states: single-key clustering is unbeatable on ITS key and
  * useless on the other; z-order pays ~sqrt(N)-of-N on each key and is
  * the only layout that skips on both.
  */
object ScaleProbe23 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val n = 20000000L
    // two independent keys arriving shuffled
    val rows = spark.range(0, n).select(
      pmod(hash(col("id")).cast("long") * 2654435761L + col("id"), lit(n)).as("k0"),
      pmod(hash(col("id") + 7).cast("long") * 40503L + col("id") * 31, lit(n)).as("k1"),
      (col("id") % 97).cast("double").as("amount"))
      .localCheckpoint()

    val base = "/tmp/graft-probe23"
    def timedS(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tZ = timedS(sources.Clustered.saveZOrder(rows, s"$base/zorder", "k0", "k1", files = 64))
    val tSingle = timedS(sources.Clustered.save(rows, s"$base/single", "k0", files = 64))
    val tControl = timedS(
      rows.repartition(64, col("amount")).write.mode("overwrite").parquet(s"$base/control"))
    println(f"[probe23] write: z-order $tZ%.1f s (sketch pass + range exchange + sort), " +
      f"single-key $tSingle%.1f s, control $tControl%.1f s")

    val lo = n / 2
    val hi = lo + n / 1000 // 1/1000 selectivity
    for (layout <- Seq("zorder", "single", "control"); key <- Seq("k0", "k1")) {
      val ranges = sources.Clustered.rowGroupRanges(spark, s"$base/$layout", key)
      val touched = ranges.count { case (mn, mx) => mn <= hi && lo <= mx }
      println(s"[probe23] $layout/$key: $touched of ${ranges.size} row groups intersect the range")
    }

    def query(dir: String, key: String): Double = {
      val ts = (0 until 4).map { _ =>
        timedS {
          spark.read.parquet(dir)
            .filter(col(key) >= lo && col(key) <= hi)
            .agg(sum("amount"), count(lit(1))).collect()
        }
      }.drop(1).sorted
      ts(1)
    }
    val sums = for (layout <- Seq("zorder", "single", "control"); key <- Seq("k0", "k1")) yield {
      val t = query(s"$base/$layout", key)
      println(f"[probe23] $layout/$key warm 1/1000-range aggregate: $t%.2f s (median of 3)")
      spark.read.parquet(s"$base/$layout")
        .filter(col(key) >= lo && col(key) <= hi)
        .agg(sum("amount")).head.getDouble(0)
    }
    // layouts must agree per key, or the probe measured different queries
    require(sums.grouped(2).toSeq.transpose.forall(_.distinct.size == 1),
      s"layouts disagree on the aggregate: $sums")
    spark.stop()
  }
}
