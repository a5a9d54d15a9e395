package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves GraftSession's AQE skew-join config actually engages: a join
  * where one key holds ~98% of the rows must show skew-split shuffle reads
  * in the final adaptive plan instead of one straggler task.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  test("AQE splits a skewed join partition under the engine session") {
    import spark.implicits._
    // hot key 0: 400k rows; keys 1..99: 100 rows each. Force the sizes AQE
    // needs by lowering its thresholds for this one test (the session
    // defaults target real data sizes, not a unit-test fixture).
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 90% of rows on key 0, padded so the hot shuffle partition is MBs.
      // The aggregate is GLOBAL: a groupBy on the join key would require
      // the join's output partitioning and block OptimizeSkewedJoin.
      val fact = spark.range(0, 300000).select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 100).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("pad"))
      val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = fact.join(dim.hint("merge"), Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("bytes"))
      // act on THIS DataFrame instance: a write would spawn its own
      // QueryExecution and leave this one's adaptive plan un-finalized
      assert(joined.collect().head.getLong(0) == 300000L)
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      }.getOrElse(joined.queryExecution.executedPlan.toString)
      assert(adaptive.contains("skew=true"), s"no skew handling in final plan:\n$adaptive")
      assert(adaptive.contains("skewed"), s"shuffle read not skew-split:\n$adaptive")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
