package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteredSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  import sources.Clustered

  private val dir = "/tmp/graft-test/clustered"
  private val shuffledDir = "/tmp/graft-test/clustered_control"

  private def events = Tables.events(spark, "/root/testdata/sf0.01")
    .select(col("user_id"), col("event_id"), col("event_type"))

  test("clustered write: row-group key ranges are strictly disjoint; shuffled control is not") {
    Clustered.save(events, dir, "user_id", files = 8)
    // control: same data, layout-shuffled on an unrelated hash
    events.repartition(8, expr("hash(event_id)"))
      .write.mode("overwrite").parquet(shuffledDir)

    val clustered = Clustered.rowGroupRanges(spark, dir, "user_id")
    val control = Clustered.rowGroupRanges(spark, shuffledDir, "user_id")
    assert(clustered.size >= 8, s"expected >= 1 row group per file, got ${clustered.size}")
    assert(Clustered.overlappingPairs(clustered) == 0,
      s"clustered layout must have disjoint row-group ranges, got $clustered")
    // the control's row groups all span ~the whole user domain — the
    // stats exist but can skip nothing
    assert(Clustered.overlappingPairs(control) > control.size,
      s"control layout should overlap heavily, got ${Clustered.overlappingPairs(control)}")
  }

  test("clustered round-trip loses nothing and the point predicate reaches the scan") {
    Clustered.save(events, dir, "user_id", files = 8)
    val back = Clustered.read(spark, dir)
    assert(back.count() == events.count())
    assert(back.agg(sum("user_id")).head.getLong(0) ==
      events.agg(sum("user_id")).head.getLong(0))

    val someUser = events.select("user_id").head.getLong(0)
    val q = back.filter(col("user_id") === someUser)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains(s"EqualTo(user_id,$someUser)"),
      s"point predicate must push to the parquet scan:\n$plan")
    assert(q.count() == events.filter(col("user_id") === someUser).count())
  }
}
