package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  import sources.Bucketed

  test("bucketed fact-fact join plans without an exchange") {
    val sf = "/root/testdata/sf0.001"
    val path = "/tmp/graft-test/bucketed"
    Bucketed.save(Tables.orders(spark, sf), "graft_orders_b", path, 4, "o_orderkey")
    Bucketed.save(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "graft_lineitem_b", path, 4, "o_orderkey")

    val o = Bucketed.table(spark, "graft_orders_b")
    val l = Bucketed.table(spark, "graft_lineitem_b")
    // merge hint pins sort-merge so the assertion is about bucketing, not
    // about whether the tiny test table broadcasts
    val joined = o.join(l.hint("merge"), Seq("o_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle on the bucket key:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), s"bucket pruning metadata missing:\n$plan")

    // and it computes the right thing
    val n = joined.agg(sum("n")).collect()(0).getLong(0)
    assert(n == Tables.lineitem(spark, sf).count())
  }
}
