package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The rows-only operators are not oracle-checked, so partition-order
  * nondeterminism in them would be invisible to the correctness gate.
  * This spec runs each twice and requires identical sorted output.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def fingerprint(q: GraftQuery): Seq[String] =
    q.run(spark, sf).collect().map(_.toString).sorted.toSeq

  test("rows-only operators are run-to-run deterministic") {
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty)
    assert(rowsOnly.nonEmpty)
    rowsOnly.foreach { q =>
      val a = fingerprint(q)
      val b = fingerprint(q)
      assert(a == b, s"${q.name} is not deterministic across runs")
      assert(a.nonEmpty, s"${q.name} returned no rows")
    }
  }
}
