package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every query that declares a production plan must return exactly the
  * oracle plan's rows (order aside) — prod mode trades ordering, never
  * content.
  */
class ProdParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("prod plans return the same rows as oracle plans") {
    val withProd = SparkEntry.registry.filter(_.prod.isDefined)
    assert(withProd.nonEmpty, "at least some queries declare prod plans")
    withProd.foreach { q =>
      val oracle = q.run(spark, sf).collect().map(_.toString).sorted.toSeq
      val prod = q.runProd(spark, sf).collect().map(_.toString).sorted.toSeq
      assert(oracle == prod, s"${q.name}: prod rows diverge from oracle rows")
    }
  }
}
