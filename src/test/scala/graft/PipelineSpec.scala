package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SinkConfig

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private def raw(rows: Seq[(java.lang.Long, String, String, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("id", "name", "detail", "price_str", "original_price_str", "discount_str")
  }

  test("end-to-end: parse, validate, dedupe, idempotent load, read back") {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/graft-test/pipeline"))
    val cfg = SinkConfig(path = "/tmp/graft-test/pipeline")
    val batch = raw(Seq(
      (1L, "soap", "bar", "Rp12.500", "Rp15.000", "17%"),
      (1L, "soap", "bar", "Rp12.900", "Rp15.000", "14%"), // same product, re-crawled
      (2L, "tea", "box", "Rp8.000", "Rp8.000", "0%"),
      (null, "ghost", "x", "Rp1.000", "Rp1.000", "0%"),   // invalid: no id
    ))

    val quarantined = ScrapePipeline.run(batch, cfg)
    assert(quarantined.count() == 1, "invalid row quarantined, not dropped silently")

    val soap = ScrapePipeline.table(spark, cfg).filter(col("id") === 1L).collect().head
    assert(soap.getLong(soap.fieldIndex("price")) == 12900L, "deterministic winner kept per key")
    assert(soap.getString(soap.fieldIndex("platform")) == "tokopedia")
    assert(math.abs(soap.getDouble(soap.fieldIndex("discountpercentage")) - 0.14) < 1e-9, """"14%" -> 0.14""")
    assert(ScrapePipeline.table(spark, cfg).count() == 2, "deduped to one row per product")

    // re-run the same batch: same state (idempotent overwrite-by-partition)
    ScrapePipeline.run(batch, cfg)
    assert(ScrapePipeline.table(spark, cfg).count() == 2)
  }
}
