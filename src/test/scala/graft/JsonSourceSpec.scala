package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class JsonSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  import sources.JsonSource

  test("explicit-schema read quarantines malformed lines, never drops them") {
    val dir = "/tmp/graft-test/json"
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/scrape.jsonl"),
      """{"id": 1, "name": "soap", "price": "Rp12.500"}
        |{"id": 2, "name": "tea", "price": "Rp8.000"}
        |{"id": 3, "name": "broken
        |{"id": 4, "name": "rice", "price": null}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("price", StringType)))

    val (clean, quarantined) = JsonSource.split(JsonSource.read(spark, s"$dir/scrape.jsonl", schema))
    assert(clean.count() == 3, "null fields are valid; only malformed JSON is corrupt")
    assert(quarantined.count() == 1)
    val bad = quarantined.collect().head.getString(0)
    assert(bad.contains("broken"), "quarantine keeps the raw line for replay")
    assert(clean.columns.toSeq == Seq("id", "name", "price"), "corrupt column dropped from clean side")
  }

  test("csv twin applies the same quarantine contract") {
    val dir = "/tmp/graft-test/csv"
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/scrape.csv"),
      """id,name,price
        |1,soap,12500
        |2,tea,notanumber
        |3,rice,3000
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("price", LongType)))
    val (clean, quarantined) = sources.CsvSource.split(
      sources.CsvSource.read(spark, s"$dir/scrape.csv", schema))
    assert(clean.count() == 2, "type-mismatched row quarantined")
    assert(quarantined.count() == 1)
    assert(quarantined.collect().head.getString(0).contains("notanumber"))
  }
}
