package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.{ParquetSink, SinkConfig}

/** The reference pipeline end-to-end, re-expressed as one declarative job:
  * scrape-shaped raw records -> parse -> validate -> dedupe -> stamp ->
  * partitioned idempotent load. Mirrors the Airflow DAG's single task
  * (scrap_tokopedia.py: extract 231-277, transform 256-266, load 279-297)
  * with the row contract of `main.tr_raw_scrap_data` (scrap_tokopedia.py:
  * 81-92): id, name, detail, price, originalprice, discountpercentage,
  * platform, createdate.
  *
  * Where the reference runs 5x5 process pools and row-at-a-time INSERTs,
  * this runs as Spark partitions end-to-end and one columnar partitioned
  * write — the same logic at any scale, re-runnable without duplicates.
  */
object ScrapePipeline {

  /** Transform: the reference's field parses as codegen'd expressions over
    * a raw scrape frame with columns (id, name, detail, price_str,
    * original_price_str, discount_str).
    */
  def transform(raw: DataFrame, platform: String, createdate: String): DataFrame =
    raw
      .select(
        col("id"),
        col("name"),
        col("detail"),
        // "Rp1.234.567" -> 1234567 (scrap_tokopedia.py:256)
        regexp_replace(regexp_replace(col("price_str"), "Rp", ""), "\\.", "")
          .cast(LongType).as("price"),
        regexp_replace(regexp_replace(col("original_price_str"), "Rp", ""), "\\.", "")
          .cast(LongType).as("originalprice"),
        // "25%" -> 0.25 (scrap_tokopedia.py:262)
        (regexp_replace(col("discount_str"), "%", "").cast("double") / 100)
          .as("discountpercentage"),
        lit(platform).as("platform"),
        to_date(lit(createdate)).as("createdate"),
      )

  /** Validity gate (is_page_empty / invalid-product markers,
    * scrap_tokopedia.py:199-211): required fields present, price parsed.
    * Returns (valid, quarantined) — invalid rows are never silently lost.
    */
  def validate(parsed: DataFrame): (DataFrame, DataFrame) = {
    val ok = col("id").isNotNull && col("name").isNotNull && col("price").isNotNull
    (parsed.filter(ok), parsed.filter(!ok))
  }

  /** One row per natural key within the batch (the scraper can see the same
    * product on several catalog pages). Winner is deterministic (max_by
    * price — batch rows carry no crawl timestamp); cross-batch newest-wins
    * is the sink's overwrite-by-partition. One hash aggregate, no sort.
    */
  def dedupeLatest(valid: DataFrame): DataFrame =
    valid
      .groupBy("id")
      .agg(max_by(
        struct(valid.columns.filter(_ != "id").toIndexedSeq.map(col): _*), col("price")).as("w"))
      .select(col("id") +: valid.columns.filter(_ != "id").toIndexedSeq.map(c => col(s"w.$c")): _*)

  /** Full run: returns the quarantine frame (for monitoring) after loading
    * the valid records idempotently into the partitioned sink.
    */
  def run(
      raw: DataFrame,
      cfg: SinkConfig,
      platform: String = "tokopedia",
      createdate: String = "2025-08-01"): DataFrame = {
    val parsed = transform(raw, platform, createdate)
    val (valid, quarantined) = validate(parsed)
    ParquetSink.load(dedupeLatest(valid), cfg)
    quarantined
  }

  /** Read the loaded table back — what the reference's downstream SQL sees. */
  def table(spark: SparkSession, cfg: SinkConfig): DataFrame = ParquetSink.read(spark, cfg)
}
