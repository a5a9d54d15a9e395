package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Semi-structured ingestion for scrape payloads (JSON lines) — the
  * columnar analog of the reference's tolerant HTML field selection
  * (scrap_tokopedia.py:50-73: select by (tag, attrs), None when absent).
  *
  * Scale rules:
  *  - Schema is EXPLICIT: at 100 TB, schema inference is a full extra pass
  *    over the data; callers declare what they expect.
  *  - PERMISSIVE mode + a corrupt-record column: malformed rows are
  *    quarantined, never dropped silently and never failing the job —
  *    the same contract as the pipeline's validity gate.
  */
object JsonSource {

  val CorruptCol = "_corrupt_record"

  /** Read JSON-lines with a declared schema; malformed rows land whole in
    * `_corrupt_record` with nulls elsewhere.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** (clean, quarantined): quarantine keeps the raw malformed line for
    * replay/debugging; clean rows drop the corrupt column.
    */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    // Spark refuses corrupt-column-only projections on the lazy JSON parser
    // (AnalysisException); caching materializes the parse first — the
    // officially documented pattern for corrupt-record triage.
    val parsed = df.cache()
    val clean = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantined = parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
    (clean, quarantined)
  }
}

/** CSV twin of [[JsonSource]]: same explicit-schema, PERMISSIVE,
  * quarantine-never-drop contract for delimited scrape exports.
  */
object CsvSource {

  def read(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(JsonSource.CorruptCol)) schema
      else StructType(schema.fields :+ StructField(JsonSource.CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", JsonSource.CorruptCol)
      .csv(path)
  }

  def split(df: DataFrame): (DataFrame, DataFrame) = JsonSource.split(df)
}
