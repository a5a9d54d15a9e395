package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout: the pre-shuffle that removes the exchange from
  * every future join/aggregation on the bucket key (SURVEY §4's
  * "co-locate joins via bucketing").
  *
  * At 100 TB the fact-fact shuffle IS the job cost; bucketing both fact
  * tables on the join key at load time (one shuffle, once, at write) makes
  * every downstream join exchange-free: each task zips bucket i with
  * bucket i. sortBy additionally pre-sorts within buckets so sort-merge
  * joins skip their sort.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted external parquet table. */
  def save(df: DataFrame, table: String, path: String, buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", s"$path/$table")
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
