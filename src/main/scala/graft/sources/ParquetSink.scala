package graft.sources

import org.apache.spark.sql.DataFrame

/** The "L" of the ETL: bulk columnar loads replacing the reference's
  * row-at-a-time INSERT into Postgres (`data_insert`,
  * scrap_tokopedia.py:279-297, into main.tr_raw_scrap_data).
  *
  * Scale design:
  *  - Partitioned parquet layout (default `createdate`/`platform` — the
  *    reference's stamping columns) so re-crawls of one day/platform
  *    rewrite ONE partition directory, and readers prune on both.
  *  - Idempotent overwrite-by-partition via dynamic partitionOverwriteMode:
  *    re-running a load replaces exactly the partitions present in the
  *    incoming batch and leaves every other partition untouched — the
  *    MERGE-shaped idempotency a row-at-a-time INSERT cannot give.
  */
final case class SinkConfig(
    path: String,
    partitionBy: Seq[String] = Seq("createdate", "platform"),
    // JDBC-shaped surface kept for config compatibility with the
    // reference's SQLAlchemy sink; parquet-backed here (zero egress).
    table: String = "tr_raw_scrap_data",
    batchSize: Int = 10000,
)

object ParquetSink {

  /** Idempotent partitioned load: running the same batch twice yields the
    * same on-disk state (overwrites only the incoming partitions).
    */
  def load(df: DataFrame, cfg: SinkConfig): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      df.write
        .mode("overwrite")
        .partitionBy(cfg.partitionBy: _*)
        .parquet(s"${cfg.path}/${cfg.table}")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Read the sink back (partition columns restored from the layout). */
  def read(spark: org.apache.spark.sql.SparkSession, cfg: SinkConfig): DataFrame =
    spark.read.parquet(s"${cfg.path}/${cfg.table}")
}
