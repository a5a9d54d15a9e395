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
    // Table name shared by both backends (the reference's SQLAlchemy sink
    // table, main.tr_raw_scrap_data).
    table: String = "tr_raw_scrap_data",
    batchSize: Int = 10000,
    // When set, load()/read() go over JDBC — the reference's actual sink is
    // a Postgres table (scrap_tokopedia.py:279-297). Parquet otherwise
    // (the zero-egress, cluster-scale default).
    jdbcUrl: Option[String] = None,
    jdbcOptions: Map[String, String] = Map.empty,
)

object ParquetSink {

  /** Load dispatch. Parquet mode is idempotent overwrite-by-partition;
    * JDBC mode is the reference's append-only bulk INSERT
    * (scrap_tokopedia.py:279-297 — pandas.to_sql appending each crawl
    * batch), executed as per-task batched INSERTs: every executor task
    * opens its own connection and writes its partition, so the load is as
    * parallel as the DataFrame — nothing funnels through the driver.
    * Re-run safety in JDBC mode is the downstream dedup's job
    * (q27_incremental_dedup_load), exactly as in the reference.
    */
  def load(df: DataFrame, cfg: SinkConfig): Unit = cfg.jdbcUrl match {
    case Some(url) =>
      val props = new java.util.Properties()
      cfg.jdbcOptions.foreach { case (k, v) => props.setProperty(k, v) }
      props.setProperty("batchsize", cfg.batchSize.toString)
      df.write.mode("append").jdbc(url, cfg.table, props)
    case None => loadParquet(df, cfg)
  }

  /** Idempotent partitioned load: running the same batch twice yields the
    * same on-disk state (overwrites only the incoming partitions).
    */
  private def loadParquet(df: DataFrame, cfg: SinkConfig): Unit = {
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

  /** Read the sink back (parquet: partition columns restored from the
    * layout; JDBC: full-table scan — pass predicates downstream, the JDBC
    * source pushes filters into the WHERE clause).
    */
  def read(spark: org.apache.spark.sql.SparkSession, cfg: SinkConfig): DataFrame =
    cfg.jdbcUrl match {
      case Some(url) =>
        val props = new java.util.Properties()
        cfg.jdbcOptions.foreach { case (k, v) => props.setProperty(k, v) }
        spark.read.jdbc(url, cfg.table, props)
      case None => spark.read.parquet(s"${cfg.path}/${cfg.table}")
    }
}
