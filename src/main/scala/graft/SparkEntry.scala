package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Ordered registry of every implemented capability. */
  def registry: Seq[GraftQuery] =
    operators.RelationalCore.all ++
      operators.ScrapeEtl.all ++
      operators.TextAnalysis.all ++
      operators.Dedup.all ++
      operators.Cluster.all ++
      operators.Curate.all ++
      operators.TrainPrep.all ++
      operators.TrainPipeline.all ++
      operators.Graph.all ++
      operators.Profile.all ++
      operators.Snapshot.all ++
      operators.Similarity.all ++
      operators.SparseIndex.all ++
      operators.IndexDrift.all ++
      operators.Bpe.all ++
      operators.Multimodal.all ++
      streaming.Streams.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalCore.q01.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
