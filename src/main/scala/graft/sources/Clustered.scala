package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Range-clustered parquet layout: the data-skipping discipline for
  * SELECTIVE predicates on keys too fine for directory partitioning.
  *
  * Directory partitioning ([[ParquetSink]]) prunes on coarse keys —
  * date, platform — but a 100 TB fact table cannot partition by user_id
  * or price (millions of directories). What scans CAN skip on is parquet
  * row-group statistics: every row group stores min/max per column, and
  * the pushed predicate drops whole row groups whose range excludes it —
  * IF the data is clustered so those ranges are tight. A shuffled write
  * leaves every row group spanning the whole key domain (min/max ~
  * global min/max → zero skipping, the stats are dead weight); this
  * write makes them disjoint:
  *
  *  - `repartitionByRange(key)` gives each output file a disjoint key
  *    range (one range-exchange, paid once at write);
  *  - `sortWithinPartitions(key)` orders rows inside the file so each
  *    ROW GROUP covers a narrow contiguous slice of the file's range.
  *
  * A point or range predicate then touches the few row groups whose
  * slice intersects it — scan cost tracks SELECTIVITY, not table size
  * (ScaleProbe22 receipt in SURVEY §6; the disjointness itself is
  * asserted structurally from the parquet footers in ClusteredSpec, not
  * assumed). This composes with directory partitioning: partition by
  * the coarse key, range-cluster by the fine one within each partition.
  *
  * vs [[Bucketed]]: bucketing pre-shuffles for JOIN locality (hash
  * buckets, exchange-free joins); clustering pre-sorts for SCAN
  * selectivity (range files, row-group skipping). A table can need
  * either or both — they are different levers.
  */
object Clustered {

  /** Write `df` range-clustered on `key` into `files` output files. */
  def save(df: DataFrame, dir: String, key: String, files: Int = 32): Unit =
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(dir)

  /** Write `df` Z-ORDER-clustered on TWO long keys: the multi-predicate
    * data-skipping layout. [[save]] makes `key`'s row-group stats tight
    * and every other column's useless; this interleaves the bits of
    * both keys' QUANTILE buckets (2^bits each, boundaries from one
    * mergeable-sketch pass — no global sort) into a Morton value and
    * range-clusters on THAT, so each row group covers a small
    * hyper-rectangle in (key0, key1) space and a selective predicate on
    * EITHER key skips most row groups. Per-key skipping is weaker than
    * a dedicated single-key sort — for an N-row-group layout a point
    * predicate on one key touches ~sqrt(N) groups instead of 1 — but
    * the second key gets sqrt(N)-of-N skipping instead of NONE, which
    * is the right trade whenever the workload filters on more than one
    * column (the ScaleProbe23 receipt quantifies both sides). The
    * Morton column is a sort key only — dropped before the write; the
    * layout lives in the row order and the per-key footer stats.
    */
  def saveZOrder(
      df: DataFrame, dir: String, key0: String, key1: String,
      files: Int = 32, bits: Int = 12, relErr: Double = 1e-4): Unit = {
    val buckets = 1 << bits
    val probs = Array.tabulate(buckets - 1)(i => (i + 1).toDouble / buckets)
    // one sketch pass covers both keys (approxQuantile merges per-partition
    // KLL-style summaries — no shuffle, no sort)
    val Array(b0, b1) = df.stat
      .approxQuantile(Array(key0, key1), probs, relErr)
      .map(_.map(_.toLong))
    val stride = buckets - 1
    df.withColumn("__z", graft.gfunctions.z_value2(col(key0), col(key1), b0 ++ b1, stride))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Row groups whose [min, max] contains `v` — what a point predicate
    * on the column must touch (footer-derived, like [[rowGroupRanges]]).
    */
  def touchedBy(ranges: Seq[(Long, Long)], v: Long): Int =
    ranges.count { case (mn, mx) => mn <= v && v <= mx }

  /** Append a batch to a clustered directory. The batch sorts WITHIN
    * itself (its own files stay skippable against each other) but
    * overlaps the resident files' ranges — clustering quality degrades
    * monotonically with every append, exactly like the ANN index's
    * list fragmentation ([[graft.operators.Ivf.appendIndex]]). That is
    * the honest ingest contract: a global re-sort per batch would cost
    * a full-table rewrite each time; instead appends are cheap and
    * [[optimize]] is the periodic maintenance pass that restores the
    * layout (the OPTIMIZE-style compaction discipline of the lakehouse
    * table formats).
    */
  def append(df: DataFrame, dir: String, key: String, files: Int = 4): Unit =
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key)
      .write.mode("append").parquet(dir)

  /** Re-cluster a fragmented directory back to a pristine [[save]]
    * layout (or [[saveZOrder]] when `key1` is given), crash-safely: the
    * rewritten copy lands in a sibling directory first and swaps in
    * with FileSystem renames — a crash mid-optimize leaves either the
    * old or the new directory fully readable, never a truncated one
    * (the [[graft.operators.Ivf.compactIndex]] pattern). Row content is
    * unchanged: optimize is a LAYOUT operation, and the spec pins
    * read-back identity across it.
    */
  def optimize(
      spark: SparkSession, dir: String, key: String,
      key1: Option[String] = None, files: Int = 32): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = dir + ".optimizing"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val live = new Path(dir)
    val old = new Path(dir + ".old")
    // crash triage BEFORE any delete. A crash can land in three states:
    // (a) before the first rename — dir live, maybe stale tmp;
    // (b) BETWEEN the two renames — dir GONE, the original is .old:
    //     restore it first, or this preamble would delete the only
    //     surviving copies;
    // (c) after the swap — dir live (the new copy), stale .old.
    if (!fs.exists(live) && fs.exists(old)) {
      require(fs.rename(old, live),
        s"optimize: could not restore $dir from a crashed prior swap")
    }
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(new Path(tmp))) fs.delete(new Path(tmp), true)
    val rows = spark.read.parquet(dir)
    key1 match {
      case Some(k1) => saveZOrder(rows, tmp, key, k1, files)
      case None => save(rows, tmp, key, files)
    }
    require(fs.rename(new Path(dir), old), s"optimize: could not stage $dir aside")
    require(fs.rename(new Path(tmp), new Path(dir)), s"optimize: could not swap $tmp into place")
    fs.delete(old, true)
  }

  def read(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(dir)

  /** Per-row-group (min, max) statistics of a LONG column across every
    * parquet file under `dir` — the structural evidence data skipping
    * acts on, read straight from the footers (exposed for specs/probes;
    * uses the parquet-hadoop classes Spark ships).
    */
  def rowGroupRanges(
      spark: SparkSession, dir: String, key: String): Seq[(Long, Long)] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .flatMap { st =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        try {
          reader.getFooter.getBlocks.asScala.toSeq.map { block =>
            val colMeta = block.getColumns.asScala
              .find(_.getPath.toDotString == key)
              .getOrElse(throw new IllegalArgumentException(
                s"column $key not found in ${st.getPath}"))
            val stats = colMeta.getStatistics
            (stats.genericGetMin.asInstanceOf[Number].longValue(),
              stats.genericGetMax.asInstanceOf[Number].longValue())
          }
        } finally reader.close()
      }
  }

  /** Count of row-group pairs whose key ranges strictly overlap (shared
    * single boundary values do not count). 0 = perfectly skippable
    * layout: any point/range predicate touches the minimal set of row
    * groups.
    */
  def overlappingPairs(ranges: Seq[(Long, Long)]): Int = {
    // index-pair walk, NOT Seq.combinations — combinations dedups equal
    // elements, and identical whole-domain ranges are exactly the
    // degenerate layout this must count
    val a = ranges.toIndexedSeq
    (for { i <- a.indices; j <- (i + 1) until a.size } yield (i, j)).count { case (i, j) =>
      val (aMin, aMax) = a(i)
      val (bMin, bMax) = a(j)
      aMin < bMax && bMin < aMax
    }
  }
}
