package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): q50's two decile
  * plans on the adversarial input — ONE language stratum of 2M docs, so
  * the oracle-form ntile window funnels every row through a single
  * partition's sort while the rank-from-counts production form never
  * sees a window wider than a (lang, score) tie group or the per-lang
  * count summary. Prints both wall times and asserts bucket-for-bucket
  * equality.
  */
object ScaleProbe11 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    // 2M docs, one language; scores collide heavily (500 distinct values)
    // so tie-group windows stay wide enough to matter
    val docs = spark.range(0, 2000000).select(
      col("id").as("doc_id"),
      lit("en").as("lang"),
      (col("id") % 500).as("n_tokens"))
      .localCheckpoint()

    def time[A](tag: String)(f: => A): A = {
      var out: Option[A] = None
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        out = Some(f)
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"[probe11] $tag: ${runs(1)}%.2f s (median of 3)")
      out.get
    }

    val wNtile = Window.partitionBy("lang").orderBy(col("n_tokens"), col("doc_id"))
    val oracleSum = time("oracle ntile (one-partition window sort)") {
      docs.withColumn("decile", ntile(10).over(wNtile).cast("long"))
        .agg(sum(expr("doc_id * decile"))).collect()(0).getLong(0)
    }

    val prodSum = time("prod rank-from-counts (summary + tie-group windows)") {
      val counts = docs.groupBy("lang", "n_tokens").agg(count(lit(1)).as("c"))
      val wBase = Window.partitionBy("lang").orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bases = counts
        .withColumn("rank_base", coalesce(sum("c").over(wBase), lit(0L)))
        .select("lang", "n_tokens", "rank_base")
      val totals = counts.groupBy("lang").agg(sum("c").as("n"))
      val wTie = Window.partitionBy("lang", "n_tokens").orderBy("doc_id")
      docs
        .join(bases, Seq("lang", "n_tokens"))
        .join(broadcast(totals), Seq("lang"))
        .withColumn("r", col("rank_base") + row_number().over(wTie))
        .withColumn("decile", expr(
          """CASE WHEN r <= (n % 10) * (n DIV 10 + 1)
            |     THEN (r + (n DIV 10)) DIV (n DIV 10 + 1)
            |     ELSE (n % 10) + ((r - (n % 10) * (n DIV 10 + 1) + (n DIV 10) - 1) DIV (n DIV 10))
            |END""".stripMargin).cast("long"))
        .agg(sum(expr("doc_id * decile"))).collect()(0).getLong(0)
    }

    assert(oracleSum == prodSum, s"plans disagree: $oracleSum vs $prodSum")
    println(s"[probe11] plans agree (checksum $oracleSum)")
    spark.stop()
  }
}
