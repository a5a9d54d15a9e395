package graft

/** Benchmark main. Methodology:
  *  - runs through GraftSession so AQE/broadcast/skew tuning is measured;
  *  - one untimed warm-up pass (JIT, codegen cache, FS metadata) so the
  *    first timed query is not charged session start-up;
  *  - deterministic registry order, comparable across rounds;
  *  - three timed passes per query, reporting the MEDIAN per query (and
  *    the min alongside): identical code showed 2.6x per-query swings
  *    between rounds on this shared box, so single or min-of-2 samples
  *    conflate engine capability with scheduler noise — cross-round
  *    comparisons should use `queries` (medians);
  *  - noop-format write as the action: consumes every row and column and
  *    does NOT let the optimizer drop final sorts/projections the way a
  *    bare count() does.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // SPARK_GRAFT_PROD=1 measures production plans (no oracle-mode final
    // sorts); default measures oracle mode for baseline comparability.
    val prodMode = sys.env.get("SPARK_GRAFT_PROD").contains("1")
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")

    def run(q: graft.GraftQuery): Unit = {
      val df = if (prodMode) q.runProd(spark, sfDir) else q.run(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
    }

    // Warm-up: every query once, untimed.
    SparkEntry.registry.foreach { q =>
      try run(q) catch { case _: Throwable => () }
    }

    def timed(q: graft.GraftQuery): Double = {
      val t0 = System.nanoTime()
      try run(q) catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.registry.map { q =>
      val samples = Seq(timed(q), timed(q), timed(q)).sorted
      q.name -> ((samples(1), samples(0))) // (median, min)
    }
    def obj(f: ((Double, Double)) => Double) = results
      .map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val qsMedian = obj(_._1)
    val qsMin = obj(_._2)
    val total = results.map(_._2._1).sum
    val totalMin = results.map(_._2._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsMedian,"queries_min":$qsMin,"total_min":$totalMin,"sf":"$sfDir"}""")
    spark.stop()
  }
}
