package graft

/** Dev-only (the MeasureBytes class of tool): time NAMED registry
  * queries with the exact Bench methodology — warm pass per mode,
  * three interleaved samples, median+min, plus the bit-stable
  * per-mode shuffle-write bytes — without paying for the whole
  * 182-key registry. Iterating on one operator re-measures in
  * seconds instead of the ~47-minute full bench.
  *
  * Usage: runMain graft.FocusedBench <sfDir> <name> [<name> ...]
  * Env:   SPARK_GRAFT_CPUS (default 32 to match the driver's bench).
  */
object FocusedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run(q: GraftQuery, prod: Boolean): Unit = {
      val df = if (prod) q.runProd(spark, sfDir) else q.run(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
    }
    def timed(q: GraftQuery, prod: Boolean): Double = {
      val t0 = System.nanoTime()
      run(q, prod)
      (System.nanoTime() - t0) / 1e9
    }
    def med(s: Seq[Double]): Double = s.sorted.apply(s.size / 2)

    names.foreach { name =>
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(s"focused-$name")
      run(q, prod = false); run(q, prod = true) // warm-up, untimed
      val bo = ShuffleAttribution.measure(spark, s"fb-o-$name")(run(q, prod = false))
      val bp = ShuffleAttribution.measure(spark, s"fb-p-$name")(run(q, prod = true))
      val samples = (1 to 3).map { i =>
        if (i % 2 == 1) { val o = timed(q, false); val p = timed(q, true); (o, p) }
        else { val p = timed(q, true); val o = timed(q, false); (o, p) }
      }
      println(f"[focused] $name%-28s oracle ${med(samples.map(_._1))}%7.2f s  " +
        f"prod ${med(samples.map(_._2))}%7.2f s  shW_o $bo%12d  shW_p $bp%12d")
    }
    spark.stop()
  }
}
