package graft

/** Dev-only (the DumpNames class of tool): print the prod shuffle-write
  * bytes of named registry queries at a given sf dir — the measurement
  * ByteBudgetSpec's calibration table rows come from, runnable for a
  * FEW names without re-measuring the whole table. Shares the spec's
  * exact attribution mechanics via [[ShuffleAttribution]] (one
  * rendering — a printed row here is a valid table row there).
  *
  * Usage: runMain graft.MeasureBytes <sfDir> <name> [<name> ...]
  */
object MeasureBytes {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.build("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      val bytes = ShuffleAttribution.measure(spark, s"measure-$name") {
        q.runProd(spark, sf).write.format("noop").mode("overwrite").save()
      }
      println(s"""[measure] ("$name", ${bytes}L, ${bytes * 3}L),""")
    }
    spark.stop()
  }
}
