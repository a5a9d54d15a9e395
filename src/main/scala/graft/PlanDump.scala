package graft

/** Dev-only: write `explain("formatted")` for named registry queries to
  * files — the round's plan evidence (plans/rNN/<name>_<tag>.txt). Both
  * modes land in one file: the PRODUCTION plan first (the 100 TB
  * shape), then the oracle-mode plan (what the driver's value column
  * times, global sorts included).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <name> [...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      def fmt(prod: Boolean): String = {
        val df = if (prod) q.runProd(spark, sfDir) else q.run(spark, sfDir)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      }
      val body = s"== $name ($tag) — PRODUCTION plan ==\n\n" + fmt(true) +
        (if (q.prod.isDefined)
           s"\n\n== $name ($tag) — ORACLE-MODE plan (adds the deterministic-compare sort) ==\n\n" + fmt(false)
         else "\n\n(oracle mode identical: no separate prod plan defined)\n")
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${name}_$tag.txt")
    }
    spark.stop()
  }
}
