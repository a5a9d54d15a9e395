package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev-only (the DumpNames class of tool): print the prod shuffle-write
  * bytes of named registry queries at a given sf dir — the measurement
  * ByteBudgetSpec's calibration table rows come from, runnable for a
  * FEW names without re-measuring the whole table. Same attribution
  * discipline as the spec: a unique job group per query, stage ids
  * collected from onJobStart, bytes summed only for those stages.
  *
  * Usage: runMain graft.MeasureBytes <sfDir> <name> [<name> ...]
  */
object MeasureBytes {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.build("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    names.foreach { name =>
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      val group = s"measure-$name-${java.util.UUID.randomUUID()}"
      val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val bytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          if (Option(j.properties).exists(_.getProperty("spark.jobGroup.id") == group)) {
            j.stageIds.foreach(stages.add(_))
            ()
          }
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
          if (stages.contains(s.stageInfo.stageId)) {
            val m = s.stageInfo.taskMetrics
            if (m != null) { bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
          }
      }
      sc.addSparkListener(listener)
      try {
        sc.setJobGroup(group, s"measure: $name", interruptOnCancel = false)
        try q.runProd(spark, sf).write.format("noop").mode("overwrite").save()
        finally sc.clearJobGroup()
        org.apache.spark.graft.ListenerSync.drain(sc)
        println(s"""[measure] ("$name", ${bytes.get}L, ${bytes.get * 3}L),""")
      } finally sc.removeSparkListener(listener)
    }
    spark.stop()
  }
}
