package graft

import org.apache.spark.sql.functions._

/** Dev probe (r21): same-JVM A/B of curateDecontam's contamination-rung
  * composition — the r20 sequential gate→anti-join→gate chain vs the
  * r21 single tagged-union job — so the comparison dodges the box's
  * ±30-60% cross-run wall drift.
  */
object ScaleProbe44 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import operators.Curate

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe44] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, d)

    // The r20 sequential composition, reproduced verbatim from the gates
    def sequential(): Unit = {
      val staged = Curate.stageTable(docs).localCheckpoint()
      val bench = staged.filter(col("doc_id") % 20 === 0)
      val corpus = staged.filter(col("doc_id") % 20 =!= 0)
      val gated = Curate.gatedOf(corpus, "en", 5)
      val contam = Curate.contamGate(gated, bench).localCheckpoint()
      val gated2 = gated.join(contam, Seq("doc_id"), "left_anti")
      val contamFuzzy = Curate.contamFuzzyGate(gated2, bench).localCheckpoint()
      val gated3 = gated2.join(contamFuzzy, Seq("doc_id"), "left_anti")
      val contamSem = Curate.contamSemGate(gated3, bench).localCheckpoint()
      val gated4 = gated3.join(contamSem, Seq("doc_id"), "left_anti")
      val exactMap = Curate.exactGate(gated4).localCheckpoint()
      val reps = Curate.repsOf(gated4, exactMap)
      noop(Curate.verdicts(corpus, exactMap,
        Curate.attach(exactMap, Curate.nearGate(reps, portableHash = true)),
        Curate.attach(exactMap, Curate.famGate(reps)),
        "en", 5, contam = Some(contam), contamFuzzy = Some(contamFuzzy),
        contamSem = Some(contamSem)))
    }

    def current(): Unit = noop(Curate.curateDecontam(docs))

    // warm both
    sequential(); current()
    (1 to 3).foreach { i =>
      t(s"sequential r20 #$i")(sequential())
      t(s"parallel   r21 #$i")(current())
    }
    spark.stop()
  }
}
