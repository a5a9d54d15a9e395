package graft

import org.apache.spark.sql.functions._

/** Dev probe (r21): decompose q110_contam_trend's wall — time the
  * stage-table checkpoints and each rung leg in isolation at sf0.1 so
  * the optimization targets the measured hot leg, not a guess.
  */
object ScaleProbe42 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import operators.{Dedup, Snapshot, TrainPrep}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe42] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm
    noop(TrainPrep.q110.runProd(spark, d))

    val docs = Tables.documents(spark, d)
    val toks = graft.gfunctions.ws_tokens(col("text"))
    val isBench = col("doc_id") % 20 === 0
    val toked = t("toked checkpoint") {
      docs.select(col("doc_id"), toks.as("toks")).localCheckpoint()
    }
    val benchT = toked.filter(isBench)
    val curT = toked.filter(!isBench)
    val deltaT = t("deltaT checkpoint") {
      Snapshot.nextSnapshotDeltaDocsOn(docs)
        .filter(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"), toks.as("toks")).localCheckpoint()
    }
    val benchKg = benchT.select(col("doc_id").as("bench_id"),
      explode(gfunctions.kgram_md5_hashes(col("toks"), 8)).as("hash"))
    val benchEmb = Dedup.textEmbedMd5From(benchT)
    def exactPairs(c: org.apache.spark.sql.DataFrame) = c
      .select(col("doc_id"), explode(gfunctions.kgram_md5_hashes(col("toks"), 8)).as("hash"))
      .join(broadcast(benchKg), Seq("hash"))
      .select("bench_id", "doc_id").distinct()
    def fuzzyPairs(c: org.apache.spark.sql.DataFrame) =
      Dedup.nearDupPairsAgainstT(c, benchT)
        .select(col("ref_id").as("bench_id"), col("doc_id"))
    def semPairs(c: org.apache.spark.sql.DataFrame) =
      TrainPrep.semContamPairsOn(Dedup.textEmbedMd5From(c), benchEmb)
        .filter(col("sim") >= 0.80).select("bench_id", "doc_id")

    t("exact cur leg")(noop(exactPairs(curT).groupBy("bench_id").count()))
    t("exact delta leg")(noop(exactPairs(deltaT).groupBy("bench_id").count()))
    t("fuzzy cur leg")(noop(fuzzyPairs(curT).groupBy("bench_id").count()))
    t("fuzzy delta leg")(noop(fuzzyPairs(deltaT).groupBy("bench_id").count()))
    t("sem cur leg")(noop(semPairs(curT).groupBy("bench_id").count()))
    t("sem delta leg")(noop(semPairs(deltaT).groupBy("bench_id").count()))
    t("full q110 prod")(noop(TrainPrep.q110.runProd(spark, d)))
    t("full q107 prod")(noop(TrainPrep.q107.runProd(spark, d)))
    spark.stop()
  }
}
