package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): q60 split-leakage
  * on a 400k-doc corpus (~21M window rows) with planted cross-split
  * quoters — every doc gets 60 globally-unique tokens, then ~2% of the
  * eval-split docs are rewritten as a unique prefix token + a TRAIN
  * doc's full text (so 53 of their 54 8-token windows exist verbatim in
  * the train split). Asserts exact planted recall: every quoter flagged,
  * every untouched eval doc clean, and prints the wall time for the
  * full operator (tokenize+digest pass, train inverted index, eval
  * join-back).
  */
object ScaleProbe13 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val n = 400000L
    // the q52 split rule (TrainPrep.splitOf is private; same expression)
    val hv = conv(substring(md5(concat(lit("spl:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val split = when(hv < (1L << 52) / 10 * 8, "train")
      .when(hv < (1L << 52) / 10 * 9, "val")
      .otherwise("test")

    val base = spark.range(0, n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(59)),
        i => concat(lit("t"), (col("id") * 60 + i).cast("string")))).as("text"))
      .withColumn("split", split)

    // pair the i-th sampled eval doc with the i-th sampled train doc
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val evalSample = base.filter(col("split") =!= "train" && col("doc_id") % 23 === 0)
      .select(col("doc_id"), row_number().over(w).as("k"))
    val trainSample = base.filter(col("split") === "train" && col("doc_id") % 31 === 0)
      .select(col("text").as("train_text"), row_number().over(w).as("k"))
    val quoters = evalSample.join(trainSample, "k")
      .select(col("doc_id"), concat(lit("q"), col("doc_id").cast("string"), lit(" "), col("train_text")).as("qtext"))

    val dir = "/tmp/graft-probe13"
    base.join(quoters, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("qtext"), col("text")).as("text"),
        lit("en").as("lang"),
        lit("src").as("source"),
        length(coalesce(col("qtext"), col("text"))).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = quoters.select("doc_id").collect().map(_.getLong(0)).toSet
    println(s"[probe13] corpus $n docs, ${planted.size} planted cross-split quoters")

    val t0 = System.nanoTime()
    val out = operators.TrainPrep.q60.runProd(spark, dir)
      .select("doc_id", "leaked").collect()
    println(f"[probe13] q60 over $n docs (~21M window rows): ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val flagged = out.filter(_.getLong(1) == 1L).map(_.getLong(0)).toSet
    assert(flagged == planted,
      s"recall/precision miss: ${(planted -- flagged).size} missed, ${(flagged -- planted).size} spurious")
    println(s"[probe13] exact planted recall: ${flagged.size}/${planted.size} flagged, zero spurious")
    spark.stop()
  }
}
