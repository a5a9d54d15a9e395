package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): native kernel vs
  * declarative-fold cost for the per-row dedup signatures, isolated from
  * banding/joins — the evidence behind the MinhashSig/SimHash64/WsTokens
  * scaladoc claims. 102k docs of ~100 tokens (the ScaleProbe corpus
  * shape); each stage is forced with a cheap aggregate so only the
  * signature projection is measured.
  */
object ScaleProbe8 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def block(tag: org.apache.spark.sql.Column, n: Int) =
      concat_ws(" ", transform(sequence(lit(0), lit(n - 1)),
        t => concat(tag, lit("_"), t)))
    val docs = spark.range(0, 102000).select(
      col("id").as("doc_id"),
      block(concat(lit("u"), col("id") % 5000), 100).as("text"))
      .localCheckpoint()

    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // one warm pass, then median of 3
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        df.agg(count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"[probe8] $tag: ${runs(1)}%.2f s (median of 3)")
    }

    // tokenization
    val declTokCol = filter(split(col("text"), "\\s+"), x => x =!= lit(""))
    time("tokenize declarative (split+filter)")(
      docs.select(size(declTokCol).as("n")).filter(col("n") >= 0))
    time("tokenize native (ws_tokens)")(
      docs.select(size(gfunctions.ws_tokens(col("text"))).as("n")).filter(col("n") >= 0))

    val toked = docs.select(col("doc_id"), gfunctions.ws_tokens(col("text")).as("toks"))
      .localCheckpoint()

    // minhash signature fold (k=16, 3-shingles) — the declarative
    // formulation inlined verbatim from the pre-kernel Dedup/TextAnalysis
    def bound(arr: org.apache.spark.sql.Column)(
        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      element_at(transform(array(arr), v => f(v)), 1)
    val k = 16
    val sh3 = bound(col("toks")) { t =>
      when(size(t) >= 3,
        transform(sequence(lit(0), size(t) - 3),
          i => concat_ws(" ", slice(t, i + lit(1), lit(3)))))
        .otherwise(array().cast("array<string>"))
    }
    val declSig = bound(sh3) { s =>
      when(size(s) === 0, array_repeat(lit(null).cast("long"), k))
        .otherwise(aggregate(
          s,
          array_repeat(lit(Long.MaxValue), k),
          (acc, x) => zip_with(
            acc,
            transform(sequence(lit(0), lit(k - 1)), i => xxhash64(i, x)),
            (a, h) => least(a, h))))
    }
    time("minhash sig declarative fold")(
      toked.select(element_at(declSig, 1).as("m")).filter(col("m").isNotNull))
    time("minhash sig native (minhash_sig)")(
      toked.select(element_at(gfunctions.minhash_sig(col("toks"), k), 1).as("m"))
        .filter(col("m").isNotNull))

    // simhash: explode + 64-column agg vs per-row kernel
    val tok = toked.select(col("doc_id"), explode(col("toks")).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j")
    }
    time("simhash explode + 64-col hash-agg")(
      tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*))
    time("simhash native (simhash64)")(
      toked.select(gfunctions.simhash64(col("toks")).as("sh")).filter(col("sh").isNotNull))

    // jaccard set build
    time("shingle sets declarative (distinct+transform)")(
      toked.select(size(array_distinct(transform(sh3, s => xxhash64(s)))).as("n"))
        .filter(col("n") >= 0))
    time("shingle sets native (shingle_hashes)")(
      toked.select(size(gfunctions.shingle_hashes(col("toks"))).as("n"))
        .filter(col("n") >= 0))

    println("[probe8] OK")
    spark.stop()
  }
}
