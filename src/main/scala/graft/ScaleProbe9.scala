package graft
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the bloom-prefilter
  * decontamination (q44) against the two exact-join alternatives, at a
  * benchmark-set size where the choice matters.
  *
  * Shape: 25k bench docs x 80 unique tokens -> ~2.0M distinct benchmark
  * shingles (a real eval-suite scale); 400k corpus docs (~15.5M shingle
  * rows), 1% quoting a full bench passage. Three plans, identical output:
  *   (a) broadcast exact join — q38's shape, needs the whole bench hash
  *       set under the broadcast threshold;
  *   (b) shuffle (merge) exact join — the forced shape once the bench set
  *       outgrows broadcast: the ENTIRE corpus shingle stream shuffles;
  *   (c) bloom prefilter + shuffle confirm (q44's shape) — the corpus
  *       stream is cut to survivors before any exchange.
  * The probe prints wall times, the survivor-stream size, and asserts all
  * three flag the same contaminated docs.
  */
object ScaleProbe9 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def block(tag: Column, n: Int): Column =
      concat_ws(" ", transform(sequence(lit(0), lit(n - 1)),
        t => concat(tag, lit("_"), t)))

    val bench = spark.range(0, 25000).select(
      col("id").as("doc_id"),
      block(concat(lit("b"), col("id")), 80).as("text"))
      .localCheckpoint()
    val corpus = spark.range(0, 400000).select(
      col("id").as("doc_id"),
      when(col("id") % 100 === 0, block(concat(lit("b"), col("id") % 25000), 80))
        .otherwise(block(concat(lit("c"), col("id") % 50000), 40)).as("text"))
      .localCheckpoint()

    val sh = (c: Column) => gfunctions.shingle_md5_hashes(gfunctions.ws_tokens(c))
    val benchSet = bench.select(explode(sh(col("text"))).as("hash")).distinct()
      .localCheckpoint()
    val corpusSh = corpus.select(col("doc_id"), explode(sh(col("text"))).as("hash"))
    println(s"[probe9] bench shingles: ${benchSet.count()}")

    def contaminated(pairs: DataFrame): Long =
      pairs.select("doc_id").distinct().count()

    def time(tag: String)(f: => Long): Long = {
      var last = 0L
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        last = f
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"[probe9] $tag: ${runs(1)}%.2f s (median of 3), flagged=$last")
      last
    }

    // (a) broadcast exact join — viable only while the bench set fits
    val a = time("exact broadcast join") {
      contaminated(corpusSh.join(broadcast(benchSet), Seq("hash"), "leftsemi"))
    }
    // (b) shuffle exact join — what (a) becomes past the threshold: the
    // full 15.5M-row corpus shingle stream through the exchange
    val b = time("exact shuffle (merge) join") {
      contaminated(corpusSh.hint("merge").join(benchSet.hint("merge"), Seq("hash"), "leftsemi"))
    }
    // (c) q44's shape: bloom cuts the stream BEFORE the exchange. The
    // bloom is embedded as a LITERAL (one object per task) — the earlier
    // in-plan 1-row-crossJoin draft re-copied the 4 MB blob out of the
    // join row on EVERY probe (UnsafeRow.getBinary allocates) and did not
    // finish this probe's 15.5M-row pass in 15 minutes; the literal form
    // finishes in seconds. That finding is why bloomDecontam collects.
    val bits = 1L << 25 // ~16.8 bits/key at 2M keys -> FPR ~7e-4
    val k = 6
    val t0 = System.nanoTime()
    val bloomBytes = benchSet.agg(gfunctions.bloom_agg(col("hash"), bits, k).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    println(f"[probe9] bloom build (2^25 bits, k=6): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val survivors = corpusSh
      .filter(gfunctions.bloom_contains(lit(bloomBytes), col("hash"), k))
      .select("doc_id", "hash")
    println(s"[probe9] corpus shingle rows: ${corpusSh.count()}; bloom survivors: ${survivors.count()}")
    val c = time("bloom prefilter + shuffle confirm") {
      contaminated(survivors.hint("merge").join(benchSet.hint("merge"), Seq("hash"), "leftsemi"))
    }

    assert(a == b && b == c, s"plans disagree: $a / $b / $c")
    println(s"[probe9] all plans agree: $a contaminated docs")
    spark.stop()
  }
}
