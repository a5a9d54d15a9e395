package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): native Misra-Gries
  * heavy-hitters vs the exact groupBy-count over an UNBOUNDED key domain
  * — per-doc 3-shingles, where the exact plan's map-side hash state and
  * exchange are domain-sized while the sketch holds k counters total.
  *
  * Shape: 200k docs x 60 tokens; 60% repeat one boilerplate passage (its
  * 58 shingles are the planted heavy hitters — a shingle's stream share
  * is at most 1/58, so heaviness demands a passage most docs carry and
  * k > 58/0.6), 40% draw from per-doc-unique token space (~4.6M distinct
  * noise keys). Both plans must surface exactly the boilerplate shingles
  * above the n/(k+1) threshold.
  */
object ScaleProbe10 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def block(tag: org.apache.spark.sql.Column, n: Int) =
      concat_ws(" ", transform(sequence(lit(0), lit(n - 1)),
        t => concat(tag, lit("_"), t)))
    val docs = spark.range(0, 200000).select(
      col("id").as("doc_id"),
      when(col("id") % 5 < 3, block(lit("boiler"), 60))
        .otherwise(block(concat(lit("u"), col("id")), 60)).as("text"))
      .localCheckpoint()

    // the shingle stream both plans consume: 200k x 58 = 11.6M rows
    val shingles = docs.select(
      explode(operators.TextAnalysis.shingles(gfunctions.ws_tokens(col("text")), 3))
        .as("shingle"))

    def time[A](tag: String)(f: => A): A = {
      var out: Option[A] = None
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        out = Some(f)
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"[probe10] $tag: ${runs(1)}%.2f s (median of 3)")
      out.get
    }

    val k = 128
    // exact: full domain-sized aggregate, then threshold
    val exact = time("exact groupBy-count over the full domain") {
      val total = shingles.count()
      shingles.groupBy("shingle").agg(count(lit(1)).as("n"))
        .filter(col("n") * (k + 1) > total)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // sketch: k counters total, then exact recount of <= k candidates
    val sketched = time("heavy_hitters sketch + candidate recount") {
      val cand = shingles
        .agg(gfunctions.heavy_hitters(col("shingle"), k).as("hh"))
        .select(explode(col("hh")).as("c")).select(col("c.token").as("shingle"))
      val total = shingles.count()
      shingles.join(broadcast(cand), Seq("shingle"), "leftsemi")
        .groupBy("shingle").agg(count(lit(1)).as("n"))
        .filter(col("n") * (k + 1) > total)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(exact == sketched, s"plans disagree: ${exact.size} vs ${sketched.size}")
    assert(exact.size == 58, s"expected the 58 boilerplate windows, got ${exact.size}")
    println(s"[probe10] plans agree: ${exact.size} heavy shingles")
    println(s"[probe10] distinct shingles: ${shingles.distinct().count()}")
    spark.stop()
  }
}
