package graft
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Manual stage-cost probe for the md5-minhash pipeline at sf0.1 —
  * isolates which stage carries the wall time.
  */
object ScaleProbe6 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe6] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def bound(c: Column)(f: Column => Column): Column =
      element_at(transform(array(c), v => f(v)), 1)
    val toks = filter(split(col("text"), "\\s+"), x => x =!= lit(""))
    val sh = bound(toks) { t =>
      when(size(t) >= 3,
        transform(sequence(lit(0), size(t) - 3),
          i => concat_ws(" ", slice(t, i + lit(1), lit(3)))))
        .otherwise(array().cast("array<string>"))
    }
    time("tokenize+shingle only")(noop(docs.select(col("doc_id"), size(sh).as("n"))))
    time("one md5 per shingle")(noop(docs.select(col("doc_id"),
      size(filter(transform(sh, s => md5(s)), m => m.isNotNull)).as("n"))))
    time("sig fold (k=16 double-hash)")(noop(docs.select(col("doc_id"),
      bound(sh) { shb =>
        aggregate(shb, array_repeat(lit(Long.MaxValue), 16),
          (acc, s) => bound(md5(s)) { m =>
            val h1 = conv(substring(m, 1, 15), 16, 10).cast("long")
            val h2 = conv(substring(m, 16, 8), 16, 10).cast("long")
            zip_with(acc,
              transform(sequence(lit(0), lit(15)), j => h1 + j.cast("long") * h2),
              (a, h) => least(a, h))
          })
      }.as("sig"))))
    time("full minhashMd5Decisions")(noop(Dedup.minhashMd5Decisions(docs)))
    spark.stop()
  }
}
