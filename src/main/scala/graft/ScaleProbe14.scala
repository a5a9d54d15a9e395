package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the trailing-24h
  * rolling aggregate on a mega-span user — one user, events 1 s apart,
  * so every frame spans up to 86,400 rows. Two plans for the same
  * semantics:
  *
  *  - sliding RANGE frame (q67's oracle form): Spark re-aggregates the
  *    ENTIRE frame every time the bounds move (no retraction) —
  *    O(rows × frame_width); the first draft of this probe at 300k
  *    rows did not finish in 10 minutes;
  *  - prefix sums + probe-row carry (q67's prod form,
  *    rolling24hProd): three O(n) passes over one user exchange.
  *
  * Prints both at two sizes (quadratic-family vs flat growth), runs the
  * prod shape at 600k to show the mega-user survives, and asserts
  * checksum equality.
  */
object ScaleProbe14 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    def mk(n: Long) = spark.range(0, n).select(
      col("id").as("event_id"),
      lit(1L).as("user_id"),
      (col("id") * 1000L).as("ts_ms"),
      (col("id") % 97).cast("double").as("value"))
      .localCheckpoint()

    def time(tag: String)(f: => Long): Long = {
      var out = 0L
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        out = f
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"[probe14] $tag: ${runs(1)}%.2f s (median of 3)")
      out
    }

    val slideW = Window.partitionBy("user_id").orderBy(col("ts_ms"))
      .rangeBetween(-86399999L, Window.currentRow)
    def sliding(df: org.apache.spark.sql.DataFrame): Long = df
      .select(count(lit(1)).over(slideW).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)

    val prefW = Window.partitionBy("user_id").orderBy(col("ts_ms"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val carryW = Window.partitionBy("user_id").orderBy(col("t"), col("kind"), col("pc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def prefixProbe(df: org.apache.spark.sql.DataFrame): Long = {
      val pref = df.withColumn("pc", count(lit(1)).over(prefW))
      val data = pref.select(col("user_id"), col("ts_ms").as("t"), lit(0).as("kind"),
        col("pc"), lit(null).cast("long").as("own_pc"))
      val probes = pref.select(col("user_id"), (col("ts_ms") - 86400000L).as("t"), lit(1).as("kind"),
        lit(null).cast("long").as("pc"), col("pc").as("own_pc"))
      data.unionByName(probes)
        .withColumn("cpc", last(col("pc"), ignoreNulls = true).over(carryW))
        .filter(col("kind") === 1)
        .select((col("own_pc") - coalesce(col("cpc"), lit(0L))).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
    }

    for (n <- Seq(30000L, 60000L)) {
      val df = mk(n)
      val a = time(f"sliding RANGE frame,    $n%,d-row single-user partition")(sliding(df))
      val b = time(f"prefix+probe carry,     $n%,d-row single-user partition")(prefixProbe(df))
      assert(a == b, s"plans disagree at n=$n: $a vs $b")
    }
    time("prefix+probe carry,     600,000-row mega-user")(prefixProbe(mk(600000L)))
    println("[probe14] sliding frame re-aggregates per row (O(n*width)); prefix+probe stays linear")
    spark.stop()
  }
}
