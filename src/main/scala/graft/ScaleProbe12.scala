package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): the q55 forward-
  * neighbor lookup on a mega-span user — ONE user whose hour spine is a
  * single window partition, the adversarial shape for resampling (a
  * user with events spanning the whole corpus history). Two plans for
  * the same "first non-null at or after this hour" semantics:
  *
  *  - quadratic: first(ignoreNulls) over (currentRow,
  *    unboundedFollowing) — Spark's UnboundedFollowingWindowFunctionFrame
  *    re-scans to the partition end per output row, O(rows²);
  *  - linear: last(ignoreNulls) over a running frame on DESCENDING hour
  *    (the shipped q55 plan post-fix), one O(n) pass.
  *
  * Prints both at two sizes so the growth law is visible (quadratic
  * ~4x per doubling, linear ~2x), runs the linear plan at 600k rows to
  * show the mega-user survives, and asserts checksum equality.
  */
object ScaleProbe12 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    // One user, dense hour spine 0..n-1, an observation every 1000 hours.
    def spine(n: Long) = spark.range(0, n).select(
      lit(1L).as("user_id"),
      col("id").as("hour"),
      when(col("id") % 1000 === 0, col("id").cast("double")).as("obs_value"))
      .localCheckpoint()

    def time(tag: String)(f: => Long): Long = {
      var out = 0L
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        out = f
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"[probe12] $tag: ${runs(1)}%.2f s (median of 3)")
      out
    }

    val quadW = Window.partitionBy("user_id").orderBy(col("hour").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val linW = Window.partitionBy("user_id").orderBy(col("hour").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def quad(df: org.apache.spark.sql.DataFrame): Long = df
      .withColumn("nv", first(col("obs_value"), ignoreNulls = true).over(quadW))
      .agg(sum(expr("CAST(nv AS BIGINT) * (hour + 1)"))).collect()(0).getLong(0)
    def lin(df: org.apache.spark.sql.DataFrame): Long = df
      .withColumn("nv", last(col("obs_value"), ignoreNulls = true).over(linW))
      .agg(sum(expr("CAST(nv AS BIGINT) * (hour + 1)"))).collect()(0).getLong(0)

    for (n <- Seq(30000L, 60000L)) {
      val df = spine(n)
      val q = time(s"quadratic UNBOUNDED FOLLOWING frame, $n-row user")(quad(df))
      val l = time(s"linear desc running frame,          $n-row user")(lin(df))
      assert(q == l, s"plans disagree at n=$n: $q vs $l")
    }
    val mega = spine(600000L)
    time("linear desc running frame,          600k-row mega-user")(lin(mega))
    println("[probe12] plans agree; linear survives the mega-span user")
    spark.stop()
  }
}
