package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs. */
object TestSession {
  lazy val spark: SparkSession = GraftSession.local(4)
}

class QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = TestSession.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQLs use the explicit ws class, never RE2 \\s (r16 review)") {
    // ws_tokens (and Java \s patterns) take \x0B as whitespace;
    // DuckDB's RE2 \s does NOT (measured) — so ANY oracle regex
    // leaning on \s (split, replace-count, negated classes like the
    // BPE piece pattern or the URL matcher) silently diverges from its
    // Spark twin on a corpus containing a vertical tab. The harmonized
    // law is the explicit [ \t\n\x0b\f\r] class; this audit bans \s
    // outright from every registered oracle.
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("""\s""") => name
    }
    assert(offenders.isEmpty, s"oracles still using RE2 \\s: $offenders")
    val users = SparkEntry.oracleSql.count(_._2.contains("""[ \t\n\x0b\f\r]"""))
    assert(users >= 25, s"expected the tokenizing oracles to carry the explicit class, found $users")
  }

  test("every registered query runs and returns rows at sf0.001") {
    val failures = SparkEntry.registry.flatMap { q =>
      try {
        val n = q.run(spark, sf).count()
        if (n > 0) None else Some(s"${q.name}: 0 rows")
      } catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q01 aggregates match hand-computed values") {
    val row = operators.RelationalCore.q01.run(spark, sf).collect().head
    // l_returnflag/l_linestatus sorted: first group is ("A", "F")
    assert(row.getString(0) == "A")
    assert(row.getLong(row.fieldIndex("count_order")) > 0)
    assert(row.getDouble(row.fieldIndex("sum_qty")) > 0)
  }

  test("q07 top-n never exceeds 3 per customer") {
    val df = operators.RelationalCore.q07.run(spark, sf)
    val mx = df.groupBy("o_custkey").count().agg(org.apache.spark.sql.functions.max("count")).collect()(0).getLong(0)
    assert(mx <= 3)
  }

  test("approx-distinct sketch stays within 5% of the exact count") {
    operators.RelationalCore.qSketch.run(spark, sf).collect().foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_parts")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_parts")).toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"sketch error too large: $approx vs $exact")
    }
  }

  test("sketch_approx_distinct pre-aggregated shape equals the direct mixed aggregate (r20)") {
    // The r20 rewrite pre-aggregates by (flag, partkey) before the
    // sketch (no Expand, narrow exchange); HLL register updates are
    // idempotent per value, so the estimate — not just the exact
    // columns — must be IDENTICAL to the direct mixed aggregate.
    import org.apache.spark.sql.functions._
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect().toSeq.map(_.toSeq)
    val pre = operators.RelationalCore.qSketch.run(spark, sf).collect().toSeq.map(_.toSeq)
    assert(pre == direct,
      "pre-aggregated sketch shape must reproduce the direct aggregate bit-for-bit")
  }

  test("approx-quantile sketch median stays within 2% of the exact percentile") {
    operators.RelationalCore.qSketchQuantile.run(spark, sf).collect().foreach { r =>
      val approx = r.getDouble(r.fieldIndex("approx_p50"))
      val exact = r.getDouble(r.fieldIndex("exact_p50"))
      assert(math.abs(approx - exact) / exact < 0.02,
        s"quantile sketch error too large: $approx vs $exact")
      assert(r.getDouble(r.fieldIndex("approx_p95")) >= approx, "p95 >= p50")
    }
  }

  test("q07 prod variant (bounded-heap top-k) matches the window result") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("o_custkey")), r.getLong(r.fieldIndex("o_orderkey")),
        r.getDouble(r.fieldIndex("o_totalprice")), r.getInt(r.fieldIndex("rn")))).toSet
    assert(rows(operators.RelationalCore.q07.run(spark, sf)) ==
      rows(operators.RelationalCore.q07.runProd(spark, sf)))
  }

  test("q25 skew-safe production plan is exactly equivalent to the oracle plan") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(r.fieldIndex("duration_sec")), r.getDouble(r.fieldIndex("avg_value")))).toSet
    val oracle = rows(operators.ScrapeEtl.q25.run(spark, sf))
    val skewSafe = rows(operators.ScrapeEtl.q25.runProd(spark, sf))
    assert(oracle == skewSafe,
      "two-phase (user,day)-salted sessionization must reproduce the single-window sessions bit-for-bit")
  }

  test("q25 sessionize: session ids start at 1 and events are conserved") {
    val df = operators.ScrapeEtl.q25.run(spark, sf)
    import org.apache.spark.sql.functions._
    val total = df.agg(sum("n_events")).collect()(0).getLong(0)
    val raw = operators.Events.withEventTime(spark, sf).count()
    assert(total == raw)
    assert(df.agg(min("session_id")).collect()(0).getLong(0) == 1L)
  }

  test("q28 html extract: typed fields round-trip through the rendered page") {
    import org.apache.spark.sql.functions._
    val df = operators.ScrapeEtl.q28.run(spark, sf).cache()
    try {
      val part = Tables.part(spark, sf)
      // extracted name/detail must equal the source columns they were
      // rendered from; price is the reference's Rp-string parse inverted
      val joined = df.join(part, "p_partkey")
      assert(joined.filter(col("name") =!= col("p_name")).count() == 0)
      assert(joined.filter(col("detail") =!= col("p_type")).count() == 0)
      assert(joined.filter(col("price") =!=
        floor(col("p_retailprice") * 1000).cast("long")).count() == 0)
      // optional fields: present iff p_size % 4 == 0, null otherwise
      assert(joined.filter(col("p_size") % 4 === 0 &&
        (col("originalprice").isNull || col("discountpercentage") =!= 0.2)).count() == 0)
      assert(joined.filter(col("p_size") % 4 =!= 0 &&
        (col("originalprice").isNotNull || col("discountpercentage").isNotNull)).count() == 0)
    } finally df.unpersist()
  }

  test("q74 URL canonicalization: aliases collapse, distinct pages don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq(
      "HTTPS://Shop.Example.COM/a/B?z=2&utm_source=x&a=1",
      "https://shop.example.com:443/a/B/?a=1&z=2#frag",
      "https://shop.example.com/a/B?ref=home&a=1&z=2",
      // different path case = a DIFFERENT page (paths are case-sensitive)
      "https://shop.example.com/a/b?a=1&z=2",
      // no query, trailing slashes, non-default port survives
      "https://shop.example.com/c///",
      "https://shop.example.com:8443/c?utm_x=1",
      // http policy: scheme preserved (http != https fetches), its OWN
      // default port :80 stripped, :443 on http is a real port and stays
      "HTTP://Shop.Example.COM:80/a/B?z=2&a=1",
      "http://shop.example.com/a/B?a=1&z=2#frag",
      "http://shop.example.com:443/d",
    ).toDF("raw").select(operators.ScrapeEtl.canonicalizeUrl(col("raw")).as("c"))
      .collect().map(_.getString(0))
    assert(got(0) == "https://shop.example.com/a/B?a=1&z=2")
    assert(got(1) == got(0), "default port + trailing slash + fragment alias")
    assert(got(2) == got(0), "tracking params + param order alias")
    assert(got(3) == "https://shop.example.com/a/b?a=1&z=2", "path case is significant")
    assert(got(4) == "https://shop.example.com/c")
    assert(got(5) == "https://shop.example.com:8443/c", "non-default port is kept")
    assert(got(6) == "http://shop.example.com/a/B?a=1&z=2", ":80 stripped for http")
    assert(got(7) == got(6), "http aliases collapse among themselves")
    assert(got(6) != got(0), "scheme is preserved: http and https are distinct frontier keys")
    assert(got(8) == "http://shop.example.com:443/d", ":443 on http is a non-default port")
    // on driver data every product page's 3 alias spellings collapse to 1
    val agg = operators.ScrapeEtl.q74.run(spark, sf)
    val nParts = Tables.part(spark, sf).count()
    assert(agg.count() == nParts, "one canonical frontier key per product page")
    assert(agg.filter(col("n_raw") =!= 3L || col("n_distinct_raw") =!= 3L).count() == 0,
      "each canonical key folds exactly its 3 distinct alias spellings")
  }

  test("q29 frontier stops at the first empty or missing page, not at max(page)") {
    import spark.implicits._
    // catalog 1: pages 1-3 valid, 4 empty, 5-6 valid again -> frontier 3
    // catalog 2: pages 1-2 valid, page 3 missing, 4 valid   -> frontier 2
    // catalog 3: page 1 already empty                       -> frontier 0
    val pages = Seq(
      (1L, 1L, 5L), (1L, 2L, 4L), (1L, 3L, 2L), (1L, 4L, 0L), (1L, 5L, 7L), (1L, 6L, 1L),
      (2L, 1L, 3L), (2L, 2L, 3L), (2L, 4L, 9L),
      (3L, 1L, 0L),
    ).toDF("catalog", "page", "valid")
    val got = operators.ScrapeEtl.pageFrontier(pages).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 11L)), "stops before the empty page 4")
    assert(got(2L) == ((2L, 6L)), "stops at the page-3 gap")
    assert(got.getOrElse(3L, (0L, 0L)) == ((0L, 0L)), "empty first page -> frontier 0")
  }
}
