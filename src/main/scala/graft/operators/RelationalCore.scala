package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{GraftQuery, Tables}

/** Relational analytics core — the query surface the reference's product
  * table (`tr_raw_scrap_data`, scrap_tokopedia.py:81-92) exists to serve,
  * expressed as declarative DataFrame plans so Catalyst handles pushdown,
  * pruning, join selection and AQE does runtime re-planning.
  *
  * Determinism-for-oracle rules (see SURVEY.md §5):
  *  - money sums go through DECIMAL (partition-order invariant), then cast
  *    to double for a stable comparable schema;
  *  - averages are decimal-sum / count (never double-sum);
  *  - every result ends in a total ORDER BY.
  */
object RelationalCore {

  /** Partition-order-deterministic sum: cast to decimal, sum exactly, emit double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic average via exact decimal sum over exact count. */
  def davg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))

  // SQL fragments mirroring dsum/davg for the DuckDB oracle.
  private def sqlDsum(e: String, scale: Int = 2) =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"
  private def sqlDavg(e: String, scale: Int = 4) =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT(*)"

  val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
  )

  // Predicate + column pruning both reach the parquet scan
  // (PushedFilters + 5-column ReadSchema on an 11-column table).
  private def q02Body(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1999-01-01")) && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")

  val q02 = GraftQuery(
    "q02_filter_project",
    (s, d) => q02Body(s, d).orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00' AND l_quantity < 10
      ORDER BY l_orderkey, l_linenumber"""),
    // prod: the full-result range sort exists only for the oracle compare
    prod = Some((s, d) => q02Body(s, d)),
  )

  val q03 = GraftQuery(
    "q03_join_agg",
    (s, d) => {
      // Fact-fact join shuffles on the key; nation is tiny -> broadcast.
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_rows
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""),
  )

  val q04 = GraftQuery(
    "q04_broadcast_join",
    (s, d) => {
      // Star-schema join: dim side explicitly broadcast (no shuffle of the fact).
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          dsum(col("l_extendedprice")).as("total_price"),
          dsum(col("l_quantity")).as("total_qty"),
          count(lit(1)).as("cnt"),
        )
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      COUNT(*) AS cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""),
  )

  val q05 = GraftQuery(
    "q05_semi_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      ORDER BY c_custkey"""),
  )

  val q06 = GraftQuery(
    "q06_anti_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(f, c("c_custkey") === f("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey"""),
  )

  val q07 = GraftQuery(
    "q07_window_topn",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""),
    // prod: bounded-heap aggregate (O(k) state, map-side partial) instead of
    // the window's full per-customer sort; same (price desc, orderkey) order
    prod = Some((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(graft.gfunctions.top_k_by_score(col("o_orderkey"), col("o_totalprice"), 3).as("topk"))
        .select(col("o_custkey"), posexplode(col("topk")).as(Seq("pos", "t")))
        .select(
          col("o_custkey"),
          col("t.neighbor_id").as("o_orderkey"),
          col("t.sim").as("o_totalprice"),
          (col("pos") + 1).cast("int").as("rn"))),
  )

  private def q08Body(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_total", sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double"))
      .withColumn(
        "prev_price",
        lag(col("o_totalprice"), 1).over(Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))),
      )
      .select("o_custkey", "o_orderkey", "running_total", "prev_price")
  }

  val q08 = GraftQuery(
    "q08_window_running",
    (s, d) => q08Body(s, d).orderBy("o_custkey", "o_orderkey"),
    Some("""SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
      FROM orders ORDER BY o_custkey, o_orderkey"""),
    prod = Some((s, d) => q08Body(s, d)),
  )

  val q09 = GraftQuery(
    "q09_rollup",
    (s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_extendedprice")).as("total_price"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("total_price"),
          col("cnt"),
        )
        .orderBy("rf", "ls")
    },
    Some("""SELECT COALESCE(l_returnflag, '(all)') AS rf, COALESCE(l_linestatus, '(all)') AS ls,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price, COUNT(*) AS cnt
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls"""),
  )

  val q10 = GraftQuery(
    "q10_grouping_sets",
    (s, d) => {
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum(col("o_totalprice")).as("total"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("total"),
          col("cnt"),
        )
        .orderBy("status", "priority")
    },
    Some("""SELECT COALESCE(o_orderstatus, '(all)') AS status, COALESCE(o_orderpriority, '(all)') AS priority,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS cnt
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY status, priority"""),
  )

  val q11 = GraftQuery(
    "q11_distinct_agg",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total"),
        )
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
  )

  val q12 = GraftQuery(
    "q12_pivot",
    (s, d) => {
      graft.operators.Events.withEventTime(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")
    },
    Some("""SELECT user_id,
      COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      COUNT(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY user_id ORDER BY user_id"""),
  )

  val q13 = GraftQuery(
    "q13_conditional_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_quantity") > 25, col("l_extendedprice").cast(DecimalType(18, 2))).otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("big_qty_price"),
          count(when(col("l_discount") > 0.05, lit(1))).as("discounted_cnt"),
          count(when(col("l_tax") === 0, lit(1))).as("taxfree_cnt"),
        )
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
      CAST(SUM(CASE WHEN l_quantity > 25 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_qty_price,
      COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS discounted_cnt,
      COUNT(CASE WHEN l_tax = 0 THEN 1 END) AS taxfree_cnt
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  val q14 = GraftQuery(
    "q14_percentiles",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
        )
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
  )

  val q15 = GraftQuery(
    "q15_set_ops",
    (s, d) => {
      val custN = Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
      val suppN = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct()
      val region0 = Tables.nation(s, d).filter(col("n_regionkey") === 0).select(col("n_nationkey").as("nationkey"))
      custN.union(suppN).distinct().except(region0).orderBy("nationkey")
    },
    Some("""SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
      ) u
      EXCEPT SELECT n_nationkey AS nationkey FROM nation WHERE n_regionkey = 0
      ORDER BY nationkey"""),
  )

  val q16 = GraftQuery(
    "q16_in_subquery",
    (s, d) => {
      val building = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      o.join(building, o("o_custkey") === building("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_totalprice > 300000
        AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      ORDER BY o_orderkey"""),
  )

  val q17 = GraftQuery(
    "q17_topk_global",
    (s, d) => {
      // Global top-k compiles to TakeOrderedAndProject: no full sort, no
      // single-node shuffle of the whole table — each partition keeps k.
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
  )

  private def q18Body(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        dayofmonth(col("o_orderdate")).as("order_day"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_priority"),
        length(col("o_orderpriority")).as("prio_len"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        ceil(col("o_totalprice")).cast("long").as("price_ceil"),
      )

  val q18 = GraftQuery(
    "q18_scalar_functions",
    (s, d) => q18Body(s, d).orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      CAST(year(o_orderdate) AS INT) AS order_year,
      CAST(month(o_orderdate) AS INT) AS order_month,
      CAST(day(o_orderdate) AS INT) AS order_day,
      UPPER(o_orderpriority) AS prio_upper,
      SUBSTR(o_orderpriority, 1, 1) AS prio_code,
      o_orderstatus || '-' || o_orderpriority AS status_priority,
      CAST(LENGTH(o_orderpriority) AS INT) AS prio_len,
      CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
      CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil
      FROM orders ORDER BY o_orderkey"""),
    prod = Some((s, d) => q18Body(s, d)),
  )

  val q19 = GraftQuery(
    "q19_asof_join",
    (s, d) => {
      // AS-OF (temporal) join: each event joined to the user's most recent
      // order at-or-before the event time. Scale shape: NO range-condition
      // join (which Spark would plan as a nested loop and a range join
      // explodes anyway) — instead union both sides tagged, one window
      // pass per key carrying the last order state forward. One shuffle on
      // the key, linear in rows.
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
        // NTZ -> UTC instant (session tz is UTC; matches DuckDB epoch_ms)
        .groupBy(col("o_custkey").as("key"), unix_millis(col("o_orderdate").cast("timestamp")).as("t"))
        .agg(
          max(col("o_orderkey")).as("last_order_key"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("last_order_price"))
        .withColumn("side", lit(0))
        .withColumn("event_id", lit(null).cast("long"))
      val e = Events.withEventTime(s, d).select(
        col("user_id").as("key"),
        unix_millis(col("ts")).as("t"),
        lit(null).cast("long").as("last_order_key"),
        lit(null).cast("double").as("last_order_price"),
        lit(1).as("side"),
        col("event_id"))
      // orders sort before same-ms events (side 0 < 1), so an event at the
      // exact order timestamp sees that order — ASOF's >= semantics
      val w = Window.partitionBy("key").orderBy(col("t"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.unionByName(e)
        .withColumn("lok", last(col("last_order_key"), ignoreNulls = true).over(w))
        .withColumn("lop", last(col("last_order_price"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(
          col("event_id"), col("key").as("user_id"), col("t").as("ts_ms"),
          col("lok").as("last_order_key"), col("lop").as("last_order_price"))
        .orderBy("event_id")
    },
    Some("""WITH o AS (
        SELECT o_custkey, epoch_ms(o_orderdate) AS t,
               CAST(MAX(o_orderkey) AS BIGINT) AS last_order_key,
               arg_max(o_totalprice, o_orderkey) AS last_order_price
        FROM orders GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
             o.last_order_key, o.last_order_price
      FROM events e ASOF LEFT JOIN o
        ON e.user_id = o.o_custkey AND epoch_ms(e.ts) >= o.t
      ORDER BY event_id"""),
  )

  val qSketch = GraftQuery(
    "sketch_approx_distinct",
    (s, d) => {
      // HyperLogLog++ distinct sketch next to the exact count. r20
      // shape (guide §2.3 "shuffle fewer bytes"): Spark rewrites the
      // mixed distinct/plain aggregate into a (flag, partkey)
      // pre-aggregate TOO — but that plan dragged the partial HLL++
      // buffer (410 MS[] longs, ~3.3 KB) through the exchange ON EVERY
      // DISTINCT PAIR ROW (413-column exchange, see the before plan).
      // Building the sketch only in the SECOND aggregate instead keeps
      // the wide HLL state per FINAL group (3 rows), and the pair
      // exchange carries 3 columns:
      //   exact_parts  = COUNT(partkey)   (one row per distinct pair)
      //   n_rows       = SUM(c)           (the per-pair row counts)
      //   approx_parts = HLL over the deduped pairs — identical to HLL
      //                  over the raw rows because register updates are
      //                  idempotent per value (max of hashes): duplicate
      //                  values cannot move any register.
      // Same three values, same plan skeleton, 413 -> 3 exchange cols.
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_partkey")
        .agg(count(lit(1)).as("c"))
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
          count(col("l_partkey")).as("exact_parts"),
          sum(col("c")).as("n_rows"),
        )
        .orderBy("l_returnflag")
    },
    None,
  )

  val qSketchQuantile = GraftQuery(
    "sketch_approx_quantile",
    (s, d) => {
      // Approximate-quantile sketch (Greenwald-Khanna via approx_percentile)
      // next to q14's exact percentiles: mergeable bounded-size map-side
      // state, ONE shuffle of sketch summaries — where exact percentiles
      // sort every group's values. The 1e-4 accuracy parameter bounds
      // rank error; the error vs the exact percentile_cont is asserted
      // in SketchSpec. rows-only: GK summary merge order differs across
      // engines, so the sketch values are not bit-portable by design.
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)")
            .as("approx_p"),
          expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
            .as("exact_p50"),
          count(lit(1)).as("n_rows"),
        )
        .select(
          col("l_returnflag"),
          col("approx_p")(0).as("approx_p50"),
          col("approx_p")(1).as("approx_p95"),
          col("approx_p")(2).as("approx_p99"),
          col("exact_p50"), col("n_rows"))
        .orderBy("l_returnflag")
    },
    None,
  )

  val q63 = GraftQuery(
    "q63_regional_revenue",
    (s, d) => {
      // TPC-H Q5 shape: a six-table plan with two fact-fact joins and a
      // dimension snowflake, plus the local-supplier constraint
      // (customer and supplier in the SAME nation). Region/nation are
      // broadcast; lineitem⋈orders and ⋈supplier shuffle on their keys
      // and AQE picks the final join strategy — the query exists to
      // exercise join reordering + mixed broadcast/shuffle selection on
      // one plan.
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_rows
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY n_name"""),
  )

  /** CDC-merge classification: target = each customer's latest order
    * before the cutover, source = orders at/after it; every customer
    * classifies as insert (source only), update (both, source is newer
    * by definition), or unchanged (target only) — the decision table a
    * MERGE INTO executes, materialized for audit. Two latest-per-key
    * aggregates over one orders scan each side of a pushed date
    * predicate, then a full outer join on the key.
    */
  private def mergeClassify(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("1998-01-01"))
    def latest(df: DataFrame, keyOut: String, okey: String): DataFrame =
      df.groupBy(col("o_custkey").as(keyOut))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
        .select(col(keyOut), col("m.o_orderkey").as(okey))
    val o = Tables.orders(s, d)
    val target = latest(o.filter(col("o_orderdate") < cut), "tk", "target_orderkey")
    val source = latest(o.filter(col("o_orderdate") >= cut), "sk", "source_orderkey")
    target.join(source, col("tk") === col("sk"), "full_outer")
      .select(
        coalesce(col("tk"), col("sk")).as("c_custkey"),
        col("target_orderkey"), col("source_orderkey"),
        when(col("tk").isNull, "insert")
          .when(col("sk").isNull, "unchanged")
          .otherwise("update").as("merge_action"))
  }

  val q65 = GraftQuery(
    "q65_merge_classify",
    (s, d) => mergeClassify(s, d).orderBy("c_custkey"),
    Some("""WITH rt AS (
        SELECT o_custkey, o_orderkey,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      target AS (SELECT o_custkey AS c_custkey, o_orderkey AS target_orderkey FROM rt WHERE rn = 1),
      rs AS (
        SELECT o_custkey, o_orderkey,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
      source AS (SELECT o_custkey AS c_custkey, o_orderkey AS source_orderkey FROM rs WHERE rn = 1)
      SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
        t.target_orderkey, s.source_orderkey,
        CASE WHEN t.c_custkey IS NULL THEN 'insert'
             WHEN s.c_custkey IS NULL THEN 'unchanged'
             ELSE 'update' END AS merge_action
      FROM target t FULL OUTER JOIN source s USING (c_custkey)
      ORDER BY c_custkey"""),
    prod = Some((s, d) => mergeClassify(s, d)),
  )

  /** The ranking-function battery over ONE window sort: rank,
    * dense_rank, percent_rank, cume_dist, ntile, lag, lead — the
    * remaining window surface q07/q08 don't cover, all sharing one
    * (flag, price, unique-tiebreak) ordering so Catalyst plans a single
    * exchange + sort. percent_rank/cume_dist are ratios of exact
    * integer ranks — deterministic doubles in both engines.
    */
  private def windowBattery(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .filter(col("l_quantity") < 5)
      .select(
        col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"),
        lag(col("l_extendedprice"), 1).over(w).as("prev_price"),
        lead(col("l_extendedprice"), 1).over(w).as("next_price"))
  }

  val q66 = GraftQuery(
    "q66_window_battery",
    (s, d) => windowBattery(s, d).orderBy("l_returnflag", "rnk"),
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        CAST(RANK() OVER w AS BIGINT) AS rnk,
        CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        PERCENT_RANK() OVER w AS prnk,
        CUME_DIST() OVER w AS cdist,
        CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        LAG(l_extendedprice, 1) OVER w AS prev_price,
        LEAD(l_extendedprice, 1) OVER w AS next_price
      FROM lineitem WHERE l_quantity < 5
      WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber)
      ORDER BY l_returnflag, rnk"""),
    prod = Some((s, d) => windowBattery(s, d)),
  )

  /** The correlated-scalar-subquery shape ("orders above their
    * customer's average"), decorrelated by hand to whole-partition
    * windows: Spark's own decorrelation rewrites the subquery to an
    * aggregate + self-join (two scans); the window form states the same
    * semantics over ONE scan and one customer exchange. The average is
    * a decimal-sum-over-count ratio — partition-order exact — so the
    * predicate and the emitted double both hash-match.
    */
  private def aboveAvgOrders(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
    Tables.orders(s, d)
      .withColumn("cust_avg",
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter(col("o_totalprice") > col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
  }

  val q69 = GraftQuery(
    "q69_above_avg_orders",
    (s, d) => aboveAvgOrders(s, d).orderBy("o_orderkey"),
    Some("""WITH t AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS DOUBLE)
            / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
        FROM orders)
      SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
      FROM t WHERE o_totalprice > cust_avg
      ORDER BY o_orderkey"""),
    prod = Some((s, d) => aboveAvgOrders(s, d)),
  )

  def all: Seq[GraftQuery] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14, q15, q16, q17,
      q18, q19, q63, q65, q66, q69, qSketch, qSketchQuantile)
}
