package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Planted-data semantics for the round-8 relational additions: SCD2
  * history building (q45), source vocabulary overlap (q46), and
  * token-budget-weighted sampling (q47).
  */
class Scd2AndOverlapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  private def plantEvents(name: String,
      rows: Seq[(Long, Long, Long, String)]): String = {
    // (event_id, epoch_ms, user_id, event_type)
    import spark.implicits._
    val dir = s"/tmp/graft-test/$name"
    rows.map { case (id, ms, uid, tpe) =>
      (id, new Timestamp(ms), uid, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q45 compacts the change-log into SCD2 intervals") {
    val dir = plantEvents("scd2", Seq(
      // user 1: A A B B A -> three intervals
      (1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "A"), (3L, 3000L, 1L, "B"),
      (4L, 4000L, 1L, "B"), (5L, 5000L, 1L, "A"),
      // user 2: a single event -> one open interval
      (6L, 9000L, 2L, "C"),
    ))
    val got = operators.ScrapeEtl.q45.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
      .toSeq
    assert(got == Seq(
      (1L, 1L, "A", 1000L, Some(3000L), 0L),
      (1L, 2L, "B", 3000L, Some(5000L), 0L),
      (1L, 3L, "A", 5000L, None, 1L),
      (2L, 1L, "C", 9000L, None, 1L),
    ), s"got $got")
  }

  test("q45 intervals tile each user's timeline: no gaps, exactly one current") {
    val dir = "/root/testdata/sf0.001"
    val rows = operators.ScrapeEtl.q45.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .groupBy(_._1)
    rows.foreach { case (uid, hist) =>
      val sorted = hist.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, _, Some(to)), (_, _, from, _)) =>
          assert(to == from, s"user $uid: interval gap $to != $from")
        case _ =>
      }
      assert(sorted.count(_._4.isEmpty) == 1, s"user $uid: exactly one open interval")
    }
  }

  test("q53 densifies the hour spine and forward-fills gaps") {
    val H = 3600000L
    val dir = plantEvents("resample", Seq(
      // user 1: observations in hours 0 and 3 of its span; 1-2 are gaps;
      // two events in hour 0 — the later one wins
      (1L, 100L, 1L, "A"), (2L, 200L, 1L, "B"), (3L, 3 * H + 50L, 1L, "C"),
      // user 2: single event -> single-row spine
      (9L, 10 * H, 2L, "Z"),
    ))
    // plantEvents writes value=1.0 for all rows; re-plant with varied values
    import spark.implicits._
    import java.sql.Timestamp
    Seq(
      (1L, new Timestamp(100L), 1L, "A", 10.0, "{}"),
      (2L, new Timestamp(200L), 1L, "B", 20.0, "{}"),
      (3L, new Timestamp(3 * H + 50L), 1L, "C", 30.0, "{}"),
      (9L, new Timestamp(10 * H), 2L, "Z", 99.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.ScrapeEtl.q53.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got((1L, 0L)) == ((20.0, 1L)), "later event in the hour wins")
    assert(got((1L, 1L)) == ((20.0, 0L)) && got((1L, 2L)) == ((20.0, 0L)),
      "gap hours carry the last observation forward")
    assert(got((1L, 3L)) == ((30.0, 1L)))
    assert(got((2L, 10L)) == ((99.0, 1L)), "single-event user gets a one-row spine")
    assert(got.size == 5, s"dense spine: 4 hours for user 1 + 1 for user 2, got ${got.size}")
  }

  test("q55 interpolates gaps linearly and nearest-fills the edges") {
    import spark.implicits._
    import java.sql.Timestamp
    val H = 3600000L
    val dir = "/tmp/graft-test/lerp"
    Seq(
      // user 1: observations at hours 1 (10.0) and 4 (40.0); hours 2,3 lerp
      (1L, new Timestamp(1 * H), 1L, "A", 10.0, "{}"),
      (2L, new Timestamp(4 * H + 5L), 1L, "B", 40.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.ScrapeEtl.q55.run(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got(1L) == ((10.0, 1L)) && got(4L) == ((40.0, 1L)))
    assert(got(2L) == ((20.0, 0L)), s"hour 2 lerps to 20, got ${got(2L)}")
    assert(got(3L) == ((30.0, 0L)), s"hour 3 lerps to 30, got ${got(3L)}")
  }

  test("q56 counts time-ordered transitions per user and normalizes rows to ppm") {
    val dir = plantEvents("markov", Seq(
      // user 1: A -> B -> A -> C ; user 2: A -> B
      (1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "B"), (3L, 3000L, 1L, "A"),
      (4L, 4000L, 1L, "C"), (5L, 1000L, 2L, "A"), (6L, 2000L, 2L, "B"),
    ))
    val got = operators.ScrapeEtl.q56.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // from A: 2x ->B, 1x ->C (cross-user transitions never counted)
    assert(got(("A", "B")) == ((2L, 666666L)), s"got $got")
    assert(got(("A", "C")) == ((1L, 333333L)))
    assert(got(("B", "A")) == ((1L, 1000000L)))
    assert(!got.contains(("C", "A")), "no transition out of the final event")
    assert(got.size == 3)
  }

  test("q57 counts only within-session transitions (gap <= 30 min)") {
    val G = 1800000L
    val dir = plantEvents("session-markov", Seq(
      // user 1: A -> B (5 min gap, counted), B -> A (2 h gap, NOT a
      // transition — new session), A -> C (exactly 30 min, boundary
      // inclusive, counted)
      (1L, 1000L, 1L, "A"), (2L, 300000L, 1L, "B"),
      (3L, 300000L + 4 * G, 1L, "A"), (4L, 300000L + 5 * G, 1L, "C"),
      // user 2: A -> B just over the gap -> dropped
      (5L, 1000L, 2L, "A"), (6L, 1000L + G + 1L, 2L, "B"),
    ))
    val got = operators.ScrapeEtl.q57.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("A", "B")) == ((1L, 500000L)), s"got $got")
    assert(got(("A", "C")) == ((1L, 500000L)), "30-min boundary is within the session")
    assert(!got.contains(("B", "A")), "cross-session transitions are not counted")
    assert(got.size == 2, s"got $got")
  }

  test("q58 fills gaps from the nearer observation; ties and edges resolve backward/nearest") {
    import spark.implicits._
    import java.sql.Timestamp
    val H = 3600000L
    val dir = "/tmp/graft-test/nearest"
    Seq(
      // user 1: observations at hours 1 (10.0) and 5 (50.0):
      // hour 2 nearer to 1, hour 3 an exact tie (breaks backward),
      // hour 4 nearer to 5
      (1L, new Timestamp(1 * H), 1L, "A", 10.0, "{}"),
      (2L, new Timestamp(5 * H + 5L), 1L, "B", 50.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.ScrapeEtl.q58.run(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got(1L) == ((10.0, 1L)) && got(5L) == ((50.0, 1L)))
    assert(got(2L) == ((10.0, 0L)), s"hour 2 takes the earlier neighbor, got $got")
    assert(got(3L) == ((10.0, 0L)), s"the exact tie at hour 3 breaks backward, got $got")
    assert(got(4L) == ((50.0, 0L)), s"hour 4 takes the later neighbor, got $got")
  }

  test("q59 cohorts users by first-seen day and normalizes by day-0 actives") {
    val D = 86400000L
    val dir = plantEvents("cohort", Seq(
      // user 1: days 10, 11, 13 -> cohort 10, offsets 0/1/3
      (1L, 10 * D + 100L, 1L, "A"), (2L, 11 * D + 100L, 1L, "A"), (3L, 13 * D + 100L, 1L, "A"),
      // user 2: day 10 twice (one active day) and day 11 -> cohort 10
      (4L, 10 * D + 200L, 2L, "B"), (5L, 10 * D + 300L, 2L, "B"), (6L, 11 * D + 900L, 2L, "B"),
      // user 3: day 11 only -> its own cohort
      (7L, 11 * D + 100L, 3L, "C"),
    ))
    val got = operators.ScrapeEtl.q59.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got((10L, 0L)) == ((2L, 1000000L)), s"got $got")
    assert(got((10L, 1L)) == ((2L, 1000000L)), "both cohort-10 users return on day 1")
    assert(got((10L, 3L)) == ((1L, 500000L)), "half the cohort is active on day 3")
    assert(got((11L, 0L)) == ((1L, 1000000L)), "day-11 user forms its own cohort")
    assert(got.size == 4, s"no phantom (cohort, offset) rows: $got")
  }

  test("q62 buckets inter-event gaps on exact boundaries per later-event type") {
    val dir = plantEvents("gaps", Seq(
      // user 1: gaps of 999 ms (a), 1000 ms (b, boundary), 30 min (e —
      // exactly 1800000 is NOT < 30m bucket), then a cross-user reset
      (1L, 0L, 1L, "X"), (2L, 999L, 1L, "Y"),
      (3L, 1999L, 1L, "Y"), (4L, 1801999L, 1L, "Z"),
      // user 2: first event emits no gap
      (5L, 5000L, 2L, "Y"),
    ))
    val got = operators.ScrapeEtl.q62.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("Y", "a_lt_1s")) == ((1L, 500000L)), s"999 ms gap, got $got")
    assert(got(("Y", "b_lt_1m")) == ((1L, 500000L)), "1000 ms is the 1s boundary bucket")
    assert(got(("Z", "e_lt_1d")) == ((1L, 1000000L)), "exactly 30 min leaves the <30m bucket")
    assert(got.size == 3, s"cross-user and first events emit no gap: $got")
  }

  test("q67 rolling 24h frame includes the 86399999ms edge, excludes 24h exactly") {
    val D = 86400000L
    val dir = plantEvents("rolling", Seq(
      // user 1: events at t=0, t=D-1 (inside the trailing 24h of each
      // other), t=2D-1 (exactly 24h after D-1 -> excluded from its frame)
      (1L, 0L, 1L, "A"), (2L, D - 1L, 1L, "A"), (3L, 2 * D - 1L, 1L, "A"),
      // user 2: isolated event counts only itself
      (4L, 500L, 2L, "B"),
    ))
    val got = operators.ScrapeEtl.q67.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) == 1L, s"first event sees only itself: $got")
    assert(got(2L) == 2L, "t=D-1 includes t=0 (86399999 ms back, inside the frame)")
    assert(got(3L) == 1L, "exactly 24h back is outside the 86399999-PRECEDING frame")
    assert(got(4L) == 1L)
  }

  test("q65 classifies customers as insert/update/unchanged across the cutover") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = "/tmp/graft-test/merge"
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    Seq(
      // cust 1: orders both sides -> update, latest keys on each side
      (10L, 1L, "O", 10.0, ts("1997-05-01"), "P"),
      (11L, 1L, "O", 11.0, ts("1997-06-01"), "P"),
      (12L, 1L, "O", 12.0, ts("1998-03-01"), "P"),
      // cust 2: target only -> unchanged
      (20L, 2L, "O", 20.0, ts("1996-01-01"), "P"),
      // cust 3: source only -> insert
      (30L, 3L, "O", 30.0, ts("1999-01-01"), "P"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = operators.RelationalCore.q65.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3)))).toMap
    assert(got(1L) == ((Some(11L), Some(12L), "update")), s"got $got")
    assert(got(2L) == ((Some(20L), None, "unchanged")))
    assert(got(3L) == ((None, Some(30L), "insert")))
    assert(got.size == 3)
  }

  test("q68 counts conversions only within 7 days of first signup") {
    val D = 86400000L
    val dir = plantEvents("wfunnel", Seq(
      // user 1: signup day 0, purchase day 3 -> converted (72h)
      (1L, 0L, 1L, "signup"), (2L, 3 * D, 1L, "purchase"),
      // user 2: signup day 0, purchase day 8 -> outside the window
      (3L, 0L, 2L, "signup"), (4L, 8 * D, 2L, "purchase"),
      // user 3: purchase BEFORE signup only -> not a conversion
      (5L, 0L, 3L, "purchase"), (6L, 1 * D, 3L, "signup"),
      // user 4: purchase at exactly signup + 7d -> boundary INCLUSIVE
      (7L, 0L, 4L, "signup"), (8L, 7 * D, 4L, "purchase"),
      // user 5: never signed up -> not in the denominator
      (9L, 0L, 5L, "click"),
    ))
    val r = operators.ScrapeEtl.q68.run(spark, dir).collect()(0)
    assert(r.getLong(0) == 4L, s"signup users: ${r.getLong(0)}")
    assert(r.getLong(1) == 2L, s"7d conversions (users 1 and 4): ${r.getLong(1)}")
    assert(r.getLong(2) == 500000L)
    assert(math.abs(r.getDouble(3) - (72.0 + 168.0) / 2) < 1e-9,
      s"mean hours-to-convert: ${r.getDouble(3)}")
  }

  test("q46 computes exact pairwise vocabulary jaccard") {
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/overlap", Seq(
      (1L, "alpha beta gamma", "sA", "sA", 16L),
      (2L, "beta gamma delta", "sB", "sB", 16L),
      (3L, "epsilon zeta", "sC", "sC", 12L),
    ))
    val got = operators.TextAnalysis.q46.run(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // sA={alpha,beta,gamma} sB={beta,gamma,delta}: inter 2, union 4, ppm 500000
    assert(got(("sA", "sB")) == ((2L, 4L, 500000L)), s"got $got")
    assert(!got.contains(("sB", "sA")), "pairs are emitted once, ordered")
    assert(!got.contains(("sA", "sC")) && !got.contains(("sB", "sC")),
      "disjoint vocabularies produce no pair row")
  }

  test("q52 split is total, disjoint, stable under corpus growth, and ~80/10/10") {
    val rows = (0L until 2000L).map(i => (i, s"doc body $i", "en", "s", 10L))
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/split", rows)
    val got = operators.TrainPrep.q52.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == 2000, "every doc lands in exactly one split")
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes("train") > 1500 && sizes("train") < 1700, s"train share out of family: $sizes")
    assert(sizes("val") > 130 && sizes("val") < 270, s"val share out of family: $sizes")
    assert(sizes("test") > 130 && sizes("test") < 270, s"test share out of family: $sizes")
    // growth stability: the first 1000 docs keep their split when the
    // corpus doubles (the doc_id-keyed hash is corpus-independent)
    val dirSmall = PlantedDocs.write(spark, "/tmp/graft-test/split-small", rows.take(1000))
    val small = operators.TrainPrep.q52.run(spark, dirSmall)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(small.forall { case (id, s) => got(id) == s }, "splits never migrate on growth")
  }

  test("q47 keeps every max-weight doc, drops empty docs, and is deterministic") {
    val long = (1 to 300).map(i => s"tok$i").mkString(" ")
    val rows =
      (0L until 50L).map(i => (i, long, "en", "s", long.length.toLong)) ++
        (50L until 60L).map(i => (i, "", "en", "s", 0L)) ++
        (60L until 560L).map(i => (i, (1 to 64).map(j => s"w$j").mkString(" "), "en", "s", 300L))
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/wsample", rows)
    val got = operators.TrainPrep.q47.run(spark, dir)
      .collect().map(r => r.getLong(0)).toSet
    assert((0L until 50L).forall(got), ">=cap-token docs are always kept")
    assert((50L until 60L).forall(i => !got(i)), "empty docs are never kept")
    val midKept = (60L until 560L).count(got)
    // p = 64/256 = 0.25 exactly, deterministic; family check with slack.
    assert(midKept > 75 && midKept < 175, s"64-token keep rate out of family: $midKept/500")
    val again = operators.TrainPrep.q47.run(spark, dir)
      .collect().map(r => r.getLong(0)).toSet
    assert(again == got, "sampling decision is reproducible")
  }
}
