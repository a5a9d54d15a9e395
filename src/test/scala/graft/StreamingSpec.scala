package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import scala.jdk.CollectionConverters._

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  import streaming.Streams
  import streaming.Streams.{SessEvent, SessionRec}

  test("batch sessionize matches the q25 gap semantics at sf0.001") {
    val df = Streams.qSessionize.run(spark, "/root/testdata/sf0.001")
    val total = df.agg(sum("n_events")).collect()(0).getLong(0)
    val raw = operators.Events.withEventTime(spark, "/root/testdata/sf0.001").count()
    assert(total == raw, "every event lands in exactly one session")
    val bad = df.filter(col("end_ms") < col("start_ms")).count()
    assert(bad == 0)
  }

  test("streaming sessionize emits closed sessions across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[SessEvent]
    val q = Streams.sessionizeStream(ms.toDS())
      .writeStream.format("memory").queryName("graft_sessions").outputMode("append").start()
    try {
      // batch 1: three events 1 min apart -> one open session (nothing emits)
      ms.addData(SessEvent(1L, 1L, 0L), SessEvent(1L, 2L, 60000L), SessEvent(1L, 3L, 120000L))
      q.processAllAvailable()
      assert(spark.table("graft_sessions").count() == 0L)
      // batch 2: an event 2h later closes session 1 and opens session 2
      ms.addData(SessEvent(1L, 4L, 120000L + 7200000L))
      q.processAllAvailable()
      val rows = spark.table("graft_sessions").as[SessionRec].collect()
      assert(rows.toSeq == Seq(SessionRec(1L, 1L, 3L, 0L, 120000L)))
      // batch 3: another gap closes session 2
      ms.addData(SessEvent(1L, 5L, 120000L + 7200000L * 2))
      q.processAllAvailable()
      val rows2 = spark.table("graft_sessions").as[SessionRec].collect().sortBy(_.session_id)
      assert(rows2.length == 2 && rows2(1).session_id == 2L && rows2(1).n_events == 1L)
    } finally q.stop()
  }

  test("streaming sessionize is green under the RocksDB state store provider") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, GraftSession.RocksDbProvider)
    try {
      val ms = MemoryStream[SessEvent]
      val q = Streams.sessionizeStream(ms.toDS())
        .writeStream.format("memory").queryName("graft_sessions_rocks")
        .outputMode("append").start()
      try {
        ms.addData(SessEvent(7L, 1L, 0L), SessEvent(7L, 2L, 60000L))
        q.processAllAvailable()
        ms.addData(SessEvent(7L, 3L, 60000L + 7200000L))
        q.processAllAvailable()
        val rows = spark.table("graft_sessions_rocks").as[SessionRec].collect()
        assert(rows.toSeq == Seq(SessionRec(7L, 1L, 2L, 0L, 60000L)),
          "same session semantics under RocksDB state")
        // provider actually engaged: progress carries rocksdb state metrics
        val custom = q.lastProgress.stateOperators(0).customMetrics
        assert(custom.keySet().iterator().asScala.exists(_.startsWith("rocksdb")),
          s"expected rocksdb custom metrics, got: $custom")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming windowed agg emits closed windows under watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val events = ms.toDF().toDF("ts", "event_type", "value")
    val q = Streams.windowedAggStream(events)
      .writeStream.format("memory").queryName("graft_windows").outputMode("append").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      ms.addData((t(0, 10), "click", 1.0), (t(0, 40), "click", 2.0), (t(1, 15), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close hour-0 and hour-1 windows
      ms.addData((t(5, 0), "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("graft_windows")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 01:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming windowed profile emits per-column audit rows on window close") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, java.lang.Long, java.lang.Double)]
    val events = ms.toDF().toDF("ts", "event_type", "user_id", "value")
    val q = Streams.windowedProfileStream(events)
      .writeStream.format("memory").queryName("graft_profile").outputMode("append").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      ms.addData(
        (t(0, 10), "click", 7L, 1.5),
        (t(0, 40), null, 3L, null),
        (t(1, 15), "view", 9L, 5.0))
      q.processAllAvailable()
      ms.addData((t(5, 0), "click", java.lang.Long.valueOf(1L),
        java.lang.Double.valueOf(9.0))) // advance watermark, close h0+h1
      q.processAllAvailable()
      val rows = spark.table("graft_profile").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
      assert(rows(("2024-01-01 00:00:00.0", "event_type")) === ((2L, 1L, "click", "click")))
      assert(rows(("2024-01-01 00:00:00.0", "user_id")) === ((2L, 0L, "3", "7")))
      assert(rows(("2024-01-01 00:00:00.0", "value")) === ((2L, 1L, "1.5000", "1.5000")))
      assert(rows(("2024-01-01 01:00:00.0", "value")) === ((1L, 0L, "5.0000", "5.0000")))
    } finally q.stop()
  }

  test("streaming profile HLL distinct leg: exact at sparse cardinality, error-bounded at 500 (r20)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, java.lang.Long, java.lang.Double)]
    val events = ms.toDF().toDF("ts", "event_type", "user_id", "value")
    val q = Streams.windowedProfileStream(events)
      .writeStream.format("memory").queryName("graft_profile_hll").outputMode("append").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // hour 0: tiny cardinality — HLL++'s sparse mode is EXACT there
      ms.addData(
        (t(0, 1), "click", 7L, 1.0), (t(0, 2), "click", 7L, 2.0),
        (t(0, 3), "view", 3L, 1.0), (t(0, 4), "view", 9L, 1.0))
      // hour 1: 500 distinct users — the sketch regime, rsd = 5%
      ms.addData((0 until 500).map(i =>
        (t(1, i % 60), "click", java.lang.Long.valueOf(1000L + i),
          java.lang.Double.valueOf(1.0))): _*)
      ms.addData((t(9, 0), "click", java.lang.Long.valueOf(1L),
        java.lang.Double.valueOf(1.0))) // advance watermark, close h0+h1
      q.processAllAvailable()
      val rows = spark.table("graft_profile_hll").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(6)).toMap
      assert(rows(("2024-01-01 00:00:00.0", "user_id")) === 3L,
        "sparse-mode HLL++ is exact at tiny cardinality")
      assert(rows(("2024-01-01 00:00:00.0", "event_type")) === 2L)
      val nd = rows(("2024-01-01 01:00:00.0", "user_id"))
      assert(math.abs(nd - 500L) <= 75L,
        s"HLL++ distinct outside the 3-sigma rsd envelope: $nd vs 500")
    } finally q.stop()
  }

  test("batch windowed profile equals its streaming twin's final answer") {
    import spark.implicits._
    val batch = Seq(
      (Timestamp.valueOf("2024-01-01 00:10:00"), "click", 7L, 1.5),
      (Timestamp.valueOf("2024-01-01 00:40:00"), "click", 3L, 2.5),
    ).toDF("ts", "event_type", "user_id", "value")
    val got = Streams.windowedProfile(batch).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got === Map(
      "event_type" -> ((2L, 0L, "click", "click")),
      "user_id" -> ((2L, 0L, "3", "7")),
      "value" -> ((2L, 0L, "1.5000", "2.5000"))))
  }

  test("streaming dedup drops within-watermark duplicate keys") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String)]
    val events = ms.toDF().toDF("ts", "event_id", "payload")
    val q = Streams.dedupStream(events, "event_id")
      .writeStream.format("memory").queryName("graft_dedup").outputMode("append").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
      ms.addData((t(1), 1L, "a"), (t(2), 1L, "a-dup"), (t(3), 2L, "b"))
      q.processAllAvailable()
      ms.addData((t(4), 1L, "a-dup2"), (t(5), 3L, "c"))
      q.processAllAvailable()
      val ids = spark.table("graft_dedup").collect().map(_.getLong(1)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), "each key emitted exactly once within the watermark")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases within the window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val q = Streams.intervalJoinStream(
      clicks.toDF().toDF("user_id", "click_id", "cts"),
      purchases.toDF().toDF("user_id", "purchase_id", "pts"))
      .writeStream.format("memory").queryName("graft_ij").outputMode("append").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      clicks.addData((1L, 10L, t(0, 0)), (2L, 11L, t(0, 0)))
      purchases.addData((1L, 20L, t(0, 20)), (2L, 21L, t(2, 0))) // u2 outside 30min
      q.processAllAvailable()
      val rows = spark.table("graft_ij").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq((1L, 10L, 20L, 1200000L)),
        "only the within-window purchase joins; gap = 20 min")
    } finally q.stop()
  }

  test("batch windowed agg equals its streaming twin's final answer") {
    import spark.implicits._
    val batch = Seq(
      (Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:40:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 01:15:00"), "view", 5.0),
    ).toDF("ts", "event_type", "value")
    val got = Streams.windowedAgg(batch).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 01:00:00.0", "view", 1L, 5.0)))
  }

  test("streaming curation gates docs incrementally; exact state spans micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val body = (0 until 30).map(i => s"tok$i").mkString(" ")
    val other = (100 until 130).map(i => s"tok$i").mkString(" ")
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ms = MemoryStream[(Long, String, String, Timestamp)]
    val docs = ms.toDF().toDF("doc_id", "text", "lang", "ts")
    val q = Streams.curateStream(docs)
      .writeStream.format("memory").queryName("graft_curate_stream")
      .outputMode("append").start()
    try {
      // batch 1: first arrival kept, same-batch copy exact_dup, short and
      // wrong-lang gated out statelessly
      ms.addData(
        (1L, body, "en", ts(0)),
        (2L, body, "en", ts(1)),
        (3L, "ab cd", "en", ts(1)),
        (4L, other, "de", ts(2)),
        (7L, other, null, ts(2))) // NULL lang must emit a verdict, not vanish
      q.processAllAvailable()
      val v1 = spark.table("graft_curate_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v1 == Map(1L -> "kept", 2L -> "exact_dup",
        3L -> "too_short", 4L -> "wrong_lang", 7L -> "wrong_lang"), s"got $v1")
      // batch 2: a copy arriving later still dedups against batch-1 state;
      // a fresh text is kept
      ms.addData((5L, body, "en", ts(5)), (6L, other, "en", ts(6)))
      q.processAllAvailable()
      val v2 = spark.table("graft_curate_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v2(5L) == "exact_dup", "exact state spans micro-batches")
      assert(v2(6L) == "kept", "new gated text is kept")
    } finally q.stop()
  }

  test("stream-vs-corpus near-dup flags arrivals against the static reference") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(47)
    def doc(seed: Int) = {
      val r = new scala.util.Random(seed)
      Seq.fill(80)(s"w${r.nextInt(40)}").mkString(" ")
    }
    val corpus = Seq((100L, doc(1)), (101L, doc(2)), (102L, doc(3)))
      .toDF("doc_id", "text")
    val near1 = doc(1).split(" ").updated(40, "CHANGED").mkString(" ")
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.nearDupStream(ms.toDF().toDF("doc_id", "text", "ts"), corpus)
      .writeStream.format("memory").queryName("graft_neardup_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, near1, ts(0)), (2L, doc(9), ts(1)))
      q.processAllAvailable()
      val rows = spark.table("graft_neardup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 100L)),
        s"near-copy flags against its corpus source only, got $rows")
      // a second batch re-sending the same near-dup within the watermark
      // horizon emits nothing new (pair state dedups it)
      ms.addData((1L, near1, ts(2)))
      q.processAllAvailable()
      assert(spark.table("graft_neardup_stream").count() == 1L)
    } finally q.stop()
  }

  test("refreshing near-dup stream picks up a rebuilt reference table WITHOUT restart") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def doc(seed: Int) = {
      val r = new scala.util.Random(seed)
      Seq.fill(80)(s"w${r.nextInt(40)}").mkString(" ")
    }
    val near1 = doc(1).split(" ").updated(40, "CHANGED").mkString(" ")
    val near2 = doc(2).split(" ").updated(10, "ALSO").mkString(" ")
    val refDir = "/tmp/graft-test/neardup_ref_swap"
    // corpus A: doc(1)'s family only
    Streams.writeNearDupRef(Seq((100L, doc(1))).toDF("doc_id", "text"), refDir)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.nearDupStreamRefreshing(
      ms.toDF().toDF("doc_id", "text"), refDir,
      (df, _) => results ++= df.collect().map(r => (r.getLong(0), r.getLong(1))))
    try {
      ms.addData((1L, near1), (2L, near2))
      q.processAllAvailable()
      assert(results.toSet == Set((1L, 100L)),
        s"against corpus A only the A-near doc matches, got $results")
      // the periodic batch rebuild swaps the reference to corpus B —
      // the SAME running query must see it on its next micro-batch
      Streams.writeNearDupRef(Seq((200L, doc(2))).toDF("doc_id", "text"), refDir)
      results.clear()
      ms.addData((3L, near1), (4L, near2))
      q.processAllAvailable()
      assert(results.toSet == Set((4L, 200L)),
        s"after the swap the running query matches corpus B only, got $results")
    } finally q.stop()
  }

  test("refreshing repair stream: removal swap reaches the running query; redaction is per-row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val footerA = "subscribe to our newsletter"
    val footerB = "all rights reserved 2026"
    val refDir = "/tmp/graft-test/repair_ref_swap"
    // reference corpus A: only footerA is boilerplate (4 docs > maxDocs 2)
    Streams.writeLineRepairRef(
      (1 to 4).map(i => (100L + i, s"body $i\n$footerA")).toDF("doc_id", "text"), refDir)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.repairStreamRefreshing(
      ms.toDF().toDF("doc_id", "text"), refDir,
      (df, _) => results ++= df.collect().map(r =>
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(6))))
    try {
      // arrival 1 carries footerA (known boilerplate) AND an email;
      // arrival 2 carries footerB (NOT yet boilerplate)
      ms.addData((1L, s"keep one a@b.co\n$footerA"), (2L, s"keep two\n$footerB"))
      q.processAllAvailable()
      val b1 = results.map { case (id, nr, ne, t) => id -> ((nr, ne, t)) }.toMap
      assert(b1(1L) == ((1L, 1L, "keep one <EMAIL>")),
        s"footerA removed, email redacted: ${b1(1L)}")
      assert(b1(2L) == ((0L, 0L, s"keep two\n$footerB")),
        s"footerB not yet boilerplate: ${b1(2L)}")
      // the periodic batch rebuild now also knows footerB — the SAME
      // running query must pick it up on its next micro-batch
      Streams.writeLineRepairRef(
        ((1 to 4).map(i => (100L + i, s"body $i\n$footerA")) ++
          (1 to 4).map(i => (200L + i, s"other $i\n$footerB"))).toDF("doc_id", "text"),
        refDir)
      results.clear()
      ms.addData((3L, s"keep three\n$footerB"))
      q.processAllAvailable()
      assert(results.map(r => (r._1, r._2, r._4)).toList == List((3L, 1L, "keep three")),
        s"after the swap footerB is removed without restart: $results")
    } finally q.stop()
  }

  test("stream_curate: batch-mode run of the literal fold equals the streamed run") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val body = (0 until 30).map(i => s"tok$i").mkString(" ")
    // (doc_id, text, lang, ts): keeper of the dup family arrives FIRST
    // (min ts is also min doc_id, matching curateInput's monotone rule);
    // rows cover all four verdicts plus the NULL-lang branch.
    def t(m: Long) = new Timestamp(1700000000000L + m * 60000L)
    val rows = Seq(
      (1L, body, "en", t(0)),               // kept (keeper of the family)
      (2L, body, "en", t(1)),               // exact_dup, same micro-batch
      (3L, "tiny doc", "en", t(2)),         // too_short
      (4L, body + " unique4", "fr", t(3)),  // wrong_lang
      (5L, body, "en", t(10)),              // exact_dup, LATER micro-batch (state path)
      (6L, body + " unique6", null.asInstanceOf[String], t(4))) // NULL lang => wrong_lang
    val batchRun = Streams.curateStream(
      rows.toDF("doc_id", "text", "lang", "ts"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val ms = MemoryStream[(Long, String, String, Timestamp)]
    val q = Streams.curateStream(ms.toDF().toDF("doc_id", "text", "lang", "ts"))
      .writeStream.format("memory").queryName("graft_curate_twin")
      .outputMode("append").start()
    try {
      ms.addData(rows.take(4): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(4): _*)
      q.processAllAvailable()
      val streamed = spark.table("graft_curate_twin")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batchRun, s"batch-mode fold must equal streamed: $streamed vs $batchRun")
      assert(batchRun == Set(
        (1L, "kept"), (2L, "exact_dup"), (3L, "too_short"),
        (4L, "wrong_lang"), (5L, "exact_dup"), (6L, "wrong_lang")))
    } finally q.stop()
  }

  test("nearDupBatchMd5 flags planted near-dups of the corpus and nothing else") {
    import spark.implicits._
    def doc(seed: Int) = {
      val r = new scala.util.Random(seed)
      Seq.fill(80)(s"w${r.nextInt(40)}").mkString(" ")
    }
    val corpus = Seq((100L, doc(1)), (200L, doc(2))).toDF("doc_id", "text")
    val arrivals = Seq(
      (10L, doc(1).split(" ").updated(40, "CHANGED").mkString(" ")), // near-dup of 100
      (20L, doc(3))                                                   // unrelated
    ).toDF("doc_id", "text")
    val out = Streams.nearDupBatchMd5(arrivals, corpus)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((10L, true), (20L, false)), s"got ${out.toSeq}")
    val hit = out.find(_._1 == 10L).get
    assert(hit._3 == 1L && hit._4 >= 0.5, s"one partner above tau: $hit")
    assert(out.find(_._1 == 20L).get._4 == 0.0)
  }

  test("streaming decontamination flags arrivals against the static benchmark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val bench = Seq(
      (100L, "held out benchmark question about spark joins here"),
      (101L, "another eval passage with distinctive token sequences"),
    ).toDF("doc_id", "text")
    // the quoted arrival embeds bench 100's full 8-token text verbatim
    // (decontam n-grams are 8 tokens wide)
    val quoted = "prefix words then held out benchmark question about spark joins here and more"
    val clean = "completely unrelated corpus text body with plenty of tokens"
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.decontamStream(ms.toDF().toDF("doc_id", "text", "ts"), bench)
      .writeStream.format("memory").queryName("graft_decontam_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, quoted, ts(0)), (2L, clean, ts(1)))
      q.processAllAvailable()
      val got = spark.table("graft_decontam_stream").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L), s"quoted doc flags, clean doc passes: got $got")
      // re-arrival within the watermark horizon emits nothing new
      ms.addData((1L, quoted, ts(2)))
      q.processAllAvailable()
      assert(spark.table("graft_decontam_stream").count() == 1L)
    } finally q.stop()
  }

  test("refreshing decontamination gate picks up a GROWN benchmark suite WITHOUT restart") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val benchA = Seq((100L, "held out benchmark question about spark joins here")).toDF("doc_id", "text")
    // suite B: A plus a NEW eval that landed after the stream started
    val benchB = Seq(
      (100L, "held out benchmark question about spark joins here"),
      (101L, "fresh evaluation passage with eight distinctive ordered tokens inside"),
    ).toDF("doc_id", "text")
    val quotesA = "prefix words then held out benchmark question about spark joins here and more"
    val quotesB = "body embedding fresh evaluation passage with eight distinctive ordered tokens inside verbatim"
    val refDir = "/tmp/graft-test/decontam_ref_swap"
    Streams.writeDecontamRef(benchA, refDir)
    val results = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.decontamStreamRefreshing(
      ms.toDF().toDF("doc_id", "text"), refDir,
      (df, _) => results ++= df.collect().map(_.getLong(0)))
    try {
      ms.addData((1L, quotesA), (2L, quotesB))
      q.processAllAvailable()
      assert(results.toSet == Set(1L),
        s"against suite A only the A-quoter flags, got $results")
      // the monthly benchmark refresh lands eval 101 — the SAME running
      // gate must flag its quoters on the next micro-batch
      Streams.writeDecontamRef(benchB, refDir)
      results.clear()
      ms.addData((3L, quotesA), (4L, quotesB))
      q.processAllAvailable()
      assert(results.toSet == Set(3L, 4L),
        s"after the refresh both suites' quoters flag, got $results")
    } finally q.stop()
  }

  test("streaming SCD2 closes intervals across micro-batches; twin parity at sf0.001") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import streaming.Streams.Scd2Event
    val ms = MemoryStream[Scd2Event]
    val q = Streams.scd2Stream(ms.toDS())
      .writeStream.format("memory").queryName("graft_scd2_stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 A->A->B (closes A at the B arrival)
      ms.addData(
        Scd2Event(1L, 1L, 1000L, "A"), Scd2Event(1L, 2L, 2000L, "A"),
        Scd2Event(1L, 3L, 3000L, "B"))
      q.processAllAvailable()
      val v1 = spark.table("graft_scd2_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      assert(v1.toSeq == Seq((1L, 1L, "A", 1000L, 3000L)), s"got ${v1.toSeq}")
      // batch 2: the change arrives later — state spans micro-batches
      ms.addData(Scd2Event(1L, 4L, 5000L, "A"))
      q.processAllAvailable()
      val v2 = spark.table("graft_scd2_stream").collect()
        .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
      assert(v2 == Set((1L, "A", 1000L, 3000L), (2L, "B", 3000L, 5000L)), s"got $v2")
    } finally q.stop()

    // twin parity: fold the real sf0.001 events through the SAME step and
    // compare against the batch window form
    val sf = "/root/testdata/sf0.001"
    val events = operators.Events.withEventTime(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"),
        col("event_type"))
      .as[Scd2Event].collect()
    val folded = events.groupBy(_.user_id).toSeq.flatMap { case (uid, evs) =>
      Streams.foldScd2(uid, evs.toSeq, None)._1
    }.map(r => (r.user_id, r.version, r.state, r.valid_from_ms, r.valid_to_ms)).toSet
    val batch = Streams.qScd2.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
    assert(folded == batch, "stream fold and batch windows state the same rule")
  }

  test("streaming transitions span micro-batches; twin parity at sf0.001") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import streaming.Streams.{TransEvent, Transition}
    val ms = MemoryStream[TransEvent]
    val q = Streams.transitionStream(ms.toDS())
      .writeStream.format("memory").queryName("graft_trans_stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 A->B; user 2 first event only (no emission)
      ms.addData(
        TransEvent(1L, 1L, 1000L, "A"), TransEvent(1L, 2L, 2000L, "B"),
        TransEvent(2L, 3L, 1000L, "A"))
      q.processAllAvailable()
      val v1 = spark.table("graft_trans_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      assert(v1.toSeq == Seq((1L, 2L, "A", "B", 1000L)), s"got ${v1.toSeq}")
      // batch 2: user 2's next event pairs against state from batch 1
      ms.addData(TransEvent(2L, 4L, 4000L, "C"))
      q.processAllAvailable()
      val v2 = spark.table("graft_trans_stream").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getLong(4))).toSet
      assert(v2 == Set((1L, "A", "B", 1000L), (2L, "A", "C", 3000L)), s"got $v2")
    } finally q.stop()

    // twin parity: fold the real sf0.001 events through the SAME step and
    // compare against the batch lag-window form
    val sf = "/root/testdata/sf0.001"
    val events = operators.Events.withEventTime(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"),
        col("event_type"))
      .as[TransEvent].collect()
    val folded = events.groupBy(_.user_id).toSeq.flatMap { case (uid, evs) =>
      Streams.foldTransitions(uid, evs.toSeq, None)._1
    }.map(t => (t.user_id, t.event_id, t.from_type, t.to_type, t.gap_ms)).toSet
    val batch = Streams.qTransitions.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4))).toSet
    assert(folded == batch, "stream fold and batch lag window state the same rule")
  }

  test("streaming rate limit evicts across micro-batches; twin parity at sf0.001") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import streaming.Streams.{RateEvent, RateViolation}
    val D = 86400000L
    val ms = MemoryStream[RateEvent]
    val q = Streams.rateLimitStream(ms.toDS())
      .writeStream.format("memory").queryName("graft_rate_stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 fires 6 events within an hour -> the 6th violates
      ms.addData((1L to 6L).map(i => RateEvent(1L, i, i * 60000L)): _*)
      q.processAllAvailable()
      val v1 = spark.table("graft_rate_stream").collect()
        .map(r => (r.getLong(1), r.getLong(3))).toSet
      assert(v1 == Set((6L, 6L)), s"6th event in the hour violates, got $v1")
      // batch 2: a day later the window has drained — one event is clean,
      // proving eviction survived the micro-batch boundary
      ms.addData(RateEvent(1L, 7L, 2 * D))
      q.processAllAvailable()
      assert(spark.table("graft_rate_stream").count() == 1L,
        "post-drain arrival must not violate")
    } finally q.stop()

    // twin parity: fold the real sf0.001 events and compare to the batch
    // RANGE-frame form
    val sf = "/root/testdata/sf0.001"
    val events = operators.Events.withEventTime(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      .as[RateEvent].collect()
    val folded = events.groupBy(_.user_id).toSeq.flatMap { case (uid, evs) =>
      Streams.foldRateLimit(uid, evs.toSeq, Seq.empty)._1
    }.map(v => (v.user_id, v.event_id, v.ts_ms, v.n_24h)).toSet
    val batch = Streams.qRateLimit.run(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(folded == batch, s"stream fold and batch RANGE frame state the same rule " +
      s"(fold ${folded.size} vs batch ${batch.size})")
  }

  test("bounded-state rate limit: ring stream evicts across micro-batches; twin parity at sf0.001") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import streaming.Streams.{RateEvent, RateRing}
    val D = 86400000L
    val ms = MemoryStream[RateEvent]
    val q = Streams.rateLimitRingStream(ms.toDS())
      .writeStream.format("memory").queryName("graft_ratering_stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 fires 6 events within an hour -> the 6th violates
      ms.addData((1L to 6L).map(i => RateEvent(1L, i, i * 60000L)): _*)
      q.processAllAvailable()
      val v1 = spark.table("graft_ratering_stream").collect()
        .map(r => (r.getLong(1), r.getLong(3))).toSet
      assert(v1 == Set((6L, 6L)), s"6th event in the hour violates, got $v1")
      // batch 2: a day later the ring has drained — clean arrival proves
      // bucket eviction survived the micro-batch boundary
      ms.addData(RateEvent(1L, 7L, 2 * D))
      q.processAllAvailable()
      assert(spark.table("graft_ratering_stream").count() == 1L,
        "post-drain arrival must not violate")
    } finally q.stop()

    // twin parity: fold the real sf0.001 events through the ring fold and
    // compare to the batch prefix-sum + bucket-carry form
    val sf = "/root/testdata/sf0.001"
    val events = operators.Events.withEventTime(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      .as[RateEvent].collect()
    val folded = events.groupBy(_.user_id).toSeq.flatMap { case (uid, evs) =>
      Streams.foldRateLimitRing(uid, evs.toSeq, None)._1
    }.map(v => (v.user_id, v.event_id, v.ts_ms, v.n_24h)).toSet
    val batch = Streams.qRateLimitBucketed.run(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(folded == batch, s"ring fold and batch bucket-carry form state the same rule " +
      s"(fold ${folded.size} vs batch ${batch.size})")
    // every held state is ring-sized no matter the user's volume
    events.groupBy(_.user_id).foreach { case (uid, evs) =>
      val st = Streams.foldRateLimitRing(uid, evs.toSeq, None)._2
      assert(st.counts.size == Streams.RateRingBuckets)
    }
  }

  test("rows behind the watermark are dropped before the fold (late-row rule)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import streaming.Streams.RateEvent
    // with maxLateness = 0 the watermark sits at the previous batch's max
    // event time; a later micro-batch's OLDER row must be dropped by the
    // engine before the fold sees it — observable here because the fold
    // WOULD emit a violation for it (6 in-window entries + itself = 7)
    val ms = MemoryStream[RateEvent]
    val q = Streams.rateLimitStream(ms.toDS())
      .writeStream.format("memory").queryName("graft_rate_late")
      .outputMode("append").start()
    try {
      ms.addData((1L to 6L).map(i => RateEvent(1L, i, i * 60000L)): _*)
      q.processAllAvailable() // watermark -> 360000; the 6th event violates
      assert(spark.table("graft_rate_late").count() == 1L)
      ms.addData(RateEvent(1L, 7L, 30000L)) // behind the watermark
      q.processAllAvailable()
      assert(spark.table("graft_rate_late").count() == 1L,
        "a behind-watermark row must be dropped, not folded into a violation")
      // an in-order arrival still processes normally afterwards
      ms.addData(RateEvent(1L, 8L, 400000L))
      q.processAllAvailable()
      val last = spark.table("graft_rate_late").collect()
        .map(r => (r.getLong(1), r.getLong(3))).toSet
      assert(last == Set((6L, 6L), (8L, 7L)), s"got $last")
    } finally q.stop()
  }

  test("idle per-user state times out on event time and is rebuilt from scratch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import streaming.Streams.TransEvent
    val ms = MemoryStream[TransEvent]
    // short event-time idle horizon; production default 30d. Eviction is
    // driven by the WATERMARK (event time), never wall clock — later
    // events advance it, Thread.sleep cannot.
    val q = Streams.transitionStream(ms.toDS(), idleTimeout = "500 milliseconds")
      .writeStream.format("memory").queryName("graft_trans_timeout")
      .outputMode("append").start()
    try {
      ms.addData(TransEvent(1L, 1L, 1000L, "A"))
      q.processAllAvailable() // watermark -> 1000; user 1 timeout at 1500
      // an unrelated user's much-later event advances the watermark past
      // user 1's timeout; the post-batch timeout pass evicts user 1
      ms.addData(TransEvent(2L, 2L, 60000L, "B"))
      q.processAllAvailable()
      // user 1 returns: with state evicted this is a FIRST event again —
      // no pair emits (the documented idle-gap trade)
      ms.addData(TransEvent(1L, 3L, 120000L, "C"))
      q.processAllAvailable()
      val out = spark.table("graft_trans_timeout").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(out.isEmpty,
        s"timed-out user must restart with no last-seen state, got ${out.toSeq}")
      // control: user 1's NEXT event inside the horizon pairs normally,
      // proving the state was rebuilt (not permanently dead)
      ms.addData(TransEvent(1L, 4L, 120100L, "D"))
      q.processAllAvailable()
      val out2 = spark.table("graft_trans_timeout").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      assert(out2.toSeq == Seq((1L, 4L, 100L)),
        s"returning user must pair within the horizon, got ${out2.toSeq}")
    } finally q.stop()
  }

  test("stream_decontam batch twin equals the q44 contaminated set") {
    val sf = "/root/testdata/sf0.001"
    val twin = Streams.qDecontam.run(spark, sf).collect().map(_.getLong(0)).toSet
    val exact = operators.TrainPrep.q44.run(spark, sf)
      .filter(col("contaminated") === 1L)
      .collect().map(_.getLong(0)).toSet
    assert(twin == exact, "batch twin must equal the q44 decision")
  }

  test("streaming embedding near-dup flags a planted semantic copy; pair state dedups") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    val base = vec(1)
    val near = base.map(x => x + 0.01f) // cosine ~0.9999, well over tau
    val corpus = (Seq((100L, base)) ++ (101L to 105L).map(i => (i, vec(i.toInt))))
      .toDF("vec_id", "embedding")
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ms = MemoryStream[(Long, Timestamp, Array[Float])]
    val q = Streams.embNearDupStream(ms.toDF().toDF("vec_id", "ts", "embedding"), corpus)
      .writeStream.format("memory").queryName("graft_embneardup_stream")
      .outputMode("append").start()
    try {
      // batch 1: the near copy matches its source only; a fresh random
      // vector matches nothing (64-dim gaussians sit near cosine 0)
      ms.addData((1L, ts(0), near), (2L, ts(1), vec(999)))
      q.processAllAvailable()
      val rows = spark.table("graft_embneardup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.map(t => (t._1, t._2)).toSet == Set((1L, 100L)),
        s"planted semantic copy flags against its corpus source only, got ${rows.toSeq}")
      assert(rows.head._3 > 0.99, s"sim must be the exact float cosine, got ${rows.head._3}")
      // batch 2: re-delivery within the watermark horizon emits nothing new
      ms.addData((1L, ts(2), near))
      q.processAllAvailable()
      assert(spark.table("graft_embneardup_stream").count() == 1L)
    } finally q.stop()

    // batch-twin parity on the same arrivals: decision rows for BOTH
    val decisions = Streams.embNearDupBatch(
      Seq((1L, near), (2L, vec(999))).toDF("vec_id", "embedding"), corpus)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(decisions(1L) == ((true, 1L)) && decisions(2L) == ((false, 0L)),
      s"batch twin decisions must mirror the stream, got $decisions")
  }

  test("refreshing embedding near-dup stream picks up a rebuilt banded corpus WITHOUT restart") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    val baseA = vec(11)
    val baseB = vec(22)
    val nearA = baseA.map(x => x + 0.01f) // cosine ~0.9999 vs baseA
    val nearB = baseB.map(x => x + 0.01f)
    val refDir = "/tmp/graft-test/embneardup_ref_swap"
    // corpus A: baseA only
    Streams.writeEmbNearDupRef(Seq((100L, baseA)).toDF("vec_id", "embedding"), refDir)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[(Long, Array[Float])]
    val q = Streams.embNearDupStreamRefreshing(
      ms.toDF().toDF("vec_id", "embedding"), refDir,
      (df, _) => results ++= df.collect().map(r => (r.getLong(0), r.getLong(1))))
    try {
      ms.addData((1L, nearA), (2L, nearB))
      q.processAllAvailable()
      assert(results.toSet == Set((1L, 100L)),
        s"against corpus A only the A-near vector matches, got $results")
      // the periodic re-curation swaps the banded corpus to B — the SAME
      // running query must match against B on its next micro-batch
      Streams.writeEmbNearDupRef(Seq((200L, baseB)).toDF("vec_id", "embedding"), refDir)
      results.clear()
      ms.addData((3L, nearA), (4L, nearB))
      q.processAllAvailable()
      assert(results.toSet == Set((4L, 200L)),
        s"after the swap the running query matches corpus B only, got $results")
    } finally q.stop()
  }

  test("stream_emb_neardup driver gate returns one decision row per arrival") {
    val sf = "/root/testdata/sf0.001"
    val df = Streams.qEmbNearDup.run(spark, sf)
    val n = df.count()
    val arrivals = Tables.embeddings(spark, sf).filter(col("vec_id") % 10 === 0).count()
    assert(n == arrivals, "every arriving vector gets exactly one decision row")
  }
}
