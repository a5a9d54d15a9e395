package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteredSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  import sources.Clustered

  private val dir = "/tmp/graft-test/clustered"
  private val shuffledDir = "/tmp/graft-test/clustered_control"

  private def events = Tables.events(spark, "/root/testdata/sf0.01")
    .select(col("user_id"), col("event_id"), col("event_type"))

  test("clustered write: row-group key ranges are strictly disjoint; shuffled control is not") {
    Clustered.save(events, dir, "user_id", files = 8)
    // control: same data, layout-shuffled on an unrelated hash
    events.repartition(8, expr("hash(event_id)"))
      .write.mode("overwrite").parquet(shuffledDir)

    val clustered = Clustered.rowGroupRanges(spark, dir, "user_id")
    val control = Clustered.rowGroupRanges(spark, shuffledDir, "user_id")
    assert(clustered.size >= 8, s"expected >= 1 row group per file, got ${clustered.size}")
    assert(Clustered.overlappingPairs(clustered) == 0,
      s"clustered layout must have disjoint row-group ranges, got $clustered")
    // the control's row groups all span ~the whole user domain — the
    // stats exist but can skip nothing
    assert(Clustered.overlappingPairs(control) > control.size,
      s"control layout should overlap heavily, got ${Clustered.overlappingPairs(control)}")
  }

  test("z-order write: BOTH keys' row groups get tight stats; single-key layout gives the second key nothing") {
    val n = 100000L
    // two independent keys arriving shuffled — the layout must create
    // locality for both, from nothing
    val rows = spark.range(0, n).select(
      pmod(hash(col("id")).cast("long") * 2654435761L + col("id"), lit(n)).as("k0"),
      pmod(hash(col("id") + 7).cast("long") * 40503L + col("id") * 31, lit(n)).as("k1"),
      col("id").as("payload"))
      .localCheckpoint()
    val zDir = "/tmp/graft-test/clustered_z"
    val singleDir = "/tmp/graft-test/clustered_single"
    Clustered.saveZOrder(rows, zDir, "k0", "k1", files = 64)
    Clustered.save(rows, singleDir, "k0", files = 64)

    val v = n / 2
    val zK0 = Clustered.rowGroupRanges(spark, zDir, "k0")
    val zK1 = Clustered.rowGroupRanges(spark, zDir, "k1")
    val sK0 = Clustered.rowGroupRanges(spark, singleDir, "k0")
    val sK1 = Clustered.rowGroupRanges(spark, singleDir, "k1")
    assert(zK0.size == zK1.size && zK0.size >= 64)

    // single-key layout: k0 point predicate touches ~1 group; k1 gets
    // NOTHING (every group spans the whole k1 domain)
    assert(Clustered.touchedBy(sK0, v) <= 2,
      s"range-clustered k0 should touch ~1 group, got ${Clustered.touchedBy(sK0, v)}")
    assert(Clustered.touchedBy(sK1, v) == sK1.size,
      "the un-clustered key's stats must be useless in the single-key layout " +
        s"(got ${Clustered.touchedBy(sK1, v)} of ${sK1.size})")

    // z-order: BOTH keys skip most groups. With N groups the Morton
    // prefix gives each key ~sqrt(N) slabs -> a point touches ~sqrt(N)
    // of N (64 groups: theoretical 8; up to ~2x slack where sampled
    // file boundaries split Morton cells)
    val zT0 = Clustered.touchedBy(zK0, v)
    val zT1 = Clustered.touchedBy(zK1, v)
    info(s"z-order: k0 point touches $zT0 of ${zK0.size} groups, k1 touches $zT1 of ${zK1.size}")
    assert(zT0 <= zK0.size / 3, s"z-order k0 skipping collapsed: $zT0 of ${zK0.size}")
    assert(zT1 <= zK1.size / 3, s"z-order k1 skipping collapsed: $zT1 of ${zK1.size}")

    // layout changes nothing about results: identical rows, pushed predicates
    val back = spark.read.parquet(zDir)
    assert(back.count() == n)
    assert(back.agg(sum("k0"), sum("k1")).head ==
      rows.agg(sum("k0"), sum("k1")).head)
    val q = back.filter(col("k0") === v)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains(s"EqualTo(k0,$v)"),
      s"point predicate must push to the scan:\n$plan")
    assert(q.count() == rows.filter(col("k0") === v).count())
  }

  test("z_value2 kernel: quantile bucketing and Morton interleave (driver reference)") {
    import graft.functions.ZOrderKernels
    // bucketOf == count of boundaries <= v, on a hand-built array
    val bounds = Array(10L, 20L, 30L, 10L, 100L, 1000L) // two keys, stride 3
    assert(ZOrderKernels.bucketOf(5, bounds, 0, 3) == 0)
    assert(ZOrderKernels.bucketOf(10, bounds, 0, 3) == 1) // boundary inclusive
    assert(ZOrderKernels.bucketOf(25, bounds, 0, 3) == 2)
    assert(ZOrderKernels.bucketOf(999, bounds, 0, 3) == 3)
    assert(ZOrderKernels.bucketOf(99, bounds, 3, 3) == 1)
    // interleave: bit j of b0 -> 2j, of b1 -> 2j+1
    assert(ZOrderKernels.interleave2(0, 0, 2) == 0L)
    assert(ZOrderKernels.interleave2(3, 0, 2) == 5L) // 0b0101
    assert(ZOrderKernels.interleave2(0, 3, 2) == 10L) // 0b1010
    assert(ZOrderKernels.interleave2(2, 1, 2) == 6L) // 0b0110
    // the engine expression agrees with the driver kernel row for row
    val vals = spark.range(0, 1000).select(
      col("id").as("k0"), (col("id") * 37 % 1000).as("k1"))
    val got = vals.select(col("k0"), col("k1"),
      graft.gfunctions.z_value2(col("k0"), col("k1"), bounds2(1000, 7), 7).as("z"))
      .collect()
    got.foreach { r =>
      val want = ZOrderKernels.zValue2(r.getLong(0), r.getLong(1), bounds2(1000, 7), 7)
      assert(r.getLong(2) == want, s"(${r.getLong(0)}, ${r.getLong(1)}): ${r.getLong(2)} != $want")
    }
  }

  /** Equal-width boundaries over [0, n) for both keys — a deterministic
    * stand-in for the quantile sketch in kernel-identity tests.
    */
  private def bounds2(n: Long, stride: Int): Array[Long] = {
    val one = Array.tabulate(stride)(i => (i + 1) * n / (stride + 1))
    one ++ one
  }

  test("append/optimize lifecycle: appends degrade clustering monotonically, optimize restores it crash-safely") {
    val dir = "/tmp/graft-test/clustered_lifecycle"
    val all = events.localCheckpoint()
    val n = all.count()
    val Array(seed, b1, b2) = Array(
      all.filter(col("event_id") % 3 === 0),
      all.filter(col("event_id") % 3 === 1),
      all.filter(col("event_id") % 3 === 2))
    Clustered.save(seed, dir, "user_id", files = 8)
    assert(Clustered.overlappingPairs(Clustered.rowGroupRanges(spark, dir, "user_id")) == 0)

    // ingest: each batch is internally clustered but overlaps the
    // resident layout — quality degrades, rows are conserved
    Clustered.append(b1, dir, "user_id")
    val afterOne = Clustered.overlappingPairs(Clustered.rowGroupRanges(spark, dir, "user_id"))
    assert(afterOne > 0, "an appended batch must overlap the resident ranges")
    Clustered.append(b2, dir, "user_id")
    val afterTwo = Clustered.overlappingPairs(Clustered.rowGroupRanges(spark, dir, "user_id"))
    assert(afterTwo > afterOne, s"fragmentation must grow with appends: $afterOne -> $afterTwo")
    assert(Clustered.read(spark, dir).count() == n)

    val wantSum = all.agg(sum("user_id"), sum("event_id")).head

    // crash residue from a prior optimize — an incomplete generation and
    // abandoned batch staging — must not block or pollute this one
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_gen-7"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_batches/.b-junk"))

    Clustered.optimize(spark, dir, "user_id", files = 8)
    assert(Clustered.overlappingPairs(Clustered.rowGroupRanges(spark, dir, "user_id")) == 0,
      "optimize must restore a zero-overlap layout")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_gen-7")),
      "entry GC must sweep incomplete generation residue")
    assert(Clustered.read(spark, dir).count() == n &&
      Clustered.read(spark, dir).agg(sum("user_id"), sum("event_id")).head == wantSum,
      "optimize is layout-only: rows must be unchanged")
  }

  test("optimize re-run is idempotent and keeps exactly one live generation") {
    val dir = "/tmp/graft-test/clustered_crash_swap"
    val all = events.localCheckpoint()
    val n = all.count()
    Clustered.save(all, dir, "user_id", files = 8)
    val extra = all.limit(500).localCheckpoint()
    Clustered.append(extra, dir, "user_id")
    val wantSum = all.unionAll(extra).agg(sum("user_id"), sum("event_id")).head
    Clustered.optimize(spark, dir, "user_id", files = 8)
    Clustered.optimize(spark, dir, "user_id", files = 8)
    assert(Clustered.read(spark, dir).count() == n + 500 &&
      Clustered.read(spark, dir).agg(sum("user_id"), sum("event_id")).head == wantSum,
      "repeated optimize must not lose or duplicate rows")
    assert(Clustered.overlappingPairs(Clustered.rowGroupRanges(spark, dir, "user_id")) == 0)
    // storage discipline: the previous generation and the folded batch
    // data are GC'd — exactly one generation dir remains, no stragglers
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.Generations.allGens(fs, dir).size == 1,
      "old generations must be garbage-collected")
    assert(graft.sources.Generations.visibleBatches(fs, dir, "_batches").isEmpty,
      "folded batch data must be garbage-collected")
  }

  test("optimize to z-order: a fragmented single-key directory becomes a two-key-skippable one") {
    val dir = "/tmp/graft-test/clustered_lifecycle_z"
    val n = 100000L
    val rows = spark.range(0, n).select(
      pmod(hash(col("id")).cast("long") * 2654435761L + col("id"), lit(n)).as("k0"),
      pmod(hash(col("id") + 7).cast("long") * 40503L + col("id") * 31, lit(n)).as("k1"),
      col("id").as("payload"))
      .localCheckpoint()
    Clustered.save(rows.filter(col("payload") % 2 === 0), dir, "k0", files = 16)
    Clustered.append(rows.filter(col("payload") % 2 === 1), dir, "k0")
    Clustered.optimize(spark, dir, "k0", key1 = Some("k1"), files = 64)
    val v = n / 2
    val zK0 = Clustered.rowGroupRanges(spark, dir, "k0")
    val zK1 = Clustered.rowGroupRanges(spark, dir, "k1")
    assert(Clustered.touchedBy(zK0, v) <= zK0.size / 3,
      s"optimized z-order must skip on k0: ${Clustered.touchedBy(zK0, v)} of ${zK0.size}")
    assert(Clustered.touchedBy(zK1, v) <= zK1.size / 3,
      s"optimized z-order must skip on k1: ${Clustered.touchedBy(zK1, v)} of ${zK1.size}")
    assert(Clustered.read(spark, dir).count() == n)
  }

  test("bloom filters on a non-key lookup column: footer presence and point-probe skippability") {
    val bDir = "/tmp/graft-test/clustered_bloom"
    // cluster by user_id; event_id is the high-cardinality NON-key
    // column a point lookup would otherwise full-scan (its min/max
    // spans the whole domain in every row group)
    Clustered.save(events, bDir, "user_id", files = 8, bloomCols = Seq("event_id"))
    val someId = events.select("event_id").head.getLong(0)
    val (withBloom, negPresent, total) = Clustered.bloomStats(spark, bDir, "event_id", someId)
    assert(total > 0 && withBloom == total,
      s"every row group must carry an event_id bloom filter, got $withBloom of $total")
    // a PRESENT value: its own row group must be bloom-positive; the
    // rest are negative (skippable) modulo bloom false positives
    assert(negPresent < total, "the row group holding the value must stay positive")
    assert(negPresent >= total - 2,
      s"a point probe must skip nearly all foreign row groups, skipped $negPresent of $total")
    // an ABSENT value: (almost) everything is provably skippable
    val (_, negAbsent, _) = Clustered.bloomStats(spark, bDir, "event_id", -987654321L)
    assert(negAbsent >= total - 1,
      s"an absent value must be bloom-negative nearly everywhere, got $negAbsent of $total")
    // correctness under the filters, and the control: no bloomCols -> no filters
    assert(Clustered.read(spark, bDir).filter(col("event_id") === someId).count() ==
      events.filter(col("event_id") === someId).count())
    val (none, _, t2) = Clustered.bloomStats(spark, dir, "event_id", someId)
    assert(none == 0 && t2 > 0, "the default layout must carry no bloom filters")
    // appends and optimize keep the bloom discipline
    Clustered.append(events.limit(1000), bDir, "user_id", bloomCols = Seq("event_id"))
    Clustered.optimize(spark, bDir, "user_id", files = 8, bloomCols = Seq("event_id"))
    val (wb2, _, tot2) = Clustered.bloomStats(spark, bDir, "event_id", someId)
    assert(tot2 > 0 && wb2 == tot2, "optimize must re-write the bloom filters")
  }

  test("clustered round-trip loses nothing and the point predicate reaches the scan") {
    Clustered.save(events, dir, "user_id", files = 8)
    val back = Clustered.read(spark, dir)
    assert(back.count() == events.count())
    assert(back.agg(sum("user_id")).head.getLong(0) ==
      events.agg(sum("user_id")).head.getLong(0))

    val someUser = events.select("user_id").head.getLong(0)
    val q = back.filter(col("user_id") === someUser)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains(s"EqualTo(user_id,$someUser)"),
      s"point predicate must push to the parquet scan:\n$plan")
    assert(q.count() == events.filter(col("user_id") === someUser).count())
  }
}
