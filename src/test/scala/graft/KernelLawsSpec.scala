package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import scala.util.Random

import graft.functions.{BloomKernel, MgBuffer}

/** Randomized-but-seeded laws for the pure (no-Spark) kernels: the q50
  * ntile closed form over every n, Misra-Gries guarantees under arbitrary
  * streams and arbitrary partition splits, bloom-filter no-false-negatives
  * across geometries, and the SCD2 fold against a naive reference —
  * hundreds of generated cases per law, fixed seeds so failures reproduce.
  */
class KernelLawsSpec extends AnyFunSuite {

  /** q50's production decile formula (TrainPrep.curriculumProd). */
  private def closedFormBucket(r: Long, n: Long, b: Long): Long = {
    val q = n / b
    val rem = n % b
    if (r <= rem * (q + 1)) (r + q) / (q + 1)
    else rem + ((r - rem * (q + 1) + q - 1) / q)
  }

  /** ntile semantics per the SQL standard: first (n mod b) buckets get
    * ceil(n/b) rows, the rest floor(n/b).
    */
  private def ntileReference(n: Long, b: Long): Seq[Long] = {
    val q = n / b
    val rem = n % b
    (1L to b).flatMap(i => Seq.fill((if (i <= rem) q + 1 else q).toInt)(i))
  }

  test("q50 closed form equals ntile semantics for every rank, n = 1..500") {
    (1L to 500L).foreach { n =>
      val want = ntileReference(n, 10L)
      (1L to n).foreach { r =>
        assert(closedFormBucket(r, n, 10L) == want((r - 1).toInt), s"n=$n r=$r")
      }
    }
  }

  test("Misra-Gries: presence + lower-bound laws hold over 100 random streams") {
    val rnd = new Random(0xbead)
    (0 until 100).foreach { trial =>
      val k = 8 + rnd.nextInt(24)
      val n = 500 + rnd.nextInt(3000)
      val stream = Seq.fill(n)(
        if (rnd.nextInt(6) == 0) "heavy" else s"n${rnd.nextInt(50 + rnd.nextInt(400))}")
      val b = new MgBuffer(k)
      stream.foreach(s => b.offer(UTF8String.fromString(s), 1L))
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(b.counts.size <= k, s"trial $trial: state exceeded k")
      exact.foreach { case (item, c) =>
        val lower = b.counts.getOrElse(UTF8String.fromString(item), 0L)
        assert(lower <= c, s"trial $trial: $item overcounted")
        assert(c - lower <= n.toLong / (k + 1), s"trial $trial: $item undercount beyond n/(k+1)")
        if (c > n.toLong / (k + 1))
          assert(b.counts.contains(UTF8String.fromString(item)), s"trial $trial: heavy $item missing")
      }
    }
  }

  test("Misra-Gries: arbitrary partition splits merge to the same laws") {
    val rnd = new Random(0xfeed)
    (0 until 60).foreach { trial =>
      val k = 8 + rnd.nextInt(16)
      val n = 1000 + rnd.nextInt(2000)
      val stream = Seq.fill(n)(
        if (rnd.nextInt(4) == 0) "hot" else s"n${rnd.nextInt(300)}")
      val nParts = 1 + rnd.nextInt(6)
      val cuts = (Seq.fill(nParts - 1)(rnd.nextInt(n + 1)).sorted :+ n).prepended(0)
      val merged = new MgBuffer(k)
      cuts.sliding(2).foreach { case Seq(a, z) =>
        val part = new MgBuffer(k)
        stream.slice(a, z).foreach(s => part.offer(UTF8String.fromString(s), 1L))
        merged.mergeFrom(part)
      }
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(merged.counts.size <= k)
      exact.foreach { case (item, c) =>
        val lower = merged.counts.getOrElse(UTF8String.fromString(item), 0L)
        assert(lower <= c && c - lower <= n.toLong / (k + 1),
          s"trial $trial: merge broke the bound for $item (exact=$c lower=$lower)")
      }
    }
  }

  test("bloom: no false negative across 100 random key sets and geometries") {
    val rnd = new Random(0xb100)
    (0 until 100).foreach { trial =>
      val logBits = 10 + rnd.nextInt(7)
      val hashes = 1 + rnd.nextInt(8)
      val keys = Seq.fill(300)(rnd.nextLong())
      val bytes = new Array[Byte](1 << (logBits - 3))
      keys.foreach(kk => BloomKernel.set(bytes, kk, hashes))
      keys.foreach(kk =>
        assert(BloomKernel.contains(bytes, kk, hashes), s"trial $trial: false negative"))
    }
  }

  test("foldScd2 equals the naive interval walk for 200 random event streams") {
    import streaming.Streams.{foldScd2, Scd2Event}
    val rnd = new Random(0x5cd2)
    (0 until 200).foreach { trial =>
      val events = (0 until (1 + rnd.nextInt(60))).map { i =>
        Scd2Event(1L, i.toLong, rnd.nextInt(30).toLong, Seq("A", "B", "C")(rnd.nextInt(3)))
      }
      val sorted = events.sortBy(e => (e.ts_ms, e.event_id))
      val changes = sorted.foldLeft(Vector.empty[Scd2Event]) { (acc, e) =>
        if (acc.isEmpty || acc.last.event_type != e.event_type) acc :+ e else acc
      }
      val wantClosed = changes.zip(changes.drop(1)).zipWithIndex.map {
        case ((from, to), i) => (i + 1L, from.event_type, from.ts_ms, to.ts_ms)
      }
      val (closed, open) = foldScd2(1L, events, None)
      assert(closed.map(r => (r.version, r.state, r.valid_from_ms, r.valid_to_ms)) == wantClosed,
        s"trial $trial")
      assert(open.map(_.state) == changes.lastOption.map(_.event_type), s"trial $trial")
      // micro-batch split anywhere in event-time order: same closed set
      val cut = rnd.nextInt(sorted.size + 1)
      val (c1, st1) = foldScd2(1L, sorted.take(cut), None)
      val (c2, st2) = foldScd2(1L, sorted.drop(cut), st1)
      assert((c1 ++ c2).map(r => (r.version, r.state, r.valid_from_ms, r.valid_to_ms)) == wantClosed,
        s"trial $trial split at $cut")
      assert(st2.map(_.state) == open.map(_.state), s"trial $trial split at $cut")
    }
  }

  test("foldTransitions equals the naive pair walk for 200 random event streams") {
    import streaming.Streams.{foldTransitions, TransEvent}
    val rnd = new Random(0x7a45)
    (0 until 200).foreach { trial =>
      // distinct timestamps so the naive zip walk is unambiguous; the
      // (ts, event_id) tie rule itself is pinned by the batch twin parity
      val times = rnd.shuffle((0 until 120).toList).take(1 + rnd.nextInt(60))
      val events = times.zipWithIndex.map { case (t, i) =>
        TransEvent(1L, i.toLong, t.toLong, Seq("A", "B", "C")(rnd.nextInt(3)))
      }
      val sorted = events.sortBy(e => (e.ts_ms, e.event_id))
      val want = sorted.zip(sorted.drop(1)).map { case (p, e) =>
        (e.event_id, p.event_type, e.event_type, e.ts_ms - p.ts_ms)
      }
      val (out, st) = foldTransitions(1L, events, None)
      assert(out.map(t => (t.event_id, t.from_type, t.to_type, t.gap_ms)) == want, s"trial $trial")
      assert(st.map(_.event_type) == sorted.lastOption.map(_.event_type), s"trial $trial")
      // micro-batch split anywhere in event-time order: same feed
      val cut = rnd.nextInt(sorted.size + 1)
      val (o1, s1) = foldTransitions(1L, sorted.take(cut), None)
      val (o2, s2) = foldTransitions(1L, sorted.drop(cut), s1)
      assert((o1 ++ o2).map(t => (t.event_id, t.from_type, t.to_type, t.gap_ms)) == want,
        s"trial $trial split at $cut")
      assert(s2 == st, s"trial $trial split at $cut")
    }
  }

  test("foldTransitions drops late arrivals instead of emitting negative gaps") {
    import streaming.Streams.{foldTransitions, TransEvent}
    val (o1, s1) = foldTransitions(1L, Seq(TransEvent(1L, 10L, 5000L, "A")), None)
    assert(o1.isEmpty)
    // a later micro-batch delivers an OLDER event: no inverted pair, and
    // the last-seen state never regresses below the newest event
    val (o2, s2) = foldTransitions(1L, Seq(TransEvent(1L, 9L, 1000L, "B")), s1)
    assert(o2.isEmpty, "late arrival must not emit a negative-gap pair")
    assert(s2 == s1, "late arrival must not regress the last-seen state")
    // the next in-order event pairs against the retained newest state
    val (o3, _) = foldTransitions(1L, Seq(TransEvent(1L, 11L, 9000L, "C")), s2)
    assert(o3.map(t => (t.from_type, t.to_type, t.gap_ms)) == Seq(("A", "C", 4000L)))
  }

  test("foldRateLimitRing: naive bucket rule on 200 random streams, split-invariant, constant state") {
    import streaming.Streams.{foldRateLimitRing, RateEvent, RateBucketMs, RateRingBuckets}
    val rnd = new Random(0x52a7e)
    (0 until 200).foreach { trial =>
      // timestamps spread over ~3 days so buckets genuinely expire
      val n = 1 + rnd.nextInt(80)
      val events = (0 until n).map { i =>
        RateEvent(1L, i.toLong, rnd.nextLong(3L * 86400000L))
      }
      val sorted = events.sortBy(e => (e.ts_ms, e.event_id))
      // naive rule: ms-exact upper bound with tie-group atomicity, bucket-
      // granular lower bound — peers with bucket > bucket(t) - 1440, ts' <= t
      val want = sorted.flatMap { e =>
        val b = Math.floorDiv(e.ts_ms, RateBucketMs)
        val cnt = sorted.count(p =>
          p.ts_ms <= e.ts_ms && Math.floorDiv(p.ts_ms, RateBucketMs) > b - RateRingBuckets)
        if (cnt > 5) Some((e.event_id, e.ts_ms, cnt.toLong)) else None
      }
      val (out, st) = foldRateLimitRing(1L, events, None)
      assert(out.map(v => (v.event_id, v.ts_ms, v.n_24h)) == want, s"trial $trial")
      assert(st.counts.size == RateRingBuckets, s"trial $trial: state must stay ring-sized")
      assert(st.counts.sum == st.total, s"trial $trial: total mirrors the ring")
      // micro-batch split anywhere in event-time order: same feed, same state
      val cut = rnd.nextInt(sorted.size + 1)
      val (o1, s1) = foldRateLimitRing(1L, sorted.take(cut), None)
      val (o2, s2) = foldRateLimitRing(1L, sorted.drop(cut), Some(s1))
      assert((o1 ++ o2).map(v => (v.event_id, v.ts_ms, v.n_24h)) == want,
        s"trial $trial split at $cut")
      assert(s1.counts.size == RateRingBuckets && s2.counts.size == RateRingBuckets,
        s"trial $trial: state size is constant at every split point")
      assert(s2.total == st.total, s"trial $trial split at $cut")
    }
  }

  test("foldRateLimitRing: OUT-OF-ORDER micro-batch splits obey the documented late rules") {
    import streaming.Streams.{foldRateLimitRing, RateEvent, RateRing, RateBucketMs, RateRingBuckets}
    // Naive reference stating the DOCUMENTED late-data rule directly with
    // an unbounded bucket map (no ring aliasing): head = max bucket ever
    // seen and NEVER rewinds; advancing the head evicts buckets that left
    // the trailing window; an in-ring event (late or not) adds its tie
    // group to its bucket cell and reads the WHOLE live window — so a
    // late row's own n_24h is the documented conservative UPPER BOUND
    // that includes newer-bucket events; an aged-out event counts its own
    // group transiently without touching state.
    def naive(batches: Seq[Seq[RateEvent]], limit: Int)
        : (Seq[(Long, Long, Long)], Long, Map[Long, Long]) = {
      var head = Long.MinValue
      var cells = Map.empty[Long, Long]
      val out = Seq.newBuilder[(Long, Long, Long)]
      batches.foreach { batch =>
        val sorted = batch.sortBy(e => (e.ts_ms, e.event_id))
        var i = 0
        while (i < sorted.size) {
          val t = sorted(i).ts_ms
          var j = i
          while (j < sorted.size && sorted(j).ts_ms == t) j += 1
          val group = sorted.slice(i, j)
          val b = Math.floorDiv(t, RateBucketMs)
          if (head == Long.MinValue) head = b - 1
          if (b > head) {
            head = b
            cells = cells.filter { case (cb, _) => cb > head - RateRingBuckets }
          }
          val inRing = b > head - RateRingBuckets
          if (inRing) cells = cells.updated(b, cells.getOrElse(b, 0L) + group.size)
          val total = cells.valuesIterator.sum
          val n = if (inRing) total else total + group.size
          if (n > limit) group.foreach(e => out += ((e.event_id, t, n)))
          i = j
        }
      }
      (out.result(), head, cells)
    }
    val rnd = new Random(0x00d3a)
    (0 until 200).foreach { trial =>
      val n = 1 + rnd.nextInt(60)
      val events = (0 until n).map { i =>
        // clustered over ~2 days so in-ring lateness AND age-out both occur
        RateEvent(1L, i.toLong, rnd.nextLong(2L * 86400000L))
      }
      // shuffled assignment into contiguous batches: batches are mutually
      // OUT OF EVENT-TIME ORDER (unlike the split-invariance law, which
      // splits the sorted stream) — this is the replay shape an
      // unwatermarked out-of-order feed produces
      val shuffled = rnd.shuffle(events.toVector)
      val nBatches = 1 + rnd.nextInt(4)
      val cutPts = Vector.fill(nBatches - 1)(rnd.nextInt(n + 1)).sorted
      val batches = (Vector(0) ++ cutPts ++ Vector(n)).sliding(2)
        .map(w => shuffled.slice(w(0), w(1))).toVector.filter(_.nonEmpty)
      var st: Option[RateRing] = None
      val got = Vector.newBuilder[(Long, Long, Long)]
      var prevHead = Long.MinValue
      batches.foreach { batch =>
        val (o, s) = foldRateLimitRing(1L, batch, st)
        got ++= o.map(v => (v.event_id, v.ts_ms, v.n_24h))
        assert(s.lastBucket >= prevHead, s"trial $trial: head must never rewind")
        prevHead = s.lastBucket
        st = Some(s)
      }
      val (want, wantHead, wantCells) = naive(batches, 5)
      assert(got.result() == want, s"trial $trial: violation feed diverged from the documented rule")
      val fin = st.get
      assert(fin.lastBucket == wantHead, s"trial $trial: head mismatch")
      assert(fin.total == wantCells.valuesIterator.sum, s"trial $trial: total mismatch")
      def cell(b: Long): Int = (((b % RateRingBuckets) + RateRingBuckets) % RateRingBuckets).toInt
      ((wantHead - RateRingBuckets + 1) to wantHead).foreach { b =>
        assert(fin.counts(cell(b)) == wantCells.getOrElse(b, 0L),
          s"trial $trial: live cell $b mismatch")
      }
    }
  }

  test("foldRateLimitRing equals the exact fold on minute-aligned streams") {
    import streaming.Streams.{foldRateLimit, foldRateLimitRing, RateEvent, RateBucketMs}
    // on minute-aligned timestamps the bucket window IS the exact 24h
    // window, so the production ring fold and the oracle-semantics exact
    // fold must emit identical violation feeds
    val rnd = new Random(0xa11e)
    (0 until 100).foreach { trial =>
      val n = 1 + rnd.nextInt(80)
      val events = (0 until n).map { i =>
        RateEvent(1L, i.toLong, rnd.nextLong(3L * 1440L) * RateBucketMs)
      }
      val exact = foldRateLimit(1L, events, Seq.empty)._1
      val ring = foldRateLimitRing(1L, events, None)._1
      assert(ring.map(v => (v.event_id, v.ts_ms, v.n_24h)) ==
        exact.map(v => (v.event_id, v.ts_ms, v.n_24h)), s"trial $trial")
    }
  }

  test("model-array kernel expressions: STRUCTURAL equality (canonicalization law, r16 ADVICE)") {
    // Case-class equality on an Array field is reference-based, which
    // made two semantically identical kernel expressions never compare
    // equal — defeating Catalyst canonicalization / semanticEquals /
    // common-subexpression elimination whenever the same model-driven
    // column appears twice in a plan. ModelArrayEquality restores
    // case-class semantics with CONTENT comparison on primitive
    // arrays; this law pins it for every carrier.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
    import org.apache.spark.sql.types._
    import graft.functions._
    val vec = BoundReference(0, ArrayType(FloatType), nullable = true)
    val bin = BoundReference(1, BinaryType, nullable = true)
    val dbl = BoundReference(2, ArrayType(DoubleType), nullable = true)
    val int = BoundReference(3, IntegerType, nullable = true)
    val lng = BoundReference(4, LongType, nullable = true)
    def f(n: Int): Array[Float] = Array.tabulate(n)(_ * 0.5f)
    def l(n: Int): Array[Long] = Array.tabulate(n)(_ * 3L)
    // (twin with equal-CONTENT distinct arrays, structurally different twin)
    val cases: Seq[(String, Expression, Expression, Expression)] = Seq(
      ("NearestCentroid",
        NearestCentroid(vec, f(8), 2, 4), NearestCentroid(vec, f(8), 2, 4),
        NearestCentroid(vec, f(8).updated(0, 9f), 2, 4)),
      ("ZValue2",
        ZValue2(lng, lng, l(6), 3), ZValue2(lng, lng, l(6), 3),
        ZValue2(lng, lng, l(6).updated(5, 99L), 3)),
      ("MatVecF",
        MatVecF(vec, f(16), 4), MatVecF(vec, f(16), 4),
        MatVecF(vec, f(16).updated(3, 9f), 4)),
      ("PqCodes",
        PqCodes(vec, f(8), 2, 2), PqCodes(vec, f(8), 2, 2),
        PqCodes(vec, f(8).updated(1, 9f), 2, 2)),
      ("PqLut",
        PqLut(vec, f(8), 2, 2), PqLut(vec, f(8), 2, 2),
        PqLut(vec, f(8).updated(1, 9f), 2, 2)),
      ("PqResidCodes",
        PqResidCodes(vec, int, f(4), f(8), 2, 2),
        PqResidCodes(vec, int, f(4), f(8), 2, 2),
        PqResidCodes(vec, int, f(4).updated(0, 9f), f(8), 2, 2)),
      ("PqResidLut",
        PqResidLut(vec, f(4), f(8), 2, 2), PqResidLut(vec, f(4), f(8), 2, 2),
        PqResidLut(vec, f(4), f(8).updated(7, 9f), 2, 2)),
      ("PqResidSim",
        PqResidSim(bin, dbl, int, f(4), f(8), 2, 2),
        PqResidSim(bin, dbl, int, f(4), f(8), 2, 2),
        PqResidSim(bin, dbl, int, f(4), f(8).updated(0, 9f), 2, 2)),
      ("PqAsymSim",
        PqAsymSim(bin, vec, f(8), 2, 2), PqAsymSim(bin, vec, f(8), 2, 2),
        PqAsymSim(bin, vec, f(8).updated(2, 9f), 2, 2)),
      ("PqAdcSim",
        PqAdcSim(bin, dbl, f(8), 2, 2), PqAdcSim(bin, dbl, f(8), 2, 2),
        PqAdcSim(bin, dbl, f(8).updated(4, 9f), 2, 2)))
    for ((name, a, b, c) <- cases) {
      assert(a == b, s"$name: equal-content models must compare equal")
      assert(a.hashCode == b.hashCode, s"$name: equal twins must hash alike")
      assert(a.semanticEquals(b), s"$name: Catalyst semanticEquals must see the twin")
      assert(a != c, s"$name: differing model content must not compare equal")
      assert(Set[Expression](a, b, c).size == 2, s"$name: set dedup follows equality")
    }
    // cross-class guard: two different kernels over identical fields
    // must never alias (getClass gates the product walk)
    assert(PqCodes(vec, f(8), 2, 2) != PqLut(vec, f(8), 2, 2))
    // different child expression still breaks equality (the non-array
    // fields keep case-class semantics)
    val otherVec = BoundReference(5, ArrayType(FloatType), nullable = true)
    assert(NearestCentroid(vec, f(8), 2, 4) != NearestCentroid(otherVec, f(8), 2, 4))
  }
}
