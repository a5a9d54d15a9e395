package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-graph semantics for the link-graph operators: the exact
  * integer PageRank law (hand-computed sweep), mass conservation under
  * the truncation bound, BFS shortest-hop exactness with a shortcut
  * edge, and the edge-law shape.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  import operators.Graph

  private def nodes(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  private def edges(rows: (Long, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("src", "k", "dst")
  }

  private val S = Graph.PrScale

  test("pagerank: a 1-regular cycle is exactly stationary at PrScale") {
    // every node passes its whole mass on: pr' = 15%S + 85%S = S with
    // zero truncation loss (S divisible by 100) — the law's fixed point
    val g = Graph.pageRankOn(
      nodes(0L, 1L, 2L),
      edges((0L, 1L, 1L), (1L, 1L, 2L), (2L, 1L, 0L)),
      iters = 3)
    assert(g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(0L -> S, 1L -> S, 2L -> S))
  }

  test("pagerank: the PrScale envelope is enforced loudly (r18 ADVICE)") {
    // one node past N*PrScale < 2^63 — Spark's inbound SUM could wrap
    // negative where DuckDB aggregates in HUGEINT, so the entry must
    // refuse instead of silently forking engines. A range frame counts
    // without materializing rows, so the guard check itself is cheap.
    val tooMany = spark.range(Long.MaxValue / Graph.PrScale + 1)
      .withColumnRenamed("id", "doc_id")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankOn(tooMany, edges((0L, 1L, 1L)), iters = 1)
    }
    assert(e.getMessage.contains("envelope"))
  }

  test("pagerank: one sweep matches the hand-computed integer law") {
    // 0 -> {1, 2} (k=2), 1 -> 2 (k=1), 2 -> 2 self loop (k=1)
    // contrib: 0->1: S/2, 0->2: S/2, 1->2: S, 2->2: S
    // pr'(0) = base + 0; pr'(1) = base + 85*(S/2) DIV 100
    // pr'(2) = base + 85*(S/2 + S + S) DIV 100
    val g = Graph.pageRankOn(
      nodes(0L, 1L, 2L),
      edges((0L, 2L, 1L), (0L, 2L, 2L), (1L, 1L, 2L), (2L, 1L, 2L)),
      iters = 1)
    val base = Graph.PrBase
    val expected = Map(
      0L -> base,
      1L -> (base + 85L * (S / 2) / 100L),
      2L -> (base + 85L * (S / 2 + 2 * S) / 100L))
    assert(g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === expected)
  }

  test("pagerank: a 200k-leaf star hub stays exact where naive 85*m would overflow") {
    // every leaf (k=1) sends its whole mass to hub 0: m = 2e5 * 1e12 =
    // 2e17, so naive 85*m = 1.7e19 > 2^63-1 would wrap negative in
    // Spark and diverge from DuckDB's HUGEINT — the split-DIV identity
    // keeps intermediates at ~0.85*m. Hand law: hub = base + 85*(m/100).
    val nLeaves = 200000L
    val ids = spark.range(0, nLeaves + 1).select(col("id").as("doc_id"))
    val star = spark.range(1, nLeaves + 1)
      .select(col("id").as("src"), lit(1L).as("k"), lit(0L).as("dst"))
    val g = Graph.pageRankOn(ids, star, iters = 1)
    val hub = g.filter(col("doc_id") === 0L).collect()(0).getLong(1)
    val m = nLeaves * S
    // wrap check first so a regression to naive 85*m reports as the
    // overflow it is, not as a generic value mismatch
    assert(hub > 0L, "a wrapped-negative rank means the damping step overflowed")
    assert(hub === Graph.PrBase + 85L * (m / 100L), "hub must match the exact integer law")
    val leaf = g.filter(col("doc_id") === 1L).collect()(0).getLong(1)
    assert(leaf === Graph.PrBase, "leaves have no inbound edges")
  }

  private def wedges(rows: (Long, Long, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("src", "dst", "w", "sw")
  }

  test("weighted pagerank: weights steer mass, teleport lands on seeds only") {
    // 0 -> 1 (w=1), 0 -> 2 (w=3), sw(0)=4; 1 -> 0 and 2 -> 0 whole-mass.
    // Seeds = {0}: seedBase = 3*PrBase lands on 0 alone; 1 and 2 get
    // pure damped inbound. Hand law (all divisions exact at S=10^12):
    //   m(0) = 2S, m(1) = S/4, m(2) = 3S/4
    val g = Graph.weightedPageRankOn(
      nodes(0L, 1L, 2L),
      wedges((0L, 1L, 1L, 4L), (0L, 2L, 3L, 4L), (1L, 0L, 1L, 1L), (2L, 0L, 1L, 1L)),
      col("doc_id") === 0L,
      iters = 1)
    val expected = Map(
      0L -> (3L * Graph.PrBase + 85L * (2L * S) / 100L),
      1L -> 85L * (S / 4L) / 100L,
      2L -> 85L * (3L * S / 4L) / 100L)
    assert(g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === expected)
  }

  test("weighted pagerank: a 200k-leaf weighted star stays exact past naive 85*m") {
    // every leaf sends its whole mass to hub 0 through w = sw = 7 —
    // (pr*7) DIV 7 = pr exactly, and the split contribution law must
    // reproduce that without the 85*m overflow (m = 2e17)
    val nLeaves = 200000L
    val ids = spark.range(0, nLeaves + 1).select(col("id").as("doc_id"))
    val star = spark.range(1, nLeaves + 1)
      .select(col("id").as("src"), lit(0L).as("dst"), lit(7L).as("w"), lit(7L).as("sw"))
    val g = Graph.weightedPageRankOn(ids, star, col("doc_id") === 0L, iters = 1)
    val hub = g.filter(col("doc_id") === 0L).collect()(0).getLong(1)
    val m = nLeaves * S
    assert(hub > 0L, "a wrapped-negative rank means a contribution or damping overflow")
    assert(hub === (nLeaves + 1L) * Graph.PrBase + 85L * (m / 100L),
      "hub must match the exact integer law (full seedBase + damped star mass)")
    val leaf = g.filter(col("doc_id") === 1L).collect()(0).getLong(1)
    assert(leaf === 0L, "a non-seed leaf with no inbound edges holds zero mass")
  }

  test("weighted pagerank: empty seed set refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      Graph.weightedPageRankOn(
        nodes(0L, 1L), wedges((0L, 1L, 1L, 1L)), col("doc_id") < 0L, iters = 1)
    }
    assert(e.getMessage.contains("seed"))
  }

  test("weighted edge law: same topology as linkEdgesOn, w in [1,7], sw = sum(w)") {
    val ids = nodes(0L, 1L, 2L, 3L, 4L)
    val plain = Graph.linkEdgesOn(ids).select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val weighted = Graph.weightedEdgesOn(ids).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(weighted.map(t => (t._1, t._2)).sorted.toSeq === plain,
      "the weighted graph must share linkEdgesOn's exact topology")
    assert(weighted.forall(t => t._3 >= 1L && t._3 <= Graph.WeightMod),
      "w = 1 + (src + j) % 7 lands in [1, 7]")
    val swBySrc = weighted.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).sum }
    assert(weighted.forall(t => swBySrc(t._1) == t._4), "sw must be the per-src weight sum")
  }

  test("q103 crawl-priority keep set obeys the integer threshold law over q94 ranks") {
    val sf = "/root/testdata/sf0.001"
    val ranks = Graph.q94.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = Graph.q103.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.nonEmpty && kept.size < ranks.size,
      "the sample must keep a strict, non-empty subset at sf0.001")
    kept.foreach { case (id, pr) =>
      assert(ranks(id) === pr, "kept rows carry the q94 rank unchanged")
    }
    // recompute the keep law independently (md5 52-bit hash mod PrCap)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hv(id: Long): Long = {
      val h = md.digest(s"cps:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 13), 16)
    }
    ranks.foreach { case (id, pr) =>
      val expectKeep = hv(id) % Graph.PrCap < math.min(pr, Graph.PrCap)
      assert(kept.contains(id) === expectKeep,
        s"doc $id: keep decision must match the threshold law")
    }
  }

  test("q105 component hubs: top-K by rank within each planted component (r19)") {
    // two components: a 3-cycle {0,1,2} (stationary at S each — rank
    // ties resolve by doc_id) and a 2-leaf star {10,11,12} whose hub 10
    // out-ranks its leaves. HubsK=2 keeps exactly 2 per component.
    val g = Graph.componentHubsOn(
      nodes(0L, 1L, 2L, 10L, 11L, 12L),
      edges(
        (0L, 1L, 1L), (1L, 1L, 2L), (2L, 1L, 0L),
        (11L, 1L, 10L), (12L, 1L, 10L)))
    val got = g.collect().map(r => (r.getLong(1), r.getLong(3)) -> r.getLong(0)).toMap
    assert(got((0L, 1L)) === 0L && got((0L, 2L)) === 1L,
      "cycle ranks tie at S; doc_id breaks the tie deterministically")
    assert(got((10L, 1L)) === 10L,
      "the star hub holds both leaves' mass and ranks first")
    assert(got.size === 4, s"HubsK=2 per component, got $got")
  }

  test("q94 conserves mass to the truncation bound on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select(col("doc_id"))
    val e = Graph.linkEdgesOn(docs).localCheckpoint()
    val ranks = Graph.pageRankOn(docs, e, Graph.PrIters)
    val n = docs.count()
    val total = ranks.agg(sum("pr")).head().getLong(0)
    // each sweep sheds < k(u) ≤ 3 units per source (pr DIV k floor) and
    // < 100 units per node (the DIV 100) — never creates mass
    val maxLoss = Graph.PrIters.toLong * n * 103L
    assert(total <= n * S, s"mass created: $total > ${n * S}")
    assert(total >= n * S - maxLoss, s"mass lost beyond the floor bound: $total")
  }

  test("crawl depth: shortest hop distance with a shortcut, isolated node -1") {
    // chain 0->1->2->3->4 plus shortcut 0->3; node 5 isolated.
    // distances: 0,1,2,1(via shortcut),2(via 3),and -1
    val g = Graph.crawlDepthOn(
      nodes(0L, 1L, 2L, 3L, 4L, 5L),
      edges((0L, 2L, 1L), (0L, 2L, 3L), (1L, 1L, 2L), (2L, 1L, 3L), (3L, 1L, 4L)),
      seeds = col("doc_id") === 0L,
      iters = 4)
    assert(g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> -1L))
  }

  test("crawl depth: K rounds never report a depth beyond K; seeds stay 0") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select(col("doc_id"))
    val e = Graph.linkEdgesOn(docs).localCheckpoint()
    val dep = Graph.crawlDepthOn(docs, e, col("doc_id") % Graph.SeedMod === 0, Graph.BfsIters)
    val bad = dep.filter(col("depth") > Graph.BfsIters || col("depth") < -1).count()
    assert(bad === 0)
    val seedsOff = dep.filter(col("doc_id") % Graph.SeedMod === 0 && col("depth") =!= 0).count()
    assert(seedsOff === 0, "a seed lost its zero depth")
  }

  test("label propagation: two planted components resolve to their min ids") {
    // component A: 3-5-7 (chain), component B: 10-12; node 20 isolated.
    // diameter 2 < 6 rounds, so labels are the exact component minima.
    val g = Graph.labelPropOn(
      nodes(3L, 5L, 7L, 10L, 12L, 20L),
      edges((5L, 1L, 3L), (7L, 1L, 5L), (12L, 1L, 10L)),
      iters = Graph.CompIters)
    assert(g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 10L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("label propagation: K rounds reach exactly the K-hop neighborhood") {
    // chain 0-1-2-3-4: after 2 rounds node 3 sees min 1 (two hops),
    // not yet 0 (three hops) — the bounded-sweep law, not the fixpoint
    val chain = edges((0L, 1L, 1L), (1L, 1L, 2L), (2L, 1L, 3L), (3L, 1L, 4L))
    val two = Graph.labelPropOn(nodes(0L, 1L, 2L, 3L, 4L), chain, iters = 2)
    assert(two.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  test("label propagation: planted blocks resolve at broadcast-sweep scale (r21 regime)") {
    // 20,000 nodes > SweepClusterMinNodes (2^14): this run takes the
    // r21 broadcast-sweep path (dst-clustered static frame, per-round
    // hinted broadcast of the label frame) that no ≤sf0.01 gate
    // reaches — the planted blocks pin its results exactly. Edges
    // i → 4·(i div 4): every 4-node block collapses to its root
    // (undirected diameter 2 < 6 rounds), so comp(i) = 4·(i div 4).
    import spark.implicits._
    val n = 20000L
    val ids = spark.range(n).withColumnRenamed("id", "doc_id")
    val es = spark.range(n)
      .select(col("id").as("src"), lit(1L).as("k"),
        (col("id") - col("id") % 4).as("dst"))
    val got = Graph.labelPropOn(ids, es, iters = Graph.CompIters)
      .filter(col("comp") =!= col("doc_id") - col("doc_id") % 4).count()
    assert(got === 0L)
  }

  test("crawl depth: planted chain depths at broadcast-sweep scale (r21 regime)") {
    // 20,000-node forward chain with seeds every 4096 ids — the
    // broadcast-sweep BFS path: depth(v) = v mod 4096 when within the
    // 4-round budget, else unreached (-1).
    val n = 20000L
    val ids = spark.range(n).withColumnRenamed("id", "doc_id")
    val chain = spark.range(n - 1)
      .select(col("id").as("src"), lit(1L).as("k"), (col("id") + 1L).as("dst"))
    val bad = Graph.crawlDepthOn(ids, chain, col("doc_id") % 4096 === 0, iters = 4)
      .filter(col("depth") =!= when(col("doc_id") % 4096 <= 4,
        col("doc_id") % 4096).otherwise(lit(-1L))).count()
    assert(bad === 0L)
  }

  test("edge law: out-degree 1 + src % 3, dst within [0, N)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select(col("doc_id"))
    val n = docs.count()
    val e = Graph.linkEdgesOn(docs)
    val perSrc = e.groupBy("src").agg(count(lit(1)).as("deg"), first("k").as("k"))
    val wrongDeg = perSrc.filter(col("deg") =!= col("k") ||
      col("deg") =!= lit(1L) + col("src") % 3).count()
    assert(wrongDeg === 0)
    val outOfRange = e.filter(col("dst") < 0 || col("dst") >= n).count()
    assert(outOfRange === 0)
  }

  test("link graph from extracted links: planted topology — ids, out-degrees, shared-product component (r20)") {
    import spark.implicits._
    // page A = (cat 1, pg 2) -> products 10-1, 10-2
    // page B = (cat 2, pg 3) -> products 10-2 (SHARED with A), 20-1
    // page C = (cat 5, pg 1) -> product 30-3 only
    val links = Seq(
      (1L, 2L, "/p/10-1"), (1L, 2L, "/p/10-2"),
      (2L, 3L, "/p/10-2"), (2L, 3L, "/p/20-1"),
      (5L, 1L, "/p/30-3"),
    ).toDF("catalog", "page", "href")
    val (nodes, edges) = Graph.linkGraphFrom(links)

    // id laws: catpage = 2*(cat*64 + pg) even, product = 2*(ok*8 + ln)+1 odd
    val A = 2L * (1 * 64 + 2) // 132
    val B = 2L * (2 * 64 + 3) // 262
    val C = 2L * (5 * 64 + 1) // 642
    val p101 = 2L * (10 * 8 + 1) + 1 // 163
    val p102 = 2L * (10 * 8 + 2) + 1 // 165
    val p201 = 2L * (20 * 8 + 1) + 1 // 323
    val p303 = 2L * (30 * 8 + 3) + 1 // 487
    assert(nodes.collect().map(_.getLong(0)).toSet ===
      Set(A, B, C, p101, p102, p201, p303), "shared product appears once")
    assert(edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ===
      Set((A, p101, 2L), (A, p102, 2L), (B, p102, 2L), (B, p201, 2L), (C, p303, 1L)),
      "k = the page's REAL out-degree, not a synthetic fan-out")

    // the shared product MERGES A's and B's families; C stays apart
    val comp = Graph.labelPropOn(nodes, edges, Graph.CompIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(A, B, p101, p102, p201).map(comp) === Set(A),
      "pages sharing a product land in one family rooted at the min id")
    assert(comp(C) === p303 && comp(p303) === p303,
      "the isolated pair roots at its own min id (the odd product id is smaller)")

    // one PageRank sweep matches the hand law: products receive
    // 85% of (sum of pr/k over in-links), pages keep only the base
    val S = Graph.PrScale
    val pr1 = Graph.pageRankOn(nodes, edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr1(p102) === Graph.PrBase + 85L * (S / 2 + S / 2) / 100L,
      "the SHARED product accumulates both pages' halves")
    assert(pr1(p101) === Graph.PrBase + 85L * (S / 2) / 100L)
    assert(pr1(p303) === Graph.PrBase + 85L * S / 100L)
    assert(pr1(A) === Graph.PrBase && pr1(B) === Graph.PrBase && pr1(C) === Graph.PrBase,
      "catalog pages have no in-links — teleport mass only")
  }
}
