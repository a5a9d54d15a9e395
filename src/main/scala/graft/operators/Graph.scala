package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Link-graph analytics over the crawl catalog — the iterative-graph
  * surface a crawl pipeline needs beyond the flat frontier walk
  * (q29_crawl_frontier ranks by in-degree; scrap_tokopedia.py:190-204
  * walks catalog→product links one hop at a time): PageRank for crawl
  * prioritization / spam-mass weighting and BFS seed-distance for
  * crawl-depth budgeting.
  *
  * Both operators run in EXACT INTEGER arithmetic (the q85/q86
  * discipline): ranks are fixed-point mass units (`PrScale` per node),
  * every division is integral (`DIV` in Spark, `//` in DuckDB — both
  * truncate toward zero, identical on the non-negative domain), so K
  * unrolled iterations are ANSI-expressible and the whole iterative law
  * sits under the HARD gate — no float-convergence tolerance anywhere.
  *
  * The graph itself derives relationally from the documents table (the
  * q76 synthesize-then-operate pattern): node = document, out-degree
  * k(d) = 1 + d % 3, j-th edge d → (d·48271 + j·8191) mod N. Both
  * engines derive the SAME edge set from the same source columns, so
  * the gate grades the iterative law, not a stored graph.
  *
  * Scale shape (100 TB): each iteration is one (dst, contrib) shuffle
  * of 16-byte pairs plus one left join back to the node set — the
  * standard distributed PageRank plan. Edges are materialized ONCE
  * (localCheckpoint here; a parquet/bucketed edge table on a cluster —
  * co-bucketing edges and ranks by src would make the contribution
  * join shuffle-free) and every iteration's rank frame is a slim
  * (id, 8-byte) pair; document text never enters the loop. Iteration
  * count is fixed (K=5 / K=4) — at web scale PageRank runs a fixed
  * budget of sweeps, not to convergence.
  */
object Graph {

  /** Fixed-point mass per node: 10^12 units. Safe envelope: the worst
    * case (a star graph concentrating ALL mass on one hub) bounds any
    * inbound sum by the total mass N·PrScale, and the damping step is
    * computed overflow-free for any representable sum (the split-DIV
    * identity in [[pageRankOn]]), so the law is exact while
    * N·PrScale < 2^63 — ~9.2M nodes at 10^12. Per decade more nodes,
    * drop PrScale a decade (precision loss per sweep stays < 103/S of
    * a node's mass).
    */
  val PrScale = 1000000000000L

  /** Teleport mass per node per iteration: 15% of PrScale (damping
    * 0.85, the standard constant, as the exact pair 85/100).
    */
  val PrBase: Long = 15L * PrScale / 100L

  val PrIters = 5
  val BfsIters = 4

  /** Sweep-broadcast gate (r21): the per-sweep rank/label/depth frame
    * (N rows × 16 data bytes, ~32 B as a built hash relation) is
    * broadcast-hinted ONLY when a MEASURED node count sits under this
    * cap — 2^21 rows ≈ the session's 64 MB broadcast budget, far under
    * the 8 GB/512M-row hard cap. Below the cap the hint pins the build
    * side the planner cannot infer (the sweep frame's size estimate
    * explodes multiplicatively through the join→aggregate chain, so by
    * sweep 2 the planner broadcasts the EDGE frame instead and the
    * dst-clustered stream side goes unused); above it the hint is
    * absent and the join degrades to the planner's size-based choice —
    * never an ungated broadcast of an unbounded frame (the r20 ADVICE
    * rule; the count is already in hand from the envelope require).
    */
  private val SweepBroadcastMaxNodes = 1L << 21

  /** Lower bound of the broadcast-sweep regime: below this node count
    * the per-sweep aggregate exchange is a few hundred KB and the r20
    * shape (planner broadcasts the small static edge frame once,
    * sweeps pay one tiny exchange each) wins, because the broadcast
    * shape's K driver-collect/build/AQE-wave jobs carry a FIXED
    * ~100 ms-class overhead per sweep that dwarfs the bytes saved
    * (measured at sf0.1: q94/q98/q105 walls +0.3-0.7 s under the
    * unconditional broadcast shape, while q108/q109 — 50k nodes,
    * 0.5M/1.05M-row sweep frames — cut 53→42 / 104→44 MB of shuffle).
    * Between the two bounds the sweep frame is clustered by the
    * aggregate key and the rank frame is broadcast-hinted; outside
    * them the r20 shape runs unhinted.
    */
  private val SweepClusterMinNodes = 1L << 14

  private def sweepBc(n: Long)(df: DataFrame): DataFrame =
    if (n >= SweepClusterMinNodes && n <= SweepBroadcastMaxNodes) broadcast(df) else df

  /** The static sweep frame, shaped for the regime [[sweepBc]] picks:
    * clustered by the aggregate key inside the broadcast-sweep window,
    * untouched outside it (the clustering only pays off when the rank
    * side is the build side — under SMJ the edges re-exchange by the
    * join key anyway).
    */
  private def sweepFrame(n: Long, df: DataFrame, key: String): DataFrame =
    if (n >= SweepClusterMinNodes && n <= SweepBroadcastMaxNodes) clusterBy(df, key) else df

  /** Cluster the static sweep frame by the aggregate key with the
    * SESSION's shuffle-partition count pinned explicitly: a keyless
    * `repartition(col)` is AQE-coalescible, and the whole frame
    * (≤ a few tens of MB at local SFs) coalesces to ONE partition at
    * the 64 MB advisory size — serializing every sweep onto one core
    * (measured: q109 4.6 → 5.2 s). The pinned count comes from conf
    * (both mains derive it from SPARK_GRAFT_CPUS; a cluster session
    * sizes it to cores), so the parallelism stays scale-parameterized,
    * not hard-coded.
    */
  private def clusterBy(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, col(key))

  /** Seed law for BFS: every doc_id ≡ 0 (mod 97) is a crawl seed. */
  val SeedMod = 97L

  /** Edge-law multipliers (MINSTD's 48271 for spread; 8191 = 2^13−1
    * offsets the per-source fan-out). Any co-prime pair works — the
    * gate only needs both engines to agree.
    */
  val EdgeMulA = 48271L
  val EdgeMulJ = 8191L

  // --------------------------------------------------------- edge law

  /** The Scala rendering of the edge law (SQL twin: [[edgesCte]]).
    * `nodes` must carry a non-negative BIGINT `doc_id`; dst lands in
    * [0, N) which is the id domain itself when ids are contiguous
    * (the documents table's shape). The 1-row count cross join is the
    * q35 scalar-subquery shape — a broadcast of one row, not a data
    * join.
    */
  def linkEdgesOn(nodes: DataFrame): DataFrame =
    edgesRaw(nodes).select("src", "k", "dst")

  /** The edge generator WITH the per-source fan-out index `j` kept —
    * the weighted family derives its edge weights from (src, j), and
    * keeping the dst law in exactly one place means the weighted and
    * unweighted graphs can never disagree on topology. [[linkEdgesOn]]
    * projects j away, and column pruning removes it from every
    * unweighted plan (verified: the q94/q95/q98 shuffle bytes are
    * unchanged by this refactor).
    */
  private def edgesRaw(nodes: DataFrame): DataFrame = {
    val n = nodes.agg(count(lit(1)).cast("long").as("n"))
    nodes
      .select(col("doc_id").as("src"), (lit(1L) + col("doc_id") % 3).as("k"))
      .select(col("src"), col("k"), explode(sequence(lit(1L), col("k"))).as("j"))
      .crossJoin(broadcast(n))
      .select(col("src"), col("k"), col("j"),
        ((col("src") * EdgeMulA + col("j") * EdgeMulJ) % col("n")).as("dst"))
  }

  /** Edge-weight modulus: w(u→v) = 1 + (src + j) % 7 ∈ [1, 7]. Any
    * small positive law works — the gate only needs both engines to
    * agree, and w ≤ 7 keeps every weighted-contribution intermediate
    * inside the split-DIV safety argument ([[weightedPageRankOn]]).
    */
  val WeightMod = 7L

  /** The weighted edge frame: (src, dst, w, sw) with sw = Σ_out w —
    * the denominator of the weighted contribution law, attached here
    * ONCE (a window over src; on a cluster the edge table is built
    * once and persisted bucketed-by-src, so this shuffle is a
    * build-time cost, never a per-sweep one). sw ≥ 1 always (k ≥ 1,
    * w ≥ 1), so the sweep division is total.
    */
  def weightedEdgesOn(nodes: DataFrame): DataFrame =
    edgesRaw(nodes)
      .select(col("src"), col("dst"),
        (lit(1L) + (col("src") + col("j")) % WeightMod).as("w"))
      .withColumn("sw", sum("w").over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))

  /** The ONE SQL rendering of the edge law, CTE names prefixed with
    * `p` — composable into statements that already define `edges`/`nn`
    * (the train_prep_e2e oracle's dup-cluster chain defines `edges`).
    * Defines `<p>nn`, `<p>eraw`, `<p>edges(src, k, dst)`.
    */
  private[graft] def edgesCteP(p: String): String =
    s"""${p}nn AS (SELECT COUNT(*) AS n FROM documents),
      ${p}eraw AS (
        SELECT doc_id AS src, CAST(1 + doc_id % 3 AS BIGINT) AS k,
               CAST(unnest(range(1, 2 + CAST(doc_id % 3 AS INTEGER))) AS BIGINT) AS j
        FROM documents),
      ${p}edges AS (
        SELECT e.src, e.k, e.j, (e.src * $EdgeMulA + e.j * $EdgeMulJ) % ${p}nn.n AS dst
        FROM ${p}eraw e CROSS JOIN ${p}nn)"""

  /** The unprefixed edge chain, shared by the q94 and q95 oracles
    * (one rendering per law — the q89/q92/q93 discipline).
    */
  val edgesCte: String = edgesCteP("")

  /** SQL rendering of the weighted edge frame ([[weightedEdgesOn]]'s
    * twin) — defines CTE `wedges(src, dst, w, sw)` on top of `edges`.
    */
  val weightedEdgesCte: String =
    s"""wedges AS (
        SELECT src, dst, CAST(1 + (src + j) % $WeightMod AS BIGINT) AS w,
               CAST(SUM(1 + (src + j) % $WeightMod)
                    OVER (PARTITION BY src) AS BIGINT) AS sw
        FROM edges)"""

  // --------------------------------------------------------- pagerank

  /** K sweeps of exact-integer PageRank over an arbitrary (nodes,
    * edges) pair — the spec entry point (planted graphs inject here).
    *
    * Law per sweep (all integral, truncating division):
    *   contrib(u→v) = pr(u) DIV k(u)  for each edge u→v
    *   pr'(v) = PrBase + (85 · Σ_in contrib) DIV 100
    * Truncation sheds < k(u) units per source and < 100 units per node
    * per sweep — mass is conserved to that bound (spec-pinned), never
    * created.
    *
    * The damping term is EVALUATED as
    *   85·(m DIV 100) + (85·(m mod 100)) DIV 100
    * — identical value to (85·m) DIV 100 for every non-negative m
    * (m = 100q + r ⇒ floor(85m/100) = 85q + floor(85r/100)), but the
    * intermediate never exceeds ~0.85·m, so a skew hub absorbing the
    * graph's whole mass cannot overflow Int64 as long as the mass sum
    * itself is representable (the [[PrScale]] envelope). Both engine
    * renderings carry the same split — the law cannot fork. A
    * 200k-leaf star (whose naive 85·m would exceed 2^63) is
    * spec-pinned to the exact hand value.
    *
    * NOTE: EAGER — the envelope `require` runs one count job over the
    * id frame at call time (r18 hardening made this previously-lazy
    * entry point eager; callers composing it repeatedly should pass an
    * already-materialized node frame, as the registry path does).
    */
  def pageRankOn(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val ids = nodes.select(col("doc_id"))
    // ENFORCE the PrScale envelope (r18 ADVICE): beyond it Spark's
    // inbound SUM wraps negative while DuckDB aggregates in HUGEINT —
    // the engines would fork silently. One count job over a slim id
    // frame (the registry path hands in an already-materialized node
    // frame); an out-of-envelope run fails loudly with the remedy.
    val n = ids.count()
    require(n <= Long.MaxValue / PrScale,
      s"pageRankOn: $n nodes exceed the exact-integer envelope " +
        s"N*PrScale < 2^63 (max ${Long.MaxValue / PrScale} at PrScale=$PrScale); " +
        "drop PrScale a decade per decade of nodes (object doc) to stay exact.")
    // Zero-contribution rows — one per node, folded INTO the static
    // edge frame as k-NULL self-edges (r21; r20 unioned them under the
    // sweep aggregate): the self-edge joins the rank frame on src like
    // any edge and contributes coalesce(pr DIV NULL, 0) = 0, so
    // sum-per-dst is unchanged — {in-contribs} ∪ {0} exactly as before.
    // What the fold buys: the whole frame is now STATIC across sweeps,
    // so ONE repartition by dst (the sweep aggregate's key) clusters it
    // once — every sweep's groupBy(dst) is then exchange-free on top of
    // the single edge exchange, which ReuseExchange dedups across the K
    // identical subtree references. The r20 shape paid one exchange of
    // ~|E| partial-aggregated (dst, c) rows PER SWEEP (edges arrive in
    // scan order, so map-side combine barely collapses); now the loop
    // shuffles |E|+|N| rows ONCE and each sweep's aggregate emits |N|
    // rows with no exchange at all. Precondition (held by every caller
    // and pinned by the planted specs): every edge dst is a node —
    // otherwise the self-edge union would EMIT the foreign dst where
    // the old left join dropped it. Cluster note: the rank side rides a
    // broadcast locally (threshold-gated); where N is too big to
    // broadcast the sweeps degrade to SMJ-by-src and the dst clustering
    // goes unused — there the co-location answer is bucketed node/edge
    // TABLES (sources/Bucketed.scala), as before.
    val withSelf = edges.select(col("src"), col("dst"), col("k"))
      .unionAll(ids.select(col("doc_id").as("src"), col("doc_id").as("dst"),
        lit(null).cast("long").as("k")))
      .transform(sweepFrame(n, _, "dst"))
    var r = ids.select(col("doc_id"), lit(PrScale).as("pr"))
    for (_ <- 1 to iters) {
      r = withSelf
        .join(sweepBc(n)(r.select(col("doc_id").as("src_id"), col("pr"))),
          col("src") === col("src_id"))
        .select(col("dst"), coalesce(expr("pr DIV k"), lit(0L)).as("c"))
        .groupBy("dst")
        .agg(sum("c").as("m"))
        // m is never NULL here: every group holds its zero row and c is
        // non-null, so the old coalesce(m, 0) is the identity
        .select(
          col("dst").as("doc_id"),
          (lit(PrBase) + expr(
            "85 * (m DIV 100) + (85 * (m % 100)) DIV 100")).as("pr"))
      // NO per-sweep checkpoint here, deliberately: each sweep
      // references r exactly ONCE, so the K-sweep lineage is LINEAR
      // and stays one AQE plan — which reuses the edge-side exchange
      // across all K sweeps (ScaleProbe36: 21 MiB/sweep single-plan vs
      // 43 MiB/sweep checkpointed, identical results). At unbounded K
      // (not this operator's fixed-budget contract) a checkpoint every
      // ~10 sweeps would bound lineage depth.
    }
    r
  }

  /** Materialize the node and edge frames ONCE before the sweeps (the
    * parquet-edge-table load a cluster run starts from). Note what
    * this does NOT buy: Dataset.localCheckpoint surfaces as
    * UnknownPartitioning (measured — LogicalRDD drops the physical
    * partitioning), so a repartition BEFORE the checkpoint cannot make
    * the sweeps exchange-free. The r21 loops therefore repartition by
    * the aggregate key INSIDE the lazy sweep plan (after the
    * checkpoint), where ReuseExchange dedups the K identical subtrees
    * into one physical shuffle. Locally the rank/label frame rides a
    * broadcast (8 MB per 1M nodes) so the edge side never reshuffles
    * per sweep; on a cluster with >10^8 nodes the co-location answer
    * is bucketed node/edge TABLES (sources/Bucketed.scala), not
    * in-session repartition.
    */
  private[graft] def materializedGraph(docs: DataFrame): (DataFrame, DataFrame) = {
    val nodes = docs.localCheckpoint()
    // edges derive from the already-materialized nodes, not the source
    // plan — the edge generator and its 1-row count re-read the RDD,
    // never the parquet scan behind it
    val edges = linkEdgesOn(nodes).localCheckpoint()
    (nodes, edges)
  }

  private def pageRank(s: SparkSession, d: String): DataFrame = {
    val (nodes, edges) = materializedGraph(Tables.documents(s, d).select(col("doc_id")))
    pageRankOn(nodes, edges, PrIters)
  }

  /** The unrolled K-sweep CTE chain (`r0` … `r<iters>`) WITHOUT the
    * edge CTEs — composable beside other chains sharing [[edgesCte]]
    * (q103's filter, q105's per-component rank). `nodes`/`edges` name
    * the relations the sweep law runs over (r20: the REAL link graph
    * q108 reuses the SAME generated law over `lnodes`/`ledges` —
    * one rendering, two graphs).
    */
  private[graft] def pageRankCtes(
      iters: Int, nodes: String = "documents", edges: String = "edges"): String = {
    val sweeps = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS (
        SELECT n.doc_id,
          CAST($PrBase + 85 * (COALESCE(s.m, 0) // 100)
               + (85 * (COALESCE(s.m, 0) % 100)) // 100 AS BIGINT) AS pr
        FROM $nodes n LEFT JOIN (
          SELECT e.dst AS doc_id, SUM(r.pr // e.k) AS m
          FROM $edges e JOIN $prev r ON r.doc_id = e.src
          GROUP BY e.dst) s ON s.doc_id = n.doc_id)"""
    }.mkString(",\n")
    s"""r0 AS (SELECT doc_id, CAST($PrScale AS BIGINT) AS pr FROM $nodes),
      $sweeps"""
  }

  /** Unrolled SQL for K sweeps — same law, CTE per sweep. */
  private def pageRankSql(iters: Int): String =
    s"""WITH $edgesCte,
      ${pageRankCtes(iters)}
      SELECT doc_id, pr FROM r$iters ORDER BY doc_id"""

  val q94 = GraftQuery(
    "q94_pagerank",
    (s, d) => pageRank(s, d).orderBy("doc_id"),
    Some(pageRankSql(PrIters)),
    prod = Some((s, d) => pageRank(s, d)),
  )

  // -------------------------------- weighted / personalized pagerank

  /** K sweeps of WEIGHTED, PERSONALIZED exact-integer PageRank — the
    * spam-mass / crawl-priority variant: edge weights steer each
    * source's mass (contrib(u→v) = pr(u)·w(u→v) DIV Σw(u)) and the
    * teleport mass lands ONLY on the seed set instead of uniformly
    * (personalization — rank means "probability of being reached from
    * a trusted seed", the TrustRank shape).
    *
    * Law per sweep (all integral):
    *   contrib(u→v) = (pr(u)·w) DIV sw, EVALUATED as
    *                  w·(pr DIV sw) + (w·(pr mod sw)) DIV sw
    *   pr'(v) = [v ∈ seeds] · seedBase + (85 · Σ_in contrib) DIV 100
    * with seedBase = (N·PrBase) DIV |seeds| — the same total teleport
    * mass as q94 (15% of N·PrScale per sweep), concentrated on seeds.
    *
    * The contribution split is the same floor identity as the damping
    * split (pr = q·sw + r ⇒ floor(pr·w/sw) = q·w + floor(r·w/sw)),
    * and it is what keeps the law exact on skew: w ≤ sw bounds the
    * first term by pr itself, and the second by w·sw < 7·21 — so a
    * hub holding the graph's entire mass still computes overflow-free
    * inside the [[PrScale]] envelope (enforced here as in
    * [[pageRankOn]]). Per-node bound: pr ≤ seedBase + 0.85·N·PrScale
    * ≤ N·PrScale even with a single seed, so the envelope argument is
    * unchanged from q94's.
    */
  def weightedPageRankOn(
      nodes: DataFrame, wedges: DataFrame, seeds: Column, iters: Int): DataFrame = {
    val ids = nodes.select(col("doc_id"))
    // NOTE: eager — the envelope/seed requires run one aggregate job
    // over the slim id frame at call time (r19 ADVICE: node count and
    // seed count folded into ONE scan — count + conditional count —
    // instead of two separate count jobs).
    val cnt = ids.agg(
      count(lit(1)).cast("long").as("n"),
      count(when(seeds, lit(1))).cast("long").as("ns")).head()
    val n = cnt.getLong(0)
    require(n <= Long.MaxValue / PrScale,
      s"weightedPageRankOn: $n nodes exceed the exact-integer envelope " +
        s"N*PrScale < 2^63 (max ${Long.MaxValue / PrScale} at PrScale=$PrScale); " +
        "drop PrScale a decade per decade of nodes (object doc) to stay exact.")
    val nSeeds = cnt.getLong(1)
    require(nSeeds > 0, "weightedPageRankOn: the seed set is empty — " +
      "personalized teleport needs at least one seed node.")
    // N*PrBase < 0.15 * 2^63 inside the envelope — Long-safe
    val seedBase = n * PrBase / nSeeds
    // Same zero-row fold as [[pageRankOn]] (r21): w/sw-NULL self-edges
    // in the static frame (c = coalesce(NULL-arithmetic, 0) = 0)
    // replace the per-sweep zeros union, and one repartition by dst
    // makes every sweep's aggregate exchange-free over the single
    // reused edge exchange. The seed term applies in a second
    // projection (the first one mints `doc_id` from dst, so the seed
    // Column — written against `doc_id` — cannot resolve in it).
    val withSelf = wedges.select(col("src"), col("dst"), col("w"), col("sw"))
      .unionAll(ids.select(col("doc_id").as("src"), col("doc_id").as("dst"),
        lit(null).cast("long").as("w"), lit(null).cast("long").as("sw")))
      .transform(sweepFrame(n, _, "dst"))
    var r = ids.select(col("doc_id"), lit(PrScale).as("pr"))
    for (_ <- 1 to iters) {
      r = withSelf
        .join(sweepBc(n)(r.select(col("doc_id").as("src_id"), col("pr"))),
          col("src") === col("src_id"))
        .select(col("dst"),
          coalesce(expr("w * (pr DIV sw) + (w * (pr % sw)) DIV sw"), lit(0L)).as("c"))
        .groupBy("dst")
        .agg(sum("c").as("m"))
        .select(col("dst").as("doc_id"),
          expr("85 * (m DIV 100) + (85 * (m % 100)) DIV 100").as("dm"))
        .select(col("doc_id"),
          (when(seeds, lit(seedBase)).otherwise(lit(0L)) + col("dm")).as("pr"))
      // single self-reference per sweep — linear lineage, one AQE
      // plan, reused edge exchange (the q94 measurement, ScaleProbe36)
    }
    r
  }

  private def materializedWeightedGraph(docs: DataFrame): (DataFrame, DataFrame) = {
    val nodes = docs.localCheckpoint()
    val wedges = weightedEdgesOn(nodes).localCheckpoint()
    (nodes, wedges)
  }

  private def weightedPageRank(s: SparkSession, d: String): DataFrame = {
    val (nodes, wedges) =
      materializedWeightedGraph(Tables.documents(s, d).select(col("doc_id")))
    weightedPageRankOn(nodes, wedges, col("doc_id") % SeedMod === 0, PrIters)
  }

  /** Unrolled SQL for K weighted-personalized sweeps. The seed law is
    * q95's (doc_id ≡ 0 mod [[SeedMod]]) — crawl seeds ARE the trust
    * seeds. seedBase computes in SQL exactly as the Scala driver
    * scalar does (all BIGINT inside the envelope).
    */
  private def weightedPageRankSql(iters: Int): String = {
    val sweeps = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      s"""p$i AS (
        SELECT n.doc_id,
          CAST(CASE WHEN n.doc_id % $SeedMod = 0 THEN sb.sb ELSE 0 END
               + 85 * (COALESCE(s.m, 0) // 100)
               + (85 * (COALESCE(s.m, 0) % 100)) // 100 AS BIGINT) AS pr
        FROM documents n CROSS JOIN sb LEFT JOIN (
          SELECT e.dst AS doc_id,
            SUM(e.w * (r.pr // e.sw) + (e.w * (r.pr % e.sw)) // e.sw) AS m
          FROM wedges e JOIN $prev r ON r.doc_id = e.src
          GROUP BY e.dst) s ON s.doc_id = n.doc_id)"""
    }.mkString(",\n")
    s"""WITH $edgesCte,
      $weightedEdgesCte,
      sb AS (SELECT CAST(nn.n * $PrBase
                         // (SELECT COUNT(*) FROM documents WHERE doc_id % $SeedMod = 0)
                         AS BIGINT) AS sb FROM nn),
      p0 AS (SELECT doc_id, CAST($PrScale AS BIGINT) AS pr FROM documents),
      $sweeps
      SELECT doc_id, pr FROM p$iters ORDER BY doc_id"""
  }

  val q102 = GraftQuery(
    "q102_pagerank_weighted",
    (s, d) => weightedPageRank(s, d).orderBy("doc_id"),
    Some(weightedPageRankSql(PrIters)),
    prod = Some((s, d) => weightedPageRank(s, d)),
  )

  // ------------------------------------------ crawl-priority sampling

  /** Rank cap for the sampling probability: a doc holding ≥ 4× a
    * uniform share of mass is always kept; an average doc keeps at
    * ~25%. p = min(pr, PrCap) / PrCap.
    */
  val PrCap = 4L * PrScale

  /** Crawl-priority sampling — q94's rank composed into the q47
    * integer-threshold keep discipline: keep doc v iff
    *   hash52("cps:" + doc_id) mod PrCap < min(pr(v), PrCap)
    * i.e. with probability min(pr/PrCap, 1), deterministically,
    * content-independently, and identically in ANSI SQL. This is the
    * operator that points the graph family AT the training pipeline:
    * the kept set is a rank-proportional corpus slice (crawl-frontier
    * budget allocation / spam-mass downsampling), reproducible across
    * reruns like every q39/q41/q47 sampling law.
    *
    * Exactness note: hv is uniform on [0, 2^52) and PrCap does not
    * divide 2^52, so `hv mod PrCap` carries a modulo bias ≤
    * PrCap/2^52 ≈ 0.09% — irrelevant to the gate (both engines
    * compute the identical value) and negligible for the sampling
    * quality; the comparison itself stays in exact integers with no
    * overflow (both sides < 2^52 · small).
    */
  /** The ONE Scala rendering of the keep law over a (doc_id, pr)
    * frame — q103's standalone gate AND the train_prep_e2e rank
    * stage (r20, verdict item 5) filter through this exact Column.
    */
  private[graft] def crawlKeepOn(ranked: DataFrame): DataFrame = {
    val hv = conv(substring(md5(concat(lit("cps:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    ranked.filter(hv % lit(PrCap) < least(col("pr"), lit(PrCap)))
  }

  /** The ONE SQL rendering of the keep predicate (reads `doc_id` and
    * `pr` from the enclosing relation) — spliced by q103's oracle and
    * the e2e oracle alike.
    */
  private[graft] val crawlKeepPredSql: String =
    s"""CAST(('0x' || substr(md5('cps:' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
            % $PrCap < least(pr, $PrCap)"""

  /** The q103 kept-id frame over a CONTIGUOUS document id population
    * [0, N) — the pipeline-stage entry point (rank-weighted corpus keep
    * between quota and temperature in train_prep_e2e): q94's rank over
    * the materialized graph, filtered by [[crawlKeepOn]]. Returns slim
    * (doc_id, pr) rows for the kept set.
    *
    * PRECONDITION (r20 ADVICE): ids must be contiguous [0, N). The
    * generated edge law dst = (src·A + j·J) mod N only stays inside the
    * node set for contiguous ids; on a FILTERED population the sweep
    * law (zero-row self-edges since r20) would emit rows for phantom
    * dst ids the old left join used to drop. The registry caller feeds
    * the full documents id space (contiguous by construction);
    * train_prep_e2e's trainIds masks any non-member by its left-semi
    * join. A future caller with a filtered population must semi-join
    * the output back to its ids (slim, broadcastable) or renumber.
    */
  def crawlPriorityKeepOf(docs: DataFrame): DataFrame = {
    val (nodes, edges) = materializedGraph(docs.select(col("doc_id")))
    crawlKeepOn(pageRankOn(nodes, edges, PrIters)).select("doc_id", "pr")
  }

  private def crawlPrioritySample(s: SparkSession, d: String): DataFrame =
    crawlKeepOn(pageRank(s, d)).select("doc_id", "pr")

  /** q94's unrolled CTE body + the keep filter — the oracle composes
    * the standalone gate's own rendering (the q93 discipline).
    */
  private def crawlPrioritySql(iters: Int): String =
    s"""WITH $edgesCte,
      ${pageRankCtes(iters)}
      SELECT doc_id, pr FROM r$iters
      WHERE $crawlKeepPredSql
      ORDER BY doc_id"""

  val q103 = GraftQuery(
    "q103_crawl_priority",
    (s, d) => crawlPrioritySample(s, d).orderBy("doc_id"),
    Some(crawlPrioritySql(PrIters)),
    prod = Some((s, d) => crawlPrioritySample(s, d)),
  )

  // -------------------------------------------------------- BFS depth

  /** K rounds of BFS min-depth propagation from `seeds` (a boolean
    * Column over nodes): depth'(v) = min(depth(v), 1 + min over
    * in-edges of a reached u's depth). Unreached after K rounds
    * reports −1. Monotone non-increasing per node, so K rounds give
    * exact shortest hop-distance for every node within K hops of a
    * seed — the crawl-budget question ("what do K fetch waves reach")
    * answered exactly, not the unbounded fixpoint.
    */
  def crawlDepthOn(nodes: DataFrame, edges: DataFrame, seeds: Column, iters: Int): DataFrame = {
    val ids = nodes.select(col("doc_id"))
    // Self-loop trick (r20 optimization): extend the edge set with a
    // zero-increment self-edge per node, so one round is
    //   depth'(v) = MIN over (u, v, inc) ∈ edges∪self of depth(u) + inc
    // — MIN skips NULL (unreached) sources exactly like the old
    // `depth IS NOT NULL` filter, the inc=0 self-edge carries v's own
    // depth, and an all-NULL group yields NULL = still unreached. This
    // references dep exactly ONCE per round: the lineage is linear and
    // the K rounds stay ONE lazy plan (the pageRankOn discipline) —
    // the old shape's double self-reference (reach + the outer join)
    // doubled lineage per round and forced an eager localCheckpoint
    // job every round. Precondition as in pageRankOn: edge dst ∈ nodes.
    // The repartition by dst (r21, the pageRankOn fold note): one
    // reused edge exchange, every round's MIN aggregate exchange-free.
    // NOTE: eager since r21 — one count job over the slim id frame
    // gates the sweep regime (the pageRankOn discipline).
    val n = ids.count()
    val withSelf = edges.select(col("src"), col("dst"), lit(1L).as("inc"))
      .unionAll(ids.select(col("doc_id").as("src"), col("doc_id").as("dst"), lit(0L).as("inc")))
      .transform(sweepFrame(n, _, "dst"))
    var dep = ids.select(col("doc_id"),
      when(seeds, lit(0L)).otherwise(lit(null).cast("long")).as("depth"))
    for (_ <- 1 to iters) {
      dep = withSelf
        .join(sweepBc(n)(dep.select(col("doc_id").as("src_id"), col("depth"))),
          col("src") === col("src_id"))
        .groupBy(col("dst"))
        .agg(min(col("depth") + col("inc")).as("depth"))
        .select(col("dst").as("doc_id"), col("depth"))
    }
    dep.select(col("doc_id"), coalesce(col("depth"), lit(-1L)).as("depth"))
  }

  private def crawlDepth(s: SparkSession, d: String): DataFrame = {
    val (nodes, edges) = materializedGraph(Tables.documents(s, d).select(col("doc_id")))
    crawlDepthOn(nodes, edges, col("doc_id") % SeedMod === 0, BfsIters)
  }

  private def crawlDepthSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"d${i - 1}"
      s"""d$i AS (
        SELECT n.doc_id,
          CASE WHEN n.depth IS NULL THEN s.md
               WHEN s.md IS NULL THEN n.depth
               ELSE LEAST(n.depth, s.md) END AS depth
        FROM $prev n LEFT JOIN (
          SELECT e.dst AS doc_id, MIN(r.depth) + 1 AS md
          FROM edges e JOIN $prev r ON r.doc_id = e.src AND r.depth IS NOT NULL
          GROUP BY e.dst) s ON s.doc_id = n.doc_id)"""
    }.mkString(",\n")
    s"""WITH $edgesCte,
      d0 AS (SELECT doc_id,
               CASE WHEN doc_id % $SeedMod = 0 THEN CAST(0 AS BIGINT) END AS depth
             FROM documents),
      $rounds
      SELECT doc_id, COALESCE(depth, -1) AS depth FROM d$iters ORDER BY doc_id"""
  }

  val q95 = GraftQuery(
    "q95_crawl_depth",
    (s, d) => crawlDepth(s, d).orderBy("doc_id"),
    Some(crawlDepthSql(BfsIters)),
    prod = Some((s, d) => crawlDepth(s, d)),
  )

  // ---------------------------------------------- component labels

  val CompIters = 6

  /** K rounds of min-label propagation over the UNDIRECTED edge set —
    * the ANSI-expressible twin of [[Dedup]]'s hash-min connected
    * components (dedup_clusters runs the same fixpoint over dup-pair
    * edges with early-exit; here the sweep count is FIXED so the law
    * unrolls into SQL and sits under the HARD gate). After K rounds
    * label(v) = min doc_id within v's ≤K-hop neighborhood — exact
    * component ids wherever the component diameter is < K, and a
    * deterministic, gate-checkable intermediate everywhere else
    * (the q95 bounded-sweep discipline).
    */
  def labelPropOn(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val ids = nodes.select(col("doc_id"))
    // Self-loop trick (r20 optimization): the undirected edge set plus a
    // self-edge per node, so one round is
    //   label'(v) = MIN over (a, v) ∈ und∪self of label(a)
    // ≡ LEAST(label(v), COALESCE(min in-neighbor label, label(v))) —
    // the self-edge carries v's own label into the MIN, replacing the
    // old LeftOuter join back to lbl. One reference to lbl per round →
    // linear lineage, the whole K-round chain is ONE lazy plan (the
    // pageRankOn discipline); the old double self-reference forced an
    // eager localCheckpoint job per round — q109 at sf0.1 paid six
    // sequential 550k-row materializations plus a LeftOuter SMJ each.
    // Precondition as in pageRankOn: edge endpoints ⊆ nodes.
    // The repartition by b (r21, the pageRankOn fold note): one reused
    // exchange of the 2|E|+|N| undirected frame, every round's MIN
    // aggregate exchange-free — q109's r20 plan paid a ~|E_und|-row
    // partial-agg exchange per round (108.9 MB total at sf0.1).
    // NOTE: eager since r21 — one count job over the slim id frame
    // gates the sweep regime (the pageRankOn discipline).
    val n = ids.count()
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .unionAll(ids.select(col("doc_id").as("a"), col("doc_id").as("b")))
      .transform(sweepFrame(n, _, "b"))
    var lbl = ids.select(col("doc_id"), col("doc_id").as("comp"))
    for (_ <- 1 to iters) {
      lbl = und
        .join(sweepBc(n)(lbl.select(col("doc_id").as("a_id"), col("comp"))),
          col("a") === col("a_id"))
        .groupBy(col("b"))
        .agg(min("comp").as("comp"))
        .select(col("b").as("doc_id"), col("comp"))
    }
    lbl
  }

  private def components(s: SparkSession, d: String): DataFrame = {
    val (nodes, edges) = materializedGraph(Tables.documents(s, d).select(col("doc_id")))
    labelPropOn(nodes, edges, CompIters)
  }

  /** The unrolled K-round label chain (`ue`, `l0` … `l<iters>`)
    * WITHOUT the edge CTEs — composable beside [[pageRankCtes]] over
    * one shared [[edgesCte]] (q105). `nodes`/`edges` name the
    * relations (r20: q109 runs the SAME generated law over the real
    * link graph's `lnodes`/`ledges`).
    */
  private def componentsCtes(
      iters: Int, nodes: String = "documents", edges: String = "edges"): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS (
        SELECT n.doc_id, LEAST(n.comp, COALESCE(s.m, n.comp)) AS comp
        FROM $prev n LEFT JOIN (
          SELECT ue.b AS doc_id, MIN(r.comp) AS m
          FROM ue JOIN $prev r ON r.doc_id = ue.a
          GROUP BY ue.b) s ON s.doc_id = n.doc_id)"""
    }.mkString(",\n")
    s"""ue AS (SELECT src AS a, dst AS b FROM $edges
             UNION ALL SELECT dst AS a, src AS b FROM $edges),
      l0 AS (SELECT doc_id, doc_id AS comp FROM $nodes),
      $rounds"""
  }

  private def componentsSql(iters: Int): String =
    s"""WITH $edgesCte,
      ${componentsCtes(iters)}
      SELECT doc_id, comp FROM l$iters ORDER BY doc_id"""

  val q98 = GraftQuery(
    "q98_graph_components",
    (s, d) => components(s, d).orderBy("doc_id"),
    Some(componentsSql(CompIters)),
    prod = Some((s, d) => components(s, d)),
  )

  // --------------------------------------------- per-component hubs

  /** Hubs kept per component. */
  val HubsK = 2

  /** Per-component top hubs — q94's rank joined to q98's component
    * labels, top-[[HubsK]] per label by (pr DESC, doc_id ASC): "the
    * best crawl seeds per site family" (a component of the link graph
    * is a site/template family; its highest-mass members are where a
    * re-crawl budget goes first). Both laws run over ONE materialized
    * graph — the node and edge frames build once and feed both
    * fixpoints; the join and the rank window exchange slim
    * (id, 8-byte) rows only.
    *
    * The per-component window is rank-within-group, not a global sort;
    * on a pathological graph where one label swallows the corpus the
    * skew-safe swap is the bounded-heap top-k kernel (the q16
    * TopKByScore discipline) — documented, not needed for the gate.
    */
  def componentHubsOn(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val pr = pageRankOn(nodes, edges, PrIters)
    val comp = labelPropOn(nodes, edges, CompIters)
    pr.join(comp, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("comp").orderBy(col("pr").desc, col("doc_id"))))
      .filter(col("rk") <= HubsK)
      .select(col("doc_id"), col("comp"), col("pr"), col("rk").cast("long").as("rk"))
  }

  private def componentHubs(s: SparkSession, d: String): DataFrame = {
    val (nodes, edges) = materializedGraph(Tables.documents(s, d).select(col("doc_id")))
    componentHubsOn(nodes, edges)
  }

  val q105 = GraftQuery(
    "q105_component_hubs",
    (s, d) => componentHubs(s, d).orderBy("comp", "rk"),
    Some(s"""WITH $edgesCte,
      ${pageRankCtes(PrIters)},
      ${componentsCtes(CompIters)},
      ranked AS (
        SELECT r.doc_id, l.comp, r.pr,
          CAST(ROW_NUMBER() OVER (PARTITION BY l.comp
                                  ORDER BY r.pr DESC, r.doc_id) AS BIGINT) AS rk
        FROM r$PrIters r JOIN l$CompIters l ON l.doc_id = r.doc_id)
      SELECT doc_id, comp, pr, rk FROM ranked WHERE rk <= $HubsK
      ORDER BY comp, rk"""),
    prod = Some((s, d) => componentHubs(s, d)),
  )

  // ------------------------------------------- REAL link graph (r20)

  /** The real crawl graph's node-id laws — catalog pages and product
    * pages mapped into ONE non-negative BIGINT id space by parity:
    * catalog page (catalog, page) → 2·(catalog·64 + page) (page ∈
    * [1, 50] < 64, so the packing is injective), product (/p/ok-ln) →
    * 2·(ok·8 + ln) + 1 (l_linenumber ∈ [1, 7] < 8). Even ids are
    * catalog pages, odd ids products — the domains can never collide.
    */
  private val PageMul = 64L
  private val ProdMul = 8L

  /** Build (nodes, edges) for [[pageRankOn]]/[[labelPropOn]] from a
    * (catalog, page, href) link frame — q76's EXTRACTED catalog links
    * (r19 verdict item 2): the crawl graph the reference's catalog
    * walk actually induces (scrap_tokopedia.py:190-204 collects
    * product hrefs per catalog page; here each page becomes a node
    * with an edge to every valid product anchor parsed OUT OF ITS
    * HTML), replacing the synthetic mod-N generator with the real
    * topology for the q108/q109 family.
    *
    * Shape: the href parse and id packing are stateless codegen'd
    * expressions; `k` (the PageRank out-degree denominator) is a
    * window count over src — per-page link counts, bounded by the
    * page size, never a global sort; the node set is the distinct
    * union of both endpoint domains (one exchange of 8-byte ids).
    * The parsed edge frame materializes ONCE (the HTML parse behind
    * it is the expensive leg) and feeds the k-window, the node union,
    * and every sweep — the [[materializedGraph]] discipline.
    *
    * Dangling nodes (products, and catalog pages with zero valid
    * links absent entirely): a product node has no out-edges, so its
    * mass leaks per sweep exactly as the law states — both renderings
    * agree because the law is shared, not because dangling mass is
    * redistributed.
    */
  private[graft] def linkGraphFrom(links: DataFrame): (DataFrame, DataFrame) = {
    val ok = regexp_extract(col("href"), "^/p/(\\d+)-(\\d+)$", 1).cast("long")
    val ln = regexp_extract(col("href"), "^/p/(\\d+)-(\\d+)$", 2).cast("long")
    val e0 = links.select(
      (lit(2L) * (col("catalog").cast("long") * PageMul + col("page").cast("long"))).as("src"),
      (lit(2L) * (ok * ProdMul + ln) + lit(1L)).as("dst"))
      .localCheckpoint()
    // k (the PageRank out-degree denominator) as a partial-combined
    // per-src COUNT joined back (r20 optimization): the old
    // `COUNT(*) OVER (PARTITION BY src)` window shuffled AND sorted the
    // ENTIRE edge frame by src to stamp a per-page count, where the
    // aggregate exchanges only ~one row per page (map-side combine —
    // parsed links land page-contiguous, so partials collapse) and the
    // deg frame is a slim (src, k) build side. Same values: both are
    // the per-src edge count. NO explicit broadcast hint (r21, the r20
    // ADVICE): deg is one row per linking PAGE — unbounded cardinality
    // at the 100 TB design point, where a forced broadcast is a driver
    // OOM, not a plan choice. AQE picks BHJ from deg's measured size
    // wherever it fits (it does at every local SF) and degrades to a
    // shuffle join gracefully beyond that.
    val deg = e0.groupBy("src").agg(count(lit(1)).as("k"))
    // The hint is COUNT-GATED (one cheap aggregate job over the
    // checkpointed e0): without any hint the planner's estimate for an
    // aggregate over a LogicalRDD is the conf default (huge), so the
    // join plans as SMJ and pays BOTH exchanges before AQE's runtime
    // BHJ conversion (measured: +11 MB shuffle on q108/q109).
    val degBc = if (deg.count() <= SweepBroadcastMaxNodes) broadcast(deg) else deg
    val edges = e0.join(degBc, Seq("src"))
      .select(col("src"), col("dst"), col("k"))
    // Node set: deg IS the distinct src set already (its group keys), so
    // only the dst side needs a distinct (a shared product appears once
    // per linking page — the planted-topology spec pins that case), and
    // the two domains never collide by the parity law — no cross-union
    // distinct. The old shape re-shuffled the full src∪dst union.
    val nodes = e0.select(col("dst").as("doc_id")).distinct()
      .unionAll(deg.select(col("src").as("doc_id")))
    // edges deliberately NOT checkpointed (r21): this graph sits in the
    // broadcast-sweep regime at bench scale (N ≈ 50k pages+products),
    // where the loops consume it through ONE reused clusterBy exchange
    // that already materializes the join exactly once — the old eager
    // checkpoint was a redundant second full pass over the 500k-row
    // frame. e0 (the expensive HTML-parse leg) stays pinned, so even
    // below the regime floor a re-evaluation is one cheap broadcast
    // join over the checkpointed rows.
    (nodes.localCheckpoint(), edges)
  }

  private def linkGraph(s: SparkSession, d: String): (DataFrame, DataFrame) =
    linkGraphFrom(ScrapeEtl.catalogLinks(s, d).toDF("catalog", "page", "href"))

  /** The ONE SQL rendering of the link-graph node/edge laws — the
    * oracle derives the link set RELATIONALLY (q76's own oracle law:
    * valid anchors = lineitem rows with l_quantity > 1) while the
    * engine parses it from the synthesized HTML; the gate therefore
    * grades extraction + graph law end to end. Defines `llinks`,
    * `le0`, `ledges(src, dst, k)`, `lnodes(doc_id)`.
    */
  private val linkEdgesFromLinksCte: String =
    s"""llinks AS (
        SELECT l_suppkey AS catalog, (l_orderkey % 50) + 1 AS page,
               l_orderkey AS ok, l_linenumber AS ln
        FROM lineitem WHERE l_quantity > 1),
      le0 AS (
        SELECT CAST(2 * (catalog * $PageMul + page) AS BIGINT) AS src,
               CAST(2 * (ok * $ProdMul + ln) + 1 AS BIGINT) AS dst
        FROM llinks),
      ledges AS (
        SELECT src, dst, CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS k
        FROM le0),
      lnodes AS (SELECT DISTINCT src AS doc_id FROM le0
                 UNION SELECT DISTINCT dst AS doc_id FROM le0)"""

  /** PageRank over the REAL extracted link graph — crawl-priority
    * mass over the actual catalog topology the reference's pages
    * imply, not the synthetic generator: q94's exact-integer sweep
    * law (ONE generated rendering, [[pageRankCtes]]) over
    * [[linkGraphFrom]]'s nodes and edges. Catalog pages split their
    * mass across their parsed product links; products accumulate it
    * — rank answers "which product pages does the catalog structure
    * itself promote".
    */
  private def linkPageRank(s: SparkSession, d: String): DataFrame = {
    val (nodes, edges) = linkGraph(s, d)
    pageRankOn(nodes, edges, PrIters)
  }

  val q108 = GraftQuery(
    "q108_link_pagerank",
    (s, d) => linkPageRank(s, d).orderBy("doc_id"),
    Some(s"""WITH $linkEdgesFromLinksCte,
      ${pageRankCtes(PrIters, nodes = "lnodes", edges = "ledges")}
      SELECT doc_id, pr FROM r$PrIters ORDER BY doc_id"""),
    prod = Some((s, d) => linkPageRank(s, d)),
  )

  /** Connected components over the real link graph — the site-family
    * question on the ACTUAL topology (catalog pages sharing any
    * product land in one family): q98's min-label law (same generated
    * rendering) over [[linkGraphFrom]].
    */
  private def linkComponents(s: SparkSession, d: String): DataFrame = {
    val (nodes, edges) = linkGraph(s, d)
    labelPropOn(nodes, edges, CompIters)
  }

  val q109 = GraftQuery(
    "q109_link_components",
    (s, d) => linkComponents(s, d).orderBy("doc_id"),
    Some(s"""WITH $linkEdgesFromLinksCte,
      ${componentsCtes(CompIters, nodes = "lnodes", edges = "ledges")}
      SELECT doc_id, comp FROM l$CompIters ORDER BY doc_id"""),
    prod = Some((s, d) => linkComponents(s, d)),
  )

  def all: Seq[GraftQuery] = Seq(q94, q95, q98, q102, q103, q105, q108, q109)
}
