package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guard: the properties that make these plans
  * survive a 100x scale-up, asserted on every registry query so a future
  * edit cannot silently reintroduce a cartesian product, lose pushdown,
  * or de-broadcast a dimension join.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def plan(q: GraftQuery): String =
    q.run(spark, sf).queryExecution.executedPlan.toString

  test("no registry query plans a cartesian product; NLJ only where designed") {
    // brute-force ANN is DESIGNED as corpus x broadcast-query-set (tiny
    // broadcast side); q35 cross-joins a broadcast 1-ROW corpus-size
    // aggregate into the plan (the scalar-subquery shape that replaced a
    // driver-side count() action); dedup_cosine_verify is a BOUNDED
    // fixed-probe-set pair join (C(40,2)) gating the cosine verify stage
    // — the only legitimate nested-loops
    // q49/q54 cross-join a broadcast 1-ROW total like q35 — the scalar-
    // subquery shape, not a data join
    // ann_int8_topk is ann_bruteforce's shape over int8 codes — same
    // designed corpus x broadcast-8-query NLJ, same justification; the
    // rerank entry runs that same coarse scan as its first phase; the PQ
    // pair is that shape again over m-BYTE codes (the coarse scan streams
    // 8 B/vector against the broadcast query LUTs); ann_opq_topk is the
    // PQ shape with a rotate step fused into the scan projection
    // …and the r15 fullprobe twins re-run those same designed coarse
    // scans (int8/PQ/OPQ codes x broadcast 8-query set) at a larger
    // oversample — same shape, same justification
    // …q81's two text-search editions are the ann_bruteforce shape over
    // text-derived embeddings (corpus × broadcast 8-query set) — same
    // designed NLJ, same justification; q84's fusion embeds q81's dense
    // leg verbatim, so it carries the SAME designed scan (the sparse
    // leg is pure equi-joins)
    val nljAllowed = Set("ann_bruteforce_topk", "ann_int8_topk",
      "ann_int8_rerank_topk", "ann_int8_rerank_fullprobe", "ann_pq_topk",
      "ann_pq_rerank_topk", "ann_pq_rerank_fullprobe", "ann_opq_topk",
      "ann_opq_rerank_fullprobe", "q81_text_search_md5", "q81_text_search",
      "q84_hybrid_rrf",
      // q85 cross-joins a broadcast 1-ROW (S, N) corpus total into the
      // postings join output — the q35/q49/q54 scalar-subquery shape;
      // q86 the same for its 1-row (n_m, w_m) normalizer
      // …and q87's three-list fusion embeds q81's dense leg AND q85's
      // 1-row totals cross join
      // …sparse_index_bm25 serves the q85 shape from disk — same 1-row
      // totals cross join
      // …hybrid_index_rrf's served BM25 leg carries the same 1-row
      // totals cross join (read from the merged sidecar); its dense leg
      // is equi-joins over the pruned lists, its fusion pure aggregates
      "q85_bm25", "q86_temp_mixture", "q87_hybrid_rrf3", "sparse_index_bm25",
      "hybrid_index_rrf",
      // q94/q95 cross-join a broadcast 1-ROW corpus-count into the edge
      // generator — the q35 scalar-subquery shape again
      // q96 is the q38 benchmark asymmetry over EMBEDDINGS: corpus ×
      // broadcast bench-vector set (eval sets are tiny by construction)
      // — the ann_bruteforce-style designed NLJ
      "q94_pagerank", "q95_crawl_depth", "q96_embed_decontam",
      "q98_graph_components", "q99_text_embed_decontam",
      // r19: q102/q103 ride the same broadcast 1-ROW corpus-count
      // cross join inside the shared edge generator (q103 composes
      // q94's rank; q102 builds the weighted edges from edgesRaw)
      "q102_pagerank_weighted", "q103_crawl_priority", "q105_component_hubs",
      // q107's semantic rung is q99's designed corpus × broadcast-bench
      // NLJ (the audit runs the gate laws pair-level by construction)
      "q107_contam_report",
      // q100's added-slice and q101's ppm share cross-join a broadcast
      // 1-ROW corpus total — the q35 scalar-subquery shape
      "q100_snapshot_diff", "q101_token_histogram",
      // r20: q110 composes q100's refresh law, so its next-snapshot
      // added slice carries the SAME broadcast 1-row total cross join
      "q110_contam_trend",
      "q35_tfidf", "dedup_cosine_verify", "q49_heavy_tokens", "q54_source_drift")
    // NOTE the curation/e2e compositions are NOT whitelisted although
    // they carry q99's sem gate (a designed corpus × broadcast-bench
    // NLJ) since r18 session 2: curateDecontam MATERIALIZES the sem
    // gate's id list (localCheckpoint — see the comment there), so the
    // nested loop executes once behind a LogicalRDD and the outer plan
    // stays NLJ-free under this audit. If this assertion ever fires on
    // them, the materialization boundary was lost — restore it rather
    // than whitelisting (a blanket allow would disable the guard over
    // their dozens of other joins).
    SparkEntry.registry.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"${q.name} planned a cartesian:\n$p")
      if (!nljAllowed(q.name))
        assert(!p.contains("BroadcastNestedLoop"), s"${q.name} planned a nested loop:\n$p")
    }
  }

  test("q02 prod plan pushes predicates and prunes columns at the parquet scan") {
    val p = operators.RelationalCore.q02.runProd(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey"), s"columns not pruned:\n$p")
    assert(!p.contains("l_comment"), "untouched columns must not be read")
  }

  test("q03 and q04 broadcast their dimension side") {
    Seq(operators.RelationalCore.q03, operators.RelationalCore.q04).foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"${q.name} lost its broadcast:\n$p")
    }
  }

  test("q17 global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val p = plan(operators.RelationalCore.q17)
    assert(p.contains("TakeOrderedAndProject"), s"top-k degenerated to a global sort:\n$p")
  }

  test("dedup_exact is a single exchange (one shuffle, partial aggregation)") {
    val p = plan(operators.Dedup.qExact)
    val exchanges = "Exchange".r.findAllIn(p.replace("ExchangeQueryStage", "")).size
    // one hash-partitioned exchange for the groupBy; the final orderBy adds
    // a range exchange in oracle mode — nothing else
    assert(exchanges <= 2, s"dedup_exact shuffles too much ($exchanges exchanges):\n$p")
    assert(p.contains("HashAggregate"), "hash aggregation expected")
  }

  test("q28 prod plan is exchange-free (scan + codegen'd projection only)") {
    val p = operators.ScrapeEtl.q28.runProd(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p.replace("ExchangeQueryStage", "")).size
    assert(exchanges == 0, s"html extraction must not shuffle:\n$p")
    assert(!p.contains("p_comment"), "untouched part columns must not be read")
  }

  test("q77 chunking prod plan is exchange-free (scan + tokenize + explode only)") {
    val p = operators.TrainPrep.q77.runProd(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p.replace("ExchangeQueryStage", "")).size
    assert(exchanges == 0, s"token-window chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), "the per-start explode must stay in the map stage")
  }

  test("q29 frontier reuses the catalog partitioning between window and agg") {
    // pages aggregate (catalog,page) + window repartition (catalog) +
    // oracle-mode sort; the final groupBy(catalog) must REUSE the window's
    // hash partitioning, not add a fourth exchange
    val p = plan(operators.ScrapeEtl.q29)
    val exchanges = "Exchange".r.findAllIn(p.replace("ExchangeQueryStage", "")).size
    assert(exchanges <= 3, s"frontier shuffles too much ($exchanges):\n$p")
  }

  test("q38 broadcasts the benchmark shingle set; one corpus scan, one exchange") {
    val p = operators.TrainPrep.q38.runProd(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"bench set must broadcast:\n$p")
    val corpusScans = "FileScan parquet".r.findAllIn(p).size
    assert(corpusScans == 2, s"one corpus scan + one bench scan expected:\n$p")
    // The CORPUS side shuffles once, keyed by doc_id (the final per-doc
    // aggregate). The bench side also plans a hash exchange for its
    // distinct-shingle set, but that side is the tiny pre-broadcast
    // build input — counting it would fail the audit for rows that
    // never touch the corpus exchange, so the count is keyed.
    val corpusExchanges = "Exchange hashpartitioning\\(doc_id".r
      .findAllIn(p.replace("ExchangeQueryStage", "")).size
    assert(corpusExchanges <= 1, s"corpus side must shuffle once at most:\n$p")
  }

  test("q39 prod sampling plan is exchange-free (stateless codegen'd filter)") {
    val p = operators.TrainPrep.q39.runProd(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p.replace("ExchangeQueryStage", "")).size
    assert(exchanges == 0, s"sampling must not shuffle:\n$p")
    // executedPlan.toString renders WholeStageCodegen membership as the
    // `*(stage)` operator prefix
    assert(p.contains("*(1) Filter"), s"filter must stay in codegen:\n$p")
  }

  test("q40 prod plan never single-partitions doc rows (only the offsets table)") {
    // the range repartition and the pid-window hash exchange carry doc
    // rows in parallel; the only SinglePartition stages are the
    // #partitions-row offsets aggregate and its cumsum window
    val p = operators.TrainPrep.q40.runProd(spark, sf).queryExecution.executedPlan.toString
    val singles = "Exchange SinglePartition".r.findAllIn(p).size
    assert(singles <= 1, s"doc rows must not funnel through one task:\n$p")
    // The pid stage table is checkpointed (pid assignments must be
    // computed exactly once — see packTokensProd), which truncates
    // lineage in the final plan; audit the stage's own plan for the
    // parallel range exchange instead.
    val stage = operators.TrainPrep.packTokensStage(spark, sf)
      .queryExecution.executedPlan.toString
    assert(stage.contains("rangepartitioning(doc_id"), s"expected range partitioning:\n$stage")
    assert(!stage.contains("Exchange SinglePartition"),
      s"stage must stay partition-parallel:\n$stage")
  }

  test("q44 probes the bloom as a codegen'd filter before the confirm join") {
    val p = operators.TrainPrep.q44.runProd(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("bloom_contains"), s"bloom probe missing from the plan:\n$p")
    // the bloom must enter as a LITERAL inside a scan-stage Filter — a
    // bloom riding a join row is re-copied by every probe (ScaleProbe9),
    // so any join-shaped attach here is a regression
    assert(!p.contains("BroadcastNestedLoopJoin"), s"bloom must not ride a join row:\n$p")
    val probeLine = p.linesIterator.find(_.contains("bloom_contains")).getOrElse("")
    // (no codegen-star check here: the plan has exchanges, so the
    // pre-execution AdaptiveSparkPlan carries no WholeStageCodegen
    // markers yet; BloomContains' codegen path is exercised by BloomSpec)
    assert(probeLine.contains("Filter"), s"probe must be a Filter: $probeLine")
  }

  test("q45 runs both window passes over ONE user-keyed exchange") {
    val p = operators.ScrapeEtl.q45.runProd(spark, sf).queryExecution.executedPlan.toString
    val userExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(p.replace("ExchangeQueryStage", "")).size
    assert(userExchanges == 1, s"change detection + versioning must share one shuffle:\n$p")
  }

  test("q46 joins vocab on slim hashed terms and broadcasts the sizes") {
    val p = operators.TextAnalysis.q46.runProd(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"per-source sizes must broadcast:\n$p")
    // every exchange must key on (source, hashed term) or pair columns —
    // raw token strings may exist only inside the scan-stage Generate,
    // never on an exchange
    val badExchange = p.linesIterator.filter(_.contains("Exchange "))
      .find(_.contains("tok#"))
    assert(badExchange.isEmpty, s"an exchange carries token strings: $badExchange")
  }

  test("q47 prod weighted sampling is exchange-free") {
    val p = operators.TrainPrep.q47.runProd(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p.replace("ExchangeQueryStage", "")).size
    assert(exchanges == 0, s"weighted sampling must not shuffle:\n$p")
  }

  test("q48 postings aggregate map-side; no per-term sort anywhere") {
    val p = operators.TextAnalysis.q48.runProd(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p.replace("ExchangeQueryStage", "")).size
    assert(exchanges <= 2, s"(term,doc) tf + term rollup = at most two exchanges:\n$p")
    assert(!p.contains("Sort "), s"the posting head must ride the bounded heap, not a sort:\n$p")
    assert(p.contains("top_k_by_score"), "bounded-heap head aggregate expected")
  }

  test("q50 prod plan avoids the stratum-wide ntile sort") {
    val p = operators.TrainPrep.q50.runProd(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("ntile"), s"prod must use the closed form, not ntile:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"doc rows must never funnel through one task:\n$p")
    // windows exist only over the count-summary frame and (lang, score)
    // tie groups; the doc-row window must carry the tie-group keys
    assert(p.contains("partitionBy=[lang#") || p.contains("hashpartitioning(lang"),
      s"expected per-stratum summary windows:\n$p")
  }

  test("no registry query plans a shrinking (UNBOUNDED FOLLOWING) window frame") {
    // Spark executes a frame whose upper bound is UNBOUNDED FOLLOWING and
    // whose lower bound moves with the current row via
    // UnboundedFollowingWindowFunctionFrame, which re-scans from the
    // current row to the partition end for EVERY output row — O(rows²)
    // per partition. q55 shipped exactly this in round 8 (37.9 s at
    // sf0.1, 23x its O(n) sibling; ScaleProbe12: 79 s for one 60k-row
    // user). The whole-partition frame (UNBOUNDED PRECEDING, UNBOUNDED
    // FOLLOWING) is a single O(n) pass and stays allowed. Frames render
    // in executedPlan as specifiedwindowframe(type, lower$(), upper$()).
    val frame = "specifiedwindowframe\\([^)]*\\$\\(\\)[^)]*\\$\\(\\)".r
    SparkEntry.registry.foreach { q =>
      val p = plan(q)
      val shrinking = frame.findAllIn(p)
        .filter(_.contains("unboundedfollowing"))
        .filterNot(_.contains("unboundedpreceding"))
        .toList
      assert(shrinking.isEmpty,
        s"${q.name} plans a quadratic shrinking frame: ${shrinking.mkString("; ")}\n$p")
    }
  }

  test("no PROD plan ships a sliding aggregate window frame") {
    // Spark executes a frame with a finite moving lower bound and
    // currentRow upper (ROWS/RANGE N PRECEDING .. CURRENT ROW) by
    // re-aggregating the ENTIRE frame every row — O(rows × width) per
    // partition (ScaleProbe14: a 300k-row user never finished q67's
    // sliding form). Oracle mode may state semantics that way; prod
    // plans must use running prefixes + probe carries instead. Offset
    // frames (lag/lead render as (-k, -k)) stay allowed.
    val sliding = "specifiedwindowframe\\([^)]*Frame, -\\d+, currentrow".r
    SparkEntry.registry.foreach { q =>
      val p = q.runProd(spark, sf).queryExecution.executedPlan.toString
      val hits = sliding.findAllIn(p).toList
      assert(hits.isEmpty, s"${q.name} prod plan slides an aggregate frame: $hits\n$p")
    }
  }

  test("q53/q55/q58 resampling rides ONE user-keyed exchange per query") {
    // the spine groupBy, the forward-fill window, and (for q55/q58)
    // BOTH direction passes must share the spine's user_id exchange;
    // the per-(user, hour) last-observation side keys on (user_id, hour)
    // and is counted separately
    val userOnly = "Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r
    Seq(operators.ScrapeEtl.q53, operators.ScrapeEtl.q55, operators.ScrapeEtl.q58).foreach { q =>
      val p = q.runProd(spark, sf).queryExecution.executedPlan.toString
        .replace("ExchangeQueryStage", "")
      val n = userOnly.findAllIn(p).size
      assert(n == 1, s"${q.name} must reuse one user exchange, found $n:\n$p")
    }
  }

  test("q56 transition matrix scans the corpus once, one user exchange") {
    // row totals must come from a window over the aggregated pairs — a
    // totals-join referencing the pairs plan twice re-scans events and
    // re-runs the lag window (the r8 shape this audit retires)
    val p = operators.ScrapeEtl.q56.runProd(spark, sf).queryExecution.executedPlan.toString
      .replace("ExchangeQueryStage", "")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
    val userOnly = "Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r
    assert(userOnly.findAllIn(p).size == 1, s"one user exchange expected:\n$p")
  }

  test("q57/q59/q62 journey analytics scan the corpus once, one user exchange") {
    // the lag/min window rides the single user_id exchange and the
    // downstream ratios come from windows over ALREADY-AGGREGATED rows —
    // never a totals join that would re-scan events (the q56 r8 shape)
    val userOnly = "Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r
    Seq(operators.ScrapeEtl.q57, operators.ScrapeEtl.q59, operators.ScrapeEtl.q62).foreach { q =>
      val p = q.runProd(spark, sf).queryExecution.executedPlan.toString
        .replace("ExchangeQueryStage", "")
      assert("FileScan parquet".r.findAllIn(p).size == 1,
        s"${q.name}: events must be scanned once:\n$p")
      assert(userOnly.findAllIn(p).size == 1, s"${q.name}: one user exchange expected:\n$p")
    }
  }

  test("q63 six-table plan broadcasts the snowflake dims, no cartesian") {
    val p = plan(operators.RelationalCore.q63)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"six-table join must stay key-equi:\n$p")
    // nation and region (and whatever else AQE promotes) broadcast; the
    // fact-fact joins may be shuffle or broadcast depending on stats,
    // but at least the two explicit dim hints must survive planning
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"snowflake dims must broadcast:\n$p")
    assert(p.contains("PushedFilters"), "order-date/region filters should reach scans")
  }

  test("q64 centroids broadcast back to vectors; vectors never shuffle") {
    val p = operators.Similarity.qOutlier.runProd(spark, sf).queryExecution.executedPlan.toString
      .replace("ExchangeQueryStage", "")
    assert(p.contains("BroadcastHashJoin"), s"centroid table must broadcast:\n$p")
    // the only hash exchanges carry exploded (label, pos) component rows
    // or label-keyed centroid rows — never a vec_id
    val badExchange = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .find(_.contains("vec_id#"))
    assert(badExchange.isEmpty, s"an exchange carries vectors: $badExchange")
  }

  test("q61 kept set rides the bounded heap — no per-source sort") {
    val p = operators.TrainPrep.q61.runProd(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("top_k_by_score"), "bounded-heap aggregate expected")
    assert(!p.contains("Sort "), s"quota selection must not sort any stratum:\n$p")
  }

  test("train_prep_e2e prod: slim post-curation chain, one corpus text scan in the pack stage") {
    // The composed prod plan runs quota/split/pack/shuffle/manifest over
    // checkpointed slim id tables: the corpus text column must appear
    // NOWHERE in the final plan (no exchange can carry it, because it
    // isn't even in scope), and the chain must not rescan any parquet —
    // both branches ride the pinned stage tables.
    val p = operators.TrainPipeline.qE2E.runProd(spark, sf)
      .queryExecution.executedPlan.toString.replace("ExchangeQueryStage", "")
    assert(!p.contains("text#"), s"corpus text leaked past curation into the manifest plan:\n$p")
    assert(!p.contains("FileScan"),
      s"post-curation chain must ride stage tables, not rescan parquet:\n$p")

    // The ONE place text is re-read after the decisions table — the pack
    // stage recomputing n_tokens for train survivors — audited on its
    // pre-checkpoint form (the prod checkpoint truncates lineage):
    // exactly one documents scan, n_tokens computed in the scan stage,
    // and every exchange (survivor semi-join and the doc_id range
    // partition) carrying only slim (doc_id, n_tokens) rows.
    val docs = Tables.documents(spark, sf)
    val train = operators.TrainPipeline
      .trainIds(docs, operators.Curate.curateDecontam(docs)).localCheckpoint()
    val stage = operators.TrainPipeline.packStage(docs, train).queryExecution
    val sp = stage.executedPlan.toString.replace("ExchangeQueryStage", "")
    assert("FileScan parquet".r.findAllIn(sp).size == 1,
      s"pack stage must scan the corpus exactly once:\n$sp")
    assert(sp.contains("rangepartitioning(doc_id"),
      s"pack stage must range-partition by doc_id:\n$sp")
    val fm = stage.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = fm.linesIterator.foldLeft((List.empty[String], false)) {
      case ((acc, expectInput), line) =>
        if (line.matches("""\(\d+\) Exchange.*""")) (acc, true)
        else if (expectInput && line.startsWith("Input")) (line :: acc, false)
        else (acc, expectInput)
    }._1
    assert(exchangeInputs.nonEmpty, s"expected at least the range exchange:\n$fm")
    exchangeInputs.foreach { in =>
      assert(!in.contains("text#"),
        s"an exchange in the pack stage carries corpus text: $in\n$fm")
    }
  }

  test("prod variants drop the oracle-mode global sort") {
    Seq(operators.RelationalCore.q02, operators.RelationalCore.q08, operators.RelationalCore.q18)
      .foreach { q =>
        val oracle = q.run(spark, sf).queryExecution.optimizedPlan.toString
        val prod = q.runProd(spark, sf).queryExecution.optimizedPlan.toString
        assert(oracle.contains("Sort"), s"${q.name} oracle mode must stay sorted")
        val globalSorts = "Sort \\[.*\\], true".r.findAllIn(prod).size
        assert(globalSorts == 0, s"${q.name} prod plan still globally sorts:\n$prod")
      }
  }
}
