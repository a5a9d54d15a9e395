package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.gfunctions.cosine_sim

/** IVF (inverted-file) ANN: a coarse spherical k-means quantizer splits the
  * corpus into cluster lists; a query probes only its `nprobe` nearest
  * cluster lists. The second classic scale path next to LSH ([[Lsh]]):
  * LSH needs no training but fixes its recall at plan time; IVF spends a
  * small training pass to adapt buckets to the data distribution.
  *
  * Scale notes:
  *  - Training collects ONLY k x dims centroid floats to the driver per
  *    Lloyd iteration (model fitting = orchestration; k is small). The
  *    SEARCH path is fully distributed — no driver data movement.
  *  - Centroid means use decimal sums, so centroids — and therefore
  *    assignments and candidates — are identical across partition orders
  *    and cluster sizes.
  *  - Assignment = argmax over k literal centroids through the native
  *    codegen'd cosine kernel; candidates come from an equi-join on
  *    cluster id. Never a corpus cross join.
  */
object Ivf {

  /** (similarity, cluster) argmax over literal centroids; ties break on the
    * lower cluster id via the struct ordering (sim desc, then -id desc).
    */
  private def nearestClusters(vec: Column, centroids: Array[Array[Float]]): Column = {
    val scored = array(centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(cosine_sim(vec, typedlit(c)).as("sim"), lit(-i).as("neg_id"))
    }: _*)
    reverse(array_sort(scored))
  }

  /** Corpus-side coarse assignment — the hot full-scan path (train,
    * writeIndex, appends, SemDeDup all run it over every vector). Since
    * r15 this is the [[graft.functions.NearestCentroid]] kernel: the
    * centroid matrix rides as ONE codegen reference object, so
    * generated-code size is O(1) in k and the k-in-the-thousands regime
    * a 100 TB corpus wants stays a tight primitive loop — the literal
    * struct-array argmax (still used by [[nearestClusters]] for the
    * per-QUERY ranked probe list, where k is small and a ranked list is
    * needed) pays a per-row k-struct allocation + sort and k inlined
    * sub-kernels, measured 4x/8x/15x slower at k=64/256/1024
    * (ScaleProbe29). Bit-identical on every non-NULL vector,
    * spec-pinned including duplicate-centroid ties and k=1024; a NULL
    * embedding now yields a NULL cluster (the literal form
    * accidentally mapped it to cluster 0 through all-NULL sims —
    * spec-pinned as a DOCUMENTED divergence). The flat centroid-major
    * layout requires uniform rows, enforced loudly: a ragged matrix
    * whose lengths happened to compensate would otherwise misalign
    * silently.
    */
  private[graft] def clusterOf(vec: Column, centroids: Array[Array[Float]]): Column = {
    require(centroids.nonEmpty && centroids.forall(_.length == centroids.head.length),
      s"clusterOf: centroid rows must be uniform, got lengths " +
        s"${centroids.map(_.length).distinct.mkString(",")}")
    graft.gfunctions.nearest_centroid(
      vec, centroids.flatten, centroids.length, centroids.head.length)
  }

  /** Bounded deterministic training sample: once the corpus outgrows
    * `sampleFactor * k` vectors, keep a vector iff its salted 52-bit md5
    * hash falls under the proportional threshold — the q39/q47
    * hash-sampling discipline (a pure function of vec_id: same sample
    * across reruns, partitionings, and cluster sizes; no RNG state).
    *
    * Why: every Lloyd iteration in [[train]] posexplodes EVERY corpus
    * vector (dims rows each) into a (cluster, pos) aggregate — at 100 TB
    * that is iters full-corpus passes to fit a model of k*dims floats.
    * The coarse quantizer only needs the cluster STRUCTURE, and ~100
    * vectors per centroid pins it: sampling bounds training cost by the
    * MODEL size instead of the corpus size, while assignment (the one
    * full pass that must see every vector) stays exact in
    * [[topK]]/[[topKInt8]]/[[writeIndex]]. `sampleFactor <= 0` disables.
    */
  private[graft] def trainingSample(emb: DataFrame, k: Int, sampleFactor: Long): DataFrame = {
    if (sampleFactor <= 0) emb
    else {
      val target = sampleFactor * k
      val n = emb.count()
      if (n <= target) emb
      else {
        // 52-bit hash: exactly representable in the double math below
        val bound = ((1L << 52).toDouble * (target.toDouble / n)).toLong
        val h = conv(
          substring(md5(concat(lit("ivftrain:"), col("vec_id").cast("string"))), 1, 13),
          16, 10).cast("long")
        emb.filter(h < bound)
      }
    }
  }

  /** Deterministic spherical k-means: seeds = the k lowest vec_ids, then
    * `iters` Lloyd rounds with decimal-exact means. Past
    * `sampleFactor * k` corpus vectors, training runs on the bounded
    * deterministic [[trainingSample]] (seeds = the k lowest SAMPLED
    * vec_ids) — the corpus-sized passes belong to assignment, not to
    * fitting a k*dims-float model.
    */
  def train(
      emb: DataFrame, k: Int = 8, iters: Int = 3, dims: Int = 64,
      sampleFactor: Long = 100L): Array[Array[Float]] = {
    val base = trainingSample(emb, k, sampleFactor)
    var centroids: Array[Array[Float]] = base
      .orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    for (_ <- 1 to iters) {
      val assigned = base.select(
        clusterOf(col("embedding"), centroids).as("cluster"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      val means = assigned
        .groupBy("cluster", "pos")
        .agg((sum(col("v").cast(DecimalType(28, 10))) / count(lit(1))).cast("float").as("m"))
        .collect()
      val next = centroids.indices.map { c =>
        val dims_ = means.filter(_.getInt(0) == c).sortBy(_.getInt(1)).map(_.getFloat(2))
        if (dims_.isEmpty) centroids(c) else dims_ // empty cluster keeps its seed
      }.toArray
      centroids = next
    }
    centroids
  }

  /** IVF search: corpus rows keep 1 cluster; queries probe `nprobe`
    * clusters; candidates = equi-join on cluster; exact cosine rank.
    */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Float]],
      k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    val listed = corpus.select(
      col("vec_id"), col("embedding"),
      clusterOf(col("embedding"), centroids).as("cluster"))
    val probes = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qvec"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
    val cand = listed.alias("c")
      .join(broadcast(probes.alias("q")),
        col("c.cluster") === col("q.cluster") && col("query_id") =!= col("c.vec_id"))
      .select(
        col("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine_sim(col("c.embedding"), col("qvec")).as("sim"))
    Similarity.rankTopK(cand, k)
  }

  /** QUANTIZED IVF search — the 100 TB ANN serving shape: IVF prunes the
    * COMPUTE (a query touches nprobe lists, not the corpus) and packed
    * int8 prunes the MEMORY (1 byte/dim in the inverted lists instead of
    * 4+), so the index a 1000-executor cluster holds hot is dims bytes
    * per vector plus a cluster id.
    *
    * List assignment stays FULL-precision — it happens once at index
    * build, where the float vectors are already in hand, so quantization
    * error never moves a vector into the wrong list (the standard
    * IVF-then-quantize build order). Only the per-candidate scoring
    * inside probed lists runs on packed codes via the native integer
    * [[graft.functions.Int8Cosine]] kernel; per-vector scales cancel in
    * cosine, so the scale column is never read at search time.
    */
  def topKInt8(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Float]],
      k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    import graft.gfunctions.{int8_codes, int8_cosine}
    val listed = corpus.select(
      col("vec_id"), int8_codes(col("embedding")).as("codes_bin"),
      clusterOf(col("embedding"), centroids).as("cluster"))
    val probes = queries.select(
      col("vec_id").as("query_id"), int8_codes(col("embedding")).as("qcodes"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
    val cand = listed.alias("c")
      .join(broadcast(probes.alias("q")),
        col("c.cluster") === col("q.cluster") && col("query_id") =!= col("c.vec_id"))
      .select(
        col("query_id"), col("c.vec_id").as("neighbor_id"),
        int8_cosine(col("c.codes_bin"), col("qcodes")).as("sim"))
    Similarity.rankTopK(cand, k)
  }

  /** PERSIST the quantized IVF index: one parquet table of (vec_id,
    * packed codes) PARTITIONED BY cluster id — the inverted lists ARE
    * the partition layout. Build once per corpus snapshot (train +
    * assign + quantize in a single pass over the float vectors), serve
    * many: the index a 100 TB corpus keeps on disk is dims bytes per
    * vector plus the directory structure.
    */
  def writeIndex(corpus: DataFrame, centroids: Array[Array[Float]], dir: String): Unit =
    writeIndex(corpus, centroids, dir, Nil)

  /** [[writeIndex]] carrying passthrough METADATA columns into the
    * inverted lists (source, license, date — whatever serving filters
    * on). The cost is explicit: metadata rides every list row, so keep
    * it to the few small columns queries actually filter by — the
    * standard filtered-ANN trade (filter state lives IN the index so
    * the scan can push it down; a post-join attribute lookup would
    * re-touch the corpus per candidate instead).
    */
  def writeIndex(
      corpus: DataFrame, centroids: Array[Array[Float]], dir: String,
      metaCols: Seq[String]): Unit = {
    writeIndexAssigned(corpus, clusterOf(col("embedding"), centroids), dir, metaCols)
    writeCentroids(corpus.sparkSession, centroids, dir)
  }

  /** The quantizer is VERSIONED WITH the index, literally: [[writeIndex]]
    * persists the centroids under `dir/_quantizer` (the underscore
    * prefix hides the subdir from Spark's data-file listing, so reading
    * the inverted lists at `dir` is unaffected — the `_spark_metadata`
    * convention). Serving and appending can then be self-describing:
    * the [[searchIndex]]/[[searchIndexRerank]]/[[appendIndex]] overloads
    * without a centroids argument read it back, which makes the
    * append contract ("assign against the index's OWN centroids")
    * impossible to get wrong by passing a retrained array.
    */
  private val QuantizerSubdir = "_quantizer"

  private def writeCentroids(
      spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Float]], dir: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$QuantizerSubdir")
  }

  def readCentroids(
      spark: org.apache.spark.sql.SparkSession, dir: String): Array[Array[Float]] =
    spark.read.parquet(s"${liveRoot(spark, dir)}/$QuantizerSubdir")
      .orderBy("cluster").collect()
      .map(_.getSeq[Float](1).toArray)

  private def fsOf(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The current base-generation root of an index directory — `dir`
    * itself until the first [[compactIndex]], the `_current`-pointed
    * generation after ([[graft.sources.Generations]] is the shared
    * commit protocol). Model subdirs live under this root.
    */
  private def liveRoot(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.sources.Generations.resolveRoot(fsOf(spark, dir), dir)

  /** The live inverted lists of a persisted index: the current base
    * generation UNION every committed-but-not-yet-folded append batch
    * (each an atomically visible directory under `_appends_data` — see
    * [[appendIndexBatch]]). This is THE read path every serve goes
    * through; reading `dir` with a bare `spark.read.parquet` sees only
    * the flat layout and goes stale after the first compaction.
    *
    * Concurrency: the resolution is a point-in-time snapshot. A reader
    * racing a compaction flip may fail against just-collected files and
    * must retry; it can never observe a half-folded state (a batch is
    * either visible in full or already in the base generation, and the
    * `_folded` manifest says which).
    */
  def readIndex(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.IndexLayout.readLive(spark, dir)

  /** [[writeIndex]] core over an explicit cluster-assignment column —
    * the layout/IO path isolated from the quantizer, so scale probes can
    * exercise 1000-partition-class index layouts without paying a
    * 1000-centroid k-means.
    *
    * The rows SHUFFLE onto their cluster before the partitioned write:
    * without it every write task fans a file into every cluster dir it
    * sees — ScaleProbe17 measured 32,768 files for a k=1024 index from
    * 32 tasks (tasks x clusters), with the write at 57.9 s and every
    * pruned serve paying a file listing/open tax (4.3 s/probe set) that
    * grows with executor count. Cluster-aligned, each inverted list is
    * one file (tasks carrying several clusters still cut one file per
    * cluster): same index, 1,024 files, write 9.0 s, warm pruned serve
    * 1.8 s. Lists that outgrow a sane file size split via
    * `spark.sql.files.maxRecordsPerFile` — a size bound, not a
    * task-count artifact.
    */
  /** Full-rebuild reset: a rebuild is a NEW index, so the generation
    * pointer, old generations, batch areas, replay markers, AND the
    * model subdirs all go — a stale `_opq`/`_pq_resid` dispatch bit
    * from a previous layout would otherwise make self-describing
    * appends encode to the WRONG code form against the new lists.
    * (Contract: use a fresh stream checkpoint after a rebuild — an old
    * checkpoint would re-deliver batches the new index never saw.)
    */
  private def resetIndexState(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    graft.sources.Generations.reset(
      fsOf(spark, dir), dir,
      Seq(AppendsDataSubdir, AppendsSubdir,
        QuantizerSubdir, PqSubdir, PqResidSubdir, OpqSubdir))

  private[graft] def writeIndexAssigned(
      corpus: DataFrame, cluster: Column, dir: String,
      metaCols: Seq[String] = Nil): Unit = {
    resetIndexState(corpus.sparkSession, dir)
    corpus.select(
      Seq(col("vec_id"), graft.gfunctions.int8_codes(col("embedding")).as("codes_bin"),
        cluster.cast("int").as("cluster")) ++ metaCols.map(col): _*)
      .repartition(col("cluster"))
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
  }

  /** Serve from a [[writeIndex]] directory. The probed cluster ids are
    * collected from the QUERY set (small by contract — it rides a
    * broadcast) and pushed as a literal `cluster IN (...)` filter, so
    * the parquet scan STATICALLY PRUNES to the probed partitions —
    * serving I/O is (lists touched)/(corpus), not a full index scan;
    * the spec asserts the pruning is in the plan, not assumed. The
    * per-query refinement is the same broadcast equi-join as
    * [[topKInt8]], scored by the native integer kernel.
    *
    * NOTE: deriving the literal IN-list fires an EAGER Spark job at call
    * time (the price of static pruning — the filter must be a literal
    * before the plan is built). The probe frame is localCheckpoint'ed
    * first so the query-banding subplan runs ONCE and the join reuses
    * the materialized probes instead of recomputing them.
    */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      centroids: Array[Array[Float]],
      k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    import graft.gfunctions.int8_codes
    val probes = queries.select(
      col("vec_id").as("query_id"), int8_codes(col("embedding")).as("qcodes"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
      .localCheckpoint(eager = true)
    searchIndexProbed(spark, dir, probes, k)
  }

  /** Self-describing serve: probes against the quantizer persisted with
    * the index (`dir/_quantizer`) — no caller-carried centroid state.
    */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame): DataFrame =
    searchIndex(spark, dir, queries, readCentroids(spark, dir))

  def searchIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int): DataFrame =
    searchIndex(spark, dir, queries, readCentroids(spark, dir), k, nprobe)

  /** Attribute-FILTERED serve from a `writeIndex(..., metaCols)`
    * directory: `predicate` (over the persisted metadata columns)
    * applies INSIDE the statically pruned list scan — Parquet pushes it
    * down (PushedFilters, spec-asserted), so a selective filter cuts
    * list I/O before any scoring — and top-k ranks the SURVIVORS
    * (post-filter semantics: k results that all satisfy the predicate,
    * the filtered-ANN contract). The recall caveat is about
    * CORRELATION, not selectivity — measured (ScaleProbe19, 200k
    * vectors): filters independent of embedding space thin every list
    * uniformly and cost nothing (recall@10 = 1.000 at nprobe=2 down to
    * 1/100 selectivity), while a filter aligned with cluster structure
    * concentrates survivors in lists the query may not probe (recall
    * 0.250 at nprobe=2 when the filter keeps exactly one cluster —
    * the probe-hit chance — restored to 1.000 at full probe). Raise
    * nprobe for predicates that correlate with the vector space.
    */
  def searchIndexFiltered(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      predicate: Column,
      k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    import graft.gfunctions.int8_codes
    val centroids = readCentroids(spark, dir)
    val probes = queries.select(
      col("vec_id").as("query_id"), int8_codes(col("embedding")).as("qcodes"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
      .localCheckpoint(eager = true)
    searchIndexProbed(spark, dir, probes, k, Some(predicate))
  }

  /** [[searchIndex]] core over an explicit (query_id, qcodes, cluster)
    * probe frame (already materialized by the caller): literal IN-list
    * from the probed clusters -> statically pruned index scan -> the
    * broadcast refinement join, integer-kernel scored. The serving read
    * path isolated from the quantizer for the same reason as
    * [[writeIndexAssigned]].
    */
  /** The shared serving scaffold for EVERY persisted layout: collect
    * the probed cluster ids into a literal IN-filter (static partition
    * pruning), apply the optional metadata predicate inside the pruned
    * scan, equi-join the broadcast probes on cluster, score with the
    * layout's `sim` expression (int8 kernel by default; the PQ-family
    * cores pass their ADC forms), rank. One implementation so a fix to
    * the prune/join/rank logic lands in all four layouts at once.
    */
  private[graft] def searchIndexProbed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      probes: DataFrame,
      k: Int,
      predicate: Option[Column] = None,
      sim: Column = graft.gfunctions.int8_cosine(col("c.codes_bin"), col("qcodes"))): DataFrame = {
    val probedClusters = probes.select("cluster").distinct()
      .collect().map(_.getInt(0))
    val pruned = readIndex(spark, dir)
      .filter(col("cluster").isin(probedClusters.toIndexedSeq: _*))
    val listed = predicate.fold(pruned)(pruned.filter)
    val cand = listed.alias("c")
      .join(broadcast(probes.alias("q")),
        col("c.cluster") === col("q.cluster") && col("query_id") =!= col("c.vec_id"))
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"), sim.as("sim"))
    Similarity.rankTopK(cand, k)
  }

  /** APPEND a delta of new vectors to a persisted [[writeIndex]]
    * directory — the index lifecycle between rebuilds: a growing corpus
    * adds vectors far more often than the coarse quantizer needs
    * retraining, so deltas assign at full precision against the SAME
    * centroids the index was built with (the quantizer is versioned
    * with the index; retraining means a rebuild). The batch lands as
    * ONE atomically visible cluster-aligned directory under
    * `_appends_data` — appends never modify the base generation, which
    * is what makes a concurrent [[compactIndex]] unable to lose them
    * (the [[graft.sources.Generations]] protocol; FencingSpec proves
    * the interleaving). Serving needs no coordination: the next
    * [[readIndex]] resolution unions the committed batches in.
    *
    * Each append adds one directory of one-file-per-touched-cluster, so
    * the list read fragments over time — [[compactIndex]] is the
    * maintenance pass that folds batches back into one file per list
    * (the ScaleProbe17 layout cost is exactly what unbounded
    * fragmentation re-creates).
    *
    * LEGACY GUARD: this explicit-centroid overload int8-encodes, so it
    * refuses (IllegalArgumentException) an index whose lists carry PQ /
    * residual / OPQ codes or metadata columns — a silently unioned
    * foreign code column would leave appended rows null-coded under the
    * serve path. Use the self-describing `appendIndex(delta, dir)`,
    * which encodes to the index's own form.
    *
    * Concurrency contract: any number of appenders may run concurrently
    * with each other, with readers, and with ONE [[compactIndex]]; an
    * append may fail transiently during a compaction flip (stale model
    * read) and must be retried — it is never silently lost.
    */
  def appendIndex(delta: DataFrame, centroids: Array[Array[Float]], dir: String): Unit = {
    val spark = delta.sparkSession
    val root = liveRoot(spark, dir)
    val fs = fsOf(spark, dir)
    Seq(PqSubdir, PqResidSubdir, OpqSubdir).foreach { sub =>
      require(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/$sub")),
        s"appendIndex(delta, centroids, dir): $dir carries a $sub model — its lists are " +
          "not int8-coded. Use the self-describing appendIndex(delta, dir), which encodes " +
          "to the index's own code form.")
    }
    val baseCols = spark.read.parquet(root).schema.fieldNames.toSet
    require(baseCols == Set("vec_id", "codes_bin", "cluster"),
      s"appendIndex(delta, centroids, dir): $dir carries metadata columns " +
        s"(${baseCols.mkString(",")}) this overload would drop. Use appendIndex(delta, dir).")
    landBatch(
      delta.select(
        col("vec_id"), graft.gfunctions.int8_codes(col("embedding")).as("codes_bin"),
        clusterOf(col("embedding"), centroids).cast("int").as("cluster")),
      dir, "adhoc-" + java.util.UUID.randomUUID.toString)
  }

  /** Self-describing append: assigns against the index's OWN persisted
    * quantizer AND encodes to the index's own code form (rotated OPQ /
    * residual / raw PQ if the matching model subdir is persisted, int8
    * otherwise), carrying the index's metadata columns — the contract
    * by construction. Same landing discipline and concurrency contract
    * as the batch path: one atomic directory, compaction-safe.
    */
  def appendIndex(delta: DataFrame, dir: String): Unit =
    landBatch(encodeForIndex(delta, dir), dir,
      "adhoc-" + java.util.UUID.randomUUID.toString)

  /** IDEMPOTENT append for exactly-once streaming ingest
    * ([[graft.streaming.Streams.indexAppendStream]]). Structured
    * Streaming's foreachBatch re-delivers a batch after a crash between
    * the sink write and the checkpoint commit, so the append must be a
    * pure function of (batch content, batchId):
    *
    *  1. the delta stages cluster-aligned under
    *     `dir/_appends_data/.b-<batchId>` (dot-prefixed — invisible);
    *  2. ONE atomic rename makes it visible at
    *     `dir/_appends_data/<batchId>` — visibility is the data commit,
    *     so a concurrent [[compactIndex]] snapshot sees the whole batch
    *     or none of it, never a prefix;
    *  3. a marker lands at `dir/_appends/<batchId>`: a replay that sees
    *     it returns without touching the index. A replay that finds the
    *     visible data dir but no marker (crash in the gap) re-creates
    *     only the marker — batch content is replay-identical by
    *     Structured Streaming's source-replayability contract and the
    *     encode is deterministic against the persisted models.
    *
    * Markers live at the top level and are NEVER deleted: compaction
    * garbage-collects a folded batch's data directory, and the
    * surviving marker is what makes a late replay of that batch a
    * no-op instead of a re-append. One empty file per micro-batch is
    * the price (bounded by ingest cadence; at a 5-minute trigger that
    * is ~100k markers/year — fold into a manifest file if the listing
    * ever matters).
    *
    * Concurrency contract: see [[appendIndex]] — concurrent with other
    * appenders, readers, and one compactor; transient failure during a
    * flip is retried by the streaming lane (same batchId, idempotent).
    */
  def appendIndexBatch(delta: DataFrame, dir: String, batchId: Long): Unit =
    appendIndexBatch(delta, dir, batchId, "")

  /** [[appendIndexBatch]] with the batch id scoped to one STREAM
    * LIFETIME: Spark numbers batches per checkpoint, so a stream
    * re-pointed at this index with a FRESH checkpoint restarts at
    * batchId 0 — without a namespace its genuinely new batches would
    * be mistaken for replays and silently dropped.
    * [[graft.streaming.Streams.indexAppendStream]] derives the
    * namespace from the checkpoint path; direct callers own the
    * one-checkpoint-per-namespace contract.
    */
  /** True iff an append batch with this fully-qualified id (namespace +
    * batchId) has already committed against this index: marker present,
    * OR landed-but-unmarked (the crash window between [[landBatch]]'s
    * atomic visibility rename and the marker create — the same state
    * [[appendIndexBatch]] self-heals for its OWN id). Both halves
    * matter for a retired-namespace id
    * ([[graft.streaming.Streams.legacyBatchNamespace]]): a replay that
    * only checked the marker would re-land a crash-window batch under
    * the NEW namespace and duplicate its rows.
    */
  def appendCommitted(
      spark: org.apache.spark.sql.SparkSession, dir: String, id: String): Boolean =
    // data-dir-first ordering lives in the shared layer — see
    // [[graft.sources.IndexLayout.appendCommitted]] for why the reverse
    // order opens a re-land window against a concurrent compaction
    graft.sources.IndexLayout.appendCommitted(spark, dir, id)

  def appendIndexBatch(
      delta: DataFrame, dir: String, batchId: Long, namespace: String): Unit =
    appendIndexBatch(delta, dir, batchId, namespace, Nil)

  /** [[appendIndexBatch]] that ALSO honors commit records written under
    * retired id forms: `legacyIds` are checked inside the same replay
    * fence (and inside the lane's transient-retry envelope), so an
    * upgrade replay of a pre-upgrade batch — marker present or
    * crash-window landed-but-unmarked — stays a no-op instead of
    * re-landing under the new namespace.
    */
  def appendIndexBatch(
      delta: DataFrame, dir: String, batchId: Long, namespace: String,
      legacyIds: Seq[String]): Unit = {
    val spark = delta.sparkSession
    val fs = fsOf(spark, dir)
    val id = s"$namespace$batchId"
    if (graft.sources.IndexLayout.batchMarked(fs, dir, id)) return // committed replay
    if (legacyIds.exists(appendCommitted(spark, dir, _))) return
    // empty batches land nothing — the guard lives in the shared
    // IndexLayout.landBatch (post-write staging check, so the batch
    // plan is never evaluated twice); the marker still lands, because
    // the replay fence must remember the batch committed (as nothing)
    landBatch(encodeForIndex(delta, dir), dir, id)
    graft.sources.IndexLayout.markBatch(fs, dir, id)
  }

  /** Land an encoded batch as one atomically visible cluster-aligned
    * directory under `_appends_data` — the single write path every
    * append form shares. If the visible directory already exists the
    * batch is already committed (crash residue from a prior attempt of
    * the same id) and the landing is a no-op.
    *
    * The staging name carries a UNIQUE per-attempt suffix: with a
    * deterministic name, a replay (or a zombie driver's concurrent
    * attempt of the same batch) re-creating the path could interleave
    * with another attempt's commit rename — or with the aged staging
    * sweep — and commit a PARTIALLY written batch. Per-attempt names
    * make each staging dir single-writer by construction; a loser of
    * the visible rename (batch content is attempt-invariant under the
    * streaming replay contract) deletes its own residue, crashed
    * attempts age into the sweep.
    */
  private def landBatch(encoded: DataFrame, dir: String, id: String): Unit =
    graft.sources.IndexLayout.landBatch(encoded, dir, id, "cluster")

  /** Batch-commit markers for [[appendIndexBatch]] — underscore-hidden,
    * top-level, immortal (see the marker note there). Shared layout
    * constant: [[graft.sources.IndexLayout]].
    */
  private val AppendsSubdir = graft.sources.IndexLayout.AppendsSubdir

  /** Committed append-batch data directories — each one atomic unit of
    * ingest, unioned into [[readIndex]] until [[compactIndex]] folds it
    * into the next base generation and garbage-collects it.
    */
  private val AppendsDataSubdir = graft.sources.IndexLayout.AppendsDataSubdir

  /** Delta rows encoded to the index's OWN code form — rotated OPQ
    * codes if the directory carries a persisted `_opq` model, residual
    * PQ codes under `_pq_resid`, raw-vector PQ codes under `_pq`,
    * packed int8 otherwise — with cluster assignment against the
    * persisted quantizer. One ingest path serves all four index
    * layouts, and an append can never mix code columns into a foreign
    * index (the partitioned read would otherwise silently union the
    * two schemas).
    */
  private def encodeForIndex(delta: DataFrame, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val spark = delta.sparkSession
    val centroids = readCentroids(spark, dir)
    val fs = fsOf(spark, dir)
    val root = liveRoot(spark, dir)
    val cluster = clusterOf(col("embedding"), centroids).cast("int").as("cluster")
    // the index's OWN schema defines the passthrough metadata contract:
    // a `writeIndex*(..., metaCols)` index carries filter columns in its
    // lists, and an append that dropped them would leave appended rows
    // invisible to (or failing under) the filtered serve — so carry
    // every non-code column the live lists have, and fail LOUDLY
    // (AnalysisException) if the delta lacks one
    val codeCols = Set("vec_id", "cluster", "codes_bin", "codes_pq", "codes_pqr", "codes_opq")
    val meta: Seq[Column] = spark.read.parquet(root).schema.fieldNames.toSeq
      .filterNot(codeCols).map(col)
    if (fs.exists(new Path(s"$root/$OpqSubdir"))) {
      val model = readOpqModel(spark, dir)
      delta.select(
        Seq(
          col("vec_id"),
          graft.gfunctions.pq_codes(
            graft.gfunctions.mat_vec(col("embedding"), model.rotation, model.dims),
            model.pq.codebook, model.pq.m, model.pq.ksub).as("codes_opq"),
          cluster) ++ meta: _*)
    } else if (fs.exists(new Path(s"$root/$PqResidSubdir"))) {
      val model = readPqModel(spark, dir, PqResidSubdir)
      val flat = centroids.flatten
      delta.select(Seq(col("vec_id"), col("embedding"), cluster) ++ meta: _*)
        .select(
          Seq(
            col("vec_id"),
            graft.gfunctions.pq_resid_codes(
              col("embedding"), col("cluster"), flat, model.codebook, model.m, model.ksub)
              .as("codes_pqr"),
            col("cluster")) ++ meta: _*)
    } else if (fs.exists(new Path(s"$root/$PqSubdir"))) {
      val model = readPqModel(spark, dir)
      delta.select(
        Seq(
          col("vec_id"),
          graft.gfunctions.pq_codes(col("embedding"), model.codebook, model.m, model.ksub)
            .as("codes_pq"),
          cluster) ++ meta: _*)
    } else {
      delta.select(
        Seq(
          col("vec_id"), graft.gfunctions.int8_codes(col("embedding")).as("codes_bin"),
          cluster) ++ meta: _*)
    }
  }

  /** Fold an appended-to index back to one file per inverted list, via
    * the [[graft.sources.Generations]] commit protocol: the folded copy
    * lands cluster-aligned in a brand-new `_gen-N+1` directory together
    * with COPIES of the model subdirs and a cumulative `_folded`
    * manifest of the batch ids it absorbed, is marked `_complete`, and
    * the `_current` pointer flips atomically. Row content is unchanged
    * — compaction is a LAYOUT operation; the spec pins search-result
    * identity across it.
    *
    * Concurrency contract — this is the round-14 writer fencing: at
    * most ONE compactor per index (the pointer flip is not arbitrated
    * between compactors), but compaction runs safely CONCURRENT with
    * any number of [[appendIndexBatch]]/[[appendIndex]] writers and
    * readers. An append that commits after the fold snapshot simply
    * stays outside the `_folded` manifest and remains live under the
    * new generation — it can never be deleted by the flip, because
    * appends and generations never share files (FencingSpec interleaves
    * a real append inside this function and proves zero lost rows and
    * marker integrity). Crash-safety: every pre-flip crash leaves the
    * old generation current and the partial new one invisible
    * (`_complete` is last); a mid-flip crash resolves to the completed
    * generation; all residue is swept on the next run's entry GC.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    compactIndexHooked(spark, dir, () => ())

  /** [[compactIndex]] with a test seam: `afterSnapshot` runs between
    * the fold snapshot (the visible-batch listing) and the generation
    * write — exactly the window where the old in-place swap lost
    * concurrent appends.
    */
  private[graft] def compactIndexHooked(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      afterSnapshot: () => Unit): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsOf(spark, dir)
    val models = Seq(QuantizerSubdir, PqSubdir, PqResidSubdir, OpqSubdir)
    // The protocol (entry GC, fold snapshot fence, marker-before-
    // complete ordering, post-flip GC, the r13-era .old heal) lives in
    // the shared layer — [[graft.sources.IndexLayout.compact]]. What is
    // IVF-specific here: lists partition on `cluster`, and the sidecar
    // fold COPIES (never moves) the model subdirs, so the live root
    // stays fully readable until the flip and a concurrent append can
    // still encode against it.
    graft.sources.IndexLayout.compact(
      spark, dir, partitionCol = "cluster", sidecarNames = models,
      foldSidecars = (root, _, nextRoot) =>
        models.foreach { sub =>
          val src = new Path(s"$root/$sub")
          if (fs.exists(src))
            require(
              FileUtil.copy(fs, src, fs, new Path(s"$nextRoot/$sub"), false, conf),
              s"compactIndex: could not copy $sub into $nextRoot")
        },
      afterSnapshot = afterSnapshot)
  }

  /** Two-phase serving from a persisted index — [[searchIndex]] composed
    * with the exact-float rerank of
    * [[Similarity.int8RerankTopK]]: the coarse pass scores PACKED codes
    * over the statically pruned partitions and keeps k*oversample
    * candidates per query; the rerank re-scores just those candidates
    * with the exact float kernel via an equi-join on candidate id
    * against the float corpus. ScaleProbe16 measured the decay this
    * exists to fix (pure int8 recall@10 0.62 on a 200k dense manifold,
    * rerank 1.000) — the persisted index is the serving shape, so it
    * inherits the decay exactly and needs the fix most.
    *
    * At 100 TB: the index scan touches nprobe lists of 1-byte/dim codes;
    * the float corpus is touched for k*oversample rows per query — a
    * broadcast-driven point-lookup, never a float-corpus scan.
    */
  def searchIndexRerank(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      corpus: DataFrame,
      centroids: Array[Array[Float]],
      k: Int = 10,
      nprobe: Int = 2,
      oversample: Int = 10): DataFrame =
    Similarity.exactRerank(
      searchIndex(spark, dir, queries, centroids, k * oversample, nprobe), queries, corpus, k)

  /** Self-describing two-phase serve — the persisted quantizer edition
    * of [[searchIndexRerank]].
    */
  def searchIndexRerank(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      corpus: DataFrame): DataFrame =
    searchIndexRerank(spark, dir, queries, corpus, readCentroids(spark, dir))

  // ------------------------------------------------------------- IVF-PQ

  /** IVF-PQ: compute pruning (nprobe lists per query) x the DEEPEST
    * memory pruning (m-byte PQ codes in the lists instead of the int8
    * path's dims bytes — 8 B vs 64 B at the defaults). List assignment
    * stays full-precision like [[topKInt8]]; scoring inside probed lists
    * is ADC — the per-query LUT rides the broadcast probe side, each
    * candidate costs m table lookups. At full probe the candidate set is
    * the whole corpus, so results equal [[Pq.topKPq]] row for row (the
    * parity spec).
    */
  def topKPq(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Float]],
      model: Pq.Model,
      k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    import graft.gfunctions.{pq_adc_sim, pq_codes, pq_lut}
    val listed = corpus.select(
      col("vec_id"), pq_codes(col("embedding"), model.codebook, model.m, model.ksub).as("codes_pq"),
      clusterOf(col("embedding"), centroids).as("cluster"))
    val probes = queries.select(
      col("vec_id").as("query_id"),
      pq_lut(col("embedding"), model.codebook, model.m, model.ksub).as("qlut"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
    val cand = listed.alias("c")
      .join(broadcast(probes.alias("q")),
        col("c.cluster") === col("q.cluster") && col("query_id") =!= col("c.vec_id"))
      .select(
        col("query_id"), col("c.vec_id").as("neighbor_id"),
        pq_adc_sim(col("c.codes_pq"), col("qlut"), model.codebook, model.m, model.ksub).as("sim"))
    Similarity.rankTopK(cand, k)
  }

  // -------------------------------------------------- residual IVF-PQ

  /** Driver-side cosine assignment matching [[clusterOf]]'s rule (sim
    * desc, lower cluster id on ties) — training-time residuals must
    * come from the SAME assignment the engine applies at encode time.
    */
  private def nearestByCosine(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      var dot = 0.0
      var nv = 0.0
      var nc = 0.0
      var i = 0
      while (i < v.length) {
        val vi = v(i).toDouble
        val ci = centroids(c)(i).toDouble
        dot += vi * ci
        nv += vi * vi
        nc += ci * ci
        i += 1
      }
      val sim = if (nv == 0.0 || nc == 0.0) 0.0 else dot / math.sqrt(nv * nc)
      if (sim > bestSim) { bestSim = sim; best = c } // strict > keeps the lower id on ties
      c += 1
    }
    best
  }

  /** Train a RESIDUAL PQ codebook against a coarse quantizer — the
    * textbook IVFPQ refinement: the residuals vec - centroid[cluster]
    * of a decent quantizer are smaller-magnitude and better-centered
    * than raw vectors, so the same m bytes buy finer cells. Same
    * bounded-sample / driver-local discipline as [[Pq.train]]; the
    * sample assigns with the engine's own cosine rule so training sees
    * the distribution encoding will see.
    */
  def trainResidualPq(
      emb: DataFrame, centroids: Array[Array[Float]],
      m: Int = 8, ksub: Int = 64, dims: Int = 64,
      iters: Int = 10, sampleFactor: Long = 100L): Pq.Model = {
    val sample = trainingSample(emb, ksub, sampleFactor)
      .select("vec_id", "embedding").orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray)
    val residuals = sample.map { v =>
      val c = centroids(nearestByCosine(v, centroids))
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    Pq.trainOnVectors(residuals, m, ksub, dims, iters)
  }

  /** Residual IVF-PQ search: lists carry m-byte RESIDUAL codes; scoring
    * is exact cosine over centroid + residual reconstruction via
    * cluster-conditioned tables ([[graft.gfunctions.pq_resid_sim]] —
    * the cross terms dot(centroid_j, residCentroid_e) are plan-time
    * constants, so a candidate still costs table lookups). Same probe /
    * equi-join / rank shape as [[topKPq]]; at full probe this ranks by
    * the exact reconstruction cosine of the residual model (the parity
    * and recall specs quantify what the residual refinement buys over
    * raw-vector PQ at the same byte budget).
    */
  def topKPqResidual(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Float]],
      model: Pq.Model,
      k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    import graft.gfunctions.{pq_resid_codes, pq_resid_lut, pq_resid_sim}
    val flat = centroids.flatten
    val assigned = corpus.select(
      col("vec_id"), col("embedding"),
      clusterOf(col("embedding"), centroids).cast("int").as("cluster"))
    val listed = assigned.select(
      col("vec_id"), col("cluster"),
      pq_resid_codes(col("embedding"), col("cluster"), flat, model.codebook, model.m, model.ksub)
        .as("codes_pqr"))
    val probes = queries.select(
      col("vec_id").as("query_id"),
      pq_resid_lut(col("embedding"), flat, model.codebook, model.m, model.ksub).as("qlut"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
    val cand = listed.alias("c")
      .join(broadcast(probes.alias("q")),
        col("c.cluster") === col("q.cluster") && col("query_id") =!= col("c.vec_id"))
      .select(
        col("query_id"), col("c.vec_id").as("neighbor_id"),
        pq_resid_sim(
          col("c.codes_pqr"), col("qlut"), col("c.cluster"),
          flat, model.codebook, model.m, model.ksub).as("sim"))
    Similarity.rankTopK(cand, k)
  }

  /** The PQ codebook is versioned with the index like the coarse
    * quantizer: persisted under `dir/_pq` (underscore-hidden from the
    * list scan), one row per codebook entry plus the (m, ksub) shape.
    */
  private val PqSubdir = "_pq"

  /** The residual codebook versions under a DISTINCT subdir from `_pq`
    * because the code meaning differs: `codes_pq` index the raw-vector
    * codebook, `codes_pqr` index the residual codebook against the
    * persisted quantizer. The subdir that exists IS the dispatch bit
    * for self-describing serve and append ([[encodeForIndex]]).
    */
  private val PqResidSubdir = "_pq_resid"

  private def writePqModel(
      spark: org.apache.spark.sql.SparkSession, model: Pq.Model, dir: String,
      subdir: String = PqSubdir): Unit = {
    import spark.implicits._
    val dsub = model.dsub
    (0 until model.m * model.ksub)
      .map(e => (model.m, model.ksub, e,
        (0 until dsub).map(i => model.codebook(e * dsub + i))))
      .toDF("m", "ksub", "entry", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$subdir")
  }

  def readPqModel(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      subdir: String = PqSubdir): Pq.Model = {
    val rows = spark.read.parquet(s"${liveRoot(spark, dir)}/$subdir").orderBy("entry").collect()
    val m = rows.head.getInt(0)
    val ksub = rows.head.getInt(1)
    val codebook = rows.flatMap(_.getSeq[Float](3)).toArray
    Pq.Model(codebook, m, ksub)
  }

  /** Read the RESIDUAL codebook persisted with a [[writeIndexPqResid]]
    * index (specs use this for the round-trip pin).
    */
  def readPqResidModel(spark: org.apache.spark.sql.SparkSession, dir: String): Pq.Model =
    readPqModel(spark, dir, PqResidSubdir)

  /** The OPQ model versions under `dir/_opq`: the rotation at
    * `_opq/rotation` (one row per matrix row) and the ROTATED-space PQ
    * codebook at `_opq/pq` (the `_pq` row shape). Like `_pq` /
    * `_pq_resid`, the subdir that exists is the dispatch bit for
    * self-describing serve and append.
    */
  private val OpqSubdir = "_opq"

  private def writeOpqModel(
      spark: org.apache.spark.sql.SparkSession, model: Opq.Model, dir: String): Unit = {
    import spark.implicits._
    val d = model.dims
    (0 until d)
      .map(i => (d, i, (0 until d).map(j => model.rotation(i * d + j))))
      .toDF("dims", "row", "values")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$OpqSubdir/rotation")
    writePqModel(spark, model.pq, dir, s"$OpqSubdir/pq")
  }

  /** Read the OPQ model persisted with a [[writeIndexOpq]] index. */
  def readOpqModel(spark: org.apache.spark.sql.SparkSession, dir: String): Opq.Model = {
    val rows = spark.read.parquet(s"${liveRoot(spark, dir)}/$OpqSubdir/rotation")
      .orderBy("row").collect()
    val rotation = rows.flatMap(_.getSeq[Float](2)).toArray
    Opq.Model(rotation, readPqModel(spark, dir, s"$OpqSubdir/pq"))
  }

  /** Persist an IVF-PQ index: inverted lists of (vec_id, m-byte codes_pq)
    * partitioned by cluster, cluster-aligned like [[writeIndexAssigned]]
    * (one file per list); both models — the coarse quantizer AND the PQ
    * codebook — ride under `dir/_quantizer` / `dir/_pq`, so serving is
    * fully self-describing. This is the index shape where a 100 TB
    * corpus's lists are m bytes per vector: 8 B at the defaults, 8x
    * below the int8 index, 32x below float32.
    */
  def writeIndexPq(
      corpus: DataFrame, centroids: Array[Array[Float]], model: Pq.Model,
      dir: String): Unit =
    writeIndexPq(corpus, centroids, model, dir, Nil)

  /** [[writeIndexPq]] carrying passthrough METADATA columns into the
    * m-byte lists — the same filtered-ANN trade as the int8
    * `writeIndex(..., metaCols)`: filter state lives IN the index so
    * the pruned scan pushes it down, at the cost of riding every list
    * row. With 8-byte codes the metadata is often LARGER than the
    * vector payload — keep it to the few small columns serving
    * actually filters by.
    */
  def writeIndexPq(
      corpus: DataFrame, centroids: Array[Array[Float]], model: Pq.Model,
      dir: String, metaCols: Seq[String]): Unit = {
    import graft.gfunctions.pq_codes
    resetIndexState(corpus.sparkSession, dir)
    corpus.select(
      Seq(
        col("vec_id"),
        pq_codes(col("embedding"), model.codebook, model.m, model.ksub).as("codes_pq"),
        clusterOf(col("embedding"), centroids).cast("int").as("cluster")) ++
        metaCols.map(col): _*)
      .repartition(col("cluster"))
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    writeCentroids(corpus.sparkSession, centroids, dir)
    writePqModel(corpus.sparkSession, model, dir)
  }

  /** Serve ADC top-k from a [[writeIndexPq]] directory: probed cluster
    * ids push as a literal IN-filter (static partition pruning, same as
    * [[searchIndex]]); candidates inside the pruned lists score via the
    * per-query LUT riding the broadcast probe frame. Self-describing:
    * both models read back from the index directory.
    */
  def searchIndexPq(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 2): DataFrame =
    searchIndexPqCore(spark, dir, queries, k, nprobe, None)

  /** Attribute-FILTERED ADC serve from a `writeIndexPq(..., metaCols)`
    * directory — the PQ edition of [[searchIndexFiltered]]: the
    * predicate applies INSIDE the statically pruned m-byte list scan
    * (Parquet pushdown, spec-asserted) and top-k ranks the survivors
    * (post-filter semantics). The ScaleProbe19 correlation caveat
    * applies unchanged — it is a property of list pruning, not of the
    * code form.
    */
  def searchIndexPqFiltered(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      predicate: Column,
      k: Int = 10,
      nprobe: Int = 2): DataFrame =
    searchIndexPqCore(spark, dir, queries, k, nprobe, Some(predicate))

  private def searchIndexPqCore(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      predicate: Option[Column]): DataFrame = {
    import graft.gfunctions.{pq_adc_sim, pq_lut}
    val centroids = readCentroids(spark, dir)
    val model = readPqModel(spark, dir)
    val probes = queries.select(
      col("vec_id").as("query_id"),
      pq_lut(col("embedding"), model.codebook, model.m, model.ksub).as("qlut"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
      .localCheckpoint(eager = true)
    searchIndexProbed(spark, dir, probes, k, predicate,
      sim = pq_adc_sim(col("c.codes_pq"), col("qlut"), model.codebook, model.m, model.ksub))
  }

  /** Two-phase IVF-PQ serving — the deepest-compression edition of
    * [[searchIndexRerank]]: coarse ADC over the pruned m-byte lists
    * keeps k*oversample, exact float rerank via broadcast candidate-id
    * join. Oversample default is the PQ rerank's 20x (coarser cells
    * than int8 — see [[Pq.pqRerankTopK]]).
    */
  def searchIndexPqRerank(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 10,
      nprobe: Int = 2,
      oversample: Int = 20): DataFrame =
    Similarity.exactRerank(
      searchIndexPq(spark, dir, queries, k * oversample, nprobe), queries, corpus, k)

  // ------------------------------------ persisted RESIDUAL IVF-PQ index

  /** Persist a residual IVF-PQ index: inverted lists of (vec_id, m-byte
    * codes_pqr) partitioned by cluster, cluster-aligned (one file per
    * list), with the coarse quantizer under `dir/_quantizer` and the
    * RESIDUAL codebook under `dir/_pq_resid` — the subdir name is the
    * self-describing dispatch bit ([[encodeForIndex]] appends encode
    * residually, [[searchIndexPqResid]] scores residually). Same 8 B/
    * vector hot size as [[writeIndexPq]]; the residual refinement buys
    * recall at that byte budget (PqSpec measures it on the gate set),
    * and it is the DEFAULT 8-byte rung: in the ladder probe
    * (ScaleProbe24, dense 200k corpus, rerank@100x) the residual index
    * recovers recall@10 = 1.000 where raw PQ and OPQ leave 0.981.
    */
  def writeIndexPqResid(
      corpus: DataFrame, centroids: Array[Array[Float]], model: Pq.Model,
      dir: String): Unit =
    writeIndexPqResid(corpus, centroids, model, dir, Nil)

  /** [[writeIndexPqResid]] carrying passthrough METADATA columns into
    * the lists — same filtered-serving trade as `writeIndexPq(...,
    * metaCols)`.
    */
  def writeIndexPqResid(
      corpus: DataFrame, centroids: Array[Array[Float]], model: Pq.Model,
      dir: String, metaCols: Seq[String]): Unit = {
    import graft.gfunctions.pq_resid_codes
    resetIndexState(corpus.sparkSession, dir)
    val flat = centroids.flatten
    corpus
      .select(
        Seq(col("vec_id"), col("embedding"),
          clusterOf(col("embedding"), centroids).cast("int").as("cluster")) ++
          metaCols.map(col): _*)
      .select(
        Seq(
          col("vec_id"),
          pq_resid_codes(
            col("embedding"), col("cluster"), flat, model.codebook, model.m, model.ksub)
            .as("codes_pqr"),
          col("cluster")) ++ metaCols.map(col): _*)
      .repartition(col("cluster"))
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    writeCentroids(corpus.sparkSession, centroids, dir)
    writePqModel(corpus.sparkSession, model, dir, PqResidSubdir)
  }

  /** Serve residual-ADC top-k from a [[writeIndexPqResid]] directory:
    * probed cluster ids push as a literal IN-filter (static partition
    * pruning); candidates inside the pruned lists score by the EXACT
    * reconstruction cosine via cluster-conditioned tables — the
    * partition column itself feeds [[graft.gfunctions.pq_resid_sim]],
    * so the list rows stay m bytes with no extra state. Self-
    * describing: both models read back from the index directory.
    */
  def searchIndexPqResid(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 2): DataFrame =
    searchIndexPqResidCore(spark, dir, queries, k, nprobe, None)

  /** Attribute-FILTERED residual serve — predicate applies inside the
    * statically pruned scan (Parquet pushdown), post-filter top-k. The
    * ScaleProbe19 correlation caveat applies unchanged.
    */
  def searchIndexPqResidFiltered(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      predicate: Column,
      k: Int = 10,
      nprobe: Int = 2): DataFrame =
    searchIndexPqResidCore(spark, dir, queries, k, nprobe, Some(predicate))

  private def searchIndexPqResidCore(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      predicate: Option[Column]): DataFrame = {
    import graft.gfunctions.{pq_resid_lut, pq_resid_sim}
    val centroids = readCentroids(spark, dir)
    val flat = centroids.flatten
    val model = readPqModel(spark, dir, PqResidSubdir)
    val probes = queries.select(
      col("vec_id").as("query_id"),
      pq_resid_lut(col("embedding"), flat, model.codebook, model.m, model.ksub).as("qlut"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
      .localCheckpoint(eager = true)
    searchIndexProbed(spark, dir, probes, k, predicate,
      sim = pq_resid_sim(
        col("c.codes_pqr"), col("qlut"), col("c.cluster").cast("int"),
        flat, model.codebook, model.m, model.ksub))
  }

  /** Two-phase residual IVF-PQ serving: coarse residual-ADC over the
    * pruned m-byte lists keeps k*oversample, exact float rerank via
    * broadcast candidate-id join. Oversample default matches
    * [[searchIndexPqRerank]]'s 20x (same cell coarseness class).
    */
  def searchIndexPqResidRerank(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 10,
      nprobe: Int = 2,
      oversample: Int = 20): DataFrame =
    Similarity.exactRerank(
      searchIndexPqResid(spark, dir, queries, k * oversample, nprobe), queries, corpus, k)

  // ---------------------------------------- persisted OPQ (IVF-OPQ) index

  /** In-memory IVF-OPQ: [[topKPq]] with the rotation fused into both
    * projections. Cluster assignment stays in the RAW space (orthogonal
    * rotations preserve cosine, so raw-space and rotated-space k-means
    * partitions are metrically equivalent — keeping assignment raw means
    * the same coarse quantizer serves every code form in the ladder);
    * codes and the query LUT live in the ROTATED space where the cells
    * fit better.
    */
  def topKOpq(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Float]],
      model: Opq.Model,
      k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    import graft.gfunctions.{mat_vec, pq_adc_sim, pq_codes, pq_lut}
    val listed = corpus.select(
      col("vec_id"),
      pq_codes(
        mat_vec(col("embedding"), model.rotation, model.dims),
        model.pq.codebook, model.pq.m, model.pq.ksub).as("codes_opq"),
      clusterOf(col("embedding"), centroids).as("cluster"))
    val probes = queries.select(
      col("vec_id").as("query_id"),
      pq_lut(
        mat_vec(col("embedding"), model.rotation, model.dims),
        model.pq.codebook, model.pq.m, model.pq.ksub).as("qlut"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
    val cand = listed.alias("c")
      .join(broadcast(probes.alias("q")),
        col("c.cluster") === col("q.cluster") && col("query_id") =!= col("c.vec_id"))
      .select(
        col("query_id"), col("c.vec_id").as("neighbor_id"),
        pq_adc_sim(col("c.codes_opq"), col("qlut"), model.pq.codebook, model.pq.m, model.pq.ksub)
          .as("sim"))
    Similarity.rankTopK(cand, k)
  }

  /** Persist an IVF-OPQ index: inverted lists of (vec_id, m-byte
    * codes_opq) cluster-aligned, the raw-space coarse quantizer under
    * `_quantizer` and the OPQ model (rotation + rotated-space codebook)
    * under `_opq` — the dispatch bit, so [[encodeForIndex]] appends
    * rotate-and-encode with zero new ingest code. Same 8 B/vector hot
    * size as the other PQ indexes; the rotation buys quantization error
    * (OpqSpec: 82.8% of plain PQ's on real embeddings).
    */
  def writeIndexOpq(
      corpus: DataFrame, centroids: Array[Array[Float]], model: Opq.Model,
      dir: String): Unit =
    writeIndexOpq(corpus, centroids, model, dir, Nil)

  /** [[writeIndexOpq]] carrying passthrough METADATA columns — the
    * filtered-serving trade of `writeIndexPq(..., metaCols)`.
    */
  def writeIndexOpq(
      corpus: DataFrame, centroids: Array[Array[Float]], model: Opq.Model,
      dir: String, metaCols: Seq[String]): Unit = {
    import graft.gfunctions.{mat_vec, pq_codes}
    resetIndexState(corpus.sparkSession, dir)
    corpus.select(
      Seq(
        col("vec_id"),
        pq_codes(
          mat_vec(col("embedding"), model.rotation, model.dims),
          model.pq.codebook, model.pq.m, model.pq.ksub).as("codes_opq"),
        clusterOf(col("embedding"), centroids).cast("int").as("cluster")) ++
        metaCols.map(col): _*)
      .repartition(col("cluster"))
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    writeCentroids(corpus.sparkSession, centroids, dir)
    writeOpqModel(corpus.sparkSession, model, dir)
  }

  /** Serve rotated-ADC top-k from a [[writeIndexOpq]] directory: probed
    * cluster ids (raw-space assignment) push as a literal IN-filter;
    * candidates score against the ROTATED query LUT. Self-describing.
    */
  def searchIndexOpq(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 2): DataFrame =
    searchIndexOpqCore(spark, dir, queries, k, nprobe, None)

  /** Attribute-FILTERED OPQ serve — pushed predicates inside the pruned
    * scan, post-filter top-k; the ScaleProbe19 correlation caveat
    * applies unchanged.
    */
  def searchIndexOpqFiltered(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      predicate: Column,
      k: Int = 10,
      nprobe: Int = 2): DataFrame =
    searchIndexOpqCore(spark, dir, queries, k, nprobe, Some(predicate))

  private def searchIndexOpqCore(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      predicate: Option[Column]): DataFrame = {
    import graft.gfunctions.{mat_vec, pq_adc_sim, pq_lut}
    val centroids = readCentroids(spark, dir)
    val model = readOpqModel(spark, dir)
    val probes = queries.select(
      col("vec_id").as("query_id"),
      pq_lut(
        mat_vec(col("embedding"), model.rotation, model.dims),
        model.pq.codebook, model.pq.m, model.pq.ksub).as("qlut"),
      explode(transform(
        slice(nearestClusters(col("embedding"), centroids), 1, nprobe),
        s => -s.getField("neg_id"))).as("cluster"))
      .localCheckpoint(eager = true)
    searchIndexProbed(spark, dir, probes, k, predicate,
      sim = pq_adc_sim(
        col("c.codes_opq"), col("qlut"), model.pq.codebook, model.pq.m, model.pq.ksub))
  }

  /** Two-phase OPQ serving: coarse rotated-ADC over the pruned lists
    * keeps k*oversample, exact float rerank on ORIGINAL vectors (the
    * invariance means the exact phase needs no rotation).
    */
  def searchIndexOpqRerank(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 10,
      nprobe: Int = 2,
      oversample: Int = 20): DataFrame =
    Similarity.exactRerank(
      searchIndexOpq(spark, dir, queries, k * oversample, nprobe), queries, corpus, k)
}
