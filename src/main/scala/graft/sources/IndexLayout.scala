package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The GENERIC persisted-index layout protocol, extracted from the IVF
  * lifecycle (r17) so the sparse BM25 postings index shares one
  * implementation of the hard parts instead of re-deriving them:
  *
  *  - base layout: a partitioned parquet table at `dir` (generation 0)
  *    or under a [[Generations]] `_current`-pointed generation dir;
  *  - appends: each batch one atomically visible directory under
  *    `_appends_data/<id>` (staged dot-prefixed with a per-attempt
  *    UUID, committed by ONE rename — see [[landBatch]]);
  *  - replay fence: immortal marker files under `_appends/<id>`;
  *  - compaction: fold visible batches into the next generation behind
  *    the full crash matrix (entry GC, fold snapshot fence, sidecar
  *    carry, folded manifest, marker-before-complete ordering,
  *    post-flip GC) — see [[compact]].
  *
  * What stays INDEX-SPECIFIC and is passed in: the partition column
  * (`cluster` for IVF lists, `bkt` for sparse postings), the sidecar
  * subdirectories living beside the data inside a root (quantizer/PQ
  * models for IVF, the `(S, N)` totals for BM25), and HOW sidecars fold
  * across a compaction (models COPY; totals SUM over the folded units —
  * the `foldSidecars` hook). Every behavioral guarantee the IVF specs
  * pin (FencingSpec, the crash matrix, idempotent replay) exercises
  * this shared code.
  */
private[graft] object IndexLayout {

  /** Batch-commit markers — underscore-hidden, top-level, immortal
    * (compaction GCs a folded batch's DATA dir; the surviving marker is
    * what keeps a late replay a no-op).
    */
  val AppendsSubdir = "_appends"

  /** Committed append-batch data directories — each one atomic unit of
    * ingest, unioned into [[readLive]] until [[compact]] folds it into
    * the next base generation.
    */
  val AppendsDataSubdir = "_appends_data"

  def fsOf(spark: org.apache.spark.sql.SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The current base-generation root — `dir` itself until the first
    * [[compact]], the `_current`-pointed generation after.
    */
  def liveRoot(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    Generations.resolveRoot(fsOf(spark, dir), dir)

  /** The live rows: current base generation UNION every committed,
    * not-yet-folded append batch. Point-in-time snapshot; a reader
    * racing a compaction flip may fail against just-collected files
    * and must retry — it can never observe a half-folded state.
    */
  def readLive(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Generations.liveRoots(fsOf(spark, dir), dir, AppendsDataSubdir)
      .map(spark.read.parquet(_))
      .reduceLeft(_ unionByName _)

  /** Land an encoded batch as one atomically visible partition-aligned
    * directory under `_appends_data`. If the visible directory already
    * exists the batch is already committed (crash residue of a prior
    * attempt of the same id) and the landing is a no-op.
    *
    * The staging name carries a UNIQUE per-attempt suffix: with a
    * deterministic name, a replay (or a zombie driver's concurrent
    * attempt of the same batch) re-creating the path could interleave
    * with another attempt's commit rename — or with the aged staging
    * sweep — and commit a PARTIALLY written batch. Per-attempt names
    * make each staging dir single-writer by construction; a loser of
    * the visible rename deletes its own residue, crashed attempts age
    * into the sweep.
    *
    * `writeExtras` runs against the STAGING path before the commit
    * rename, so per-batch sidecars (the sparse index's totals row)
    * become visible atomically WITH their batch.
    *
    * `sortCols`, when set, re-sorts WITHIN the partition-aligned tasks
    * AFTER the repartition (a sort before it would be destroyed by the
    * shuffle — r17 review), so layout invariants like the sparse
    * index's h-sorted buckets survive landing and folding.
    */
  def landBatch(
      encoded: DataFrame, dir: String, id: String, partitionCol: String,
      sortCols: Seq[String] = Nil,
      writeExtras: String => Unit = _ => ()): Unit = {
    val fs = fsOf(encoded.sparkSession, dir)
    val visible = new Path(s"$dir/$AppendsDataSubdir/$id")
    if (fs.exists(visible)) return
    val stagingName = s".b-$id-${java.util.UUID.randomUUID.toString}"
    val staging = s"$dir/$AppendsDataSubdir/$stagingName"
    sorted(encoded.repartition(col(partitionCol)), sortCols)
      .write.partitionBy(partitionCol).parquet(staging)
    // EMPTY-BATCH GUARD at the one shared write path (r17 review, both
    // passes): a zero-row batch writes no partition dirs, and landing
    // the data-less directory bricks every later union read
    // (UNABLE_TO_INFER_SCHEMA) — including compaction's fold, so the
    // index could not even self-heal. Checking the STAGED result costs
    // one FS listing and no extra plan evaluation (an upstream
    // isEmpty() would re-run the batch plan); the batch simply never
    // lands, and idempotent callers still write their replay marker.
    val hasData = fs.listStatus(new Path(staging))
      .exists(_.getPath.getName.startsWith(s"$partitionCol="))
    if (!hasData) { fs.delete(new Path(staging), true); return }
    writeExtras(staging)
    Generations.commitRename(fs, new Path(staging), visible,
      s"landBatch: could not commit $staging and $visible is absent")
  }

  private def sorted(df: DataFrame, sortCols: Seq[String]): DataFrame =
    if (sortCols.isEmpty) df else df.sortWithinPartitions(sortCols.map(col): _*)

  /** True iff an append batch with this fully-qualified id has already
    * committed: marker present, OR landed-but-unmarked (the crash
    * window between [[landBatch]]'s visibility rename and the marker
    * create). DATA DIR FIRST, marker second — order is load-bearing
    * against a concurrent compaction folding this very batch:
    * compaction creates the folded batch's marker BEFORE it GCs the
    * data dir, so "data absent" implies "marker already exists" for
    * any batch that ever landed.
    */
  def appendCommitted(
      spark: org.apache.spark.sql.SparkSession, dir: String, id: String): Boolean = {
    val fs = fsOf(spark, dir)
    fs.exists(new Path(s"$dir/$AppendsDataSubdir/$id")) ||
      fs.exists(new Path(s"$dir/$AppendsSubdir/$id"))
  }

  def batchMarked(fs: FileSystem, dir: String, id: String): Boolean =
    fs.exists(new Path(s"$dir/$AppendsSubdir/$id"))

  def markBatch(fs: FileSystem, dir: String, id: String): Unit = {
    fs.mkdirs(new Path(s"$dir/$AppendsSubdir"))
    fs.create(new Path(s"$dir/$AppendsSubdir/$id"), true).close()
  }

  /** Fold every visible append batch into the next base generation.
    * The full protocol, shared verbatim with the IVF lifecycle:
    *
    *  - entry GC (aged staging sweep, orphan generations, flat residue
    *    once a generation is current, already-folded batch data a
    *    crashed post-flip GC left, plus the r13-era `.old` heal);
    *  - fold snapshot: batches committing after the listing stay
    *    visible extras under the new generation — that is the fence
    *    (`afterSnapshot` is the test seam in that window);
    *  - `foldSidecars(liveRoot, foldedBatchDirs, nextRoot)` carries
    *    index-specific sidecar state into the new generation while the
    *    old root stays fully readable (copy models, sum totals — the
    *    hook must WRITE into `nextRoot`, never touch the live root);
    *  - folded ⇒ marker, ALWAYS, and BEFORE markComplete: a batch that
    *    crashed between its visibility rename and its marker write is
    *    legitimately foldable, but once its data dir is GC'd a
    *    marker-less fold would let a stream replay re-append the rows.
    *    Ad-hoc (`adhoc-<uuid>`) batches have no replay semantics and
    *    get no marker;
    *  - post-flip GC of the previous base and the folded batch data.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      partitionCol: String, sidecarNames: Seq[String],
      foldSidecars: (String, Seq[String], String) => Unit,
      afterSnapshot: () => Unit,
      sortCols: Seq[String] = Nil): Unit = {
    val fs = fsOf(spark, dir)
    // migration heal for the r13-era in-place-swap protocol: a crash
    // between ITS two renames left the only copy at `dir + ".old"` with
    // the live dir missing — restore it before anything else
    val legacyOld = new Path(dir + ".old")
    if (!fs.exists(new Path(dir)) && fs.exists(legacyOld)) {
      require(fs.rename(legacyOld, new Path(dir)),
        s"compact: could not restore $dir from a legacy .old crash state")
    } else if (fs.exists(legacyOld)) fs.delete(legacyOld, true)
    Generations.sweepStaging(fs, dir, AppendsDataSubdir)
    val cur = Generations.currentGen(fs, dir)
    Generations.allGens(fs, dir).filterNot(cur.contains)
      .foreach(n => fs.delete(new Path(Generations.genDir(dir, n)), true))
    if (cur.isDefined) deleteFlatResidue(fs, dir, partitionCol, sidecarNames)
    val root = Generations.resolveRoot(fs, dir)
    // batch data already folded into the current base is dead weight a
    // crashed post-flip GC may have left. Walk the (small) VISIBLE set
    // against the manifest, never the manifest against the filesystem.
    val foldedNow = Generations.foldedIds(fs, root)
    Generations.visibleBatches(fs, dir, AppendsDataSubdir).filter(foldedNow)
      .foreach(id => fs.delete(new Path(s"$dir/$AppendsDataSubdir/$id"), true))
    val toFold = Generations.visibleBatches(fs, dir, AppendsDataSubdir)
      .filterNot(foldedNow)
    afterSnapshot()
    val next = cur.getOrElse(0) + 1
    val nextRoot = Generations.genDir(dir, next)
    sorted(
      toFold
        .foldLeft(spark.read.parquet(root)) { (df, b) =>
          df.unionByName(spark.read.parquet(s"$dir/$AppendsDataSubdir/$b"))
        }
        .repartition(col(partitionCol)),
      sortCols)
      .write.partitionBy(partitionCol).mode("overwrite").parquet(nextRoot)
    foldSidecars(root, toFold.map(b => s"$dir/$AppendsDataSubdir/$b"), nextRoot)
    // ad-hoc ids are never replay-checked: once their folded data dir
    // is GC'd they are provably dead and pruned, so ad-hoc ingest does
    // not grow the manifest beyond one fold cycle
    val carried = (foldedNow ++ toFold).filter(id =>
      !id.startsWith("adhoc-") ||
        fs.exists(new Path(s"$dir/$AppendsDataSubdir/$id")))
    Generations.writeFolded(fs, nextRoot, carried)
    fs.mkdirs(new Path(s"$dir/$AppendsSubdir"))
    toFold.filterNot(_.startsWith("adhoc-")).foreach { id =>
      val marker = new Path(s"$dir/$AppendsSubdir/$id")
      if (!fs.exists(marker)) fs.create(marker, true).close()
    }
    Generations.markComplete(fs, nextRoot)
    Generations.flip(fs, dir, next)
    if (cur.isDefined) fs.delete(new Path(root), true)
    else deleteFlatResidue(fs, dir, partitionCol, sidecarNames)
    toFold.foreach(id => fs.delete(new Path(s"$dir/$AppendsDataSubdir/$id"), true))
  }

  /** Delete the flat (generation-0) base layout's data and sidecar
    * files at the top of `dir`, leaving the protocol state (`_current`,
    * `_gen-*`, `_appends`, `_appends_data`) untouched. Called only once
    * a generation directory is current, i.e. the flat layout is no
    * longer resolvable.
    */
  private def deleteFlatResidue(
      fs: FileSystem, dir: String, partitionCol: String,
      sidecarNames: Seq[String]): Unit = {
    val keep = Set(AppendsSubdir, AppendsDataSubdir, Generations.Pointer)
    if (fs.exists(new Path(dir)))
      fs.listStatus(new Path(dir)).toSeq
        .filterNot(st => st.getPath.getName.startsWith("_gen-"))
        .filterNot(st => keep(st.getPath.getName))
        .filter(st =>
          st.getPath.getName.startsWith(s"$partitionCol=") ||
            st.getPath.getName.endsWith(".parquet") ||
            st.getPath.getName == "_SUCCESS" ||
            sidecarNames.contains(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
  }
}
