package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 regressions for the round-14 advice findings — each test
  * pins the exact hazard the advice named.
  *
  *  1. Hadoop `FileSystem.rename` into an EXISTING destination
  *     directory does not fail: it nests the source inside and returns
  *     true, so a same-id commit race (or replay) would leak hidden
  *     dot-staging residue inside the committed batch forever
  *     ([[graft.sources.Generations.commitRename]] now guards both the
  *     pre-existing and the race-window outcome).
  *  2. The staging sweep's liveness signal is the newest mtime in the
  *     staging TREE, not the dir's own mtime — a long write keeps
  *     landing task files deep under `_temporary` without touching the
  *     top level, so the dir-mtime gate could collect a LIVE append.
  *  3. `retryTransient` retries ONLY the documented flip-race class
  *     (missing path); schema mismatches and fatal throwables surface
  *     immediately instead of burning five backoff sleeps.
  *  4. `batchNamespace` is a 128-bit id of the QUALIFIED checkpoint
  *     path — same checkpoint spelled differently must be the same
  *     namespace, different checkpoints must collide negligibly.
  *  5. `HtmlTree.matches` accepts BS4's whole-attribute-string class
  *     form — the reference's ALL_PRODUCTS selector class contains a
  *     space (scrap_tokopedia.py:231) and only that form can match it.
  */
class CommitHygieneSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSession.spark

  import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}

  private def hfs(dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkdirsWithFile(fs: FileSystem, dir: Path, file: String): Unit = {
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, file), true)
    out.writeBytes("x")
    out.close()
  }

  test("Hadoop rename into an existing destination dir nests and returns true (the documented hazard)") {
    val root = new Path("/tmp/graft-test/hygiene_rename_raw")
    val fs = hfs(root.toString)
    fs.delete(root, true)
    val visible = new Path(root, "b-1")
    val staging = new Path(root, ".b-1-loser")
    mkdirsWithFile(fs, visible, "part-winner.parquet")
    mkdirsWithFile(fs, staging, "part-loser.parquet")
    val renamed = fs.rename(staging, visible)
    assert(renamed, "local Hadoop rename reports success when the destination dir exists")
    assert(fs.exists(new Path(visible, ".b-1-loser")),
      "…because it moved the source INSIDE the destination — the residue commitRename must clean")
  }

  test("commitRename: a loser against an already-committed batch deletes its staging, never nests") {
    val root = new Path("/tmp/graft-test/hygiene_rename_precommitted")
    val fs = hfs(root.toString)
    fs.delete(root, true)
    val visible = new Path(root, "b-1")
    val staging = new Path(root, ".b-1-loser")
    mkdirsWithFile(fs, visible, "part-winner.parquet")
    mkdirsWithFile(fs, staging, "part-loser.parquet")
    sources.Generations.commitRename(fs, staging, visible, "unexpected")
    assert(!fs.exists(staging), "loser staging must be deleted")
    assert(fs.exists(new Path(visible, "part-winner.parquet")), "winner content intact")
    assert(fs.listStatus(visible).forall(!_.getPath.getName.startsWith(".b-")),
      "no nested staging residue inside the committed batch")
  }

  test("commitRename: a winner appearing INSIDE the race window leaves no nested residue") {
    val root = new Path("/tmp/graft-test/hygiene_rename_window")
    val fs = hfs(root.toString)
    fs.delete(root, true)
    val visible = new Path(root, "b-1")
    val staging = new Path(root, ".b-1-loser")
    mkdirsWithFile(fs, visible, "part-winner.parquet")
    mkdirsWithFile(fs, staging, "part-loser.parquet")
    // a FilterFileSystem that reports the visible dir ABSENT exactly
    // once — the pre-check sees the pre-race world, the rename and the
    // nested-residue re-check see the real one
    val raceFs = new FilterFileSystem(fs) {
      private var armed = true
      override def exists(p: Path): Boolean =
        if (armed && p == visible) { armed = false; false }
        else super.exists(p)
    }
    sources.Generations.commitRename(raceFs, staging, visible, "unexpected")
    assert(!fs.exists(staging), "loser staging must be gone")
    assert(fs.exists(new Path(visible, "part-winner.parquet")), "winner content intact")
    assert(fs.listStatus(visible).forall(!_.getPath.getName.startsWith(".b-")),
      "the race-window rename's nested residue must be cleaned up")
  }

  test("sweepStaging: a stale top-level mtime with FRESH deep activity is a live append — kept") {
    val dir = "/tmp/graft-test/hygiene_sweep"
    val area = "_batches"
    val fs = hfs(dir)
    fs.delete(new Path(dir), true)
    val old = System.currentTimeMillis() - 2 * sources.Generations.StagingSweepAgeMs

    // live long-running append: top dir old, a task file deep in the
    // tree is fresh (the write is still landing files)
    val live = new Path(s"$dir/$area/.live-append")
    val deep = new Path(live, "_temporary/0/task_0")
    mkdirsWithFile(fs, deep, "part-00000")
    fs.setTimes(live, old, -1)
    fs.setTimes(new Path(live, "_temporary"), old, -1)
    fs.setTimes(new Path(live, "_temporary/0"), old, -1)

    // dead crash residue: every mtime in the tree is past the window
    val dead = new Path(s"$dir/$area/.dead-append")
    val deadDeep = new Path(dead, "_temporary/0/task_0")
    mkdirsWithFile(fs, deadDeep, "part-00000")
    Seq(dead, new Path(dead, "_temporary"), new Path(dead, "_temporary/0"),
        deadDeep, new Path(deadDeep, "part-00000"))
      .foreach(p => fs.setTimes(p, old, -1))

    sources.Generations.sweepStaging(fs, dir, area)
    assert(fs.exists(live), "a staging tree with fresh deep files must survive the sweep")
    assert(!fs.exists(dead), "a fully quiet staging tree past the window must be collected")
  }

  test("retryTransient: non-transient failures surface on the FIRST attempt") {
    var attempts = 0
    val e = intercept[IllegalStateException] {
      streaming.Streams.retryTransient(5) {
        attempts += 1
        throw new IllegalStateException("schema mismatch — not the flip race")
      }
    }
    assert(attempts == 1, s"non-transient must not retry, got $attempts attempts")
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("retryTransient: fatal throwables (interrupt) propagate immediately, uncounted") {
    var attempts = 0
    intercept[InterruptedException] {
      streaming.Streams.retryTransient(5) {
        attempts += 1
        throw new InterruptedException("stop")
      }
    }
    assert(attempts == 1)
  }

  test("retryTransient: the flip race (missing path, however wrapped) is retried to the bound") {
    var attempts = 0
    intercept[java.io.FileNotFoundException] {
      streaming.Streams.retryTransient(3) {
        attempts += 1
        throw new java.io.FileNotFoundException("gen-3 was just GC'd")
      }
    }
    assert(attempts == 3, "missing-path failures retry up to the bound")

    var wrapped = 0
    intercept[RuntimeException] {
      streaming.Streams.retryTransient(3) {
        wrapped += 1
        throw new RuntimeException("task failed",
          new java.io.FileNotFoundException("part-0 of gen-3"))
      }
    }
    assert(wrapped == 3, "the cause chain is walked — executor wrapping does not defeat the class check")

    var recovered = 0
    streaming.Streams.retryTransient(3) {
      recovered += 1
      if (recovered < 3) throw new java.io.FileNotFoundException("transient")
    }
    assert(recovered == 3, "a retry that then succeeds completes the batch")
  }

  test("sweepStaging: a path vanishing mid-walk reads as activity, never aborts the sweep") {
    val dir = "/tmp/graft-test/hygiene_sweep_fnf"
    val area = "_batches"
    val fs = hfs(dir)
    fs.delete(new Path(dir), true)
    val old = System.currentTimeMillis() - 2 * sources.Generations.StagingSweepAgeMs
    val live = new Path(s"$dir/$area/.racing-append")
    val deep = new Path(live, "_temporary/0")
    mkdirsWithFile(fs, deep, "part-00000")
    Seq(live, new Path(live, "_temporary"), deep, new Path(deep, "part-00000"))
      .foreach(p => fs.setTimes(p, old, -1))
    // a FileOutputCommitter racing the walk: listing the _temporary
    // subtree throws FileNotFoundException (task-attempt dir renamed
    // away between the parent listing and the recursion)
    val racingFs = new FilterFileSystem(fs) {
      override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
        // compare the raw path: the walk hands back FULLY-QUALIFIED
        // (file:/...) paths from the parent listing
        if (p.toUri.getPath == deep.toUri.getPath)
          throw new java.io.FileNotFoundException(p.toString)
        else super.listStatus(p)
    }
    sources.Generations.sweepStaging(racingFs, dir, area) // must not throw
    assert(fs.exists(live),
      "a tree that mutates under the walk is LIVE — the sweep must keep it")
  }

  test("retryTransient: storage-fault IOExceptions (throttle/reset class) are retried") {
    var attempts = 0
    streaming.Streams.retryTransient(3) {
      attempts += 1
      if (attempts < 3)
        throw new RuntimeException("stage failed",
          new java.io.IOException("Connection reset by peer"))
    }
    assert(attempts == 3, "IO-class transients retry and the batch completes")
  }

  test("retryTransient: permanent-fault IOException subclasses surface on the FIRST attempt") {
    // r16 ADVICE closure: "IOException" is not uniformly transient.
    // Permission denial, a truncated file, and a name collision are
    // PERMANENT — classifying them transient burns the whole backoff
    // budget (~3 s of sleeps) before the real error reaches the stream.
    val permanents: Seq[Throwable] = Seq(
      new org.apache.hadoop.security.AccessControlException("Permission denied: user=x"),
      new java.io.EOFException("Cannot seek past EOF"),
      new org.apache.hadoop.fs.FileAlreadyExistsException("/idx/batches/b7"),
      new java.nio.file.FileAlreadyExistsException("/idx/batches/b7"))
    for (p <- permanents) {
      var attempts = 0
      val seen = intercept[Exception] {
        streaming.Streams.retryTransient(5) {
          attempts += 1
          // wrapped in a task-failure layer, as Spark delivers them
          throw new RuntimeException("stage failed", p)
        }
      }
      assert(attempts == 1, s"${p.getClass.getSimpleName} must not retry")
      assert(seen.getCause eq p)
    }
    // …while the documented flip race (FileNotFoundException, also an
    // IOException subclass) stays IN the retryable class
    var fnf = 0
    streaming.Streams.retryTransient(3) {
      fnf += 1
      if (fnf < 3) throw new java.io.FileNotFoundException("gen-000017/part-0.parquet")
    }
    assert(fnf == 3, "the compaction-flip race is what this retry exists for")
  }

  test("retryTransient: EOF accompanied by a flip-race signature stays retryable (r16 ADVICE)") {
    // HDFS-style streams can raise EOFException on a file replaced
    // mid-read during the compaction flip itself. That presentation
    // carries the flip fingerprint — a FileNotFoundException in the
    // cause chain or as a suppressed sibling — and must RETRY; only a
    // lone EOF (truncated/corrupt file, bytes never grow back) is
    // permanent.
    // (a) FNF deeper in the cause chain under the EOF
    var chained = 0
    streaming.Streams.retryTransient(3) {
      chained += 1
      if (chained < 3) {
        val eof = new java.io.EOFException("unexpected EOF")
        eof.initCause(new java.io.FileNotFoundException("gen-000017/part-0.parquet"))
        throw new RuntimeException("stage failed", eof)
      }
    }
    assert(chained == 3, "EOF + chained FNF is the flip race — must retry")
    // (b) FNF as a suppressed sibling (multi-task failure aggregation)
    var suppressed = 0
    streaming.Streams.retryTransient(3) {
      suppressed += 1
      if (suppressed < 3) {
        val eof = new java.io.EOFException("unexpected EOF mid-read")
        eof.addSuppressed(new java.io.FileNotFoundException("gen-000017/part-1.parquet"))
        throw new RuntimeException("stage failed", eof)
      }
    }
    assert(suppressed == 3, "EOF + suppressed FNF is the flip race — must retry")
    // (c) and the lone EOF stays permanent (the pre-existing contract)
    var lone = 0
    intercept[Exception] {
      streaming.Streams.retryTransient(5) {
        lone += 1
        throw new RuntimeException("stage failed",
          new java.io.EOFException("Cannot seek past EOF"))
      }
    }
    assert(lone == 1, "a lone EOF is a truncated file — must not retry")
  }

  test("retryTransient: interrupt-shaped IO failures propagate without backoff, even wrapped") {
    // a bare InterruptedIOException is shutdown, not storage weather
    var bare = 0
    intercept[java.io.InterruptedIOException] {
      streaming.Streams.retryTransient(5) {
        bare += 1
        throw new java.io.InterruptedIOException("write interrupted")
      }
    }
    assert(bare == 1, "interrupt must not burn backoff sleeps")
    // …and the interrupt cause must win even when WRAPPED in a plain
    // IOException (common Hadoop layering) — order in the classifier is
    // load-bearing
    var wrapped = 0
    intercept[java.io.IOException] {
      streaming.Streams.retryTransient(5) {
        wrapped += 1
        throw new java.io.IOException("channel closed",
          new java.nio.channels.ClosedByInterruptException())
      }
    }
    assert(wrapped == 1, "a wrapped interrupt is still an interrupt")
    // the JDK exception: SocketTimeoutException EXTENDS
    // InterruptedIOException but is the classic transient storage
    // timeout — it must stay retryable
    var timeout = 0
    streaming.Streams.retryTransient(3) {
      timeout += 1
      if (timeout < 3) throw new java.net.SocketTimeoutException("read timed out")
    }
    assert(timeout == 3, "socket timeouts are storage weather, not shutdown")
  }

  test("batchNamespace: a pure 128-bit function of the Path-normalized checkpoint string") {
    import streaming.Streams.batchNamespace
    val abs = "/tmp/graft-test/ckpt/ns1"
    val base = batchNamespace(Some(abs))
    assert(base.matches("[0-9a-f]{32}-"), s"128-bit hex id expected, got $base")
    // Path normalization folds the slip-of-the-keyboard respellings…
    assert(batchNamespace(Some(abs + "/")) == base, "trailing slash is the same checkpoint")
    assert(batchNamespace(Some("/tmp/graft-test/ckpt//ns1")) == base,
      "doubled separator is the same checkpoint")
    // …and NOTHING environmental leaks in: no Hadoop conf, no
    // FileSystem, no session thread-local can fork the id across
    // restarts. The documented flip side: scheme-ful and scheme-less
    // spellings are DIFFERENT identities — spell the checkpoint
    // consistently (the exotic-scheme case hashes stably too, with no
    // FileSystem resolution involved).
    assert(batchNamespace(Some("file:" + abs)) != base,
      "an explicit scheme is a different spelling by contract")
    val exotic = batchNamespace(Some("nosuchscheme://bucket/ckpt"))
    assert(exotic.matches("[0-9a-f]{32}-") &&
      exotic == batchNamespace(Some("nosuchscheme://bucket/ckpt")))
    assert(batchNamespace(Some("/tmp/graft-test/ckpt/ns2")) != base, "different checkpoints differ")
    assert(batchNamespace(None) == "",
      "no checkpoint → empty here (pure fn); lanes substitute a random ephemeral id via laneNamespace")
  }

  test("HtmlTree.matches: BS4 whole-string class match — a selector class containing a space can match") {
    import operators.HtmlTree
    val page =
      """<div><a class="Ui5-B4 XeGJ+aa" href="/p/1">first</a>
        |<a class="other" href="/p/2">second</a></div>""".stripMargin
    val root = HtmlTree.parse(page)
    // whole-string form: the two-token class value matches as one string
    val whole = HtmlTree.findAll(root, "a", Map("class" -> "Ui5-B4 XeGJ+aa"))
    assert(whole.map(_.attrs("href")) == Seq("/p/1"),
      "the space-containing selector value must match via full-string equality")
    // token form still works on the same element
    assert(HtmlTree.findAll(root, "a", Map("class" -> "XeGJ+aa")).nonEmpty)
    // and a value that is neither a token nor the whole string does not match
    assert(HtmlTree.findAll(root, "a", Map("class" -> "Ui5-B4 other")).isEmpty)
  }
}
