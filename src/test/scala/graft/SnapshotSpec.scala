package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-snapshot semantics for the dataset-versioning diff. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  import operators.Snapshot

  test("snapshot diff classifies added / removed / changed / unchanged") {
    import spark.implicits._
    // docs 5/6 pin the null-safe compare: a NULL hash on exactly one
    // side is 'changed' (never 'unchanged' via three-valued logic);
    // NULL on both sides is 'unchanged'
    val cur = Seq((1L, Option("h1")), (2L, Option("h2")), (3L, Option("h3")),
      (5L, Option.empty[String]), (6L, Option.empty[String])).toDF("doc_id", "h")
    val nxt = Seq((1L, Option("h1")), (2L, Option("h2x")), (4L, Option("h4")),
      (5L, Option("h5")), (6L, Option.empty[String])).toDF("doc_id", "h")
    val got = Snapshot.snapshotDiffOn(cur, nxt).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added",
      5L -> "changed", 6L -> "unchanged"))
  }

  test("q100 on the real corpus: every doc classified, population law holds") {
    val got = Snapshot.q100.run(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // current ids 0..N-1 plus the added shifted slice; removed iff %31==0,
    // changed iff %17==0 (and not removed), added iff id >= N
    val n = Tables.documents(spark, "/root/testdata/sf0.001").count()
    got.foreach { case (id, change) =>
      val expect =
        if (id >= n) "added"
        else if (id % 31 == 0) "removed"
        else if (id % 17 == 0) "changed"
        else "unchanged"
      assert(change === expect, s"doc $id")
    }
    assert(got.count(_._2 == "added") === (0L until n).count(_ % 41 == 0))
  }

  test("delta ∪ unchanged-survivors ≡ nextSnapshotDocsOn (the q110 reuse law)") {
    // The r21 trend audit recomputes only nextSnapshotDeltaDocsOn and
    // reuses current-snapshot results for survivesUnchanged rows; that
    // is sound iff the two slices partition the refreshed corpus
    // exactly — pinned here row-for-row (doc_id AND text).
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val full = Snapshot.nextSnapshotDocsOn(docs)
    val recomposed = Snapshot.nextSnapshotDeltaDocsOn(docs)
      .unionAll(docs.filter(Snapshot.survivesUnchanged()))
    assert(full.count() === recomposed.count())
    assert(full.exceptAll(recomposed).count() === 0L)
    assert(recomposed.exceptAll(full).count() === 0L)
    // and the slices are disjoint on doc_id (no double counting)
    val deltaIds = Snapshot.nextSnapshotDeltaDocsOn(docs).select("doc_id")
    assert(deltaIds.intersect(
      docs.filter(Snapshot.survivesUnchanged()).select("doc_id")).count() === 0L)
  }
}
