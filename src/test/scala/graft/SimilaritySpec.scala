package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  import operators.Similarity

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")), r.getLong(r.fieldIndex("neighbor_id"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("brute force finds a planted near-identical vector as top-1") {
    import spark.implicits._
    val rnd = new Random(13)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = vec()
    val near = base.map(x => x + 0.001f)
    val emb = (Seq((0L, base, 0), (100L, near, 0)) ++
      (1L until 50L).map(i => (i, vec(), 1))).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 0L), k = 1).collect()
    assert(top.length == 1)
    assert(top.head.getLong(top.head.fieldIndex("neighbor_id")) == 100L)
    assert(top.head.getDouble(top.head.fieldIndex("sim")) > 0.999)
  }

  test("LSH top-k recall vs brute force on real embeddings") {
    val sf = "/root/testdata/sf0.001"
    val brute = topSets(operators.Similarity.qBrute.run(spark, sf))
    val lsh = topSets(operators.Similarity.qLsh.run(spark, sf))
    val recalls = brute.map { case (q, truth) =>
      val got = lsh.getOrElse(q, Set.empty)
      got.intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@10 = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.3, f"LSH recall collapsed: $mean%.3f")
    assert(recalls.size == 8, "all 8 registry queries answered")
  }

  test("IVF: planted near-identical vector lands in the same cluster and is found") {
    import spark.implicits._
    val rnd = new Random(17)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = vec()
    val near = base.map(x => x + 0.001f)
    val emb = (Seq((0L, base, 0), (100L, near, 0)) ++
      (1L until 80L).map(i => (i, vec(), 1))).toDF("vec_id", "embedding", "label")
    val centroids = operators.Ivf.train(emb, k = 4, iters = 2)
    assert(centroids.length == 4 && centroids.forall(_.length == 64))
    val top = operators.Ivf.topK(emb, emb.filter($"vec_id" === 0L), centroids, k = 1)
      .collect()
    assert(top.head.getLong(top.head.fieldIndex("neighbor_id")) == 100L,
      "near-identical vector shares the query's cluster, so nprobe=2 must find it")
  }

  test("IVF top-k recall vs brute force on real embeddings") {
    val sf = "/root/testdata/sf0.001"
    val brute = topSets(operators.Similarity.qBrute.run(spark, sf))
    val ivf = topSets(operators.Similarity.qIvf.run(spark, sf))
    val recalls = brute.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF mean recall@10 = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.2, f"IVF recall collapsed: $mean%.3f")
  }

  test("LSH candidates are a subset ranked identically to brute force") {
    val sf = "/root/testdata/sf0.001"
    val brute = operators.Similarity.qBrute.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = operators.Similarity.qLsh.run(spark, sf).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      brute.get(key).foreach { s =>
        assert(math.abs(s - r.getDouble(3)) < 1e-12, s"sim mismatch for $key")
      }
    }
  }
}
