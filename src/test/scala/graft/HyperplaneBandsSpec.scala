package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HyperplaneBandsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  test("hyperplane_bands is bit-identical to the per-plane cosine-sign formulation") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    // the composed formulation this kernel replaced, inlined verbatim:
    // one cosine_sim sign per plane, bits packed per band
    val planes = 32; val bands = 4; val dims = 64
    val bits = (0 until planes).map { p =>
      val w = typedlit(operators.Lsh.planeSigns(p, dims).toArray)
      when(gfunctions.cosine_sim(col("embedding"), w) > 0, lit(1L)).otherwise(lit(0L))
    }
    val bpb = planes / bands
    val vals = (0 until bands).map { b =>
      (0 until bpb).map(i => bits(b * bpb + i) * lit(1L << i)).reduce(_ + _)
    }
    val old = emb.select(
      col("vec_id"),
      explode(array(vals.zipWithIndex.map { case (v, b) =>
        struct(lit(b).as("band_idx"), v.as("band_val"))
      }: _*)).as("x"))
      .select(col("vec_id"), col("x.band_idx"), col("x.band_val"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val neu = operators.Lsh.banded(emb, "embedding", planes, bands, dims)
      .select("vec_id", "band_idx", "band_val")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(neu.size == old.size && neu.nonEmpty)
    assert(neu == old, "band values must match the composed formulation bit-for-bit")
  }

  test("hyperplane_bands fails loudly on a dims mismatch instead of banding a prefix") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      operators.Lsh.banded(df, "embedding", 32, 4, 64).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("dims=64"))),
      s"expected a dims-mismatch error, got $e")
  }

  test("hyperplane_bands runs inside WholeStageCodegen; zero vector lands in band 0s") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val df = emb.select(gfunctions.hyperplane_bands(col("embedding"), 32, 4, 64).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hyperplane_bands"),
      s"expected codegen'd projection in:\n$plan")
    val z = Seq(Array.fill(64)(0.0f)).toDF("v")
      .select(gfunctions.hyperplane_bands(col("v"), 32, 4, 64).as("b"))
      .collect().head.getSeq[Long](0)
    assert(z == Seq(0L, 0L, 0L, 0L), "zero vector -> all-zero band values (dot never > 0)")
  }
}
