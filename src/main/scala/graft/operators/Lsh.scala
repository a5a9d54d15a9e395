package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.gfunctions.cosine_sim

/** Random-hyperplane LSH shared by embedding dedup and ANN.
  *
  * Hyperplanes are ±1 sign vectors fixed at plan time from a splitmix-style
  * mix of (plane, dim) — deterministic across runs, engines, and cluster
  * sizes, with no driver-side RNG state to ship. Sign bits are computed
  * per-row with codegen'd zip_with/aggregate folds: zero shuffle.
  */
object Lsh {

  def planeSigns(plane: Int, dims: Int): Seq[Float] =
    (0 until dims).map { j =>
      var z = (plane.toLong << 32 | j.toLong) + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      if ((z & 1L) == 0L) 1.0f else -1.0f
    }

  /** One sign bit (0/1) per hyperplane for a float-vector column.
    * sign(dot(v, w)) == (cosine_sim(v, w) > 0) for the ±1 planes, so each
    * bit rides the native codegen'd cosine kernel instead of an
    * interpreted zip_with/aggregate fold (higher-order functions are
    * CodegenFallback — measured ~4x slower here).
    */
  def hyperplaneBits(vec: Column, planes: Int, dims: Int): Seq[Column] =
    (0 until planes).map { p =>
      val w = typedlit(planeSigns(p, dims).toArray)
      when(cosine_sim(vec, w) > 0, lit(1L)).otherwise(lit(0L))
    }

  /** Band values: `bands` integers of planes/bands bits each. Rows sharing
    * any (band_idx, band_val) are LSH candidates.
    */
  def bandValues(vec: Column, planes: Int, bands: Int, dims: Int): Seq[Column] = {
    val bitsPerBand = planes / bands
    val bits = hyperplaneBits(vec, planes, dims)
    (0 until bands).map { b =>
      (0 until bitsPerBand)
        .map(i => bits(b * bitsPerBand + i) * lit(1L << i))
        .reduce(_ + _)
    }
  }

  /** Drop band rows that fall in buckets larger than `cap` — the shared
    * guard against degenerate mega-buckets before any band self-join.
    *
    * Why: pairs per bucket grow as C(n,2), so ONE boilerplate bucket of n
    * docs (the normal case in scraped corpora: templated pages, shared
    * headers) yields n(n-1)/2 pairs under a single join key — a straggler
    * task AQE cannot split (it is one key). A bucket past `cap` carries no
    * near-dup signal the band hash can discriminate anyway: its members are
    * either exact duplicates (caught by the 1-shuffle exact pass, which
    * should always run first) or hash-degenerate. The oversized-bucket set
    * is tiny by construction (≤ corpus/cap buckets), so it broadcasts and
    * the guard costs one map-side hash aggregate + a broadcast left-anti.
    */
  def capBuckets(banded: DataFrame, keyCols: Seq[String], cap: Int): DataFrame = {
    val oversized = banded
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > cap)
    banded.join(broadcast(oversized), keyCols, "left_anti")
  }

  /** Explode a frame to one row per (row, band): adds band_idx/band_val. */
  def banded(df: DataFrame, vecCol: String, planes: Int, bands: Int, dims: Int): DataFrame = {
    val vals = bandValues(col(vecCol), planes, bands, dims)
    df.select(
      col("*"),
      explode(array(vals.zipWithIndex.map { case (v, b) =>
        struct(lit(b).as("band_idx"), v.as("band_val"))
      }: _*)).as("_band"))
      .withColumn("band_idx", col("_band.band_idx"))
      .withColumn("band_val", col("_band.band_val"))
      .drop("_band")
  }
}
