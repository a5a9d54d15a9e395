package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH shared by embedding dedup and ANN.
  *
  * Hyperplanes are ±1 sign vectors fixed at plan time from a splitmix-style
  * mix of (plane, dim) — deterministic across runs, engines, and cluster
  * sizes, with no driver-side RNG state to ship. Band values are computed
  * per-row by the native [[graft.functions.HyperplaneBands]] kernel:
  * zero shuffle.
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
  def capBuckets(banded: DataFrame, keyCols: Seq[String], cap: Int): DataFrame =
    banded.join(broadcast(oversizedBuckets(banded, keyCols, cap)), keyCols, "left_anti")

  /** The oversized-bucket set itself — the ONE source of the cap law
    * (strict `>`, map-side-combined count, `bucket_n` column). Tiny by
    * construction (≤ corpus/cap rows), so callers broadcast it; exposed
    * separately because the SemDeDup family also STAMPS the set as a
    * `cell_capped` flag rather than only anti-joining it away, and two
    * inline copies of the law would silently diverge (r16 review).
    */
  def oversizedBuckets(banded: DataFrame, keyCols: Seq[String], cap: Int): DataFrame =
    banded
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > cap)

  /** Explode a frame to one row per (row, band): adds band_idx/band_val.
    * Band values come from the native [[graft.functions.HyperplaneBands]]
    * kernel — every plane's dot accumulated in ONE walk of the vector
    * (bit-identical to the per-plane cosine_sim sign it replaced, which
    * re-walked the vector and recomputed both norms per plane);
    * posexplode's position IS the band index.
    */
  def banded(df: DataFrame, vecCol: String, planes: Int, bands: Int, dims: Int): DataFrame =
    df.select(
      col("*"),
      posexplode(graft.gfunctions.hyperplane_bands(col(vecCol), planes, bands, dims))
        .as(Seq("band_idx", "band_val")))
}
