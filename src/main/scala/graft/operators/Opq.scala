package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gfunctions.{cosine_sim, mat_vec, pq_codes}

/** Optimized product quantization (OPQ) — a learned ORTHOGONAL rotation
  * in front of PQ (the non-parametric alternation of Ge et al., CVPR
  * 2013; the same preprocessing Faiss ships as OPQ). PQ's weakness is
  * structural: it quantizes FIXED axis-aligned subspaces, so correlated
  * dimensions waste codebook entries and unbalanced subspace variances
  * waste whole subspaces. An orthogonal R preserves cosine exactly
  * (cos(Rq, Rx) = cos(q, x)), so searching in the rotated space changes
  * NOTHING about the metric — only how well the quantizer's cells fit
  * the data. Training alternates the two classic steps on the bounded
  * driver-side sample:
  *
  *  1. fix R: train/encode PQ on the rotated sample (reuses
  *     [[Pq.trainOnVectors]] verbatim);
  *  2. fix the reconstructions Y: the best orthogonal map of raw rows X
  *     onto Y is the orthogonal Procrustes solution — SVD(X^T Y) =
  *     U S V^T, R = V U^T — computed by a one-sided Jacobi SVD written
  *     here (d x d, deterministic, no library).
  *
  * Training returns the ARGMIN (R, codebook) over all iterates with
  * plain PQ at R = I as candidate 0, so the final rotated-space error
  * NEVER exceeds plain PQ's raw-space error — by construction, not by
  * an assumed per-iteration monotonicity (see [[train]]; the spec
  * asserts the guarantee, plus R's orthogonality, on real data).
  *
  * Scale shape: training is model fitting on the hash sample (driver-
  * local, bounded by the model not the corpus — the [[Pq.train]]
  * discipline); the corpus pass is rotate+encode, one distributed
  * codegen'd projection ([[graft.functions.MatVecF]]: d*d multiply-adds,
  * ~4x cheaper than the encode argmin it feeds). Serving is ADC in the
  * rotated space — same m-byte codes, same LUT scoring, same rerank
  * composition; the rerank scores ORIGINAL float vectors (rotation
  * invariance means the exact phase needs no rotation at all).
  */
object Opq {

  /** OPQ model: row-major dims x dims orthogonal rotation + the PQ
    * model trained in the rotated space.
    */
  final case class Model(rotation: Array[Float], pq: Pq.Model) {
    def dims: Int = pq.dims
  }

  // ------------------- driver-side d x d linear algebra (deterministic)

  private def identity(d: Int): Array[Double] = {
    val a = new Array[Double](d * d)
    var i = 0
    while (i < d) { a(i * d + i) = 1.0; i += 1 }
    a
  }

  private[graft] def applyR(r: Array[Double], v: Array[Float], d: Int): Array[Float] = {
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += r(i * d + j) * v(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /** M = X^T Y over sample rows (both n x d), row-major d x d. */
  private def xtY(xs: Array[Array[Float]], ys: Array[Array[Float]], d: Int): Array[Double] = {
    val m = new Array[Double](d * d)
    var n = 0
    while (n < xs.length) {
      val x = xs(n); val y = ys(n)
      var i = 0
      while (i < d) {
        val xi = x(i).toDouble
        if (xi != 0.0) {
          var j = 0
          while (j < d) { m(i * d + j) += xi * y(j); j += 1 }
        }
        i += 1
      }
      n += 1
    }
    m
  }

  /** One-sided Jacobi SVD of a d x d matrix (row-major): returns (U, V)
    * with A = U diag(s) V^T. Columns of A are orthogonalized in place by
    * plane rotations (accumulated into V); singular values are the
    * resulting column norms and U their normalizations. Deterministic
    * fixed sweep order; converges quadratically — 30 sweeps is far past
    * machine precision at d=64. Near-zero singular values (rank
    * deficiency — cannot happen for X^T Y of real full-rank data, but
    * guarded) keep an identity-basis U column.
    */
  private[graft] def svdUV(a0: Array[Double], d: Int): (Array[Double], Array[Double]) = {
    // column-major copies: a(j) = column j
    val a = Array.tabulate(d, d)((j, i) => a0(i * d + j))
    val v = Array.tabulate(d, d)((j, i) => if (i == j) 1.0 else 0.0)
    val eps = 1e-15
    var sweep = 0
    var rotated = true
    while (sweep < 30 && rotated) {
      rotated = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          var alpha = 0.0; var beta = 0.0; var gamma = 0.0
          var i = 0
          while (i < d) {
            alpha += a(p)(i) * a(p)(i)
            beta += a(q)(i) * a(q)(i)
            gamma += a(p)(i) * a(q)(i)
            i += 1
          }
          if (math.abs(gamma) > eps * math.sqrt(alpha * beta) && gamma != 0.0) {
            rotated = true
            val zeta = (beta - alpha) / (2.0 * gamma)
            val sgn = if (zeta >= 0.0) 1.0 else -1.0 // signum(0) would skip a needed 45-degree rotation
            val t = sgn / (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            i = 0
            while (i < d) {
              val ap = a(p)(i); val aq = a(q)(i)
              a(p)(i) = c * ap - s * aq
              a(q)(i) = s * ap + c * aq
              val vp = v(p)(i); val vq = v(q)(i)
              v(p)(i) = c * vp - s * vq
              v(q)(i) = s * vp + c * vq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // U columns = normalized columns of A. Near-zero singular values
    // (rank-deficient input) leave junk directions — complete them by
    // deterministic Gram-Schmidt over the identity basis so U stays
    // orthogonal (Procrustes then returns SOME optimal rotation, which
    // is all the underdetermined case admits).
    val cols = Array.ofDim[Double](d, d)
    val norms = new Array[Double](d)
    var j = 0
    while (j < d) {
      var norm = 0.0
      var i = 0
      while (i < d) { norm += a(j)(i) * a(j)(i); i += 1 }
      norms(j) = math.sqrt(norm)
      j += 1
    }
    val maxNorm = math.max(norms.max, 1e-300)
    val live = new Array[Boolean](d)
    j = 0
    while (j < d) {
      live(j) = norms(j) > 1e-12 * maxNorm
      if (live(j)) {
        var i = 0
        while (i < d) { cols(j)(i) = a(j)(i) / norms(j); i += 1 }
      }
      j += 1
    }
    var basis = 0
    j = 0
    while (j < d) {
      if (!live(j)) {
        var done = false
        while (!done && basis < d) {
          val cand = new Array[Double](d)
          cand(basis) = 1.0
          var k = 0
          while (k < d) {
            if (k != j && (live(k) || k < j)) {
              var dot = 0.0
              var i = 0
              while (i < d) { dot += cand(i) * cols(k)(i); i += 1 }
              i = 0
              while (i < d) { cand(i) -= dot * cols(k)(i); i += 1 }
            }
            k += 1
          }
          var n2 = 0.0
          var i = 0
          while (i < d) { n2 += cand(i) * cand(i); i += 1 }
          basis += 1
          if (n2 > 0.25) {
            val n = math.sqrt(n2)
            i = 0
            while (i < d) { cols(j)(i) = cand(i) / n; i += 1 }
            done = true
          }
        }
        live(j) = true
      }
      j += 1
    }
    val u = new Array[Double](d * d)
    val vOut = new Array[Double](d * d)
    j = 0
    while (j < d) {
      var i = 0
      while (i < d) {
        u(i * d + j) = cols(j)(i)
        vOut(i * d + j) = v(j)(i)
        i += 1
      }
      j += 1
    }
    (u, vOut)
  }

  /** R = V U^T (the Procrustes optimum's transpose — the map applied as
    * R x to each vector).
    */
  private[graft] def procrustes(m: Array[Double], d: Int): Array[Double] = {
    val (u, v) = svdUV(m, d)
    val r = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var s = 0.0
        var k = 0
        while (k < d) { s += v(i * d + k) * u(j * d + k); k += 1 }
        r(i * d + j) = s
        j += 1
      }
      i += 1
    }
    r
  }

  /** Driver-side encode = THE ENGINE'S kernel ([[graft.functions
    * .PqKernels.encode]] via ArrayData, no re-implementation): the
    * rotation is trained against reconstructions of exactly the codes
    * the engine will assign at index-build time, so a tie-break or
    * accumulation-order change in the kernel can never silently
    * diverge training from serving.
    */
  private def encodeLocal(pq: Pq.Model, v: Array[Float]): Array[Byte] =
    graft.functions.PqKernels.encode(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v),
      pq.codebook, pq.m, pq.ksub, pq.dsub)

  private def reconstructLocal(pq: Pq.Model, codes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](pq.dims)
    var j = 0
    while (j < pq.m) {
      val base = (j * pq.ksub + (codes(j) & 0xFF)) * pq.dsub
      var i = 0
      while (i < pq.dsub) { out(j * pq.dsub + i) = pq.codebook(base + i); i += 1 }
      j += 1
    }
    out
  }

  private[graft] def quantError(pq: Pq.Model, rotated: Array[Array[Float]]): Double =
    rotated.map { v =>
      val recon = reconstructLocal(pq, encodeLocal(pq, v))
      var e = 0.0
      var i = 0
      while (i < v.length) {
        val d = v(i).toDouble - recon(i).toDouble
        e += d * d
        i += 1
      }
      e
    }.sum

  /** Alternate codebook fitting and Procrustes rotation on the bounded
    * deterministic sample, returning the ARGMIN iterate. The Procrustes
    * step alone is monotone, but [[Pq.trainOnVectors]] re-runs k-means
    * from fresh deterministic seeds on each re-rotated sample instead
    * of warm-starting the previous codebook, so a single iteration CAN
    * increase total error — tracking the best (R, pq, error) across
    * iterations (error via [[quantError]], already in hand) restores
    * the never-worse-than-plain-PQ guarantee unconditionally: candidate
    * 0 is plain PQ with R = I, so the returned model's rotated-space
    * error is <= the raw-space PQ error by construction, regardless of
    * k-means re-seeding (the spec asserts exactly this on real data).
    *
    * Each candidate is evaluated — and kept — under the FLOAT32
    * rotation serving will actually apply ([[graft.functions.MatVecF]]
    * takes a float matrix), so there is no train/serve precision
    * mismatch: the error the argmin compares is the error the index
    * will realize. opqIters=0 degenerates to plain PQ with R = I.
    */
  def train(
      emb: DataFrame, m: Int = 8, ksub: Int = 64, dims: Int = 64,
      pqIters: Int = 10, opqIters: Int = 6, sampleFactor: Long = 100L): Model = {
    val sample: Array[Array[Float]] = Ivf.trainingSample(emb, ksub, sampleFactor)
      .select("vec_id", "embedding").orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray)
    var rotated = sample
    var pq = Pq.trainOnVectors(rotated, m, ksub, dims, pqIters)
    var bestR = identity(dims)
    var bestPq = pq
    var bestErr = quantError(pq, sample) // candidate 0: plain PQ, R = I
    var it = 0
    while (it < opqIters) {
      val recon = rotated.map(v => reconstructLocal(pq, encodeLocal(pq, v)))
      // round the iterate to the float32 serving precision BEFORE
      // fitting and scoring against it
      val r32 = procrustes(xtY(sample, recon, dims), dims).map(x => x.toFloat.toDouble)
      rotated = sample.map(v => applyR(r32, v, dims))
      pq = Pq.trainOnVectors(rotated, m, ksub, dims, pqIters)
      val err = quantError(pq, rotated)
      if (err < bestErr) { bestErr = err; bestR = r32; bestPq = pq }
      it += 1
    }
    Model(bestR.map(_.toFloat), bestPq)
  }

  /** Encode a corpus to (vec_id, codes_pq) in the rotated space: one
    * distributed rotate+encode projection, both codegen'd.
    */
  def encode(emb: DataFrame, model: Model): DataFrame =
    emb.select(
      col("vec_id"),
      pq_codes(
        mat_vec(col("embedding"), model.rotation, model.dims),
        model.pq.codebook, model.pq.m, model.pq.ksub).as("codes_pq"))

  /** ADC top-k in the rotated space — rotate queries, reuse the stored-
    * codes scoring verbatim ([[Pq.topKPqCoded]]). Rotation invariance:
    * the ADC sim IS cosine(R q, reconstruction of R x), an estimate of
    * the ORIGINAL cosine with the rotated space's (smaller) cell error.
    */
  def topKOpq(
      corpus: DataFrame, queries: DataFrame, model: Model, k: Int = 10): DataFrame = {
    val rq = queries.select(
      col("vec_id"),
      mat_vec(col("embedding"), model.rotation, model.dims).as("embedding"))
    Pq.topKPqCoded(encode(corpus, model), rq, model.pq, k)
  }

  /** Two-phase OPQ: coarse rotated-ADC keeps k*oversample, exact float
    * rerank on the ORIGINAL vectors (no rotation needed — the metric is
    * invariant).
    */
  def opqRerankTopK(
      corpus: DataFrame, queries: DataFrame, model: Model,
      k: Int = 10, oversample: Int = 20): DataFrame =
    Similarity.exactRerank(topKOpq(corpus, queries, model, k * oversample), queries, corpus, k)
}
