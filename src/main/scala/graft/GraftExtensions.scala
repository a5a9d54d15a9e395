package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

import graft.functions.{BloomAgg, BloomContains, HeavyHitters, CosineSim, HashedProjection, HyperplaneBands, Int8Codes, Int8Cosine, JaccardSim, KgramMd5Hashes, MatVecF, MinhashMd5Sig, MinhashSig, NearestCentroid, PqAdcSim, PqAsymSim, PqCodes, PqLut, PqResidCodes, PqResidLut, PqResidSim, ShingleHashes, ShingleMd5Hashes, ShingleXor64, SimHash64, SimHashMd5, TopKByScore, WsTokens, ZValue2}
import org.apache.spark.sql.catalyst.util.ArrayData

/** Engine extension point, installed via spark.sql.extensions (GraftSession
  * sets it). Registers native expressions as SQL functions so both
  * `spark.sql("SELECT cosine_sim(a,b)")` and the typed Column helpers work.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
        (children: Seq[Expression]) => CosineSim(children(0), children(1)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("top_k_by_score"),
        new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
        (children: Seq[Expression]) => TopKByScore(children(0), children(1), children(2)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
        (children: Seq[Expression]) => MinhashSig(children(0), children(1)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("ws_tokens"),
        new ExpressionInfo(classOf[WsTokens].getName, "ws_tokens"),
        (children: Seq[Expression]) => WsTokens(children(0)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => SimHash64(children(0)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("hashed_projection"),
        new ExpressionInfo(classOf[HashedProjection].getName, "hashed_projection"),
        // Guard arity + dims shape HERE: the builder runs at resolution
        // time, before HashedProjection.checkInputDataTypes would, so a
        // bad call must raise a readable analysis error rather than
        // IndexOutOfBounds/ClassCastException (r16 ADVICE).
        (children: Seq[Expression]) => {
          if (children.length != 2)
            throw new org.apache.spark.sql.AnalysisException(
              "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              Map(
                "functionName" -> "`hashed_projection`",
                "expectedNum" -> "2",
                "actualNum" -> children.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"),
              Option.empty[Throwable])
          val dimsExpr = children(1)
          // two distinct failures, two readable errors (r17 ADVICE: a
          // foldable-but-wrong-type dims used to raise
          // NON_FOLDABLE_ARGUMENT, which misdescribes it): first
          // non-foldable, then — for a foldable dims — wrong type or a
          // NULL int literal (which folds to null and would NPE-unbox
          // below) as a datatype mismatch
          if (!dimsExpr.foldable)
            throw new org.apache.spark.sql.AnalysisException(
              "NON_FOLDABLE_ARGUMENT",
              Map(
                "funcName" -> "`hashed_projection`",
                "paramName" -> "`dims`",
                "paramType" -> "\"INT\""),
              Option.empty[Throwable])
          if (dimsExpr.dataType != org.apache.spark.sql.types.IntegerType ||
              dimsExpr.eval() == null)
            throw new org.apache.spark.sql.AnalysisException(
              "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
              Map(
                "sqlExpr" -> "\"hashed_projection\"",
                "paramIndex" -> "second",
                "requiredType" -> "\"INT\" (non-NULL literal)",
                "inputSql" -> s"\"${dimsExpr.sql}\"",
                "inputType" -> s"\"${dimsExpr.dataType.sql}\""),
              Option.empty[Throwable])
          HashedProjection(children(0), dimsExpr.eval().asInstanceOf[Int])
        },
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
        (children: Seq[Expression]) => ShingleHashes(children(0)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("jaccard_sim"),
        new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
        (children: Seq[Expression]) => JaccardSim(children(0), children(1)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("shingle_xor64"),
        new ExpressionInfo(classOf[ShingleXor64].getName, "shingle_xor64"),
        (children: Seq[Expression]) => ShingleXor64(children(0)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("minhash_md5_sig"),
        new ExpressionInfo(classOf[MinhashMd5Sig].getName, "minhash_md5_sig"),
        (children: Seq[Expression]) => MinhashMd5Sig(children(0), children(1)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("shingle_md5_hashes"),
        new ExpressionInfo(classOf[ShingleMd5Hashes].getName, "shingle_md5_hashes"),
        (children: Seq[Expression]) => ShingleMd5Hashes(children(0)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("kgram_md5_hashes"),
        new ExpressionInfo(classOf[KgramMd5Hashes].getName, "kgram_md5_hashes"),
        (children: Seq[Expression]) => KgramMd5Hashes(children(0), children(1)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("simhash_md5"),
        new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
        (children: Seq[Expression]) => SimHashMd5(children(0)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("bloom_agg"),
        new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
        (children: Seq[Expression]) => BloomAgg(children(0), children(1), children(2)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("bloom_contains"),
        new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
        (children: Seq[Expression]) => BloomContains(children(0), children(1), children(2)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("heavy_hitters"),
        new ExpressionInfo(classOf[HeavyHitters].getName, "heavy_hitters"),
        (children: Seq[Expression]) => HeavyHitters(children(0), children(1)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("int8_codes"),
        new ExpressionInfo(classOf[Int8Codes].getName, "int8_codes"),
        (children: Seq[Expression]) => Int8Codes(children(0)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("int8_cosine"),
        new ExpressionInfo(classOf[Int8Cosine].getName, "int8_cosine"),
        (children: Seq[Expression]) => Int8Cosine(children(0), children(1)),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("nearest_centroid"),
        new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
        (children: Seq[Expression]) =>
          NearestCentroid(
            children(0),
            children(1).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(2).eval().asInstanceOf[Int],
            children(3).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("pq_codes"),
        new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
        (children: Seq[Expression]) =>
          PqCodes(
            children(0),
            children(1).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(2).eval().asInstanceOf[Int],
            children(3).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("pq_lut"),
        new ExpressionInfo(classOf[PqLut].getName, "pq_lut"),
        (children: Seq[Expression]) =>
          PqLut(
            children(0),
            children(1).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(2).eval().asInstanceOf[Int],
            children(3).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("pq_adc_sim"),
        new ExpressionInfo(classOf[PqAdcSim].getName, "pq_adc_sim"),
        (children: Seq[Expression]) =>
          PqAdcSim(
            children(0),
            children(1),
            children(2).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(3).eval().asInstanceOf[Int],
            children(4).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("pq_resid_codes"),
        new ExpressionInfo(classOf[PqResidCodes].getName, "pq_resid_codes"),
        (children: Seq[Expression]) =>
          PqResidCodes(
            children(0),
            children(1),
            children(2).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(3).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(4).eval().asInstanceOf[Int],
            children(5).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("pq_resid_lut"),
        new ExpressionInfo(classOf[PqResidLut].getName, "pq_resid_lut"),
        (children: Seq[Expression]) =>
          PqResidLut(
            children(0),
            children(1).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(2).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(3).eval().asInstanceOf[Int],
            children(4).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("pq_resid_sim"),
        new ExpressionInfo(classOf[PqResidSim].getName, "pq_resid_sim"),
        (children: Seq[Expression]) =>
          PqResidSim(
            children(0),
            children(1),
            children(2),
            children(3).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(4).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(5).eval().asInstanceOf[Int],
            children(6).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("pq_asym_sim"),
        new ExpressionInfo(classOf[PqAsymSim].getName, "pq_asym_sim"),
        (children: Seq[Expression]) =>
          PqAsymSim(
            children(0),
            children(1),
            children(2).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(3).eval().asInstanceOf[Int],
            children(4).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("mat_vec"),
        new ExpressionInfo(classOf[MatVecF].getName, "mat_vec"),
        (children: Seq[Expression]) =>
          MatVecF(
            children(0),
            children(1).eval().asInstanceOf[ArrayData].toFloatArray(),
            children(2).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("z_value2"),
        new ExpressionInfo(classOf[ZValue2].getName, "z_value2"),
        (children: Seq[Expression]) =>
          ZValue2(
            children(0),
            children(1),
            children(2).eval().asInstanceOf[ArrayData].toLongArray(),
            children(3).eval().asInstanceOf[Int]),
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("hyperplane_bands"),
        new ExpressionInfo(classOf[HyperplaneBands].getName, "hyperplane_bands"),
        (children: Seq[Expression]) =>
          HyperplaneBands(
            children(0),
            children(1).eval().asInstanceOf[Int],
            children(2).eval().asInstanceOf[Int],
            children(3).eval().asInstanceOf[Int]),
      )
    )
  }
}

/** Typed Column-API surface for the engine's native functions. */
object gfunctions {
  /** cosine similarity of two array<float> columns (native codegen'd kernel). */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** bounded top-k (id, score) pairs per group, highest score first —
    * O(k) memory per group per partition, no per-group sort.
    */
  def top_k_by_score(id: Column, score: Column, k: Int): Column =
    call_function("top_k_by_score", id, score, org.apache.spark.sql.functions.lit(k))

  /** k-minima minhash signature of a token array's 3-shingles (native
    * codegen'd kernel); NULL for docs with < 3 tokens.
    */
  def minhash_sig(toks: Column, k: Int): Column =
    call_function("minhash_sig", toks, org.apache.spark.sql.functions.lit(k))

  /** Non-empty whitespace tokens of a string (native one-pass kernel) —
    * byte-identical to filter(split(text, "\\s+"), x -> x != "").
    */
  def ws_tokens(text: Column): Column = call_function("ws_tokens", text)

  /** 64-bit SimHash of a token array (native per-row kernel, zero
    * shuffle); NULL for zero-token inputs.
    */
  def simhash64(toks: Column): Column = call_function("simhash64", toks)

  /** Unit-norm feature-hashing projection of a token array into `dims`
    * float components (native per-row kernel, zero shuffle) — the
    * deterministic text-derived embedding; NULL for zero-token inputs.
    */
  def hashed_projection(toks: Column, dims: Int): Column =
    call_function("hashed_projection", toks, org.apache.spark.sql.functions.lit(dims))

  /** Sorted distinct XXH64 values of a token array's 3-shingles (native
    * kernel) — the set representation jaccard_sim merges.
    */
  def shingle_hashes(toks: Column): Column = call_function("shingle_hashes", toks)

  /** Exact Jaccard of two sorted distinct array<bigint> sets by linear
    * merge; NULL when both are empty.
    */
  def jaccard_sim(a: Column, b: Column): Column = call_function("jaccard_sim", a, b)

  /** Order-independent XOR-fold fingerprint of a token array's 3-shingles
    * (native kernel); NULL for docs with < 3 tokens.
    */
  def shingle_xor64(toks: Column): Column = call_function("shingle_xor64", toks)

  /** md5-KM minhash signature (native kernel, value-identical to the
    * ANSI md5+conv formulation); NULL for docs with < 3 tokens.
    */
  def minhash_md5_sig(toks: Column, k: Int): Column =
    call_function("minhash_md5_sig", toks, org.apache.spark.sql.functions.lit(k))

  /** Sorted distinct md5-h1 shingle hashes (native kernel, same values
    * as conv(substr(md5(shingle),1,15),16,10)).
    */
  def shingle_md5_hashes(toks: Column): Column = call_function("shingle_md5_hashes", toks)

  /** Sorted distinct md5-h1 hashes of all k-token windows (native
    * kernel) — the passage-dedup window set; empty for docs with < k
    * tokens.
    */
  def kgram_md5_hashes(toks: Column, k: Int): Column =
    call_function("kgram_md5_hashes", toks, org.apache.spark.sql.functions.lit(k))

  /** 60-bit md5 simhash (native per-row kernel, value-identical to the
    * explode + bit-majority aggregate); NULL for zero-token docs.
    */
  def simhash_md5(toks: Column): Column = call_function("simhash_md5", toks)

  /** Bloom filter (binary, numBits/8 bytes) over a BIGINT key column —
    * partial-agg build, byte-OR merge; numBits must be a power of two.
    */
  def bloom_agg(key: Column, numBits: Long, numHashes: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("bloom_agg", key, lit(numBits), lit(numHashes))
  }

  /** Membership probe against a bloom_agg filter — false is definitive,
    * true may be a false positive (confirm survivors exactly).
    */
  def bloom_contains(bloom: Column, key: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("bloom_contains", bloom, key, lit(numHashes))
  }

  /** Misra-Gries frequent-items summary (<= k candidates, lower-bound
    * counts; every item with freq > n/(k+1) guaranteed present) — O(k)
    * state total per partition, any key domain size.
    */
  def heavy_hitters(item: Column, k: Int): Column =
    call_function("heavy_hitters", item, org.apache.spark.sql.functions.lit(k))

  /** Symmetric-int8 codes of a float vector PACKED as binary — exactly
    * dims bytes per vector (the 1-byte/dim storage form; scale = the
    * SQL-side amax/127, which cosine ranking never reads).
    */
  def int8_codes(vec: Column): Column = call_function("int8_codes", vec)

  /** Cosine similarity of two packed int8 code vectors (native integer
    * kernel) — bit-equal to cosine_sim over the float-cast codes.
    */
  def int8_cosine(a: Column, b: Column): Column = call_function("int8_cosine", a, b)

  /** Product-quantization codes of a float vector — m bytes per vector
    * (one codebook index per dsub-dim subspace; the storage step after
    * [[int8_codes]]'s 1 byte/dim). Codebook is flattened subspace-major.
    */
  def pq_codes(vec: Column, codebook: Array[Float], m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_codes", vec, typedlit(codebook.toSeq), lit(m), lit(ksub))
  }

  /** Nearest-centroid id (argmax cosine, ties -> smallest id) against a
    * flat centroid-major k*dims matrix riding as a codegen reference
    * object -- O(1) generated-code size in k, unlike the literal
    * struct-array argmax (see [[graft.functions.NearestCentroid]]).
    */
  def nearest_centroid(vec: Column, centroids: Array[Float], k: Int, dims: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("nearest_centroid", vec, typedlit(centroids.toSeq), lit(k), lit(dims))
  }

  /** Per-query ADC lookup table (m*ksub subspace dots + ||q||^2) — built
    * once per query row; rides the broadcast query side.
    */
  def pq_lut(qvec: Column, codebook: Array[Float], m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_lut", qvec, typedlit(codebook.toSeq), lit(m), lit(ksub))
  }

  /** ADC cosine of (pq codes, query LUT): m table lookups per candidate —
    * scoring cost scales with m, not dims.
    */
  def pq_adc_sim(codes: Column, lut: Column, codebook: Array[Float], m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_adc_sim", codes, lut, typedlit(codebook.toSeq), lit(m), lit(ksub))
  }

  /** Residual-PQ codes of (vec, cluster): m bytes indexing the residual
    * codebook for vec - centroid[cluster] (the textbook IVFPQ encode).
    */
  def pq_resid_codes(
      vec: Column, cluster: Column, centroids: Array[Float], codebook: Array[Float],
      m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_resid_codes", vec, cluster,
      typedlit(centroids.toSeq), typedlit(codebook.toSeq), lit(m), lit(ksub))
  }

  /** Per-query residual-PQ LUT (residual dots, per-centroid dots,
    * ||q||^2) — rides the broadcast query side.
    */
  def pq_resid_lut(
      qvec: Column, centroids: Array[Float], codebook: Array[Float],
      m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_resid_lut", qvec,
      typedlit(centroids.toSeq), typedlit(codebook.toSeq), lit(m), lit(ksub))
  }

  /** Exact cosine over centroid + residual reconstruction from (codes,
    * LUT, cluster) — cluster-conditioned tables as plan-time constants.
    */
  def pq_resid_sim(
      codes: Column, lut: Column, cluster: Column,
      centroids: Array[Float], codebook: Array[Float], m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_resid_sim", codes, lut, cluster,
      typedlit(centroids.toSeq), typedlit(codebook.toSeq), lit(m), lit(ksub))
  }

  /** Asymmetric PQ cosine of (codes, query float vector) — bit-equal to
    * pq_adc_sim over the pq_lut, without a LUT column riding every
    * joined row (the row-at-a-time join's preferred form).
    */
  def pq_asym_sim(codes: Column, qvec: Column, codebook: Array[Float], m: Int, ksub: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_asym_sim", codes, qvec, typedlit(codebook.toSeq), lit(m), lit(ksub))
  }

  /** Rotation of a float vector by a plan-time row-major d x d matrix
    * — the OPQ projection ([[graft.operators.Opq]]).
    */
  def mat_vec(vec: Column, mat: Array[Float], d: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("mat_vec", vec, typedlit(mat.toSeq), lit(d))
  }

  /** Z-order sort value of two long keys against plan-time quantile
    * boundaries (flattened: key 0 at [0, stride), key 1 at [stride,
    * 2*stride)) — the multi-key clustering key for
    * [[graft.sources.Clustered.saveZOrder]].
    */
  def z_value2(k0: Column, k1: Column, bounds: Array[Long], stride: Int): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("z_value2", k0, k1, typedlit(bounds.toSeq), lit(stride))
  }

  /** Random-hyperplane LSH band values of a float vector — all plane
    * dots in one native pass, sign bits packed per band.
    */
  def hyperplane_bands(vec: Column, planes: Int, bands: Int, dims: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("hyperplane_bands", vec, lit(planes), lit(bands), lit(dims))
  }
}
