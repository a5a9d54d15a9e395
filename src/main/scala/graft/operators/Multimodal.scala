package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Multimodal plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata beside them; decode/feature
  * extraction runs per-partition so heavyweight codec state is initialized
  * once per partition, not once per row (the mapInPandas batch shape,
  * expressed Scala-side with mapPartitions).
  *
  * The codec itself is STUBBED — no image/audio libraries exist in this
  * container — with a deterministic fake that derives pixel-ish features
  * from the payload bytes. Everything around it (binary schema, magic
  * headers, checksums, batched per-partition decode, partition-pruned
  * writes) is the real engine surface a decoder would drop into.
  */
object Multimodal {

  /** Fake 4-byte container magic, standing in for PNG/JPEG/RIFF sniffing. */
  private val Magic: Array[Byte] = Array('G', 'F', 'T', '1').map(_.toByte)

  /** Decoded features for one blob. */
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int, mean_luma: Double)

  /** Binary ingestion: payload = magic || utf8(text) — the engine treats it
    * as an opaque blob from here on; only the sniffer reads the header.
    */
  def binarize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("source"),
      concat(lit(Magic), encode(col("text"), "UTF-8")).as("blob"))

  /** Typed metadata extracted without decoding: length, sniffed container,
    * checksum. All codegen'd binary expressions — no UDF.
    */
  def withMeta(blobs: DataFrame): DataFrame =
    blobs.select(
      col("doc_id"),
      col("source"),
      col("blob"),
      struct(
        octet_length(col("blob")).as("n_bytes"),
        hex(substring(col("blob"), 1, 4)).as("magic"),
        crc32(col("blob")).as("checksum"),
      ).as("meta"))

  /** Per-partition batched decode. REAL pipeline shape: one codec init per
    * partition, iterate blobs, emit typed features. The decode body is the
    * deterministic STUB — replace `fakeDecode` with the actual codec call
    * when the image/audio libraries are available.
    */
  def decodeFeatures(blobs: DataFrame): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").as("_1"), col("blob").as("_2"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec init would happen HERE, once per partition
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** STUB decoder: deterministic features from payload bytes (stands in
    * for image decode; keeps tests and oracles reproducible).
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    var acc = 0L
    var i = Magic.length
    while (i < n) { acc += bytes(i) & 0xffL; i += 1 }
    val body = math.max(n - Magic.length, 1)
    MediaFeatures(
      doc_id = id,
      width = 16 + (acc % 64).toInt,
      height = 16 + ((acc / 64) % 64).toInt,
      mean_luma = acc.toDouble / body / 255.0,
    )
  }

  val qBinaryMeta = GraftQuery(
    "mm_binary_meta",
    (s, d) => {
      // End-to-end plumbing over documents-as-blobs: ingest -> metadata ->
      // batched decode -> join features back -> per-source stats.
      val blobs = withMeta(binarize(Tables.documents(s, d)))
      val feats = decodeFeatures(blobs).toDF()
      blobs
        .join(feats, Seq("doc_id"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_blobs"),
          sum(col("meta.n_bytes").cast("long")).as("total_bytes"),
          countDistinct(col("meta.magic")).as("n_magics"),
          min(col("width")).as("min_w"),
          max(col("height")).as("max_h"),
          RelationalCore.davg(col("mean_luma"), 6).as("avg_luma"),
        )
        .orderBy("source")
    },
    None,
  )

  /** The metadata stage under the HARD oracle gate. The rows-only
    * variant above exercises the full plumbing (decode stub included);
    * this twin pins the no-decode metadata path cross-engine: n_bytes,
    * sniffed magic (Spark `hex` emits the same uppercase hex DuckDB
    * expects), and an md5 checksum of the OPAQUE blob — Spark md5 over
    * the binary column equals DuckDB md5 over the reconstructed
    * 'GFT1' || text byte stream (both hash raw UTF-8 bytes to lowercase
    * hex). The decode STUB stays rows-only by design (its fake features
    * are not ANSI-expressible); crc32 likewise has no DuckDB analog, so
    * the portable checksum here is md5.
    */
  val qMetaMd5 = GraftQuery(
    "mm_meta_md5",
    (s, d) => {
      val blobs = binarize(Tables.documents(s, d))
      blobs.select(
        col("doc_id"),
        col("source"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        hex(substring(col("blob"), 1, 4)).as("magic"),
        md5(col("blob")).as("blob_md5"),
      ).orderBy("doc_id")
    },
    Some("""SELECT doc_id, source,
        CAST(4 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
        '47465431' AS magic,
        md5('GFT1' || text) AS blob_md5
      FROM documents ORDER BY doc_id"""),
    prod = Some((s, d) => {
      val blobs = binarize(Tables.documents(s, d))
      blobs.select(
        col("doc_id"),
        col("source"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        hex(substring(col("blob"), 1, 4)).as("magic"),
        md5(col("blob")).as("blob_md5"))
    }),
  )

  /** Bytes per fixed-size "frame" in the frame-sampling analog. */
  private val FrameBytes = 64
  /** Keep every Nth frame. */
  private val SampleEvery = 4

  /** Frame sampling over the opaque blob — the video-keyframe-sampling
    * analog: the payload is treated as a sequence of fixed-size frames
    * and every Nth frame is emitted with its checksum. Stateless per-row
    * generate (sequence with a step) + codegen'd substring/md5 — zero
    * shuffle, embarrassingly parallel; the sampled-frame stream is what
    * a real decoder's keyframe pass would feed downstream.
    *
    * HARD-gate note: the oracle reconstructs the blob as a VARCHAR and
    * slices characters; documents text is all-ASCII (verified: 0 docs
    * where octet_length(encode(text)) <> length(text)), so char slices
    * equal byte slices and DuckDB's md5(VARCHAR) hashes the same bytes
    * Spark's md5(binary frame) does.
    */
  private def frameSample(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    binarize(Tables.documents(s, d))
      .withColumn("n_frames", expr(s"(octet_length(blob) - ${Magic.length}) div $FrameBytes").cast("long"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(SampleEvery.toLong))).as("frame_idx"),
        col("blob"))
      .select(
        col("doc_id"),
        col("frame_idx"),
        md5(expr(s"substring(blob, ${Magic.length + 1} + frame_idx * $FrameBytes, $FrameBytes)"))
          .as("frame_md5"))
  }

  val qFrameSample = GraftQuery(
    "mm_frame_sample",
    (s, d) => frameSample(s, d).orderBy("doc_id", "frame_idx"),
    Some(s"""WITH f AS (
        SELECT doc_id, 'GFT1' || text AS blob,
          octet_length(encode(text)) // $FrameBytes AS n_frames
        FROM documents)
      SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        md5(substring(blob, CAST(5 + i * $FrameBytes AS BIGINT), $FrameBytes)) AS frame_md5
      FROM f CROSS JOIN UNNEST(range(0, n_frames, $SampleEvery)) AS u(i)
      WHERE n_frames > 0
      ORDER BY doc_id, frame_idx"""),
    prod = Some((s, d) => frameSample(s, d)),
  )

  /** Resized thumbnail for one blob (stub codec). */
  final case class Thumb(doc_id: Long, orig_bytes: Int, thumb_bytes: Int, thumb_md5: String)

  /** Stride at which the stub "resize" samples payload bytes. */
  private val ResizeStride = 8

  /** Resize analog: per-partition batched thumbnailing, binary-in /
    * binary-out — the same shape as [[decodeFeatures]] (codec state
    * initialized once per partition). The resampler is the STUB (every
    * ResizeStride-th payload byte stands in for pixel-area averaging);
    * the plumbing — batch iteration, deterministic output, downstream
    * checksums — is the real surface a codec drops into. Deterministic,
    * so DeterminismSpec-style replay holds; rows-only by design.
    */
  def resizeThumbs(blobs: DataFrame): Dataset[Thumb] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").as("_1"), col("blob").as("_2"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec init would happen HERE, once per partition
        it.map { case (id, bytes) =>
          val body = java.util.Arrays.copyOfRange(bytes, Magic.length, bytes.length)
          val thumb = body.indices.collect { case i if i % ResizeStride == 0 => body(i) }.toArray
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(thumb).map(b => f"$b%02x").mkString
          Thumb(id, bytes.length, thumb.length, hex)
        }
      }
  }

  val qResize = GraftQuery(
    "mm_resize",
    (s, d) => resizeThumbs(binarize(Tables.documents(s, d))).toDF().orderBy("doc_id"),
    // rows-only: the stride resampler is the stub codec; semantics are
    // spec-asserted (length law, determinism, magic exclusion)
    None,
    prod = Some((s, d) => resizeThumbs(binarize(Tables.documents(s, d))).toDF()),
  )

  def all: Seq[GraftQuery] = Seq(qBinaryMeta, qMetaMd5, qFrameSample, qResize)
}
