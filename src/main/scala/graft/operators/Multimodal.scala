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

  def all: Seq[GraftQuery] = Seq(qBinaryMeta, qMetaMd5)
}
