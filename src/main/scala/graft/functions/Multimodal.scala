package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with batch-shaped feature extraction.
  *
  * The Spark-side contract is real — schema, partition sizing, batch
  * iteration — while the media decode itself is STUBBED behind
  * [[MediaCodec]] (this environment has no image/audio libraries). A real
  * deployment swaps in a JNI/javax.imageio codec without touching the
  * plan: the operator shape (mapPartitions over batches of blobs,
  * emitting fixed-width feature structs) is what matters at 100 TB —
  * blobs never shuffle, features do.
  */
object Multimodal {

  /** Canonical asset schema: id + opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Decode stub: a real implementation would wrap an image/audio codec.
    * This deterministic fake derives pseudo-features from the bytes so
    * the pipeline is testable end-to-end. */
  trait MediaCodec extends Serializable {
    def decodeDims(payload: Array[Byte]): (Int, Int)
    def frameSampleHashes(payload: Array[Byte], n: Int): Seq[String]
  }

  /** Deterministic fake codec: dims and frame hashes derived from md5 of
    * the payload. Marks exactly where a real decoder plugs in. */
  object FakeCodec extends MediaCodec {
    private def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      val h = md5hex(payload)
      // pseudo-dims in [16, 4111] — stands in for a real header parse
      (16 + Integer.parseInt(h.substring(0, 3), 16),
        16 + Integer.parseInt(h.substring(3, 6), 16))
    }
    def frameSampleHashes(payload: Array[Byte], n: Int): Seq[String] =
      (0 until n).map(i => md5hex(payload ++ Array(i.toByte)))
  }

  /** Wrap a text corpus as binary assets (deterministic fake payloads) —
    * gives the binary pipeline real data to run over in tests/benchmarks. */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/fake").as("media_type"))

  /** Cheap, engine-portable payload features (no codec): size + digest.
    * Pure built-ins — stays in whole-stage codegen. */
  def payloadStats(payload: Column): Seq[(String, Column)] = Seq(
    "payload_bytes" -> length(payload).cast("long"),
    "payload_md5" -> md5(payload))

  /** Exact multimodal dedup: group assets by payload digest, keep the
    * min-id copy. The digest is computed where the blob lives, so the
    * shuffle carries (16-byte digest, id) pairs — never the payloads
    * themselves, which is the whole trick at 100 TB of media. One
    * map-side-combinable aggregation. Output: (payload_md5, n_assets,
    * survivor_id). */
  def payloadDedup(
      assets: DataFrame,
      idCol: String = "asset_id",
      payloadCol: String = "payload"): DataFrame =
    assets
      .select(md5(col(payloadCol)).as("payload_md5"), col(idCol))
      .groupBy(col("payload_md5"))
      .agg(count(lit(1)).as("n_assets"), min(col(idCol)).as("survivor_id"))

  /** Feature extraction over batches: mapPartitions so a real codec would
    * amortize per-partition init (model load, native buffers), the same
    * batch shape `mapInPandas`/`mapInArrow` gives Python pipelines. */
  def extractFeatures(
      assets: DataFrame,
      codec: MediaCodec = FakeCodec,
      frameSamples: Int = 3): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("frame_hashes", ArrayType(StringType))))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(out))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it =>
      // per-partition codec init happens here in a real implementation
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          // a null blob yields null features; one bad asset must not
          // kill a corpus-wide extraction job
          Row(r.getLong(idIdx), null, null, null)
        else {
          val (w, h) = codec.decodeDims(payload)
          Row(r.getLong(idIdx), w, h,
            codec.frameSampleHashes(payload, frameSamples))
        }
      }
    }(enc)
  }
}
