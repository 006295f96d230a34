package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Docs

/** Multimodal columns: media as opaque binary + typed metadata.
  *
  * The Spark-side plumbing (schema, partition-friendly batch processing,
  * deterministic payloads) is real; the actual image/audio DECODE is
  * STUBBED (no codec libs in this container) with a deterministic fake:
  * payload bytes are md5(media_ref) repeated, "decoded" features are byte
  * statistics. Swap `fakeDecode` for a real decoder (e.g. mapInPandas with
  * PIL on PySpark, or javax.imageio here) off-sandbox.
  */
object Multimodal {

  final case class MediaRow(media_ref: String, payload: Array[Byte],
                            width: Int, height: Int)
  final case class MediaFeat(media_ref: String, width: Int, height: Int,
                             n_bytes: Int, mean_byte: Double, payload_md5: String,
                             feature: Array[Float])

  /** Media table derived from the interleaved corpus' media spans.
    * Width/height derive from splitmix64 over the FNV-1a hash of the ref —
    * both are reproduced bit-exactly by the DuckDB oracle
    * (OracleSql.qMediaFeatures), so the table is value-checkable.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Docs.russianDocs(spark, sfDir)
      .flatMap(d => d.spans.filter(_.kind == "media").map(_.media_ref))
      .map { ref =>
        // STUB payload: deterministic pseudo-bytes from the ref (md5 x4)
        val md = java.security.MessageDigest.getInstance("MD5").digest(ref.getBytes("UTF-8"))
        val payload = Array.fill(4)(md).flatten
        val h = graft.corpus.RuCorpus.mix(graft.ops.Simhash.tokenHash(ref))
        MediaRow(ref, payload, 16 + (h & 15).toInt, 16 + ((h >>> 8) & 15).toInt)
      }.toDF()
  }

  final case class ResizedRow(media_ref: String, width: Int, height: Int,
                              payload: Array[Byte])
  final case class FrameRow(media_ref: String, frame_idx: Int, payload: Array[Byte])

  /** STUB resize: real plumbing (schema, batch shape), fake resample —
    * truncates/pads the payload to w*h bytes deterministically. Swap the
    * body for javax.imageio / a Pandas UDF off-sandbox.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_ref", "payload").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (ref, payload) =>
        val out = java.util.Arrays.copyOf(payload, w * h) // ??? real resample
        ResizedRow(ref, w, h, out)
      }).toDF()
  }

  /** STUB frame sampling: every k-th 16-byte block is a "frame". */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_ref", "payload").as[(String, Array[Byte])]
      .flatMap { case (ref, payload) =>
        payload.grouped(16).zipWithIndex.collect {
          case (block, i) if i % everyK == 0 => FrameRow(ref, i, block)
        }
      }.toDF()
  }

  /** Batched "decode + feature extract" over media payloads.
    * Runs as mapPartitions so a real decoder can amortize per-batch init
    * (model load, codec context) exactly like the NLP inference path.
    */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select("media_ref", "payload", "width", "height")
      .as[(String, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.map { case (ref, payload, w, h) =>
          // STUB decode: byte statistics as the "embedding"
          var sum = 0L
          payload.foreach(b => sum += (b & 0xff))
          val mean = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
          val feat = new Array[Float](8)
          var i = 0
          while (i < payload.length) {
            feat(i % 8) += (payload(i) & 0xff) / 255f
            i += 1
          }
          // digest of the lowercase-hex payload (duckdb: md5(repeat(md5(ref),4)))
          md5.reset()
          val hex = payload.map(b => f"${b & 0xff}%02x").mkString
          val dig = md5.digest(hex.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
          MediaFeat(ref, w, h, payload.length, math.rint(mean * 1e6) / 1e6, dig, feat)
        }
      }.toDF()
  }

  /** The driver-checked projection of [[features]]: scalar columns only
    * (sortable/hashable by the oracle gate), the full `feature` vector
    * stays on the internal API.
    */
  def featureScalars(spark: SparkSession, sfDir: String): DataFrame =
    features(spark, sfDir).select(col("media_ref"), col("width"), col("height"),
      col("n_bytes").cast("long").as("n_bytes"), col("mean_byte"), col("payload_md5"))
}
