package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Docs

/** Multimodal columns: media as opaque binary + typed metadata.
  *
  * Images are REAL: the fixture generator renders a deterministic
  * grayscale PNG per media ref (javax.imageio, in the JDK), and
  * [[features]]/[[resize]] DECODE those payloads — width/height/pixel
  * stats come from the decoded raster, not from byte stubs. The DuckDB
  * oracle reproduces the generation formula (dims + gradient pixel mean)
  * so the driver gate checks the decode end-to-end. Formats the JDK
  * cannot decode (video, audio) keep an honest deterministic stub with
  * real Spark plumbing ([[sampleFrames]]); swap in codec libs off-sandbox.
  */
object Multimodal {

  // keep ImageIO fully in-memory: the default disk cache creates/deletes a
  // temp file per decode/encode, which is pure syscall churn for these
  // sub-KB images on every executor (JVM-global toggle, set once on load)
  ImageIO.setUseCache(false)

  final case class MediaRow(media_ref: String, payload: Array[Byte],
                            width: Int, height: Int)
  final case class MediaFeat(media_ref: String, width: Int, height: Int,
                             n_bytes: Int, n_px: Long, mean_px: Double,
                             payload_md5: String, feature: Array[Float])

  /** Deterministic image parameters for a media ref: dims in [16,31] and a
    * gray-gradient offset, all from splitmix64 over the ref's FNV-1a hash
    * (reproduced bit-exactly by OracleSql.qMediaFeatures).
    */
  def params(ref: String): (Int, Int, Int) = {
    val h = graft.corpus.RuCorpus.mix(graft.ops.Simhash.tokenHash(ref))
    (16 + (h & 15).toInt, 16 + ((h >>> 8) & 15).toInt, ((h >>> 16) & 255).toInt)
  }

  /** Render the ref's image: TYPE_BYTE_GRAY, pixel(x,y) = (a+x+y) mod 256. */
  def renderPng(ref: String): (Array[Byte], Int, Int) = {
    val (w, h, a) = params(ref)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, (a + x + y) % 256); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    (bos.toByteArray, w, h)
  }

  /** Media table derived from the interleaved corpus' media spans: one REAL
    * PNG payload per ref (decoders see genuine image bytes, not stubs).
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Docs.russianDocs(spark, sfDir)
      .flatMap(d => d.spans.filter(_.kind == "media").map(_.media_ref))
      .map { ref =>
        val (png, w, h) = renderPng(ref)
        MediaRow(ref, png, w, h)
      }.toDF()
  }

  final case class ResizedRow(media_ref: String, width: Int, height: Int,
                              payload: Array[Byte])
  final case class FrameRow(media_ref: String, frame_idx: Int, payload: Array[Byte])

  /** Real resize for JDK-decodable payloads: nearest-neighbor resample of
    * the decoded raster (deterministic — no AWT graphics pipeline),
    * re-encoded as PNG. Payloads ImageIO cannot decode fall back to the
    * documented stub (truncate/pad) so the operator stays total.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_ref", "payload").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (ref, payload) =>
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        if (img != null) {
          val iw = img.getWidth; val ih = img.getHeight
          val in = img.getRaster
          val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          val or = out.getRaster
          var y = 0
          while (y < h) {
            val sy = (y.toLong * ih / h).toInt
            var x = 0
            while (x < w) {
              or.setSample(x, y, 0, in.getSample((x.toLong * iw / w).toInt, sy, 0))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          ResizedRow(ref, w, h, bos.toByteArray)
        } else // non-image payload: stub resample (no codec in the JDK)
          ResizedRow(ref, w, h, java.util.Arrays.copyOf(payload, w * h))
      }).toDF()
  }

  /** Frame sampling, REAL for multi-frame GIF (the one video-like
    * container the JDK can decode): every k-th frame is extracted with
    * ImageReader.read(i) and re-encoded as PNG. True video codecs are not
    * in the JDK, so non-GIF payloads keep the honest deterministic stub
    * (every k-th 16-byte block) — the operator stays total and the Spark
    * plumbing (flatMap batch shape, schema) is identical either way.
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_ref", "payload").as[(String, Array[Byte])]
      .flatMap { case (ref, payload) =>
        if (isGif(payload)) {
          val reader = ImageIO.getImageReadersByFormatName("gif").next()
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            (0 until n by everyK).map { i =>
              val bos = new ByteArrayOutputStream()
              ImageIO.write(reader.read(i), "png", bos)
              FrameRow(ref, i, bos.toByteArray)
            }
          } finally { reader.dispose(); iis.close() }
        } else // no codec in the JDK for this payload: documented stub
          payload.grouped(16).zipWithIndex.collect {
            case (block, i) if i % everyK == 0 => FrameRow(ref, i, block)
          }.toSeq
      }.toDF()
  }

  private def isGif(payload: Array[Byte]): Boolean =
    payload.length > 6 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8'

  // ------------------------------------------------------------------
  // Video: REAL multi-frame decode via animated GIF (javax.imageio reads
  // and writes multi-frame GIF losslessly for 256-gray palettes — probed
  // bit-exact). Same fixture scheme: deterministic frames per ref, the
  // oracle reproduces the generation formula.
  // ------------------------------------------------------------------

  final case class VideoFrameFeat(media_ref: String, frame_idx: Int,
                                  width: Int, height: Int, f_mean: Double)

  /** Deterministic video parameters: (nFrames, w, h, a) from a THIRD
    * splitmix over the ref hash (images use one, audio two). */
  def videoParams(ref: String): (Int, Int, Int, Int) = {
    val h = graft.corpus.RuCorpus.mix(graft.corpus.RuCorpus.mix(
      graft.corpus.RuCorpus.mix(graft.ops.Simhash.tokenHash(ref))))
    val nf = (4L + (h & 7L)).toInt
    val w = (12L + ((h >>> 8) % 12L)).toInt
    val hh = (12L + ((h >>> 16) % 12L)).toInt
    val a = ((h >>> 24) % 256L).toInt
    (nf, w, hh, a)
  }

  /** Render the ref's animated GIF: nf gray frames, frame f pixel(x,y) =
    * (a + 7f + x + y) mod 256. */
  def renderGif(ref: String): Array[Byte] = {
    val (nf, w, h, a) = videoParams(ref)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nf) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, (a + 7 * f + x + y) % 256); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Video table over the corpus' media refs: one REAL animated-GIF
    * payload per ref. */
  def videoTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Docs.russianDocs(spark, sfDir)
      .flatMap(d => d.spans.filter(_.kind == "media").map(_.media_ref))
      .map(ref => (ref, renderGif(ref)))
      .toDF("media_ref", "payload")
  }

  /** Decode + per-sampled-frame stats: frame count from the DECODER
    * (getNumImages), pixel mean from the decoded frame raster. */
  def videoFrameFeatures(spark: SparkSession, sfDir: String,
                         everyK: Int): DataFrame = {
    import spark.implicits._
    videoTable(spark, sfDir)
      .as[(String, Array[Byte])]
      .flatMap { case (ref, payload) =>
        val reader = ImageIO.getImageReadersByFormatName("gif").next()
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          (0 until n by everyK).map { i =>
            val img = reader.read(i)
            val w = img.getWidth; val h = img.getHeight
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += (img.getRGB(x, y) & 0xff); x += 1 }
              y += 1
            }
            VideoFrameFeat(ref, i, w, h, sum.toDouble / (w.toLong * h))
          }
        } finally { reader.dispose(); iis.close() }
      }.toDF()
      .select(col("media_ref"), col("frame_idx"), col("width"), col("height"),
        round(col("f_mean"), 6).as("f_mean"))
  }

  /** Batched decode + feature extract over media payloads: REAL ImageIO
    * decode (width/height/pixel mean/8-bin gray histogram from the raster).
    * Runs as mapPartitions so a heavier decoder can amortize per-batch
    * init exactly like the NLP inference path. Undecodable payloads fall
    * back to byte statistics (stub path), flagged by n_px = -1.
    */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select("media_ref", "payload")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.map { case (ref, payload) =>
          md5.reset()
          val dig = md5.digest(payload).map(b => f"${b & 0xff}%02x").mkString
          val img = ImageIO.read(new ByteArrayInputStream(payload))
          if (img != null) {
            val w = img.getWidth; val h = img.getHeight
            val raster = img.getRaster
            val feat = new Array[Float](8)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val g = raster.getSample(x, y, 0)
                sum += g
                feat(g >> 5) += 1f
                x += 1
              }
              y += 1
            }
            val nPx = w.toLong * h
            var i = 0
            while (i < 8) { feat(i) /= nPx; i += 1 }
            MediaFeat(ref, w, h, payload.length, nPx, sum.toDouble / nPx, dig, feat)
          } else {
            var sum = 0L
            payload.foreach(b => sum += (b & 0xff))
            val mean = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
            MediaFeat(ref, 0, 0, payload.length, -1L, mean, dig,
              new Array[Float](8))
          }
        }
      }.toDF()
  }

  /** The driver-checked projection of [[features]]: DECODED dims and the
    * exact raster mean — value-checked by the oracle against the
    * generation formula (scalar columns only; the feature vector and the
    * PNG-byte md5 stay on the internal API).
    */
  def featureScalars(spark: SparkSession, sfDir: String): DataFrame =
    features(spark, sfDir).select(col("media_ref"), col("width"), col("height"),
      col("n_px"), col("mean_px"))

  // ------------------------------------------------------------------
  // Audio: REAL WAV decode (javax.sound.sampled, in the JDK — same story
  // as images: genuine codec on the JVM, deterministic fixture payloads,
  // oracle reproduces the GENERATION formula so the driver gate proves
  // the decode recovered exactly what was encoded).
  // ------------------------------------------------------------------

  final case class AudioFeat(media_ref: String, sample_rate: Int, channels: Int,
                             n_samples: Long, duration_ms: Double,
                             mean_abs: Double, peak_abs: Int)

  // AudioSystem.getAudioInputStream / AudioSystem.write resolve their SPI
  // providers through a SYNCHRONIZED global registry on EVERY call: 32
  // executor threads serialize on that lock (measured: 10k render+decode
  // 1.7 s via AudioSystem vs 0.38 s via direct providers on 32 threads —
  // barely faster than single-threaded). Resolve the providers once per
  // JVM (lazy val) and run the same iterate-until-parse contract
  // AudioSystem implements, lock-free. Provider instances are stateless.
  private lazy val audioWriters: Vector[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toVector
      .filter(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
  }
  private lazy val audioReaders: Vector[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toVector
  }
  private def writeWave(ais: javax.sound.sampled.AudioInputStream,
                        out: java.io.OutputStream): Unit =
    audioWriters.headOption match {
      case Some(w) => w.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      case None => // no SPI visible (exotic classloader): registry fallback
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    }
  // ServiceLoader lists AIFF/AU/MIDI readers BEFORE the WAV one, and each
  // mismatch costs a constructed UnsupportedAudioFileException per row —
  // remember the reader that last succeeded and try it first.
  @volatile private var preferredReader: javax.sound.sampled.spi.AudioFileReader = _
  private def readAudio(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val pref = preferredReader
    if (pref != null)
      try return pref.getAudioInputStream(new ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      if (r ne pref)
        try {
          val ais = r.getAudioInputStream(new ByteArrayInputStream(payload))
          preferredReader = r
          return ais
        } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
    }
    javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
  }

  /** Deterministic audio parameters for a ref: (sampleRate, nSamples,
    * offset, step) from a SECOND splitmix over the same FNV-1a ref hash
    * the image params use — independent streams, one shared SQL helper.
    */
  def audioParams(ref: String): (Int, Int, Int, Int) = {
    val h = graft.corpus.RuCorpus.mix(
      graft.corpus.RuCorpus.mix(graft.ops.Simhash.tokenHash(ref)))
    val rate = if ((h & 1L) == 0L) 8000 else 16000
    val n = (500L + ((h >>> 8) % 1000L)).toInt
    val a = ((h >>> 24) % 256L).toInt
    val step = (1L + ((h >>> 32) % 17L)).toInt
    (rate, n, a, step)
  }

  /** Render the ref's audio: 16-bit signed little-endian mono PCM in a
    * WAV container, sample(i) = ((a + i*step) mod 511) − 255 — an
    * integer sawtooth, so every decoded statistic is integer-exact and
    * the DuckDB oracle reproduces it with plain arithmetic (no
    * cross-engine float transcendentals).
    */
  def renderWav(ref: String): Array[Byte] = {
    val (rate, n, a, step) = audioParams(ref)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((a + i.toLong * step) % 511L).toInt - 255
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    writeWave(ais, bos)
    bos.toByteArray
  }

  /** Audio table over the corpus' media refs: one REAL WAV payload per
    * ref (decoders see a genuine RIFF/WAVE container).
    */
  def audioTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Docs.russianDocs(spark, sfDir)
      .flatMap(d => d.spans.filter(_.kind == "media").map(_.media_ref))
      .map(ref => (ref, renderWav(ref)))
      .toDF("media_ref", "payload")
  }

  /** Batched WAV decode + feature extract: REAL javax.sound decode —
    * format header (rate/channels) and the PCM frames both come from the
    * decoder, not from the generation formula. duration/mean/peak are
    * computed on the decoded samples; all stats are integer-derived so
    * the oracle hash-match is exact.
    */
  def audioFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, sfDir)
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (ref, payload) =>
        val ais = readAudio(payload)
        val fmt = ais.getFormat
        // the sample loop below assumes a 2-byte mono frame — fail loudly
        // on anything else instead of silently mis-striding 8/24/32-bit
        // or multi-channel PCM (round-3 ADVICE)
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"audioFeatures supports 16-bit mono PCM only, got " +
            s"${fmt.getSampleSizeInBits}-bit x${fmt.getChannels}ch")
        val bytes = ais.readAllBytes()
        val big = fmt.isBigEndian
        val n = bytes.length / 2
        var sumAbs = 0L
        var peak = 0
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
          val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
          val s = (hi << 8) | lo
          val v = math.abs(s)
          sumAbs += v
          if (v > peak) peak = v
          i += 1
        }
        val rate = fmt.getSampleRate.toInt
        AudioFeat(ref, rate, fmt.getChannels, n.toLong,
          n.toDouble * 1000 / rate, sumAbs.toDouble / n, peak)
      }).toDF()
      // HALF_UP rounding in the plan (same function family as the DuckDB
      // oracle's round — math.rint would tie-to-even)
      .select(col("media_ref"), col("sample_rate"), col("channels"),
        col("n_samples"), round(col("duration_ms"), 6).as("duration_ms"),
        round(col("mean_abs"), 6).as("mean_abs"), col("peak_abs"))
  }
}
