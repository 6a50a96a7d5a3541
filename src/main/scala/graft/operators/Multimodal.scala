package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side design is the real thing — schema (binary payload +
  * metadata struct), partition-batched processing (`mapPartitions` over a
  * typed Dataset, the Scala-native analogue of PySpark's mapInPandas:
  * one iterator per partition, amortizing any per-batch decoder setup),
  * and explode-shaped frame sampling.
  *
  * Codecs: the container ships no media libraries, but the JDK itself
  * carries two real ones, and this module uses them —
  *  - image rows are REAL BMPs encoded with `javax.imageio` and decoded
  *    back (ImageIO.read) in the feature and resize stages: actual
  *    header parse, actual pixel raster, actual W x H recovered;
  *  - audio rows are REAL RIFF/WAVE files encoded and decoded with
  *    `javax.sound.sampled`: actual format negotiation, frame count and
  *    amplitude read from the PCM stream;
  *  - video decode has no JVM codec, so it remains the documented
  *    deterministic STUB (hash-derived pseudo-dimensions) behind the same
  *    interface.
  *
  * At 100 TB: payloads dominate storage — they stay in parquet binary
  * columns, scans prune them unless a stage needs bytes, and the feature
  * stage emits small fixed-width vectors so downstream shuffles never
  * carry media.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every read/write spills
  // through a temp file, which degrades badly in a long-lived session (32
  // concurrent decoders churning temp-file create/delete was measured 4x
  // slower late in a bench run than in a fresh JVM). Every payload here is
  // an in-memory byte array, so the disk cache buys nothing — force the
  // heap path. Object-init runs once per JVM (driver and executors alike,
  // on first classload of this object's closures).
  ImageIO.setUseCache(false)

  case class Media(
      media_id: Long,
      kind: String,              // image | audio | video
      payload: Array[Byte],      // opaque encoded bytes
      declared_w: Int,           // metadata as ingested (image/video)
      declared_h: Int,
      duration_ms: Int)          // audio/video

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      decoded_w: Int,            // image: pixel width; audio: PCM frames
      decoded_h: Int,            // image: pixel height; audio: channels
      mean_byte: Double,         // image: mean luminance; audio: mean |sample|
      feature: Array[Float])     // fixed 16-dim descriptor

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  val ImageW = 64
  val ImageH = 48
  val AudioSamples = 4000                 // 0.5 s at 8 kHz mono 16-bit
  val AudioRateHz = 8000f

  /** Deterministic synthetic media table derived from `documents` (no real
    * media ships with the testdata): image/audio payloads are REAL encoded
    * files whose content derives from the text bytes; video payloads are
    * opaque cycled bytes. Deterministic — same dir, same table.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        // empty documents still get a payload (modulo-by-zero guard)
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        (id % 3) match {
          case 0 =>
            Media(id, "image", encodeBmp(base), ImageW, ImageH, 0)
          case 1 =>
            Media(id, "audio", encodeWav(base), 0, 0,
              (AudioSamples * 1000 / AudioRateHz.toInt))
          case _ =>
            val payload = Array.tabulate[Byte](16384)(i => base(i % base.length))
            Media(id, "video", payload, ImageW, ImageH, 30000)
        }
      }
  }

  /** Real BMP encode (javax.imageio): 64x48 RGB raster whose pixels cycle
    * through the seed bytes — the payload is a well-formed file any BMP
    * reader decodes. */
  private[operators] def encodeBmp(base: Array[Byte]): Array[Byte] = {
    val img = new BufferedImage(ImageW, ImageH, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < ImageW * ImageH) {
      val r = base(i % base.length) & 0xff
      val g = base((i * 7 + 3) % base.length) & 0xff
      val b = base((i * 13 + 11) % base.length) & 0xff
      img.setRGB(i % ImageW, i / ImageW, (r << 16) | (g << 8) | b)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Real RIFF/WAVE encode (javax.sound.sampled): 8 kHz mono 16-bit PCM,
    * samples cycled from the seed bytes. */
  private[operators] def encodeWav(base: Array[Byte]): Array[Byte] = {
    val fmt = new AudioFormat(AudioRateHz, 16, 1, true, false)
    val pcm = new Array[Byte](AudioSamples * 2)
    var i = 0
    while (i < AudioSamples) {
      val s = ((base(i % base.length) & 0xff) - 128) * 256 // 16-bit from byte
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, AudioSamples.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real image decode: full BMP parse via ImageIO — returns (width,
    * height, mean luminance in [0,255]). Throws on malformed payload
    * (a corrupt file should fail loudly, not produce fake stats). */
  private[operators] def decodeImage(payload: Array[Byte]): (Int, Int, Double) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    var sum = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, sum / (img.getWidth * img.getHeight))
  }

  /** Real audio decode: WAVE header parse + PCM read via javax.sound —
    * returns (frame count, channels, mean |sample| over 16-bit LE PCM). */
  private[operators] def decodeAudio(payload: Array[Byte]): (Int, Int, Double) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val frames = in.getFrameLength.toInt
      val channels = in.getFormat.getChannels
      val bytes = in.readAllBytes()
      var sum = 0.0
      var i = 0
      while (i + 1 < bytes.length) {
        val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
        sum += math.abs(s.toDouble)
        i += 2
      }
      (frames, channels, if (bytes.length >= 2) sum / (bytes.length / 2) else 0.0)
    } finally in.close()
  }

  /** STUB decode for kinds with no JVM codec (video): derives
    * pseudo-dimensions and a luminance stand-in from a rolling hash of the
    * bytes — pure, deterministic, same signature as the real decoders.
    */
  private[operators] def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    var h = 1125899906842597L // FNV-ish rolling hash over the payload
    var i = 0
    var sum = 0L
    while (i < payload.length) {
      h = h * 31 + payload(i)
      sum += payload(i) & 0xff
      i += 1
    }
    val w = 16 + math.floorMod(h, 64).toInt
    val hgt = 16 + math.floorMod(h >> 8, 64).toInt
    (w, hgt, sum.toDouble / payload.length)
  }

  /** Kind dispatch: real codec where the JVM has one, stub otherwise. */
  private[operators] def decode(kind: String, payload: Array[Byte]): (Int, Int, Double) =
    kind match {
      case "image" => decodeImage(payload)
      case "audio" => decodeAudio(payload)
      case _ => decodeStub(payload)
    }

  /** Feature extraction, partition-batched: one decoder context per
    * partition (the mapPartitions iterator is the batch), 16-dim descriptor
    * per item. Image/audio go through the REAL decoders; the descriptor is
    * a byte-histogram projection (STUB for a real embedding model).
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup would pin decoder buffers once; ImageIO and
      // AudioSystem keep their reader registries in statics already
      batch.map { m =>
        val (dw, dh, meanLum) = decode(m.kind, m.payload)
        val hist = new Array[Float](16)
        var i = 0
        while (i < m.payload.length) {
          hist((m.payload(i) & 0xff) / 16) += 1f
          i += 1
        }
        val n = m.payload.length.toFloat
        var j = 0
        while (j < 16) { hist(j) /= n; j += 1 }
        MediaFeatures(m.media_id, m.kind, m.payload.length, dw, dh, meanLum, hist)
      }
    }
  }

  /** Resize: REAL for images — decode, nearest-neighbor rescale on the
    * pixel raster, re-encode as BMP (all javax.imageio / headless-safe
    * Graphics2D); STUB byte-subsample for codec-less video; audio rows
    * pass through untouched (resize is a spatial op — mangling a WAV
    * container would just break its decoder downstream).
    */
  def resize(media: Dataset[Media], w: Int, h: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind == "audio") {
        m
      } else if (m.kind == "image") {
        val src = ImageIO.read(new ByteArrayInputStream(m.payload))
        require(src != null, "payload is not a decodable image")
        val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
        val out = new ByteArrayOutputStream()
        ImageIO.write(dst, "bmp", out)
        m.copy(payload = out.toByteArray, declared_w = w, declared_h = h)
      } else {
        val stride = math.max(1, m.payload.length / math.max(1, w * h))
        val out = m.payload.indices.by(stride).map(m.payload).toArray
        m.copy(payload = out, declared_w = w, declared_h = h)
      }
    }
  }

  /** Frame sampling: one row per sampled frame for video rows (explode
    * shape — row multiplicity grows, payload shrinks per frame). Every
    * `everyMs` milliseconds; STUB slices the payload per frame.
    */
  def sampleFrames(media: Dataset[Media], everyMs: Int = 5000): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = math.max(1, m.duration_ms / everyMs)
      val chunk = math.max(1, m.payload.length / nFrames)
      (0 until nFrames).map { f =>
        val from = f * chunk
        Frame(m.media_id, f, m.payload.slice(from, math.min(from + chunk, m.payload.length)))
      }
    }
  }

  /** Driver-contract query: full multimodal pass — synthesize, extract,
    * aggregate per kind (rows-only; payload bytes never leave the
    * executors, only the small aggregates do). decoded_w/h aggregates pin
    * the real codecs: images must all decode to 64x48, audio to
    * 4000 frames x 1 channel.
    */
  def m01MediaFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(s, dir)).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("decoded_w")).as("min_dw"), max(col("decoded_w")).as("max_dw"),
        min(col("decoded_h")).as("min_dh"), max(col("decoded_h")).as("max_dh"),
        round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
        round(avg(element_at(col("feature"), 1)), 6).as("avg_feat0"))
      .orderBy(col("kind"))

  /** 64-bit average-hash (aHash) over the decoded raster: nearest-neighbor
    * 8x8 grayscale downsample (headless Graphics2D), bit i set iff cell
    * luminance >= the 64-cell mean. The standard cheap perceptual
    * fingerprint: robust to small edits and re-encodes, 8 bytes per image
    * — the image-modality analogue of d05's SimHash.
    */
  private[operators] def aHash(payload: Array[Byte]): Long = {
    val src = ImageIO.read(new ByteArrayInputStream(payload))
    require(src != null, "payload is not a decodable image")
    val dst = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try g.drawImage(src, 0, 0, 8, 8, null) finally g.dispose()
    val lum = new Array[Double](64)
    var sum = 0.0
    var i = 0
    while (i < 64) {
      val rgb = dst.getRGB(i % 8, i / 8)
      lum(i) = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
      sum += lum(i)
      i += 1
    }
    val mean = sum / 64
    var bits = 0L
    i = 0
    while (i < 64) { if (lum(i) >= mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Watermark-ish edit used to PLANT image near-duplicates: brighten the
    * top-left 8x6 pixel block by +16 per channel (clamped) and re-encode —
    * same dimensions, visually near-identical. The block covers exactly
    * ONE cell of aHash's 8x8 sampling grid (64x48 / 8x8 = 8x6 per cell),
    * so at most one bit flips directly and the 64-cell mean moves by
    * <= 16/64 — a handful of borderline bits at worst, far inside the
    * Hamming <= 7 verify budget. (A 16x12/+24 edit was measured to push
    * ~2% of byte-noise images past 7 bits via the mean shift.) */
  private[operators] def perturb(payload: Array[Byte]): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(payload))
    require(src != null, "payload is not a decodable image")
    var y = 0
    while (y < 6) {
      var x = 0
      while (x < 8) {
        val rgb = src.getRGB(x, y)
        val r = math.min(255, ((rgb >> 16) & 0xff) + 16)
        val gg = math.min(255, ((rgb >> 8) & 0xff) + 16)
        val b = math.min(255, (rgb & 0xff) + 16)
        src.setRGB(x, y, (r << 16) | (gg << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(src, "bmp", out)
    out.toByteArray
  }

  /** Driver-contract query: image near-dup dedup via banded aHash — the
    * multimodal tier's end-to-end retrieval audit (the image analogue of
    * s06's planted-probe construction). Each corpus image gets a perturbed
    * twin (media_id + 1,000,000); both are aHashed (REAL decode +
    * downsample per row), the 64 bits band into 8 x 8-bit bucket keys, and
    * only band-bucket collisions are verified with exact Hamming <= 7.
    * Pigeonhole: 7 differing bits cannot touch all 8 disjoint bands, so
    * any true pair ALWAYS shares a band — recall is structural, not
    * probabilistic; MultimodalSpec asserts the output is exactly the
    * planted pair set.
    *
    * Scale: hashing is per-row map work; candidates are band-bucket
    * collisions only (random 64-bit hashes sit ~32 bits apart, so
    * non-dup collisions are rare); no all-pairs step. The same shape as
    * d05's banded Hamming join, applied to binary media.
    */
  def m03ImageDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // One fused pass over the image-kind documents (doc_id % 3 == 0, the
    // mediaTable dispatch): encode once, perturb once, hash both. A
    // mediaTable.filter(_.kind == "image") formulation was 2.5x slower —
    // it encoded the WAV/video payloads only to drop them, and the
    // original/twin union branches each re-ran the whole synthesis.
    val hashed = Tables.spread(Tables.documents(s, dir))
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        val orig = encodeBmp(base)
        Seq((id, aHash(orig)), (id + 1000000L, aHash(perturb(orig))))
      })
      .toDF("media_id", "h")
    val banded = hashed.select(col("media_id"), col("h"), explode(expr(
        "transform(sequence(0, 7), b -> named_struct('band', b, 'bucket', (h >> (b * 8)) & 255))")).as("bb"))
      .select(col("media_id"), col("h"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("ida"), col("a.h").as("ha"),
        col("b.media_id").as("idb"), col("b.h").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= 7)
      .select(col("ida"), col("idb"), col("hamming"))
      .orderBy(col("ida"), col("idb"))
  }

  /** Driver-contract query: frame-sampling multiplicity stats (rows-only). */
  def m02FrameSample(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(s, dir)).toDF()
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("sampled_bytes"))
      .groupBy(col("n_frames")).agg(count(lit(1)).as("n_videos"),
        min(col("sampled_bytes")).as("min_bytes"), max(col("sampled_bytes")).as("max_bytes"))
      .orderBy(col("n_frames"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_features" -> (m01MediaFeatures _),
    "m02_frame_sample" -> (m02FrameSample _),
    "m03_image_dedup" -> (m03ImageDedup _))

  /** Engine-side media synthesis + codecs — no SQL oracle; MultimodalSpec
    * pins real decoded dimensions, multiplicity, and determinism. */
  val oracle: Map[String, String] = Map()
}
