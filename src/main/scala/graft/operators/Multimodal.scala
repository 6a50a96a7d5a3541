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
  * Codecs: the container ships no media libraries, but every kind here is
  * byte-real anyway —
  *  - image rows are REAL BMPs encoded with `javax.imageio` and decoded
  *    back (ImageIO.read) in the feature and resize stages: actual
  *    header parse, actual pixel raster, actual W x H recovered;
  *  - audio rows are REAL RIFF/WAVE files encoded and decoded with
  *    `javax.sound.sampled`: actual format negotiation, frame count and
  *    amplitude read from the PCM stream;
  *  - video rows are REAL uncompressed AVI (RIFF 'AVI ') containers —
  *    'DIB ' video stream, 24-bit bottom-up BGR frames — written and
  *    parsed by this module's own minimal RIFF walker (encodeAviFrames /
  *    parseAvi below): actual avih/strh/strf headers, actual '00db'
  *    frame chunks, actual W x H and per-frame rasters recovered. The
  *    JDK has no AVI codec, but the container format is simple enough
  *    that "no codec in the sandbox" no longer excuses fake bytes; a
  *    compressed-codec clip (cinepak/h264 '00dc' chunks) would still
  *    need a real decoder — that single step is the remaining boundary.
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
  val VideoFrames = 6
  val VideoUsPerFrame = 5000000           // 0.2 fps: 6 frames over a 30 s clip

  /** Deterministic synthetic media table derived from `documents` (no real
    * media ships with the testdata): all three kinds are REAL encoded
    * files whose content derives from the text bytes — BMP images, WAVE
    * audio, uncompressed-AVI video. Deterministic — same dir, same table.
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
            Media(id, "video", encodeAvi(base), ImageW, ImageH,
              VideoFrames * (VideoUsPerFrame / 1000))
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

  /** The JDK's own RIFF/WAVE codec, resolved ONCE. The `AudioSystem`
    * entry points (`getAudioInputStream` / `write`) resolve their
    * provider through `JDK13Services.getProviders`, which is a
    * `static synchronized` method that re-runs the ServiceLoader scan on
    * EVERY call — measured at sf0.1: the audio fingerprint stage spent
    * ~60 s of task time lock-serialized on that registry across 32 tasks
    * (1.86 s/task uniform) for ~1 s of actual decode work, capping the
    * whole audio family at single-task throughput however many cores the
    * executor has. These are the same codec classes AudioSystem would
    * hand back (the java.desktop module's WAVE reader/writer, found via
    * the module's `provides` clauses); only the per-call synchronized
    * scan is gone. Provider instances are stateless and thread-safe. */
  private lazy val wavReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
    // probe-order ONCE: in ServiceLoader order the JDK lists
    // SoftMidiAudioFileReader before WaveFileReader, and its rejection
    // path parses the payload as MIDI through MidiSystem.getSequence —
    // which goes back through the static-synchronized JDK13Services
    // registry scan per call (sampled stacks: 3061/3072 thread samples
    // BLOCKED there). Readers that decode a reference WAVE come first,
    // so the hot loop hits the right codec on its first try.
    val probe = encodeWav(Array[Byte](1, 2, 3))
    val (good, rest) = all.partition { r =>
      try { r.getAudioInputStream(new ByteArrayInputStream(probe)).close(); true }
      catch { case _: Exception => false }
    }
    good ++ rest
  }
  private lazy val wavWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .filter(_.isFileTypeSupported(AudioFileFormat.Type.WAVE)).toSeq
  }

  /** AudioSystem.getAudioInputStream without the synchronized per-call
    * provider scan (see [[wavReaders]]). */
  private[operators] def wavInput(payload: Array[Byte]): AudioInputStream = {
    val it = wavReaders.iterator
    while (it.hasNext) {
      try return it.next().getAudioInputStream(new ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "payload is not a decodable audio stream")
  }

  /** AudioSystem.write(…, WAVE, …) without the synchronized per-call
    * provider scan (see [[wavWriters]]). */
  private[operators] def wavWrite(in: AudioInputStream, out: java.io.OutputStream): Unit = {
    require(wavWriters.nonEmpty, "no WAVE writer installed")
    wavWriters.head.write(in, AudioFileFormat.Type.WAVE, out)
    ()
  }

  /** Real RIFF/WAVE encode (javax.sound.sampled): 8 kHz mono 16-bit PCM,
    * samples cycled from the seed bytes. */
  private[graft] def encodeWav(base: Array[Byte]): Array[Byte] = {
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
    wavWrite(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, AudioSamples.toLong),
      out)
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
    val in = wavInput(payload)
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

  // ------------------------------------------------------------------
  // Minimal uncompressed-AVI (RIFF) codec. Layout written and parsed:
  //   RIFF <sz> 'AVI '
  //     LIST 'hdrl' { avih<56>, LIST 'strl' { strh<56 'vids'/'DIB '>,
  //                                           strf<40 BITMAPINFOHEADER> } }
  //     LIST 'movi' { '00db' <stride*h raw bottom-up BGR> ... }
  //     idx1 { 16-byte AVIIF_KEYFRAME entries }
  // Same RIFF chunk grammar the WAVE codec above consumes; frames are the
  // same DIB raster a BMP carries, so a frame round-trips through the BMP
  // helpers for per-frame work.

  private[graft] case class AviClip(
      w: Int, h: Int, usPerFrame: Int, frames: Array[Array[Byte]])

  private def dibStride(w: Int): Int = ((w * 3) + 3) & ~3

  /** Write a well-formed uncompressed AVI from raw bottom-up BGR frames
    * (each exactly dibStride(w)*h bytes). Exact-size single allocation —
    * every chunk size is known up front. */
  private[graft] def encodeAviFrames(
      w: Int, h: Int, frames: Array[Array[Byte]], usPerFrame: Int): Array[Byte] = {
    val stride = dibStride(w)
    val frameSize = stride * h
    require(frames.nonEmpty && frames.forall(_.length == frameSize),
      s"every frame must be exactly $frameSize bytes")
    val n = frames.length
    val strlContent = 4 + (8 + 56) + (8 + 40)
    val hdrlContent = 4 + (8 + 56) + (8 + strlContent)
    val moviContent = 4 + n * (8 + frameSize)
    val idx1Content = 16 * n
    val riffContent = 4 + (8 + hdrlContent) + (8 + moviContent) + (8 + idx1Content)
    val buf = java.nio.ByteBuffer.allocate(8 + riffContent)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fcc("RIFF"); buf.putInt(riffContent); fcc("AVI ")
    fcc("LIST"); buf.putInt(hdrlContent); fcc("hdrl")
    fcc("avih"); buf.putInt(56)
    buf.putInt(usPerFrame)                 // dwMicroSecPerFrame
    buf.putInt(frameSize)                  // dwMaxBytesPerSec (informational)
    buf.putInt(0)                          // dwPaddingGranularity
    buf.putInt(0x10)                       // dwFlags: AVIF_HASINDEX
    buf.putInt(n)                          // dwTotalFrames
    buf.putInt(0)                          // dwInitialFrames
    buf.putInt(1)                          // dwStreams
    buf.putInt(frameSize)                  // dwSuggestedBufferSize
    buf.putInt(w); buf.putInt(h)
    var r = 0; while (r < 4) { buf.putInt(0); r += 1 } // dwReserved[4]
    fcc("LIST"); buf.putInt(strlContent); fcc("strl")
    fcc("strh"); buf.putInt(56)
    fcc("vids"); fcc("DIB ")
    buf.putInt(0)                          // dwFlags
    buf.putInt(0)                          // wPriority + wLanguage
    buf.putInt(0)                          // dwInitialFrames
    buf.putInt(usPerFrame)                 // dwScale   (rate/scale = fps)
    buf.putInt(1000000)                    // dwRate
    buf.putInt(0)                          // dwStart
    buf.putInt(n)                          // dwLength (frames)
    buf.putInt(frameSize)                  // dwSuggestedBufferSize
    buf.putInt(-1)                         // dwQuality (default)
    buf.putInt(0)                          // dwSampleSize
    buf.putShort(0); buf.putShort(0)       // rcFrame left, top
    buf.putShort(w.toShort); buf.putShort(h.toShort)
    fcc("strf"); buf.putInt(40)
    buf.putInt(40)                         // biSize
    buf.putInt(w); buf.putInt(h)           // biWidth, biHeight (bottom-up)
    buf.putShort(1); buf.putShort(24)      // biPlanes, biBitCount
    buf.putInt(0)                          // biCompression = BI_RGB
    buf.putInt(frameSize)                  // biSizeImage
    buf.putInt(0); buf.putInt(0)           // biXPelsPerMeter, biYPelsPerMeter
    buf.putInt(0); buf.putInt(0)           // biClrUsed, biClrImportant
    fcc("LIST"); buf.putInt(moviContent); fcc("movi")
    frames.foreach { fb => fcc("00db"); buf.putInt(frameSize); buf.put(fb) }
    fcc("idx1"); buf.putInt(idx1Content)
    var off = 4
    frames.foreach { _ =>
      fcc("00db"); buf.putInt(0x10)        // AVIIF_KEYFRAME
      buf.putInt(off); buf.putInt(frameSize)
      off += 8 + frameSize
    }
    buf.array()
  }

  /** Synthesize the video payload: VideoFrames rasters whose BGR channels
    * cycle the seed bytes with a per-frame phase (so frames differ but
    * deterministically), wrapped in the AVI container above. */
  private[graft] def encodeAvi(base: Array[Byte]): Array[Byte] = {
    val stride = dibStride(ImageW)
    val frames = Array.tabulate(VideoFrames) { f =>
      val fb = new Array[Byte](stride * ImageH)
      var y = 0
      while (y < ImageH) {
        var x = 0
        while (x < ImageW) {
          val i = y * ImageW + x
          val o = (ImageH - 1 - y) * stride + x * 3
          fb(o)     = base((i * 13 + 11 + 41 * f) % base.length) // B
          fb(o + 1) = base((i * 7 + 3 + 29 * f) % base.length)  // G
          fb(o + 2) = base((i + 17 * f) % base.length)          // R
          x += 1
        }
        y += 1
      }
      fb
    }
    encodeAviFrames(ImageW, ImageH, frames, VideoUsPerFrame)
  }

  /** Real AVI parse: walk the RIFF chunk tree (word-aligned like every
    * RIFF), read W/H and frame timing from avih, collect raw '00db'/'00dc'
    * frame payloads from the movi list. Throws on malformed bytes — a
    * corrupt clip should fail loudly, exactly like decodeImage. */
  private[graft] def parseAvi(payload: Array[Byte]): AviClip = {
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fcc() == "RIFF", "payload is not a RIFF file")
    val riffContent = buf.getInt
    require(fcc() == "AVI ", "RIFF form is not 'AVI '")
    var w = 0; var h = 0; var us = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(end: Int): Unit =
      while (buf.position() + 8 <= end) {
        val id = fcc()
        val sz = buf.getInt
        val dataStart = buf.position()
        val next = dataStart + sz + (sz & 1) // chunks pad to even length
        id match {
          case "LIST" =>
            fcc() // list type (hdrl/strl/movi) — children follow
            walk(dataStart + sz)
          case "avih" =>
            us = buf.getInt
            var skip = 0; while (skip < 7) { buf.getInt; skip += 1 }
            w = buf.getInt; h = buf.getInt
          case "00db" | "00dc" =>
            val fb = new Array[Byte](sz); buf.get(fb); frames += fb
          case _ => () // strh/strf/idx1: not needed for decode
        }
        buf.position(math.min(next, end))
      }
    walk(math.min(8 + riffContent, payload.length))
    require(w > 0 && h > 0 && frames.nonEmpty, "no video stream found in AVI")
    AviClip(w, h, us, frames.toArray)
  }

  /** Real video decode: AVI container parse + raster scan — returns
    * (width, height, mean luminance across every pixel of every frame),
    * the video analogue of decodeImage. */
  private[operators] def decodeVideo(payload: Array[Byte]): (Int, Int, Double) = {
    val clip = parseAvi(payload)
    val stride = dibStride(clip.w)
    var sum = 0.0
    var n = 0L
    clip.frames.foreach { fb =>
      var y = 0
      while (y < clip.h) {
        var x = 0
        while (x < clip.w) {
          val o = y * stride + x * 3 // row order is irrelevant for a mean
          sum += 0.299 * (fb(o + 2) & 0xff) + 0.587 * (fb(o + 1) & 0xff) + 0.114 * (fb(o) & 0xff)
          n += 1
          x += 1
        }
        y += 1
      }
    }
    (clip.w, clip.h, sum / n)
  }

  /** Lift one bottom-up BGR DIB frame into a BufferedImage (for per-frame
    * BMP re-encode / resize work). */
  private def frameImage(w: Int, h: Int, fb: Array[Byte]): BufferedImage = {
    val stride = dibStride(w)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (h - 1 - y) * stride + x * 3
        img.setRGB(x, y,
          ((fb(o + 2) & 0xff) << 16) | ((fb(o + 1) & 0xff) << 8) | (fb(o) & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Kind dispatch — all three kinds decode real bytes now. */
  private[operators] def decode(kind: String, payload: Array[Byte]): (Int, Int, Double) =
    kind match {
      case "image" => decodeImage(payload)
      case "audio" => decodeAudio(payload)
      case "video" => decodeVideo(payload)
      case other   => throw new IllegalArgumentException(s"unknown media kind: $other")
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

  /** Resize: REAL for images AND video — images decode, nearest-neighbor
    * rescale, re-encode as BMP (javax.imageio / headless Graphics2D);
    * video parses the AVI, nearest-neighbor rescales EVERY frame raster,
    * and re-encodes the container at the new dimensions. Audio rows pass
    * through untouched (resize is a spatial op — mangling a WAV container
    * would just break its decoder downstream).
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
        val clip = parseAvi(m.payload)
        val sStride = dibStride(clip.w)
        val dStride = dibStride(w)
        val resized = clip.frames.map { fb =>
          val dst = new Array[Byte](dStride * h)
          var y = 0
          while (y < h) {
            val so0 = (y * clip.h / h) * sStride
            var x = 0
            while (x < w) {
              val so = so0 + (x * clip.w / w) * 3
              val dout = y * dStride + x * 3
              dst(dout) = fb(so); dst(dout + 1) = fb(so + 1); dst(dout + 2) = fb(so + 2)
              x += 1
            }
            y += 1
          }
          dst
        }
        m.copy(payload = encodeAviFrames(w, h, resized, clip.usPerFrame),
          declared_w = w, declared_h = h)
      }
    }
  }

  /** Frame sampling: one row per sampled frame for video rows (explode
    * shape — row multiplicity grows, payload shrinks per frame). REAL
    * decode path: parse the AVI, pick the frame under each `everyMs` tick
    * from the clip's actual frame timing, and emit each sampled raster
    * re-encoded as a standalone BMP — every output row is itself a
    * decodable image, ready for the image-side stages (aHash, resize,
    * feature extract).
    */
  def sampleFrames(media: Dataset[Media], everyMs: Int = 5000): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val clip = parseAvi(m.payload)
      val frameMs = math.max(1, clip.usPerFrame / 1000)
      (0 until math.max(1, m.duration_ms) by everyMs)
        .map(t => math.min(clip.frames.length - 1, t / frameMs))
        .distinct
        .map { idx =>
          val out = new ByteArrayOutputStream()
          ImageIO.write(frameImage(clip.w, clip.h, clip.frames(idx)), "bmp", out)
          Frame(m.media_id, idx, out.toByteArray)
        }
    }
  }

  /** Driver-contract query: full multimodal pass — synthesize, extract,
    * aggregate per kind (payload bytes never leave the executors, only
    * the small per-media feature rows do). decoded_w/h aggregates pin
    * the real codecs: images must all decode to 64x48, audio to
    * 4000 frames x 1 channel.
    */
  def m01MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    // codec work (ImageIO/javax.sound/RIFF decode) is not SQL-expressible,
    // so the per-media feature frame becomes an oracle sidecar (the t17
    // contract): derived doubles are floored to 1e-6 BEFORE the write so
    // the later DECIMAL-routed means are exact in both engines, and the
    // rollup reads the sidecar BACK so Spark and DuckDB aggregate
    // byte-identical inputs.
    val perMedia = extractFeatures(mediaTable(s, dir)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("decoded_w"), col("decoded_h"),
        (floor(col("mean_byte") * 1e6 + 0.5) / 1e6).as("mean_byte"),
        (floor(element_at(col("feature"), 1).cast(DoubleType) * 1e6 + 0.5) / 1e6).as("feat0"))
    graft.Sidecars.write(perMedia, dir, "m01_features")
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("decoded_w")).as("min_dw"), max(col("decoded_w")).as("max_dw"),
        min(col("decoded_h")).as("min_dh"), max(col("decoded_h")).as("max_dh"),
        (floor(Tables.davg(col("mean_byte")) * 1e4 + 0.5) / 1e4).as("avg_mean_byte"),
        (floor(Tables.davg(col("feat0")) * 1e6 + 0.5) / 1e6).as("avg_feat0"))
      .orderBy(col("kind"))
  }

  /** Rollup arithmetic restated over the feature sidecar m01's run wrote —
    * same DECIMAL-sum mean recipe; SUMs cast back to BIGINT because DuckDB
    * widens integer sums. */
  private def m01Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("m01_features")}/*.parquet')
      |SELECT kind, COUNT(*) AS n,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  MIN(decoded_w) AS min_dw, MAX(decoded_w) AS max_dw,
      |  MIN(decoded_h) AS min_dh, MAX(decoded_h) AS max_dh,
      |  FLOOR((CAST(SUM(CAST(mean_byte AS DECIMAL(30,6))) AS DOUBLE) / COUNT(mean_byte)) * 1e4 + 0.5) / 1e4 AS avg_mean_byte,
      |  FLOOR((CAST(SUM(CAST(feat0 AS DECIMAL(30,6))) AS DOUBLE) / COUNT(feat0)) * 1e6 + 0.5) / 1e6 AS avg_feat0
      |FROM side GROUP BY kind ORDER BY kind""".stripMargin

  /** 64-bit average-hash (aHash) over the decoded raster: nearest-neighbor
    * 8x8 grayscale downsample (headless Graphics2D), bit i set iff cell
    * luminance >= the 64-cell mean. The standard cheap perceptual
    * fingerprint: robust to small edits and re-encodes, 8 bytes per image
    * — the image-modality analogue of d05's SimHash.
    */
  private[operators] def aHash(payload: Array[Byte]): Long = {
    val src = ImageIO.read(new ByteArrayInputStream(payload))
    require(src != null, "payload is not a decodable image")
    aHashImage(src)
  }

  /** aHash core over an already-decoded image — shared by the BMP payload
    * path above and the per-frame video path (m05), which lifts raw DIB
    * rasters via [[frameImage]] and must not pay a BMP re-encode/decode
    * round-trip per frame just to hash it. */
  private def aHashImage(src: BufferedImage): Long = {
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
  /** Banded-Hamming near-dup join over a 64-bit fingerprint column
    * (media_id, h) — shared by the image (m03/aHash) and audio
    * (m04/energy-comparison) dedup paths: 8 x 8-bit band bucket keys,
    * only band-bucket collisions verified with exact Hamming <= 7.
    * Pigeonhole: 7 differing bits cannot touch all 8 disjoint bands, so
    * any true pair ALWAYS shares a band — recall is structural. Scale:
    * candidates are band collisions only (random 64-bit fingerprints sit
    * ~32 bits apart); no all-pairs step — d05's shape on binary media.
    *
    * Scale envelope, stated honestly: with the radius fixed at 7, the
    * pigeonhole forces 8 bands of 8 bits, so each band has only 256
    * buckets and candidate volume grows Θ(n²/2^bandBits) once n >> 256
    * — SCALE.md's extended step measures the onset (~2-4x steps past
    * sf0.1 on the media rows). The scale lever is FINGERPRINT WIDTH,
    * not the join shape: a 256-bit pHash at the same relative radius
    * takes 16-bit bands (65536 buckets/band, the same candidate math
    * at 1/256th the density) — the banding code below is width-generic
    * by construction (shift/mask over the band roster). 64-bit
    * fingerprints are this library's pinned oracle contract (DuckDB
    * restates them bit-for-bit); widening is a data-model choice, not
    * an engine rewrite.
    */
  private def bandedHammingPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
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
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("ida"), col("idb"), col("hamming"))
      .orderBy(col("ida"), col("idb"))
  }

  /** The band join + exact-Hamming verify restated in SQL over the
    * fingerprint sidecar the query run materialized. DuckDB's `>>`/`&`/
    * `xor`/`bit_count` all use two's-complement BIGINT semantics, matching
    * Spark's — verified on negative hash values. */
  private def bandedHammingSql(name: String, maxHamming: Int): String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath(name)}/*.parquet'),
      |banded AS (
      |  SELECT media_id, h, g.b AS band, (h >> (g.b * 8)) & 255 AS bucket
      |  FROM side, unnest(generate_series(0, 7)) AS g(b)),
      |pairs AS (
      |  SELECT DISTINCT a.media_id AS ida, a.h AS ha, b.media_id AS idb, b.h AS hb
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.media_id < b.media_id)
      |SELECT ida, idb, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      |FROM pairs WHERE bit_count(xor(ha, hb)) <= $maxHamming
      |ORDER BY ida, idb""".stripMargin

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
    // the codec step (BMP decode + aHash) ends here; the fingerprint frame
    // becomes the oracle sidecar and the band join reads it back, so the
    // DuckDB restatement audits the ENTIRE retrieval stage over identical
    // fingerprints
    bandedHammingPairs(graft.Sidecars.write(hashed, dir, "m03_ahash"), maxHamming = 7)
  }

  /** 64-bit energy-comparison audio fingerprint over the REAL decoded PCM
    * stream (javax.sound header parse + sample read): the 16-bit LE
    * samples split into 65 time windows, per-window energy = sum |s|, bit
    * i set iff energy(i) > energy(i+1). Comparing CONSECUTIVE window
    * energies (the Chromaprint/Shazam-family trick, minus the FFT the
    * sandbox has no library for) makes the fingerprint invariant to
    * uniform gain — scaling every sample scales every window energy by
    * the same factor, so no comparison flips; only the re-quantization
    * noise of the integer samples moves near-equal windows. The audio
    * analogue of m03's aHash.
    */
  private[graft] def audioFingerprint(payload: Array[Byte]): Long = {
    val in = wavInput(payload)
    val bytes = try in.readAllBytes() finally in.close()
    val n = bytes.length / 2
    val windows = 65
    // EQUAL-size windows (remainder samples dropped): with ragged windows
    // the size difference dominates the energy comparison for periodic
    // signals (cycled synthetic PCM), collapsing many docs onto one
    // fingerprint; equal windows make the bits track actual content.
    val winSize = n / windows
    require(winSize > 0, s"audio too short to fingerprint: $n PCM frames")
    val energy = new Array[Double](windows)
    var w = 0
    while (w < windows) {
      var i = w * winSize
      val end = i + winSize
      while (i < end) {
        val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
        energy(w) += math.abs(s.toDouble)
        i += 1
      }
      w += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      if (energy(b) > energy(b + 1)) bits |= (1L << b)
      b += 1
    }
    bits
  }

  /** Gain edit used to PLANT audio near-duplicates: decode the PCM, scale
    * every sample by `gain` (attenuation — never clips), re-encode with
    * the same format. A gain change preserves every window-energy
    * comparison up to integer re-quantization noise, so the twin's
    * fingerprint sits a handful of borderline bits away at worst — well
    * inside the Hamming <= 7 verify budget.
    */
  private[graft] def scaleWav(payload: Array[Byte], gain: Double): Array[Byte] = {
    val in = wavInput(payload)
    val fmt = in.getFormat
    val bytes = try in.readAllBytes() finally in.close()
    val n = bytes.length / 2
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
      val scaled = math.max(-32768, math.min(32767, math.round(s * gain))).toInt
      bytes(2 * i) = (scaled & 0xff).toByte
      bytes(2 * i + 1) = ((scaled >> 8) & 0xff).toByte
      i += 1
    }
    val out = new ByteArrayOutputStream()
    wavWrite(
      new AudioInputStream(new ByteArrayInputStream(bytes), fmt, n.toLong),
      out)
    out.toByteArray
  }

  /** Driver-contract query: audio near-dup dedup via banded energy
    * fingerprints — m03's retrieval audit for the audio modality. Each
    * audio-kind document gets a gain-scaled twin (media_id + 1,000,000);
    * both are fingerprinted through the REAL WAVE decode, banded 8 x 8
    * bits, and band collisions verified with exact Hamming <= 3. The
    * budget is measured, not guessed: across sf0.001-0.1 a 0.95 gain
    * twin sits <= 2 bits away (re-quantization noise only) while
    * different-text docs sit >= 6 apart — except exact-duplicate texts
    * (identical WAV bytes, Hamming 0), which a dedup operator SHOULD
    * return. Round6OpsSpec asserts the exact planted set at sf0.001
    * (which has no same-text pair in this residue class). The WAVE
    * decode + fingerprint lands in an oracle sidecar; the band join is
    * hash-audited in SQL over it (bandedHammingSql).
    */
  def m04AudioDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fused pass over the audio-kind documents (doc_id % 3 == 1), same
    // rationale as m03: encode once, scale once, fingerprint both
    val hashed = Tables.spread(Tables.documents(s, dir))
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        val orig = encodeWav(base)
        Seq((id, audioFingerprint(orig)),
          (id + 1000000L, audioFingerprint(scaleWav(orig, 0.95))))
      })
      .toDF("media_id", "h")
    bandedHammingPairs(graft.Sidecars.write(hashed, dir, "m04_audiofp"), maxHamming = 3)
  }

  // ---------------------------------------------------------------- m07
  /** Spectral (DFT) audio fingerprint — the frequency-domain tier above
    * m04's time-domain energies, and the audio analogue of m06's DCT
    * pHash: the PCM stream splits into 65 equal windows; per window a
    * direct DFT (own implementation — the container ships no FFT
    * library) evaluates bins 1..4, and bit w compares CONSECUTIVE
    * windows' low-band spectral energy — m04's adjacent-comparison
    * structure (the discriminative part) applied to a spectral quantity
    * instead of a time-domain one. (A per-window low-vs-high tilt
    * variant was measured first: twins at Hamming 0 but 36 impostor
    * ZERO-collisions in 160 clips — the tilt bit is corpus-correlated;
    * adjacent comparisons decorrelate because they difference out the
    * clip-global spectrum.)
    *
    * Invariance class this buys over m04: bins k >= 1 receive ZERO
    * projection from a constant sample offset, so the fingerprint is
    * structurally invariant to DC bias (the recording-hardware offset a
    * time-domain |sample| energy is NOT invariant to), and energy
    * comparisons are gain-invariant like m04. Cost: 65 windows x 4 bins
    * x winSize multiply-adds with a precomputed twiddle table per clip.
    */
  private[graft] def spectralFingerprint(payload: Array[Byte]): Long = {
    val in = wavInput(payload)
    val bytes = try in.readAllBytes() finally in.close()
    val n = bytes.length / 2
    val windows = 65
    val winSize = n / windows
    require(winSize > 0, s"audio too short to fingerprint: $n PCM frames")
    // twiddle table: cos/sin for bins 1..4 over one window
    val cosT = Array.ofDim[Double](4, winSize)
    val sinT = Array.ofDim[Double](4, winSize)
    var k = 0
    while (k < 4) {
      var i = 0
      while (i < winSize) {
        val ang = -2.0 * math.Pi * (k + 1) * i / winSize
        cosT(k)(i) = math.cos(ang)
        sinT(k)(i) = math.sin(ang)
        i += 1
      }
      k += 1
    }
    val energy = new Array[Double](windows)
    var w = 0
    while (w < windows) {
      var lo = 0.0
      k = 0
      while (k < 4) {
        var re = 0.0
        var im = 0.0
        var i = 0
        while (i < winSize) {
          val idx = w * winSize + i
          val s = (((bytes(2 * idx + 1) << 8) | (bytes(2 * idx) & 0xff)).toShort).toDouble
          re += s * cosT(k)(i)
          im += s * sinT(k)(i)
          i += 1
        }
        lo += re * re + im * im
        k += 1
      }
      energy(w) = lo
      w += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      if (energy(b) > energy(b + 1)) bits |= (1L << b)
      b += 1
    }
    bits
  }

  /** DC-bias edit used to PLANT spectral near-duplicates: add a constant
    * +128 to every 16-bit sample (encodeWav samples top out at 32512, so
    * the shift never clips — clipping is the nonlinearity that would
    * leak into the spectrum, the same lesson as m06's clamp finding).
    * Every sample changes; bins k >= 1 are structurally unmoved. */
  private[graft] def offsetWav(payload: Array[Byte], offset: Int): Array[Byte] = {
    val in = wavInput(payload)
    val fmt = in.getFormat
    val bytes = try in.readAllBytes() finally in.close()
    val n = bytes.length / 2
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
      val shifted = math.max(-32768, math.min(32767, s + offset))
      bytes(2 * i) = (shifted & 0xff).toByte
      bytes(2 * i + 1) = ((shifted >> 8) & 0xff).toByte
      i += 1
    }
    val out = new ByteArrayOutputStream()
    wavWrite(
      new AudioInputStream(new ByteArrayInputStream(bytes), fmt, n.toLong),
      out)
    out.toByteArray
  }

  /** Driver-contract query: audio near-dup dedup via banded SPECTRAL
    * fingerprints — m04's retrieval shape with the DFT signature and a
    * DC-bias twin the time-domain fingerprint could not absorb. Same
    * fused synthesis pass; fingerprints land in the m07_spectralfp
    * sidecar and the band join + exact Hamming verify is hash-audited
    * in SQL over it. */
  def m07SpectralAudioDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.spread(Tables.documents(s, dir))
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        val orig = encodeWav(base)
        Seq((id, spectralFingerprint(orig)),
          (id + 1000000L, spectralFingerprint(offsetWav(orig, 128))))
      })
      .toDF("media_id", "h")
    bandedHammingPairs(graft.Sidecars.write(hashed, dir, "m07_spectralfp"), maxHamming = 3)
  }

  /** Single-frame watermark edit used to PLANT video near-duplicates:
    * parse the AVI, brighten the top-left 8x6 visual block of frame 2 by
    * +16 per channel (the m03 perturbation applied to ONE frame's DIB
    * raster — bottom-up, so the top rows are the last stride rows), and
    * re-encode the container. 5 of 6 frames stay byte-identical; the
    * edited frame's aHash moves at most a few borderline bits. */
  private[graft] def perturbAvi(payload: Array[Byte]): Array[Byte] = {
    val clip = parseAvi(payload)
    val stride = dibStride(clip.w)
    val frames = clip.frames.map(_.clone())
    val fb = frames(2 % frames.length)
    var y = 0
    while (y < 6) {
      val row = (clip.h - 1 - y) * stride
      var x = 0
      while (x < 8) {
        val o = row + x * 3
        var c = 0
        while (c < 3) {
          fb(o + c) = math.min(255, (fb(o + c) & 0xff) + 16).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodeAviFrames(clip.w, clip.h, frames, clip.usPerFrame)
  }

  /** Per-frame aHash signature of a clip — the keyframe-fingerprint
    * column a video index stores (frame_idx, 64-bit hash). */
  private[graft] def videoFrameHashes(payload: Array[Byte]): Seq[(Int, Long)] = {
    val clip = parseAvi(payload)
    clip.frames.iterator.zipWithIndex
      .map { case (fb, i) => (i, aHashImage(frameImage(clip.w, clip.h, fb))) }
      .toSeq
  }

  /** Driver-contract query: video near-dup dedup via TEMPORALLY-ALIGNED
    * per-frame aHashes — the keyframe-signature approach production video
    * dedup uses (hash sampled frames, match aligned hash sequences), on
    * top of the repo's own AVI codec. Each video-kind document gets a
    * single-frame-watermarked twin (media_id + 1,000,000); every frame of
    * both is aHashed through the REAL RIFF parse, frame hashes band 8 x 8
    * bits, and candidates are (frame_idx, band, bucket) collisions —
    * aligned frames only, so a 6-frame clip can never match another clip
    * via temporally scrambled content. Verify: exact Hamming <= 7 per
    * aligned frame, and a PAIR verdict only when >= 4 of 6 frames are
    * close — the sequence-level majority that makes one coincidentally
    * similar frame insufficient. Planted twins pass 5 frames at Hamming 0
    * plus the edited frame; unrelated clips share no band buckets at all.
    *
    * Scale: fingerprints are one map pass over the video rows (codec work
    * never shuffles); the band join is frame-aligned bucket collisions
    * only; the verdict rollup keys on (ida, idb) pairs that already
    * collided. The frame-hash frame is the oracle sidecar; banding,
    * Hamming, and the majority rollup are restated in SQL over it.
    */
  def m05VideoDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fused pass over the video-kind documents (doc_id % 3 == 2), same
    // rationale as m03/m04: encode once, perturb once, hash all frames
    val hashed = Tables.spread(Tables.documents(s, dir))
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        val orig = encodeAvi(base)
        videoFrameHashes(orig).map { case (f, h) => (id, f, h) } ++
          videoFrameHashes(perturbAvi(orig)).map { case (f, h) => (id + 1000000L, f, h) }
      })
      .toDF("media_id", "frame_idx", "h")
    val side = graft.Sidecars.write(hashed, dir, "m05_videofp")
    val banded = side.select(col("media_id"), col("frame_idx"), col("h"), explode(expr(
        "transform(sequence(0, 7), b -> named_struct('band', b, 'bucket', (h >> (b * 8)) & 255))")).as("bb"))
      .select(col("media_id"), col("frame_idx"), col("h"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val framePairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.frame_idx") === col("b.frame_idx") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("ida"), col("b.media_id").as("idb"),
        col("a.frame_idx").as("frame_idx"), col("a.h").as("ha"), col("b.h").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= 7)
    framePairs.groupBy(col("ida"), col("idb"))
      .agg(count(lit(1)).as("n_close_frames"),
        sum(col("hamming")).cast(LongType).as("total_hamming"))
      .filter(col("n_close_frames") >= 4)
      .orderBy(col("ida"), col("idb"))
  }

  /** Frame-aligned banding + Hamming verify + majority rollup restated
    * over the frame-hash sidecar. */
  private def m05Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("m05_videofp")}/*.parquet'),
      |banded AS (
      |  SELECT media_id, frame_idx, h, g.b AS band, (h >> (g.b * 8)) & 255 AS bucket
      |  FROM side, unnest(generate_series(0, 7)) AS g(b)),
      |fp AS (
      |  SELECT DISTINCT a.media_id AS ida, b.media_id AS idb, a.frame_idx,
      |    a.h AS ha, b.h AS hb
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.frame_idx = b.frame_idx
      |    AND a.media_id < b.media_id),
      |close_f AS (
      |  SELECT ida, idb, frame_idx, bit_count(xor(ha, hb)) AS hamming
      |  FROM fp WHERE bit_count(xor(ha, hb)) <= 7)
      |SELECT ida, idb, COUNT(*) AS n_close_frames,
      |  CAST(SUM(hamming) AS BIGINT) AS total_hamming
      |FROM close_f GROUP BY ida, idb HAVING COUNT(*) >= 4
      |ORDER BY ida, idb""".stripMargin

  /** Driver-contract query: frame-sampling multiplicity stats. The AVI
    * parse + per-frame BMP re-encode is the non-SQL step, so the sampled
    * per-frame (media_id, frame_idx, n_bytes) table is the sidecar; the
    * two-level rollup is integer-exact SQL over it. */
  def m02FrameSample(s: SparkSession, dir: String): DataFrame = {
    val perFrame = sampleFrames(mediaTable(s, dir)).toDF()
      .select(col("media_id"), col("frame_idx"),
        length(col("frame_bytes")).as("n_bytes"))
    graft.Sidecars.write(perFrame, dir, "m02_frames")
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"),
        sum(col("n_bytes")).as("sampled_bytes"))
      .groupBy(col("n_frames")).agg(count(lit(1)).as("n_videos"),
        min(col("sampled_bytes")).as("min_bytes"), max(col("sampled_bytes")).as("max_bytes"))
      .orderBy(col("n_frames"))
  }

  private def m02Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("m02_frames")}/*.parquet'),
      |per_media AS (
      |  SELECT media_id, COUNT(*) AS n_frames,
      |    CAST(SUM(n_bytes) AS BIGINT) AS sampled_bytes
      |  FROM side GROUP BY media_id)
      |SELECT n_frames, COUNT(*) AS n_videos,
      |  MIN(sampled_bytes) AS min_bytes, MAX(sampled_bytes) AS max_bytes
      |FROM per_media GROUP BY n_frames ORDER BY n_frames""".stripMargin

  // ---------------------------------------------------------------- m06
  /** 32-point DCT-II basis, precomputed once: cos(pi/32 * (n + 0.5) * k).
    * Only the first 8 frequencies of each dimension are ever read. */
  private val DctCos: Array[Array[Double]] =
    Array.tabulate(32, 32)((k, n) => math.cos(math.Pi / 32.0 * (n + 0.5) * k))

  /** 64-bit DCT perceptual hash (pHash) — the SPECTRAL image fingerprint
    * one tier above m03's aHash: 32x32 grayscale downsample, separable
    * 2-D DCT-II, keep the top-left 8x8 low-frequency block, threshold
    * each AC coefficient against the MEDIAN of the 63 AC terms (bit 0,
    * the DC slot, stays 0). Two structural robustness properties aHash
    * lacks: high-frequency content (noise, sharpening, dithering) lands
    * in DCT bins the 8x8 block never reads, and the median threshold
    * fixes the popcount at ~31 regardless of the image's tonal
    * distribution, so hash distances are comparable across light and
    * dark images. Cost: 2 x (32x32x8) multiply-adds per image —
    * separable rows-then-columns, computing only the 8 needed output
    * frequencies per dimension, not all 32.
    */
  private[operators] def pHash(payload: Array[Byte]): Long = {
    val src = ImageIO.read(new ByteArrayInputStream(payload))
    require(src != null, "payload is not a decodable image")
    val dst = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try g.drawImage(src, 0, 0, 32, 32, null) finally g.dispose()
    val lum = Array.ofDim[Double](32, 32)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val rgb = dst.getRGB(x, y)
        lum(y)(x) = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val rows = Array.ofDim[Double](32, 8) // row-wise DCT, 8 output freqs
    y = 0
    while (y < 32) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var x = 0
        while (x < 32) { acc += lum(y)(x) * DctCos(v)(x); x += 1 }
        rows(y)(v) = acc
        v += 1
      }
      y += 1
    }
    val d = Array.ofDim[Double](8, 8) // column-wise DCT over the row outputs
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < 32) { acc += rows(yy)(v) * DctCos(u)(yy); yy += 1 }
        d(u)(v) = acc
        v += 1
      }
      u += 1
    }
    val ac = new Array[Double](63)
    var i = 1
    while (i < 64) { ac(i - 1) = d(i / 8)(i % 8); i += 1 }
    java.util.Arrays.sort(ac)
    val median = ac(31)
    var bits = 0L
    i = 1
    while (i < 64) { if (d(i / 8)(i % 8) > median) bits |= (1L << i); i += 1 }
    bits
  }

  /** Contrast-reduction edit used to PLANT pHash near-duplicates:
    * v' = 128 + (v - 128) * 3/4 per channel — the re-encode-at-lower-
    * contrast transform every pixel of the image undergoes. Chosen
    * deliberately CLAMP-FREE (range [32, 223]): an affine luminance map
    * scales every DCT coefficient AND the AC median by the same factor,
    * so each `coef > median` comparison is preserved exactly and the
    * only hash movement comes from per-channel integer rounding (<= 1
    * luminance unit of high-frequency noise against AC coefficients
    * hundreds of units wide) — a measured 0–5 bits against the
    * Hamming <= 7 budget. (A +/-8 checkerboard variant was measured to
    * leak up to 8 bits: channel CLAMPING rectifies symmetric noise into
    * content-dependent low-frequency energy. Nonlinearity, not
    * frequency, is what moves a spectral hash.) */
  private[operators] def perturbContrast(payload: Array[Byte]): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(payload))
    require(src != null, "payload is not a decodable image")
    def sq(v: Int): Int = 128 + ((v - 128) * 3) / 4
    var y = 0
    while (y < src.getHeight) {
      var x = 0
      while (x < src.getWidth) {
        val rgb = src.getRGB(x, y)
        src.setRGB(x, y,
          (sq((rgb >> 16) & 0xff) << 16) | (sq((rgb >> 8) & 0xff) << 8) | sq(rgb & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(src, "bmp", out)
    out.toByteArray
  }

  /** Driver-contract query: image near-dup dedup via banded DCT pHash
    * with a TWO-VIEW verify — the production near-dup shape for media:
    * a cheap banded shortlist (8 x 8-bit pHash bands, bucket-collision
    * candidates, structural pigeonhole recall at <= 7 bits), then a
    * verify stage that demands agreement from TWO independent
    * fingerprints (spectral pHash <= 7 AND spatial aHash <= 7). The
    * conjunction exists because one 64-bit perceptual hash is NOT a
    * verifier: measured on this corpus, cross-image pHash distances dip
    * to 6 (tiled synthetic rasters share low-frequency structure, so
    * impostor pairs overlap the twin budget), while a genuine re-encode
    * twin passes BOTH views and an impostor would need a simultaneous
    * double collision of two fingerprints built from disjoint evidence
    * (8x8 frequency block vs 8x8 spatial grid). Same fused synthesis
    * pass as m03 (encode once, perturb once, hash both); both
    * fingerprints go to the m06_phash sidecar so the DuckDB oracle
    * audits the entire shortlist + two-view verify over identical bits.
    */
  def m06ImagePhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.spread(Tables.documents(s, dir))
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        val orig = encodeBmp(base)
        val twin = perturbContrast(orig)
        Seq((id, pHash(orig), aHash(orig)),
          (id + 1000000L, pHash(twin), aHash(twin)))
      })
      .toDF("media_id", "h", "a")
    val side = graft.Sidecars.write(hashed, dir, "m06_phash")
    // shortlist on the pHash bands only; verify on both fingerprints
    val banded = side.select(col("media_id"), col("h"), col("a"), explode(expr(
        "transform(sequence(0, 7), b -> named_struct('band', b, 'bucket', (h >> (b * 8)) & 255))")).as("bb"))
      .select(col("media_id"), col("h"), col("a"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("ida"), col("x.h").as("ha"), col("x.a").as("aa"),
        col("y.media_id").as("idb"), col("y.h").as("hb"), col("y.a").as("ab"))
      .distinct()
      .withColumn("ph_hamming", expr("bit_count(ha ^ hb)").cast(LongType))
      .withColumn("ah_hamming", expr("bit_count(aa ^ ab)").cast(LongType))
      .filter(col("ph_hamming") <= 7 && col("ah_hamming") <= 7)
      .select(col("ida"), col("idb"), col("ph_hamming"), col("ah_hamming"))
      .orderBy(col("ida"), col("idb"))
  }

  /** The pHash band shortlist + two-view verify restated over the
    * sidecar's (media_id, h, a) fingerprints. */
  private def m06Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("m06_phash")}/*.parquet'),
      |banded AS (
      |  SELECT media_id, h, a, g.b AS band, (h >> (g.b * 8)) & 255 AS bucket
      |  FROM side, unnest(generate_series(0, 7)) AS g(b)),
      |pairs AS (
      |  SELECT DISTINCT x.media_id AS ida, x.h AS ha, x.a AS aa,
      |    y.media_id AS idb, y.h AS hb, y.a AS ab
      |  FROM banded x JOIN banded y
      |    ON x.band = y.band AND x.bucket = y.bucket AND x.media_id < y.media_id)
      |SELECT ida, idb,
      |  CAST(bit_count(xor(ha, hb)) AS BIGINT) AS ph_hamming,
      |  CAST(bit_count(xor(aa, ab)) AS BIGINT) AS ah_hamming
      |FROM pairs
      |WHERE bit_count(xor(ha, hb)) <= 7 AND bit_count(xor(aa, ab)) <= 7
      |ORDER BY ida, idb""".stripMargin

  // ---------------------------------------------------------------- m10
  /** Driver-contract query: image near-dup dedup over a 128-BIT
    * fingerprint with 16-BIT bands — the WIDTH LEVER the 64-bit rows'
    * scale note names, exercised end to end. The fingerprint
    * concatenates the two independent 64-bit views the m06 verify
    * already computes (spectral pHash ‖ spatial aHash); at the same
    * absolute radius (combined Hamming <= 7) the pigeonhole still
    * needs only 8 disjoint bands, so each band WIDENS from 8 to 16
    * bits: 65,536 buckets per band instead of 256. Candidate volume is
    * Θ(n²/bandBuckets) for the random non-dup mass, so the 128-bit
    * shape carries 256x more corpus before band saturation — the
    * quadratic onset SCALE.md measured past sf0.1 on the 64-bit rows
    * moves two orders of magnitude out, with the SAME join shape
    * (shift/mask band keys, bucket-collision shortlist, exact popcount
    * verify). Recall stays structural: 7 flips across 128 bits cannot
    * touch all 8 bands. Same fused synthesis as m06 (encode once,
    * perturb once, hash both views); both longs land in the sidecar so
    * DuckDB restates shortlist AND verify bit-for-bit. */
  def m10WideFingerprintDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.spread(Tables.documents(s, dir))
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        val orig = encodeBmp(base)
        val twin = perturbContrast(orig)
        Seq((id, pHash(orig), aHash(orig)),
          (id + 1000000L, pHash(twin), aHash(twin)))
      })
      .toDF("media_id", "h0", "h1")
    val side = graft.Sidecars.write(hashed, dir, "m10_wide")
    // 8 bands x 16 bits over the 128-bit concatenation: bands 0-3 from
    // h0, 4-7 from h1 — the width-generic shift/mask roster
    val banded = side.select(col("media_id"), col("h0"), col("h1"), explode(expr(
        "transform(sequence(0, 7), b -> named_struct('band', b, 'bucket', " +
          "CASE WHEN b < 4 THEN (h0 >> (b * 16)) & 65535 " +
          "ELSE (h1 >> ((b - 4) * 16)) & 65535 END))")).as("bb"))
      .select(col("media_id"), col("h0"), col("h1"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("ida"), col("x.h0").as("h0a"), col("x.h1").as("h1a"),
        col("y.media_id").as("idb"), col("y.h0").as("h0b"), col("y.h1").as("h1b"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(h0a ^ h0b) + bit_count(h1a ^ h1b)").cast(LongType))
      .filter(col("hamming") <= 7)
      .select(col("ida"), col("idb"), col("hamming"))
      .orderBy(col("ida"), col("idb"))
  }

  /** The 16-bit band shortlist + 128-bit popcount verify restated over
    * the (h0, h1) sidecar. */
  private def m10Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("m10_wide")}/*.parquet'),
      |banded AS (
      |  SELECT media_id, h0, h1, g.b AS band,
      |    CASE WHEN g.b < 4 THEN (h0 >> (g.b * 16)) & 65535
      |         ELSE (h1 >> ((g.b - 4) * 16)) & 65535 END AS bucket
      |  FROM side, unnest(generate_series(0, 7)) AS g(b)),
      |pairs AS (
      |  SELECT DISTINCT x.media_id AS ida, x.h0 AS h0a, x.h1 AS h1a,
      |    y.media_id AS idb, y.h0 AS h0b, y.h1 AS h1b
      |  FROM banded x JOIN banded y
      |    ON x.band = y.band AND x.bucket = y.bucket AND x.media_id < y.media_id)
      |SELECT ida, idb,
      |  CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS BIGINT) AS hamming
      |FROM pairs
      |WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 7
      |ORDER BY ida, idb""".stripMargin

  // ---------------------------------------------------------------- m08
  /** One scene raster from a seed — encodeAvi's f=0 pixel mapping with a
    * uniform brightness offset per frame (NO per-frame phase scramble:
    * scenes must be temporally coherent for shot structure to exist).
    * Seed bytes are ASCII (< 124) so jitter <= +10 never clamps. */
  private def sceneFrame(seed: Array[Byte], jitter: Int): Array[Byte] = {
    val stride = dibStride(ImageW)
    val fb = new Array[Byte](stride * ImageH)
    var y = 0
    while (y < ImageH) {
      var x = 0
      while (x < ImageW) {
        val i = y * ImageW + x
        val o = (ImageH - 1 - y) * stride + x * 3
        fb(o)     = (((seed((i * 13 + 11) % seed.length) & 0xff) + jitter) min 255).toByte
        fb(o + 1) = (((seed((i * 7 + 3) % seed.length) & 0xff) + jitter) min 255).toByte
        fb(o + 2) = (((seed(i % seed.length) & 0xff) + jitter) min 255).toByte
        x += 1
      }
      y += 1
    }
    fb
  }

  /** Driver-contract query: video SHOT-BOUNDARY (scene cut) detection —
    * the segmentation step a video-curation pipeline runs before
    * keyframe sampling (sample per shot, not per clip): consecutive
    * frames' aHash Hamming distance, a cut wherever it jumps past the
    * threshold (16 of 64 bits — between the measured within-shot bound
    * and the ~32-bit distance of unrelated rasters).
    *
    * Clips are spliced to PLANT shot structure through the real codec:
    * even-id videos carry two scenes (frames 0-2 from the doc raster,
    * 3-5 from the reversed-seed raster — different content), odd-id
    * videos are single-scene; within a scene, frames differ by a
    * uniform brightness offset, which mean-thresholded aHash is
    * invariant to (the same affine-invariance argument as m06's DCT
    * bits) — so expected output is exactly one cut at frame 3 for
    * even ids, zero cuts for odd ids, which MultimodalSpec pins.
    *
    * Scale: per-frame hashing is the m05 map-only codec pass; cut
    * detection is a LAG window PARTITIONED BY media_id (state = one
    * clip's frames, never global); the rollup is one media-keyed
    * aggregation. The frame-hash table is the oracle sidecar; LAG +
    * xor + threshold + rollup are restated in SQL over it.
    */
  def m08SceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.spread(Tables.documents(s, dir))
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        // scene B = luminance inversion of scene A: every relative
        // ordering flips, so the spliced boundary moves ~all 64 aHash
        // bits — far above the 16-bit cut threshold by construction
        // (reversing the byte stream is NOT enough: word-soup rasters
        // have such uniform block statistics that a reversed copy can
        // land within a few aHash bits of the original)
        val inv = base.map(b => (255 - (b & 0xff)).toByte)
        val frames = Array.tabulate(VideoFrames) { f =>
          val seed = if (id % 2 == 0 && f >= VideoFrames / 2) inv else base
          sceneFrame(seed, 2 * f)
        }
        (id, encodeAviFrames(ImageW, ImageH, frames, VideoUsPerFrame))
      }.flatMap { case (id, payload) =>
        videoFrameHashes(payload).map { case (fi, h) => (id, fi, h) }
      })
      .toDF("media_id", "frame_idx", "h")
    val side = graft.Sidecars.write(hashed, dir, "m08_scenefp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    side.withColumn("prev", lag(col("h"), 1).over(w))
      .withColumn("adj", expr("bit_count(h ^ prev)"))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("adj") >= 16, 1L).otherwise(0L)).as("n_cuts"),
        min(when(col("adj") >= 16, col("frame_idx"))).as("first_cut_idx"),
        max(coalesce(col("adj"), lit(0))).cast(LongType).as("max_adj_hamming"))
      .orderBy(col("media_id"))
  }

  /** LAG + xor + threshold + per-clip rollup restated over the
    * frame-hash sidecar. */
  private def m08Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("m08_scenefp")}/*.parquet'),
      |adj AS (
      |  SELECT media_id, frame_idx,
      |    bit_count(xor(h, LAG(h) OVER (PARTITION BY media_id ORDER BY frame_idx))) AS adj
      |  FROM side)
      |SELECT media_id, COUNT(*) AS n_frames,
      |  CAST(SUM(CASE WHEN adj >= 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
      |  MIN(CASE WHEN adj >= 16 THEN frame_idx END) AS first_cut_idx,
      |  CAST(MAX(COALESCE(adj, 0)) AS BIGINT) AS max_adj_hamming
      |FROM adj GROUP BY media_id ORDER BY media_id""".stripMargin

  /** Hot-gain edit used to PLANT clipping: multiply every 16-bit sample
    * by `gain`, clamped to the int16 rails — the nonlinearity a real
    * over-driven recording carries. encodeWav's space characters sit at
    * -24576, so gain 3 drives them (and everything below char 85) into
    * the -32768 rail; lowercase letters stay linear. */
  private[graft] def gainWav(payload: Array[Byte], gain: Int): Array[Byte] = {
    val in = wavInput(payload)
    val fmt = in.getFormat
    val bytes = try in.readAllBytes() finally in.close()
    val n = bytes.length / 2
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
      val amped = math.max(-32768, math.min(32767, s.toInt * gain))
      bytes(2 * i) = (amped & 0xff).toByte
      bytes(2 * i + 1) = ((amped >> 8) & 0xff).toByte
      i += 1
    }
    val out = new ByteArrayOutputStream()
    wavWrite(
      new AudioInputStream(new ByteArrayInputStream(bytes), fmt, n.toLong),
      out)
    out.toByteArray
  }

  // ---------------------------------------------------------------- m09
  /** Driver-contract query: audio QUALITY audit — the signal-integrity
    * gate an audio-corpus pipeline runs before transcription/training:
    * per clip, sample count, peak amplitude, CLIPPED-sample count
    * (samples pinned at the int16 rails — the distortion signature of
    * over-driven input), RMS level, and DC offset. Each audio document
    * ships with a planted hot twin (gain x3, media_id + 1,000,000)
    * whose space-character samples genuinely clip, so the audit has a
    * real positive class; originals clip nowhere (encodeWav peaks at
    * -24576 > -32768), which MultimodalSpec pins.
    *
    * Exactness: everything integer — peak/clip counts are int64, the
    * squared-sum fits int64 (32768^2 * samples ~ 1e9 * 1e4 at any
    * clip length here; a production run routes it DECIMAL past ~8e9
    * samples/clip), and the two published derived levels (RMS, DC)
    * are one correctly-rounded division (+ IEEE sqrt for RMS) then
    * floor — deterministic cross-engine (p26's rule; sqrt is
    * correctly rounded everywhere, the same reason p26 chose tau=0.5).
    *
    * Scale: one map-only REAL decode pass (javax.sound) emitting the
    * per-clip stat row to the sidecar; the oracle recomputes the
    * derived levels and the rails audit in SQL over it. No shuffle at
    * all beyond the presentation sort.
    */
  def m09AudioQa(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stats = Tables.spread(Tables.documents(s, dir))
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        val orig = encodeWav(base)
        def audit(payload: Array[Byte]): (Long, Long, Long, Long, Long) = {
          val in = wavInput(payload)
          val bytes = try in.readAllBytes() finally in.close()
          val n = bytes.length / 2
          var i = 0; var peak = 0L; var clipped = 0L; var sumSq = 0L; var sumPcm = 0L
          while (i < n) {
            val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toLong
            if (math.abs(v) > peak) peak = math.abs(v)
            if (v == 32767L || v == -32768L) clipped += 1
            sumSq += v * v
            sumPcm += v
            i += 1
          }
          (n.toLong, peak, clipped, sumSq, sumPcm)
        }
        val a = audit(orig)
        val b = audit(gainWav(orig, 3))
        Seq((id, a._1, a._2, a._3, a._4, a._5),
          (id + 1000000L, b._1, b._2, b._3, b._4, b._5))
      })
      .toDF("media_id", "n_samples", "peak", "n_clipped", "sum_sq", "sum_pcm")
    graft.Sidecars.write(stats, dir, "m09_audiostats")
      .withColumn("clip_ppm", expr("(n_clipped * 1000000) div n_samples"))
      .withColumn("rms_milli", floor(sqrt(
        col("sum_sq").cast(DoubleType) / col("n_samples").cast(DoubleType)) * 1e3).cast(LongType))
      .withColumn("dc_milli", floor(
        col("sum_pcm").cast(DoubleType) / col("n_samples").cast(DoubleType) * 1e3).cast(LongType))
      .select(col("media_id"), col("n_samples"), col("peak"), col("n_clipped"),
        col("clip_ppm"), col("rms_milli"), col("dc_milli"))
      .orderBy(col("media_id"))
  }

  /** Rails audit + derived levels restated over the stat sidecar. */
  private def m09Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("m09_audiostats")}/*.parquet')
      |SELECT media_id, n_samples, peak, n_clipped,
      |  (n_clipped * 1000000) // n_samples AS clip_ppm,
      |  CAST(FLOOR(SQRT(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)) * 1e3) AS BIGINT) AS rms_milli,
      |  CAST(FLOOR(CAST(sum_pcm AS DOUBLE) / CAST(n_samples AS DOUBLE) * 1e3) AS BIGINT) AS dc_milli
      |FROM side ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m10_wide_fingerprint_dedup" -> (m10WideFingerprintDedup _),
    "m09_audio_qa" -> (m09AudioQa _),
    "m08_scene_cuts" -> (m08SceneCuts _),
    "m07_spectral_audio_dedup" -> (m07SpectralAudioDedup _),
    "m06_image_phash" -> (m06ImagePhash _),
    "m01_media_features" -> (m01MediaFeatures _),
    "m02_frame_sample" -> (m02FrameSample _),
    "m03_image_dedup" -> (m03ImageDedup _),
    "m04_audio_dedup" -> (m04AudioDedup _),
    "m05_video_dedup" -> (m05VideoDedup _))

  /** Every m-query now carries a sidecar-backed DuckDB oracle: the codec
    * work (decode/fingerprint — not SQL-expressible) materializes its
    * per-media frame, and the retrieval/rollup stage is restated in SQL
    * over that frame. MultimodalSpec independently pins the codec VALUES
    * (real decoded dimensions, planted-pair retrieval, determinism) — the
    * same two-sided closure t17 uses. def, not val: the SQL embeds the
    * Sidecars.oracleDir-keyed paths Verify pins at runtime. */
  def oracle: Map[String, String] = Map(
    "m10_wide_fingerprint_dedup" -> m10Sql,
    "m09_audio_qa" -> m09Sql,
    "m08_scene_cuts" -> m08Sql,
    "m07_spectral_audio_dedup" -> bandedHammingSql("m07_spectralfp", maxHamming = 3),
    "m06_image_phash" -> m06Sql,
    "m01_media_features" -> m01Sql,
    "m02_frame_sample" -> m02Sql,
    "m03_image_dedup" -> bandedHammingSql("m03_ahash", maxHamming = 7),
    "m04_audio_dedup" -> bandedHammingSql("m04_audiofp", maxHamming = 3),
    "m05_video_dedup" -> m05Sql)
}
