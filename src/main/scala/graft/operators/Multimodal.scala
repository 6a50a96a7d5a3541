package graft.operators

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
  * and explode-shaped frame sampling. The actual codec work is STUBBED
  * with a deterministic fake (this container has no image/audio libs):
  * every function below that says "STUB" derives its output from a hash of
  * the payload bytes, so tests are exact and the plumbing (schemas, batch
  * shape, row multiplicity, partitioning) is fully exercised.
  *
  * At 100 TB: payloads dominate storage — they stay in parquet binary
  * columns, scans prune them unless a stage needs bytes, and the feature
  * stage emits small fixed-width vectors so downstream shuffles never
  * carry media.
  */
object Multimodal {

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
      mean_byte: Double,
      feature: Array[Float])     // fixed 16-dim descriptor

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media table derived from `documents` (the
    * container ships no real media): payload = text bytes cycled to a
    * kind-dependent length. Deterministic — same dir, same table.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        // empty documents still get a payload (modulo-by-zero guard)
        val raw = text.getBytes("UTF-8")
        val base = if (raw.isEmpty) Array[Byte](0) else raw
        val len = kind match {
          case "image" => 4096
          case "audio" => 8192
          case _ => 16384
        }
        val payload = Array.tabulate[Byte](len)(i => base(i % base.length))
        Media(id, kind, payload, 64, 48, if (kind == "image") 0 else 30000)
      }
  }

  /** STUB decode: real implementation would parse the codec header; the
    * fake derives "decoded" dimensions and luminance from the bytes, so it
    * is pure, deterministic, and exercises the same signature.
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

  /** Feature extraction, partition-batched: one decoder context per
    * partition (the mapPartitions iterator is the batch), 16-dim descriptor
    * per item. The descriptor here is a byte-histogram projection (STUB for
    * a real embedding model).
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup would open the decoder library once, here a no-op
      batch.map { m =>
        val (_, _, meanLum) = decodeStub(m.payload)
        val hist = new Array[Float](16)
        var i = 0
        while (i < m.payload.length) {
          hist((m.payload(i) & 0xff) / 16) += 1f
          i += 1
        }
        val n = m.payload.length.toFloat
        var j = 0
        while (j < 16) { hist(j) /= n; j += 1 }
        MediaFeatures(m.media_id, m.kind, m.payload.length, meanLum, hist)
      }
    }
  }

  /** STUB resize: updates declared dimensions and (fake-)re-encodes by
    * subsampling the payload — keeps the contract (binary in, binary out,
    * metadata updated) without a codec.
    */
  def resize(media: Dataset[Media], w: Int, h: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val stride = math.max(1, m.payload.length / math.max(1, w * h))
      val out = m.payload.indices.by(stride).map(m.payload).toArray
      m.copy(payload = out, declared_w = w, declared_h = h)
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
    * executors, only the small aggregates do).
    */
  def m01MediaFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(s, dir)).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
        round(avg(element_at(col("feature"), 1)), 6).as("avg_feat0"))
      .orderBy(col("kind"))

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
    "m02_frame_sample" -> (m02FrameSample _))

  /** STUB-backed media synthesis is engine-side only — no SQL oracle. */
  val oracle: Map[String, String] = Map()
}
