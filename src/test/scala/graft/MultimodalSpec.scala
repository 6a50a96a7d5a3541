package graft

import graft.operators.Multimodal

/** Multimodal plumbing: schema, batch shape, determinism, multiplicity.
  * The decode itself is a documented STUB — these tests pin the Spark-side
  * contract that a real codec would drop into. */
class MultimodalSpec extends SparkTestBase {

  lazy val media = Multimodal.mediaTable(spark, Sf0001).cache()

  test("media table: one row per document, kinds partitioned by id") {
    val n = Tables.documents(spark, Sf0001).count()
    assert(media.count() === n)
    val kinds = media.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    assert(kinds.values.sum === n)
  }

  test("payload sizes follow the kind contract") {
    val sizes = media.collect().map(m => m.kind -> m.payload.length).distinct.toMap
    assert(sizes === Map("image" -> 4096, "audio" -> 8192, "video" -> 16384))
  }

  test("feature extraction: 16-dim descriptor, histogram sums to 1, deterministic") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === media.count())
    feats.foreach { f =>
      assert(f.feature.length === 16)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3, s"media ${f.media_id}")
      assert(f.mean_byte > 0)
    }
    // determinism: a second run produces identical vectors
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) === f.feature.toSeq))
  }

  test("resize updates metadata and shrinks payloads") {
    val resized = Multimodal.resize(media, 8, 8).collect()
    resized.foreach { m =>
      assert(m.declared_w === 8 && m.declared_h === 8)
      assert(m.payload.length <= 16384)
    }
  }

  test("frame sampling: explode multiplicity = duration/interval for videos") {
    val frames = Multimodal.sampleFrames(media, everyMs = 5000).collect()
    val videos = media.filter(_.kind == "video").count()
    // 30000ms / 5000ms = 6 frames per video
    assert(frames.length === videos * 6)
    assert(frames.map(_.frame_idx).toSet === (0 until 6).toSet)
  }
}
