package graft

import graft.operators.Multimodal

/** Multimodal plumbing: schema, batch shape, determinism, multiplicity —
  * plus the REAL JDK codecs: image rows are actual BMPs and audio rows
  * actual WAVE files, so decode is exercised on real bytes (header parse,
  * raster/PCM read), not just hash fakes — and video rows are real
  * uncompressed-AVI containers written and parsed by the module's own
  * RIFF codec, so frame sampling returns actual rasters. */
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

  test("payload bytes are well-formed files for the real-codec kinds") {
    val byKind = media.collect().groupBy(_.kind)
    // image: BMP magic 'BM'; every payload identical size (fixed raster)
    byKind("image").foreach { m =>
      assert(m.payload(0) === 'B'.toByte && m.payload(1) === 'M'.toByte,
        s"media ${m.media_id}: not a BMP header")
    }
    // audio: RIFF....WAVE magic
    byKind("audio").foreach { m =>
      assert(new String(m.payload.slice(0, 4), "US-ASCII") === "RIFF")
      assert(new String(m.payload.slice(8, 12), "US-ASCII") === "WAVE")
    }
    // video: RIFF....'AVI ' magic — a real container, not opaque bytes
    byKind("video").foreach { m =>
      assert(new String(m.payload.slice(0, 4), "US-ASCII") === "RIFF")
      assert(new String(m.payload.slice(8, 12), "US-ASCII") === "AVI ")
    }
  }

  test("real decode recovers the encoded dimensions (image 64x48, audio 4000x1)") {
    val feats = Multimodal.extractFeatures(media).collect().groupBy(_.kind)
    feats("image").foreach { f =>
      assert(f.decoded_w === Multimodal.ImageW && f.decoded_h === Multimodal.ImageH,
        s"media ${f.media_id}: ImageIO decoded ${f.decoded_w}x${f.decoded_h}")
      assert(f.mean_byte > 0 && f.mean_byte < 255, "luminance out of range")
    }
    feats("audio").foreach { f =>
      assert(f.decoded_w === Multimodal.AudioSamples, s"frames ${f.decoded_w}")
      assert(f.decoded_h === 1, "mono channel count")
      assert(f.mean_byte >= 0 && f.mean_byte <= 32768, "amplitude out of range")
    }
    feats("video").foreach { f =>
      assert(f.decoded_w === Multimodal.ImageW && f.decoded_h === Multimodal.ImageH,
        s"media ${f.media_id}: AVI parse gave ${f.decoded_w}x${f.decoded_h}")
      assert(f.mean_byte > 0 && f.mean_byte < 255, "luminance out of range")
    }
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

  test("image resize is a real re-encode: decoded dimensions change to the target") {
    val resized = Multimodal.resize(media, 8, 8).cache()
    try {
      resized.collect().foreach { m =>
        if (m.kind != "audio") assert(m.declared_w === 8 && m.declared_h === 8)
        assert(m.payload.length <= 16384)
      }
      val redecoded = Multimodal.extractFeatures(resized).collect()
        .filter(f => f.kind == "image" || f.kind == "video")
      assert(redecoded.nonEmpty)
      redecoded.foreach { f =>
        assert(f.decoded_w === 8 && f.decoded_h === 8,
          s"media ${f.media_id} (${f.kind}): resize re-encode gave ${f.decoded_w}x${f.decoded_h}")
      }
    } finally resized.unpersist()
  }

  test("frame sampling: explode multiplicity = duration/interval for videos") {
    val frames = Multimodal.sampleFrames(media, everyMs = 5000).collect()
    val videos = media.filter(_.kind == "video").count()
    // 30000ms / 5000ms = 6 frames per video
    assert(frames.length === videos * 6)
    assert(frames.map(_.frame_idx).toSet === (0 until 6).toSet)
    // every sampled frame is itself a decodable image at the clip's real
    // dimensions — the frame bytes came out of an actual AVI parse
    frames.foreach { fr =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr.frame_bytes))
      assert(img != null, s"frame ${fr.media_id}/${fr.frame_idx} not decodable")
      assert(img.getWidth === Multimodal.ImageW && img.getHeight === Multimodal.ImageH)
    }
    // frames within one clip genuinely differ (per-frame phase in the
    // synthesizer): sampling did not return one raster six times
    val byVideo = frames.groupBy(_.media_id)
    assert(byVideo.values.exists(fs => fs.map(_.frame_bytes.toSeq).distinct.length > 1))
  }

  test("aHash image dedup retrieves exactly the planted perturbed twins (m03)") {
    val out = Multimodal.m03ImageDedup(spark, Sf0001).collect()
    val imageIds = media.filter(_.kind == "image").collect().map(_.media_id).toSet
    // exact set equality: every planted (id, id + 1e6) pair found through
    // the banded path, and NOTHING else survives the hamming <= 7 verify
    val expected = imageIds.map(id => (id, id + 1000000L))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    out.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) <= 7))
    // determinism: hashing + banding is pure per-row compute
    val again = Multimodal.m03ImageDedup(spark, Sf0001).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("DCT pHash two-view dedup retrieves exactly the planted contrast-reduced twins (m06)") {
    val out = Multimodal.m06ImagePhash(spark, Sf0001).collect()
    val imageIds = media.filter(_.kind == "image").collect().map(_.media_id).toSet
    // the twin edit touches EVERY pixel (clamp-free contrast reduction);
    // the affine-invariance of median-thresholded DCT bits keeps both
    // views within budget, and the two-view conjunction kills the
    // impostor pairs a single 64-bit perceptual hash lets through
    val expected = imageIds.map(id => (id, id + 1000000L))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    out.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 7, s"pHash ${r.getLong(2)}")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 7, s"aHash ${r.getLong(3)}")
    }
    val again = Multimodal.m06ImagePhash(spark, Sf0001).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("128-bit wide-fingerprint dedup retrieves exactly the planted twins through 16-bit bands (m10)") {
    val out = Multimodal.m10WideFingerprintDedup(spark, Sf0001).collect()
    val imageIds = media.filter(_.kind == "image").collect().map(_.media_id).toSet
    // the width lever: same corpus, same twins, same combined Hamming
    // <= 7 radius — retrieved through 16-bit bands (65,536 buckets per
    // band instead of 256), the configuration that carries 256x more
    // corpus before band saturation. Recall stays structural (7 flips
    // cannot touch all 8 disjoint bands of the 128-bit fingerprint),
    // and the two-view concatenation kills single-hash impostors.
    val expected = imageIds.map(id => (id, id + 1000000L))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    out.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) <= 7))
    val again = Multimodal.m10WideFingerprintDedup(spark, Sf0001).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("spectral audio dedup retrieves exactly the planted DC-offset twins (m07)") {
    val out = Multimodal.m07SpectralAudioDedup(spark, Sf0001).collect()
    val audioIds = media.filter(_.kind == "audio").collect().map(_.media_id).toSet
    // every sample shifts by +128, yet bins k >= 1 are structurally
    // unmoved — measured: all twins at Hamming 0, impostors >= 5
    val expected = audioIds.map(id => (id, id + 1000000L))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    out.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) <= 3))
    val again = Multimodal.m07SpectralAudioDedup(spark, Sf0001).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("frame-aligned video dedup retrieves exactly the planted single-frame-edit twins (m05)") {
    val out = Multimodal.m05VideoDedup(spark, Sf0001).collect()
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    val expected = videoIds.map(id => (id, id + 1000000L))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    // 5 of 6 frames are byte-identical (Hamming 0); the watermarked frame
    // may or may not clear the per-frame budget, so 5 or 6 close frames
    out.foreach { r =>
      assert(r.getLong(2) >= 5 && r.getLong(2) <= 6, s"close frames ${r.getLong(2)}")
      assert(r.getLong(3) <= 7 * 6, s"total hamming ${r.getLong(3)}")
    }
    val again = Multimodal.m05VideoDedup(spark, Sf0001).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
