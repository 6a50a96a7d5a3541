package graft

import graft.operators.MlQueries

/** Threshold gate for the distilled quality classifier (ml02) — the
  * rows-only query whose metrics the DuckDB oracle can't express. The
  * weak-label rule is linear in the hashed token counts, so a correctly
  * wired RegexTokenizer -> HashingTF -> IDF -> LogisticRegression pipeline
  * must recover it almost exactly on held-out documents; low agreement
  * means broken feature plumbing, not a hard learning problem.
  */
class MlClassifierSpec extends SparkTestBase {

  test("distilled quality classifier recovers the weak-label rule on holdout (ml02)") {
    val r = MlQueries.ml02QualityClassifier(spark, Sf001).collect()(0)
    val (n, nPos, nNeg) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (tp, fp, fn, tn) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    val (accMicro, aucNum, aucDen, aucMicro) =
      (r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10))
    assert(n > 50, "80/20 split produced an implausibly small holdout")
    // the published counts must be a consistent partition of the holdout
    assert(nPos + nNeg === n)
    assert(tp + fp + fn + tn === n)
    // both classes must be present in the holdout (rule chosen ~balanced)
    assert(nPos * 5 > n && nPos * 5 < n * 4, s"pos rate $nPos/$n outside (0.2, 0.8)")
    // the linear rule must be recovered nearly exactly; 0.9 accuracy /
    // 0.95 AUC leave room for hash-collision noise while still failing on
    // any real plumbing bug (majority-class baseline is ~0.55)
    assert(accMicro >= 900000L, s"holdout agreement ${accMicro / 1e6} below distillation bar")
    assert(aucMicro >= 950000L, s"AUC ${aucMicro / 1e6} below distillation bar")
    // the published one-division metrics must agree with their own
    // integer ingredients (an independent replay of the arithmetic)
    assert(accMicro === math.floor((tp + tn).toDouble / n * 1e6).toLong)
    assert(aucMicro === math.floor(aucNum.toDouble / aucDen.toDouble * 1e6).toLong)
    assert(aucDen === 2L * nPos * nNeg)
    // the sidecar the oracle reads must exist and cover the holdout
    val side = spark.read.parquet(graft.Sidecars.path(Sf001, "ml02_scores"))
    assert(side.count() === n)
  }

  test("ml01 exact-integer metric bundle replays against its own sidecar") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.SteelQueries.ml01LrMetrics(spark, Sf001).collect()(0)
    val n = r.getLong(0)
    val (sse, sae) = (r.getLong(3), r.getLong(4))
    val (mseMicro, maeMicro) = (r.getLong(5), r.getLong(6))
    val (r2Num, r2Den, evarNum) = (r.getLong(7), r.getLong(8), r.getLong(9))
    // seed-64 75/25 split of the 35040-row CSV (M17's exact reproduction)
    assert(n === 8793L)
    // derived metrics replay from the integer ingredients
    assert(mseMicro === math.floor(sse.toDouble / n).toLong)
    assert(maeMicro === math.floor(sae.toDouble / n * 1e3).toLong)
    assert(r2Num === n * sse)
    // the rational R^2 must match the notebook-parity value (py:237,
    // R2 ~ 0.9786 on this split) within the milli-quantization noise
    val r2 = 1.0 - r2Num.toDouble / r2Den.toDouble
    assert(r2 > 0.97 && r2 < 0.99, s"R2 $r2 drifted from the reference value")
    assert(evarNum > 0)
    // independent replay: recompute SSE/SAE straight off the sidecar
    val side = spark.read.parquet(graft.Sidecars.path(Sf001, "ml01_scores"))
    val agg = side.agg(
      sum((col("label_milli") - col("pred_milli"))
        * (col("label_milli") - col("pred_milli"))).as("sse"),
      sum(abs(col("label_milli") - col("pred_milli"))).as("sae")).collect()(0)
    assert(agg.getLong(0) === sse)
    assert(agg.getLong(1) === sae)
  }

  test("calibration audit bins are complete and resolve the separated classes (ml03)") {
    import org.apache.spark.sql.functions._
    val out = MlQueries.ml03CalibrationAudit(spark, Sf001).collect()
    // bins partition the holdout
    val nTest = out.map(_.getLong(1)).sum
    assert(nTest > 50)
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    out.foreach { r =>
      val (bin, n, sumP, nPos) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bin >= 0 && bin <= 9)
      assert(nPos <= n)
      // probability mass must sit inside the bin's envelope
      assert(sumP >= bin * 100 * n && sumP <= (if (bin == 9) 1000L else bin * 100 + 99) * n,
        s"bin $bin mass $sumP outside envelope for $n rows")
    }
    // a near-separating classifier (ml02's 0.9+ agreement) must be
    // directionally calibrated at the extremes: the bottom bin is mostly
    // negative, the top bin mostly positive
    val byBin = out.map(r => r.getLong(0) -> r).toMap
    val lo = byBin(out.map(_.getLong(0)).min)
    val hi = byBin(out.map(_.getLong(0)).max)
    assert(lo.getLong(3) * 5 <= lo.getLong(1), "bottom bin is not mostly negative")
    assert(hi.getLong(3) * 5 >= hi.getLong(1) * 4, "top bin is not mostly positive")
    // the sidecar the oracle reads must exist and cover the holdout
    val side = spark.read.parquet(
      graft.Sidecars.path(Sf001, "ml03_calib"))
    assert(side.count() === nTest)
  }
}
