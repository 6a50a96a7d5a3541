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
    val (nTrain, nTest) = (r.getLong(0), r.getLong(1))
    val (posRate, acc, auc) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(nTrain + nTest === 500)
    assert(nTest > 50, "80/20 split produced an implausibly small holdout")
    // both classes must be present in the holdout (rule chosen ~balanced)
    assert(posRate > 0.2 && posRate < 0.8)
    // the linear rule must be recovered nearly exactly; 0.9 accuracy /
    // 0.95 AUC leave room for hash-collision noise while still failing on
    // any real plumbing bug (majority-class baseline is ~0.55)
    assert(acc >= 0.9, s"holdout agreement $acc below distillation bar")
    assert(auc >= 0.95, s"AUC $auc below distillation bar")
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
