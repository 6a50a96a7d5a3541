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
}
