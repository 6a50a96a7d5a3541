package graft

import graft.etl.SteelSchema
import graft.ml._
import org.scalatest.Tag

/** Machine-checked ML parity — the asserted form of ML_RESULTS.md's
  * baseline table, so reference parity is re-established by `sbt test`
  * every round instead of living in hand-recorded prose.
  *
  * Deterministic families (closed-form / convex fits) must reproduce the
  * reference notebook's test R^2 to all 6 recorded decimals on the seed-64
  * 75/25 split (BASELINE.md; py:237-265). Tree/FM families drift across
  * Spark 3.5 -> 4.1 implementation changes (SURVEY.md §5.2.3), so they get
  * bands around this build's recorded values plus the reference's ranking.
  *
  * The tuned sweep (75 TrainValidationSplit fits + 27 CV fits) stays in
  * `graft.ml.ReferenceRun tune|cv` — out-of-band by design; its numbers
  * are recorded in ML_RESULTS.md.
  */
object MlParity extends Tag("graft.MlParity")

class MlParitySpec extends SparkTestBase {

  private lazy val splits = {
    val data = SteelSchema.renamed(SteelSchema.load(spark)).cache()
    data.randomSplit(Array(0.75, 0.25), seed = 64)
  }

  private def fitMetrics(model: org.apache.spark.ml.PipelineStage): Evaluate.Metrics =
    Evaluate.metrics(
      FeaturePipeline.pipeline(model).fit(splits(0)).transform(splits(1)))

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("deterministic baselines reproduce the notebook R^2 to 6 decimals", MlParity) {
    val lr = fitMetrics(Regressors.linearRegression())
    val tweedie = fitMetrics(Regressors.glrTweedie())
    val poisson = fitMetrics(Regressors.glrPoisson())
    val isotonic = fitMetrics(Regressors.isotonic())

    assert(r6(lr.r2) === 0.978373, s"LinearRegression r2=${lr.r2}")
    assert(r6(lr.rmse) === 4.906425, s"LinearRegression rmse=${lr.rmse}")
    assert(r6(lr.mae) === 2.576966, s"LinearRegression mae=${lr.mae}")
    assert(r6(poisson.r2) === 0.944979, s"GLR poisson r2=${poisson.r2}")
    assert(r6(isotonic.r2) === 0.850908, s"IsotonicRegression r2=${isotonic.r2}")
    // the notebook's duplicate-metrics quirk: default-tweedie (power=0) IS
    // least squares, so all tweedie metrics equal LR's bit-for-bit
    assert(tweedie.r2 === lr.r2 && tweedie.rmse === lr.rmse &&
      tweedie.mae === lr.mae && tweedie.mse === lr.mse,
      s"GLR tweedie must duplicate LR metrics: $tweedie vs $lr")
  }

  test("tree/FM baselines stay in the recorded 4.1 bands with the reference ranking", MlParity) {
    val dt = fitMetrics(Regressors.decisionTree()).r2
    val rf = fitMetrics(Regressors.randomForest()).r2
    val gbt = fitMetrics(Regressors.gbt()).r2
    val fm = fitMetrics(Regressors.fm()).r2
    // this build's recorded values (ML_RESULTS.md): 0.987621 / 0.982264 /
    // 0.992811 / 0.940458 — bands absorb minor version drift only
    assert(math.abs(dt - 0.987621) < 0.01, s"DecisionTree r2=$dt")
    assert(math.abs(rf - 0.982264) < 0.015, s"RandomForest r2=$rf")
    assert(math.abs(gbt - 0.992811) < 0.01, s"GBT r2=$gbt")
    assert(math.abs(fm - 0.940458) < 0.05, s"FM r2=$fm")
    // ranking the reference also observed: ensembles/trees beat the linear
    // baseline (0.978373); FM trails it
    assert(gbt > dt && Seq(dt, rf).forall(_ > 0.978373) && fm < 0.978373)
  }
}
