package graft

import graft.ml.FeaturePipeline
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.DecisionTreeRegressor

/** Cross-version parity against the reference's on-disk artifact: the
  * pipeline the notebook saved (Spark 3.5.0, py:482) must load in our
  * Spark 4 build and match our own builder stage-for-stage, param-for-param
  * — the de-facto golden file for pipeline topology (SURVEY.md §5.1.3).
  */
class ReferenceArtifactSpec extends SparkTestBase {

  val ArtifactPath = "/root/reference/steel_energy_prediction_pipeline"

  lazy val loaded: Pipeline = {
    spark // force session init before MLReader
    Pipeline.load(ArtifactPath)
  }

  test("the Spark 3.5 artifact loads in Spark 4 as an (unfitted) Pipeline") {
    assert(loaded.uid.startsWith("Pipeline_"))
    assert(loaded.getStages.length === 6)
  }

  test("stage topology matches our FeaturePipeline builder") {
    val ref = loaded.getStages
    val ours = FeaturePipeline.pipeline(new DecisionTreeRegressor()
      .setLabelCol("Usage_kWh").setFeaturesCol("scaledFeatures")).getStages
    assert(ref.map(_.getClass.getSimpleName).toSeq ===
      ours.map(_.getClass.getSimpleName).toSeq)
  }

  test("indexer input/output column params match") {
    val refIndexers = loaded.getStages.collect { case s: StringIndexer => (s.getInputCol, s.getOutputCol) }
    assert(refIndexers.toSeq === Seq(
      "Day_of_week" -> "Day_of_week_index",
      "Load_Type" -> "Load_Type_index",
      "WeekStatus" -> "WeekStatus_index"))
  }

  test("assembler matches: 9 inputs in order, handleInvalid=skip") {
    val refVa = loaded.getStages.collect { case s: VectorAssembler => s }.head
    assert(refVa.getInputCols.toSeq === FeaturePipeline.FeatureInputs.toSeq)
    assert(refVa.getHandleInvalid === "skip")
  }

  test("scaler defaults preserved (withStd=true, withMean=false)") {
    val refSc = loaded.getStages.collect { case s: StandardScaler => s }.head
    assert(refSc.getWithStd)
    assert(!refSc.getWithMean)
    assert(refSc.getInputCol === "features")
    assert(refSc.getOutputCol === "scaledFeatures")
  }

  test("the saved winner kept DEFAULT tree hyper-params (the reference's quirk)") {
    // SURVEY.md §2.8: the notebook saved the unfitted pipeline at index 9
    // without transferring tuned params — maxDepth/maxBins are defaults.
    val refDt = loaded.getStages.collect { case s: DecisionTreeRegressor => s }.head
    assert(refDt.getLabelCol === "Usage_kWh")
    assert(refDt.getFeaturesCol === "scaledFeatures")
    assert(refDt.getMaxDepth === 5)
    assert(refDt.getMaxBins === 32)
  }

  test("our artifact round-trips with the same layout class (estimator, not model)") {
    spark // MLWriter needs an active session
    val dir = java.nio.file.Files.createTempDirectory("graft_ref_pipe").toString
    val ours = FeaturePipeline.pipeline(new DecisionTreeRegressor()
      .setLabelCol("Usage_kWh").setFeaturesCol("scaledFeatures"))
    ours.write.overwrite().save(s"$dir/p")
    // Spark 4 writes part files with task-attempt suffixes; find it
    val metaDir = java.nio.file.Paths.get(s"$dir/p/metadata")
    val partFile = java.nio.file.Files.list(metaDir).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(p => p.getFileName.toString.startsWith("part-")).get
    val meta = new String(java.nio.file.Files.readAllBytes(partFile))
    assert(meta.contains("\"class\":\"org.apache.spark.ml.Pipeline\""))
    assert(meta.contains("stageUids"))
  }
}
