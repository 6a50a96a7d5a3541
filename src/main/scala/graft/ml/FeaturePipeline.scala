package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}

/** The reference's 6-stage feature + model pipeline (SURVEY.md §2.8
  * M1-M4; py:168-181, duplicated at py:202-210 and py:309-317 — built
  * once here).
  *
  * Stages: 3x StringIndexer (frequencyDesc ordinal encoding) ->
  * VectorAssembler over the 9 features with handleInvalid="skip" ->
  * StandardScaler (unit variance, NOT centered — the reference keeps
  * withMean=false default) -> the regressor.
  *
  * Scale notes: StringIndexer.fit is one countByValue aggregate per
  * indexer (tiny shuffle); VectorAssembler is a pure projection;
  * StandardScaler.fit is one column-summary aggregate. The whole feature
  * chain is a stack of lazy projections at transform time — nothing
  * materializes until an action.
  */
object FeaturePipeline {

  val LabelCol = "Usage_kWh"
  val FeaturesCol = "features"
  val ScaledFeaturesCol = "scaledFeatures"

  /** Assembler inputs, post-rename (py:171-172). */
  val FeatureInputs: Array[String] = Array(
    "Lagging_Current_Reactive_Power_kVarh",
    "Leading_Current_Reactive_Power_kVarh",
    "CO2",
    "Lagging_Current_Power_Factor",
    "Leading_Current_Power_Factor",
    "NSM",
    "Day_of_week_index",
    "Load_Type_index",
    "WeekStatus_index")

  def featureStages(): Array[PipelineStage] = Array(
    new StringIndexer().setInputCol("Day_of_week").setOutputCol("Day_of_week_index"),
    new StringIndexer().setInputCol("Load_Type").setOutputCol("Load_Type_index"),
    new StringIndexer().setInputCol("WeekStatus").setOutputCol("WeekStatus_index"),
    new VectorAssembler()
      .setInputCols(FeatureInputs)
      .setOutputCol(FeaturesCol)
      .setHandleInvalid("skip"),
    new StandardScaler().setInputCol(FeaturesCol).setOutputCol(ScaledFeaturesCol))

  /** Full pipeline: features + the given regressor (py:178-181). */
  def pipeline(model: PipelineStage): Pipeline =
    new Pipeline().setStages(featureStages() :+ model)

  /** One-hot variant — the reference imports OneHotEncoder (py:11) but
    * never wires it; this is the pipeline that import implies: ordinal
    * indices -> one-hot vectors -> assembler -> scaler. Correct for linear
    * models, where ordinal-encoding categoricals (the reference's choice)
    * imposes a fake ordering on days/load types.
    */
  def oneHotStages(): Array[PipelineStage] = Array(
    new StringIndexer().setInputCol("Day_of_week").setOutputCol("Day_of_week_index"),
    new StringIndexer().setInputCol("Load_Type").setOutputCol("Load_Type_index"),
    new StringIndexer().setInputCol("WeekStatus").setOutputCol("WeekStatus_index"),
    new OneHotEncoder()
      .setInputCols(Array("Day_of_week_index", "Load_Type_index", "WeekStatus_index"))
      .setOutputCols(Array("Day_of_week_vec", "Load_Type_vec", "WeekStatus_vec")),
    new VectorAssembler()
      .setInputCols(Array(
        "Lagging_Current_Reactive_Power_kVarh",
        "Leading_Current_Reactive_Power_kVarh",
        "CO2",
        "Lagging_Current_Power_Factor",
        "Leading_Current_Power_Factor",
        "NSM",
        "Day_of_week_vec", "Load_Type_vec", "WeekStatus_vec"))
      .setOutputCol(FeaturesCol)
      .setHandleInvalid("skip"),
    new StandardScaler().setInputCol(FeaturesCol).setOutputCol(ScaledFeaturesCol))

  def oneHotPipeline(model: PipelineStage): Pipeline =
    new Pipeline().setStages(oneHotStages() :+ model)
}
