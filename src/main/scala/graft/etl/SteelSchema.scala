package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The steel-industry readings table — the reference's single dataset
  * (Steel Industry Energy Consumption Prediction.py:27; schema dump
  * ipynb printSchema output).
  *
  * Both load paths are provided, mirroring the reference's inferred read
  * plus an explicit schema for deterministic tests: inference costs an
  * extra pass over the file (fine at 35k rows; at 100 TB always declare
  * the schema).
  */
object SteelSchema {

  val DefaultCsvPath = "/root/reference/Steel_industry_data.csv"

  /** Pre-rename schema exactly as Spark infers it — note the literal `.`
    * in the Lagging reactive-power name and `()` in CO2(tCO2): these force
    * backtick quoting in SQL and motivate the rename step (py:140-146).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("Usage_kWh", DoubleType),
    StructField("Lagging_Current_Reactive.Power_kVarh", DoubleType),
    StructField("Leading_Current_Reactive_Power_kVarh", DoubleType),
    StructField("CO2(tCO2)", DoubleType),
    StructField("Lagging_Current_Power_Factor", DoubleType),
    StructField("Leading_Current_Power_Factor", DoubleType),
    StructField("NSM", IntegerType),
    StructField("WeekStatus", StringType),
    StructField("Day_of_week", StringType),
    StructField("Load_Type", StringType)))

  /** The reference's rename map (py:140-146). */
  val renames: Map[String, String] = Map(
    "Lagging_Current_Reactive.Power_kVarh" -> "Lagging_Current_Reactive_Power_kVarh",
    "CO2(tCO2)" -> "CO2")

  /** CSV read with schema inference, as the reference does (py:27). The
    * file starts with a UTF-8 BOM; Spark's CSV reader strips it. */
  def loadInferred(spark: SparkSession, path: String = DefaultCsvPath): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Deterministic read with the declared schema — one pass, test-stable. */
  def load(spark: SparkSession, path: String = DefaultCsvPath): DataFrame =
    spark.read.option("header", "true").schema(rawSchema).csv(path)

  /** Fold the rename map over the frame (py:140-146). */
  def renamed(df: DataFrame): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
}
