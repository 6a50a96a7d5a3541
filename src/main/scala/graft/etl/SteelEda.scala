package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's EDA queries, 1:1 (SURVEY.md §2.3/§2.4; py:45-125).
  *
  * Each is the exact fluent chain the reference runs — groupBy + map-form
  * agg (whose auto-generated `avg(col)` name the downstream rename depends
  * on), descending orderBy, rename, format_number projection. The generated
  * name is reproduced with an explicit alias (SURVEY.md §7.4: in Scala,
  * alias explicitly to keep parity).
  *
  * Plan shape: partial+final hash aggregate over a pruned 2-column scan,
  * then a single-partition sort of a handful of rows — identical at any
  * scale because the cardinality after aggregation is the category count.
  */
object SteelEda {

  /** groupBy(col).count() — py:45, py:49, py:53. */
  def countBy(data: DataFrame, column: String): DataFrame =
    data.groupBy(column).count()

  /** The shared py:57-92 chain: avg(metric) by a category with the
    * reference's auto-generated `avg(metric)` name reproduced, ordered
    * desc, renamed, formatted to 2 decimals with thousands separators. */
  private def avgChain(data: DataFrame, column: String, metric: String, outName: String): DataFrame =
    data.groupBy(column)
      .agg(avg(metric).as(s"avg($metric)"))
      .orderBy(col(s"avg($metric)").desc)
      .withColumnRenamed(s"avg($metric)", outName)
      .select(col(column), format_number(col(outName), 2).as(outName))

  /** The py:57/66/75 chain: avg Usage_kWh by a category. */
  def avgUsageBy(data: DataFrame, column: String): DataFrame =
    avgChain(data, column, "Usage_kWh", "avg_energy_consumption")

  /** avg NSM by Load_Type (py:84-92). */
  def avgNsmByLoadType(data: DataFrame): DataFrame =
    avgChain(data, "Load_Type", "NSM", "avg_nsm")

  /** Whole-table Pearson correlation as a 1x1 frame (py:125; expected
    * 0.9881797716789519 on the pre-rename column). */
  def corrCo2Usage(data: DataFrame): DataFrame =
    data.select(corr("CO2(tCO2)", "Usage_kWh"))

  /** The declared-intent date kit (py:13 imports `to_timestamp, hour,
    * month, year, dayofweek, ...` but never calls them — SURVEY.md §1.1):
    * parse the dd/MM/yyyy HH:mm strings and expose every imported part.
    * The parsed timestamps must reconstruct NSM and Day_of_week exactly,
    * which SteelEdaSpec asserts — the strongest possible check that the
    * parse is right.
    */
  def withParsedDate(data: DataFrame): DataFrame =
    data
      .withColumn("ts", to_timestamp(col("date"), "dd/MM/yyyy HH:mm"))
      .withColumn("ts_year", year(col("ts")))
      .withColumn("ts_month", month(col("ts")))
      .withColumn("ts_day", dayofmonth(col("ts")))
      .withColumn("ts_hour", hour(col("ts")))
      .withColumn("ts_minute", minute(col("ts")))
      .withColumn("ts_second", second(col("ts")))
      .withColumn("ts_dayofweek", dayofweek(col("ts")))
      .withColumn("ts_dayofyear", dayofyear(col("ts")))
      .withColumn("ts_weekofyear", weekofyear(col("ts")))
      .withColumn("nsm_derived", col("ts_hour") * 3600 + col("ts_minute") * 60 + col("ts_second"))

  /** Monthly consumption profile from the parsed timestamps — the analysis
    * the reference's import list implies but never runs. */
  def monthlyProfile(data: DataFrame): DataFrame =
    withParsedDate(data)
      .groupBy(col("ts_year").as("yr"), col("ts_month").as("mo"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("Usage_kWh")).as("avg_usage"),
        max(col("Usage_kWh")).as("max_usage"))
      .orderBy(col("yr"), col("mo"))
}
