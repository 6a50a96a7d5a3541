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

  /** The py:57/66/75 chain: avg Usage_kWh by a category, ordered desc,
    * formatted to 2 decimals with thousands separators. */
  def avgUsageBy(data: DataFrame, column: String): DataFrame =
    data.groupBy(column)
      .agg(avg("Usage_kWh").as("avg(Usage_kWh)"))
      .orderBy(col("avg(Usage_kWh)").desc)
      .withColumnRenamed("avg(Usage_kWh)", "avg_energy_consumption")
      .select(col(column), format_number(col("avg_energy_consumption"), 2).as("avg_energy_consumption"))

  /** avg NSM by Load_Type (py:84-92). */
  def avgNsmByLoadType(data: DataFrame): DataFrame =
    data.groupBy("Load_Type")
      .agg(avg("NSM").as("avg(NSM)"))
      .orderBy(col("avg(NSM)").desc)
      .withColumnRenamed("avg(NSM)", "avg_nsm")
      .select(col("Load_Type"), format_number(col("avg_nsm"), 2).as("avg_nsm"))

  /** Whole-table Pearson correlation as a 1x1 frame (py:125; expected
    * 0.9881797716789519 on the pre-rename column). */
  def corrCo2Usage(data: DataFrame): DataFrame =
    data.select(corr("CO2(tCO2)", "Usage_kWh"))
}
