package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's SQL surface (SURVEY.md §2.7): temp view + the
  * Databricks-embedded %sql queries, byte-compatible with Spark SQL —
  * CTE chains, scalar subqueries, backticked identifiers containing `.` and
  * `()`, IF/ISNULL/LEAST/WIDTH_BUCKET/FIRST.
  *
  * Sources: view registration py:106; `select *` py:111; SUM charts and the
  * WIDTH_BUCKET histograms from the notebook's visualization metadata
  * (ipynb raw JSON, "command" fields around lines 130659-132639).
  *
  * Catalyst handles all of it natively: CTE inlining, ReusedSubquery for
  * the MIN/MAX scalar subqueries (each executes once), constant folding of
  * the bucket arithmetic.
  */
object SteelSql {

  val ViewName = "steel_energy"

  def registerView(data: DataFrame): Unit =
    data.createOrReplaceTempView(ViewName)

  def selectAll(spark: SparkSession): DataFrame =
    spark.sql(s"select * from $ViewName")

  /** The Databricks bar-chart feeds: SUM(metric) grouped by category, with
    * the auto-generated result alias preserved. */
  def sumBy(spark: SparkSession, category: String, metric: String, alias: String): DataFrame =
    spark.sql(
      s"WITH q AS (select * from $ViewName) " +
        s"SELECT `$category`,SUM(`$metric`) `$alias` FROM q GROUP BY `$category`")

  /** The scatter-plot feed (ipynb ~132639): projection of two backticked
    * columns through a CTE. */
  def scatterFeed(spark: SparkSession): DataFrame =
    spark.sql(
      s"WITH q AS (select * from $ViewName) SELECT `CO2(tCO2)`,`Usage_kWh` FROM q")

  /** The Databricks auto-histogram over any column — the verbatim query
    * shape from the notebook (ipynb ~131375 for Usage_kWh, ~132279 for
    * CO2(tCO2)): 3-deep CTE chain, MAX/MIN scalar subqueries,
    * IF(ISNULL(...)), LEAST(WIDTH_BUCKET(...), 10), FIRST + COUNT grouped
    * by the computed bucket.
    */
  def histogram(spark: SparkSession, column: String): DataFrame =
    spark.sql(
      s"""WITH q AS (select * from $ViewName)
         |,min_max AS (SELECT `$column`,(SELECT MAX(`$column`) FROM q) `target_column_max`,(SELECT MIN(`$column`) FROM q) `target_column_min` FROM q)
         |,histogram_meta AS (SELECT `$column`,`target_column_min` `min_value`,IF(`target_column_max` = `target_column_min`,`target_column_max` + 1,`target_column_max`) `max_value`,(`target_column_max` - `target_column_min`) / 10 `step` FROM min_max)
         |SELECT IF(ISNULL(`$column`),NULL,LEAST(WIDTH_BUCKET(`$column`,`min_value`,`max_value`,10),10)) `${column}_BIN`,
         |  FIRST(`min_value` + ((IF(ISNULL(`$column`),NULL,LEAST(WIDTH_BUCKET(`$column`,`min_value`,`max_value`,10),10)) - 1) * `step`)) `${column}_BIN_LOWER_BOUND`,
         |  FIRST(`step`) `${column}_BIN_STEP`,
         |  COUNT(`$column`) `COUNT`
         |FROM histogram_meta GROUP BY `${column}_BIN`""".stripMargin)
}
