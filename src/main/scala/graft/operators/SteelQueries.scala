package graft.operators

import graft.etl.{SteelEda, SteelSchema}
import graft.ml.{Evaluate, FeaturePipeline, Regressors}
import graft.sql.SteelSql
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference-parity queries on the steel dataset itself, surfaced through
  * the driver contract as rows-only entries (the DuckDB oracle only sees
  * the star-schema tables; these are instead golden-tested in ScalaTest
  * against the notebook's recorded outputs — BASELINE.md).
  *
  * They deliberately ignore the sfDir argument: the reference's dataset is
  * a fixed 35,040-row CSV (read-only at /root/reference).
  */
object SteelQueries {

  private def loaded(s: SparkSession): DataFrame =
    SteelSchema.load(s)

  /** py:45 — groupBy count (Light 18072 / Medium 9696 / Maximum 7272). */
  def steel01CountByLoadType(s: SparkSession, dir: String): DataFrame =
    SteelEda.countBy(loaded(s), "Load_Type")

  /** py:57 — avg Usage by day, desc, format_number(2) (Thu 35.11 ... Sun 7.55). */
  def steel02AvgUsageByDay(s: SparkSession, dir: String): DataFrame =
    SteelEda.avgUsageBy(loaded(s), "Day_of_week")

  /** py:125 — corr(CO2(tCO2), Usage_kWh) = 0.9881797716789519. */
  def steel03Corr(s: SparkSession, dir: String): DataFrame =
    SteelEda.corrCo2Usage(loaded(s))

  /** ipynb ~131375 — the verbatim Databricks WIDTH_BUCKET histogram SQL. */
  def steel04HistogramSql(s: SparkSession, dir: String): DataFrame = {
    SteelSql.registerView(loaded(s))
    SteelSql.histogram(s, "Usage_kWh")
  }

  /** ipynb ~130659 — SUM bar-chart feed with generated alias. */
  def steel05SumNsmByDay(s: SparkSession, dir: String): DataFrame = {
    SteelSql.registerView(loaded(s))
    SteelSql.sumBy(s, "Day_of_week", "NSM", "column_5cb3def13")
  }

  /** F7 date kit on the real `date` strings: parse with to_timestamp and
    * roll up monthly (the analysis the reference's py:13 import list
    * implies; tests prove the parse reconstructs NSM + Day_of_week). */
  def steel06MonthlyProfile(s: SparkSession, dir: String): DataFrame =
    SteelEda.monthlyProfile(loaded(s))

  /** The ML path end-to-end, kept cheap for per-round verification: fit the
    * reference's 6-stage pipeline with LinearRegression on the seed-64
    * 75/25 split and emit the 5-metric comparison row (py:237 ->
    * R2 ~ 0.978). The full 8-family sweep + tuning runs in
    * [[graft.ml.ReferenceRun]] and the ScalaTest suite.
    */
  def ml01LrMetrics(s: SparkSession, dir: String): DataFrame = {
    val data = SteelSchema.renamed(loaded(s))
    val Array(train, test) = data.randomSplit(Array(0.75, 0.25), seed = 64)
    // cache the splits: each of the 6 pipeline stages' fit/transform jobs
    // otherwise re-reads and re-splits the CSV. The split itself runs on
    // the uncached frame, so the seed-64 row assignment is untouched.
    train.cache(); test.cache()
    try {
      val model = FeaturePipeline.pipeline(Regressors.linearRegression()).fit(train)
      val m = Evaluate.metrics(model.transform(test))
      Evaluate.comparisonDf(s, Seq("LinearRegression" -> m))
    } finally { train.unpersist(); test.unpersist() }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "steel01_count_by_load_type" -> (steel01CountByLoadType _),
    "steel02_avg_usage_by_day" -> (steel02AvgUsageByDay _),
    "steel03_corr" -> (steel03Corr _),
    "steel04_histogram_sql" -> (steel04HistogramSql _),
    "steel05_sum_nsm_by_day" -> (steel05SumNsmByDay _),
    "steel06_monthly_profile" -> (steel06MonthlyProfile _),
    "ml01_lr_metrics" -> (ml01LrMetrics _))

  /** No DuckDB oracle — golden-tested against BASELINE.md instead. */
  val oracle: Map[String, String] = Map()
}
