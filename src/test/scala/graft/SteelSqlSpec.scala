package graft

import graft.etl.SteelSchema
import graft.sql.SteelSql
import org.apache.spark.sql.functions._

/** The reference's SQL surface: the verbatim Databricks queries must parse
  * and produce internally consistent results (SURVEY.md §2.7). */
class SteelSqlSpec extends SparkTestBase {

  lazy val data = {
    val d = SteelSchema.load(spark).cache()
    SteelSql.registerView(d)
    d
  }

  test("select * over the temp view returns all rows and columns (py:111)") {
    data // force view registration
    val got = SteelSql.selectAll(spark)
    assert(got.columns.length === 11)
    assert(got.count() === 35040L)
  }

  test("WIDTH_BUCKET histogram: 10 bins covering every row (ipynb ~131375)") {
    data // force view registration
    val h = SteelSql.histogram(spark, "Usage_kWh").collect()
    assert(h.length === 10)
    assert(h.map(_.getLong(3)).sum === 35040L)
    val bins = h.map(_.getAs[Number](0).longValue).sorted
    assert(bins === (1L to 10L).toArray)
  }

  test("histogram bin lower bounds advance by the step (ipynb ~131375)") {
    data
    val h = SteelSql.histogram(spark, "Usage_kWh")
      .orderBy("Usage_kWh_BIN").collect()
    val step = h(0).getDouble(2)
    val lowers = h.map(_.getDouble(1))
    lowers.zipWithIndex.foreach { case (lo, i) =>
      assert(math.abs(lo - (lowers(0) + i * step)) < 1e-9)
    }
  }

  test("histogram over the backticked CO2(tCO2) column parses (ipynb ~132279)") {
    data
    val h = SteelSql.histogram(spark, "CO2(tCO2)").collect()
    assert(h.map(_.getLong(3)).sum === 35040L)
  }

  test("SUM bar-chart feed equals a direct aggregation (ipynb ~130659)") {
    data
    val viaSql = SteelSql.sumBy(spark, "Day_of_week", "NSM", "column_5cb3def13")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = data.groupBy("Day_of_week").agg(sum("NSM")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql === direct)
  }

  test("scatter feed projects the two backticked columns (ipynb ~132639)") {
    data
    val got = SteelSql.scatterFeed(spark)
    assert(got.columns === Array("CO2(tCO2)", "Usage_kWh"))
    assert(got.count() === 35040L)
  }
}
