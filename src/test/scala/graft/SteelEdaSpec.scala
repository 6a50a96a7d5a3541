package graft

import graft.etl.{SteelEda, SteelSchema}

/** Golden-output tests against the notebook's recorded results
  * (BASELINE.md "Deterministic query outputs"). */
class SteelEdaSpec extends SparkTestBase {

  lazy val data = SteelSchema.load(spark).cache()

  test("row count is 35040 (nb:136)") {
    assert(data.count() === 35040L)
  }

  test("schema inference matches the declared schema (nb:107)") {
    val inferred = SteelSchema.loadInferred(spark)
    assert(inferred.schema === SteelSchema.rawSchema)
  }

  test("count by Load_Type (py:45 -> nb:216)") {
    val got = SteelEda.countBy(data, "Load_Type").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("Light_Load" -> 18072L, "Medium_Load" -> 9696L, "Maximum_Load" -> 7272L))
  }

  test("count by WeekStatus (py:53 -> nb:274)") {
    val got = SteelEda.countBy(data, "WeekStatus").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("Weekday" -> 25056L, "Weekend" -> 9984L))
  }

  test("count by Day_of_week (py:49): Monday 5088, others 4992") {
    val got = SteelEda.countBy(data, "Day_of_week").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("Monday") === 5088L)
    assert(got.filter(_._1 != "Monday").values.toSet === Set(4992L))
    assert(got.size === 7)
  }

  test("avg Usage_kWh by Day_of_week, formatted (py:57 -> nb:303)") {
    val got = SteelEda.avgUsageBy(data, "Day_of_week").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got === Seq(
      "Thursday" -> "35.11", "Tuesday" -> "34.43", "Friday" -> "33.20",
      "Monday" -> "33.14", "Wednesday" -> "32.25", "Saturday" -> "15.92",
      "Sunday" -> "7.55"))
  }

  test("avg Usage_kWh by Load_Type, formatted (py:66 -> nb:350)") {
    val got = SteelEda.avgUsageBy(data, "Load_Type").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got === Seq(
      "Maximum_Load" -> "59.27", "Medium_Load" -> "38.45", "Light_Load" -> "8.63"))
  }

  test("avg Usage_kWh by WeekStatus, formatted (py:75 -> nb:397)") {
    val got = SteelEda.avgUsageBy(data, "WeekStatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got === Seq("Weekday" -> "33.62", "Weekend" -> "11.73"))
  }

  test("avg NSM by Load_Type with thousands separators (py:84-92 -> nb:444)") {
    val got = SteelEda.avgNsmByLoadType(data).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got === Seq(
      "Medium_Load" -> "61,810.40", "Maximum_Load" -> "53,036.14",
      "Light_Load" -> "28,384.66"))
  }

  test("corr(CO2(tCO2), Usage_kWh) = 0.9881797716789519 (py:125 -> nb:132859)") {
    val got = SteelEda.corrCo2Usage(data).collect()(0).getDouble(0)
    assert(math.abs(got - 0.9881797716789519) < 1e-12)
  }

  test("to_timestamp parse reconstructs NSM and Day_of_week exactly (F7, py:13)") {
    import org.apache.spark.sql.functions._
    val parsed = graft.etl.SteelEda.withParsedDate(data).cache()
    // every row parses
    assert(parsed.filter(col("ts").isNull).count() === 0L)
    // NSM column == seconds-since-midnight derived from the parsed timestamp
    assert(parsed.filter(col("nsm_derived") =!= col("NSM")).count() === 0L)
    // Day_of_week string == day name from the parsed timestamp
    val mismatchDays = parsed
      .withColumn("day_name", date_format(col("ts"), "EEEE"))
      .filter(col("day_name") =!= col("Day_of_week")).count()
    assert(mismatchDays === 0L)
    // the year is 2018 throughout except the final midnight-rollover row
    assert(parsed.filter(col("ts_year") === 2018).count() >= 35039L)
    parsed.unpersist()
  }

  test("monthly profile covers 12 months of 2018") {
    val m = graft.etl.SteelEda.monthlyProfile(data).collect()
    val months2018 = m.filter(_.getInt(0) == 2018)
    assert(months2018.length === 12)
    assert(months2018.map(_.getLong(2)).sum >= 35039L)
  }

  test("rename map produces the post-rename schema (py:140-146)") {
    val renamed = SteelSchema.renamed(data)
    val names = renamed.schema.fieldNames.toSet
    assert(names.contains("Lagging_Current_Reactive_Power_kVarh"))
    assert(names.contains("CO2"))
    assert(!names.contains("CO2(tCO2)"))
    assert(!names.contains("Lagging_Current_Reactive.Power_kVarh"))
  }
}
