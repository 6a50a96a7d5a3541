package graft

import org.apache.spark.sql.SparkSession

/** Session factory tuned for the harness (local[N]) but configured the way a
  * 1000-executor cluster run would be: AQE on (runtime coalescing, skew-join
  * splitting), shuffle partitions sized to cores (on a real cluster this is
  * set to 2-3x total executor cores or left to AQE), UTC session time zone so
  * timestamp semantics match the DuckDB oracle.
  *
  * Reference context: the reference (Steel Industry Energy Consumption
  * Prediction.py:21-27) relies on the ambient Databricks session; we make the
  * session construction explicit and scale-aware.
  */
object GraftSession {
  def apply(appName: String = "graft", cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
