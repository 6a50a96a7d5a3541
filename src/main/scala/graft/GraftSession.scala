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
  /** Drop the benign "No Partition Defined for Window operation" WARN to
    * ERROR for the window operators. Every unpartitioned window in this
    * codebase is bounded-cardinality by construction and audited in place
    * (16 hash buckets / calendar days / 256 file buckets / count-value
    * histogram — see the per-site comments, e.g. PipelineQueries
    * fileSizeBuckets, TextQueries t21); leaving the 8 resulting WARN
    * lines in the bench/verify tail would teach readers to ignore the
    * one warning that DOES flag a scale bug, so the audited sites are
    * silenced centrally and a genuinely unbounded window in new code is
    * expected to be caught by plan review (PlanShapeSpec pins the
    * partition-full shapes), not by log spam.
    */
  def quietAuditedWarnings(): Unit = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Seq(
      "org.apache.spark.sql.execution.window.WindowExec",
      "org.apache.spark.sql.execution.window.WindowGroupLimitExec",
      // streaming boilerplate on every st* run, both audited-benign:
      // "adaptive.enabled is not supported in streaming ... will be
      // disabled" (engine behavior, not a misconfiguration — batch
      // queries keep AQE) and "Temporary checkpoint location created"
      // (the st* queries that WANT durable checkpoints set explicit
      // locations; recovery semantics are pinned by
      // StreamingRecoverySpec). Silenced so a REAL warning is visible
      // in the bench tail instead of hiding behind 14 copies of these.
      "org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream",
      // same audited-benign AQE notice, emitted again at micro-batch
      // execution start by a second logger
      "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution")
      .foreach(Configurator.setLevel(_, Level.ERROR))
  }

  def apply(appName: String = "graft", cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Let AQE right-size CACHED plans too (off by default for plan-reuse
      // compatibility): without it every .cache() materializes at the full
      // pre-AQE partition fan-out and each reader pays an N-task in-memory
      // scan of KB-sized partitions — the multi-reader cached frames here
      // (shingle sets, pair unions, CC inputs) were costing 32-128 tasks
      // per read at sf0.1. At scale AQE only coalesces below the advisory
      // size, so large caches keep full parallelism. Measured: p19
      // 15.5->9.9 s, d03 8.2->1.9 s, g15 14.9->10.0 s (same box window).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    quietAuditedWarnings()
    spark
  }
}
