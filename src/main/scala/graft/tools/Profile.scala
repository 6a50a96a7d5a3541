package graft.tools

import graft.{GraftSession, SparkEntry}

/** Local profiling harness: time named queries (args) end-to-end, N passes,
  * against SPARK_GRAFT_SF_DIR (default sf0.1). Prints per-pass seconds so
  * JIT-cold vs warm and co-tenant noise are visible. Not part of the driver
  * contract — a developer tool like [[DumpPlans]].
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val spark = GraftSession("graft-profile")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"PROFILE $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
