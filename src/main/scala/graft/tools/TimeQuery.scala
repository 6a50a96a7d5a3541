package graft.tools

import graft.{GraftSession, SparkEntry}

/** Times individual registry queries (best of N passes, caches dropped
  * between passes) — the local profiling loop for plan experiments
  * without paying a full Bench run.
  *
  *   sbt 'runMain graft.tools.TimeQuery sfDir passes q1 q2 ...'
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeQuery <sfDir> <passes> <query>...")
    val (dir, passes, names) = (args(0), args(1).toInt, args.drop(2).toSeq)
    val spark = GraftSession("time-query")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { q => // untimed warmup pass per query
      SparkEntry.queries(q)(spark, dir).count()
      spark.catalog.clearCache()
    }
    names.foreach { q =>
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $q%-30s best=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
