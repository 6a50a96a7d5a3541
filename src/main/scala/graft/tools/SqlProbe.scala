package graft.tools

import graft.GraftSession

/** Dev probe: run ad-hoc SQL statements against a graft session with the
  * testdata tables registered — the quickest way to check which SQL
  * surfaces this Spark build parses/executes before designing an operator
  * around one. Usage:
  *   sbt 'runMain graft.tools.SqlProbe <sfDir> <sql> [<sql> ...]'
  * Each statement runs in order; results print with show(20, false).
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SqlProbe <sfDir> <sql>...")
    val spark = GraftSession("graft-sqlprobe", cores = 8)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(t => graft.Tables.table(spark, args(0), t).createOrReplaceTempView(t))
    graft.Tables.events(spark, args(0)).createOrReplaceTempView("events")
    args.drop(1).foreach { stmt =>
      println(s"=== $stmt")
      try spark.sql(stmt).show(20, truncate = false)
      catch { case e: Throwable => println(s"FAILED: ${e.getClass.getSimpleName}: ${e.getMessage.take(800)}") }
    }
    spark.stop()
  }
}
