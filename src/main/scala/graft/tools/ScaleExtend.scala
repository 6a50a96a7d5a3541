package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extends the SCALE.md sweep one step past the shipped testdata for the
  * two steepest-scaling families the round-5 verdict flagged (q09's
  * fact-fact shuffle join at 2.3x per 10x step, p01's composed pipeline at
  * 2.2x): synthesizes 2x and 5x variants of sf0.1 in /tmp by replicating
  * with key offsets, then times the queries across sf0.1 → 2x → 5x.
  *
  * Replication preserves the workload's shape instead of just its bytes:
  *  - orders/lineitem replicas offset o_orderkey/l_orderkey by
  *    replica * 10^9, so each order keeps exactly its original lineitem
  *    fan-out — the join's key multiplicity (what drives shuffle-join
  *    cost) scales with data, it doesn't degenerate into hot keys;
  *  - documents replicas offset doc_id and salt the text with a replica
  *    tag, so the exact-dedup stage sees the same duplicate-group
  *    structure per replica rather than K-way cross-replica dup groups
  *    (which would test a different workload than sf0.1 does).
  *
  * The interesting readout is the ratio per 2x/2.5x data step: ~2x and
  * ~2.5x = the plans are linear in input past the overhead-dominated
  * regime (the sub-10x ratios in the main sweep are mostly fixed-cost
  * amortization, which says little about the asymptote).
  *
  *   sbt 'runMain graft.tools.ScaleExtend'   # appends a section to SCALE.md
  */
object ScaleExtend {
  private val KeyStride = 1000000000L // > any sf0.1 orderkey/doc_id

  private def replicate(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val done = new java.io.File(s"$outDir/_DONE")
    if (done.exists()) return
    val reps = spark.range(0, k).select(col("id").as("rep"))
    def cross(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))
    cross(Tables.orders(spark, srcDir))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * KeyStride)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    cross(Tables.lineitem(spark, srcDir))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * KeyStride)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    cross(Tables.documents(spark, srcDir))
      .withColumn("doc_id", col("doc_id") + col("rep") * KeyStride)
      // the salt lands INSIDE canonText's alphabet so fingerprints differ
      // across replicas — per-replica dup structure identical to sf0.1
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("rep"))))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    done.createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession("scale-extend")
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val steps = Seq(
      "sf0.1" -> src,
      "2x (sf~0.2)" -> "/tmp/graft_scale_2x",
      "5x (sf~0.5)" -> "/tmp/graft_scale_5x")
    replicate(spark, src, "/tmp/graft_scale_2x", 2)
    replicate(spark, src, "/tmp/graft_scale_5x", 5)

    val queries = Seq(
      "q09_monthly_revenue" -> "fact-fact shuffle join",
      "p01_clean_corpus" -> "composed filter→dedup→stats")
    // untimed warmup at the smallest step
    queries.foreach { case (q, _) =>
      SparkEntry.queries(q)(spark, src).count(); spark.catalog.clearCache()
    }
    val rows = queries.map { case (q, note) =>
      val times = steps.map { case (_, dir) =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).count()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        ts.min
      }
      (q, note, times)
    }

    val sb = new StringBuilder
    sb.append("\n## Extended step: past sf0.1 for the steepest families (graft.tools.ScaleExtend)\n\n")
    sb.append("2x/5x replicas of sf0.1 with key offsets (join fan-out and dup-group\n")
    sb.append("structure preserved — see ScaleExtend scaladoc); best of 3 passes.\n")
    sb.append("Linear-in-input here is the PASS condition: the main sweep's ratios\n")
    sb.append("are overhead-amortized, this step isolates the asymptote.\n\n")
    sb.append("| query | family | sf0.1 | 2x | 5x | x(1→2x) | x(2x→5x, 2.5x data) |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    rows.foreach { case (q, note, ts) =>
      sb.append(f"| $q | $note | ${ts(0)}%.2f | ${ts(1)}%.2f | ${ts(2)}%.2f " +
        f"| ${ts(1) / ts(0)}%.1fx | ${ts(2) / ts(1)}%.1fx |\n")
    }
    val path = java.nio.file.Paths.get("/root/repo/SCALE.md")
    val cur = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    // drop a previous extension section before re-appending
    val base = cur.indexOf("\n## Extended step:") match {
      case -1 => cur
      case i  => cur.substring(0, i)
    }
    java.nio.file.Files.writeString(path, base + sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
