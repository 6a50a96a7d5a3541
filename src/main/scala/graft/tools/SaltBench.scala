package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured before/after for the p30 salt gate: times the plain
  * orders-customer join+rollup vs the gate-salted spelling on 1x/2x/5x
  * row replicas (replication keeps the per-key skew PROFILE — every
  * key's count scales uniformly, so the audit derives the same factor).
  * Best of 3 timed passes after an untimed warmup, caches dropped
  * between passes.
  *
  *   sbt 'runMain graft.tools.SaltBench [sfDir]'
  *
  * Expected on THIS testdata: parity (o_custkey is near-uniform, so
  * salting buys nothing and costs a small build-side replication) — the
  * honest baseline recorded in BENCH_NOTES.md. The gate's value case is
  * a hot-key distribution, where the same factor levels the straggler
  * task; this tool exists so that claim stays measurable rather than
  * asserted.
  */
object SaltBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession("salt-bench")
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))

    def replicated(rep: Int): DataFrame = {
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      (0 until rep).map(i =>
        o.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 1000000000L)))
        .reduce(_ unionAll _)
    }

    def auditFactor(o: DataFrame): Long = {
      val perKey = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      val r = perKey.agg(max(col("cnt")).as("mx"), count(lit(1)).as("nk")).collect()(0)
      val (mx, nk) = (r.getLong(0), r.getLong(1))
      val cnts = perKey.select(col("cnt")).orderBy(col("cnt")).collect().map(_.getLong(0))
      val p95 = cnts.find(c => cnts.count(_ <= c).toLong * 20 >= nk * 19).get
      (mx + p95 - 1) / p95
    }

    def plainJoin(o: DataFrame): DataFrame =
      o.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), Tables.dsum(col("o_totalprice"), 30, 2).as("tp"))

    def saltedJoin(o: DataFrame, factor: Long): DataFrame = {
      val os = o.withColumn("salt", pmod(xxhash64(col("o_orderkey")), lit(factor)))
      val cs = cust.withColumn("salt",
        explode(sequence(lit(0L), lit(factor - 1L))))
      os.join(cs, os("o_custkey") === cs("c_custkey") && os("salt") === cs("salt"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), Tables.dsum(col("o_totalprice"), 30, 2).as("tp"))
    }

    def time(df: => DataFrame): Double = {
      df.count(); spark.catalog.clearCache() // warmup
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    Seq(1, 2, 5).foreach { rep =>
      val o = replicated(rep).cache()
      o.count()
      try {
        val factor = auditFactor(o)
        val tPlain = time(plainJoin(o))
        val tSalted = time(saltedJoin(o, factor))
        println(f"[salt-bench] rep=${rep}x factor=$factor plain=$tPlain%.3fs salted=$tSalted%.3fs ratio=${tSalted / tPlain}%.2f")
      } finally o.unpersist()
    }
    spark.stop()
  }
}
