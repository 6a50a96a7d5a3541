package graft

import org.apache.spark.sql.functions._

/** Round-8 operators: the p30 audit-consumer gate. */
class Round8OpsSpec extends SparkTestBase {

  test("p30: the gate's decision equals the independently recomputed audit, and salting is result-invariant") {
    val out = operators.PipelineQueries.p30SaltGate(spark, Sf001).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty)
      // decision columns are one broadcast scalar — constant across rows
      val decisions = rows.map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).distinct
      assert(decisions.length === 1)
      val (saltFactor, p95, maxCnt, nKeys) = decisions.head

      // independent replay of the audit: exact p95 from the sorted
      // per-key counts, ceil-div factor
      val cnts = Tables.orders(spark, Sf001)
        .groupBy(col("o_custkey")).count()
        .collect().map(_.getLong(1)).sorted
      assert(nKeys === cnts.length.toLong)
      assert(maxCnt === cnts.last)
      val wantP95 = cnts.find { c =>
        cnts.count(_ <= c).toLong * 20 >= cnts.length.toLong * 19
      }.get
      assert(p95 === wantP95)
      assert(saltFactor === (maxCnt + p95 - 1) / p95)
      assert(saltFactor >= 1)

      // result-invariance: the salted join's aggregate equals the plain
      // join's (computed with DataFrame ops, no salt)
      val plain = Tables.orders(spark, Sf001)
        .join(Tables.customer(spark, Sf001),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          Tables.dsum(col("o_totalprice"), 30, 2).as("total_price"))
        .orderBy(col("c_mktsegment"))
        .collect()
      val gotAgg = rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val wantAgg = plain.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(gotAgg.toSeq === wantAgg.toSeq)
    } finally out.unpersist()
  }
}
