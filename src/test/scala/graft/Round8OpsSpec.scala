package graft

import org.apache.spark.sql.functions._

/** Round-8 operators: the p30 audit-consumer gate, the st13 streaming
  * lake upsert. */
class Round8OpsSpec extends SparkTestBase {

  test("st13: accumulated MERGE chain equals the one-shot batch rollup; guard high-water-mark advances") {
    val got = operators.StreamingQueries.st13StreamMergeUpsert(spark, Sf0001).collect()
    val want = Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          expr("cast(floor(value * 100 + 0.5) as bigint)")).otherwise(0L)).as("purchase_cents"))
      .orderBy(col("user_id")).collect()
    assert(got.toSeq === want.toSeq)
    // 4 staged micro-batches -> the idempotence guard's high-water-mark
    // finished at batch 3
    val hwm = spark.table("graft_lake.user_state_meta")
      .agg(max(col("last_batch"))).collect()(0).getLong(0)
    assert(hwm === 3L)
  }

  test("q101: pipe syntax optimizes to the same plan as the classic spelling") {
    val pipe = operators.ExtendedQueries.q101PipeSyntax(spark, Sf0001)
    val classic = spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        |FROM lineitem_q101
        |WHERE l_shipdate <= DATE '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    // the pipe parser must land on the SAME optimized plan, not a
    // lookalike (pipe output puts grouping cols after the aggregates —
    // compare canonicalized plans of the column-aligned projections)
    val a = pipe.select("l_returnflag", "l_linestatus", "n_rows", "sum_qty", "sum_price")
    assert(a.queryExecution.optimizedPlan.canonicalized ===
      classic.queryExecution.optimizedPlan.canonicalized)
    assert(a.collect().toSeq === classic.collect().toSeq)
  }

  test("q103: SQL function body is INLINED — same optimized plan as the hand-inlined spelling") {
    val viaUdf = operators.ExtendedQueries.q103SqlUdf(spark, Sf0001)
    val inlined = spark.sql(
      """SELECT source, CAST(size(split(text, ' ')) * 1000 DIV length(text) AS BIGINT) AS band,
        |  COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents_q103
        |WHERE CAST(size(split(text, ' ')) * 1000 DIV length(text) AS BIGINT) >= 183
        |GROUP BY source, band
        |ORDER BY source, band""".stripMargin)
    assert(viaUdf.queryExecution.optimizedPlan.canonicalized ===
      inlined.queryExecution.optimizedPlan.canonicalized)
    assert(viaUdf.collect().toSeq === inlined.collect().toSeq)
    // no black-box UDF node survives into the physical plan — the body
    // is visible as plain expressions (the attribute ALIAS keeps the
    // function name; the call itself is gone)
    val phys = viaUdf.queryExecution.executedPlan.toString.toLowerCase
    assert(!phys.contains("scalaudf") && !phys.contains("batchevalpython"))
    assert(phys.contains("div cast(length(text"))
  }

  test("q104: lateral SQL table function equals the decorrelated partitioned-window replay") {
    val got = operators.ExtendedQueries.q104SqlTableFunction(spark, Sf0001).collect()
    val want = {
      import org.apache.spark.sql.expressions.Window
      Tables.documents(spark, Sf0001)
        .select(col("source"), col("doc_id"), length(col("text")).as("len"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("len").desc, col("doc_id"))))
        .filter(col("rk") <= 3)
        .orderBy(col("source"), col("rk"))
        .collect()
    }
    assert(got.toSeq === want.toSeq)
    // every source contributes exactly k = 3 rows (>= 3 docs per source here)
    val perSource = got.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perSource.values.forall(_ === 3))
  }

  test("t24: per-source repetition stats replay against a sequential in-memory recount") {
    val out = operators.TextQueries.t24RepetitionAudit(spark, Sf0001).collect()
    val docs = Tables.documents(spark, Sf0001)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // sequential replay of the whole audit per source
    val tokPat = "[A-Za-z0-9]+".r
    case class D(mx2: Int, mx3: Int, dup2: Long, tot2: Long, dup3: Long, tot3: Long, n: Int)
    val perDoc = docs.map { case (src, text) =>
      val t = tokPat.findAllIn(text).toArray
      def stats(g: Int) = {
        val grams = t.sliding(g).map(_.mkString(" ")).toSeq
        val cnt = grams.groupBy(identity).map(_._2.size)
        (if (cnt.isEmpty) 0 else cnt.max,
          cnt.filter(_ >= 2).map(_.toLong).sum, grams.size.toLong)
      }
      val (mx2, dup2, tot2) = stats(2)
      val (mx3, dup3, tot3) = stats(3)
      src -> D(mx2, mx3, dup2, tot2, dup3, tot3, t.length)
    }
    val want = perDoc.groupBy(_._1).map { case (src, ds) =>
      val s = ds.map(_._2)
      val f2 = s.count(d => d.mx2 * 2 * 100 >= d.n * 20)
      val f3 = s.count(d => d.mx3 * 3 * 100 >= d.n * 18)
      val fAny = s.count(d =>
        d.mx2 * 2 * 100 >= d.n * 20 || d.mx3 * 3 * 100 >= d.n * 18)
      src -> (s.length.toLong, f2.toLong, f3.toLong, fAny.toLong,
        math.floor(s.map(_.dup2).sum.toDouble / s.map(_.tot2).sum * 1e3).toLong,
        math.floor(s.map(_.dup3).sum.toDouble / s.map(_.tot3).sum * 1e3).toLong)
    }
    assert(out.length === want.size)
    out.foreach { r =>
      val w = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)) === w, s"source ${r.getString(0)}")
    }
    // the audit must actually flag something on this limited-vocab corpus
    assert(out.map(_.getLong(4)).sum > 0, "no doc flagged — degenerate audit")
  }

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
