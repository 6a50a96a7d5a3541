package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the star schema's implicit graphs.
  *
  * The reference has no graph surface; this tier extends the d06
  * connected-components machinery (iterative joins, checkpointed lineage,
  * integer-exact arithmetic) to weighted propagation — the "who matters"
  * side of corpus curation (seed-quality propagation over link graphs is
  * a standard pretraining-data signal, e.g. Common Crawl harmonic-
  * centrality seeding).
  */
object GraphQueries {

  /** Fixed-point integer PageRank over the customer–supplier trade graph.
    *
    * Graph: node per customer (id = custkey) and per supplier
    * (id = 1,000,000 + suppkey, a disjoint range far above any custkey);
    * an undirected edge per DISTINCT (customer, supplier) pair that
    * appears in orders ⨝ lineitem. Nodes are exactly the edge endpoints
    * (customers with no orders don't rank).
    *
    * Arithmetic: doubles drift across engines under different summation
    * orders, so ranks are INTEGER fixed-point — SCALE = 10^12 mass units
    * per node, per-round update
    *
    *   r'(v) = (15 * SCALE) div 100  +  (85 * sum over in-neighbors u of
    *           (r(u) div deg(u))) div 100
    *
    * entirely in BIGINT floor division (`div` here, `//` in DuckDB —
    * identical on non-negatives), 5 fixed rounds. Every intermediate is
    * bounded by 85 * N * SCALE (~1.4e18 at sf0.1) — inside int64 — and
    * the result is bit-exact in any engine, so the oracle hash-matches
    * an operator that is genuinely iterative-distributed.
    *
    * Plan shape at 100 TB: the edge list (distinct key pairs — 16 bytes a
    * row) is shuffled ONCE into existence, localCheckpointed (cluster:
    * durable checkpoint), and each round is one edge⨝rank hash join plus
    * one node-keyed aggregation — the d06 discipline: lineage truncated
    * per round, cost linear in |E| per round, rounds fixed. Degrees ride
    * along inside the rank frame (rank AND degree keyed by node), so a
    * round shuffles |E| contribution rows and nothing else.
    *
    * Output: top-20 nodes by rank (tie → smaller node id), with the
    * node type and the raw fixed-point rank.
    */
  def g01PageRank(s: SparkSession, dir: String): DataFrame = {
    val Scale = 1000000000000L
    val base = 15L * Scale / 100L // exact: 1.5e11
    val pairs = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("u"),
        (lit(1000000L) + col("l_suppkey")).as("v"))
      .distinct()
    val edges = pairs.union(pairs.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    // rank frame carries the degree so each round is join + agg, no extra
    // degree join
    var ranks = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .select(col("u").as("node"), lit(Scale).as("r"), col("deg"))
      .localCheckpoint()
    for (_ <- 1 to 5) {
      val contrib = edges
        .join(ranks.select(col("node").as("u"), col("r"), col("deg")), "u")
        .select(col("v").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("sc"))
      ranks = ranks.select(col("node"), col("deg"))
        .join(contrib, "node")
        .select(col("node"), (lit(base) + expr("(85 * sc) div 100")).as("r"), col("deg"))
        .localCheckpoint()
    }
    ranks
      .select(col("node"),
        when(col("node") >= 1000000L, "supplier").otherwise("customer").as("node_type"),
        col("r").as("rank_fp"))
      .orderBy(col("rank_fp").desc, col("node"))
      .limit(20)
  }

  /** The same 5 rounds as chained CTEs — bit-identical by integer
    * arithmetic. */
  val g01Sql: String = {
    val iters = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT e.v AS node, 150000000000 + (85 * SUM(r.r // g.deg)) // 100 AS r
         |  FROM und e JOIN r${i - 1} r ON e.u = r.node JOIN deg g ON e.u = g.node
         |  GROUP BY e.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u, 1000000 + CAST(l_suppkey AS BIGINT) AS v
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |und AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
       |deg AS (SELECT u AS node, COUNT(*) AS deg FROM und GROUP BY u),
       |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM deg),
       |$iters
       |SELECT node,
       |  CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END AS node_type,
       |  CAST(r AS BIGINT) AS rank_fp
       |FROM r5 ORDER BY rank_fp DESC, node LIMIT 20""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank" -> (g01PageRank _))

  val oracle: Map[String, String] = Map(
    "g01_pagerank" -> g01Sql)
}
