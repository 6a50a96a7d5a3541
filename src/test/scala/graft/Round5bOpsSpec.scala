package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Invariants for the second round-5 operator batch (dataset card,
  * readability, degree mixing, radius search) beyond their DuckDB hash
  * oracles: cross-tier consistency and the completeness property the SQL
  * restatement witnesses only end-to-end. */
class Round5bOpsSpec extends SparkTestBase {

  test("p15: card partitions the corpus; shares and dup rates are well-formed") {
    val card = PipelineQueries.p15DatasetCard(spark, Sf001).collect()
    val nDocs = Tables.documents(spark, Sf001).count()
    assert(card.map(_.getLong(1)).sum == nDocs, "per-source doc counts partition the corpus")
    card.foreach { r =>
      val (n, share, dup) = (r.getLong(1), r.getDouble(6), r.getDouble(7))
      assert(n > 0 && share > 0.0 && share <= 1.0, s"top-lang share in (0,1]: $r")
      assert(dup >= 0.0 && dup < 1.0, s"dup rate in [0,1): $r")
      assert(r.getLong(4) >= 1, "at least one language per source")
    }
  }

  test("t18: syllables dominate words; formula reproduced per row") {
    val rows = TextQueries.t18Readability(spark, Sf001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (w, sents, syl) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(syl >= w, "every word carries at least one syllable")
      assert(sents == 1L, "terminator-free synthetic corpus is one sentence per doc")
      val ease = math.floor((206.835 - 1.015 * (w.toDouble / sents)
        - 84.6 * (syl.toDouble / w)) * 10000.0 + 0.5) / 10000.0
      assert(r.getDouble(4) == ease, s"flesch recomputation mismatch on $r")
    }
  }

  test("g06: buckets partition nodes with power-of-two bounds; assortativity in [-1,1]") {
    val rows = GraphQueries.g06DegreeMixing(spark, Sf001).collect()
    val nNodes = rows.map(_.getLong(1)).sum
    // node count cross-check from an independent derivation of the graph
    val pairs = Tables.orders(spark, Sf001).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, Sf001).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s")).distinct()
    val expected = pairs.select(col("c")).distinct().count() +
      pairs.select(col("s")).distinct().count()
    assert(nNodes == expected, "degree buckets cover every graph node exactly once")
    rows.foreach { r =>
      val (b, mn, mx, a) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(mn >= (1L << b) && mx < (1L << (b + 1)), s"degree outside its log2 bucket: $r")
      assert(a >= -1.0 && a <= 1.0, "assortativity is a correlation")
    }
  }

  test("s14: radius search over the testdata equals in-Spark brute force") {
    val out = SimilarityQueries.s14RangeSearch(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force over the same planted queries, same rounding/threshold
    val e = Tables.embeddings(spark, Sf001)
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .select(col("vec_id"), col("v"))
    val n = e.count()
    val q = e.filter(col("vec_id") < 8)
      .withColumn("partner", (col("vec_id") + 171) % n)
      .join(e.select(col("vec_id").as("partner"), col("v").as("pv")), "partner")
      .select(col("vec_id").as("q_id"), expr("zip_with(v, pv, (a, b) -> a + 0.1d * b)").as("qv"))
    val brute = q.crossJoin(e)
      .withColumn("cosine", floor(
        expr("aggregate(zip_with(qv, v, (a, b) -> a * b), 0d, (acc, x) -> acc + x)") /
          (sqrt(expr("aggregate(qv, 0d, (acc, x) -> acc + x * x)")) *
            sqrt(expr("aggregate(v, 0d, (acc, x) -> acc + x * x)"))) * 1e6 + 0.5) / 1e6)
      .filter(col("cosine") >= 0.3)
      .select(col("q_id"), col("vec_id"), col("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == brute, "triangle-inequality pruning must lose nothing above tau")
    assert(out.nonEmpty)
  }

  test("s14: the angular bound prunes cells once clusters are tight") {
    // Three tight clusters around orthogonal axes (radius ~6 deg << the
    // ~85 deg of the near-random testdata cells, where the bound is
    // honest but vacuous). A query inside cluster 0 must scan ONLY that
    // cell at tau = 0.5, and the scoped result must still equal brute
    // force over the constructed corpus.
    import spark.implicits._
    val dim = 8
    def vec(axis: Int, wobble: Int): Seq[Double] =
      Seq.tabulate(dim)(d => (if (d == axis) 1.0 else 0.0) +
        (if (d == (axis + 1 + wobble % 3) % dim) 0.1 * ((wobble % 5) - 2) / 2.0 else 0.0))
    val corpus = (0 until 60).map { i =>
      (i.toLong, i % 3, vec(i % 3, i / 3))
    }.toDF("vec_id", "label", "v")
    val queries = Seq((0L, vec(0, 1))).toDF("q_id", "qv")
    val probes = SimilarityQueries.s14ProbeCounts(spark, corpus, queries, tau = 0.5)
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(probes.sameElements(Array((1, 3))),
      s"query in a tight cluster must probe exactly its own cell: ${probes.toSeq}")
    val scoped = SimilarityQueries.s14Search(spark, corpus, queries, tau = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = queries.crossJoin(corpus)
      .withColumn("cosine", floor(
        expr("aggregate(zip_with(qv, v, (a, b) -> a * b), 0d, (acc, x) -> acc + x)") /
          (sqrt(expr("aggregate(qv, 0d, (acc, x) -> acc + x * x)")) *
            sqrt(expr("aggregate(v, 0d, (acc, x) -> acc + x * x)"))) * 1e6 + 0.5) / 1e6)
      .filter(col("cosine") >= 0.5)
      .select(col("q_id"), col("vec_id"), col("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(scoped == brute, "pruned search must equal brute force on the tight corpus")
    assert(scoped.size >= 10, "the query's own cluster qualifies en masse")
  }
}
