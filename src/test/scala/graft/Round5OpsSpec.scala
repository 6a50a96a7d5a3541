package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Invariants for the round-5 operators (span dedup, PMI, leakage-safe
  * split, hybrid RRF, PageRank) beyond their DuckDB hash oracles: internal
  * consistency between tiers and the properties SQL restatement can't
  * separately witness. */
class Round5OpsSpec extends SparkTestBase {

  test("d13: a planted exact duplicate is fully span-covered (dup_frac = 1)") {
    // copy one >= 8-token document under a fresh id: both copies consist
    // ONLY of spans occurring in >= 2 docs, so d13 must report full
    // coverage for both — and an untouched long unique doc must not move
    val docs = Tables.documents(spark, Sf001).select(col("doc_id"), col("text"))
    val victim = docs.filter(col("doc_id") === 7)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val before = DedupQueries.d13Body(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val after = DedupQueries.d13Body(docs.union(victim)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(4))).toMap
    assert(after(7L)._1 >= 8, "victim doc must have >= 8 canonical tokens")
    assert(after(7L)._2 == 1.0 && after(1000007L)._2 == 1.0,
      "both copies of the planted duplicate must be fully covered")
    // a doc sharing no 8-token span with doc 7 keeps its coverage
    val unaffected = after.keys.find(id => id != 7L && id != 1000007L &&
      after(id)._2 == before(id)).isDefined
    assert(unaffected)
  }

  test("d13: coverage bounds — positions within [spans, n_toks], short docs zero") {
    val k = 8
    DedupQueries.d13SpanDedup(spark, Sf001).collect().foreach { r =>
      val (nToks, nSpans, nPos) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (nToks < k) assert(nSpans == 0 && nPos == 0)
      if (nSpans > 0) {
        assert(nPos >= k, s"a duplicated span covers at least $k positions")
        assert(nPos <= math.min(nSpans + k - 1, nToks),
          "cover cannot exceed the interval union upper bound")
      } else assert(nPos == 0)
    }
  }

  test("t16: PMI arithmetic reproduced from raw corpus counts for every row") {
    val docs = Tables.documents(spark, Sf001)
      .select(split(Tables.canonText(col("text")), " ").as("toks")).cache()
    try {
      val uni = docs.select(explode(col("toks")).as("w"))
        .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n1 = uni.values.sum
      val bigRows = docs.select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('a', element_at(toks, i), 'b', element_at(toks, i + 1)))")).as("bg"))
        .groupBy(col("bg.a"), col("bg.b")).count().collect()
      val big = bigRows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val n2 = big.values.sum
      val out = TextQueries.t16PmiCollocations(spark, Sf001).collect()
      assert(out.length == 30)
      out.foreach { r =>
        val (w1, w2) = (r.getString(0), r.getString(1))
        val (cxy, cx, cy) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(cxy == big((w1, w2)) && cx == uni(w1) && cy == uni(w2))
        assert(cxy >= 5 && cx >= cxy && cy >= cxy)
        val pmi = math.floor(math.log((cxy.toDouble / n2) /
          ((cx.toDouble / n1) * (cy.toDouble / n1))) * 10000.0 + 0.5) / 10000.0
        assert(r.getDouble(5) == pmi, s"pmi mismatch for ($w1, $w2)")
      }
    } finally docs.unpersist()
  }

  test("p12: splits partition the corpus, audit pinned to zero, ~80/10/10") {
    val rows = PipelineQueries.p12LeakageSplit(spark, Sf001).collect()
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    val total = Tables.documents(spark, Sf001).count()
    assert(rows.map(_.getLong(1)).sum == total, "every doc lands in exactly one split")
    rows.foreach(r => assert(r.getLong(4) == 0, "no cluster may straddle splits"))
    val train = rows.find(_.getString(0) == "train").get.getLong(1).toDouble / total
    assert(train > 0.6 && train < 0.95, s"train fraction $train far from 0.8")
  }

  test("p12: near-dup pair members always share a split") {
    // recompute the split rule over d06's cluster map and check both ends
    // of every verified LSH pair agree — the leakage property itself, not
    // just the aggregated audit column
    val cluster = DedupQueries.d06DupClusters(spark, Sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def splitOf(c: Long): String = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(c.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      if (hx < "cd") "train" else if (hx < "e6") "val" else "test"
    }
    val pairs = DedupQueries.d04MinhashLsh(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(splitOf(cluster(a)) == splitOf(cluster(b)),
        s"near-dup pair ($a, $b) straddles splits")
    }
  }

  test("s10: fusion arithmetic and ordering hold on the emitted rows") {
    val rows = SimilarityQueries.s10HybridRrf(spark, Sf001).collect()
    assert(rows.length == 10)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val sr = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val dr = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(sr.isDefined || dr.isDefined)
      (sr ++ dr).foreach(x => assert(x >= 1 && x <= 20))
      val expect = math.floor((sr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        dr.map(x => 1.0 / (60 + x)).getOrElse(0.0)) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(3) == expect)
      assert(r.getDouble(3) <= prev, "rows must be ordered by rrf desc")
      prev = r.getDouble(3)
    }
  }

  test("g01: ranks bounded below by the teleport base and deterministic") {
    val base = 15L * 1000000000000L / 100L
    val a = GraphQueries.g01PageRank(spark, Sf0001).collect()
    assert(a.length == 20)
    a.foreach { r =>
      assert(r.getLong(2) >= base, "every node keeps at least the teleport mass")
      val id = r.getLong(0)
      if (r.getString(1) == "supplier") assert(id >= 1000000L) else assert(id < 1000000L)
    }
    // fixed-point arithmetic: a second run must be bit-identical
    val b = GraphQueries.g01PageRank(spark, Sf0001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("t17: deflate arithmetic reproduced in-JVM; rollup consistent with per-doc") {
    val perDoc = TextQueries.t17PerDoc(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val texts = Tables.documents(spark, Sf001).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(perDoc.length == texts.size)
    // local recompute with the same Deflater params must agree bit-for-bit
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    val buf = new Array[Byte](1 << 16)
    perDoc.foreach { case (id, nb, nd, ratio) =>
      val bytes = texts(id).getBytes("UTF-8")
      d.reset(); d.setInput(bytes); d.finish()
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      assert(nb == bytes.length && nd == n)
      val expect =
        if (bytes.isEmpty) 1.0
        else math.floor(n.toDouble / bytes.length * 10000.0 + 0.5) / 10000.0
      assert(ratio == expect)
      assert(ratio > 0.0 && ratio <= 1.1, s"deflate ratio $ratio out of range for doc $id")
    }
    // band rollup = per-doc recompute
    def band(r: Double) = if (r < 0.35) "repetitive" else if (r < 0.9) "normal" else "opaque"
    val expectRollup = perDoc.groupBy(t => band(t._4)).map { case (b, g) =>
      b -> (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum)
    }
    val got = TextQueries.t17Compressibility(spark, Sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expectRollup)
  }

  test("g02: personalized ranks are supplier-only, positive, deterministic") {
    val a = GraphQueries.g02PersonalizedPageRank(spark, Sf0001).collect()
    assert(a.nonEmpty && a.length <= 15)
    a.foreach { r =>
      assert(r.getLong(0) >= 1000000L, "output must contain only suppliers")
      assert(r.getLong(1) > 0L, "every supplier reachable from seeds accrues mass")
    }
    val b = GraphQueries.g02PersonalizedPageRank(spark, Sf0001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // seeded mass is a strict subset of the global fixed-point mass: the
    // personalized top supplier cannot out-mass its global-PageRank self
    val g1 = GraphQueries.g01PageRank(spark, Sf0001).collect()
      .filter(_.getString(1) == "supplier").map(r => r.getLong(0) -> r.getLong(2)).toMap
    a.foreach { r =>
      g1.get(r.getLong(0)).foreach(glob => assert(r.getLong(1) <= glob,
        s"seeded mass exceeded global mass for node ${r.getLong(0)}"))
    }
  }

  test("s11: k-means rollup conserves the corpus and clusters are genuinely used") {
    val rows = SimilarityQueries.s11KmeansTopics(spark, Sf001).collect()
    val total = Tables.documents(spark, Sf001).count()
    assert(rows.map(_.getLong(2)).sum == total, "every doc lands in exactly one cluster cell")
    // cluster_total must equal the sum of its (cluster, source) rows
    rows.groupBy(_.getInt(0)).foreach { case (_, g) =>
      assert(g.map(_.getLong(2)).sum == g.head.getLong(3))
    }
    val used = rows.map(_.getInt(0)).distinct.length
    assert(used >= 2, s"Lloyd's must keep >= 2 populated clusters, got $used")
    // determinism: iterative DECIMAL means + seeded init => bit-stable
    val again = SimilarityQueries.s11KmeansTopics(spark, Sf001).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("g01: distributed fixed-point ranks equal a sequential in-memory reference") {
    // independent single-threaded implementation of the same integer
    // recurrence over the same derived graph — validates the distributed
    // join/agg loop against plain Scala, not just against DuckDB's SQL
    val o = Tables.orders(spark, Sf0001).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long"), (lit(1000000L) + col("l_suppkey")).cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = und.groupBy(_._1).map { case (u, es) => u -> es.length.toLong }
    val Scale = 1000000000000L
    val base = 15L * Scale / 100L
    var r = deg.keys.map(_ -> Scale).toMap
    for (_ <- 1 to 5) {
      val in = und.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = r.keys.map(v => v -> (base + 85L * in(v) / 100L)).toMap
    }
    val expectTop = r.toSeq.sortBy { case (n, rk) => (-rk, n) }.take(20)
    val got = GraphQueries.g01PageRank(spark, Sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(2))).toSeq
    assert(got == expectTop, "distributed top-20 diverged from the sequential reference")
  }

  test("p13: drop attribution partitions every source's documents exactly") {
    val rows = PipelineQueries.p13CuratedCorpus(spark, Sf001).collect()
    rows.foreach { r =>
      val (n, surv, fq, fs, fb) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(surv + fq + fs + fb == n,
        s"source ${r.getString(0)}: attribution classes must partition its docs")
    }
    val total = Tables.documents(spark, Sf001).count()
    assert(rows.map(_.getLong(1)).sum == total)
    // composition really gates: survivors are a strict subset somewhere
    assert(rows.map(_.getLong(2)).sum < total)
  }

  test("g03: butterfly arithmetic and wedge bounds hold on the emitted pairs") {
    val nCust = Tables.customer(spark, Sf0001).count()
    val rows = GraphQueries.g03CopurchaseMotifs(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (s1, s2, shared, bf) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(s1 < s2, "pair must be normalized")
      assert(shared >= 1 && shared <= nCust, "wedge count bounded by the customer universe")
      assert(bf == shared * (shared - 1) / 2, "butterflies must equal C(shared, 2)")
      assert(shared <= prev, "rows ordered by shared_customers desc")
      prev = shared
    }
  }

  test("g01: high-degree hubs outrank leaves (suppliers lead at sf0.001)") {
    // sf0.001 has 10 suppliers vs 1500 customers over ~5k distinct trade
    // pairs — every supplier is a hub, so the top of the ranking must be
    // supplier-dominated and the global top-1 a supplier
    val rows = GraphQueries.g01PageRank(spark, Sf0001).collect()
    assert(rows.head.getString(1) == "supplier")
    assert(rows.take(10).count(_.getString(1) == "supplier") == 10)
  }

  test("g04: oriented-wedge triangle counts equal a sequential reference") {
    // Re-derive the kNN edge set independently (collected weighted
    // adjacency, per-node top-8 by (n desc, id asc), symmetrized) and
    // count each node's triangles with a brute-force triple loop — the
    // distributed degree-ordered orientation must agree exactly, which
    // also witnesses that orientation produces each triangle ONCE.
    val pairs = GraphQueries.g03Pairs(spark, Sf0001)
      .groupBy(col("c")).agg(collect_set(col("sp")).as("sps"))
      .collect().flatMap { r =>
        val sps = r.getSeq[Long](1)
        for (a <- sps; b <- sps if a < b) yield (a, b)
      }
    val w = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val adj = w.toSeq.flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
    val knn = adj.groupBy(_._1).values.flatMap {
      _.sortBy { case (_, v, n) => (-n, v) }.take(8)
    }
    val edges = knn.map { case (u, v, _) => (math.min(u, v), math.max(u, v)) }.toSet
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nodes = deg.keys.toSeq.sorted
    val triCnt = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length) {
      val (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if (edges((a, b)) && edges((b, c)) && edges((a, c))) {
        triCnt(a) += 1; triCnt(b) += 1; triCnt(c) += 1
      }
    }
    val expect = nodes.map(n => (n, deg(n), triCnt(n)))
      .sortBy { case (n, _, t) => (-t, n) }.take(20)
    val got = GraphQueries.g04TriangleCounts(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"distributed $got vs sequential $expect")
    // participation bound: a node's triangles fit inside its degree pairs
    got.foreach { case (_, d, t) => assert(t <= d * (d - 1) / 2) }
  }

  test("g05: star components equal d06 min-label propagation on the near-dup graph") {
    val g05 = GraphQueries.g05StarComponents(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val d06 = DedupQueries.d06DupClusters(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(g05.nonEmpty && g05.sameElements(d06),
      "two independent CC algorithms must agree on the same pair graph")
  }

  test("s12: augmented-cosine ordering is monotone in the dot; magnitude reorders cosine") {
    val rows = SimilarityQueries.s12MipsTopk(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // the reduction's point: cos(q', x') strictly increases with <q, x>,
    // so the per-probe aug_cosine sequence must be non-increasing down
    // the dot-ranked list
    rows.groupBy(_._1).values.foreach { rs =>
      val s = rs.sortBy(_._2)
      s.map(_._4).sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
      s.map(_._5).sliding(2).foreach { case Array(a, b) =>
        assert(a >= b, "aug_cosine must be monotone in the ranked dot")
      case _ => }
    }
    // magnitude must matter: recompute the pure-cosine top-1 per probe
    // from the raw vectors and require at least one probe to disagree
    // with the MIPS top-1 (the weighted corpus reorders winners)
    val vecs = Tables.spread(Tables.embeddings(spark, Sf001))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cosTop1 = (0L until 5L).map { q =>
      q -> vecs.keys.filter(_ != q)
        .map(id => (id, cos(vecs(q), vecs(id)))).minBy { case (id, c) => (-c, id) }._1
    }.toMap
    val mipsTop1 = rows.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    assert((0L until 5L).exists(q => mipsTop1(q) != cosTop1(q)),
      "weighted corpus must reorder at least one probe's winner vs pure cosine")
  }

  test("s13: PQ codes retrieve every planted base at rank 1; ADC orders ranks") {
    val rows = SimilarityQueries.s13PqAdcAnn(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 24, "8 probes x top-3")
    // planted construction: probe q is base q + 0.1 * partner, so the
    // base's codes equal the probe's quantization almost surely and PQ
    // recall@1 must be exact here — the property the hash oracle (a PQ
    // restatement, not a brute-force argmax) cannot itself witness
    rows.filter(_._2 == 1).foreach { case (q, _, nb, _, cosine) =>
      assert(nb == q, s"probe $q: ADC rank-1 is $nb, not the planted base")
      assert(cosine > 0.99, s"probe $q: rank-1 cosine $cosine")
    }
    // ADC is a distance: non-decreasing down each probe's rank list, and
    // the rank-1 reconstruction error is strictly the smallest
    rows.groupBy(_._1).values.foreach { rs =>
      val s = rs.sortBy(_._2).map(_._4)
      s.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => }
    }
    // determinism: the literal codebook + rounded arithmetic admit no
    // partitioning or float-order sensitivity
    val again = SimilarityQueries.s13PqAdcAnn(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.sortBy(t => (t._1, t._2)).sameElements(again.sortBy(t => (t._1, t._2))))
  }

  test("p14: hash permutation is a bijection onto 0..N-1 per epoch; epochs decorrelate") {
    val docs = Tables.spread(Tables.documents(spark, Sf0001))
      .select(col("doc_id"), col("source"))
    val n = docs.count()
    val pos = PipelineQueries.p14Positions(docs)
      .select(col("epoch"), col("doc_id"), col("position")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // each epoch's positions are exactly {0 .. N-1}: the two-level prefix
    // sum produced a permutation with no gap, overlap, or overflow
    for (ep <- Seq(0, 1)) {
      val ps = pos.filter(_._1 == ep).map(_._3)
      assert(ps.length == n && ps.distinct.length == n)
      assert(ps.min == 0 && ps.max == n - 1)
    }
    // new epoch = new salt: the permutations must actually differ (a
    // salt-insensitive key would repeat the epoch-0 order verbatim)
    val e0 = pos.filter(_._1 == 0).map(t => t._2 -> t._3).toMap
    val moved = pos.filter(_._1 == 1).count(t => e0(t._2) != t._3)
    assert(moved > n / 2, s"only $moved of $n docs moved between epochs")
  }

  test("g05: a 1500-node chain collapses in logarithmic rounds") {
    // the adversarial shape d06's diameter-bound propagation cannot
    // finish (1500 rounds needed, capped at 64): a single path graph.
    // Large-star/small-star must fold it to one star under the 48-round
    // cap — in practice ~10 rounds — with every label = 0.
    import spark.implicits._
    val n = 1500L
    val chain = spark.range(n - 1).select(col("id").as("da"), (col("id") + 1L).as("db"))
    val labels = GraphQueries.starComponents(chain).collect()
    assert(labels.length == n)
    assert(labels.forall(_.getLong(1) == 0L), "all chain nodes label to the minimum")
  }
}
