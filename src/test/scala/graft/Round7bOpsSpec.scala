package graft

import graft.operators.{ExtendedQueries, GraphQueries, Multimodal, PipelineQueries, SimilarityQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Round-7 second-wave operators: modularity trajectory, 2-hop features,
  * vocabulary growth, skew audit, index health, collated grouping, scene
  * cuts. Each test is an INDEPENDENT restatement (sequential replay or
  * direct-aggregation identity) — the cross-engine hash lives in the
  * driver's DuckDB compare.
  */
class Round7bOpsSpec extends SparkTestBase {

  test("g13: modularity trajectory exposes the bipartite LPA collapse") {
    val rows = GraphQueries.g13Modularity(spark, Sf001).collect()
    assert(rows.length === 5)
    val byRound = rows.map(r => r.getAs[Long]("round") -> r).toMap
    assert(byRound.keySet === (0L to 4L).toSet)
    // round 0: every node its own community, so no intra edges and the
    // community count equals |V|
    val nNodes = {
      val o = Tables.orders(spark, Sf001).select(col("o_custkey").cast("long").as("u"))
        .distinct().count()
      val s2 = Tables.lineitem(spark, Sf001)
        .join(Tables.orders(spark, Sf001), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey")).distinct().count()
      o + s2
    }
    assert(byRound(0L).getAs[Long]("n_communities") === nNodes)
    assert(byRound(0L).getAs[Long]("e2") === 0L)
    // the audit's finding on this dense bipartite graph: Q strictly
    // decreases as synchronous LPA collapses toward the bipartition —
    // the "reject these labels" signal the operator exists to raise
    val qs = (0 to 4).map(t => byRound(t.toLong).getAs[Long]("q_micro"))
    qs.sliding(2).foreach { case Seq(a, b) => assert(b < a, s"Q must fall: $qs") }
    assert(qs.forall(_ < 0))
    // community count shrinks monotonically (labels merge, never split
    // past the vote's reach on this data)
    val ncs = (0 to 4).map(t => byRound(t.toLong).getAs[Long]("n_communities"))
    ncs.sliding(2).foreach { case Seq(a, b) => assert(b <= a, s"communities: $ncs") }
  }

  test("g14: 2-hop features equal a sequential in-memory replay") {
    val got = GraphQueries.g14NeighborhoodFeatures(spark, Sf0001).collect()
    // independent replay: collect the weighted pair list, aggregate by hand
    val pairs = Tables.orders(spark, Sf0001).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").cast("long").as("u"),
        (lit(1000000L) + col("l_suppkey")).as("v"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val und = pairs.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
    val h1 = und.groupBy(_._1).map { case (n, es) =>
      n -> (es.length.toLong, es.map(_._3).sum)
    }
    val h2 = und.groupBy(_._1).map { case (n, es) =>
      val nb = es.map(e => h1(e._2))
      n -> (nb.map(_._1).sum, nb.map(_._1).max, nb.map(_._2).sum)
    }
    val expected = h1.keys.filter(_ >= 1000000L).map { n =>
      (n, h1(n)._1, h1(n)._2, h2(n)._1, h2(n)._2, h2(n)._3)
    }.toSeq.sortBy(t => (-t._6, t._1)).take(20)
    val gotT = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(gotT === expected)
  }

  test("t21: vocabulary growth conserves docs, tokens, and types") {
    val rows = TextQueries.t21VocabGrowth(spark, Sf001).collect()
    assert(rows.length === 16)
    assert(rows.map(_.getAs[Long]("bucket")).toSeq === (0L to 15L))
    val docs = Tables.documents(spark, Sf001)
    val totalDocs = docs.count()
    val toks = docs.select(explode(expr(
      "regexp_extract_all(text, '[A-Za-z0-9]+', 0)")).as("tok"))
    val totalToks = toks.count()
    val vocab = toks.distinct().count()
    val last = rows.last
    assert(last.getAs[Long]("cum_docs") === totalDocs)
    assert(last.getAs[Long]("cum_tokens") === totalToks)
    assert(last.getAs[Long]("vocab") === vocab)
    assert(rows.map(_.getAs[Long]("new_types")).sum === vocab)
    // running totals are monotone and vocab growth is sub-linear in
    // tokens on natural-ish text: the second half of the corpus adds
    // fewer new types than the first half (Heaps flattening)
    val vs = rows.map(_.getAs[Long]("vocab"))
    vs.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    val firstHalf = rows(7).getAs[Long]("vocab")
    assert(vocab - firstHalf <= firstHalf,
      s"vocab curve not flattening: $firstHalf then ${vocab - firstHalf}")
  }

  test("p27: skew audit thresholds replay exactly") {
    val rows = PipelineQueries.p27SkewAudit(spark, Sf001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val counts = Tables.orders(spark, Sf001)
      .groupBy(col("o_custkey").cast("long")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val nKeys = counts.length.toLong
    val nRows = counts.map(_._2).sum
    val maxCnt = counts.map(_._2).max
    // exact p95 from the sorted count distribution: smallest c with
    // (#keys <= c) * 20 >= 19 * nKeys
    val sorted = counts.map(_._2).sorted
    val p95 = sorted.find(c => sorted.count(_ <= c) * 20 >= nKeys * 19).get
    val salt = (maxCnt + p95 - 1) / p95
    rows.foreach { r =>
      assert(r.getAs[Long]("n_keys") === nKeys)
      assert(r.getAs[Long]("max_cnt") === maxCnt)
      assert(r.getAs[Long]("p95_cnt") === p95)
      assert(r.getAs[Long]("salt_factor") === salt)
      assert(r.getAs[Long]("cnt") > p95)
      assert(r.getAs[Long]("share_micro") ===
        math.floor(r.getAs[Long]("cnt").toDouble / nRows * 1e6).toLong)
    }
    // rows are the TOP hot keys: every omitted key is <= the listed min
    val listedMin = rows.map(_.getAs[Long]("cnt")).min
    val hotCount = counts.count(_._2 > p95)
    if (hotCount > 10)
      assert(counts.count(_._2 > listedMin) <= 10)
  }

  test("s23: index health partitions the corpus and bounds imbalance") {
    val rows = SimilarityQueries.s23IndexHealth(spark, Sf001).collect()
    val n = Tables.embeddings(spark, Sf001).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === n)
    val maxC = rows.map(_.getAs[Long]("n_vecs")).max
    val minC = rows.map(_.getAs[Long]("n_vecs")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("max_cnt") === maxC)
      assert(r.getAs[Long]("min_cnt") === minC)
      assert(r.getAs[Long]("imbalance_milli") ===
        1000L * maxC * rows.length / n)
      assert(r.getAs[Long]("n_cells") === rows.length.toLong)
    }
    // imbalance is >= 1.0 by construction (max >= mean)
    assert(rows.head.getAs[Long]("imbalance_milli") >= 1000L)
  }

  test("q97: collated grouping equals explicit lower() normalization") {
    val rows = ExtendedQueries.q97CollatedGroup(spark, Sf001).collect()
    val raw = Tables.events(spark, Sf001).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length === raw.size)
    rows.foreach { r =>
      val k = r.getAs[String]("event_type_lc")
      assert(r.getAs[Long]("n") === 2L * raw(k),
        s"$k: collated group must fold the uppercased copy in")
      assert(r.getAs[Long]("n_variants") === 2L,
        s"$k: exactly the two case variants")
    }
  }

  test("st09: transformWithState accumulates across real micro-batches") {
    val got = graft.operators.StreamingQueries.st09TransformWithState(spark, Sf0001)
      .collect()
    val exp = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          expr("cast(floor(value * 100 + 0.5) as bigint)")).otherwise(0L)).as("purchase_cents"))
      .orderBy(col("user_id")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      exp.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("s24: kNN graph is complete, self-free, and rank-consistent") {
    val rows = SimilarityQueries.s24KnnGraph(spark, Sf001).collect()
    val n = Tables.embeddings(spark, Sf001).count()
    // every vector gets a full top-4 (cells are ~n/8 wide, far above 5)
    assert(rows.length === 4 * n)
    val bySrc = rows.groupBy(_.getLong(0))
    assert(bySrc.keySet.size.toLong === n)
    bySrc.foreach { case (src, es) =>
      assert(es.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
      assert(es.forall(_.getLong(2) != src), s"self edge at $src")
      // cosine non-increasing in rank
      val byRank = es.sortBy(_.getLong(1)).map(_.getDouble(3))
      byRank.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
      // neighbors are distinct
      assert(es.map(_.getLong(2)).distinct.length === 4)
    }
    // the graph has substantial reciprocity (real cluster structure:
    // labels are planted, same-label vectors are mutually close)
    val edges = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recip = edges.count { case (a, b) => edges.contains((b, a)) }
    assert(recip * 5 >= edges.size * 2,
      s"reciprocal fraction ${recip.toDouble / edges.size} below 0.4")
  }

  test("p28: compaction plan conserves the manifest and fills groups") {
    val target = 20000L
    val rows = PipelineQueries.p28CompactionPlan(spark, Sf001).collect()
    val docs = Tables.documents(spark, Sf001)
    val totalDocs = docs.count()
    val totalBytes = docs.agg(sum(length(col("text")).cast("long"))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    assert(rows.map(_.getAs[Long]("group_bytes")).sum === totalBytes)
    // per source: group ids are dense from 0, and every group except the
    // last reaches the target (the chop rule can only under-fill the tail)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, gs) =>
      val sorted = gs.sortBy(_.getAs[Long]("grp"))
      assert(sorted.map(_.getAs[Long]("grp")).toSeq === sorted.indices.map(_.toLong))
      sorted.init.foreach { g =>
        assert(g.getAs[Long]("group_bytes") >= target - 6000,
          s"$src grp ${g.getAs[Long]("grp")}: mid-plan group badly under target")
      }
      gs.foreach { g =>
        assert(g.getAs[Long]("fill_milli") ===
          g.getAs[Long]("group_bytes") * 1000 / target)
      }
    }
  }

  test("t22: TV divergence equals a sequential exact replay") {
    val rows = TextQueries.t22DomainDivergence(spark, Sf0001).collect()
    val occ = Tables.documents(spark, Sf0001)
      .select(col("source"), explode(expr(
        "regexp_extract_all(text, '[A-Za-z0-9]+', 0)")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySrcTok = occ.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val byTok = occ.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val bySrc = occ.groupBy(_._1).map { case (src, v) => src -> v.length.toLong }
    val n = occ.length.toLong
    rows.foreach { r =>
      val src = r.getString(0)
      val ns = bySrc(src)
      val present = bySrcTok.filter(_._1._1 == src)
      val gaps = present.map { case ((_, t), cst) => t -> math.abs(cst * n - byTok(t) * ns) }
      val presentGap = gaps.values.sum
      val absentGap = ns * (n - present.map { case ((_, t), _) => byTok(t) }.sum)
      val tv = math.floor((presentGap + absentGap).toDouble / (2.0 * ns * n) * 1e6).toLong
      assert(r.getAs[Long]("tv_micro") === tv, src)
      assert(r.getAs[Long]("n_tokens") === ns)
      val maxGap = gaps.values.max
      assert(r.getAs[Long]("max_gap") === maxGap, src)
      assert(r.getAs[String]("top_token") ===
        gaps.filter(_._2 == maxGap).keys.min, src)
      assert(tv >= 0 && tv <= 1000000)
    }
  }

  test("m09: originals are clean, hot twins clip exactly where predicted") {
    val rows = Multimodal.m09AudioQa(spark, Sf0001).collect()
    val texts = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === 2 * texts.size)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, text) =>
      val base = if (text.isEmpty) Array[Byte](0) else text.getBytes("UTF-8")
      val orig = byId(id)
      // encodeWav samples are (byte-128)*256: never at a rail
      assert(orig.getAs[Long]("n_clipped") === 0L, s"clip in original $id")
      assert(orig.getAs[Long]("peak") <= 24576L)
      // hot twin: gain x3 clips exactly the samples whose seed byte
      // <= 85 ((b-128)*256*3 < -32768); samples cycle the seed
      val expClipped = (0 until Multimodal.AudioSamples)
        .count(i => (base(i % base.length) & 0xff) <= 85).toLong
      val hot = byId(id + 1000000L)
      assert(hot.getAs[Long]("n_clipped") === expClipped, s"twin of $id")
      assert(hot.getAs[Long]("clip_ppm") ===
        expClipped * 1000000L / hot.getAs[Long]("n_samples"))
    }
    // the audit separates the classes: every twin with a space in its
    // text clips, and clip_ppm orders hot above original
    texts.filter(_._2.contains(' ')).keys.foreach { id =>
      assert(byId(id + 1000000L).getAs[Long]("n_clipped") > 0L)
    }
  }

  test("ml04: PR sweep is monotone and internally consistent") {
    val rows = graft.operators.MlQueries.ml04PrSweep(spark, Sf001).collect()
    assert(rows.map(_.getAs[Long]("thr")).toSeq === (100L to 900L by 100L))
    val nPos = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).distinct
    assert(nPos.length === 1, "tp+fn must be the constant positive count")
    rows.foreach { r =>
      assert(r.getAs[Long]("fp") >= 0L && r.getAs[Long]("fn") >= 0L)
      assert(r.getAs[Long]("precision_milli") <= 1000L)
      assert(r.getAs[Long]("recall_milli") <= 1000L)
    }
    // tighter cutoffs only shrink the predicted-positive set
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_pred_pos") <= a.getAs[Long]("n_pred_pos"))
      assert(b.getAs[Long]("tp") <= a.getAs[Long]("tp"))
      assert(b.getAs[Long]("recall_milli") <= a.getAs[Long]("recall_milli"))
    }
    // the classifier is genuinely discriminative on this corpus
    // (MlClassifierSpec pins AUC >= 0.95): mid-sweep precision is high
    val mid = rows(4)
    assert(mid.getAs[Long]("precision_milli") >= 800L)
  }

  test("st10: timer-assembled sessions equal batch gaps-and-islands") {
    val got = graft.operators.StreamingQueries.st10TimerSessions(spark, Sf0001).collect()
    assert(got.nonEmpty)
    // batch restatement in Spark: strict 30-min islands, 9h cut
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, Sf0001).select(col("user_id"), col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val mx = ev.agg(max(col("ts")).as("mx"))
    val exp = ev
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"),
        (max(col("ts")) + expr("INTERVAL 30 MINUTES")).as("session_end"),
        count(lit(1)).as("n_events"))
      .crossJoin(broadcast(mx))
      .filter(col("session_end") < col("mx") - expr("INTERVAL 9 HOURS"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
      .collect()
    assert(got.map(_.toString).toSeq === exp.map(_.toString).toSeq)
  }

  test("st11: outer stream join emits null rows exactly like batch left join") {
    val got = graft.operators.StreamingQueries.st11OuterStreamJoin(spark, Sf0001).collect()
    assert(got.nonEmpty)
    // the outer semantics must actually fire: some purchases unmatched
    assert(got.exists(_.isNullAt(3)), "no null click rows — outer semantics untested")
    assert(got.exists(!_.isNullAt(3)))
    val ev = Tables.events(spark, Sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val mx = p.agg(max(col("p_ts")).as("mp"))
      .crossJoin(c.agg(max(col("c_ts")).as("mc")))
      .select(least(col("mp"), col("mc")).as("mx"))
    val exp = p.crossJoin(broadcast(mx))
      .filter(col("p_ts") < col("mx") - expr("INTERVAL 6 HOURS"))
      .join(c, col("c_user") === col("p_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"), "left_outer")
      .select(col("p_id"), col("p_user"), col("p_value"), col("c_id"))
      .orderBy(col("p_id"), col("c_id").asc_nulls_first)
      .collect()
    assert(got.map(_.toString).toSeq === exp.map(_.toString).toSeq)
  }

  test("q98: forward and nearest directions equal the window replay") {
    val got = ExtendedQueries.q98AsofDirections(spark, Sf0001).collect()
    // window replay in Spark (the oracle's formulation)
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, Sf0001)
    val r = ev.filter(col("event_type") === "purchase").select(
      col("user_id").as("k"), col("ts"),
      lit(1).as("is_r"), col("event_id").as("src_id"),
      col("value").as("price"))
    val l = ev.filter(col("event_type") === "click").select(
      col("user_id").as("k"), col("ts"),
      lit(0).as("is_r"), col("event_id").as("src_id"),
      lit(null).cast("double").as("price"))
    val wf = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("is_r"), col("src_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wb = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("is_r").desc, col("src_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = expr("unix_micros(ts)")
    val exp = r.unionAll(l)
      .withColumn("fwd_value", first(col("price"), ignoreNulls = true).over(wf))
      .withColumn("fwd_t", first(when(col("is_r") === 1, us), ignoreNulls = true).over(wf))
      .withColumn("back_value", last(col("price"), ignoreNulls = true).over(wb))
      .withColumn("back_t", last(when(col("is_r") === 1, us), ignoreNulls = true).over(wb))
      .filter(col("is_r") === 0)
      .select(col("k").as("user_id"), col("src_id").as("event_id"), col("fwd_value"),
        when(col("back_t").isNotNull &&
            (col("fwd_t").isNull || us - col("back_t") <= col("fwd_t") - us),
          col("back_value"))
          .when(col("fwd_t").isNotNull, col("fwd_value"))
          .as("near_value"))
      .orderBy(col("user_id"), col("event_id"))
      .collect()
    assert(got.map(_.toString).toSeq === exp.map(_.toString).toSeq)
    // the probe must exercise BOTH directions: some row's nearest match
    // is its forward side (differs from a pure-backward lookup), and
    // forward and nearest must not be globally identical either
    assert(got.exists(r2 => !r2.isNullAt(2) && !r2.isNullAt(3) &&
      r2.getDouble(2) != r2.getDouble(3)))
  }

  test("d17: band planning orders the S-curve and agrees with d04's config") {
    val rows = graft.operators.DedupQueries.d17BandPlanning(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")) -> r).toMap
    assert(rows.keySet === Set((16L, 2L), (8L, 4L), (4L, 8L)))
    val nTrue = rows.values.map(_.getAs[Long]("n_true")).toSet
    assert(nTrue.size === 1 && nTrue.head > 0, "one shared truth set")
    // candidate volume strictly grows with band count (shorter rows =
    // looser buckets); recall is monotone the same way
    val cands = Seq((4L, 8L), (8L, 4L), (16L, 2L)).map(k => rows(k).getAs[Long]("n_candidates"))
    cands.sliding(2).foreach { case Seq(a, b) => assert(b >= a, cands.toString) }
    val recalls = Seq((4L, 8L), (8L, 4L), (16L, 2L)).map(k => rows(k).getAs[Long]("recall_milli"))
    recalls.sliding(2).foreach { case Seq(a, b) => assert(b >= a, recalls.toString) }
    // d04's own config must achieve full recall on this corpus — that is
    // exactly the property d04's oracle depends on
    assert(rows((8L, 4L)).getAs[Long]("recall_milli") === 1000L)
    // captured never exceeds either bound
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_captured") <= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("n_captured") <= r.getAs[Long]("n_candidates"))
    }
    // the S-curve constants are the textbook values
    assert(rows((16L, 2L)).getAs[Long]("predicted_at_05_micro") === 989977L)
    assert(rows((8L, 4L)).getAs[Long]("predicted_at_05_micro") === 403280L)
    assert(rows((4L, 8L)).getAs[Long]("predicted_at_05_micro") === 15533L)
  }

  test("q99: file lineage recovers the partitioned write layout") {
    val rows = ExtendedQueries.q99FileLineage(spark, Sf001).collect()
    assert(rows.map(_.getAs[Long]("bucket_dir")).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    val docs = Tables.documents(spark, Sf001).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === docs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") === 1L, "one file per bucket by construction")
      // bucket membership is the doc_id % 4 rule
      assert(r.getAs[Long]("min_doc") % 4 === r.getAs[Long]("bucket_dir"))
      assert(r.getAs[Long]("max_doc") % 4 === r.getAs[Long]("bucket_dir"))
    }
  }

  test("q100: rolling 7-day distinct equals per-day direct recounts") {
    val rows = ExtendedQueries.q100RollingDistinct(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val minDay = ev.map(_._2).min
    val maxDay = ev.map(_._2).max
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(!d.isBefore(minDay.plusDays(6)) && !d.isAfter(maxDay))
      val direct = ev.filter { case (_, ed) =>
        !ed.isAfter(d) && !ed.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("active_users_7d") === direct, s"day $d")
    }
    // the covered region is the full calendar tail
    assert(rows.length === java.time.temporal.ChronoUnit.DAYS
      .between(minDay.plusDays(6), maxDay).toInt + 1)
  }

  test("t23: OOV rate matches a sequential vocab replay and separates splits") {
    val rows = TextQueries.t23OovRate(spark, Sf001).collect()
    val occ = Tables.documents(spark, Sf001)
      .select(col("doc_id"), col("source"), explode(expr(
        "regexp_extract_all(text, '[A-Za-z0-9]+', 0)")).as("tok")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val vocab = occ.filter(_._1 % 2 == 0).groupBy(_._3).map { case (t, v) => t -> v.length }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(1000).map(_._1).toSet
    val held = occ.filter(_._1 % 2 == 1)
    val bySource = held.groupBy(_._2)
    assert(rows.map(_.getString(0)).toSet === bySource.keySet)
    rows.foreach { r =>
      val src = r.getString(0)
      val toks = bySource(src).map(_._3)
      val oov = toks.count(!vocab.contains(_)).toLong
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong, src)
      assert(r.getAs[Long]("n_oov") === oov, src)
      assert(r.getAs[Long]("n_oov_types") ===
        toks.filter(!vocab.contains(_)).distinct.length.toLong, src)
      assert(r.getAs[Long]("oov_milli") ===
        math.floor(oov.toDouble / toks.length * 1e3).toLong, src)
    }
  }

  test("st12: MapState transitions equal the batch LAG walk") {
    val got = graft.operators.StreamingQueries.st12TransitionCounts(spark, Sf0001).collect()
    assert(got.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val exp = Tables.events(spark, Sf0001)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("prev_type"), col("event_type"))
      .collect()
    assert(got.map(_.toString).toSeq === exp.map(_.toString).toSeq)
    // the matrix is genuinely 2-dimensional (all 5x5 cells on this data)
    assert(got.length === 25)
  }

  test("plan shapes: t23 vocab cut is a top-k heap; q100 has no Window; q98 adds no extra exchange") {
    // t23: the vocabulary cut must plan TakeOrderedAndProject (per-
    // partition heaps), not a global-sort rank window
    val t23 = TextQueries.t23OovRate(spark, Sf0001)
    t23.collect()
    val t23Plan = t23.queryExecution.executedPlan.toString
    assert(t23Plan.contains("TakeOrderedAndProject"), t23Plan.take(500))
    // q100: the rolling-distinct rewrite replaces the unsupported
    // COUNT(DISTINCT) OVER — no Window operator anywhere
    val q100 = ExtendedQueries.q100RollingDistinct(spark, Sf0001)
    q100.collect()
    assert(!q100.queryExecution.executedPlan.toString.contains("Window"),
      "q100 must not fall back to a window")
    // q98: the two chained as-of merges cluster on the same key — the
    // second AsOfJoinExec must not add an exchange over the first's
    // output distribution (count exchanges between single- and
    // double-join plans)
    def nExchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      "(?m)^\\s*[+:]?-? *Exchange".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    }
    val both = ExtendedQueries.q98AsofDirections(spark, Sf0001)
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value").as("p_value"))
    val single = graft.plans.AsOfJoin.asofJoin(
        clicks, purchases, "user_id", "ts", "p_user", "p_ts", "p_id", "p_value",
        "fwd_value", direction = "forward")
      .orderBy(col("user_id"), col("event_id"))
    // the composed plan runs BOTH merges while paying at most one more
    // exchange than the single-join plan (the second right side) — the
    // left stream between the two merges re-exchanges nothing
    // AQE's materialized stages collapse in toString, so count the exec
    // nodes by walking the adaptive tree instead of grepping the string
    both.collect()
    def nAsof(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: graft.plans.AsOfJoinExec => 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nAsof(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nAsof(q.plan)
        case _ => 0
      }
      self + p.children.map(nAsof).sum
    }
    assert(nAsof(both.queryExecution.executedPlan) === 2)
    assert(nExchanges(both) <= nExchanges(single) + 1,
      s"${nExchanges(both)} vs ${nExchanges(single)}")
  }

  test("g15: mutual-kNN clusters conserve the corpus and strand the unreciprocated") {
    val rows = GraphQueries.g15MutualKnnClusters(spark, Sf001).collect()
    val n = Tables.embeddings(spark, Sf001).count()
    // histogram conserves every vector
    assert(rows.map(r => r.getAs[Long]("n_members") * r.getAs[Long]("n_clusters")).sum === n)
    // singletons are exactly the vectors with no reciprocated kNN edge
    val knn = SimilarityQueries.s24KnnGraph(spark, Sf001)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val reciprocated = knn.filter { case (a, b) => knn.contains((b, a)) }
      .flatMap { case (a, b) => Seq(a, b) }
    val expectedSingletons = n - reciprocated.size
    val singletons = rows.find(_.getAs[Long]("n_members") === 1L)
      .map(_.getAs[Long]("n_clusters")).getOrElse(0L)
    assert(singletons === expectedSingletons)
    // a giant component exists (the finding: label clusters are mutually
    // connected at k = 4 on this embedding space)
    assert(rows.map(_.getAs[Long]("n_members")).max > n / 2)
    // determinism
    val again = GraphQueries.g15MutualKnnClusters(spark, Sf001).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("m08: planted shot structure is recovered exactly") {
    for (sf <- Seq(Sf0001, Sf001)) {
      val rows = Multimodal.m08SceneCuts(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val id = r.getAs[Long]("media_id")
        assert(r.getAs[Long]("n_frames") === 6L)
        if (id % 2 == 0) {
          assert(r.getAs[Long]("n_cuts") === 1L, s"video $id: spliced clip needs 1 cut")
          assert(r.getAs[Int]("first_cut_idx") === 3, s"video $id: cut at the splice")
        } else {
          assert(r.getAs[Long]("n_cuts") === 0L, s"video $id: single-scene clip")
          assert(r.isNullAt(r.fieldIndex("first_cut_idx")))
          // within-shot distances are ZERO: aHash is invariant to the
          // uniform brightness jitter (mean shifts with the pixels)
          assert(r.getAs[Long]("max_adj_hamming") === 0L, s"video $id")
        }
      }
      // determinism
      val again = Multimodal.m08SceneCuts(spark, sf).collect()
      assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
    }
  }
}
