package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Three tiers:
  *  - brute-force cosine top-k: broadcast the (small) query set against the
  *    corpus — a single map stage + per-partition top-k; the exactness
  *    baseline every ANN variant is tested against;
  *  - random-hyperplane LSH: 32 sign bits per vector, banded 4 x 8 bits;
  *    queries score only vectors sharing at least one band bucket —
  *    sub-linear candidate sets at 100 TB (signatures are one map pass,
  *    the bucket join shuffles on small band keys);
  *  - per-label stats / near-dup pairs: embedding-cosine near-dedup scoped
  *    by a coarse key (label here; at scale, an IVF cluster id) so the
  *    pairwise step is bounded per group.
  *
  * Dot products use higher-order functions (zip_with + aggregate) — fully
  * codegen'd, no UDF. The fold is sequential with a 0.0 seed, so bits match
  * DuckDB's list_reduce exactly, making cosine oracle-checkable.
  */
object SimilarityQueries {

  /** embedding as array<double> (deterministic float->double widening).
    * Shared with the dedup family (d07 embedding-cosine dedup). */
  private[operators] val embD: Column = expr("transform(embedding, x -> cast(x as double))")

  private[operators] def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")

  // ---------------------------------------------------------------- s01
  /** Exact cosine top-10 neighbors for query vectors (vec_id < 5).
    * Plan: tiny query side broadcast, corpus scanned once, window top-k
    * per query. At 100 TB the window becomes a per-partition heap
    * (TakeOrdered per query) — same declarative shape.
    */
  /** Shared exact-top-k core for s01/s07: per query vector (vec_id < 5),
    * the top-10 cosine neighbors with deterministic rounding/tie-break.
    * Columns: q_id, q_label, rnk, neighbor vec_id, label, cosine. Both
    * consumers hash-match oracles that restate this computation, so it
    * must live in exactly one place. */
  private def exactTopNeighbors(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("norm").as("qnorm"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
  }

  def s01AnnBruteForce(s: SparkSession, dir: String): DataFrame =
    exactTopNeighbors(s, dir)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))

  val s01Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i]), (x, y) -> x + y)
      |      / (q.nrm * c.nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
      |ranked AS (
      |  SELECT q_id, neighbor_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT q_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 10
      |ORDER BY q_id, rnk""".stripMargin

  // ---------------------------------------------------------------- s02
  /** Random-hyperplane LSH ANN, banded: 32 fixed hyperplanes (seeded,
    * embedded as literal arrays) -> 4 bands of 8 sign bits. A corpus vector
    * is a candidate for a query if ANY band matches (8 matching sign bits
    * ~= small angular distance with multiple chances), then candidates get
    * an exact cosine rerank, top-5 per query.
    *
    * Plan shape at scale: signatures are one map pass; the candidate join
    * keys on (band, 8-bit bucket) against a broadcast query side — the
    * corpus is never pairwise-compared. Recall vs the exact s01 baseline is
    * asserted in ScalaTest. Not oracle-checked (the SQL equivalent would
    * embed 2048 generated literals — not hand-auditable).
    */
  val NumPlanes = 32
  val BandBits = 8
  val NumBands: Int = NumPlanes / BandBits
  val Dim = 64

  private lazy val hyperplanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(20240612L)
    Array.fill(NumPlanes, Dim)(rnd.nextGaussian())
  }

  /** vec_id, band, bucket — one row per (vector, band), computed in a
    * single pass: the 32 sign bits once per vector, then posexplode over
    * the 4 per-band bucket values (instead of unioning 4 recomputations of
    * the signature — 4x the hyperplane dot products).
    */
  private def bandedSignatures(s: SparkSession, dir: String): DataFrame = {
    val planesLit = array(hyperplanes.map(p => array(p.map(lit): _*)): _*)
    val withBits = Tables.spread(Tables.embeddings(s, dir))
      .withColumn("v", embD)
      .withColumn("planes", planesLit)
      .withColumn("bits", expr(
        """transform(planes, p ->
          |  if(aggregate(zip_with(p, v, (x, y) -> x * y), cast(0.0 as double), (acc, w) -> acc + w) >= 0d, 1, 0))""".stripMargin))
    val buckets = array((0 until NumBands).map { b =>
      (0 until BandBits)
        .map(i => expr(s"element_at(bits, ${b * BandBits + i + 1}) * ${1 << i}"))
        .reduce(_ + _)
    }: _*)
    withBits
      .select(col("vec_id"), posexplode(buckets).as(Seq("band", "bucket")))
  }

  def s02AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val sig = bandedSignatures(s, dir).select(col("vec_id"), col("band"), col("bucket"))
    val qsig = sig.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("band").as("q_band"), col("bucket").as("q_bucket"))
    // candidate pairs: any shared (band, bucket); dedupe on ids only (cheap)
    val pairs = sig.join(broadcast(qsig),
        col("band") === col("q_band") && col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val vecs = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("v"), col("norm"))
    val qvecs = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val cand = pairs.join(vecs, "vec_id").join(broadcast(qvecs), "q_id")
      .withColumn("cosine", floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  // ---------------------------------------------------------------- s03
  /** Embedding-cosine near-dup, scoped by label (the coarse-quantization
    * pattern: at scale the scope key is an IVF centroid id so the pairwise
    * comparison is bounded per cell). Emits per-label pair stats.
    */
  def s03NearDupStats(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("label"), col("vec_id"), col("v"), col("norm"))
    val a = e.select(col("label"), col("vec_id").as("da"), col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("label").as("label_b"), col("vec_id").as("db"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, a("label") === b("label_b") && a("da") < b("db"))
      .withColumn("cosine", floor(dot("va", "vb") / (col("na") * col("nb")) * 1e6 + 0.5) / 1e6)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_pairs"),
        max(col("cosine")).as("max_cosine"),
        sum(when(col("cosine") >= 0.8, 1L).otherwise(0L)).as("n_near_dup"))
      .orderBy(col("label"))
  }

  val s03Sql: String =
    """WITH e AS (
      |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT label, vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |pairs AS (
      |  SELECT a.label,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
      |      / (a.nrm * b.nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
      |SELECT label, COUNT(*) AS n_pairs, MAX(cosine) AS max_cosine,
      |  CAST(SUM(CASE WHEN cosine >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup
      |FROM pairs GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- s04
  /** s01 recomputed through the native codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]]): one fused primitive loop per
    * row instead of the HOF's intermediate product array. Accumulation
    * order matches, so results are bit-identical — same oracle as s01 —
    * and the PerfSpec compares their wall-clock.
    */
  def s04AnnNative(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", floor(expr("graft_cosine(qv, v)") * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  // ---------------------------------------------------------------- s05
  /** IVF-style ANN: coarse quantization then cluster-scoped search.
    *
    *   1. centroids: per-dimension mean of each label's vectors (the label
    *      stands in for a k-means cell id; at scale the cells come from a
    *      sampled k-means — the query plan is identical);
    *   2. assign each query to its nProbe=2 nearest centroids (tiny
    *      broadcast cross: |queries| x |cells|);
    *   3. exact cosine rerank only within the probed cells, top-5.
    *
    * The corpus is scanned once and only |probed cells|/|cells| of it is
    * scored — the standard recall/cost dial. Recall vs s01 asserted in
    * ScalaTest. Rows-only (centroid means are float-sum order-dependent).
    */
  def s05AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    // 1. centroids: posexplode dims, mean per (label, dim), re-assemble
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim")).agg(avg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("cv"))
      .withColumn("cnorm", sqrt(dot("cv", "cv")))
    // 2. probe assignment for the query vectors
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("label"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("csim", dot("qv", "cv") / (col("qnorm") * col("cnorm")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= 2)
      .select(col("q_id"), col("qv"), col("qnorm"), col("label"))
    // 3. exact rerank within probed cells only
    val cand = e.join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  // ---------------------------------------------------------------- s06
  /** End-to-end oracle-checkable LSH ANN — the standard ANN benchmark
    * probe. Queries are DERIVED near-duplicates of corpus vectors
    * (q_i = v_i + 0.15 * v_((i+241) mod N), i < 10), so each query has a
    * planted nearest neighbor (its base vector, cosine ~0.989 vs <=0.4 for
    * everything else) and the true answer is SQL-expressible: DuckDB
    * recomputes the same derived queries and brute-forces the argmax.
    *
    * The Spark side must find it through the full LSH pipeline —
    * signatures, band-bucket join, exact cosine rerank — so the oracle
    * audits RECALL end-to-end, not just the rerank arithmetic: a banding
    * miss surfaces as a wrong neighbor row. 64 hyperplanes in 8 bands of 8
    * sign bits put the per-query miss probability at (1-p^8)^8 ~ 1e-4 for
    * cosine 0.989 (p = 1 - acos(c)/pi ~ 0.953) — and the run is fully
    * deterministic (fixed seed, fixed data), so green once = green always.
    *
    * Plan shape at scale: corpus signatures are one map pass (64 fused dot
    * products per row), the candidate join keys on (band, bucket) against
    * a broadcast 80-row query signature set, and only candidates are
    * reranked — the corpus is never pairwise-compared. s02 keeps the
    * recall-free top-k variant on raw queries; this one is the audited
    * near-duplicate-retrieval path.
    */
  val S06Planes = 64
  val S06BandBits = 8
  val S06Bands: Int = S06Planes / S06BandBits

  private lazy val s06Hyperplanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(77031402L)
    Array.fill(S06Planes, Dim)(rnd.nextGaussian())
  }

  /** (id, band, bucket) rows for any (idCol, vecCol) frame: 64 sign bits
    * in one pass, posexplode over the 8 per-band bucket values. */
  private def s06Signatures(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val planesLit = array(s06Hyperplanes.map(p => array(p.map(lit): _*)): _*)
    val withBits = df
      .withColumn("planes", planesLit)
      .withColumn("bits", expr(
        s"""transform(planes, p ->
           |  if(aggregate(zip_with(p, $vecCol, (x, y) -> x * y), cast(0.0 as double), (acc, w) -> acc + w) >= 0d, 1, 0))""".stripMargin))
    val buckets = array((0 until S06Bands).map { b =>
      (0 until S06BandBits)
        .map(i => expr(s"element_at(bits, ${b * S06BandBits + i + 1}) * ${1 << i}"))
        .reduce(_ + _)
    }: _*)
    withBits.select(col(idCol), posexplode(buckets).as(Seq("band", "bucket")))
  }

  def s06AnnVerified(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("v"))
    val n = e.count() // corpus size: one cheap metadata-ish action, any scale
    val q = e.filter(col("vec_id") < 10)
      .withColumn("partner", (col("vec_id") + 241) % n)
      .join(e.select(col("vec_id").as("partner"), col("v").as("pv")), "partner")
      .select(col("vec_id").as("q_id"),
        expr("zip_with(v, pv, (a, b) -> a + 0.15d * b)").as("qv"))
    val cSig = s06Signatures(e, "vec_id", "v")
    val qSig = s06Signatures(q, "q_id", "qv")
      .select(col("q_id"), col("band").as("q_band"), col("bucket").as("q_bucket"))
    val candIds = cSig.join(broadcast(qSig),
        col("band") === col("q_band") && col("bucket") === col("q_bucket"))
      .select(col("q_id"), col("vec_id")).distinct()
    val qn = q.withColumn("qnorm", sqrt(dot("qv", "qv")))
    val cand = candIds
      .join(e, "vec_id")
      .join(broadcast(qn), "q_id")
      .withColumn("norm", sqrt(dot("v", "v")))
      .withColumn("cosine", floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("q_id"))
  }

  val s06Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.15 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 241) % cnt.n
      |  WHERE b.vec_id < 10),
      |qn AS (
      |  SELECT q_id, qv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]), (x, y) -> x + y)) AS qnrm
      |  FROM q),
      |cn AS (
      |  SELECT vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |scored AS (
      |  SELECT q_id, vec_id AS neighbor_id,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * v[i]), (x, y) -> x + y)
      |      / (qnrm * nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM qn CROSS JOIN cn),
      |ranked AS (
      |  SELECT q_id, neighbor_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT q_id, neighbor_id, cosine FROM ranked WHERE rnk = 1
      |ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------- s07
  /** kNN classification — retrieval as a classifier, the standard
    * label-propagation baseline over an embedding store: each query
    * vector takes the majority label among its exact top-10 cosine
    * neighbors (ties broken toward the smaller label for determinism),
    * reported against its own label.
    *
    * Plan: s01's broadcast-query scan + per-query top-k, then one tiny
    * aggregation over k·|queries| rows for the vote. At 100 TB the
    * neighbor search swaps to the banded/IVF tier (s02/s05) and the vote
    * is unchanged — the classifier is a 2-line suffix on any ANN
    * backend.
    */
  def s07KnnClassify(s: SparkSession, dir: String): DataFrame = {
    val votes = exactTopNeighbors(s, dir)
      .select(col("q_id"), col("q_label").as("true_label"), col("label"))
      .groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val wv = Window.partitionBy(col("q_id")).orderBy(col("n_votes").desc, col("label"))
    votes.withColumn("r", row_number().over(wv)).filter(col("r") === 1)
      .select(col("q_id"), col("label").as("predicted_label"), col("n_votes"),
        col("true_label"), (col("label") === col("true_label")).as("correct"))
      .orderBy(col("q_id"))
  }

  val s07Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |scored AS (
      |  SELECT q.vec_id AS q_id, q.label AS true_label, c.vec_id AS neighbor_id, c.label AS nb_label,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i]), (x, y) -> x + y)
      |      / (q.nrm * c.nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
      |ranked AS (
      |  SELECT q_id, true_label, nb_label,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |  FROM scored),
      |votes AS (
      |  SELECT q_id, true_label, nb_label, COUNT(*) AS n_votes
      |  FROM ranked WHERE rnk <= 10 GROUP BY q_id, true_label, nb_label),
      |best AS (
      |  SELECT q_id, true_label, nb_label, n_votes,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY n_votes DESC, nb_label) AS r
      |  FROM votes)
      |SELECT q_id, nb_label AS predicted_label, n_votes, true_label,
      |  (nb_label = true_label) AS correct
      |FROM best WHERE r = 1 ORDER BY q_id""".stripMargin

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s07_knn_classify" -> (s07KnnClassify _),
    "s01_ann_bruteforce" -> (s01AnnBruteForce _),
    "s02_ann_lsh" -> (s02AnnLsh _),
    "s03_near_dup_stats" -> (s03NearDupStats _),
    "s04_ann_native" -> (s04AnnNative _),
    "s05_ann_ivf" -> (s05AnnIvf _),
    "s06_ann_verified" -> (s06AnnVerified _))

  val oracle: Map[String, String] = Map(
    "s07_knn_classify" -> s07Sql,
    "s01_ann_bruteforce" -> s01Sql,
    "s03_near_dup_stats" -> s03Sql,
    "s04_ann_native" -> s01Sql,
    "s06_ann_verified" -> s06Sql)
}
