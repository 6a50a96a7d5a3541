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
  *  - per-cell stats / near-dup pairs: embedding-cosine near-dedup scoped
  *    by the IVF quantizer cell (geometric nearest-centroid assignment)
  *    so the pairwise step is bounded per cell.
  *
  * Dot products: no UDFs anywhere. The zip_with + aggregate HOF form is
  * the readable baseline (its sequential fold with a 0.0 seed bit-matches
  * DuckDB's list_reduce, making cosine oracle-checkable); hot paths — the
  * quantizer probe scoring and every pairwise verify — run the custom
  * codegen'd [[graft.functions.CosineSimilarity]] expression, which keeps
  * the identical accumulation order (so the same oracles hold) at ~6x the
  * throughput of the interpreted HOF lambdas.
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
    * an exact cosine rerank.
    *
    * Registry entry [[s02AnnLsh]] is the planted-probe retrieval (s06's
    * oracle construction with THIS 32-plane family): queries are derived
    * near-duplicates q_i = v_i + 0.1 * v_((i+113) mod N) for i < 8, so the
    * true nearest neighbor (the base vector, cosine ~0.995) is
    * SQL-expressible and DuckDB brute-forces the argmax — the oracle audits
    * banding RECALL end-to-end, not just the rerank arithmetic. Per-query
    * miss probability at 4 bands of 8 bits and cosine 0.995 is
    * (1-p^8)^4 ~ 3e-3 (p = 1 - acos(c)/pi ~ 0.968), and the run is fully
    * deterministic, so green once = green always on a given SF.
    *
    * [[s02TopKRaw]] keeps the raw-query top-5 surface for the recall spec.
    *
    * Plan shape at scale: signatures are one map pass; the candidate join
    * keys on (band, 8-bit bucket) against a broadcast query side — the
    * corpus is never pairwise-compared.
    */
  val NumPlanes = 32
  val BandBits = 8
  val NumBands: Int = NumPlanes / BandBits
  val Dim = 64

  private lazy val hyperplanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(20240612L)
    Array.fill(NumPlanes, Dim)(rnd.nextGaussian())
  }

  /** (id, band, bucket) — one row per (vector, band), computed in a
    * single pass: the 32 sign bits once per vector, then posexplode over
    * the 4 per-band bucket values (instead of unioning 4 recomputations of
    * the signature — 4x the hyperplane dot products).
    */
  private def s02Signatures(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val planesLit = array(hyperplanes.map(p => array(p.map(lit): _*)): _*)
    val withBits = df
      .withColumn("planes", planesLit)
      .withColumn("bits", expr(
        s"""transform(planes, p ->
           |  if(aggregate(zip_with(p, $vecCol, (x, y) -> x * y), cast(0.0 as double), (acc, w) -> acc + w) >= 0d, 1, 0))""".stripMargin))
    val buckets = array((0 until NumBands).map { b =>
      (0 until BandBits)
        .map(i => expr(s"element_at(bits, ${b * BandBits + i + 1}) * ${1 << i}"))
        .reduce(_ + _)
    }: _*)
    withBits.select(col(idCol), posexplode(buckets).as(Seq("band", "bucket")))
  }

  /** Derived planted queries (q_id, qv): q_i = v_i + factor * v_((i+off) mod N)
    * for i < k — shared by s02 (LSH path) and s05 (IVF path); each choice of
    * (k, off, factor) plants a distinct retrievable argmax. */
  private[operators] def plantedQueries(e: DataFrame, k: Int, off: Int, factor: Double): DataFrame = {
    val n = e.count() // corpus size: one cheap scalar action, any scale
    e.filter(col("vec_id") < k)
      .withColumn("partner", (col("vec_id") + off) % n)
      .join(e.select(col("vec_id").as("partner"), col("v").as("pv")), "partner")
      .select(col("vec_id").as("q_id"),
        expr(s"zip_with(v, pv, (a, b) -> a + ${factor}d * b)").as("qv"))
  }

  def s02AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("v"))
    val q = plantedQueries(e, k = 8, off = 113, factor = 0.1)
    val cSig = s02Signatures(e, "vec_id", "v")
    val qSig = s02Signatures(q, "q_id", "qv")
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

  /** Brute-force argmax over the same derived queries — what the banded
    * path must retrieve. */
  val s02Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 113) % cnt.n
      |  WHERE b.vec_id < 8),
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

  /** Raw-query top-5 LSH surface (recall-spec tier; not oracle-checked —
    * banding recall on arbitrary queries has no SQL-expressible truth). */
  private[graft] def s02TopKRaw(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("v"))
    val sig = s02Signatures(e, "vec_id", "v")
    val qsig = sig.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("band").as("q_band"), col("bucket").as("q_bucket"))
    // candidate pairs: any shared (band, bucket); dedupe on ids only (cheap)
    val pairs = sig.join(broadcast(qsig),
        col("band") === col("q_band") && col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val vecs = e.withColumn("norm", sqrt(dot("v", "v")))
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
  /** Per-cell embedding near-dup stats — the monitoring surface of a
    * vector-dedup pipeline: within each IVF cell (geometric assignment,
    * same quantizer as s05/d07), the pair count, the max pairwise cosine,
    * and how many pairs clear the 0.8 near-dup bar.
    *
    * The scope key is the vector's NEAREST-CENTROID cell, not an
    * arbitrary metadata grouping, so the quadratic step is bounded by
    * cell size — the coarse-quantization pattern that makes within-group
    * pairwise viable at 100 TB (cells are capped by construction: k grows
    * with the corpus). The DuckDB oracle recomputes the identical cells —
    * DECIMAL-exact centroid means, same argmax tie-break — so the cell
    * assignment itself is hash-audited, not just the pair arithmetic.
    */
  def s03NearDupStats(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("label"), col("vec_id"), col("v"), col("norm"))
    val cents = codebook(e)
    val assigned = e
      .withColumn("cell", element_at(probeCells(cents, col("v"), 1), 1))
      .select(col("cell"), col("vec_id"), col("v"))
      .localCheckpoint() // probe scoring (interpreted HOF dots) must not
                         // re-run for each side of the self-join
    val a = assigned.select(col("cell"), col("vec_id").as("da"), col("v").as("va"))
    val b = assigned.select(col("cell").as("cell_b"), col("vec_id").as("db"), col("v").as("vb"))
    // codegen'd CosineSimilarity (bit-identical to the HOF form per s04's
    // shared oracle) — the pairwise step is the per-cell quadratic core,
    // so it must not run through interpreted lambdas
    a.join(b, a("cell") === b("cell_b") && a("da") < b("db"))
      .withColumn("cosine", floor(expr("graft_cosine(va, vb)") * 1e6 + 0.5) / 1e6)
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_pairs"),
        max(col("cosine")).as("max_cosine"),
        sum(when(col("cosine") >= 0.8, 1L).otherwise(0L)).as("n_near_dup"))
      .orderBy(col("cell"))
  }

  /** Recomputes the quantizer verbatim: per-label DECIMAL-exact means
    * (the [[graft.Tables.davg]] arithmetic — VARCHAR hop matches Spark's
    * Decimal.toDouble), cell = argmax cosine with ties toward the larger
    * cell id (probeCells sorts ascending then reverses). */
  val s03Sql: String =
    """WITH e AS (
      |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT label, vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |ex AS (SELECT label, u.i AS dim, v[u.i] AS x FROM e, unnest(generate_series(1, 64)) AS u(i)),
      |m AS (
      |  SELECT label, dim,
      |    CAST(CAST(SUM(CAST(x AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      |  FROM ex GROUP BY 1, 2),
      |cent AS (SELECT label AS cell, list(m ORDER BY dim) AS cv FROM m GROUP BY label),
      |cn AS (
      |  SELECT cell, cv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> cv[i] * cv[i]), (x, y) -> x + y)) AS cnrm
      |  FROM cent),
      |sim AS (
      |  SELECT n.vec_id, c.cell,
      |    list_reduce(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i]), (x, y) -> x + y)
      |      / (n.nrm * c.cnrm) AS csim
      |  FROM n CROSS JOIN cn c),
      |asg AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell DESC) AS rk
      |    FROM sim) WHERE rk = 1),
      |av AS (SELECT a.cell, n.vec_id, n.v, n.nrm FROM asg a JOIN n ON n.vec_id = a.vec_id),
      |pairs AS (
      |  SELECT a.cell,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
      |      / (a.nrm * b.nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id)
      |SELECT cell, COUNT(*) AS n_pairs, MAX(cosine) AS max_cosine,
      |  CAST(SUM(CASE WHEN cosine >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup
      |FROM pairs GROUP BY cell ORDER BY cell""".stripMargin

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
    *      sampled k-means — the query plan is identical). Means go through
    *      [[Tables.davg]] (exact DECIMAL sum / count) so the centroids —
    *      and therefore the probe assignment — are independent of
    *      partitioning and float reduction order;
    *   2. assign each query to its nProbe=2 nearest centroids (tiny
    *      broadcast cross: |queries| x |cells|);
    *   3. exact cosine rerank only within the probed cells.
    *
    * The corpus is scanned once and only |probed cells|/|cells| of it is
    * scored — the standard recall/cost dial.
    *
    * Cell MEMBERSHIP is geometric — every corpus vector is stored under
    * its own nearest centroid, not under the label that seeded the
    * centroid. That is the actual IVF invariant (storage and probing use
    * the same quantizer); binning by label instead breaks retrieval on
    * this data because the labels only weakly cluster the vectors (a
    * vector's own-label centroid can rank 8th of 10 by cosine).
    *
    * Registry entry [[s05AnnIvf]] is the planted-probe retrieval (s06's
    * oracle construction routed through the IVF path): queries are derived
    * near-duplicates q_i = v_i + 0.1 * v_((i+171) mod N) for i < 8, whose
    * true argmax (the base vector, cosine ~0.995, vs <=~0.4 for any other
    * vector) sits in the base's cell, and the query — a tiny perturbation
    * of the base — probes that same cell within its nProbe=2 nearest
    * centroids. DuckDB's corpus-wide brute-force argmax therefore equals
    * what the cell-scoped search must return, auditing quantizer +
    * probe assignment end-to-end. [[s05TopKRaw]] keeps the raw-query
    * top-5 surface for the recall spec.
    */
  def s05AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    val cents = codebook(e)
    val assigned = e
      .withColumn("cell", element_at(probeCells(cents, col("v"), 1), 1))
      .select(col("cell"), col("vec_id"), col("v"), col("norm"))
    val q = plantedQueries(e.select(col("vec_id"), col("v")), k = 8, off = 171, factor = 0.1)
      .withColumn("qnorm", sqrt(dot("qv", "qv")))
    val probes = q
      .select(col("q_id"), col("qv"), col("qnorm"),
        explode(probeCells(cents, col("qv"), 2)).as("cell"))
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .withColumn("cosine", floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("q_id"))
  }

  /** Per-label centroids (cell id, vector, norm), collected to the driver
    * as the IVF codebook — the standard contract: the codebook is k·dim
    * doubles (bytes-to-kilobytes even at 100 TB corpus scale, since k
    * grows with sqrt(n) at most), so it embeds as plan literals and both
    * cell assignment and probe selection become pure map passes with NO
    * shuffle and NO per-row join. Means go through [[Tables.davg]] (exact
    * DECIMAL sum / count) so the codebook — and everything downstream —
    * is independent of partitioning and float reduction order. */
  private[operators] def codebook(e: DataFrame): Array[(Int, Array[Double], Double)] =
    e.select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim")).agg(Tables.davg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("cv"))
      .withColumn("cnorm", sqrt(dot("cv", "cv")))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)

  /** The `nProbe` nearest cells of vector column `vc` (norm `nc`) against
    * a literal codebook: one struct per cell, array_sort + reverse →
    * descending (csim, cell), slice the head. Fully codegen'd, zero
    * exchange. Ties (measure-zero on real data) break toward the larger
    * cell id — deterministically, since the codebook itself is exact.
    *
    * With `epsilon` set, probes past the first are kept only when their
    * centroid similarity is within epsilon of the best — the boundary-band
    * rule: a vector far from any Voronoi boundary stays single-assigned,
    * and two vectors at cosine >= tau always share a cell once epsilon >=
    * their mutual centroid-similarity drift (measured <= 0.011 for the
    * planted tau=0.99 dups across all SFs; callers pass ~2x that). This
    * bounds replication (~1.2x here vs 2x for unconditional 2-probe)
    * while keeping near-dup recall exact. */
  private[operators] def probeCells(cents: Array[(Int, Array[Double], Double)],
      vc: Column, nProbe: Int, epsilon: Option[Double] = None): Column = {
    // csim through the codegen'd CosineSimilarity expression (fused loop,
    // norms included — bit-identical to dot/(|a||b|) with HOF sequential
    // sums): the k interpreted HOF dot products per row were the single
    // most expensive piece of the cell-scoped operators. Self-registers
    // (idempotent) so resolution never depends on WHICH query analyzed
    // first on the session — caller-order registration bit us once when a
    // catalog-map reshuffle changed Verify's iteration order.
    graft.functions.GraftFunctions.register(SparkSession.active)
    val entries = array(cents.map { case (cell, cv, _) =>
      val cvLit = array(cv.map(lit): _*)
      struct(
        call_function("graft_cosine", cvLit, vc).as("csim"),
        lit(cell).as("cell"))
    }: _*)
    val top = slice(reverse(array_sort(entries)), 1, nProbe)
    val kept = epsilon match {
      case None => top
      case Some(eps) => filter(top, (s, i) =>
        (i === lit(0)) ||
          (array_max(entries).getField("csim") - s.getField("csim") <= lit(eps)))
    }
    transform(kept, s => s.getField("cell"))
  }

  /** Brute-force argmax over the s05 derived queries — what the 2-probe
    * IVF path must retrieve. */
  val s05Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 171) % cnt.n
      |  WHERE b.vec_id < 8),
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

  /** Raw-query top-5 IVF surface (recall-spec tier; probing loses
    * unbounded recall on arbitrary queries, so no SQL-expressible truth). */
  private[graft] def s05TopKRaw(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    val cents = codebook(e)
    val assigned = e
      .withColumn("cell", element_at(probeCells(cents, col("v"), 1), 1))
      .select(col("cell"), col("vec_id"), col("v"), col("norm"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
      .withColumn("cell", explode(probeCells(cents, col("qv"), 2)))
    val cand = assigned.join(broadcast(q), Seq("cell"))
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
    val q = plantedQueries(e, k = 10, off = 241, factor = 0.15)
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

  // ---------------------------------------------------------------- s08
  /** Per-class centroid summary — the embedding-store health report a
    * pipeline runs after ingest: for every label, the exact per-dimension
    * mean vector, its norm, and the mean cosine of the class's members to
    * their own centroid (intra-class cohesion; low values flag label
    * noise or collapsed embeddings).
    *
    * Unlike s05's codebook (collected to the driver as plan literals
    * because probing needs it row-side), this stays FULLY distributed —
    * the shape that still works when the label space is millions of
    * fine-grained clusters, not 10:
    *
    *   1. posexplode to (label, dim, x) and aggregate per (label, dim)
    *      with [[graft.Tables.davg]] — exact DECIMAL sums, so centroids
    *      are independent of partitioning and float order. Map-side
    *      combine absorbs the 64x row fan-out before the shuffle;
    *   2. fold the 64 per-dim means back to an array per label
    *      (array_sort over (dim, m) structs — one more label-keyed
    *      shuffle of 64-row groups);
    *   3. join members to their label centroid (broadcast here; at
    *      millions of labels AQE picks the shuffle join — both sides are
    *      label-keyed) and score with the codegen'd
    *      [[graft.functions.CosineSimilarity]] expression;
    *   4. roll up per label, mean cosine through the same DECIMAL path
    *      over the 1e-6-floored per-member cosines.
    *
    * No all-pairs step anywhere: cost is O(n·dim) map work + label-keyed
    * shuffles. The oracle recomputes every stage in DuckDB with the
    * identical decimal/fold arithmetic.
    */
  def s08LabelCentroids(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
    val carr = e.select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim")).agg(Tables.davg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("cv"))
      .withColumn("cnorm", sqrt(dot("cv", "cv")))
    e.join(broadcast(carr), Seq("label"))
      .withColumn("cos", floor(expr("graft_cosine(v, cv)") * 1e6 + 0.5) / 1e6)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        (floor(max(col("cnorm")) * 1e6 + 0.5) / 1e6).as("centroid_norm"),
        (floor(Tables.davg(col("cos")) * 1e6 + 0.5) / 1e6).as("mean_cos"))
      .orderBy(col("label"))
  }

  val s08Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |flat AS (
      |  SELECT label, i AS dim, v[i] AS x
      |  FROM e, unnest(generate_series(1, 64)) AS u(i)),
      |cent AS (
      |  SELECT label, dim,
      |    CAST(CAST(SUM(CAST(x AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      |  FROM flat GROUP BY 1, 2),
      |carr AS (
      |  SELECT label, list(m ORDER BY dim) AS cv FROM cent GROUP BY label),
      |cn AS (
      |  SELECT label, cv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> cv[i] * cv[i]), (x, y) -> x + y)) AS cnorm
      |  FROM carr),
      |sc AS (
      |  SELECT e.label, cn.cnorm,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> e.v[i] * cn.cv[i]), (x, y) -> x + y)
      |      / (SQRT(list_reduce(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]), (x, y) -> x + y)) * cn.cnorm)
      |      * 1e6 + 0.5) / 1e6 AS cos
      |  FROM e JOIN cn USING (label))
      |SELECT label, COUNT(*) AS n_vecs,
      |  FLOOR(MAX(cnorm) * 1e6 + 0.5) / 1e6 AS centroid_norm,
      |  FLOOR(CAST(CAST(SUM(CAST(cos AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6 AS mean_cos
      |FROM sc GROUP BY label ORDER BY label""".stripMargin

  // ------------------------------------------------------------------
  // ---------------------------------------------------------------- s09
  /** Int8-quantized inner-product top-k — the storage/bandwidth side of
    * vector search: symmetric scalar quantization q_i = round(x_i * 127 /
    * max|x|) (global max-abs scale, the simplest production scheme) and
    * ranking by the exact INTEGER dot product of the quantized vectors.
    * 4x less vector traffic than float32 at 100 TB, SIMD-friendly
    * accumulation, and — because everything after the (deterministic)
    * quantization step is integer math — the DuckDB oracle hash is exact
    * with no float-rounding escape hatch: a single off-by-one in any
    * quantized lane changes a dot product and fails the hash.
    *
    * Determinism notes: max-abs is an order-independent MAX (no float
    * sum); round() is half-away-from-zero in BOTH engines; int8 lanes
    * make the 64-dim dot <= 127*127*64 ~ 1e6, accumulated in long.
    * Plan shape: quantization is one map pass over the corpus scan; the
    * 1-row scale and the 5 quantized probes enter via broadcast; per-probe
    * top-10 fuses to WindowGroupLimit — the corpus is scanned once and
    * never pairwise-joined with itself.
    */
  def s09QuantizedAnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("embedding"))
    val mx = e.agg(max(expr(
      "aggregate(embedding, cast(0.0 as double), (m, x) -> greatest(m, abs(cast(x as double))))")).as("mx"))
    val q = e.crossJoin(broadcast(mx))
      .select(col("vec_id"), expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 127.0 / mx) as int))").as("qv"))
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("qv").as("pv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("qdot").desc, col("neighbor_id"))
    q.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        expr("aggregate(zip_with(qv, pv, (a, b) -> cast(a as bigint) * b), 0L, (acc, y) -> acc + y)").as("qdot"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("q_id"), col("rnk"), col("neighbor_id"), col("qdot"))
      .orderBy(col("q_id"), col("rnk"))
  }

  val s09Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |m AS (
      |  SELECT MAX(list_reduce(list_transform(v, x -> ABS(x)), (a, b) -> GREATEST(a, b))) AS mx FROM e),
      |q AS (
      |  SELECT vec_id, list_transform(v, x -> CAST(ROUND(x * 127.0 / mx) AS INT)) AS qv
      |  FROM e, m),
      |scored AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
      |    list_reduce(list_transform(generate_series(1, 64), i -> CAST(a.qv[i] AS BIGINT) * b.qv[i]), (x, y) -> x + y) AS qdot
      |  FROM q a JOIN q b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
      |ranked AS (
      |  SELECT q_id, neighbor_id, qdot,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY qdot DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT q_id, rnk, neighbor_id, qdot FROM ranked WHERE rnk <= 10
      |ORDER BY q_id, rnk""".stripMargin

  // ---------------------------------------------------------------- s10
  /** Hybrid retrieval with reciprocal-rank fusion — the RAG-era lookup
    * pattern: a sparse leg (t09's BM25 over the token stream) and a dense
    * leg (s01's exact cosine against a probe embedding) each produce a
    * top-20 ranked list, fused by RRF (Cormack et al. 2009):
    *
    *   rrf(doc) = sum over lists containing doc of 1 / (60 + rank)
    *
    * The probe is vec_id 0's embedding and the term set is t09's, with
    * doc_id = vec_id row alignment (TESTDATA builds both tables over the
    * same ids). Output: top-10 fused docs with both leg ranks (null when
    * a doc appears in only one list — the normal RRF case).
    *
    * Plan shape at 100 TB: each leg is already scale-shaped (BM25's
    * shuffle carries only query-term tokens; the dense leg is one corpus
    * scan — swap in s06's banded LSH leg when the corpus outgrows exact
    * scan). The fusion itself joins two 20-row lists — a broadcast-sized
    * full outer join no matter the corpus size.
    */
  /** Rank a bounded top-k list (the <=20-row output of an orderBy+limit)
    * WITHOUT a window: fold the list into ONE sorted array —
    * sort_array(collect_list(struct(-score, id))) gives (score desc, id
    * asc) — and posexplode it back out; rank = position + 1. One pass over
    * the already-cut input (no self-join recompute, the 20 structs fit in
    * a single agg buffer), identical to ROW_NUMBER because (score, id) is
    * unique. An unpartitioned row_number() window would also be correct on
    * 20 rows but plans as a single-partition WindowExec with a loud
    * "No Partition Defined" scale warning — and Spark 4's
    * EliminateWindowPartitions folds away a literal partition key, so the
    * single-partition choice can't be marked intentional. This shape keeps
    * operator code free of unpartitioned windows entirely.
    */
  private def rankBounded(top: DataFrame, score: String, id: String, rankName: String): DataFrame =
    top
      .agg(sort_array(collect_list(struct((-col(score)).as("ns"), col(id).as("i")))).as("xs"))
      .select(posexplode(col("xs")).as(Seq("pos", "x")))
      .select(col("x.i").as(id), (col("pos") + 1).cast(LongType).as(rankName))

  def s10HybridRrf(s: SparkSession, dir: String): DataFrame = {
    // Each leg cuts to top-20 via orderBy+limit (TakeOrderedAndProject:
    // per-partition heaps, no corpus-wide sort), then ranks the bounded
    // list via rankBounded — no single-partition window anywhere.
    val sparse = rankBounded(TextQueries.t09Bm25(s, dir), "bm25", "doc_id", "sparse_rank")
      .select(col("doc_id"), col("sparse_rank"))
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("v"), col("norm"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("norm").as("qnorm"))
    val denseTop = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("cosine", floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(20)
    val dense = rankBounded(denseTop, "cosine", "vec_id", "dense_rank")
      .select(col("vec_id").as("doc_id"), col("dense_rank"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        floor((coalesce(lit(1.0) / (lit(60) + col("sparse_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("dense_rank")), lit(0.0))) * 1e6 + 0.5) / 1e6)
      .select(col("doc_id"), col("sparse_rank"), col("dense_rank"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }

  /** t09's BM25 CTE chain + s01's cosine chain, fused with the same RRF
    * arithmetic. */
  val s10Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
      |  FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      |corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      |  WHERE tok IN ('spark', 'table', 'query') GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, COUNT(*) AS dfreq FROM tf GROUP BY tok),
      |bm AS (
      |  SELECT doc_id,
      |    FLOOR(SUM(
      |      ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0) * tf * 2.2 /
      |        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      |    ) * 10000.0 + 0.5) / 10000.0 AS bm25
      |  FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN corpus
      |  GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20),
      |sparse AS (
      |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS sparse_rank FROM bm),
      |e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |dense0 AS (
      |  SELECT c.vec_id AS doc_id,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i]), (x, y) -> x + y)
      |      / (q.nrm * c.nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM n q JOIN n c ON q.vec_id = 0 AND c.vec_id <> 0),
      |dense AS (
      |  SELECT doc_id, dense_rank FROM (
      |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS dense_rank FROM dense0)
      |  WHERE dense_rank <= 20)
      |SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id, sparse_rank, dense_rank,
      |  FLOOR((COALESCE(1.0 / (60 + sparse_rank), 0.0) + COALESCE(1.0 / (60 + dense_rank), 0.0)) * 1e6 + 0.5) / 1e6 AS rrf
      |FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- s11
  /** K-means topic-mixture audit — Lloyd's algorithm run EXACTLY, with a
    * bit-matching SQL oracle: k = 8 centroids seeded from vec_id 0..7,
    * two update rounds (cosine argmax assignment -> DECIMAL-exact per-dim
    * centroid means, s08's determinism recipe) and a final assignment,
    * rolled up per (cluster, source) against the documents table — the
    * "what topics does my corpus hold, per source" curation surface
    * (SemDeDup-style cluster-then-curate starts exactly like this).
    *
    * Every arithmetic step is order-independent: assignment cosines are
    * the same IEEE fold both engines run (graft_cosine keeps the HOF
    * accumulation order), argmax is a rank-1 window with the cell-id
    * tiebreak, and centroid means go through DECIMAL sums (Tables.davg /
    * VARCHAR-round-trip in DuckDB). Empty clusters (impossible with these
    * seeds, handled anyway) keep their previous centroid via the LEFT
    * JOIN + COALESCE, identically in both engines — so three rounds of
    * genuinely iterative ML hash-match the oracle.
    *
    * Plan shape at 100 TB: per round, ONE broadcast of k x 64 doubles
    * against the corpus scan (the window is 8 rows per vec_id — no
    * corpus-wide window), one (cell, dim)-keyed partial-agged mean
    * shuffle; lineage cut per round with localCheckpoint. That is the
    * standard distributed Lloyd's layout — cost k·d per row map-side,
    * k·d rows per shuffle.
    */
  def s11KmeansTopics(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir))
      .select(col("vec_id"), embD.as("v")).cache()
    try {
      e.count() // seeds, every assignment pass, and the rollup read it
      s11Build(s, dir, e)
        .localCheckpoint() // materialize before the cache below is released
    } finally {
      e.unpersist()
    }
  }

  /** Lazy body over an explicit (cached) embedding frame — also the
    * surface DumpPlans explains, so the final-pass plan (broadcast
    * centroids, 8-row argmax window, rollup) is visible instead of a
    * checkpoint leaf. */
  private[graft] def s11Build(s: SparkSession, dir: String, e: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    var cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"),
        posexplode(col("v")).as(Seq("dim", "m")))
      .localCheckpoint()
    def assign(c: DataFrame): DataFrame = {
      val carr = c.groupBy(col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), t -> t.m)").as("cv"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cell"))
      e.crossJoin(broadcast(carr))
        .withColumn("cos", expr("graft_cosine(v, cv)"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("cell"))
    }
    for (_ <- 1 to 2) {
      val upd = assign(cents)
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim")).agg(Tables.davg(col("x")).as("mn"))
      cents = cents.select(col("cell"), col("dim"), col("m").as("om"))
        .join(upd, Seq("cell", "dim"), "left")
        .select(col("cell"), col("dim"), coalesce(col("mn"), col("om")).as("m"))
        .localCheckpoint()
    }
    val byCluster = Window.partitionBy(col("cluster"))
    assign(cents)
      .join(Tables.documents(s, dir).select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      .groupBy(col("cell").as("cluster"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("cluster_total", sum(col("n_docs")).over(byCluster))
      .orderBy(col("cluster"), col("source"))
  }

  /** The same two updates + final assignment as chained CTEs. */
  val s11Sql: String = {
    val cos = (v: String, c: String) =>
      s"""list_reduce(list_transform(generate_series(1, 64), j -> $v[j] * $c[j]), (x, y) -> x + y)
         |          / (SQRT(list_reduce(list_transform(generate_series(1, 64), j -> $v[j] * $v[j]), (x, y) -> x + y))
         |             * SQRT(list_reduce(list_transform(generate_series(1, 64), j -> $c[j] * $c[j]), (x, y) -> x + y)))""".stripMargin
    def assignCte(i: Int): String =
      s"""a$i AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${cos("e.v", "c.cv")} DESC, c.cell) AS rn
         |    FROM e CROSS JOIN carr${i - 1} c) WHERE rn = 1)""".stripMargin
    def updateCte(i: Int): String =
      s"""cent$i AS (
         |  SELECT p.cell, p.dim, COALESCE(u.mn, p.m) AS m
         |  FROM cent${i - 1} p LEFT JOIN (
         |    SELECT cell, j AS dim,
         |      CAST(CAST(SUM(CAST(v[j] AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mn
         |    FROM a$i, unnest(generate_series(1, 64)) AS g(j) GROUP BY cell, j) u
         |  ON p.cell = u.cell AND p.dim = u.dim),
         |carr$i AS (SELECT cell, list(m ORDER BY dim) AS cv FROM cent$i GROUP BY cell)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent0 AS (
       |  SELECT CAST(vec_id AS INT) AS cell, j AS dim, v[j] AS m
       |  FROM e, unnest(generate_series(1, 64)) AS g(j) WHERE vec_id < 8),
       |carr0 AS (SELECT cell, list(m ORDER BY dim) AS cv FROM cent0 GROUP BY cell),
       |${assignCte(1)},
       |${updateCte(1)},
       |${assignCte(2)},
       |${updateCte(2)},
       |${assignCte(3)}
       |SELECT a3.cell AS cluster, d.source, COUNT(*) AS n_docs,
       |  CAST(SUM(COUNT(*)) OVER (PARTITION BY a3.cell) AS BIGINT) AS cluster_total
       |FROM a3 JOIN documents d ON a3.vec_id = d.doc_id
       |GROUP BY a3.cell, d.source
       |ORDER BY cluster, d.source""".stripMargin
  }

  // ---------------------------------------------------------------- s12
  /** Maximum-inner-product search (MIPS) top-k via the norm-augmentation
    * reduction (Bachrach et al. 2014; the transform behind asymmetric-LSH
    * MIPS, Shrivastava & Li 2014) — the retrieval mode recommender and
    * reward-model scorers need, where cosine is WRONG because vector
    * magnitude carries signal (popularity, confidence): argmax <q, x>,
    * not argmax angle.
    *
    * The reduction: with M = max corpus norm (an order-independent MAX —
    * no float-sum drift), augment every corpus vector with one extra
    * coordinate aug = sqrt(max(M^2 - |x|^2, 0)), so |x'| = M for every
    * row, and give queries aug 0. Then
    *
    *   cos(q', x') = <q, x> / (|q| * M)
    *
    * is a strictly increasing function of the inner product — cosine
    * machinery (s01's exact scan or s02's hyperplane bands) solves MIPS
    * unchanged. Ranking here uses the inner product itself (the monotone
    * image — immune to ULP collapse in the divided form); the emitted
    * aug_cosine column carries the full reduction arithmetic (M, the
    * augmented coordinate, both norms) through the DuckDB hash compare,
    * so the transform every downstream ANN variant would consume is
    * cross-engine-pinned, not decorative.
    *
    * The synthetic embeddings are unit-normalized (MIPS would collapse
    * to cosine and the augmented coordinate to 0), so the corpus side
    * carries a DETERMINISTIC per-row magnitude w = 1 + (vec_id mod 7)/4
    * — the stand-in for the popularity/confidence weight that makes MIPS
    * differ from angular search in production (on a real corpus the
    * magnitudes arrive with the vectors and this select drops out).
    * Probes stay unscaled. The spec asserts the reduction's monotonicity
    * (aug_cosine ordering == dot ordering) and that the magnitude
    * actually reorders at least one probe's top-1 vs pure cosine.
    *
    * Plan shape at 100 TB: M is a 1-row broadcast (like s09's scale);
    * augmentation is one map pass fused into the corpus scan; the 5
    * probes broadcast; per-probe top-10 fuses to WindowGroupLimit. The
    * sub-linear path is exactly s02 over the augmented vectors — same
    * bands, same buckets, nothing else changes; that composition is the
    * point of the reduction.
    */
  def s12MipsTopk(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.spread(Tables.embeddings(s, dir)).withColumn("v0", embD)
    val e = base
      .withColumn("w", lit(1.0) + (col("vec_id") % 7).cast(DoubleType) / 4.0)
      .withColumn("v", expr("transform(v0, x -> x * w)"))
      .withColumn("n2", dot("v", "v"))
      .select(col("vec_id"), col("v"), col("n2"))
    val m = e.agg(max(sqrt(col("n2"))).as("mx"))
    val aug = e.crossJoin(broadcast(m))
      .withColumn("aug", sqrt(greatest(col("mx") * col("mx") - col("n2"), lit(0.0))))
      .withColumn("anorm", sqrt(col("n2") + col("aug") * col("aug")))
      .select(col("vec_id"), col("v"), col("anorm"))
    val probes = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v0").as("qv"), sqrt(dot("v0", "v0")).as("qnorm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("dot").desc, col("neighbor_id"))
    aug.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .withColumn("raw", dot("qv", "v"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (floor(col("raw") * 1e6 + 0.5) / 1e6).as("dot"),
        (floor(col("raw") / (col("qnorm") * col("anorm")) * 1e6 + 0.5) / 1e6).as("aug_cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("q_id"), col("rnk"), col("neighbor_id"), col("dot"), col("aug_cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  val s12Sql: String =
    """WITH e0 AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |n AS (
      |  SELECT vec_id, v0,
      |    list_transform(v0, x -> x * (1.0 + CAST(vec_id % 7 AS DOUBLE) / 4.0)) AS v
      |  FROM e0),
      |n2t AS (
      |  SELECT vec_id, v0, v,
      |    list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y) AS n2
      |  FROM n),
      |m AS (SELECT MAX(SQRT(n2)) AS mx FROM n2t),
      |aug AS (
      |  SELECT vec_id, v,
      |    SQRT(n2 + SQRT(GREATEST(mx * mx - n2, 0)) * SQRT(GREATEST(mx * mx - n2, 0))) AS anorm
      |  FROM n2t, m),
      |probes AS (
      |  SELECT vec_id AS q_id, v0 AS qv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v0[i] * v0[i]), (x, y) -> x + y)) AS qnorm
      |  FROM n2t WHERE vec_id < 5),
      |scored AS (
      |  SELECT q_id, a.vec_id AS neighbor_id,
      |    list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * a.v[i]), (x, y) -> x + y) AS raw,
      |    qnorm, anorm
      |  FROM aug a JOIN probes ON a.vec_id <> q_id),
      |ranked AS (
      |  SELECT q_id, neighbor_id,
      |    FLOOR(raw * 1e6 + 0.5) / 1e6 AS dot,
      |    FLOOR(raw / (qnorm * anorm) * 1e6 + 0.5) / 1e6 AS aug_cosine,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY FLOOR(raw * 1e6 + 0.5) / 1e6 DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT q_id, rnk, neighbor_id, dot, aug_cosine FROM ranked WHERE rnk <= 10
      |ORDER BY q_id, rnk""".stripMargin

  // ---------------------------------------------------------------- s13
  /** Product-quantization ADC top-k (Jegou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
    * memory-bounded ANN layout: the 64-dim corpus collapses to M = 8
    * one-byte codes per vector (32x smaller than float32), probes score
    * candidates against code RECONSTRUCTIONS (asymmetric distance
    * computation) without touching original vectors, and only the ADC
    * shortlist would ever fetch raw floats. This is the billion-vector
    * regime's standard storage/compute trade (FAISS IVFPQ pairs exactly
    * this code path with s05's IVF cells).
    *
    * Determinism end to end, so a full PQ RESTATEMENT in DuckDB
    * hash-matches (recall quality is asserted separately in
    * Round5OpsSpec against the planted construction):
    *  - codebook: per-subspace slices of the per-label DECIMAL-mean
    *    centroids ([[codebook]] — reduction-order-independent), embedded
    *    as plan literals (k*dim doubles; bytes at any corpus scale);
    *  - encode: per subspace m, argmin over cells of the squared L2
    *    distance summed left-to-right over the 8 dims (bit-identical to
    *    DuckDB's list_reduce), rounded to 1e-6, ties to the smaller
    *    cell id — a pure map pass, no shuffle;
    *  - ADC: squared distance between the probe and the flat 64-dim
    *    reconstruction (disjoint subspaces make that exactly the sum of
    *    per-subspace table distances), same rounding; per-probe top-3 by
    *    (adc, vec_id) via one window (WindowGroupLimit partial heaps);
    *    the exact cosine of each returned candidate rides along, which
    *    is the rerank surface a production shortlist would re-score.
    *
    * Labels are the cell seed (dense 0..9 — asserted), matching s05's
    * quantizer so the two operators share one codebook contract. */
  /** PQ building blocks shared by s13 (flat ADC) and s15 (IVF-PQ) — the
    * arithmetic is an oracle contract, so it lives in exactly one place:
    * 8 subspaces x 8 dims over the [[codebook]] centroids; rounded
    * left-to-right squared-L2 folds; code ties to the smaller cell id.
    */
  private val PqM = 8 // subspaces; 64 dims / 8 = 8 dims per code

  /** Rounded sequential squared-L2 between an 8-dim slice of `vc` and a
    * literal centroid slice: (v[i]-c[i])^2 accumulated left-to-right. */
  private def pqSqdistSub(vc: Column, sub: Array[Double], m: Int): Column = {
    val subLit = array(sub.map(lit): _*)
    val diffs = zip_with(slice(vc, m * 8 + 1, 8), subLit, (x, y) => (x - y) * (x - y))
    floor(aggregate(diffs, lit(0.0), (acc, t) => acc + t) * 1e6 + 0.5) / 1e6
  }

  /** code_m = argmin cell of rounded sqdist, tie -> smaller cell id:
    * array_min over (d, cell) structs. */
  private def pqCodeCol(cents: Array[(Int, Array[Double], Double)], vc: Column, m: Int): Column = {
    val entries = array(cents.map { case (cell, cv, _) =>
      struct(pqSqdistSub(vc, cv.slice(m * 8, m * 8 + 8), m).as("d"),
        lit(cell).as("cell"))
    }: _*)
    array_min(entries).getField("cell")
  }

  /** Flat 64-dim PQ reconstruction of `vc`: concat of its coded subspace
    * centroids (disjoint subspaces make ADC on this exactly the summed
    * per-subspace table distances). */
  private def pqReconstruction(cents: Array[(Int, Array[Double], Double)], vc: Column): Column = {
    val subCb = (0 until PqM).map { m =>
      array(cents.map { case (_, cv, _) =>
        array(cv.slice(m * 8, m * 8 + 8).map(lit): _*)
      }: _*)
    }
    concat((0 until PqM).map(m => element_at(subCb(m), pqCodeCol(cents, vc, m) + 1)): _*)
  }

  def s13PqAdcAnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("label"), col("v"))
    val cents = codebook(e)
    require(cents.map(_._1).toSeq == (0 until cents.length),
      "PQ cell ids must be the dense label range — codebook indexing relies on it")
    val coded = e.select(col("vec_id"), col("v"),
      pqReconstruction(cents, col("v")).as("rv"))

    val q = plantedQueries(e.select(col("vec_id"), col("v")), k = 8, off = 213, factor = 0.1)
      .withColumn("qnorm", sqrt(dot("qv", "qv")))
    val adc = coded.crossJoin(broadcast(q))
      .withColumn("adc",
        floor(aggregate(zip_with(col("qv"), col("rv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, t) => acc + t) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .withColumn("norm", sqrt(dot("v", "v")))
      .withColumn("cosine",
        floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adc"), col("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Full PQ restatement: same codebook, encode, reconstruction and ADC
    * arithmetic — hash-equality audits every stage, not just recall. */
  val s13Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (
      |  SELECT label, j AS dim,
      |    CAST(CAST(SUM(CAST(v[j] AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      |  FROM e, unnest(generate_series(1, 64)) AS g(j) GROUP BY label, j),
      |carr AS (SELECT label, list(m ORDER BY dim) AS cv FROM cent GROUP BY label),
      |sq AS (
      |  SELECT e.vec_id, ms.m, c.label AS cell,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 8),
      |        j -> (e.v[ms.m * 8 + j] - c.cv[ms.m * 8 + j]) * (e.v[ms.m * 8 + j] - c.cv[ms.m * 8 + j])),
      |      (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS d
      |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS m) ms CROSS JOIN carr c),
      |codes AS (
      |  SELECT vec_id, m, cell FROM (
      |    SELECT vec_id, m, cell,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cell) AS rn
      |    FROM sq) WHERE rn = 1),
      |rv AS (
      |  SELECT codes.vec_id,
      |    flatten(list(c.cv[codes.m * 8 + 1 : codes.m * 8 + 8] ORDER BY codes.m)) AS rv
      |  FROM codes JOIN carr c ON codes.cell = c.label GROUP BY codes.vec_id),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 213) % cnt.n
      |  WHERE b.vec_id < 8),
      |adc AS (
      |  SELECT q.q_id, r.vec_id, q.qv,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64),
      |        i -> (q.qv[i] - r.rv[i]) * (q.qv[i] - r.rv[i])),
      |      (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS adc
      |  FROM q CROSS JOIN rv r),
      |topk AS (
      |  SELECT q_id, vec_id, qv, adc,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
      |  FROM adc)
      |SELECT t.q_id, t.rank, t.vec_id AS neighbor_id, t.adc,
      |  FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> t.qv[i] * e.v[i]), (a, b) -> a + b)
      |    / (SQRT(list_reduce(list_transform(generate_series(1, 64), i -> t.qv[i] * t.qv[i]), (a, b) -> a + b))
      |       * SQRT(list_reduce(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]), (a, b) -> a + b)))
      |    * 1e6 + 0.5) / 1e6 AS cosine
      |FROM topk t JOIN e ON t.vec_id = e.vec_id
      |WHERE t.rank <= 3
      |ORDER BY t.q_id, t.rank""".stripMargin

  // ---------------------------------------------------------------- s14
  /** Radius (range) search with GUARANTEED-complete cell pruning — "every
    * neighbor with cosine >= tau", the retrieval mode dedup audits and
    * near-dup sweeps need (top-k is the wrong contract there: the answer
    * set size is data-dependent). Unlike fixed-nProbe ANN, the pruning
    * here is exact, via the angular triangle inequality:
    *
    *   angle(q, x) >= angle(q, c) - radius(c)   for any x stored in cell c
    *
    * where radius(c) = max angle from centroid c to its members (computed
    * once per cell during assignment — codebook metadata, k doubles). A
    * cell is scanned iff cos(max(0, angle(q,c) - radius(c))) can still
    * reach tau; anything excluded provably contains no qualifying vector,
    * so the scoped search returns EXACTLY the brute-force answer — which
    * is what lets DuckDB's corpus-wide scan hash-audit a pruned plan.
    * Slack 1e-9 on the bound absorbs acos ulp jitter; over-inclusion only
    * costs the exact-cosine filter downstream, never correctness.
    *
    * Scale shape: the codebook + radii are k rows collected once (the
    * standard IVF contract — bytes even at 100 TB); per-query cell
    * selection is a codegen'd literal-array filter, candidates flow
    * through one broadcast join on cell id, and only qualifying cells'
    * vectors are scored. The recall/cost dial of s05 without the recall
    * loss.
    */
  def s14RangeSearch(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("label"), col("v"))
    val q = plantedQueries(e.select(col("vec_id"), col("v")), k = 8, off = 171, factor = 0.1)
    s14Search(s, e, q, tau = 0.3)
  }

  /** The s14 engine over arbitrary (vec_id, label, v) corpus and
    * (q_id, qv) query frames — parameterized so the spec can drive it
    * with engineered tight-cluster geometry, where the pruning bound
    * actually excludes cells (the synthetic testdata's cells are
    * near-random inside, radius ~85 deg, so the bound degrades to a full
    * scan there — exactness holds either way, which is the point of the
    * brute-force oracle). */
  private[graft] def s14Search(s: SparkSession, e0: DataFrame, q0: DataFrame,
      tau: Double): DataFrame = {
    val (cents, radii, assigned) = s14Metadata(s, e0)
    val q = q0.withColumn("qnorm", sqrt(dot("qv", "qv")))
    val probed = q.select(col("q_id"), col("qv"), col("qnorm"),
      explode(reachableCells(cents, radii, col("qv"), tau)).as("cell"))
    assigned.join(broadcast(probed), Seq("cell"))
      .withColumn("cosine", floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
      .filter(col("cosine") >= tau)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  /** Codebook + per-cell max member angle (radius) + the assigned corpus —
    * s14's collected metadata. radius(c) comes through the same codegen'd
    * cosine the assignment used; max() is order-independent, and the
    * k-row collect is the codebook-metadata contract, not a corpus-sized
    * driver pull. */
  private[graft] def s14Metadata(s: SparkSession, e0: DataFrame)
      : (Array[(Int, Array[Double], Double)], Map[Int, Double], DataFrame) = {
    import s.implicits._
    val e = e0.withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    val cents = codebook(e)
    val assigned = e
      .withColumn("cell", element_at(probeCells(cents, col("v"), 1), 1))
      .select(col("cell"), col("vec_id"), col("v"), col("norm"))
      .localCheckpoint() // two readers: the radius pass and the scan
    graft.functions.GraftFunctions.register(s)
    val centDf = cents.toSeq.map { case (c, cv, _) => (c, cv.toSeq) }.toDF("cell", "cv")
    val radii: Map[Int, Double] = assigned.join(broadcast(centDf), "cell")
      .select(col("cell"),
        acos(least(lit(1.0), greatest(lit(-1.0),
          call_function("graft_cosine", col("cv"), col("v"))))).as("ang"))
      .groupBy(col("cell")).agg(max(col("ang")).as("radius"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (cents, radii, assigned)
  }

  /** Cells whose angular lower bound can still reach `tau` for the query
    * vector `vc` — s14's exact pruning predicate, factored out so the
    * spec can count probed cells independently of the search itself.
    * Codegen'd literal-array filter over the codebook; zero exchange. */
  private[graft] def reachableCells(cents: Array[(Int, Array[Double], Double)],
      radii: Map[Int, Double], vc: Column, tau: Double): Column = {
    val entries = array(cents.map { case (cell, cv, _) =>
      val csim = call_function("graft_cosine", array(cv.map(lit): _*), vc)
      val lb = cos(greatest(lit(0.0),
        acos(least(lit(1.0), greatest(lit(-1.0), csim))) - lit(radii(cell) + 1e-9)))
      struct(lb.as("lb"), lit(cell).as("cell"))
    }: _*)
    transform(
      filter(entries, st => st.getField("lb") >= lit(tau - 1e-6)),
      st => st.getField("cell"))
  }

  /** (q_id, n_probed, k_cells) per query — the pruning witness the spec
    * asserts on engineered tight-cluster geometry (see [[s14Search]]'s
    * note on why the testdata itself cannot prune). */
  private[graft] def s14ProbeCounts(s: SparkSession, e0: DataFrame, q0: DataFrame,
      tau: Double): DataFrame = {
    val (cents, radii, _) = s14Metadata(s, e0)
    q0.select(col("q_id"),
      size(reachableCells(cents, radii, col("qv"), tau)).as("n_probed"),
      lit(cents.length).as("k_cells"))
  }

  /** Corpus-wide brute force at the same threshold — the pruned plan must
    * return exactly this set. */
  val s14Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 171) % cnt.n
      |  WHERE b.vec_id < 8),
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
      |  FROM qn CROSS JOIN cn)
      |SELECT q_id, neighbor_id, cosine FROM scored WHERE cosine >= 0.3
      |ORDER BY q_id, neighbor_id""".stripMargin

  // ---------------------------------------------------------------- s15
  /** IVF-PQ — the two memory/compute bounds COMPOSED, which is the actual
    * billion-vector production layout (FAISS `IVFxx,PQ8`): the IVF coarse
    * quantizer bounds WHICH vectors a probe scores (s05's cell-scoped
    * candidate generation, 2-probe), and PQ-ADC bounds WHAT is read per
    * scored vector (s13's 8-byte codes against reconstructions — never
    * the raw floats). Per query the work is |2 cells| * one table-lookup
    * distance; at 100 TB that is the difference between scanning 100 TB
    * of floats and ~3 GB of codes per probed cell group.
    *
    * Non-residual variant (PQ codes the raw vector, not the residual
    * v - centroid, matching FAISS's by_residual=false): residual coding
    * would need a second codebook contract for no audit benefit here.
    *
    * Determinism: every stage is the already-oracle-pinned arithmetic —
    * cell argmax over the exact DECIMAL-mean codebook (s05's contract,
    * restated in SQL via the same fused-fold cosine graft_cosine
    * bit-matches), PQ encode/reconstruction/ADC (s13's contract), so the
    * DuckDB restatement hash-audits the COMPOSITION end to end: a
    * candidate appears iff its cell is probed, and ranks by the same
    * rounded ADC. Round6OpsSpec asserts recall: every planted query
    * retrieves its base vector at rank 1 through the composed path.
    */
  def s15IvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("label"), col("v"))
    val cents = codebook(e)
    require(cents.map(_._1).toSeq == (0 until cents.length),
      "PQ cell ids must be the dense label range — codebook indexing relies on it")
    // corpus side: one map pass assigns the IVF cell AND the PQ
    // reconstruction — no shuffle, no join; at scale this materializes
    // once as the index table (cell, vec_id, codes)
    val coded = e
      .withColumn("cell", element_at(probeCells(cents, col("v"), 1), 1))
      .select(col("cell"), col("vec_id"), col("v"),
        pqReconstruction(cents, col("v")).as("rv"))
    val q = plantedQueries(e.select(col("vec_id"), col("v")), k = 8, off = 137, factor = 0.1)
      .withColumn("qnorm", sqrt(dot("qv", "qv")))
      .select(col("q_id"), col("qv"), col("qnorm"),
        explode(probeCells(cents, col("qv"), 2)).as("cell"))
    // candidates = probed cells only; each vector lives in exactly one
    // cell, so the equi-join cannot duplicate a candidate per query
    val cand = coded.join(broadcast(q), Seq("cell"))
      .withColumn("adc",
        floor(aggregate(zip_with(col("qv"), col("rv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, t) => acc + t) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .withColumn("norm", sqrt(dot("v", "v")))
      .withColumn("cosine",
        floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
      .select(col("q_id"), col("rank"), col("cell"),
        col("vec_id").as("neighbor_id"), col("adc"), col("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Full IVF-PQ restatement: the s13 PQ chain plus cell assignment and
    * probe selection by the same unrounded fused-fold cosine ordering
    * (ties toward the larger cell id, as probeCells' reverse(sort)). */
  val s15Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (
      |  SELECT label, j AS dim,
      |    CAST(CAST(SUM(CAST(v[j] AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      |  FROM e, unnest(generate_series(1, 64)) AS g(j) GROUP BY label, j),
      |carr AS (
      |  SELECT label, cv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> cv[i] * cv[i]), (a, b) -> a + b)) AS cnrm
      |  FROM (SELECT label, list(m ORDER BY dim) AS cv FROM cent GROUP BY label)),
      |vn AS (
      |  SELECT vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (a, b) -> a + b)) AS nrm
      |  FROM e),
      |assign AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vn.vec_id, c.label AS cell,
      |      ROW_NUMBER() OVER (PARTITION BY vn.vec_id ORDER BY
      |        list_reduce(list_transform(generate_series(1, 64), i -> vn.v[i] * c.cv[i]), (a, b) -> a + b)
      |          / (vn.nrm * c.cnrm) DESC, c.label DESC) AS rn
      |    FROM vn CROSS JOIN carr c) WHERE rn = 1),
      |sq AS (
      |  SELECT e.vec_id, ms.m, c.label AS cell,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 8),
      |        j -> (e.v[ms.m * 8 + j] - c.cv[ms.m * 8 + j]) * (e.v[ms.m * 8 + j] - c.cv[ms.m * 8 + j])),
      |      (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS d
      |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS m) ms CROSS JOIN carr c),
      |codes AS (
      |  SELECT vec_id, m, cell FROM (
      |    SELECT vec_id, m, cell,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cell) AS rn
      |    FROM sq) WHERE rn = 1),
      |rv AS (
      |  SELECT codes.vec_id,
      |    flatten(list(c.cv[codes.m * 8 + 1 : codes.m * 8 + 8] ORDER BY codes.m)) AS rv
      |  FROM codes JOIN carr c ON codes.cell = c.label GROUP BY codes.vec_id),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 137) % cnt.n
      |  WHERE b.vec_id < 8),
      |qn AS (
      |  SELECT q_id, qv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]), (a, b) -> a + b)) AS qnrm
      |  FROM q),
      |probe AS (
      |  SELECT q_id, cell FROM (
      |    SELECT qn.q_id, c.label AS cell,
      |      ROW_NUMBER() OVER (PARTITION BY qn.q_id ORDER BY
      |        list_reduce(list_transform(generate_series(1, 64), i -> qn.qv[i] * c.cv[i]), (a, b) -> a + b)
      |          / (qn.qnrm * c.cnrm) DESC, c.label DESC) AS pr
      |    FROM qn CROSS JOIN carr c) WHERE pr <= 2),
      |cand AS (
      |  SELECT p.q_id, a.cell, r.vec_id, qn.qv, qn.qnrm,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64),
      |        i -> (qn.qv[i] - r.rv[i]) * (qn.qv[i] - r.rv[i])),
      |      (a2, b2) -> a2 + b2) * 1e6 + 0.5) / 1e6 AS adc
      |  FROM probe p JOIN assign a ON p.cell = a.cell
      |    JOIN rv r ON a.vec_id = r.vec_id
      |    JOIN qn ON qn.q_id = p.q_id),
      |topk AS (
      |  SELECT q_id, cell, vec_id, qv, qnrm, adc,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
      |  FROM cand)
      |SELECT t.q_id, t.rank, t.cell, t.vec_id AS neighbor_id, t.adc,
      |  FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> t.qv[i] * e.v[i]), (a, b) -> a + b)
      |    / (t.qnrm * SQRT(list_reduce(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]), (a, b) -> a + b)))
      |    * 1e6 + 0.5) / 1e6 AS cosine
      |FROM topk t JOIN e ON t.vec_id = e.vec_id
      |WHERE t.rank <= 3
      |ORDER BY t.q_id, t.rank""".stripMargin

  // ---------------------------------------------------------------- s16
  /** Multi-vector late-interaction retrieval (MaxSim — the ColBERT
    * scoring rule, Khattab & Zaharia 2020): documents and queries are
    * BAGS of token vectors, and
    *
    *   score(q, d) = sum over query tokens t of max over doc tokens b of
    *                 cos(q_t, d_b)
    *
    * — each query token independently finds its best-matching doc token,
    * so precise term-level matches survive pooling (the property single-
    * vector retrieval loses). Token vectors here are the 4 disjoint
    * 16-dim slices of the embedding column (the corpus ships one vector
    * per doc; slicing yields a deterministic multi-vector surrogate with
    * the real storage layout: array column, fixed token count).
    *
    * Composed retrieval shape (the production ColBERT layout): a FIRST-
    * PASS index stage bounds the scored set — the IVF coarse quantizer
    * from s05/s15 probes the query's 2 nearest cells and only vectors in
    * those cells reach the MaxSim scorer — then MaxSim RERANKS the
    * shortlist for the top-5. Per query the late-interaction work is
    * O(|2 cells|), not O(corpus): at 100 TB that is the difference
    * between a full-corpus 16x16-slice scoring scan per query and a few
    * probed-cell reads (the round-6 full-scan form was the one
    * similarity op with no candidate-bounding stage; its SCALE row was
    * linear-in-corpus).
    *
    * The output contract is rerank-of-the-shortlist, NOT exhaustive
    * MaxSim — deliberately, and measurably so: on this corpus's generic
    * (non-MRL, non-ColBERT-trained) embeddings the full-scan MaxSim
    * top-5 tail is UNCORRELATED with the coarse quantizer — restating
    * the full scan as the oracle was measured to need probe rank up to
    * 10 of 10 cells at every sf (i.e. recall of the exhaustive top-5
    * requires scanning everything, which is no index at all). What IS
    * structural is rank-1 recall: the planted base sits in the query's
    * top-2 probed cells at every sf (measured probe rank 1, worst case
    * 2), so the rerank returns the true best hit — exactly the contract
    * a first-pass+rerank stack ships with. The DuckDB oracle therefore
    * hash-audits the COMPOSITION end to end (cell assignment, probe
    * selection, MaxSim arithmetic over the candidate set — the s15
    * pattern), and Round7OpsSpec pins the recall contract against the
    * full-scan HOF reference.
    *
    * Shape at 100 TB: per (query, candidate) the 4x4 slice cosines run
    * inside one fused codegen expression — no explode, no shuffle of
    * token rows (the naive layout, one ROW per token vector, would
    * shuffle 4x the rows through a groupBy(doc) to reassemble MaxSim;
    * keeping the bag in ONE array row makes late interaction a scalar
    * expression). Per-query top-5 via the same WindowGroupLimit heap as
    * s01.
    */
  /** The HOF spelling of MaxSim — the readable reference whose fold order
    * defines the oracle contract (it IS s16Sql, translated). s16 itself
    * scores through the fused codegen [[graft.functions.MaxSimScore]]
    * expression, which Round6OpsSpec proves bit-identical to this form;
    * nested HOFs are interpreted, so the hot path must not run them. */
  private[graft] val maxSimHof = expr(
    """aggregate(sequence(0, 3), cast(0.0 as double), (acc, t) -> acc +
      |  array_max(transform(sequence(0, 3), b ->
      |    aggregate(zip_with(slice(qv, t * 16 + 1, 16), slice(v, b * 16 + 1, 16), (x, y) -> x * y),
      |              cast(0.0 as double), (a2, p) -> a2 + p)
      |    / (sqrt(aggregate(transform(slice(qv, t * 16 + 1, 16), x -> x * x),
      |              cast(0.0 as double), (a3, p) -> a3 + p))
      |       * sqrt(aggregate(transform(slice(v, b * 16 + 1, 16), x -> x * x),
      |              cast(0.0 as double), (a4, p) -> a4 + p))))))""".stripMargin)

  def s16MaxSim(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("label"), col("v"))
    val cents = codebook(e)
    // first pass: one map pass assigns each corpus vector its IVF cell —
    // at scale this is the stored index layout (cell, vec_id, v)
    val coded = e
      .withColumn("cell", element_at(probeCells(cents, col("v"), 1), 1))
      .select(col("cell"), col("vec_id"), col("v"))
    val q = plantedQueries(e.select(col("vec_id"), col("v")), k = 5, off = 157, factor = 0.1)
      .select(col("q_id"), col("qv"), explode(probeCells(cents, col("qv"), 2)).as("cell"))
    // candidates = probed cells only; each vector lives in exactly one
    // cell, so the equi-join cannot duplicate a candidate per query
    val cand = coded.join(broadcast(q), Seq("cell"))
    // rerank: sum_t max_b cos(slice_t(qv), slice_b(v)) — fused codegen
    // loop nest, bit-identical to maxSimHof / the DuckDB list_reduce folds
    val maxSim = call_function("graft_maxsim", col("qv"), col("v"), lit(4))
    // the base vector is NOT excluded: retrieving the planted base at
    // rank 1 through late interaction is the recall contract the spec
    // pins (a rerank shortlist naturally contains the top candidate)
    val scored = cand.withColumn("maxsim", floor(maxSim * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("maxsim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("maxsim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** The full composition restated: exact-DECIMAL codebook, cell argmax,
    * 2-probe selection (same unrounded cosine ordering, ties toward the
    * larger cell id), then the MaxSim nested list lambdas over the SAME
    * slice boundaries and fold orders — scored over the candidate set
    * only. A candidate appears iff its cell is probed, so the hash
    * audits the index stage and the rerank together (the s15 contract
    * applied to late interaction). */
  val s16Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (
      |  SELECT label, j AS dim,
      |    CAST(CAST(SUM(CAST(v[j] AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      |  FROM e, unnest(generate_series(1, 64)) AS g(j) GROUP BY label, j),
      |carr AS (
      |  SELECT label, cv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> cv[i] * cv[i]), (a, b) -> a + b)) AS cnrm
      |  FROM (SELECT label, list(m ORDER BY dim) AS cv FROM cent GROUP BY label)),
      |vn AS (
      |  SELECT vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (a, b) -> a + b)) AS nrm
      |  FROM e),
      |assign AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vn.vec_id, c.label AS cell,
      |      ROW_NUMBER() OVER (PARTITION BY vn.vec_id ORDER BY
      |        list_reduce(list_transform(generate_series(1, 64), i -> vn.v[i] * c.cv[i]), (a, b) -> a + b)
      |          / (vn.nrm * c.cnrm) DESC, c.label DESC) AS rn
      |    FROM vn CROSS JOIN carr c) WHERE rn = 1),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 157) % cnt.n
      |  WHERE b.vec_id < 5),
      |qn AS (
      |  SELECT q_id, qv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]), (a, b) -> a + b)) AS qnrm
      |  FROM q),
      |probe AS (
      |  SELECT q_id, cell FROM (
      |    SELECT qn.q_id, c.label AS cell,
      |      ROW_NUMBER() OVER (PARTITION BY qn.q_id ORDER BY
      |        list_reduce(list_transform(generate_series(1, 64), i -> qn.qv[i] * c.cv[i]), (a, b) -> a + b)
      |          / (qn.qnrm * c.cnrm) DESC, c.label DESC) AS pr
      |    FROM qn CROSS JOIN carr c) WHERE pr <= 2),
      |scored AS (
      |  SELECT qn.q_id, a.vec_id,
      |    FLOOR(list_reduce(list_transform(generate_series(0, 3), t ->
      |      list_max(list_transform(generate_series(0, 3), b ->
      |        list_reduce(list_transform(generate_series(1, 16), j -> qn.qv[t * 16 + j] * e.v[b * 16 + j]), (a2, p) -> a2 + p)
      |        / (SQRT(list_reduce(list_transform(generate_series(1, 16), j -> qn.qv[t * 16 + j] * qn.qv[t * 16 + j]), (a3, p) -> a3 + p))
      |           * SQRT(list_reduce(list_transform(generate_series(1, 16), j -> e.v[b * 16 + j] * e.v[b * 16 + j]), (a4, p) -> a4 + p)))))),
      |      (acc, t2) -> acc + t2) * 1e6 + 0.5) / 1e6 AS maxsim
      |  FROM probe p JOIN assign a ON p.cell = a.cell
      |    JOIN e ON e.vec_id = a.vec_id
      |    JOIN qn ON qn.q_id = p.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id, maxsim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY maxsim DESC, vec_id) AS rnk
      |  FROM scored)
      |SELECT q_id, rnk, vec_id AS neighbor_id, maxsim
      |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  // ---------------------------------------------------------------- s17
  /** Matryoshka / dimension-truncation quality audit (Kusupati et al.,
    * "Matryoshka Representation Learning", NeurIPS 2022): how much
    * retrieval quality survives if the index stores only the FIRST 16 of
    * 64 dims? For each planted query, rank the corpus by full-dim cosine
    * and by truncated-prefix cosine, and report top-10 overlap plus where
    * the true top-1 lands in the truncated ranking. This is the sizing
    * audit a 100 TB vector deployment runs before committing to a
    * truncated index tier (4x smaller index, 4x cheaper scan — the audit
    * says what recall that buys at YOUR data's geometry; MRL-trained
    * embeddings approach overlap 1.0, generic ones — like this corpus's —
    * measure lower, which is exactly the point of auditing).
    *
    * Shape: ONE corpus scan; both cosines are fused-loop expressions over
    * the same row, both ranks come from windows sharing the q_id
    * partitioning (one exchange, stacked Window operators). Integer-exact
    * output (common counts and ranks), so the oracle hash-matches without
    * any float rounding contract.
    */
  def s17Matryoshka(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("v"))
    val q = plantedQueries(e, k = 5, off = 191, factor = 0.1)
    val scored = e.crossJoin(broadcast(q))
      .withColumn("fcos", call_function("graft_cosine", col("qv"), col("v")))
      .withColumn("tcos", call_function("graft_cosine",
        slice(col("qv"), 1, 16), slice(col("v"), 1, 16)))
    val wF = Window.partitionBy(col("q_id")).orderBy(col("fcos").desc, col("vec_id"))
    val wT = Window.partitionBy(col("q_id")).orderBy(col("tcos").desc, col("vec_id"))
    val ranked = scored
      .withColumn("rank_full", row_number().over(wF).cast(LongType))
      .withColumn("rank_trunc", row_number().over(wT).cast(LongType))
    val fullTop = ranked.filter(col("rank_full") <= 10)
      .select(col("q_id"), col("vec_id"), col("rank_full"))
    val truncTop = ranked.filter(col("rank_trunc") <= 10)
      .select(col("q_id"), col("vec_id"), col("rank_trunc"))
    fullTop.join(truncTop, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(
        count(col("rank_trunc")).as("n_common"),
        max(when(col("rank_full") === 1L, coalesce(col("rank_trunc"), lit(-1L))))
          .as("top1_trunc_rank"))
      .orderBy(col("q_id"))
  }

  /** Same double ranking and overlap arithmetic; the truncated cosine is
    * the identical fold over the first 16 dims. */
  val s17Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 191) % cnt.n
      |  WHERE b.vec_id < 5),
      |scored AS (
      |  SELECT q.q_id, e.vec_id,
      |    list_reduce(list_transform(generate_series(1, 64), i -> q.qv[i] * e.v[i]), (a, b) -> a + b)
      |      / (SQRT(list_reduce(list_transform(generate_series(1, 64), i -> q.qv[i] * q.qv[i]), (a, b) -> a + b))
      |         * SQRT(list_reduce(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]), (a, b) -> a + b))) AS fcos,
      |    list_reduce(list_transform(generate_series(1, 16), i -> q.qv[i] * e.v[i]), (a, b) -> a + b)
      |      / (SQRT(list_reduce(list_transform(generate_series(1, 16), i -> q.qv[i] * q.qv[i]), (a, b) -> a + b))
      |         * SQRT(list_reduce(list_transform(generate_series(1, 16), i -> e.v[i] * e.v[i]), (a, b) -> a + b))) AS tcos
      |  FROM q CROSS JOIN e),
      |ranked AS (
      |  SELECT q_id, vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY fcos DESC, vec_id) AS rank_full,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY tcos DESC, vec_id) AS rank_trunc
      |  FROM scored),
      |f AS (SELECT q_id, vec_id, rank_full FROM ranked WHERE rank_full <= 10),
      |t AS (SELECT q_id, vec_id, rank_trunc FROM ranked WHERE rank_trunc <= 10)
      |SELECT f.q_id, COUNT(t.rank_trunc) AS n_common,
      |  CAST(MAX(CASE WHEN f.rank_full = 1 THEN COALESCE(t.rank_trunc, -1) END) AS BIGINT) AS top1_trunc_rank
      |FROM f LEFT JOIN t ON f.q_id = t.q_id AND f.vec_id = t.vec_id
      |GROUP BY f.q_id ORDER BY f.q_id""".stripMargin

  // ---------------------------------------------------------------- s18
  /** Binary (sign) quantization ANN — the 1-bit compression tier under
    * the int8 (s09) and PQ (s13/s15) codecs: each 64-dim vector folds to
    * a 64-bit sign bitmap (bit i set iff v[i] > 0), Hamming distance on
    * the bitmaps approximates angular distance (for unit-ish vectors,
    * E[hamming] = 64 * theta / pi — the same sign-agreement geometry the
    * s02 hyperplane family exploits, except the "hyperplanes" are the
    * coordinate axes, so the code IS the vector's sign pattern and costs
    * zero dot products to build). The modern binary-embedding serving
    * stack (RaBitQ / Cohere-style BQ) is exactly this two-stage read:
    *
    *   1. shortlist: scan 8-byte codes, keep the 32 Hamming-nearest
    *      per query (XOR + popcount — ~4 cycles/vector, 32x less memory
    *      bandwidth than the float scan);
    *   2. rerank: exact float cosine over the 32 survivors only.
    *
    * At 100 TB the code table is 1/32 the corpus bytes (the difference
    * between a memory-resident index and a disk scan); the rerank
    * touches a bounded per-query set. Codes live in two BIGINT halves
    * (32 bits each) rather than one 64-bit word so every intermediate
    * stays inside non-negative int64 in BOTH engines — bit 63 of a
    * packed single word would need unsigned semantics DuckDB and Spark
    * don't share.
    *
    * Shortlist + rerank are both deterministic (Hamming ties -> smaller
    * vec_id; cosine rounded to 1e-6, ties -> smaller vec_id), so the
    * DuckDB oracle restates the full composition — code construction,
    * XOR/popcount shortlist, float rerank — and the hash audits it end
    * to end. Recall (planted base at rank 1) is pinned by Round7OpsSpec
    * against the s01 exact scan.
    *
    * Plan: codes are one map pass (HOF fold — a signature-build stage,
    * not the hot loop; the hot loop is the XOR/popcount comparison,
    * which runs on two codegen'd long columns). Query side broadcast;
    * per-query top-32/top-5 via the WindowGroupLimit heap (s01's shape).
    */
  private def signCode(vc: String, lo: Int): Column = expr(
    s"aggregate(sequence(0, 31), 0L, (acc, i) -> acc + if(element_at($vc, i + ${lo + 1}) > 0d, shiftleft(1L, i), 0L))")

  def s18BinaryAnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("v"))
    val coded = e
      .withColumn("code_lo", signCode("v", 0))
      .withColumn("code_hi", signCode("v", 32))
    val q = plantedQueries(e, k = 5, off = 211, factor = 0.1)
      .withColumn("q_lo", signCode("qv", 0))
      .withColumn("q_hi", signCode("qv", 32))
      .withColumn("qnorm", sqrt(dot("qv", "qv")))
    // the planted base is NOT excluded: its code sits a few sign flips
    // from the query's, so surviving the Hamming shortlist and landing
    // at rank 1 through the float rerank IS the recall contract
    val scored = coded.crossJoin(broadcast(q))
      .withColumn("hamming",
        (bit_count(col("code_lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("code_hi").bitwiseXOR(col("q_hi")))).cast(LongType))
    val wH = Window.partitionBy(col("q_id")).orderBy(col("hamming").asc, col("vec_id"))
    val shortlist = scored.withColumn("hrnk", row_number().over(wH)).filter(col("hrnk") <= 32)
    val reranked = shortlist
      .withColumn("cosine",
        floor(dot("qv", "v") / (col("qnorm") * sqrt(dot("v", "v"))) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    reranked.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("hamming"), col("cosine"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** The identical two-stage read: sign codes as two 32-bit halves in
    * BIGINT, xor + bit_count shortlist of 32, exact-cosine rerank with
    * the same rounding and tie-breaks. */
  val s18Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |code AS (
      |  SELECT vec_id, v,
      |    list_reduce(list_transform(generate_series(1, 32),
      |      i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END), (a, b) -> a + b) AS code_lo,
      |    list_reduce(list_transform(generate_series(33, 64),
      |      i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 33)) ELSE 0::BIGINT END), (a, b) -> a + b) AS code_hi
      |  FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 211) % cnt.n
      |  WHERE b.vec_id < 5),
      |qc AS (
      |  SELECT q_id, qv,
      |    list_reduce(list_transform(generate_series(1, 32),
      |      i -> CASE WHEN qv[i] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END), (a, b) -> a + b) AS q_lo,
      |    list_reduce(list_transform(generate_series(33, 64),
      |      i -> CASE WHEN qv[i] > 0 THEN (1::BIGINT << (i - 33)) ELSE 0::BIGINT END), (a, b) -> a + b) AS q_hi,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]), (a, b) -> a + b)) AS qnrm
      |  FROM q),
      |ham AS (
      |  SELECT qc.q_id, c.vec_id, qc.qv, c.v, qc.qnrm,
      |    CAST(bit_count(xor(c.code_lo, qc.q_lo)) + bit_count(xor(c.code_hi, qc.q_hi)) AS BIGINT) AS hamming
      |  FROM code c CROSS JOIN qc),
      |short AS (
      |  SELECT q_id, vec_id, qv, v, qnrm, hamming,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS hrnk
      |  FROM ham),
      |rer AS (
      |  SELECT q_id, vec_id, hamming,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * v[i]), (a, b) -> a + b)
      |      / (qnrm * SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (a, b) -> a + b)))
      |      * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM short WHERE hrnk <= 32),
      |ranked AS (
      |  SELECT q_id, vec_id, hamming, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rnk
      |  FROM rer)
      |SELECT q_id, rnk, vec_id AS neighbor_id, hamming, cosine FROM ranked WHERE rnk <= 5
      |ORDER BY q_id, rnk""".stripMargin

  // ---------------------------------------------------------------- s19
  /** IVF nprobe OPERATING-POINT sweep — the third member of the
    * index-tuning-audit family (s17 truncation, d14 estimator
    * calibration): before a deployment fixes nprobe, measure the
    * recall-vs-scan-cost frontier on real data. For nprobe in {1, 2, 4}
    * the audit reports, summed over 10 planted queries: how many
    * candidates the probed cells actually admit (the cost axis — what
    * the serving fleet pays per query), exact-top-1 agreement, and
    * top-10 overlap against the exhaustive scan (the recall axis). The
    * published row set IS the tuning curve an operator reads to pick
    * the knee.
    *
    * Cost discipline: the sweep scores the WIDEST setting's candidate
    * frame once (probe_rank <= 4, each candidate row tagged with the
    * rank of its cell in the query's probe order) and derives every
    * narrower setting by filtering that one frame — 3 settings cost 1
    * scan, which is how a production sweep must work (re-scanning per
    * setting would triple the audit's IO for identical information).
    *
    * Hash contract: cell assignment and probe order use the ROUNDED
    * centroid cosine with ties to the larger cell (d15's convention —
    * argmax on raw doubles is not a cross-engine contract at 1e-6
    * granularity); candidate cosines round 1e-6; all published columns
    * are integers. The oracle restates assignment, probe ranking,
    * scoring and both recall joins end to end.
    */
  def s19NprobeSweep(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .select(col("vec_id"), col("label"), col("v"))
    val cents = codebook(e)
    def entries(vc: Column): Column = array(cents.map { case (cell, cv, _) =>
      struct(
        (floor(call_function("graft_cosine", array(cv.map(lit): _*), vc) * 1e6 + 0.5) / 1e6).as("csim"),
        lit(cell).as("cell"))
    }: _*)
    val assigned = e
      .withColumn("cell", array_max(entries(col("v"))).getField("cell"))
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("cell"), col("vec_id"), col("v"), col("norm"))
      .localCheckpoint() // read by the probe join AND the exact scan
    val q = plantedQueries(e.select(col("vec_id"), col("v")), k = 10, off = 301, factor = 0.15)
      .withColumn("qnorm", sqrt(dot("qv", "qv")))
      .localCheckpoint() // tiny; reused by probes and ground truth
    val exactTop = assigned.select(col("vec_id"), col("v"), col("norm"))
      .crossJoin(broadcast(q))
      .withColumn("cosine",
        floor(call_function("graft_cosine", col("qv"), col("v")) * 1e6 + 0.5) / 1e6)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rnk") <= 10)
      .select(col("q_id"), col("vec_id"), col("rnk"))
    val probeRanked = q
      .select(col("q_id"), col("qv"), col("qnorm"),
        posexplode(slice(reverse(array_sort(entries(col("qv")))), 1, 4)).as(Seq("pos", "s")))
      .select(col("q_id"), col("qv"), col("qnorm"),
        (col("pos") + 1).as("probe_rank"), col("s.cell").as("cell"))
    val cand = assigned.join(broadcast(probeRanked), Seq("cell"))
      .withColumn("cosine",
        floor(call_function("graft_cosine", col("qv"), col("v")) * 1e6 + 0.5) / 1e6)
      .select(col("q_id"), col("vec_id"), col("probe_rank"), col("cosine"))
      .localCheckpoint() // the one scored frame all three settings read
    val sweep = Seq(1, 2, 4).map { np =>
      val sub = cand.filter(col("probe_rank") <= np)
      val scanned = sub.groupBy().agg(count(lit(1)).as("n_scanned"))
      val top = sub.withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))))
        .filter(col("rnk") <= 10)
      val hits1 = top.filter(col("rnk") === 1)
        .join(exactTop.filter(col("rnk") === 1)
          .select(col("q_id"), col("vec_id")), Seq("q_id", "vec_id"))
        .groupBy().agg(count(lit(1)).as("hits_at1"))
      val ov10 = top.select(col("q_id"), col("vec_id"))
        .join(exactTop.select(col("q_id"), col("vec_id")), Seq("q_id", "vec_id"))
        .groupBy().agg(count(lit(1)).as("overlap_at10"))
      scanned.crossJoin(hits1).crossJoin(ov10).select(
        lit(np).cast(LongType).as("nprobe"), col("n_scanned"),
        col("hits_at1"), col("overlap_at10"))
    }.reduce(_ unionAll _)
    sweep.orderBy(col("nprobe"))
  }

  /** End-to-end restatement: rounded-argmax assignment and probe order,
    * one probe_rank <= 4 candidate frame, per-setting filter + ranking,
    * exact-scan ground truth, both recall joins. */
  val s19Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |flat AS (
      |  SELECT label, i AS dim, v[i] AS x
      |  FROM e, unnest(generate_series(1, 64)) AS u(i)),
      |cent AS (
      |  SELECT label, dim,
      |    CAST(CAST(SUM(CAST(x AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      |  FROM flat GROUP BY 1, 2),
      |carr AS (SELECT label AS cell, list(m ORDER BY dim) AS cv FROM cent GROUP BY label),
      |cnrm AS (
      |  SELECT cell, cv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> cv[i] * cv[i]), (x, y) -> x + y)) AS cn
      |  FROM carr),
      |asg0 AS (
      |  SELECT c.vec_id, c.v, m.cell,
      |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      |      FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> c.v[i] * m.cv[i]), (x, y) -> x + y)
      |        / (SQRT(list_reduce(list_transform(generate_series(1, 64), i -> c.v[i] * c.v[i]), (x, y) -> x + y)) * m.cn)
      |        * 1e6 + 0.5) / 1e6 DESC, m.cell DESC) AS rnk
      |  FROM e c CROSS JOIN cnrm m),
      |asg AS (
      |  SELECT vec_id, v, cell,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM asg0 WHERE rnk = 1),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.15 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 301) % cnt.n
      |  WHERE b.vec_id < 10),
      |qn AS (
      |  SELECT q_id, qv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]), (x, y) -> x + y)) AS qnrm
      |  FROM q),
      |pr AS (
      |  SELECT q_id, qv, qnrm, cell,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
      |      FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * m.cv[i]), (x, y) -> x + y)
      |        / (qnrm * m.cn) * 1e6 + 0.5) / 1e6 DESC, m.cell DESC) AS probe_rank
      |  FROM qn CROSS JOIN cnrm m),
      |cand AS (
      |  SELECT pr.q_id, a.vec_id, pr.probe_rank,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> pr.qv[i] * a.v[i]), (x, y) -> x + y)
      |      / (pr.qnrm * a.nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM pr JOIN asg a ON pr.cell = a.cell AND pr.probe_rank <= 4),
      |exact AS (
      |  SELECT qn.q_id, a.vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY qn.q_id ORDER BY
      |      FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> qn.qv[i] * a.v[i]), (x, y) -> x + y)
      |        / (qn.qnrm * a.nrm) * 1e6 + 0.5) / 1e6 DESC, a.vec_id) AS rnk
      |  FROM qn CROSS JOIN asg a),
      |et AS (SELECT q_id, vec_id, rnk FROM exact WHERE rnk <= 10),
      |np AS (SELECT UNNEST([1, 2, 4]) AS nprobe),
      |sub AS (
      |  SELECT np.nprobe, c.q_id, c.vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY np.nprobe, c.q_id ORDER BY c.cosine DESC, c.vec_id) AS rnk
      |  FROM np JOIN cand c ON c.probe_rank <= np.nprobe),
      |scanned AS (
      |  SELECT np.nprobe, COUNT(*) AS n_scanned
      |  FROM np JOIN cand c ON c.probe_rank <= np.nprobe GROUP BY 1),
      |h1 AS (
      |  SELECT s.nprobe, COUNT(*) AS hits_at1
      |  FROM sub s JOIN et ON s.q_id = et.q_id AND s.vec_id = et.vec_id
      |  WHERE s.rnk = 1 AND et.rnk = 1 GROUP BY 1),
      |o10 AS (
      |  SELECT s.nprobe, COUNT(*) AS overlap_at10
      |  FROM sub s JOIN et ON s.q_id = et.q_id AND s.vec_id = et.vec_id
      |  WHERE s.rnk <= 10 GROUP BY 1)
      |SELECT CAST(sc.nprobe AS BIGINT) AS nprobe, sc.n_scanned,
      |  COALESCE(h1.hits_at1, 0) AS hits_at1,
      |  COALESCE(o10.overlap_at10, 0) AS overlap_at10
      |FROM scanned sc
      |LEFT JOIN h1 ON sc.nprobe = h1.nprobe
      |LEFT JOIN o10 ON sc.nprobe = o10.nprobe
      |ORDER BY nprobe""".stripMargin

  // ---------------------------------------------------------------- s20
  /** Greedy k-center coreset (Gonzalez farthest-point traversal) — the
    * DIVERSITY-sampling primitive of training-data curation: pick k
    * examples such that every corpus point is close to some pick (the
    * 2-approximation of the k-center objective), the selection rule
    * behind coreset construction and diverse few-shot/eval-set picking.
    * Where d15/SemDeDup prunes redundancy pair-by-pair, this SELECTS a
    * maximally-spread representative set — the two ends of the same
    * diversity curation story.
    *
    * Exactness contract: embeddings quantize to int (floor(v * 256 +
    * 0.5)) so every distance is an exact int64 squared-L2 — the argmax
    * and the whole greedy trajectory are integer-deterministic, ties
    * broken by vec_id. Seed = min vec_id.
    *
    * Scale shape: k rounds, each ONE distributed scan — min-distance to
    * the current centers is a literal-array expression (the s05/s15
    * plan-literal codebook contract: k rows through the driver, each
    * pick is a documented k-row collect), argmax via a distributed
    * top-1 heap (TakeOrderedAndProject), never a global sort. Round r
    * evaluates r distance terms, so total work is O(k^2/2 * n * dim) —
    * at production k the running min-distance column would be
    * CHECKPOINTED per round instead of recomputed (g01's pattern);
    * at k = 8 recompute-from-literals keeps the whole trajectory in one
    * auditable lineage.
    *
    * Output: the picks in selection order with the coverage distance at
    * selection time (non-increasing — each round grabs the point
    * farthest from the chosen set; the sequence IS the k-center radius
    * profile). Oracle restates all 8 rounds as chained CTEs with
    * identical integer arithmetic.
    */
  def s20KcenterCoreset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        expr("transform(embedding, v -> cast(floor(cast(v as double) * 256D + 0.5D) as bigint))").as("qv"))
      .cache() // k rounds re-scan the quantized frame
    try {
      q.count()
      def distTo(center: Seq[Long]): Column =
        aggregate(
          zip_with(col("qv"), array(center.map(lit): _*), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)
      val seed = q.orderBy(col("vec_id")).limit(1).head()
      var picks = Vector((0L, seed.getLong(0), 0L))
      var mdCol = distTo(seed.getSeq[Long](1))
      for (k <- 1 to 7) {
        // already-picked points are excluded, not just at distance 0: on
        // a saturated corpus (duplicate vectors drive every min-distance
        // to 0) the tie-break would otherwise re-pick the seed forever
        val p = q.filter(!col("vec_id").isInCollection(picks.map(_._2)))
          .select(col("vec_id"), col("qv"), mdCol.as("md"))
          .orderBy(col("md").desc, col("vec_id")).limit(1).head()
        picks = picks :+ ((k.toLong, p.getLong(0), p.getLong(2)))
        if (k < 7) mdCol = least(mdCol, distTo(p.getSeq[Long](1)))
      }
      picks.toDF("pick", "vec_id", "coverage_md").orderBy(col("pick"))
    } finally q.unpersist()
  }

  /** The 8-round greedy trajectory as chained CTEs: same quantization,
    * same exact int64 distances, same (md DESC, vec_id) argmax rule. */
  val s20Sql: String = {
    def d(a: String, b: String): String =
      s"CAST(list_sum(list_transform(generate_series(1, 64), " +
        s"i -> ($a.qv[i] - $b.qv[i]) * ($a.qv[i] - $b.qv[i]))) AS BIGINT)"
    val sb = new StringBuilder
    sb ++= """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 256 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings),
      |c0 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
      |""".stripMargin
    // each round's frame EXCLUDES the points already picked (seed in s0,
    // the latest pick in each s_k) — matching the Spark side's exclusion
    sb ++= s"s0 AS (SELECT q.vec_id, q.qv, ${d("q", "c0")} AS md " +
      "FROM q CROSS JOIN c0 WHERE q.vec_id <> c0.vec_id)"
    for (k <- 1 to 7) {
      sb ++= s",\np$k AS (SELECT vec_id, qv, md FROM s${k - 1} ORDER BY md DESC, vec_id LIMIT 1)"
      if (k < 7)
        sb ++= s",\ns$k AS (SELECT s${k - 1}.vec_id, s${k - 1}.qv, " +
          s"LEAST(s${k - 1}.md, ${d(s"s${k - 1}", s"p$k")}) AS md " +
          s"FROM s${k - 1} CROSS JOIN p$k WHERE s${k - 1}.vec_id <> p$k.vec_id)"
    }
    sb ++= "\nSELECT CAST(0 AS BIGINT) AS pick, vec_id, CAST(0 AS BIGINT) AS coverage_md FROM c0"
    for (k <- 1 to 7)
      sb ++= s"\nUNION ALL SELECT $k, vec_id, md FROM p$k"
    sb ++= "\nORDER BY pick"
    sb.toString
  }

  // ---------------------------------------------------------------- s21
  /** Two-stage retrieval CASCADE: BM25 shortlist -> exact dense rerank —
    * the other production hybrid-retrieval shape next to s10's RRF
    * FUSION, and the distinction matters at scale: fusion runs BOTH
    * retrievers over the corpus and merges ranks; a cascade runs the
    * cheap sparse retriever over the corpus and the expensive dense
    * scorer over ONLY the shortlist (here: t09's top-20, entering the
    * embedding scan as a broadcast semi-join — the executed plan scores
    * 20 vectors, not the corpus, which is the entire cost argument for
    * cascades in every production search stack). Final order is the
    * reranker's; the sparse score rides along for attribution.
    *
    * Shares t09's BM25 chain and s01/s10's rounded-cosine contract
    * verbatim, so cascade and fusion cannot drift from their parents.
    */
  def s21CascadeRerank(s: SparkSession, dir: String): DataFrame = {
    val shortlist = TextQueries.t09Bm25(s, dir) // (doc_id, bm25), top-20
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("v"), col("norm"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("norm").as("qnorm"))
    e.join(broadcast(shortlist), col("vec_id") === col("doc_id"))
      .crossJoin(broadcast(q))
      .withColumn("cosine",
        floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
      .select(col("doc_id"), col("bm25"), col("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(10)
  }

  /** t09's BM25 chain (the shortlist), then the s01 cosine chain scoped
    * to shortlist ids only, reranked. */
  val s21Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
      |  FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      |corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      |  WHERE tok IN ('spark', 'table', 'query') GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, COUNT(*) AS dfreq FROM tf GROUP BY tok),
      |bm AS (
      |  SELECT doc_id,
      |    FLOOR(SUM(
      |      ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0) * tf * 2.2 /
      |        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      |    ) * 10000.0 + 0.5) / 10000.0 AS bm25
      |  FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN corpus
      |  GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20),
      |e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e)
      |SELECT bm.doc_id, bm.bm25,
      |  FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i]), (x, y) -> x + y)
      |    / (q.nrm * c.nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |FROM bm JOIN n c ON c.vec_id = bm.doc_id CROSS JOIN n q
      |WHERE q.vec_id = 0
      |ORDER BY cosine DESC, doc_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- s22
  /** FILTERED vector search — the metadata-constrained ANN every
    * production vector store names as a feature (FAISS IDSelector,
    * pgvector WHERE, Qdrant payload filters): top-5 cosine neighbors
    * restricted to corpus vectors sharing the query's label. Strategy
    * here is PRE-filtering — the predicate enters the scan as a join
    * condition (label equality), so the scored set is the label slice,
    * recall is exact by construction, and Catalyst turns the
    * label-equality into part of the broadcast hash join key. The
    * alternative (post-filter an unconstrained ANN shortlist) trades
    * that exactness for speed and starves on selective predicates —
    * the documented reason pre-filter is the default until the slice
    * outgrows the scan budget, at which point s05's cell routing
    * composes with the predicate (filtered IVF).
    *
    * Output also carries the per-query label-slice size — the
    * selectivity number that decides pre- vs post-filter in production.
    */
  def s22FilteredAnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("norm").as("qnorm"))
    val slice = e.join(broadcast(q),
      col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
    val sliceSize = slice.groupBy(col("q_id")).agg(count(lit(1)).as("slice_size"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    slice
      .withColumn("cosine", floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .join(broadcast(sliceSize), "q_id")
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("cosine"), col("slice_size"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** s01's chain with the label-equality predicate in the join and the
    * slice-size attribution column. */
  val s22Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i]), (x, y) -> x + y)
      |      / (q.nrm * c.nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM n q JOIN n c
      |    ON q.vec_id < 5 AND c.label = q.label AND c.vec_id <> q.vec_id),
      |sz AS (SELECT q_id, COUNT(*) AS slice_size FROM scored GROUP BY 1),
      |ranked AS (
      |  SELECT q_id, neighbor_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT q_id, rnk, neighbor_id, cosine, slice_size
      |FROM ranked JOIN sz USING (q_id) WHERE rnk <= 5
      |ORDER BY q_id, rnk""".stripMargin

  // ---------------------------------------------------------------- s23
  /** IVF index-health audit — the operational measurement behind every
    * cell-scoped operator here (s05/s14/s15/s19, d07/d15): per-cell
    * population of the nearest-centroid assignment, each cell's corpus
    * share, and the imbalance factor max_cell / mean_cell. A healthy
    * inverted index has imbalance near 1; a hot cell (imbalance >> 1)
    * means probe cost concentrates (one cell's scan dominates every
    * query that probes it) and is the trigger to re-train or split the
    * codebook — the same measurement FAISS's `imbalance_factor()`
    * reports. Cells that attract NO vectors (possible: assignment is
    * nearest-CENTROID, not the label that seeded the centroid) surface
    * as explicit zero rows via a left join from the codebook side, not
    * silently dropped.
    *
    * Integer contract: counts are exact int64; imbalance_milli =
    * (1000 * max_cnt * n_cells) div n — pure integer multiply + floor
    * division; share_micro is the p26 one-division rule.
    *
    * Plan shape at 100 TB: assignment is the standard map pass against
    * the plan-literal codebook (no join, no shuffle); the audit is ONE
    * k-cardinality aggregation plus scalar rollups — strictly cheaper
    * than any query the index serves, so it can run on every index
    * build.
    */
  def s23IndexHealth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
    val cents = codebook(e)
    val assigned = e
      .withColumn("cell", element_at(probeCells(cents, col("v"), 1), 1))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
    val cells = cents.map(_._1).toSeq.toDF("cell") // k plan-literal rows
    val perCell = cells.join(assigned, Seq("cell"), "left")
      .withColumn("n_vecs", coalesce(col("n_vecs"), lit(0L)))
    val glob = perCell.agg(count(lit(1)).as("n_cells"), sum(col("n_vecs")).as("n"),
      max(col("n_vecs")).as("max_cnt"), min(col("n_vecs")).as("min_cnt"))
      .withColumn("imbalance_milli", expr("(1000 * max_cnt * n_cells) div n"))
    perCell.crossJoin(broadcast(glob))
      .withColumn("share_micro",
        floor(col("n_vecs").cast(DoubleType) / col("n").cast(DoubleType) * 1e6).cast("long"))
      .select(col("cell").cast("int").as("cell"), col("n_vecs"), col("share_micro"),
        col("n_cells"), col("max_cnt"), col("min_cnt"), col("imbalance_milli"))
      .orderBy(col("cell"))
  }

  /** The s19 cell-assignment restatement (DECIMAL-exact centroids,
    * rounded-cosine argmax, cell-DESC tie), then the identical integer
    * audit arithmetic. */
  val s23Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |flat AS (
      |  SELECT label, i AS dim, v[i] AS x
      |  FROM e, unnest(generate_series(1, 64)) AS u(i)),
      |cent AS (
      |  SELECT label, dim,
      |    CAST(CAST(SUM(CAST(x AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      |  FROM flat GROUP BY 1, 2),
      |carr AS (SELECT label AS cell, list(m ORDER BY dim) AS cv FROM cent GROUP BY label),
      |cnrm AS (
      |  SELECT cell, cv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> cv[i] * cv[i]), (x, y) -> x + y)) AS cn
      |  FROM carr),
      |asg0 AS (
      |  SELECT c.vec_id, m.cell,
      |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      |      FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> c.v[i] * m.cv[i]), (x, y) -> x + y)
      |        / (SQRT(list_reduce(list_transform(generate_series(1, 64), i -> c.v[i] * c.v[i]), (x, y) -> x + y)) * m.cn)
      |        * 1e6 + 0.5) / 1e6 DESC, m.cell DESC) AS rnk
      |  FROM e c CROSS JOIN cnrm m),
      |counts AS (
      |  SELECT cell, COUNT(*) AS n_vecs FROM asg0 WHERE rnk = 1 GROUP BY cell),
      |per_cell AS (
      |  SELECT cnrm.cell, COALESCE(counts.n_vecs, 0) AS n_vecs
      |  FROM cnrm LEFT JOIN counts ON cnrm.cell = counts.cell),
      |gstats AS (
      |  SELECT COUNT(*) AS n_cells, CAST(SUM(n_vecs) AS BIGINT) AS n,
      |    MAX(n_vecs) AS max_cnt, MIN(n_vecs) AS min_cnt,
      |    (1000 * MAX(n_vecs) * COUNT(*)) // CAST(SUM(n_vecs) AS BIGINT) AS imbalance_milli
      |  FROM per_cell)
      |SELECT CAST(cell AS INTEGER) AS cell, n_vecs,
      |  CAST(FLOOR(CAST(n_vecs AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS share_micro,
      |  n_cells, max_cnt, min_cnt, imbalance_milli
      |FROM per_cell CROSS JOIN gstats
      |ORDER BY cell""".stripMargin

  // ---------------------------------------------------------------- s24
  /** Cell-scoped kNN-GRAPH construction — the index-build step behind
    * graph-based ANN (NSW/HNSW families) and kNN-graph algorithms
    * (spectral clustering, label propagation over similarity edges,
    * UMAP-style layouts): for EVERY corpus vector, its top-4 cosine
    * neighbors, with the candidate set bounded by the vector's 2
    * nearest IVF cells (s05's quantizer) instead of the corpus — the
    * all-pairs kNN-graph problem reduced to per-cell blocks, which is
    * exactly how production builds scope it (NN-Descent and FAISS both
    * block by coarse cells first).
    *
    * The whole graph is deterministic and SQL-restatable because the
    * quantizer is (DECIMAL-exact centroids, rounded-cosine argmax,
    * cell-DESC ties — the s19/s23 contract); the oracle recomputes
    * assignment, probes, in-block scoring, dedup across overlapping
    * probes, and the final per-source ranking end to end. Neighbors a
    * 2-probe block misses are the documented recall trade (s19
    * measures that frontier); the hash pins that BOTH engines miss
    * identically — the candidate-scoping rule IS the operator.
    *
    * Plan shape at 100 TB: probes are a map pass against the
    * plan-literal codebook; candidates come from ONE equi-join on cell
    * id (block sizes bounded by s23's imbalance audit); scoring is
    * codegen cosine inside the join; the rank is a per-source window
    * over ~2-cell candidate lists, never the corpus.
    */
  def s24KnnGraph(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    val cents = codebook(e)
    val assigned = e
      .withColumn("cell", element_at(probeCells(cents, col("v"), 1), 1))
      .select(col("cell"), col("vec_id").as("dst"), col("v").as("dv"),
        col("norm").as("dnorm"))
    val probes = e
      .select(col("vec_id").as("src"), col("v").as("sv"), col("norm").as("snorm"),
        explode(probeCells(cents, col("v"), 2)).as("cell"))
    val cand = probes.join(assigned, Seq("cell"))
      .filter(col("src") =!= col("dst"))
      .withColumn("cosine",
        floor(dot("sv", "dv") / (col("snorm") * col("dnorm")) * 1e6 + 0.5) / 1e6)
      .select(col("src"), col("dst"), col("cosine"))
      .distinct() // a dst in both probed cells scores identically twice
    val w = Window.partitionBy(col("src")).orderBy(col("cosine").desc, col("dst"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 4)
      .select(col("src"), col("rnk").cast("long").as("rnk"), col("dst"), col("cosine"))
      .orderBy(col("src"), col("rnk"))
  }

  /** Assignment + 2-probe + in-block scoring + dedup + ranking restated
    * end to end over the same DECIMAL-exact quantizer. */
  val s24Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |flat AS (
      |  SELECT label, i AS dim, v[i] AS x
      |  FROM e, unnest(generate_series(1, 64)) AS u(i)),
      |cent AS (
      |  SELECT label, dim,
      |    CAST(CAST(SUM(CAST(x AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
      |  FROM flat GROUP BY 1, 2),
      |carr AS (SELECT label AS cell, list(m ORDER BY dim) AS cv FROM cent GROUP BY label),
      |cnrm AS (
      |  SELECT cell, cv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> cv[i] * cv[i]), (x, y) -> x + y)) AS cn
      |  FROM carr),
      |en AS (
      |  SELECT vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |ranked_cells AS (
      |  SELECT c.vec_id, c.v, c.nrm, m.cell,
      |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      |      FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> c.v[i] * m.cv[i]), (x, y) -> x + y)
      |        / (c.nrm * m.cn) * 1e6 + 0.5) / 1e6 DESC, m.cell DESC) AS crnk
      |  FROM en c CROSS JOIN cnrm m),
      |asg AS (SELECT vec_id AS dst, v AS dv, nrm AS dnorm, cell FROM ranked_cells WHERE crnk = 1),
      |pr AS (SELECT vec_id AS src, v AS sv, nrm AS snorm, cell FROM ranked_cells WHERE crnk <= 2),
      |cand AS (
      |  SELECT DISTINCT pr.src, a.dst,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> pr.sv[i] * a.dv[i]), (x, y) -> x + y)
      |      / (pr.snorm * a.dnorm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM pr JOIN asg a ON pr.cell = a.cell AND pr.src <> a.dst),
      |ranked AS (
      |  SELECT src, dst, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rnk
      |  FROM cand)
      |SELECT src, CAST(rnk AS BIGINT) AS rnk, dst, cosine
      |FROM ranked WHERE rnk <= 4
      |ORDER BY src, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s24_knn_graph" -> (s24KnnGraph _),
    "s23_index_health" -> (s23IndexHealth _),
    "s22_filtered_ann" -> (s22FilteredAnn _),
    "s21_cascade_rerank" -> (s21CascadeRerank _),
    "s20_kcenter_coreset" -> (s20KcenterCoreset _),
    "s19_nprobe_sweep" -> (s19NprobeSweep _),
    "s18_binary_ann" -> (s18BinaryAnn _),
    "s17_matryoshka" -> (s17Matryoshka _),
    "s16_maxsim" -> (s16MaxSim _),
    "s15_ivf_pq" -> (s15IvfPq _),
    "s14_range_search" -> (s14RangeSearch _),
    "s13_pq_adc_ann" -> (s13PqAdcAnn _),
    "s12_mips_topk" -> (s12MipsTopk _),
    "s11_kmeans_topics" -> (s11KmeansTopics _),
    "s10_hybrid_rrf" -> (s10HybridRrf _),
    "s09_quantized_ann" -> (s09QuantizedAnn _),
    "s08_label_centroids" -> (s08LabelCentroids _),
    "s07_knn_classify" -> (s07KnnClassify _),
    "s01_ann_bruteforce" -> (s01AnnBruteForce _),
    "s02_ann_lsh" -> (s02AnnLsh _),
    "s03_near_dup_stats" -> (s03NearDupStats _),
    "s04_ann_native" -> (s04AnnNative _),
    "s05_ann_ivf" -> (s05AnnIvf _),
    "s06_ann_verified" -> (s06AnnVerified _))

  val oracle: Map[String, String] = Map(
    "s24_knn_graph" -> s24Sql,
    "s23_index_health" -> s23Sql,
    "s22_filtered_ann" -> s22Sql,
    "s21_cascade_rerank" -> s21Sql,
    "s20_kcenter_coreset" -> s20Sql,
    "s19_nprobe_sweep" -> s19Sql,
    "s18_binary_ann" -> s18Sql,
    "s17_matryoshka" -> s17Sql,
    "s16_maxsim" -> s16Sql,
    "s15_ivf_pq" -> s15Sql,
    "s14_range_search" -> s14Sql,
    "s13_pq_adc_ann" -> s13Sql,
    "s12_mips_topk" -> s12Sql,
    "s11_kmeans_topics" -> s11Sql,
    "s10_hybrid_rrf" -> s10Sql,
    "s09_quantized_ann" -> s09Sql,
    "s08_label_centroids" -> s08Sql,
    "s07_knn_classify" -> s07Sql,
    "s01_ann_bruteforce" -> s01Sql,
    "s02_ann_lsh" -> s02Sql,
    "s03_near_dup_stats" -> s03Sql,
    "s04_ann_native" -> s01Sql,
    "s05_ann_ivf" -> s05Sql,
    "s06_ann_verified" -> s06Sql)
}
