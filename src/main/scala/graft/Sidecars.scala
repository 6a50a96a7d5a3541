package graft

import org.apache.spark.sql.DataFrame

/** Shared contract for ORACLE SIDECARS: queries whose core computation is
  * not SQL-expressible (zlib deflate, media codecs) materialize their
  * per-row intermediate frame to a parquet path the DuckDB oracle reads,
  * then derive their published result FROM that sidecar — so Spark and
  * the oracle aggregate byte-identical inputs (the t17 pattern).
  *
  * Paths are keyed by the sf directory (UUID-from-dir tag, the same
  * scheme as p17's bucketed warehouse): a t17 bench pass at sf0.1 and the
  * driver's Verify at sf0.01 write DISJOINT sidecars, so interleaved runs
  * at different scale factors can never cross-contaminate an oracle read
  * — the side-effect-ordering class that clobbered round 5's artifacts.
  *
  * The oracle SQL (a static string dumped to oracle_sql.json AFTER the
  * queries ran) resolves the tag through [[oracleDir]], which Verify pins
  * to the sf directory it is about to run — the dumped SQL therefore
  * always points at exactly the sidecars that Verify run wrote.
  */
object Sidecars {
  def tag(dir: String): String = java.lang.Long.toHexString(
    java.util.UUID.nameUUIDFromBytes(dir.getBytes("UTF-8")).getMostSignificantBits)

  def path(dir: String, name: String): String =
    s"/tmp/graft_sidecar_${tag(dir)}/$name.parquet"

  /** The sf dir the dumped oracle SQL refers to. Defaults to the driver's
    * correctness scale factor; Verify overwrites it with its actual arg
    * before building any oracle text. */
  @volatile var oracleDir: String = "/root/testdata/sf0.01"

  def oraclePath(name: String): String = path(oracleDir, name)

  /** Materialize `df` as the sidecar for (dir, name) and return the
    * read-back frame — downstream aggregation MUST consume the read-back
    * (not the live frame) so both engines see identical bytes.
    *
    * repartition(1), not coalesce(1): the sidecar must stay one file (a
    * deterministic artifact both engines glob), but coalesce(1) PROPAGATES
    * past the upstream exchange and collapses the compute ABOVE it — the
    * fingerprint/signature/deflate map phases these writers materialize
    * (all Tables.spread to defaultParallelism precisely to parallelize)
    * were running in a single task. repartition(1) inserts its own
    * exchange below the writer instead: the heavy map work keeps its
    * parallelism and only the (small) result rows funnel to one writer
    * task. Measured at sf0.1/local[32]: d17 5.9 s -> 3.6 s, m05
    * 2.7 s -> 1.9 s, p19 12.3 s -> 9.5 s (OPTIMIZATION_r17.md). */
  def write(df: DataFrame, dir: String, name: String): DataFrame = {
    val p = path(dir, name)
    df.repartition(1).write.mode("overwrite").parquet(p)
    df.sparkSession.read.parquet(p)
  }
}
