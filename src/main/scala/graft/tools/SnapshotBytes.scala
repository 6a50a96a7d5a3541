package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.{GraftLake, GraftLakeCatalog, LakeStore}

/** Driver-resident TABLE-STATE audit for the round-15 snapshot rebuild:
  * what the warm `TableState` actually HOLDS in memory as commit
  * history grows, measured against what the pre-round-15 design held
  * (a full live file list per version). The scale contract under test:
  * resident state grows O(live files + window deltas) — flat in
  * history length — never O(versions × files).
  *
  * Two adversarial histories:
  *  - APPEND-ONLY: n commits of one file each. The old design's
  *    retained entries are quadratic (version v holds v files:
  *    n(n+1)/2 total); the new design holds one live list + the
  *    in-window deltas.
  *  - FULL-CHURN: OPTIMIZE rewrites the whole table every commit. The
  *    old design held versions × files; the new design pages every
  *    below-window delta to the log and keeps one live list.
  *
  *   sbt 'runMain graft.tools.SnapshotBytes [n ...]'
  *
  * Prints one markdown row per (history, n) for SCALE.md: entries and
  * estimated bytes retained now vs what the per-version-live design
  * would retain, plus the paged fraction.
  */
object SnapshotBytes {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(50, 100, 200)
    val spark = GraftSession("snapshot-bytes")
    spark.sparkContext.setLogLevel("WARN")
    if (!spark.conf.getOption("spark.sql.catalog.graft_lake").contains(
        classOf[GraftLakeCatalog].getName))
      spark.conf.set("spark.sql.catalog.graft_lake",
        classOf[GraftLakeCatalog].getName)
    import spark.implicits._

    // entry-size proxy: the JSON encoding a checkpoint would write for
    // a FileEntry (path + group + zones + counters) — the same order of
    // magnitude as the JVM object graph, and comparable across designs
    def entryBytes(f: LakeStore.FileEntry): Long =
      (f.path.length + f.cols.map(_.length + 8).sum +
        f.zones.size * 32 + f.blooms.valuesIterator.map(_.length).sum +
        f.ndv.valuesIterator.map(_.length).sum + 64).toLong

    def audit(key: String): (Long, Long, Long, Long, Double) = {
      val st = LakeStore.get(key).get
      // what THIS design retains: materialized head lists + in-window deltas
      val retainedEntries = st.snapshots.iterator.map(s =>
        s.live.map(_.length).getOrElse(0) + s.added.length).sum.toLong
      val retainedBytes = st.snapshots.iterator.map(s =>
        s.live.map(_.iterator.map(entryBytes).sum).getOrElse(0L) +
          s.added.iterator.map(entryBytes).sum).sum
      // what the per-version-live design retained: every version's full
      // list (reconstructed here once, through the paged log, to count)
      val memo = scala.collection.mutable.HashMap.empty[Int, Vector[LakeStore.FileEntry]]
      val oldEntries = st.snapshots.indices.iterator
        .map(v => st.filesAtWith(memo, v).length.toLong).sum
      val oldBytes = st.snapshots.indices.iterator
        .map(v => st.filesAtWith(memo, v).iterator.map(entryBytes).sum).sum
      val pagedFrac = st.snapshots.count(_.paged).toDouble /
        math.max(1, st.snapshots.length)
      (retainedEntries, retainedBytes, oldEntries, oldBytes, pagedFrac)
    }

    println("| history | commits | live files | entries r15 | entries per-version-live | bytes r15 | bytes old | paged |")
    println("|---|---|---|---|---|---|---|---|")
    ns.foreach { n =>
      // ---- append-only: one 3-row file per commit
      val ka = "graft_lake.snapbytes_app"
      spark.sql(s"DROP TABLE IF EXISTS $ka")
      spark.sql(s"CREATE TABLE $ka (id BIGINT)")
      (0 until n).foreach { i =>
        Seq(i * 3L, i * 3L + 1, i * 3L + 2).toDF("id")
          .coalesce(1).writeTo(ka).append()
      }
      val sta = LakeStore.get(ka).get
      val (re, rb, oe, ob, pf) = audit(ka)
      println(f"| append-only | $n | ${sta.current.length} | $re | $oe | $rb | $ob | ${pf * 100}%.0f%% |")

      // ---- full-churn: 8 files, then n whole-table OPTIMIZE rewrites
      val kc = "graft_lake.snapbytes_churn"
      spark.sql(s"DROP TABLE IF EXISTS $kc")
      spark.sql(s"CREATE TABLE $kc (id BIGINT)")
      spark.range(0, 64).select(col("id")).repartition(8).writeTo(kc).append()
      (0 until n).foreach(_ => GraftLake.optimize(spark, kc, "id", 8))
      val stc = LakeStore.get(kc).get
      val (re2, rb2, oe2, ob2, pf2) = audit(kc)
      println(f"| full-churn | $n | ${stc.current.length} | $re2 | $oe2 | $rb2 | $ob2 | ${pf2 * 100}%.0f%% |")
    }
    spark.stop()
  }
}
