package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extends the SCALE.md sweep one step past the shipped testdata for the
  * two steepest-scaling families the round-5 verdict flagged (q09's
  * fact-fact shuffle join at 2.3x per 10x step, p01's composed pipeline at
  * 2.2x): synthesizes 2x and 5x variants of sf0.1 in /tmp by replicating
  * with key offsets, then times the queries across sf0.1 → 2x → 5x.
  *
  * Replication preserves the workload's shape instead of just its bytes:
  *  - orders/lineitem replicas offset o_orderkey/l_orderkey by
  *    replica * 10^9, so each order keeps exactly its original lineitem
  *    fan-out — the join's key multiplicity (what drives shuffle-join
  *    cost) scales with data, it doesn't degenerate into hot keys;
  *  - documents replicas offset doc_id and salt the text with a replica
  *    tag, so the exact-dedup stage sees the same duplicate-group
  *    structure per replica rather than K-way cross-replica dup groups
  *    (which would test a different workload than sf0.1 does).
  *
  * The interesting readout is the ratio per 2x/2.5x data step: ~2x and
  * ~2.5x = the plans are linear in input past the overhead-dominated
  * regime (the sub-10x ratios in the main sweep are mostly fixed-cost
  * amortization, which says little about the asymptote).
  *
  *   sbt 'runMain graft.tools.ScaleExtend'   # appends a section to SCALE.md
  */
object ScaleExtend {
  private val KeyStride = 1000000000L // > any sf0.1 orderkey/doc_id
  /** Customer/supplier-key stride: each replica becomes a DISJOINT copy of
    * the trade graph (the g-series derives its edges from distinct
    * (custkey, suppkey) pairs — without the offset, cross-replica rows
    * collapse under the edge `distinct()` and the graph would not scale
    * with the data). Must stay below 1,000,000 (the supplier node-id
    * offset GraphQueries uses) so customer and supplier id ranges remain
    * disjoint across replicas: sf0.1 custkey tops out ~15k, suppkey ~1k,
    * so 4 replicas * 100k stride keeps every customer id < 1e6. */
  private val EntityStride = 100000L

  /** Source fingerprint baked into the done-marker: if the driver
    * regenerates the testdata, the stale 2x/5x replicas are rebuilt
    * instead of silently timing old data. */
  private def srcFingerprint(srcDir: String): String =
    // gen:v2 = per-word replica salt (bumping the tag rebuilds replicas
    // produced by an older generator even over unchanged source data)
    "gen:v2," + Seq("orders", "lineitem", "documents", "events", "embeddings").map { t =>
      val fs = new java.io.File(s"$srcDir/$t.parquet")
      val files = Option(fs.listFiles()).map(_.toSeq).getOrElse(Seq(fs))
      s"$t:${files.map(f => f.length() + f.lastModified()).sum}"
    }.mkString(",")

  private def replicate(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val done = new java.io.File(s"$outDir/_DONE")
    val fp = srcFingerprint(srcDir)
    if (done.exists() &&
      new String(java.nio.file.Files.readAllBytes(done.toPath), "UTF-8") == fp) return
    val reps = spark.range(0, k).select(col("id").as("rep"))
    def cross(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))
    cross(Tables.orders(spark, srcDir))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * KeyStride)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * EntityStride)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    cross(Tables.lineitem(spark, srcDir))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * KeyStride)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * EntityStride)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    cross(Tables.documents(spark, srcDir))
      .withColumn("doc_id", col("doc_id") + col("rep") * KeyStride)
      // PER-WORD replica salt (gen:v2): every token of replica N becomes
      // `<token>zrN` — a BIJECTIVE token mapping, so each replica's
      // shingle/fingerprint structure is exactly isomorphic to sf0.1's
      // (dup docs stay dups, near-dups keep their jaccard) while
      // replicas share ZERO shingles with each other. The old
      // whole-doc suffix salt decorrelated only EXACT fingerprints:
      // MinHash/SimHash saw every doc as a ~0.99-jaccard copy of its
      // K-1 replica twins (and the media tables, whose payload bytes
      // derive from the text, collided the same way) — a K^2
      // cross-replica pair blowup that real 2x data does not have,
      // which is what a 2x SCALE step must model.
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(expr(
            """regexp_replace(text, '(\\S+)', concat('$1zr', cast(rep as string)))""")))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // Embeddings replicas must stay DISJOINT in vector space (identical
    // copies would collapse into shared IVF cells and turn the cell-scoped
    // kNN into a K^2 workload that real 2x data doesn't have). Each
    // replica: vec_id offset, label offset (the codebook is per-label, so
    // the cell count grows with the data — the production nlist-scales-
    // with-N contract), and a CYCLIC DIMENSION SHIFT of the vector (a
    // permutation: intra-replica cosines are preserved EXACTLY, while
    // shifted copies of these clustered vectors decorrelate cross-replica
    // — so each replica is the sf0.1 workload in its own subspace).
    cross(Tables.embeddings(spark, srcDir)
      .select(col("vec_id"), col("embedding"), col("label")))
      .withColumn("vec_id", col("vec_id") + col("rep") * KeyStride)
      .withColumn("label", (col("label") + col("rep") * lit(1000)).cast("int"))
      .withColumn("embedding", expr(
        """CASE WHEN rep = 0 THEN embedding ELSE
          |  concat(slice(embedding, CAST(pmod(rep * 7, 64) AS INT) + 1,
          |                64 - CAST(pmod(rep * 7, 64) AS INT)),
          |         slice(embedding, 1, CAST(pmod(rep * 7, 64) AS INT)))
          |END""".stripMargin))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    java.nio.file.Files.writeString(done.toPath, fp)
    ()
  }

  /** Lakehouse O(touched) probe (round-9): the TABLE grows with the step
    * (2x/5x replicas — batch count grows, each batch stays 50 docs) while
    * the CHANGESET stays FIXED (150 keys in batches 0..2, identical at
    * every step). A partition-grouped MERGE whose runtime group filter
    * works, and an incremental CHANGES read planned from commit
    * metadata, must both cost O(touched partitions) — ~FLAT wall time as
    * the table grows is the PASS condition here, unlike the linear bar
    * for the scan-everything families above. RESTORE (a pure manifest
    * move) gets the same flat bar. Returns (mergeSec, changesSec,
    * restoreSec, replacedGroups) — the group count doubles as the
    * pruning audit at each step. */
  private def lakeProbe(spark: SparkSession, dir: String): (Double, Double, Double, Int) = {
    if (!spark.conf.getOption("spark.sql.catalog.graft_lake").contains(
        classOf[graft.sources.GraftLakeCatalog].getName))
      spark.conf.set("spark.sql.catalog.graft_lake",
        classOf[graft.sources.GraftLakeCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_lake.scale_probe")
    spark.sql("""CREATE TABLE graft_lake.scale_probe
                |(doc_id BIGINT, batch BIGINT, n_chars BIGINT)
                |PARTITIONED BY (batch)""".stripMargin)
    Tables.documents(spark, dir)
      .select(col("doc_id"), expr("doc_id div 50").as("batch"), col("n_chars"))
      .repartition(col("batch"))
      .writeTo("graft_lake.scale_probe").append() // untimed bulk load
    spark.range(0, 150)
      .select(col("id").as("doc_id"), expr("id div 50").as("batch"), lit(1L).as("add"))
      .createOrReplaceTempView("scale_probe_delta")
    // time THREE successive merges against the ONE loaded table and take
    // the min: the bulk load just wrote 100-500 files, and letting its
    // GC/commit debt land inside a single timed statement would measure
    // the load, not the merge (each merge is a fresh commit doing
    // identical work — 150 matched updates in 3 groups)
    val mergeSec = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.sql("""MERGE INTO graft_lake.scale_probe t USING scale_probe_delta s
                  |ON t.doc_id = s.doc_id AND t.batch = s.batch
                  |WHEN MATCHED THEN UPDATE SET n_chars = t.n_chars + s.add""".stripMargin)
      (System.nanoTime() - t0) / 1e9
    }.min
    val replaced = graft.sources.LakeStore.lastReplacedGroups
      .get("graft_lake.scale_probe").flatten.map(_.size).getOrElse(-1)
    val changesSec = (1 to 3).map { _ =>
      val v = graft.sources.GraftLake.latestVersion("graft_lake.scale_probe")
      val t1 = System.nanoTime()
      graft.sources.GraftLake
        .changes(spark, "graft_lake.scale_probe", v - 1, v, "doc_id").count()
      (System.nanoTime() - t1) / 1e9
    }.min
    // RESTORE: each iteration rolls back one commit — a manifest diff of
    // the merge's 3-group footprint, never a data read/copy
    val restoreSec = (1 to 3).map { _ =>
      val v = graft.sources.GraftLake.latestVersion("graft_lake.scale_probe")
      val t2 = System.nanoTime()
      graft.sources.GraftLake.restore("graft_lake.scale_probe", v - 1)
      (System.nanoTime() - t2) / 1e9
    }.min
    (mergeSec, changesSec, restoreSec, replaced)
  }

  /** COPY INTO ledger-at-scale probe (round-14): the round-13 design
    * carried the ingest ledger as a table property re-serialized
    * O(all-files-ever-loaded) into EVERY commit — the one design the
    * round-13 verdict called out as not surviving 100x. The rebuild
    * stores per-commit `copyIds` sections, so the variable to isolate
    * is LEDGER SIZE alone: fabricate an ingest history of `nHistory`
    * file ids through the real commit path (metadata-only appends
    * carrying ledger sections — no staging I/O, so the probe measures
    * the ledger, not parquet writes), then time ONE real 3-file COPY
    * INTO and record its commit's log-entry bytes. FLAT time and FLAT
    * bytes across 100x history is the PASS condition; the old design
    * fails the bytes bar by construction (40 B x history per commit).
    * Returns (ingestSec, commitBytes, ledgerSize). */
  private def copyIntoProbe(spark: SparkSession, srcDir: String,
      nHistory: Int): (Double, Long, Int) = {
    if (!spark.conf.getOption("spark.sql.catalog.graft_lake").contains(
        classOf[graft.sources.GraftLakeCatalog].getName))
      spark.conf.set("spark.sql.catalog.graft_lake",
        classOf[graft.sources.GraftLakeCatalog].getName)
    import graft.sources.LakeStore
    val key = "graft_lake.scale_landing"
    spark.sql(s"DROP TABLE IF EXISTS $key")
    spark.sql(s"CREATE TABLE $key (doc_id BIGINT, n_chars BIGINT)")
    // history: 50-id ledger sections through the real append path
    (0 until nHistory / 50).foreach { b =>
      LakeStore.append(key, Nil, ingestIds = Some(
        (0 until 50).map(i => s"hist${b * 50 + i}.parquet@${b * 50 + i}")))
    }
    // one real ingest of 3 fresh files, timed end to end
    val staging = s"/tmp/graft_scale_copyinto"
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$staging/slice2.parquet"))) {
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      val docs = Tables.documents(spark, srcDir)
        .select(col("doc_id"), col("n_chars")).limit(3000)
      (0 to 2).foreach { i =>
        val tmp = s"$staging/_t$i"
        docs.filter(col("doc_id") % 3 === i).coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
        fs.rename(part, new org.apache.hadoop.fs.Path(s"$staging/slice$i.parquet"))
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
    }
    val t0 = System.nanoTime()
    val (nf, _) = graft.sources.GraftLake.copyInto(spark, key, staging)
    val sec = (System.nanoTime() - t0) / 1e9
    require(nf == 3, s"probe expected 3 files, loaded $nf")
    val st = LakeStore.get(key).get
    val v = st.snapshots.lastIndexWhere(_.action == "copyinto")
    val log = new org.apache.hadoop.fs.Path(
      s"${LakeStore.tableDir(key)}/_log/" + f"$v%020d.json")
    val bytes = log.getFileSystem(
      new org.apache.hadoop.conf.Configuration()).getFileStatus(log).getLen
    (sec, bytes, st.copyLedger.size)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession("scale-extend")
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val steps = Seq(
      "sf0.1" -> src,
      "2x (sf~0.2)" -> "/tmp/graft_scale_2x",
      "5x (sf~0.5)" -> "/tmp/graft_scale_5x")
    replicate(spark, src, "/tmp/graft_scale_2x", 2)
    replicate(spark, src, "/tmp/graft_scale_5x", 5)

    val queries = Seq(
      "q09_monthly_revenue" -> "fact-fact shuffle join",
      "p01_clean_corpus" -> "composed filter→dedup→stats",
      // graph tier: the steepest sf0.01→0.1 ratios in the main sweep
      // (1.8–2.5x — amortization ending); the replicas are disjoint
      // subgraph copies (EntityStride), so linear-in-edges is the bar
      "g01_pagerank" -> "5-round degree-segmented propagation",
      "g04_triangle_counts" -> "degree-ordered wedge joins",
      "g09_harmonic_centrality" -> "8-landmark 4-round BFS",
      // round-8 additions: the steepest new rows/compositions from r7
      "p19_multimodal_curation" -> "4-modality dedup composition + CC",
      "d16_incremental_neardup" -> "probe vs persisted LSH index",
      "d17_band_planning" -> "3 banding configs + exact truth join",
      "g15_mutual_knn_clusters" -> "mutual filter + star CC over s24 kNN",
      // round-15: the media-fingerprint WIDTH lever, measured — the
      // 64-bit row (8-bit bands, 256 buckets/band: the documented
      // quadratic onset) against its 128-bit twin (16-bit bands,
      // 65,536 buckets/band) at the same Hamming radius
      "m03_image_dedup" -> "64-bit banded Hamming (8-bit bands)",
      "m10_wide_fingerprint_dedup" -> "128-bit banded Hamming (16-bit bands)")
    // untimed warmup at the smallest step
    queries.foreach { case (q, _) =>
      SparkEntry.queries(q)(spark, src).count(); spark.catalog.clearCache()
    }
    val rows = queries.map { case (q, note) =>
      val times = steps.map { case (_, dir) =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).count()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        ts.min
      }
      (q, note, times)
    }

    val sb = new StringBuilder
    sb.append("\n## Extended step: past sf0.1 for the steepest families (graft.tools.ScaleExtend)\n\n")
    sb.append("2x/5x replicas of sf0.1 with key offsets (join fan-out and dup-group\n")
    sb.append("structure preserved — see ScaleExtend scaladoc); best of 3 passes.\n")
    sb.append("Linear-in-input here is the PASS condition: the main sweep's ratios\n")
    sb.append("are overhead-amortized, this step isolates the asymptote.\n\n")
    sb.append("| query | family | sf0.1 | 2x | 5x | x(1→2x) | x(2x→5x, 2.5x data) |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    rows.foreach { case (q, note, ts) =>
      sb.append(f"| $q | $note | ${ts(0)}%.2f | ${ts(1)}%.2f | ${ts(2)}%.2f " +
        f"| ${ts(1) / ts(0)}%.1fx | ${ts(2) / ts(1)}%.1fx |\n")
    }

    // lakehouse O(touched) probe: table grows, changeset fixed -> flat
    // (best-of-3 happens INSIDE the probe, against one loaded table)
    val lakeRows = steps.map { case (_, dir) => lakeProbe(spark, dir) }
    sb.append("\n### Lakehouse O(touched): table grows, changeset fixed (p34/p36 contract)\n\n")
    sb.append("150-key changeset in 3 fixed partitions MERGEd into a table whose\n")
    sb.append("partition count grows with the step (100 -> 200 -> 500 batches);\n")
    sb.append("then the (v-1, v] incremental CHANGES diff of that commit. FLAT\n")
    sb.append("wall time is the PASS condition: runtime group filtering and the\n")
    sb.append("metadata-planned diff must keep both O(touched partitions), not\n")
    sb.append("O(table). `groups` = the commit's replaced-group audit (must stay 3).\n\n")
    sb.append("| statement | sf0.1 | 2x | 5x | x(1→2x) | x(2x→5x) | groups |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    sb.append(f"| MERGE (fixed changeset) | ${lakeRows(0)._1}%.2f | ${lakeRows(1)._1}%.2f " +
      f"| ${lakeRows(2)._1}%.2f | ${lakeRows(1)._1 / lakeRows(0)._1}%.1fx " +
      f"| ${lakeRows(2)._1 / lakeRows(1)._1}%.1fx | ${lakeRows.map(_._4).mkString("/")} |\n")
    sb.append(f"| CHANGES (v-1, v] diff | ${lakeRows(0)._2}%.2f | ${lakeRows(1)._2}%.2f " +
      f"| ${lakeRows(2)._2}%.2f | ${lakeRows(1)._2 / lakeRows(0)._2}%.1fx " +
      f"| ${lakeRows(2)._2 / lakeRows(1)._2}%.1fx | — |\n")
    sb.append(f"| RESTORE (manifest re-point) | ${lakeRows(0)._3}%.2f | ${lakeRows(1)._3}%.2f " +
      f"| ${lakeRows(2)._3}%.2f | ${lakeRows(1)._3 / lakeRows(0)._3}%.1fx " +
      f"| ${lakeRows(2)._3 / lakeRows(1)._3}%.1fx | — |\n")
    // COPY INTO ledger at scale: 100x ingest HISTORY, one fixed ingest
    val copyRows = Seq(1000, 10000, 100000).map(n =>
      n -> copyIntoProbe(spark, src, n))
    sb.append("\n### COPY INTO ledger at scale: 100x ingest history, one fixed ingest (p77 contract)\n\n")
    sb.append("The table's ledger holds N already-ingested file ids (fabricated\n")
    sb.append("through the real commit path); one 3-file COPY INTO is then timed\n")
    sb.append("and its commit's log-entry size measured. FLAT time and FLAT bytes\n")
    sb.append("across 100x history is the PASS condition — the retired props-\n")
    sb.append("carried design grows the bytes column ~40 B per historical file\n")
    sb.append("(4 MB at N=100k) by construction.\n\n")
    sb.append("| ledger ids | ingest sec | ingest commit bytes |\n")
    sb.append("|---|---|---|\n")
    copyRows.foreach { case (n, (sec, bytes, ledger)) =>
      require(ledger >= n, s"probe ledger $ledger < fabricated $n")
      sb.append(f"| $n%,d | $sec%.2f | $bytes%,d |\n")
    }

    val path = java.nio.file.Paths.get("/root/repo/SCALE.md")
    val cur = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    // drop a previous extension section before re-appending
    val base = cur.indexOf("\n## Extended step:") match {
      case -1 => cur
      case i  => cur.substring(0, i)
    }
    java.nio.file.Files.writeString(path, base + sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
