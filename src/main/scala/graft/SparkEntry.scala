package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.HealthCheckConfig
import graft.operators.{AsofJoin, DataQuality, HealthCheckBatch, MultimodalPipeline, RangeSession, Relational, Retrieval, SimilarityPipeline, TextPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has an entry in [[queries]]
  * (Spark side) and, when ANSI-SQL-expressible, a matching DuckDB oracle in
  * [[oracleSql]] with IDENTICAL column names and a total ORDER BY on both
  * sides.
  */
object SparkEntry {

  /** Flagship: the full health-check alarm pipeline replayed in batch —
    * tick grid -> 1-min windowed max -> threshold + missing-data evaluation ->
    * alarm transitions (SURVEY §2 A1/O1/O2/P13). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    HealthCheckBatch.alarmTransitions(spark, "/root/testdata/sf0.001",
      SyntheticCfg)

  /** Reference defaults are threshold=1s / period=1min (HealthCheckConfig());
    * the synthetic `events.value` column is ~uniform(0,200), so oracle
    * queries pin an explicit mid-range threshold instead.
    */
  private val SyntheticCfg = HealthCheckConfig(thresholdSeconds = 150.0)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Health-check pipeline operators (batch twins over `events`)
    "hc_tracer_encode" -> ((s, d) => HealthCheckBatch.tracerEncode(s, d)),
    "hc_decode_extract" -> ((s, d) => HealthCheckBatch.decodeExtract(s, d)),
    "hc_arn_parse" -> ((s, d) => HealthCheckBatch.arnParse(s, d)),
    "hc_latency_arrival" -> ((s, d) => HealthCheckBatch.latencyArrival(s, d)),
    "hc_latency_event_time" -> ((s, d) => HealthCheckBatch.latencyEventTime(s, d)),
    "hc_metric_projection" -> ((s, d) => HealthCheckBatch.metricProjectionQ(s, d)),
    "hc_threshold_filter" -> ((s, d) => HealthCheckBatch.thresholdFilter(s, d,
      HealthCheckConfig(thresholdSeconds = 100.0))),
    "hc_first_record" -> ((s, d) => HealthCheckBatch.firstRecord(s, d)),
    "hc_window_max" -> ((s, d) => HealthCheckBatch.windowMax(s, d)),
    "hc_gap_detect" -> ((s, d) => HealthCheckBatch.gapDetect(s, d)),
    "hc_alarm_transitions" -> ((s, d) =>
      HealthCheckBatch.alarmTransitions(s, d, SyntheticCfg)),
    "hc_alarm_m_of_n" -> ((s, d) =>
      HealthCheckBatch.alarmTransitions(s, d, SyntheticCfg.copy(
        evaluationPeriods = 3, datapointsToAlarm = 2))),
    // AlarmMode.Adaptive's oracle-checked batch twin: the rolling
    // z-score breach (metric_anomaly arithmetic) through the same 2-of-3
    // M-of-N machine; spec-pinned equal to the streaming Adaptive
    // processor on an ordered replay (AdaptiveAlarmSpec)
    "hc_alarm_adaptive" -> ((s, d) =>
      HealthCheckBatch.alarmTransitionsAdaptive(s, d, SyntheticCfg.copy(
        evaluationPeriods = 3, datapointsToAlarm = 2))),
    // Relational coverage
    "q1_agg" -> ((s, d) => Relational.q1Agg(s, d)),
    "q3_topk" -> ((s, d) => Relational.q3TopK(s, d)),
    "q5_join" -> ((s, d) => Relational.q5Join(s, d)),
    "q6_filter" -> ((s, d) => Relational.q6Filter(s, d)),
    "q10_returns" -> ((s, d) => Relational.q10Returns(s, d)),
    "q18_big_orders" -> ((s, d) => Relational.q18BigOrders(s, d)),
    "q1_rollup" -> ((s, d) => Relational.q1Rollup(s, d)),
    "pivot_hourly" -> ((s, d) => Relational.pivotHourly(s, d)),
    "q14_promo" -> ((s, d) => Relational.q14Promo(s, d)),
    "window_rank" -> ((s, d) => Relational.windowRank(s, d)),
    // plain NTILE quartiles per event type
    "window_ntile" -> ((s, d) => Relational.windowNtile(s, d)),
    "window_lag" -> ((s, d) => Relational.windowLag(s, d)),
    // trailing 30-day RANGE-frame moving aggregate (event-time frames)
    "window_moving_avg" -> ((s, d) => Relational.windowMovingAvg(s, d)),
    // gap-filled daily resample + 7-day moving sum on the dense spine
    "resample_daily" -> ((s, d) => Relational.resampleDaily(s, d)),
    // bag-semantics EXCEPT ALL (multiplicity-preserving set difference)
    "except_all_users" -> ((s, d) => Relational.exceptAllUsers(s, d)),
    // percent_rank / cume_dist relative-position windows
    "window_pct" -> ((s, d) => Relational.windowPct(s, d)),
    // first/last/nth_value over the unbounded partition frame
    "window_first_last" -> ((s, d) => Relational.windowFirstLast(s, d)),
    // SCD2 dimension build: change rows -> validity intervals
    "scd2_history" -> ((s, d) => Relational.scd2History(s, d)),
    // Round 10: incremental aggregate maintenance — history/delta
    // partials merged by re-agg, proven ≡ full recompute by the oracle
    "agg_incremental" -> ((s, d) => Relational.aggIncremental(s, d)),
    // ordered view -> click -> purchase conversion funnel
    "event_funnel" -> ((s, d) => Relational.eventFunnel(s, d)),
    // weekly cohort retention triangle
    "cohort_retention" -> ((s, d) => Relational.cohortRetention(s, d)),
    // first-order Markov transition matrix over user event sequences
    "event_transitions" -> ((s, d) => Relational.eventTransitions(s, d)),
    // trailing-7-day distinct users per day (rolling uniques)
    "rolling_distinct" -> ((s, d) => Relational.rollingDistinctUsers(s, d)),
    // skew-probed plan choice (salted vs plain agg; same answer)
    "salted_auto" -> ((s, d) => Relational.saltedCountsAuto(s, d)),
    "q1_cube" -> ((s, d) => Relational.q1Cube(s, d)),
    // explicit GROUPING SETS over disjoint axes (neither rollup nor cube)
    "q1_sets" -> ((s, d) => Relational.q1Sets(s, d)),
    "intersect_users" -> ((s, d) => Relational.intersectUsers(s, d)),
    "heavy_hitters" -> ((s, d) => TextPipeline.heavyHitters(s, d)),
    "chunk_sliding" -> ((s, d) => TextPipeline.chunkSliding(s, d)),
    "assign_ids" -> ((s, d) => TextPipeline.assignIds(s, d)),
    "sample_fixed_k" -> ((s, d) => TextPipeline.sampleFixedK(s, d)),
    "unpivot_stats" -> ((s, d) => TextPipeline.unpivotStats(s, d)),
    "corpus_distinct" -> ((s, d) => TextPipeline.corpusDistinct(s, d)),
    "except_users" -> ((s, d) => Relational.exceptUsers(s, d)),
    "semi_join" -> ((s, d) => Relational.semiJoin(s, d)),
    "q4_priority" -> ((s, d) => Relational.q4Priority(s, d)),
    "q7_volume" -> ((s, d) => Relational.q7Volume(s, d)),
    "q13_custdist" -> ((s, d) => Relational.q13CustDist(s, d)),
    "q15_top_supplier" -> ((s, d) => Relational.q15TopSupplier(s, d)),
    "q17_small_qty" -> ((s, d) => Relational.q17SmallQty(s, d)),
    "q19_disjunct" -> ((s, d) => Relational.q19Disjunct(s, d)),
    "q22_idle" -> ((s, d) => Relational.q22Idle(s, d)),
    "ship_delay" -> ((s, d) => Relational.shipDelay(s, d)),
    "q2_min_cost" -> ((s, d) => Relational.q2MinCost(s, d)),
    "q8_market_share" -> ((s, d) => Relational.q8MarketShare(s, d)),
    "q9_profit" -> ((s, d) => Relational.q9Profit(s, d)),
    "q11_important_part" -> ((s, d) => Relational.q11ImportantPart(s, d)),
    "q16_supplier_count" -> ((s, d) => Relational.q16SupplierCount(s, d)),
    "q20_excess" -> ((s, d) => Relational.q20Excess(s, d)),
    "q21_waiting" -> ((s, d) => Relational.q21Waiting(s, d)),
    "stratified_sample" -> ((s, d) => TextPipeline.stratifiedSample(s, d)),
    "pack_chunks" -> ((s, d) => TextPipeline.packChunks(s, d)),
    "pack_chunks_bpe" -> ((s, d) => TextPipeline.packChunksBpe(s, d)),
    "pack_manifest" -> ((s, d) => TextPipeline.packManifest(s, d)),
    "asof_join" -> ((s, d) => AsofJoin.clicksAsofPurchases(s, d)),
    // forward as-of: next purchase at or after each click
    "asof_forward" -> ((s, d) => AsofJoin.clicksNextPurchase(s, d)),
    "range_join" -> ((s, d) => RangeSession.rangeJoinCounts(s, d)),
    "sessionize" -> ((s, d) => RangeSession.sessionize(s, d)),
    // session -> dialogue packing with left truncation + loss-mask tokens
    "sft_pack" -> ((s, d) => RangeSession.sftPack(s, d)),
    "graph_pagerank" -> ((s, d) => graft.operators.Graph.pagerank(s, d)),
    "graph_ppr" -> ((s, d) => graft.operators.Graph.pagerankPersonalized(s, d)),
    // deterministic label-propagation communities (generated oracle)
    "graph_lpa" -> ((s, d) => graft.operators.Graph.labelPropagation(s, d)),
    // HITS hubs/authorities on the directed bipartite purchase graph
    "graph_hits" -> ((s, d) => graft.operators.Graph.hits(s, d)),
    // weakly-connected components over the thresholded (strong) purchase
    // graph — the dedup CC machinery on the relational graph
    "graph_components" -> ((s, d) => graft.operators.Graph.components(s, d)),
    // LLM-data-pipeline: text analysis over `documents`
    "text_stats" -> ((s, d) => TextPipeline.textStats(s, d)),
    "text_quality" -> ((s, d) => TextPipeline.textQuality(s, d)),
    "text_lang_id" -> ((s, d) => TextPipeline.textLangId(s, d)),
    "text_fingerprint" -> ((s, d) => TextPipeline.textFingerprint(s, d)),
    "text_vocab" -> ((s, d) => TextPipeline.textVocab(s, d)),
    "corpus_stats" -> ((s, d) => TextPipeline.corpusStats(s, d)),
    "text_normalize" -> ((s, d) => TextPipeline.textNormalize(s, d)),
    "text_tfidf" -> ((s, d) => TextPipeline.textTfidf(s, d)),
    // PMI collocation mining (top bigrams vs unigram independence)
    "collocations" -> ((s, d) => TextPipeline.collocations(s, d)),
    // per-doc token-distribution entropy / type-token ratio (diversity axis)
    "text_entropy" -> ((s, d) => TextPipeline.textEntropy(s, d)),
    // DSIR hashed-bigram importance weights vs the en target split
    "dsir_weights" -> ((s, d) => TextPipeline.dsirWeights(s, d)),
    // model-based quality gate: hashed bag-of-words linear classifier
    // over seeded synthetic labels (train + score in one chain)
    // reliability-diagram bins: per-lang score deciles of the classifier,
    // exact integer (n, positives, score-sum) per bin
    "calib_bins" -> ((s, d) => graft.operators.DataQuality.calibBins(s, d)),
    // Pearson correlation between quality signals (heuristic, classifier,
    // token count) from exact integer moments, emitted in ppm
    "signal_corr" -> ((s, d) => graft.operators.DataQuality.signalCorr(s, d)),
    // RRF ensemble over (heuristic, classifier, LM-typicality) ranks —
    // integer micro-RRF, top-10 per language
    "quality_fusion" -> ((s, d) =>
      graft.operators.DataQuality.qualityFusion(s, d)),
    // exact Mann–Whitney ROC-AUC of the classifier per language
    // (integer average-rank tie handling)
    "classifier_auc" -> ((s, d) =>
      graft.operators.DataQuality.classifierAuc(s, d)),
    // Cohen's kappa between the heuristic and model quality gates
    "gate_kappa" -> ((s, d) => graft.operators.DataQuality.gateKappa(s, d)),
    // Round 12: Poisson-bootstrap CI (Chamandy'12) — 32 deterministic
    // hash-weighted resamples, rank-2/31 percentile interval
    "bootstrap_ci" -> ((s, d) =>
      graft.operators.DataQuality.bootstrapCi(s, d)),
    // most-confidently-contradicted labels (confident-learning rank core)
    "label_noise" -> ((s, d) => graft.operators.DataQuality.labelNoise(s, d)),
    "quality_classifier" -> ((s, d) =>
      TextPipeline.qualityClassifier(s, d)),
    // asymmetric shingle containment (doc-inside-doc detection)
    "dedup_containment" -> ((s, d) => TextPipeline.dedupContainment(s, d)),
    "decontaminate" -> ((s, d) => TextPipeline.decontaminate(s, d)),
    "stats_quantiles" -> ((s, d) => Relational.statsQuantiles(s, d)),
    "salted_counts" -> ((s, d) => Relational.saltedEventCounts(s, d)),
    "seq_len_buckets" -> ((s, d) => TextPipeline.seqLenBuckets(s, d)),
    "emb_normalize" -> ((s, d) => SimilarityPipeline.embNormalizeFlat(s, d)),
    "corpus_sample" -> ((s, d) => TextPipeline.corpusSample(s, d)),
    "sim_topk_batch" -> ((s, d) => SimilarityPipeline.simTopKBatch(s, d)),
    "dedup_report" -> ((s, d) => TextPipeline.dedupReport(s, d)),
    "ngram_counts" -> ((s, d) => TextPipeline.ngramCounts(s, d)),
    // LLM-data-pipeline: deduplication over `documents`
    "dedup_exact" -> ((s, d) => TextPipeline.dedupExact(s, d)),
    "dedup_minhash" -> ((s, d) => TextPipeline.dedupMinHash(s, d)),
    // edit-distance verify over the same banded blocking
    "dedup_edit" -> ((s, d) => TextPipeline.dedupEdit(s, d)),
    // snapshot diff between corpus versions (added/removed/changed)
    "corpus_diff" -> ((s, d) => TextPipeline.corpusDiff(s, d)),
    // feature-hashed 64-dim doc vectors (no-model text->vector bridge)
    "text_hash_embed" -> ((s, d) => TextPipeline.textHashEmbed(s, d)),
    // Round 12: CLIP-score-shaped caption/pair alignment gate (the
    // LAION/DataComp filter): hash-trick text vector vs stored embedding
    // cosine per id-joined pair, low-alignment pairs flagged
    "pair_alignment" -> ((s, d) => SimilarityPipeline.pairAlignment(s, d)),
    // per-doc fraction of 8-gram shingles unseen in any earlier doc
    "ngram_novelty" -> ((s, d) => TextPipeline.ngramNovelty(s, d)),
    // LSH banding tune grid: candidates/precision/recall per (bands, rows)
    "minhash_tune" -> ((s, d) => TextPipeline.minhashTune(s, d)),
    "dedup_jaccard" -> ((s, d) => TextPipeline.dedupJaccard(s, d)),
    "dedup_simhash" -> ((s, d) => TextPipeline.dedupSimHash(s, d)),
    "dedup_pipeline" -> ((s, d) => TextPipeline.dedupPipeline(s, d)),
    "dedup_incremental" -> ((s, d) => TextPipeline.dedupIncremental(s, d)),
    "dedup_clusters" -> ((s, d) => TextPipeline.dedupClusters(s, d)),
    // quality-aware canonical retention over the near-dup clusters
    "canonical_select" -> ((s, d) => TextPipeline.canonicalSelect(s, d)),
    // Multimodal binary columns (payload synthesis -> header parse -> frames)
    "media_meta" -> ((s, d) => MultimodalPipeline.mediaMeta(s, d)),
    // Round 11: REAL JPEG metadata decode — a marker-segment walk in
    // pure expressions over structurally-valid JPEG byte streams whose
    // SOF position varies per row; the oracle replays the construction
    // inputs, so equality proves the byte-level parse (roundtrip_ok is
    // computed Spark-side from the parsed values)
    "media_jpeg_meta" -> ((s, d) => MultimodalPipeline.mediaJpegMeta(s, d)),
    // Round 11: REAL pixel-level PNG decode — payloads are genuine PNG
    // files (JDK pure-Java encoder) and the statistics come from the
    // DECODED raster; the oracle recomputes the deterministic pixel law,
    // so equality proves the zlib/PNG round trip bit-for-bit
    "media_png_features" -> ((s, d) =>
      MultimodalPipeline.mediaPngFeatures(s, d)),
    // Round 11: REAL MP4/ISO-BMFF metadata decode — size-prefixed box
    // walk (moov offset varies per row) reading mvhd timescale/duration
    // and counting traks; the oracle replays the construction inputs
    "media_mp4_meta" -> ((s, d) => MultimodalPipeline.mediaMp4Meta(s, d)),
    // Round 11: REAL sample-level WAV decode — payloads are hand-built
    // RIFF/WAVE containers (variable-position data chunk) decoded through
    // the JDK's actual WAV codec; stats come from the DECODED PCM frames,
    // the oracle recomputes the sample law
    "media_wav_features" -> ((s, d) =>
      MultimodalPipeline.mediaWavFeatures(s, d)),
    // Round 12: REAL MP3 frame-header walk — ID3v2 syncsafe-size skip +
    // sync-validated MPEG-1 Layer III frame stepping (bitrate/sample-rate
    // table lookups, padding-aware lengths), all codegen'd expressions;
    // the oracle replays the construction law
    "media_mp3_meta" -> ((s, d) => MultimodalPipeline.mediaMp3Meta(s, d)),
    // Round 12: REAL AAC metadata decode — ADTS frame-header walk (sync
    // validation, sampling-frequency table, split 13-bit explicit frame
    // lengths); the oracle replays the construction law
    "media_aac_meta" -> ((s, d) => MultimodalPipeline.mediaAacMeta(s, d)),
    // Round 12: REAL H.264 metadata decode — AVCC length-prefixed NAL
    // walk (nal_unit_type census, SPS profile_idc/level_idc from the
    // plain-byte prefix); the oracle replays the construction law
    "media_h264_meta" -> ((s, d) => MultimodalPipeline.mediaH264Meta(s, d)),
    "media_frame_sample" -> ((s, d) => MultimodalPipeline.mediaFrameSample(s, d)),
    "media_resize" -> ((s, d) => MultimodalPipeline.mediaResize(s, d)),
    "media_dedup" -> ((s, d) => MultimodalPipeline.mediaDedup(s, d)),
    "media_shards" -> ((s, d) => MultimodalPipeline.mediaShardPlan(s, d)),
    "mixture_sample" -> ((s, d) => TextPipeline.mixtureSample(s, d)),
    "corpus_shuffle" -> ((s, d) => TextPipeline.corpusShuffle(s, d)),
    "split_train" -> ((s, d) => TextPipeline.splitTrain(s, d)),
    "split_by_source" -> ((s, d) => TextPipeline.splitBySource(s, d)),
    "split_leakage_safe" -> ((s, d) => TextPipeline.splitLeakageSafe(s, d)),
    // LLM-data-pipeline: similarity search over `embeddings`
    "sim_topk" -> ((s, d) => SimilarityPipeline.simTopK(s, d)),
    // MMR diversity rerank of the top-20 pool (generated greedy oracle)
    "mmr_rerank" -> ((s, d) => SimilarityPipeline.mmrRerank(s, d)),
    "sim_topk_ivf" -> ((s, d) => SimilarityPipeline.simTopKIvf(s, d)),
    // Round 12: IVF + PQ composite (IVFADC) — coarse-quantizer prune to
    // 2 clusters, PQ-code scoring inside them only, exact rerank; the
    // billion-scale recipe both parents only half-realize
    "sim_topk_ivfpq" -> ((s, d) => SimilarityPipeline.simTopKIvfPq(s, d)),
    // the composite's BATCH shape: 8-query panel served in one pass —
    // probe table fan-out, per-query windows, no per-query job
    "sim_topk_ivfpq_batch" -> ((s, d) =>
      SimilarityPipeline.simTopKIvfPqBatch(s, d)),
    // Round 11: the LSH-bucketed ANN scale path — query probes only its
    // own 4 hyperplane band buckets; in_exact = recall audit vs brute
    "sim_topk_lsh" -> ((s, d) => SimilarityPipeline.simTopKLsh(s, d)),
    // Round 11: the LSH BATCH shape — 8 queries' band rows joined to the
    // corpus buckets (the scale plan: no per-query pass anywhere)
    "sim_topk_lsh_batch" -> ((s, d) =>
      SimilarityPipeline.simTopKLshBatch(s, d)),
    // Round 11: the bands-vs-recall tuning curve over one shared sign
    // pass — minhash_tune's twin for the ANN side
    "lsh_recall_grid" -> ((s, d) => SimilarityPipeline.lshRecallGrid(s, d)),
    // Round 12: the PERSISTED LSH index — build on the non-delta residue,
    // fold the delta in (immutable segments + versioned manifest), probe
    // via (band, pfx)-pruned bucket scans; the oracle recomputes
    // sim_topk_lsh over the whole corpus under the same frozen
    // hyperplanes, so the green hash proves build + append + probe
    "lsh_store" -> ((s, d) =>
      graft.operators.PersistedIndex.lshTopKFromSessionStore(s, d)),
    // Round 12: the store's BATCH probe — 8 query signatures broadcast
    // against the live bucket segments, candidates-only scoring,
    // per-query rank + brute-force audit; same recompute oracle as
    // sim_topk_lsh_batch
    "lsh_store_batch" -> ((s, d) =>
      graft.operators.PersistedIndex.lshBatchFromSessionStore(s, d)),
    // filtered ANN (round 13): metadata predicate pushed INSIDE the
    // persisted-index probes — IVF code-column scan + LSH verify scan
    "sim_topk_filtered" -> ((s, d) =>
      graft.operators.PersistedIndex.ivfFilteredFromSessionStore(s, d)),
    "lsh_store_filtered" -> ((s, d) =>
      graft.operators.PersistedIndex.lshFilteredFromSessionStore(s, d)),
    "emb_neardup" -> ((s, d) => SimilarityPipeline.embNearDup(s, d)),
    "emb_centroid_stats" -> ((s, d) => SimilarityPipeline.embCentroidStats(s, d)),
    "emb_outliers" -> ((s, d) => SimilarityPipeline.embOutliers(s, d)),
    // exact per-label all-pairs distance moments via the O(n) identity
    "emb_diversity" -> ((s, d) => SimilarityPipeline.embDiversity(s, d)),
    // per-label participation ratio of the variance spectrum (collapse)
    "emb_eff_rank" -> ((s, d) => SimilarityPipeline.embEffRank(s, d)),
    // contrastive-pair mining: hardest positive/negative per panel anchor
    "hard_negatives" -> ((s, d) => SimilarityPipeline.hardNegatives(s, d)),
    // simplified silhouette over the learned k-means model (IVF health)
    "cluster_silhouette" -> ((s, d) =>
      SimilarityPipeline.clusterSilhouette(s, d)),
    "emb_clusters" -> ((s, d) => SimilarityPipeline.embClusters(s, d)),
    "emb_kmeans" -> ((s, d) => SimilarityPipeline.embKmeans(s, d)),
    "sim_topk_kmeans" -> ((s, d) => SimilarityPipeline.simTopKKmeans(s, d)),
    "semantic_dedup" -> ((s, d) => SimilarityPipeline.semanticDedup(s, d)),
    // cluster-blocked exact kNN graph over the learned index
    "knn_graph" -> ((s, d) => SimilarityPipeline.knnGraph(s, d)),
    // Round 11: incremental kNN-graph maintenance — frozen base-trained
    // index, neighborhoods recomputed ONLY in delta-touched clusters;
    // the oracle's full recompute makes the green hash the
    // append==recompute proof
    "knn_graph_delta" -> ((s, d) => SimilarityPipeline.knnGraphDelta(s, d)),
    // Round 11: the PERSISTED form — build the graph store on the base
    // residue, fold the delta batch in (copy-on-write cluster
    // partitions), read edges back; oracle = the frozen-centroid full
    // recompute, so the green hash proves store build+append+read
    "knn_store" -> ((s, d) =>
      graft.operators.PersistedIndex.knnGraphFromSessionStore(s, d)),
    // Round 10: triangle census of the mutual kNN graph via
    // degree-ordered orientation (each triangle found once, out-degree
    // bounded O(sqrt m) on any degree distribution)
    "knn_triangles" -> ((s, d) => SimilarityPipeline.knnTriangles(s, d)),
    // Round 10: margin-based cross-lingual pair mining (ratio margin,
    // cluster-blocked candidates, exact integer neighborhood sums)
    "bitext_mine" -> ((s, d) => SimilarityPipeline.bitextMine(s, d)),
    // Round 10: 3-core of the mutual kNN graph by fixed-round peeling
    "knn_kcore" -> ((s, d) => SimilarityPipeline.knnKcore(s, d)),
    // Round 10: per-source embedding drift vs the corpus mean
    "emb_drift" -> ((s, d) => SimilarityPipeline.embDrift(s, d)),
    // Round 10: Morton-key layout audit (per-bucket 2-D bounding boxes)
    "zorder_stats" -> ((s, d) => Relational.zorderStats(s, d)),
    // Round 10: greedy k-center coreset selection (farthest-point)
    "coreset_kcenter" -> ((s, d) =>
      SimilarityPipeline.coresetKcenter(s, d)),
    // Round 10: trusted-seed label spreading over the mutual kNN graph
    "quality_propagate" -> ((s, d) =>
      SimilarityPipeline.qualityPropagate(s, d)),
    // Round 10: rank-biased overlap between the two lexical rankers
    "rbo_overlap" -> ((s, d) => graft.operators.Retrieval.rboOverlap(s, d)),
    // Round 10: Zipf-law OLS fit over the token frequency head
    "zipf_fit" -> ((s, d) => TextPipeline.zipfFit(s, d)),
    // Round 6: recall telemetry — recall@k of the two-stage ANN retrieval
    // vs brute force over an (nprobe x over_fetch) grid
    "ann_recall_grid" -> ((s, d) => SimilarityPipeline.annRecallGrid(s, d)),
    // Round 9: product quantization (Jégou'11) — codebook-compressed ANN
    // (literal codebooks, scan-only encode, exact rerank) + per-subspace
    // reconstruction-error/code-usage telemetry in exact micro-units
    "pq_topk" -> ((s, d) => SimilarityPipeline.pqTopK(s, d)),
    // Round 12: the PERSISTED PQ index — train once, persist codebooks +
    // codes (immutable segments, versioned manifest), probe by decoding
    // the STORED codes (ADC from frozen-codebook literals) + exact
    // rerank; same recompute oracle as pq_topk, so the green hash proves
    // train -> persist -> decode-probe round-trips the in-query PQ
    "pq_store" -> ((s, d) =>
      graft.operators.PersistedIndex.pqTopKFromSessionStore(s, d)),
    // Round 12: the PERSISTED IVF+PQ index (the FAISS IVFADC layout) —
    // codes hive-partitioned by coarse cluster, stored-centroid probe,
    // codes-only pruned stage 1, partition-pruned float rerank; same
    // recompute oracle as sim_topk_ivfpq, so the green hash proves
    // train -> persist -> pruned-decode-probe round-trips the composite
    "ivfpq_store" -> ((s, d) =>
      graft.operators.PersistedIndex.ivfPqTopKFromSessionStore(s, d)),
    // RANGE-filtered probe (vec_id ∈ [100, 400) — the recency window),
    // completing the equality/range filtered-ANN pair
    "ivfpq_store_filtered" -> ((s, d) =>
      graft.operators.PersistedIndex.ivfPqFilteredFromSessionStore(s, d)),
    // Round 14: batched AND filtered ANN — 8 queries each with its own
    // vec_id range through the persisted IVF+PQ store in ONE pass; the
    // panel-union range rides the shared stage-1 codes scan
    "sim_topk_filtered_batch" -> ((s, d) =>
      graft.operators.PersistedIndex
        .ivfPqFilteredBatchFromSessionStore(s, d)),
    // Round 14: the LSH side of the batched filtered workload — 8
    // queries each with its own label, the union IN-list prefiltering
    // the shared verify scan, per-query filtered brute-force audit
    "lsh_store_filtered_batch" -> ((s, d) =>
      graft.operators.PersistedIndex.lshFilteredBatchFromSessionStore(s, d)),
    "pq_recon_error" -> ((s, d) => SimilarityPipeline.pqReconError(s, d)),
    // measured recall@k of the PQ stage vs brute force, exact integers
    "pq_recall" -> ((s, d) => SimilarityPipeline.pqRecall(s, d)),
    // Matryoshka truncation audit: recall@10 of prefix-dim retrieval vs
    // the full-dim exact top-k, in basis points (64-dim row = 10000 anchor)
    "mrl_recall" -> ((s, d) => SimilarityPipeline.mrlRecall(s, d)),
    // Round 6: HLL distinct-token sketch + temperature resampling applied
    "hll_distinct" -> ((s, d) => graft.operators.Sketches.hllDistinctTokens(s, d)),
    "hist_quantiles" -> ((s, d) => graft.operators.Sketches.histQuantiles(s, d)),
    // two disjoint shards sketched separately, merged, estimated — the
    // oracle sketches the whole corpus in one pass, so green means the
    // register merge is lossless (HLL's mergeability, query-proven)
    "hll_union" -> ((s, d) => graft.operators.Sketches.hllUnion(s, d)),
    // count-min frequency sketch calibrated against the exact top-20
    "cms_freq" -> ((s, d) => graft.operators.Sketches.cmsFreq(s, d)),
    // heavy hitters via the CMS prefilter + exact confirm (answer ==
    // the plain threshold filter; the sketch only shapes the plan)
    "heavy_hitters_cms" -> ((s, d) =>
      graft.operators.Sketches.heavyHittersCms(s, d)),
    // bottom-k (KMV/theta) distinct sketch; the uniform-sample-of-the-
    // distinct-set property also buys pairwise intersections below
    "kmv_distinct" -> ((s, d) => graft.operators.Sketches.kmvDistinct(s, d)),
    // theta-sketch intersection between per-language token sets — the
    // set operation HLL cannot express; exact calibration joined on
    // theta-sketch A-not-B (set difference) between per-language sketches
    "kmv_difference" -> ((s, d) =>
      graft.operators.Sketches.kmvDifferenceLangs(s, d)),
    // AMS sign-sketch F2 (self-join size / skew) per language
    "f2_moment" -> ((s, d) => graft.operators.Sketches.f2Moment(s, d)),
    "kmv_intersect" -> ((s, d) =>
      graft.operators.Sketches.kmvIntersectLangs(s, d)),
    // cross-document exact substring dedup (Lee et al. ACL'22): maximal
    // duplicated token spans, and the span-removed corpus digest-proven
    "dup_spans" -> ((s, d) => graft.operators.SubstringDedup.dupSpans(s, d)),
    "substring_dedup" -> ((s, d) =>
      graft.operators.SubstringDedup.substringDedup(s, d)),
    // quantitative train->eval contamination: per eval doc, the fraction
    // of its 8-gram shingles present anywhere in the train split
    "overlap_report" -> ((s, d) =>
      graft.operators.SubstringDedup.overlapReport(s, d)),
    // the composed batch curation program: gate -> dedup -> cap ->
    // budget -> split in one chained plan (the trainingIngestStream twin)
    "curation_program" -> ((s, d) =>
      graft.operators.CurationProgram.curationProgram(s, d)),
    // (Rounds 9-11 carried four adjudication probes here —
    // curation_manifest/half_a/half_b/q_probe — for the six-round
    // curation_program hash-red. Root cause found r11: DuckDB windowed
    // sum(BIGINT) returns HUGEINT, rendered as decimal by the driver's
    // arrow reader. The oracle now CASTs start_offset, the arrow-decimal
    // gate in tools/check_oracle.py prevents recurrence, and the probes
    // are deleted per VERDICT r11 Next #2.)
    // Round 11: the PERSISTED curation store — the program's production
    // daily shape. Builds docs/ + manifest/ at a session temp path once
    // per (app, sfDir) and reads the manifest BACK from parquet; must
    // equal curation_program row-for-row (same oracle). Delta-append
    // equivalence (append == recompute) is CurationStoreSpec's contract.
    "curation_store" -> ((s, d) =>
      graft.operators.CurationStore.manifestFromSessionStore(s, d)),
    // the DELTA path under the driver oracle: build on the first-half
    // snapshot, applyCurationDelta the second half, read back — must
    // still equal the from-scratch program (append == recompute)
    "curation_store_delta" -> ((s, d) =>
      graft.operators.CurationStore.manifestFromSessionDeltaStore(s, d)),
    // Round 11: manifest TIME TRAVEL — every store fold writes a new
    // immutable manifest version; this query diffs v1 (first-half
    // build) against v2 (after the delta fold): docs the fold added,
    // and docs it re-leveled OUT (the budget boundary moves)
    "curation_diff" -> ((s, d) =>
      graft.operators.CurationStore.manifestDiffFromSessionStore(s, d)),
    // Round 11: the FORGET path — build, forget doc_id % 13 == 2
    // (dedup-winner succession + cap re-ranks, copy-on-write partition
    // rewrites, zero text), read back; oracle = the program over the
    // corpus minus the forgotten docs
    "curation_forget" -> ((s, d) =>
      graft.operators.CurationStore.manifestFromSessionForgetStore(s, d)),
    // Round 11 interchange formats: per-source profile AFTER a full
    // parquet -> format -> schema-explicit typed read round trip; the
    // oracle profiles the ORIGINAL parquet, so equality proves the
    // export/ingest path loses nothing (ids, UTF-8 bytes via md5,
    // numerics). JSONL = the crawl-dump shape (quarantine-tolerant
    // read), CSV = the labeling-vendor shape (pinned RFC 4180 quoting),
    // ORC = the other columnar (pushdown asserted in spec)
    "jsonl_roundtrip" -> ((s, d) =>
      graft.sources.TextInterchange.jsonlRoundtrip(s, d)),
    "csv_roundtrip" -> ((s, d) =>
      graft.sources.TextInterchange.csvRoundtrip(s, d)),
    "orc_roundtrip" -> ((s, d) =>
      graft.sources.TextInterchange.orcRoundtrip(s, d)),
    // its per-stage funnel report (docs/tokens surviving each stage)
    "curation_funnel" -> ((s, d) =>
      graft.operators.CurationProgram.curationFunnel(s, d)),
    // Round 10: per-doc lineage — the first stage that rejected each doc
    "curation_trace" -> ((s, d) =>
      graft.operators.CurationProgram.curationTrace(s, d)),
    // divergence localizer: one in-engine md5 per curation_program column
    // (values digested in doc_id order INSIDE each engine, so a driver
    // hash mismatch on the main query names its divergent column here)
    "curation_cols" -> ((s, d) =>
      graft.operators.ColumnDigest.digests(
        graft.operators.CurationProgram.curationProgram(s, d), "doc_id",
        Seq("doc_id", "source", "lang", "n_tokens", "quality_q4", "cap_rk",
          "start_offset", "bucket", "split"))),
    // Round 11: exact Hamilton (largest-remainder) apportionment of an
    // eval budget across (lang, source) strata + the admitted sample
    // (firstKPerKey per-cell quotas) — quotas sum to evalN exactly
    "eval_alloc" -> ((s, d) => graft.operators.CorpusRules.evalAlloc(s, d)),
    "eval_sample" -> ((s, d) => graft.operators.CorpusRules.evalSample(s, d)),
    "temperature_sample" -> ((s, d) => TextPipeline.temperatureSample(s, d)),
    // Efraimidis-Spirakis weighted sample: k docs per language, drawn
    // proportional to n_chars without replacement, deterministic keys
    "weighted_sample" -> ((s, d) => TextPipeline.weightedSample(s, d)),
    // Round 5: corpus-curation additions (per-domain caps, temperature
    // mixing, boilerplate signal, curriculum ordering, token budgets,
    // bloom-prefiltered decontamination, int8 quantization)
    "domain_cap" -> ((s, d) => TextPipeline.domainCap(s, d)),
    "lang_temperature" -> ((s, d) => TextPipeline.langTemperature(s, d)),
    "boilerplate_ngrams" -> ((s, d) => TextPipeline.boilerplateNgrams(s, d)),
    "curriculum" -> ((s, d) => TextPipeline.curriculum(s, d)),
    "token_budget_sample" -> ((s, d) => TextPipeline.tokenBudgetSample(s, d)),
    "token_budget_bpe" -> ((s, d) => TextPipeline.tokenBudgetSampleBpe(s, d)),
    // per-lang budget denominated in FROZEN-unigram tokens (the second
    // tokenizer family's accountant)
    "token_budget_unigram" -> ((s, d) =>
      graft.operators.UnigramTrainer.tokenBudgetSampleUnigram(s, d)),
    // WordPiece likelihood-merge trainer (third tokenizer family; BERT's):
    // all-integer/varchar surface (round, pair, merged, pair/unigram counts)
    "wordpiece_merges" -> ((s, d) =>
      graft.operators.WordPieceTrainer.wordpieceMerges(s, d)),
    // per-lang budget denominated in FROZEN-WordPiece greedy-match tokens
    "token_budget_wordpiece" -> ((s, d) =>
      graft.operators.WordPieceTrainer.tokenBudgetSampleWordpiece(s, d)),
    // decode(encode(w)) == w audit over ALL THREE frozen tokenizer families:
    // priced/roundtrip/unsegmentable counts + the remainder named
    "tokenizer_roundtrip" -> ((s, d) =>
      graft.operators.TokenizerAudit.tokenizerRoundtrip(s, d)),
    // corpus-weighted tokens/chars/occurrence sums per frozen family
    // (fertility + compression rate as exact integer numerators)
    "tokenizer_fertility" -> ((s, d) =>
      graft.operators.TokenizerAudit.tokenizerFertility(s, d)),
    // DoReMi-style (static-loss) domain-mixture reweighting: EG updates
    // on per-domain excess unigram cross-entropy, all-integer surface
    "domain_reweight" -> ((s, d) =>
      graft.operators.MixtureOptimizer.domainReweight(s, d)),
    // RHO-loss-style per-doc selection: excess micro-NLL of the generic
    // unigram LM over the per-language one, top-k per language
    "excess_loss_select" -> ((s, d) =>
      graft.operators.MixtureOptimizer.excessLossSelect(s, d)),
    // fill-in-the-middle format prep: hash-deterministic PSM cut points,
    // exact token accounting + middle-span digest
    "fim_split" -> ((s, d) => TextPipeline.fimSplit(s, d)),
    // Bradley-Terry (Hunter MM) per-source strengths over deterministic
    // quality-derived pairwise comparisons — the RLHF-prep rating family
    "bt_ratings" -> ((s, d) => graft.operators.Preference.btRatings(s, d)),
    // Elo over the same comparison stream, replayed in match order — the
    // ONLINE rating twin (one sequential pool per language, pools parallel)
    "elo_ratings" -> ((s, d) => graft.operators.Preference.eloRatings(s, d)),
    // circular-triad consistency of the preference matrix (Kendall zeta)
    "pref_cycles" -> ((s, d) => graft.operators.Preference.prefCycles(s, d)),
    "decontaminate_bloom" -> ((s, d) => TextPipeline.decontaminateBloom(s, d)),
    "emb_quantize" -> ((s, d) => SimilarityPipeline.embQuantizeFlat(s, d)),
    // top principal component by unrolled power iteration (generated oracle)
    "emb_pca_power" -> ((s, d) => SimilarityPipeline.embPcaPower(s, d)),
    // 1-D PCA coordinates: centered dot against the learned component
    "emb_pca_project" -> ((s, d) => SimilarityPipeline.embPcaProject(s, d)),
    // hyperplane-LSH banding tune grid (the embedding minhash_tune)
    "sim_recall_tune" -> ((s, d) => SimilarityPipeline.simRecallTune(s, d)),
    "sim_topk_q8" -> ((s, d) => SimilarityPipeline.simTopKQ8(s, d)),
    "lm_perplexity" -> ((s, d) => TextPipeline.lmPerplexity(s, d)),
    // Round 12: Min-K% prob membership-inference audit (Shi ICLR'24) —
    // mean NLL of each doc's 20% least-probable tokens; integer-ranked
    // bottom-k selection, micro-quantized order-invariant sums
    "mink_contamination" -> ((s, d) =>
      TextPipeline.minkContamination(s, d)),
    // CCNet head/middle/tail gate: per-lang perplexity terciles
    "perplexity_gate" -> ((s, d) => TextPipeline.perplexityGate(s, d)),
    "lm_bigram" -> ((s, d) => TextPipeline.lmBigram(s, d)),
    // interpolated Kneser-Ney (d=0.75), the production n-gram smoothing
    "lm_kneser_ney" -> ((s, d) => TextPipeline.lmKneserNey(s, d)),
    // Jelinek-Mercer interpolated trigram perplexity
    "lm_trigram" -> ((s, d) => TextPipeline.lmTrigram(s, d)),
    "inverted_index" -> ((s, d) => Retrieval.invertedIndexFlat(s, d)),
    "index_topk" -> ((s, d) => Retrieval.indexTopK(s, d)),
    // batched retrieval: top-k per query of a query TABLE, one corpus pass
    "index_topk_batch" -> ((s, d) => Retrieval.indexTopKBatch(s, d)),
    // BM25 lexical ranking (Robertson k1/b defaults, Lucene idf)
    "bm25_topk" -> ((s, d) => Retrieval.bm25TopK(s, d)),
    // Round 12: BM25 over the PERSISTED text index — build on the even
    // ids, fold the odd ids in as an immutable segment + manifest
    // version, search (bucket-pruned postings, doc-keyed doclens, summed
    // meta normalizer); same whole-corpus oracle as bm25_topk, so the
    // green hash proves build + append + segment-merged search
    "bm25_store" -> ((s, d) =>
      graft.operators.PersistedIndex.bm25FromSessionStore(s, d)),
    // TF-IDF vs BM25 rank-agreement diagnostic over the shared panel
    "ranker_agreement" -> ((s, d) => Retrieval.rankerAgreement(s, d)),
    // hybrid lexical+vector retrieval via Reciprocal Rank Fusion
    "hybrid_rrf" -> ((s, d) => Retrieval.hybridRrf(s, d)),
    // the composed RAG build promoted to one operator (round 13):
    // chunks → hash-embed → seeded IVF → chunk BM25 index → hybrid probe
    "retrieval_program" -> ((s, d) =>
      graft.operators.RetrievalProgram.retrievalProgram(s, d)),
    "retrieval_funnel" -> ((s, d) =>
      graft.operators.RetrievalProgram.retrievalFunnel(s, d)),
    // Round 14: the composed RAG chain as a PERSISTED store — chunk
    // manifest, sparse vectors (cluster-partitioned), chunk postings,
    // frozen seed quantizer, built once + delta-appended; the probe
    // reads zero corpus text and answers the SAME chain oracle as
    // retrieval_program, so the green hash proves build + append + probe
    "retrieval_store" -> ((s, d) =>
      graft.operators.RetrievalStore.retrievalFromSessionStore(s, d)),
    // Round 14: retrieval-quality scorecard — NDCG@5 / MRR / recall@5
    // of the batched TF-IDF ranking against corpus-derived graded qrels
    // (grade = matched-term count, relevant = grade >= 2); integer gains
    // x embedded discount literals, one floor-quantized division each
    "retrieval_ndcg" -> ((s, d) =>
      graft.operators.Retrieval.retrievalEval(s, d)),
    // Round 14: full-content integrity scorecard of the persisted store
    // — exact integer checksums over EVERY artifact (vectors, norms,
    // postings, chunk manifest, assignment), replayed by the same chain
    // CTE generator: widens the verified surface from the probe's top-k
    // rows to all store content
    "retrieval_store_stats" -> ((s, d) =>
      graft.operators.RetrievalStore.statsFromSessionStore(s, d)),
    // Round 15: the batched serving shape — an 8-query panel probed in
    // ONE pass over the persisted store (postings pruned to the union
    // of the panel's terms, vector side pruned to the union of probed
    // clusters, per-query two-phase ranking windows + per-query RRF)
    "retrieval_store_batch" -> ((s, d) =>
      graft.operators.RetrievalStore.retrievalBatchFromSessionStore(s, d)),
    // Round 15: production-ranker scorecard — NDCG@5/MRR/recall@5 of
    // FOUR rankers (TF-IDF panel, persisted-index BM25 batch, hybrid
    // RRF, retrieval-store batch probe) against ONE shared qrels whose
    // grade is INDEPENDENT of every ranker's scoring signal (seed-B
    // hash-embedding cosine buckets, exact integer threshold compares)
    "retrieval_ndcg_rankers" -> ((s, d) =>
      graft.operators.RankerEval.rankerScorecard(s, d)),
    // Round 15: the filtered serving shape — the store probe under a
    // doc-id recency window pushed into BOTH probe sides' parquet scans
    // (postings AND cluster-pruned vectors/norms), over-probed +1
    // cluster to compensate for predicate-removed candidates
    "retrieval_store_filtered" -> ((s, d) =>
      graft.operators.RetrievalStore.retrievalFilteredFromSessionStore(s, d)),
    // Round 15: scorecard regression gate — quality scorecards persist
    // under StoreVersioning (one immutable segment per release) and the
    // gate diffs the latest two releases per (component, metric); the
    // session store publishes the true TF-IDF scorecard then a DEGRADED
    // second release, so the flagged rows ARE the detected regression
    "scorecard_drift" -> ((s, d) =>
      graft.operators.RankerEval.driftFromSessionStore(s, d)),
    "rep_stats" -> ((s, d) => TextPipeline.repetitionStats(s, d)),
    "bpe_stats" -> ((s, d) => TextPipeline.bpeStats(s, d)),
    "pii_scrub" -> ((s, d) => TextPipeline.piiScrub(s, d)),
    // Iterative trainer; oracle is the GENERATED unrolled-CTE replay
    // (BpeTrainer.bpeOracleSql) — merge-sequence exactness is also
    // pinned by BpeTrainerSpec
    "bpe_merges" -> ((s, d) => graft.operators.BpeTrainer.bpeMerges(s, d)),
    // Data-validation / monitoring gates (DataQuality)
    "data_profile" -> ((s, d) => DataQuality.dataProfile(s, d)),
    "quality_checks" -> ((s, d) => DataQuality.qualityChecks(s, d)),
    "dist_drift" -> ((s, d) => DataQuality.distDrift(s, d)),
    // FK orphan audit across the star schema
    "ref_integrity" -> ((s, d) => DataQuality.refIntegrity(s, d)),
    // k-anonymity / l-diversity release audit over customer QI classes
    "k_anonymity" -> ((s, d) => DataQuality.kAnonymity(s, d)),
    // Round 10: rule-based curation batteries and budget planners
    // (CorpusRules scaladoc: Gopher rule battery / data-constrained
    // repetition schedule / cross-source shingle overlap)
    "gopher_rules" -> ((s, d) =>
      graft.operators.CorpusRules.gopherRules(s, d)),
    "data_epochs" -> ((s, d) =>
      graft.operators.CorpusRules.dataEpochs(s, d)),
    "source_overlap" -> ((s, d) =>
      graft.operators.CorpusRules.sourceOverlap(s, d)),
    "source_overlap_sketch" -> ((s, d) =>
      graft.operators.CorpusRules.sourceOverlapSketch(s, d)),
    "budget_waterfill" -> ((s, d) =>
      graft.operators.CorpusRules.budgetWaterfill(s, d)),
    // planner telemetry: key-skew + exact join-cardinality estimates
    // from keyed counts (the shuffle never moves fact rows)
    "skew_report" -> ((s, d) =>
      graft.operators.PlannerTelemetry.skewReport(s, d)),
    "join_cardinality" -> ((s, d) =>
      graft.operators.PlannerTelemetry.joinCardinality(s, d)),
    // Round 10: the decision layer — broadcast/salt/pre-agg/shuffle
    // chosen by exact integer rules over the keyed-count estimates
    "plan_advisor" -> ((s, d) =>
      graft.operators.PlannerTelemetry.planAdvisor(s, d)),
    // Round 11: partitioned-write layout planner — exact per-partition
    // file counts/verdicts from one keyed agg (the small-files advisor)
    "layout_advisor" -> ((s, d) =>
      graft.operators.PlannerTelemetry.layoutAdvisor(s, d)),
    // numeric-shape drift: PSI over length-histogram bins
    "hist_drift" -> ((s, d) => DataQuality.histDrift(s, d)),
    // declared-vs-detected language confusion matrix
    "lang_confusion" -> ((s, d) => TextPipeline.langConfusion(s, d)),
    // per-lang tokenizer fertility distribution (1/2/3/4+ symbols)
    "bpe_coverage" -> ((s, d) => TextPipeline.bpeVocabCoverage(s, d)),
    // unigram-LM (SentencePiece-style) tokenizer training: released
    // vocab with usage counts and micro-log scores
    "unigram_vocab" -> ((s, d) =>
      graft.operators.UnigramTrainer.unigramVocab(s, d)),
    // fresh unigram vs frozen BPE fertility per language
    "unigram_coverage" -> ((s, d) =>
      graft.operators.UnigramTrainer.unigramCoverage(s, d)),
    // rolling z-score anomaly over the per-minute max metric series (the
    // adaptive-baseline upgrade of the fixed threshold alarm)
    "metric_anomaly" -> ((s, d) => DataQuality.metricAnomaly(s, d)),
  )

  /** Shared oracle CTE fragments (dedup family) — one definition, several
    * queries, so the SQL cannot drift between the pair query and the
    * operators built on top of it.
    */
  private val shingleSetCtes =
    """sh AS (
  SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' ')) END AS sg
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
ss AS (SELECT doc_id, list_distinct(sg) AS s FROM sh)"""

  private val minhashPairCtes =
    """sig AS (SELECT doc_id, s, list_transform(range(16), k -> list_min(list_transform(s, x -> md5(k || ':' || x)))) AS mh FROM ss),
bands AS (SELECT doc_id, b.band, md5(mh[b.band*4+1] || '|' || mh[b.band*4+2] || '|' || mh[b.band*4+3] || '|' || mh[b.band*4+4]) AS digest
  FROM sig, (SELECT unnest(range(4)) AS band) b),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id),
v AS (SELECT doc_a, doc_b,
    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
  FROM cand JOIN ss x ON cand.doc_a = x.doc_id JOIN ss y ON cand.doc_b = y.doc_id)"""

  /** FrozenMerges replayed as a DuckDB left-to-right non-overlapping
    * replace chain over <sym>-wrapped characters — ONE definition shared
    * by the three BPE-denominated oracles (token_budget_bpe,
    * pack_chunks_bpe, bpe_stats), so the frozen table cannot drift
    * between them. n_sym = count of '<'; word_chars rides along for the
    * stats query (harmless elsewhere).
    */
  /** The hashed-linear-classifier replay (label derivation, 4096-bucket
    * hashed features, log-odds weights, per-doc position-ordered weight
    * lists) — shared by quality_classifier, calib_bins, and signal_corr
    * so the model arithmetic cannot drift between its consumers. Ends at
    * `d(doc_id, label, n_feats, ws)`.
    */
  private val clfReplayCtes =
    """lb AS (SELECT doc_id, text,
  CASE WHEN CAST(list_sum(list_transform(range(4), dd ->
    CAST(strpos('0123456789abcdef', md5('qc:' || CAST(doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-dd))))) % 100 AS BIGINT) < 50 THEN 1 ELSE 0 END AS label
  FROM documents),
f0 AS (SELECT doc_id, label, unnest(string_split(text, ' ')) AS token,
  unnest(range(len(string_split(text, ' ')))) AS pos FROM lb),
fb AS (SELECT doc_id, label, pos,
  CAST((strpos('0123456789abcdef', md5(token)[1:1]) - 1) * 256
     + (strpos('0123456789abcdef', md5(token)[2:2]) - 1) * 16
     + (strpos('0123456789abcdef', md5(token)[3:3]) - 1) AS BIGINT) AS bucket
  FROM f0 WHERE len(token) > 0),
counts AS (SELECT bucket, CAST(sum(label) AS BIGINT) AS cp,
  CAST(sum(1 - label) AS BIGINT) AS cn FROM fb GROUP BY bucket),
tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn
  FROM counts),
w AS (SELECT bucket, ln((cp + 1) / (np + 4096)) - ln((cn + 1) / (nn + 4096)) AS w
  FROM counts, tot),
d AS MATERIALIZED (SELECT doc_id, label, CAST(count(*) AS BIGINT) AS n_feats,
  list(w ORDER BY pos) AS ws
  FROM fb JOIN w USING (bucket) GROUP BY doc_id, label)"""

  private val bpeReplayCtes =
    """words AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
  FROM documents),
enc AS (SELECT word,
  replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(
    regexp_replace(word, '(.)', '<\1>', 'g'),
    '<e><r>', '<er>'), '<o><r>', '<or>'), '<i><n>', '<in>'),
    '<o><w>', '<ow>'), '<s><t>', '<st>'), '<l><u>', '<lu>'),
    '<a><r>', '<ar>'), '<p><ar>', '<par>'), '<m><er>', '<mer>'),
    '<a><t>', '<at>'), '<a><n>', '<an>'), '<c><an>', '<can>'),
    '<s><can>', '<scan>'), '<c><o>', '<co>'), '<co><lu>', '<colu>'),
    '<colu><m>', '<colum>') AS s
  FROM words WHERE length(word) > 0),
nsym AS (SELECT word,
  CAST(length(s) - length(replace(s, '<', '')) AS BIGINT) AS n_sym,
  CAST(length(word) AS BIGINT) AS word_chars FROM enc)"""

  /** Two unrolled Lloyd rounds, shared by emb_kmeans and sim_topk_kmeans:
    * seeds = vec_id < 8, squared-L2 assignment with ties to the lowest
    * cluster, means rounded to 4 decimals (the cross-engine float pin —
    * see SimilarityPipeline.embKmeans).
    */
  private val kmeansCtes =
    """ek AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
c0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster, v AS c FROM ek WHERE vec_id < 8),
d1 AS (SELECT ek.vec_id, c0.cluster,
  list_sum(list_transform(range(64), i -> (v[i+1] - c[i+1]) * (v[i+1] - c[i+1]))) AS d2 FROM ek, c0),
a1 AS (SELECT vec_id, cluster, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM d1),
ux AS (SELECT vec_id, unnest(v) AS x, unnest(range(64)) AS pos FROM ek),
mm AS (SELECT a1.cluster, ux.pos, round(avg(ux.x), 4) AS mx
  FROM a1 JOIN ux ON a1.vec_id = ux.vec_id WHERE a1.rn = 1 GROUP BY a1.cluster, ux.pos),
c1 AS (SELECT cluster, list(mx ORDER BY pos) AS c FROM mm GROUP BY cluster),
d2t AS (SELECT ek.vec_id, c1.cluster,
  list_sum(list_transform(range(64), i -> (v[i+1] - c[i+1]) * (v[i+1] - c[i+1]))) AS d2 FROM ek, c1),
a2 AS (SELECT vec_id, cluster, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM d2t)"""

  /** The mutual-kNN edge CTE chain (kmeans rounds → cluster-blocked kNN
    * → mutual edges with u < v), shared by the knn_kcore oracle.
    */
  private val mutualKnnCtes =
    s"""$kmeansCtes,
asg AS (SELECT a2.vec_id, a2.cluster, ek.v
  FROM a2 JOIN ek ON a2.vec_id = ek.vec_id WHERE a2.rn = 1),
pr AS (SELECT x.vec_id AS vec_id, y.vec_id AS nbr_id,
  list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) /
    (sqrt(list_sum(list_transform(range(64), i -> x.v[i+1] * x.v[i+1]))) *
     sqrt(list_sum(list_transform(range(64), i -> y.v[i+1] * y.v[i+1])))) AS s
  FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id <> y.vec_id),
rk AS (SELECT vec_id, nbr_id,
  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, nbr_id) AS rank
  FROM pr),
kn AS (SELECT vec_id, nbr_id FROM rk WHERE rank <= 5),
mu AS MATERIALIZED (SELECT f.vec_id AS u, f.nbr_id AS v
  FROM kn f JOIN kn g ON f.vec_id = g.nbr_id AND f.nbr_id = g.vec_id
  WHERE f.vec_id < f.nbr_id)"""

  /** Generated unrolled peeling rounds mirroring
    * SimilarityPipeline.knnKcore round-for-round (initial degree filter
    * ps0, then KCoreRounds refinements; AS MATERIALIZED because every
    * round references its predecessor and `und` — DuckDB would
    * otherwise inline exponentially, the graph_hits lesson).
    */
  private def knnKcoreOracleSql: String = {
    val kcR = graft.operators.SimilarityPipeline.KCoreRounds
    val kcK = graft.operators.SimilarityPipeline.KCoreK
    val rounds = (1 to kcR).map { i =>
      val p = s"ps${i - 1}"
      s"""pd$i AS MATERIALIZED (SELECT und.a AS node, count(*) AS deg FROM und
  JOIN $p x ON und.a = x.node JOIN $p y ON und.b = y.node GROUP BY und.a),
ps$i AS MATERIALIZED (SELECT node FROM pd$i WHERE deg >= $kcK)"""
    }.mkString(",\n")
    s"""WITH
$mutualKnnCtes,
und AS MATERIALIZED (SELECT u AS a, v AS b FROM mu
  UNION ALL SELECT v AS a, u AS b FROM mu),
pd0 AS MATERIALIZED (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
  FROM und GROUP BY a),
ps0 AS MATERIALIZED (SELECT node FROM pd0 WHERE deg >= $kcK),
$rounds,
cd AS (SELECT und.a AS vec_id, CAST(count(*) AS BIGINT) AS core_deg
  FROM und JOIN ps$kcR x ON und.a = x.node JOIN ps$kcR y ON und.b = y.node
  GROUP BY und.a)
SELECT ek.vec_id, CAST(coalesce(pd0.deg, 0) AS BIGINT) AS deg,
  (ps$kcR.node IS NOT NULL) AS in_core,
  CAST(coalesce(cd.core_deg, 0) AS BIGINT) AS core_deg
FROM ek LEFT JOIN pd0 ON ek.vec_id = pd0.node
LEFT JOIN ps$kcR ON ek.vec_id = ps$kcR.node
LEFT JOIN cd ON ek.vec_id = cd.vec_id
ORDER BY ek.vec_id"""
  }

  /** Generated unrolled farthest-point rounds mirroring
    * SimilarityPipeline.coresetKcenter: per round the argmax of the
    * integer min-distance frame (excluding prior picks), the 1-row
    * center vector, the `least`-updated frame, and the post-pick
    * radius. All MATERIALIZED — every m_r is referenced by the pick,
    * the next round, and the radius subquery.
    */
  private def coresetKcenterOracleSql: String = {
    def dq(src: String, cv: String): String =
      s"CAST(floor(list_sum(list_transform(range(64), i -> " +
        s"($src.v[i+1] - $cv.c[i+1]) * ($src.v[i+1] - $cv.c[i+1]))) " +
        s"* 1000000 + 0.5) AS BIGINT)"
    val sb = new StringBuilder
    sb ++= "WITH e AS (SELECT vec_id, list_transform(embedding, " +
      "x -> CAST(x AS DOUBLE)) AS v FROM embeddings),\n"
    sb ++= "cv0 AS MATERIALIZED (SELECT v AS c FROM e WHERE vec_id = 0),\n"
    sb ++= s"m0 AS MATERIALIZED (SELECT e.vec_id, e.v, ${dq("e", "cv0")}" +
      " AS md FROM e, cv0),\n"
    sb ++= "p0 AS (SELECT CAST(0 AS BIGINT) AS round, CAST(0 AS BIGINT)" +
      " AS vec_id, CAST(max(md) AS BIGINT) AS radius_qq FROM m0)"
    for (r <- 1 until 8) {
      val prev = s"m${r - 1}"
      val excl = (Seq("vec_id <> 0") ++
        (1 until r).map(i => s"vec_id NOT IN (SELECT vec_id FROM k$i)"))
        .mkString(" AND ")
      sb ++= s""",
k$r AS MATERIALIZED (SELECT vec_id FROM $prev WHERE $excl
  ORDER BY md DESC, vec_id LIMIT 1),
cv$r AS MATERIALIZED (SELECT e.v AS c FROM e JOIN k$r ON e.vec_id = k$r.vec_id),
m$r AS MATERIALIZED (SELECT $prev.vec_id, $prev.v,
  least($prev.md, ${dq(prev, s"cv$r")}) AS md FROM $prev, cv$r),
p$r AS (SELECT CAST($r AS BIGINT) AS round, CAST(k$r.vec_id AS BIGINT) AS vec_id,
  (SELECT CAST(max(md) AS BIGINT) FROM m$r) AS radius_qq FROM k$r)"""
    }
    sb ++= "\nSELECT round, vec_id, radius_qq FROM (" +
      (0 until 8).map(r => s"SELECT * FROM p$r").mkString(" UNION ALL ") +
      ") ORDER BY round"
    sb.toString
  }

  /** Generated propagation rounds mirroring
    * SimilarityPipeline.qualityPropagate (same integer floor
    * arithmetic round-for-round).
    */
  private def qualityPropagateOracleSql: String = {
    val trusted = graft.operators.SimilarityPipeline.TrustedSources
      .map(s => s"'$s'").mkString(", ")
    val rounds = (1 to 3).map { r =>
      val p = s"qs${r - 1}"
      s"""qn$r AS (SELECT und.a AS vec_id, sum($p.score) AS ssum
  FROM und JOIN $p ON und.b = $p.vec_id GROUP BY und.a),
qs$r AS MATERIALIZED (SELECT bs.vec_id,
  CASE WHEN bs.deg > 0
    THEN CAST(floor((bs.seed_q6 + floor(CAST(qn$r.ssum AS DOUBLE) / bs.deg)) / 2.0) AS BIGINT)
    ELSE bs.seed_q6 END AS score
  FROM bs LEFT JOIN qn$r ON bs.vec_id = qn$r.vec_id)"""
    }.mkString(",\n")
    s"""WITH
$mutualKnnCtes,
und AS MATERIALIZED (SELECT u AS a, v AS b FROM mu
  UNION ALL SELECT v AS a, u AS b FROM mu),
dg AS MATERIALIZED (SELECT a AS vec_id, CAST(count(*) AS BIGINT) AS deg
  FROM und GROUP BY a),
bs AS MATERIALIZED (SELECT ek.vec_id,
  CASE WHEN d.source IN ($trusted) THEN CAST(1000000 AS BIGINT)
    ELSE CAST(0 AS BIGINT) END AS seed_q6,
  coalesce(dg.deg, 0) AS deg
  FROM ek JOIN documents d ON ek.vec_id = d.doc_id
  LEFT JOIN dg ON ek.vec_id = dg.vec_id),
qs0 AS MATERIALIZED (SELECT vec_id, seed_q6 AS score FROM bs),
$rounds
SELECT bs.vec_id, CAST(bs.deg AS BIGINT) AS deg, bs.seed_q6,
  qs3.score AS score_q6
FROM bs JOIN qs3 ON bs.vec_id = qs3.vec_id ORDER BY bs.vec_id"""
  }

  /** md5-register HLL sketch + estimator, shared by `hll_distinct`
    * (which joins the exact calibration columns on) and `hll_union`
    * (whose Spark side merges two shard sketches — the oracle sketches
    * the whole corpus once, which only matches because HLL merge is
    * lossless). Mirrors Sketches.hllRegistersFrom/hllEstimate
    * literal-for-literal.
    */
  private val hllEstimateCtes =
    """tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
t AS (SELECT lang, token, md5(token) AS h FROM tok WHERE length(token) > 0),
r0 AS (SELECT lang, h, ltrim(h[3:16], '0') AS sig FROM t),
r AS (SELECT lang,
  CAST((strpos('0123456789abcdef', h[1:1]) - 1) * 16 + (strpos('0123456789abcdef', h[2:2]) - 1) AS BIGINT) AS register,
  CASE WHEN length(sig) = 0 THEN 57
    ELSE (14 - length(sig)) * 4 + (CASE
      WHEN strpos('0123456789abcdef', sig[1:1]) - 1 >= 8 THEN 0
      WHEN strpos('0123456789abcdef', sig[1:1]) - 1 >= 4 THEN 1
      WHEN strpos('0123456789abcdef', sig[1:1]) - 1 >= 2 THEN 2
      ELSE 3 END) + 1 END AS rho
  FROM r0),
regs AS (SELECT lang, register, max(rho) AS rho FROM r GROUP BY lang, register),
s AS (SELECT lang, sum(CAST(1::BIGINT << (57 - rho) AS DECIMAL(38,0))) AS s_present,
  count(*) AS present FROM regs GROUP BY lang),
e AS (SELECT lang, present,
  s_present + CAST(256 - present AS DECIMAL(38,0)) * CAST(144115188075855872 AS DECIMAL(38,0)) AS s_total,
  256 - present AS v_zero FROM s),
est0 AS (SELECT lang, present, v_zero,
  0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 144115188075855872.0 / CAST(s_total AS DOUBLE) AS est_raw FROM e),
est AS (SELECT lang, present,
  CASE WHEN est_raw <= 640.0 AND v_zero > 0 THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE)) ELSE est_raw END AS est
  FROM est0)"""

  /** u in [0,1) from a hex column's first 13 nibbles — 52 bits, exact in
    * a double; the 13-term expansion of Sketches.u13's `conv`.
    */
  private def u13Sql(h: String): String = {
    val terms = (1 to 13).map { i =>
      val mult = math.pow(16, 13 - i).toLong
      s"(strpos('0123456789abcdef', $h[$i:$i]) - 1) * $mult"
    }.mkString("\n   + ")
    s"(CAST($terms AS DOUBLE) / 4503599627370496.0)"
  }

  /** Cross-document duplicated-span detection, shared by `dup_spans`
    * (which emits the merged spans) and `substring_dedup` (which removes
    * them) — mirrors SubstringDedup.spansFrom: length-8 shingles keyed by
    * md5 of space-joined tokens, cross-doc test min(doc_id)<>max(doc_id),
    * gaps-and-islands merge with break at gap > 8.
    */
  private val dupSpanCtes =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (SELECT doc_id, CAST(i AS BIGINT) AS start,
  md5(array_to_string(toks[i + 1:i + 8], ' ')) AS h
  FROM t, unnest(range(len(toks) - 8 + 1)) AS u(i) WHERE len(toks) >= 8),
d AS (SELECT h FROM sh GROUP BY h HAVING min(doc_id) <> max(doc_id)),
ds AS (SELECT doc_id, start FROM sh JOIN d USING (h)),
lg AS (SELECT doc_id, start,
  lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev FROM ds),
isl AS (SELECT doc_id, start,
  sum(CASE WHEN prev IS NULL OR start - prev > 8 THEN 1 ELSE 0 END)
    OVER (PARTITION BY doc_id ORDER BY start ROWS UNBOUNDED PRECEDING) AS island
  FROM lg),
sp AS (SELECT doc_id, min(start) AS span_start, max(start) + 8 AS span_end
  FROM isl GROUP BY doc_id, island)"""

  /** The batch curation chain replayed stage-for-stage, shared by
    * `curation_program` and `curation_funnel` — mirrors
    * CurationProgram.run: rounded-quality gate at 0.5, min-doc_id exact
    * dedup, first-30-per-source cap in doc_id order, 2000-token
    * per-language budget in (skey, doc_id) order.
    */
  private val curationCtes =
    """b AS (SELECT doc_id, source, lang, string_split(text, ' ') AS toks,
  md5(lower(trim(text))) AS text_hash FROM documents),
q AS (SELECT doc_id, source, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
  round(least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.4
    + least(1.0, CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS DOUBLE) / len(toks) * 5.0) * 0.3
    + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.3, 4) AS quality,
  text_hash FROM b),
g AS (SELECT * FROM q WHERE quality >= 0.5),
dw AS (SELECT *, min(doc_id) OVER (PARTITION BY text_hash) AS hash_winner FROM g),
d AS (SELECT doc_id, source, lang, n_tokens, quality FROM dw WHERE doc_id = hash_winner),
cw AS (SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cap_rk FROM d),
c AS (SELECT * FROM cw WHERE cap_rk <= 30),
sk AS (SELECT *, md5('tb:' || CAST(doc_id AS VARCHAR)) AS skey FROM c),
bw AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY skey, doc_id
    ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_offset FROM sk),
f AS (SELECT doc_id, source, lang, n_tokens, quality, cap_rk, start_offset
  FROM bw WHERE start_offset < 2000)"""

  /** Frozen-centroid kNN CTE chain shared by `knn_graph_delta` and
    * `knn_store`: 2 Lloyd rounds trained on the base residue
    * (vec_id % 100 <> 7, seeded by its 8 smallest ids), EVERY vector
    * assigned to the frozen round-2 centroids, cluster-blocked cosine
    * top-5 (`rk`). `asg` is MATERIALIZED — both the pairing and the
    * delta-cluster probe reference it.
    */
  private val frozenKnnCtes =
    """ek AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
ekb AS (SELECT * FROM ek WHERE vec_id % 100 <> 7),
c0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster, v AS c FROM ekb ORDER BY vec_id LIMIT 8),
d1 AS (SELECT ekb.vec_id, c0.cluster,
  list_sum(list_transform(range(64), i -> (v[i+1] - c[i+1]) * (v[i+1] - c[i+1]))) AS d2 FROM ekb, c0),
a1 AS (SELECT vec_id, cluster, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM d1),
ux AS (SELECT vec_id, unnest(v) AS x, unnest(range(64)) AS pos FROM ekb),
mm AS (SELECT a1.cluster, ux.pos, round(avg(ux.x), 4) AS mx
  FROM a1 JOIN ux ON a1.vec_id = ux.vec_id WHERE a1.rn = 1 GROUP BY a1.cluster, ux.pos),
c1 AS (SELECT cluster, list(mx ORDER BY pos) AS c FROM mm GROUP BY cluster),
d2t AS (SELECT ek.vec_id, c1.cluster,
  list_sum(list_transform(range(64), i -> (v[i+1] - c[i+1]) * (v[i+1] - c[i+1]))) AS d2 FROM ek, c1),
a2 AS (SELECT vec_id, cluster, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM d2t),
asg AS MATERIALIZED (SELECT a2.vec_id, a2.cluster, ek.v
  FROM a2 JOIN ek ON a2.vec_id = ek.vec_id WHERE a2.rn = 1),
pr AS (SELECT x.vec_id AS vec_id, y.vec_id AS nbr_id, x.cluster AS cluster,
  list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) /
    (sqrt(list_sum(list_transform(range(64), i -> x.v[i+1] * x.v[i+1]))) *
     sqrt(list_sum(list_transform(range(64), i -> y.v[i+1] * y.v[i+1])))) AS s
  FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id <> y.vec_id),
rk AS (SELECT vec_id, nbr_id, cluster, s,
  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, nbr_id) AS rank FROM pr)"""

  /** [[curationCtes]] with every CTE name prefixed (so two chains
    * coexist in one oracle) and the base filtered — the
    * `curation_diff` replay needs the program at two corpus states.
    * Longest names first so `bw`/`cw`/`dw`/`sk` rename before `b`/`c`/
    * `d`; \b-bounded so column names (doc_id, skey, quality) and quoted
    * literals ('tb:') are untouched.
    */
  private def prefixedCurationCtes(p: String, filter: String): String = {
    val base =
      if (filter.isEmpty) curationCtes
      else curationCtes.replace("FROM documents)",
        s"FROM documents WHERE $filter)")
    Seq("bw", "cw", "dw", "sk", "b", "q", "g", "d", "c", "f")
      .foldLeft(base)((acc, n) => acc.replaceAll("\\b" + n + "\\b", p + n))
  }

  /** The DuckDB replay of SimilarityPipeline.lshRecallGrid, generated
    * from the same grid: raw sign bits once, then per config a
    * big-endian band pack, the query's bucket probe, and scalar-count
    * candidate/hit rows.
    */
  private def lshRecallGridOracleSql: String = {
    val grid = Seq((2, 8), (4, 4), (8, 2))
    val perConfig = grid.map { case (b, r) =>
      s"""bv_$b AS (SELECT vec_id, CAST(h_idx // $r AS INTEGER) AS band,
  CAST(sum(bit * (1 << ($r - 1 - (h_idx % $r)))) AS BIGINT) AS val
  FROM bitsr GROUP BY 1, 2),
qb_$b AS (SELECT band, val FROM bv_$b WHERE vec_id = 0),
cand_$b AS (SELECT DISTINCT v.vec_id FROM bv_$b v
  JOIN qb_$b q2 ON v.band = q2.band AND v.val = q2.val
  WHERE v.vec_id <> 0),
row_$b AS (SELECT CAST($b AS BIGINT) AS n_bands,
  CAST($r AS BIGINT) AS bits_per_band,
  (SELECT CAST(count(*) AS BIGINT) FROM cand_$b) AS n_cand,
  (SELECT CAST(count(*) AS BIGINT) FROM cand_$b JOIN ex USING (vec_id))
    AS n_hit)"""
    }.mkString(",\n")
    val unioned = grid.map { case (b, _) => s"SELECT * FROM row_$b" }
      .mkString("\nUNION ALL\n")
    s"""WITH hyper AS (SELECT vec_id AS h_idx, embedding AS h FROM embeddings WHERE vec_id < 16),
bitsr AS MATERIALIZED (SELECT e.vec_id, h.h_idx,
  CASE WHEN list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(h.h[i+1] AS DOUBLE))) > 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e, hyper h),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
ex AS MATERIALIZED (SELECT vec_id FROM (SELECT vec_id,
    row_number() OVER (ORDER BY (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) DESC, vec_id) AS r
  FROM embeddings, q WHERE vec_id <> 0) WHERE r <= 10),
$perConfig
SELECT n_bands, bits_per_band, n_cand, n_hit,
  CAST(n_hit * 1000 AS BIGINT) AS recall_q4
FROM ($unioned) ORDER BY n_bands"""
  }

  /** The interchange-roundtrip profile over the ORIGINAL parquet — shared
    * verbatim by `jsonl_roundtrip`, `csv_roundtrip`, `orc_roundtrip`
    * (each query's Spark side reads its own exported copy; the round
    * trip must be invisible against this).
    */
  private val interchangeProfileSql =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  min(md5(CAST(doc_id AS VARCHAR) || text)) AS min_digest
FROM documents GROUP BY source ORDER BY source"""

  /** Per-language bottom-k (KMV) sketch of distinct token md5s, shared by
    * `kmv_distinct` and `kmv_intersect` — mirrors Sketches.kmvSketchFrom:
    * distinct (lang, h), ascending-hash rank, keep rk <= 64.
    */
  private val kmvSketchCtes =
    """tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
tt AS (SELECT lang, token FROM tok WHERE length(token) > 0),
t AS (SELECT DISTINCT lang, md5(token) AS h FROM tt),
kr AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rk FROM t),
sk AS (SELECT lang, h, rk FROM kr WHERE rk <= 64)"""

  private val hyperplanePairCtes =
    """hyper AS (SELECT vec_id AS h_idx, embedding AS h FROM embeddings WHERE vec_id < 16),
bits AS (SELECT e.vec_id, CAST(h_idx // 4 AS INTEGER) AS band,
    CASE WHEN list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(h.h[i+1] AS DOUBLE))) > 0 THEN 1 ELSE 0 END
      * CAST(2 ** (h_idx % 4) AS INTEGER) AS bit
  FROM embeddings e, hyper h),
bv AS (SELECT vec_id, band, sum(bit) AS val FROM bits GROUP BY vec_id, band),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bv a JOIN bv b ON a.band = b.band AND a.val = b.val AND a.vec_id < b.vec_id),
v AS (SELECT vec_a, vec_b, round((list_sum(list_transform(range(64), i -> CAST(x.embedding[i+1] AS DOUBLE) * CAST(y.embedding[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(x.embedding[i+1] AS DOUBLE) * CAST(x.embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(y.embedding[i+1] AS DOUBLE) * CAST(y.embedding[i+1] AS DOUBLE)))))), 4) AS sim
  FROM cand JOIN embeddings x ON cand.vec_a = x.vec_id JOIN embeddings y ON cand.vec_b = y.vec_id)"""

  /** Winnowing decontamination oracle — shared verbatim by `decontaminate`
    * and `decontaminate_bloom` (the bloom run is a prefilter + exact
    * confirm, so its answer is identical by construction).
    */
  private val decontaminateOracle =
    """WITH
sh AS (
  SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' ')) END AS sg
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
h AS (SELECT doc_id, list_transform(sg, x -> md5(x)) AS hs FROM sh),
m AS (SELECT doc_id, CASE WHEN len(hs) < 4 THEN [list_min(hs)]
  ELSE list_transform(range(len(hs)-3), i -> list_min(hs[i+1:i+4])) END AS mins FROM h),
fp AS (SELECT doc_id, unnest(list_distinct(mins)) AS fingerprint FROM m),
tr AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 2 = 0),
ev AS (SELECT * FROM fp WHERE doc_id % 2 = 1)
SELECT ev.doc_id AS eval_doc_id, count(DISTINCT ev.fingerprint) AS n_shared
FROM ev JOIN tr ON ev.fingerprint = tr.fingerprint
GROUP BY 1 ORDER BY eval_doc_id"""

  /** DuckDB-runnable oracle SQL for each key in [[queries]]. */
  def oracleSql: Map[String, String] = Map(
    "hc_tracer_encode" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS current_instant,
        |  '{"currentInstant":"' || strftime(ts, '%Y-%m-%dT%H:%M:%SZ') || '"}' AS tracer_json
        |FROM events ORDER BY event_id""".stripMargin,
    "hc_decode_extract" ->
      """SELECT event_id, props AS decoded,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "hc_arn_parse" ->
      """SELECT event_id,
        |  'arn:aws:kinesis:us-east-1:123456789012:stream/' || event_type AS arn,
        |  split_part(split_part('arn:aws:kinesis:us-east-1:123456789012:stream/' || event_type, ':', 6), '/', 2)
        |    AS stream_name
        |FROM events ORDER BY event_id""".stripMargin,
    "hc_latency_arrival" ->
      """WITH now_t AS (SELECT max(ts) AS now_ts FROM events)
        |SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
        |  date_diff('second', ts, now_ts) AS latency_s
        |FROM events, now_t ORDER BY event_id""".stripMargin,
    "hc_latency_event_time" ->
      """WITH now_t AS (SELECT max(ts) AS now_ts FROM events)
        |SELECT event_id,
        |  date_trunc('second', ts) AS event_ts,
        |  date_diff('second', date_trunc('second', ts), now_ts) AS latency_s
        |FROM events, now_t ORDER BY event_id""".stripMargin,
    "hc_metric_projection" ->
      """SELECT event_type AS "streamName", ts,
        |  'HealthCheckSinceSeconds' AS "metricName", value
        |FROM events ORDER BY "streamName", ts, value""".stripMargin,
    "hc_threshold_filter" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE value > 100.0 ORDER BY event_id""".stripMargin,
    "hc_first_record" ->
      """SELECT event_id, event_type, window_start, value FROM (
        |  SELECT event_id, event_type, date_trunc('minute', ts) AS window_start, value,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('minute', ts)
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY event_type, window_start""".stripMargin,
    "hc_window_max" ->
      """SELECT date_trunc('minute', ts) AS window_start, event_type,
        |  max(value) AS max_value, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "hc_gap_detect" ->
      """WITH b AS (SELECT event_type, date_trunc('minute', min(ts)) AS mn,
        |                  date_trunc('minute', max(ts)) AS mx
        |           FROM events GROUP BY event_type),
        |g AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM b),
        |p AS (SELECT DISTINCT event_type, date_trunc('minute', ts) AS minute FROM events)
        |SELECT g.event_type, g.minute FROM g
        |LEFT JOIN p ON g.event_type = p.event_type AND g.minute = p.minute
        |WHERE p.event_type IS NULL
        |ORDER BY g.event_type, g.minute""".stripMargin,
    "hc_alarm_transitions" ->
      """WITH b AS (SELECT event_type, date_trunc('minute', min(ts)) AS mn,
        |                  date_trunc('minute', max(ts)) AS mx
        |           FROM events GROUP BY event_type),
        |g AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM b),
        |m AS (SELECT event_type, date_trunc('minute', ts) AS minute, max(value) AS max_value
        |      FROM events GROUP BY 1, 2),
        |e AS (SELECT g.event_type, g.minute, m.max_value,
        |        CASE WHEN m.max_value IS NULL THEN 'ALARM'
        |             WHEN m.max_value > 150.0 THEN 'ALARM' ELSE 'OK' END AS state,
        |        CASE WHEN m.max_value IS NULL THEN 'missing_data'
        |             WHEN m.max_value > 150.0 THEN 'threshold' ELSE 'none' END AS reason
        |      FROM g LEFT JOIN m ON g.event_type = m.event_type AND g.minute = m.minute),
        |t AS (SELECT *, lag(state) OVER (PARTITION BY event_type ORDER BY minute) AS prev_state FROM e)
        |SELECT event_type, minute, state, reason, max_value FROM t
        |WHERE prev_state IS NULL OR prev_state <> state
        |ORDER BY event_type, minute""".stripMargin,
    "hc_alarm_m_of_n" ->
      """WITH b AS (SELECT event_type, date_trunc('minute', min(ts)) AS mn,
        |                  date_trunc('minute', max(ts)) AS mx
        |           FROM events GROUP BY event_type),
        |g AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM b),
        |m AS (SELECT event_type, date_trunc('minute', ts) AS minute, max(value) AS max_value
        |      FROM events GROUP BY 1, 2),
        |e AS (SELECT g.event_type, g.minute, m.max_value,
        |        CASE WHEN m.max_value IS NULL OR m.max_value > 150.0 THEN 1 ELSE 0 END AS breach,
        |        CASE WHEN m.max_value IS NULL THEN 'missing_data'
        |             WHEN m.max_value > 150.0 THEN 'threshold' ELSE 'none' END AS reason
        |      FROM g LEFT JOIN m ON g.event_type = m.event_type AND g.minute = m.minute),
        |s AS (SELECT *, CASE WHEN
        |        sum(breach) OVER (PARTITION BY event_type ORDER BY minute ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |        >= least(2, count(*) OVER (PARTITION BY event_type ORDER BY minute ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |        THEN 'ALARM' ELSE 'OK' END AS state FROM e),
        |t AS (SELECT *, lag(state) OVER (PARTITION BY event_type ORDER BY minute) AS prev_state FROM s)
        |SELECT event_type, minute, state, reason, max_value FROM t
        |WHERE prev_state IS NULL OR prev_state <> state
        |ORDER BY event_type, minute""".stripMargin,
    // the adaptive alarm replay: rolling baseline over OBSERVED minutes
    // only (the window runs over m BEFORE the grid join — the stream's
    // BaselineState advances only on observed periods), DECIMAL-exact
    // sums, the metric_anomaly z tree, warmup n < 10 never breaches on
    // value, missing data always breaches, then the 2-of-3 machine
    "hc_alarm_adaptive" ->
      """WITH b AS (SELECT event_type, date_trunc('minute', min(ts)) AS mn,
        |                  date_trunc('minute', max(ts)) AS mx
        |           FROM events GROUP BY event_type),
        |g AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM b),
        |m AS (SELECT event_type, date_trunc('minute', ts) AS minute, max(value) AS max_value
        |      FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, minute, max_value,
        |  sum(CAST(max_value AS DECIMAL(18,6))) OVER fr AS s1,
        |  sum(CAST(max_value AS DECIMAL(18,6)) * CAST(max_value AS DECIMAL(18,6))) OVER fr AS s2,
        |  count(*) OVER fr AS n FROM m
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY minute
        |    ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_type, minute, max_value,
        |  CASE WHEN n >= 10 THEN
        |    CASE WHEN sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1), 0.0)) > 0.0
        |      THEN (max_value - CAST(s1 AS DOUBLE) / n)
        |        / sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1), 0.0))
        |      ELSE 0.0 END
        |  END AS z FROM w),
        |e AS (SELECT g.event_type, g.minute, z.max_value,
        |        CASE WHEN z.max_value IS NULL THEN 1
        |             WHEN abs(z.z) > 3.0 THEN 1 ELSE 0 END AS breach,
        |        CASE WHEN z.max_value IS NULL THEN 'missing_data'
        |             WHEN abs(z.z) > 3.0 THEN 'anomaly' ELSE 'none' END AS reason
        |      FROM g LEFT JOIN z ON g.event_type = z.event_type AND g.minute = z.minute),
        |s AS (SELECT *, CASE WHEN
        |        sum(breach) OVER (PARTITION BY event_type ORDER BY minute ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |        >= least(2, count(*) OVER (PARTITION BY event_type ORDER BY minute ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |        THEN 'ALARM' ELSE 'OK' END AS state FROM e),
        |t AS (SELECT *, lag(state) OVER (PARTITION BY event_type ORDER BY minute) AS prev_state FROM s)
        |SELECT event_type, minute, state, reason, max_value FROM t
        |WHERE prev_state IS NULL OR prev_state <> state
        |ORDER BY event_type, minute""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q7_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS BIGINT) AS l_year, l_extendedprice, l_discount
  FROM lineitem, orders, customer, supplier, nation n1, nation n2
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND l_suppkey = s_suppkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND n1.n_name IN ('NATION_1','NATION_2')
    AND n2.n_name IN ('NATION_1','NATION_2')
    AND n1.n_name <> n2.n_name)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q15_top_supplier" ->
      """WITH rev AS (
  SELECT l_suppkey AS supplier_no,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS tr
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1)
SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE tr = (SELECT max(tr) FROM rev) ORDER BY s_suppkey""",
    "q17_small_qty" ->
      """WITH cut AS (
  SELECT l_partkey AS pa_partkey, SUM(l_quantity) / count(*) * 0.5 AS qty_cut
  FROM lineitem GROUP BY 1)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l, part, cut
WHERE p_partkey = l.l_partkey AND pa_partkey = l.l_partkey
  AND p_brand = 'Brand#3' AND l.l_quantity < qty_cut""",
    "q19_disjunct" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20))""",
    "q22_idle" ->
      """WITH a AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_mktsegment, count(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer, a
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "ship_delay" ->
      """SELECT o_orderpriority,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
  count(*) AS total_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q2_min_cost" ->
      """WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier, nation, region
  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    AND r_name = 'EUROPE'),
euo AS (SELECT * FROM offers JOIN eu ON l_suppkey = s_suppkey),
mc AS (SELECT l_partkey AS mc_partkey, min(cost) AS min_cost
  FROM euo GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
  floor(cost * 10000 + 0.5) / 10000 AS cost
FROM euo
JOIN part ON l_partkey = p_partkey
JOIN mc ON l_partkey = mc_partkey AND cost = min_cost
WHERE p_size <= 10 AND p_type = 'STANDARD'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""",
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CASE WHEN ns.n_name = 'NATION_1'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
    AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1 ORDER BY 1""",
    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
    - CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * 0.5
    AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2 ORDER BY 1, 2""",
    "q11_important_part" ->
      """WITH vals AS (
  SELECT l_partkey AS p_partkey,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS value_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA')
  GROUP BY 1),
tot AS (SELECT SUM(value_dec) AS tot_dec, count(*) AS nparts FROM vals)
SELECT p_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM vals, tot
WHERE CAST(value_dec AS DOUBLE) > CAST(tot_dec AS DOUBLE) / nparts * 2.0
ORDER BY part_value DESC, p_partkey""",
    "q16_supplier_count" ->
      """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
  count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 4 = 0)
GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size""",
    "q20_excess" ->
      """SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey HAVING sum(l_quantity) > 300.0)
ORDER BY s_name""",
    "q21_waiting" ->
      """WITH pos AS (
  SELECT l_orderkey, l_suppkey,
    max(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2),
po AS (
  SELECT l_orderkey, count(*) AS ns, sum(is_late) AS nl
  FROM pos GROUP BY 1)
SELECT s_name, count(*) AS numwait
FROM pos JOIN po USING (l_orderkey) JOIN supplier ON l_suppkey = s_suppkey
WHERE pos.is_late = 1 AND po.ns >= 2 AND po.nl = 1
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",
    "stratified_sample" ->
      """WITH b AS (SELECT doc_id, lang,
  CAST(list_sum(list_transform(range(4), d ->
    CAST(strpos('0123456789abcdef', md5('strat:' || CAST(doc_id AS VARCHAR))[d+1:d+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-d))))) % 100 AS BIGINT) AS bucket
  FROM documents)
SELECT doc_id, lang, bucket FROM b
WHERE bucket < (CASE WHEN lang = 'en' THEN 5 ELSE 20 END)
ORDER BY doc_id""",
    "pack_chunks" ->
      """WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens FROM documents),
c AS (SELECT doc_id, lang, n_tokens,
  CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 512.0) AS BIGINT) AS chunk_id
  FROM t)
SELECT lang, chunk_id, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
  min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    // per-document packing manifest: chunk id, in-chunk offset, and the
    // boundary-straddle flag the packed-dataset writer consumes
    "pack_manifest" ->
      """WITH t AS (SELECT doc_id, lang,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
c AS (SELECT doc_id, lang, n_tokens,
  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start
  FROM t)
SELECT lang, doc_id, n_tokens,
  CAST(floor(start / 512.0) AS BIGINT) AS chunk_id,
  CAST(start % 512 AS BIGINT) AS chunk_offset,
  (floor(start / 512.0) <> floor((start + n_tokens - 1) / 512.0)) AS spans_boundary
FROM c ORDER BY lang, doc_id""",
    // pack_chunks denominated in frozen-tokenizer tokens — same replay
    // chain as token_budget_bpe, same packer as pack_chunks
    "pack_chunks_bpe" ->
      s"""WITH
$bpeReplayCtes,
tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents),
t AS (SELECT t.doc_id, t.lang, CAST(sum(e.n_sym) AS BIGINT) AS n_tokens
  FROM tok t JOIN nsym e USING (word) WHERE length(t.word) > 0
  GROUP BY t.doc_id, t.lang),
c AS (SELECT doc_id, lang, n_tokens,
  CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 512.0) AS BIGINT) AS chunk_id
  FROM t)
SELECT lang, chunk_id, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
  min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM region, nation, customer, supplier, orders, lineitem
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND c_nationkey = n_nationkey AND s_nationkey = n_nationkey
        |  AND o_custkey = c_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "text_stats" ->
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, len(text) AS n_chars,
  len(toks) AS n_tokens,
  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tokens_bpe,
  len(list_distinct(toks)) AS n_distinct,
  round(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks), 4) AS avg_token_len,
  round(CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio
FROM w ORDER BY doc_id""",
    "text_quality" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
  least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.4
  + least(1.0, CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS DOUBLE) / len(toks) * 5.0) * 0.3
  + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.3 AS q
FROM w)
SELECT doc_id, round(q, 4) AS quality, q >= 0.5 AS is_quality FROM s ORDER BY doc_id""",
    "text_lang_id" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
  len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht'))) AS s_de,
  len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS s_en,
  len(list_filter(toks, t -> t IN ('el','la','los','de','y','es'))) AS s_es,
  len(list_filter(toks, t -> t IN ('le','les','des','et','est','ne'))) AS s_fr,
  len(list_filter(toks, t -> t IN ('de5','le5','shi4','bu4','wo3','ni3'))) AS s_zh
FROM w)
SELECT doc_id,
  CASE WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
       WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
       WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
       WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
       ELSE 'zh' END AS lang_pred,
  CAST(greatest(s_de,s_en,s_es,s_fr,s_zh) AS BIGINT) AS best_score
FROM s ORDER BY doc_id""",
    "text_fingerprint" ->
      """WITH 
sh AS (
  SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' ')) END AS sg
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
ss AS (SELECT doc_id, list_distinct(sg) AS s FROM sh)
,
h AS (SELECT doc_id, list_transform(sg, x -> md5(x)) AS hs FROM sh),
m AS (SELECT doc_id, CASE WHEN len(hs) < 4 THEN [list_min(hs)]
  ELSE list_transform(range(len(hs)-3), i -> list_min(hs[i+1:i+4])) END AS mins FROM h)
SELECT doc_id, unnest(list_distinct(mins)) AS fingerprint FROM m
ORDER BY doc_id, fingerprint""",
    "text_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
SELECT doc_id, tf.token AS token, tf,
  round(CAST(tf AS DOUBLE) * ln(CAST(n + 1 AS DOUBLE) / (df + 1)), 4) AS tfidf
FROM tf JOIN df ON tf.token = df.token, n
ORDER BY tfidf DESC, doc_id, token LIMIT 50""",
    "decontaminate" -> decontaminateOracle,
    // Same oracle by construction: the bloom prefilter is exact-join
    // confirmed, so false positives cannot change the answer.
    "decontaminate_bloom" -> decontaminateOracle,
    "stats_quantiles" ->
      """SELECT event_type,
  round(quantile_cont(value, 0.25), 4) AS p25,
  round(quantile_cont(value, 0.50), 4) AS p50,
  round(quantile_cont(value, 0.75), 4) AS p75,
  round(quantile_cont(value, 0.95), 4) AS p95,
  count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type""",
    "salted_counts" ->
      """SELECT event_type, count(*) AS n_events,
  min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type ORDER BY event_type""",
    // plan choice (salted vs plain) never changes the answer: the
    // oracle is the plain GROUP BY for both physical paths
    "salted_auto" ->
      """SELECT event_type, count(*) AS n_events,
  min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type ORDER BY event_type""",
    "seq_len_buckets" ->
      """WITH t AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
b AS (SELECT CASE WHEN n <= 16 THEN 'a_le16' WHEN n <= 32 THEN 'b_le32'
  WHEN n <= 64 THEN 'c_le64' WHEN n <= 128 THEN 'd_le128'
  ELSE 'e_gt128' END AS bucket, n FROM t)
SELECT bucket, count(*) AS n_docs,
  CAST(sum(n) AS BIGINT) AS total_tokens,
  CAST(max(n) AS BIGINT) AS max_tokens
FROM b GROUP BY bucket ORDER BY bucket""",
    "emb_normalize" ->
      """WITH n AS (SELECT vec_id,
  sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) AS norm,
  embedding FROM embeddings)
SELECT vec_id, unnest(range(64)) AS pos, round(norm, 4) AS norm,
  unnest(list_transform(range(64), i -> round(CAST(embedding[i+1] AS DOUBLE) / norm, 4) + 0.0)) AS unit_val
FROM n ORDER BY vec_id, pos""",
    "dedup_report" ->
      """WITH c AS (SELECT md5(lower(trim(text))) AS h, count(*) AS c FROM documents GROUP BY 1)
SELECT CAST(sum(c) AS BIGINT) AS n_docs, count(*) AS n_unique,
  CAST(max(c) AS BIGINT) AS max_cluster,
  round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT), 4) AS dup_ratio
FROM c""",
    // bucket models are exact longs; the md5 bucketing replays the
    // Sketches register idiom; per-doc fold is feature-position-ordered
    "dsir_weights" ->
      """WITH sh AS (SELECT doc_id, lang,
  CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(len(toks)-1), i -> array_to_string(toks[i+1:i+2], ' ')) END AS sg
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)),
f0 AS (SELECT doc_id, lang, unnest(sg) AS bigram,
  unnest(range(len(sg))) AS pos FROM sh),
fb AS (SELECT doc_id, lang, pos,
  CAST((strpos('0123456789abcdef', md5(bigram)[1:1]) - 1) * 256
     + (strpos('0123456789abcdef', md5(bigram)[2:2]) - 1) * 16
     + (strpos('0123456789abcdef', md5(bigram)[3:3]) - 1) AS BIGINT) AS bucket
  FROM f0 WHERE len(string_split(bigram, ' ')) = 2),
counts AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr,
  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
  FROM fb GROUP BY bucket),
tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt
  FROM counts),
lr AS (SELECT bucket, ln((ct + 1) / (nt + 4096)) - ln((cr + 1) / (nr + 4096)) AS lr
  FROM counts, tot),
d AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_feats,
  list(lr ORDER BY pos) AS ls
  FROM fb JOIN lr USING (bucket) GROUP BY doc_id, lang)
SELECT doc_id, lang, n_feats, round(list_sum(ls), 6) AS log_weight
FROM d ORDER BY doc_id""",
    // hashed bag-of-words classifier: same md5-nibble bucket arithmetic
    // as dsir_weights, labels from the split-bucket nibble sum, per-doc
    // score folded in feature-position order
    "quality_classifier" ->
      s"""WITH $clfReplayCtes
SELECT doc_id, CAST(label AS BIGINT) AS label, n_feats,
  round(list_sum(ws), 6) AS score,
  round(list_sum(ws), 6) > 0.0 AS predicted
FROM d ORDER BY doc_id""",
    // reliability deciles over the SAME classifier replay: per language,
    // ntile(10) on the q6-scaled score (total order (score_q6, doc_id)),
    // exact integer bin sums — an all-BIGINT/VARCHAR surface
    "calib_bins" ->
      s"""WITH $clfReplayCtes,
sc AS (SELECT doc_id, label,
  CAST(floor(round(list_sum(ws), 6) * 1000000 + 0.5) AS BIGINT) AS score_q6
  FROM d),
sl AS (SELECT sc.doc_id, sc.label, sc.score_q6, doc.lang
  FROM sc JOIN documents doc ON doc.doc_id = sc.doc_id),
bn AS (SELECT lang, label, score_q6,
  ntile(10) OVER (PARTITION BY lang ORDER BY score_q6, doc_id) AS bin
  FROM sl)
SELECT lang, CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(label) AS BIGINT) AS n_pos,
  CAST(sum(score_q6) AS BIGINT) AS sum_score_q6
FROM bn GROUP BY lang, bin ORDER BY lang, bin""",
    // the three signal rankings re-derived on the shared replays, fused
    // with integer-division RRF (1000000 // (60+r)) — all-integer surface
    "quality_fusion" ->
      s"""WITH $clfReplayCtes,
qfw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
qfs AS (SELECT doc_id,
  least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.4
  + least(1.0, CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS DOUBLE) / len(toks) * 5.0) * 0.3
  + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.3 AS q
FROM qfw),
qfh AS (SELECT doc_id, CAST(floor(round(q, 4) * 10000 + 0.5) AS BIGINT) AS q_heur FROM qfs),
qfc AS (SELECT doc_id,
  CAST(floor(round(list_sum(ws), 6) * 1000000 + 0.5) AS BIGINT) AS q_clf FROM d),
qft AS (SELECT doc_id, lang, token FROM (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE len(token) > 0),
qfg AS (SELECT token, CAST(count(*) AS BIGINT) AS gfreq FROM qft GROUP BY token),
qftot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM qft),
qfn AS (SELECT t.doc_id, t.lang, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(-CAST(floor(ln(CAST(g.gfreq AS DOUBLE) / n_total) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS nll_g
  FROM qft t JOIN qfg g USING (token), qftot GROUP BY t.doc_id, t.lang),
qsig AS (SELECT n.doc_id, n.lang, n.n_tokens, n.nll_g, h.q_heur, c.q_clf
  FROM qfn n JOIN qfh h USING (doc_id) JOIN qfc c USING (doc_id)),
qrank AS (SELECT lang, doc_id,
  CAST(row_number() OVER (PARTITION BY lang ORDER BY q_heur DESC, doc_id) AS BIGINT) AS r_heur,
  CAST(row_number() OVER (PARTITION BY lang ORDER BY q_clf DESC, doc_id) AS BIGINT) AS r_clf,
  CAST(row_number() OVER (PARTITION BY lang
    ORDER BY CAST(nll_g AS DOUBLE) / CAST(n_tokens AS DOUBLE) ASC, doc_id) AS BIGINT) AS r_nll
  FROM qsig),
qrrf AS (SELECT lang, doc_id, r_heur, r_clf, r_nll,
  CAST((1000000 // (60 + r_heur)) + (1000000 // (60 + r_clf))
    + (1000000 // (60 + r_nll)) AS BIGINT) AS rrf_micro
  FROM qrank),
qtop AS (SELECT lang, doc_id, r_heur, r_clf, r_nll, rrf_micro,
  CAST(row_number() OVER (PARTITION BY lang ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rnk
  FROM qrrf)
SELECT lang, rnk, doc_id, r_heur, r_clf, r_nll, rrf_micro
FROM qtop WHERE rnk <= 10 ORDER BY lang, rnk""",
    // rank-sum AUC with exact integer tie handling (2·r̄ = 2·rank + m − 1)
    "classifier_auc" ->
      s"""WITH $clfReplayCtes,
sr AS (SELECT d.doc_id, d.label,
  CAST(floor(round(list_sum(ws), 6) * 1000000 + 0.5) AS BIGINT) AS score_q6
  FROM d),
sl AS (SELECT sr.label, documents.lang, sr.score_q6
  FROM sr JOIN documents USING (doc_id)),
rk AS (SELECT lang, label,
  CAST(rank() OVER (PARTITION BY lang ORDER BY score_q6) AS BIGINT) * 2
    + CAST(count(*) OVER (PARTITION BY lang, score_q6) AS BIGINT) - 1 AS r2
  FROM sl),
ag AS (SELECT lang, CAST(sum(label) AS BIGINT) AS n_pos,
  CAST(sum(1 - label) AS BIGINT) AS n_neg,
  CAST(sum(CASE WHEN label = 1 THEN r2 ELSE 0 END) AS BIGINT) AS r2_pos
  FROM rk GROUP BY lang HAVING sum(label) > 0 AND sum(1 - label) > 0)
SELECT lang, n_pos, n_neg,
  CAST(floor(CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
    / CAST(2 * n_pos * n_neg AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS auc_q6
FROM ag ORDER BY lang""",
    // confidently-contradicted labels ranked by |micro-score| per lang
    "label_noise" ->
      s"""WITH $clfReplayCtes,
nr AS (SELECT d.doc_id, d.label,
  CAST(floor(round(list_sum(ws), 6) * 1000000 + 0.5) AS BIGINT) AS score_q6,
  round(list_sum(ws), 6) > 0.0 AS predicted
  FROM d),
nd AS (SELECT nr.doc_id, nr.label, nr.score_q6, documents.lang
  FROM nr JOIN documents USING (doc_id)
  WHERE predicted <> (label = 1)),
nk AS (SELECT lang, doc_id, label, score_q6,
  CAST(row_number() OVER (PARTITION BY lang ORDER BY abs(score_q6) DESC, doc_id) AS BIGINT) AS rnk
  FROM nd)
SELECT lang, rnk, doc_id, label, score_q6 FROM nk WHERE rnk <= 20
ORDER BY lang, rnk""",
    // 32 Poisson(1)-weighted resamples from hash-uniform draws; integer
    // weighted sums per resample, one division, rank-2/31 interval
    "bootstrap_ci" ->
      """WITH bb AS (SELECT unnest(range(32)) AS b),
h AS (SELECT d.n_chars, bb.b,
  CAST(list_sum(list_transform(range(8), dd ->
    CAST(strpos('0123456789abcdef',
      md5('boot:' || CAST(bb.b AS VARCHAR) || ':'
        || CAST(d.doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(7-dd))))) AS BIGINT) AS h32
  FROM documents d, bb),
p AS (SELECT b, n_chars,
  CASE WHEN u < 0.36787944117144233 THEN 0
       WHEN u < 0.7357588823428847 THEN 1
       WHEN u < 0.9196986029286058 THEN 2
       WHEN u < 0.9810118431238462 THEN 3
       WHEN u < 0.9963401531726563 THEN 4
       WHEN u < 0.9994058151824183 THEN 5
       WHEN u < 0.9999167588507119 THEN 6
       WHEN u < 0.9999897508033253 THEN 7
       ELSE 8 END AS w
  FROM (SELECT b, n_chars, CAST(h32 AS DOUBLE) / 4294967296.0 AS u FROM h)),
m AS (SELECT b, CAST(sum(w * n_chars) AS BIGINT) AS sx,
  CAST(sum(w) AS BIGINT) AS sw FROM p GROUP BY b),
mb AS (SELECT b, CAST(sx AS DOUBLE) / CAST(sw AS DOUBLE) AS mean_b FROM m
  WHERE sw <> 0),
r AS (SELECT mean_b, row_number() OVER (ORDER BY mean_b, b) AS rk FROM mb),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sx FROM documents)
SELECT n_docs,
  floor(CAST(sx AS DOUBLE) / n_docs * 10000 + 0.5) / 10000 AS est,
  floor((SELECT mean_b FROM r WHERE rk = 2) * 10000 + 0.5) / 10000 AS ci_lo,
  floor((SELECT mean_b FROM r WHERE rk = 31) * 10000 + 0.5) / 10000 AS ci_hi
FROM tot""",
    // confusion counts between the heuristic and classifier gates, kappa
    // from the integer moments as one shared IEEE expression
    "gate_kappa" ->
      s"""WITH $clfReplayCtes,
gw AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
gh AS (SELECT doc_id, lang,
  (least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.4
  + least(1.0, CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS DOUBLE) / len(toks) * 5.0) * 0.3
  + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.3) >= 0.5 AS h_pass
  FROM gw),
gc AS (SELECT doc_id, round(list_sum(ws), 6) > 0.0 AS c_pass FROM d),
gj AS (SELECT gh.lang, gh.h_pass, gc.c_pass FROM gc JOIN gh USING (doc_id)),
ga AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN h_pass AND c_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
  CAST(sum(CASE WHEN h_pass AND NOT c_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_heur_only,
  CAST(sum(CASE WHEN NOT h_pass AND c_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_clf_only,
  CAST(sum(CASE WHEN NOT h_pass AND NOT c_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
  FROM gj GROUP BY lang),
gk AS (SELECT lang, n, n_both, n_heur_only, n_clf_only, n_neither,
  n * (n_both + n_neither) AS po_num,
  (n_both + n_heur_only) * (n_both + n_clf_only)
    + (n_clf_only + n_neither) * (n_heur_only + n_neither) AS pe_num
  FROM ga)
SELECT lang, n, n_both, n_heur_only, n_clf_only, n_neither,
  CASE WHEN n * n - pe_num = 0 THEN CAST(1000000 AS BIGINT)
    ELSE CAST(floor(CAST(po_num - pe_num AS DOUBLE)
      / CAST(n * n - pe_num AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
  END AS kappa_q6
FROM gk ORDER BY lang""",
    // exact-integer Pearson moments (HUGEINT sums = Spark's DECIMAL(38,0))
    // with the final corr as ONE shared IEEE expression, emitted in ppm
    "signal_corr" -> {
      def corrSel(x: String, y: String): String =
        s"""SELECT '$x' AS sig_x, '$y' AS sig_y, CAST(n AS BIGINT) AS n,
  CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
    THEN CAST(0 AS BIGINT)
  ELSE CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
    * 1000000 + 0.5) AS BIGINT) END AS corr_ppm
FROM (SELECT count(*) AS n, sum($x) AS sx, sum($y) AS sy,
  sum($x * $y) AS sxy, sum($x * $x) AS sxx, sum($y * $y) AS syy FROM j)"""
      s"""WITH $clfReplayCtes,
hw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
hs AS (SELECT doc_id,
  least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.4
  + least(1.0, CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS DOUBLE) / len(toks) * 5.0) * 0.3
  + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.3 AS q
FROM hw),
hq AS (SELECT doc_id, CAST(floor(round(q, 4) * 10000 + 0.5) AS BIGINT) AS q_heur
  FROM hs),
cq AS (SELECT doc_id,
  CAST(floor(round(list_sum(ws), 6) * 1000000 + 0.5) AS BIGINT) AS q_clf
  FROM d),
nt AS (SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT) AS n_tok
  FROM documents),
j AS MATERIALIZED (SELECT hq.doc_id, q_heur, q_clf, n_tok
  FROM hq JOIN cq USING (doc_id) JOIN nt USING (doc_id))
${corrSel("q_clf", "n_tok")}
UNION ALL ${corrSel("q_clf", "q_heur")}
UNION ALL ${corrSel("q_heur", "n_tok")}
ORDER BY sig_x, sig_y"""
    },
    // entropy folds per-type counts in TOKEN order (the lm_perplexity
    // ordered-fold discipline) so float accumulation cannot drift
    "text_entropy" ->
      """WITH tc AS (SELECT doc_id, token, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY doc_id, token),
d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS n_types, list(c ORDER BY token) AS cl
  FROM tc GROUP BY doc_id),
e AS (SELECT doc_id, n_tokens, n_types,
  list_sum(list_transform(cl, c ->
    -(c / CAST(n_tokens AS DOUBLE)) * ln(c / CAST(n_tokens AS DOUBLE)))) AS entropy
  FROM d)
SELECT doc_id, n_tokens, n_types,
  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
  round(entropy, 6) AS entropy,
  round(CASE WHEN n_types > 1
    THEN entropy / ln(CAST(n_types AS DOUBLE)) ELSE 0.0 END, 6) AS norm_entropy
FROM e ORDER BY doc_id""",
    // PMI on identical count ratios: every division is BIGINT->DOUBLE on
    // both engines, ordering is on the ROUNDED pmi + bigram tie-break
    "collocations" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
uni AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
nt AS (SELECT CAST(sum(c) AS DOUBLE) AS n_tok FROM uni),
sh AS (
  SELECT CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(len(toks)-1), i -> array_to_string(toks[i+1:i+2], ' ')) END AS sg
  FROM (SELECT string_split(text, ' ') AS toks FROM documents)),
bi AS (SELECT bigram, count(*) AS cxy
  FROM (SELECT unnest(sg) AS bigram FROM sh)
  WHERE len(string_split(bigram, ' ')) = 2 GROUP BY bigram),
nb AS (SELECT CAST(sum(cxy) AS DOUBLE) AS n_bi FROM bi)
SELECT bigram, cxy AS n_pair, ux.c AS n_left, uy.c AS n_right,
  round(ln((cxy / (SELECT n_bi FROM nb)) /
    ((ux.c / (SELECT n_tok FROM nt)) * (uy.c / (SELECT n_tok FROM nt)))), 6) AS pmi
FROM bi
JOIN uni ux ON string_split(bigram, ' ')[1] = ux.token
JOIN uni uy ON string_split(bigram, ' ')[2] = uy.token
WHERE cxy >= 25
ORDER BY pmi DESC, bigram LIMIT 20""",
    "ngram_counts" ->
      """WITH sh AS (
  SELECT doc_id, CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(len(toks)-1), i -> array_to_string(toks[i+1:i+2], ' ')) END AS sg
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
b AS (SELECT doc_id, unnest(sg) AS bigram FROM sh)
SELECT bigram, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
FROM b WHERE len(string_split(bigram, ' ')) = 2
GROUP BY bigram ORDER BY n_total DESC, bigram LIMIT 20""",
    "media_dedup" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keep_media_id,
  count(*) AS n_copies,
  count(DISTINCT ['image','audio','video'][(doc_id % 3) + 1]) AS n_kinds
FROM documents GROUP BY 1 ORDER BY keep_media_id""",
    // WebDataset shard plan: per-modality byte-budget packing, START-offset
    // admission (payload = 5-byte header + utf8 text body; octet_length of
    // the encoded text, NOT character length — they differ on non-ASCII)
    "media_shards" ->
      """WITH m AS (SELECT doc_id AS media_id,
  ['image','audio','video'][(doc_id % 3) + 1] AS kind,
  CAST(5 + octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
c AS (SELECT media_id, kind, n_bytes,
  CAST(floor((sum(n_bytes) OVER (PARTITION BY kind ORDER BY media_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes) / 4096.0) AS BIGINT) AS shard_id
  FROM m)
SELECT kind, shard_id, count(*) AS n_items,
  CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
  min(media_id) AS first_id, max(media_id) AS last_id
FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    "mixture_sample" ->
      """WITH w AS (SELECT source AS w_source,
  CAST(5 + (CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 4) * 15 AS BIGINT) AS accept_pct
  FROM (SELECT DISTINCT source FROM documents)),
b AS (SELECT doc_id, source,
  CAST(list_sum(list_transform(range(4), d ->
    CAST(strpos('0123456789abcdef', md5('mix:' || CAST(doc_id AS VARCHAR))[d+1:d+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-d))))) % 100 AS BIGINT) AS bucket
  FROM documents)
SELECT doc_id, source, accept_pct, bucket
FROM b JOIN w ON source = w_source
WHERE bucket < accept_pct ORDER BY doc_id""",
    "corpus_shuffle" ->
      """WITH k AS (SELECT doc_id,
  md5('shuf:' || CAST(doc_id AS VARCHAR)) AS shuffle_key FROM documents),
s AS (SELECT doc_id, shuffle_key,
  CAST(list_sum(list_transform(range(4), d ->
    CAST(strpos('0123456789abcdef', shuffle_key[29+d:29+d]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-d))))) % 8 AS BIGINT) AS shard_id
  FROM k)
SELECT shard_id,
  row_number() OVER (PARTITION BY shard_id ORDER BY shuffle_key) AS pos,
  doc_id
FROM s ORDER BY shard_id, pos""",
    "split_train" ->
      """WITH b AS (SELECT doc_id,
  CAST(list_sum(list_transform(range(4), d ->
    CAST(strpos('0123456789abcdef', md5('split:' || CAST(doc_id AS VARCHAR))[d+1:d+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-d))))) % 100 AS BIGINT) AS bucket
  FROM documents)
SELECT doc_id, bucket,
  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
    ELSE 'test' END AS split
FROM b ORDER BY doc_id""",
    // group split: the bucket hashes the SOURCE, so a domain never
    // straddles train/test
    "split_by_source" ->
      """WITH b AS (SELECT doc_id, source,
  CAST(list_sum(list_transform(range(4), d ->
    CAST(strpos('0123456789abcdef', md5('gsplit:' || source)[d+1:d+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-d))))) % 100 AS BIGINT) AS bucket
  FROM documents)
SELECT doc_id, source, bucket,
  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
    ELSE 'test' END AS split
FROM b ORDER BY doc_id""",
    // near-dup-safe split: CC labels over the MinHash pair graph (the
    // dedup_clusters CTEs), singletons label themselves, bucket hashes
    // the cluster id
    "split_leakage_safe" ->
      s"""WITH RECURSIVE
$shingleSetCtes,
$minhashPairCtes,
pairs AS (SELECT doc_a, doc_b FROM v WHERE jaccard >= 0.8),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src),
lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
full_lab AS (SELECT d.doc_id, coalesce(lab.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
b AS (SELECT doc_id, cluster_id,
  CAST(list_sum(list_transform(range(4), d ->
    CAST(strpos('0123456789abcdef', md5('csplit:' || CAST(cluster_id AS VARCHAR))[d+1:d+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-d))))) % 100 AS BIGINT) AS bucket
  FROM full_lab)
SELECT doc_id, cluster_id, bucket,
  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
    ELSE 'test' END AS split
FROM b ORDER BY doc_id""",
    "corpus_sample" ->
      """WITH b AS (SELECT doc_id, lang,
  CAST(list_sum(list_transform(range(4), d ->
    CAST(strpos('0123456789abcdef', md5('sample:' || CAST(doc_id AS VARCHAR))[d+1:d+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-d))))) % 100 AS BIGINT) AS bucket
  FROM documents)
SELECT doc_id, lang, bucket FROM b WHERE bucket < 10 ORDER BY doc_id""",
    "sim_topk_batch" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
s AS (SELECT q_id, vec_id, (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) AS c
  FROM embeddings, q WHERE vec_id >= 8),
t AS (SELECT q_id, vec_id, c, row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rank FROM s)
SELECT q_id, rank, vec_id, round(c, 4) AS sim FROM t WHERE rank <= 3 ORDER BY q_id, rank""",
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, md5(lower(trim(text))) AS text_hash, count(*) AS n_copies
FROM documents GROUP BY 2 ORDER BY doc_id""",
    "minhash_tune" -> TextPipeline.minhashTuneOracleSql(shingleSetCtes),
    "dedup_edit" ->
      s"""WITH
$shingleSetCtes,
sig AS (SELECT doc_id, s, list_transform(range(16), k -> list_min(list_transform(s, x -> md5(k || ':' || x)))) AS mh FROM ss),
bands AS (SELECT doc_id, b.band, md5(mh[b.band*4+1] || '|' || mh[b.band*4+2] || '|' || mh[b.band*4+3] || '|' || mh[b.band*4+4]) AS digest
  FROM sig, (SELECT unnest(range(4)) AS band) b),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id),
v AS (SELECT doc_a, doc_b,
    CAST(levenshtein(x.text, y.text) AS BIGINT) AS lev,
    round(1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE) /
      greatest(length(x.text), length(y.text)), 4) AS edit_sim
  FROM cand JOIN documents x ON cand.doc_a = x.doc_id
  JOIN documents y ON cand.doc_b = y.doc_id)
SELECT doc_a, doc_b, lev, edit_sim FROM v WHERE edit_sim >= 0.8
ORDER BY doc_a, doc_b""",
    "ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents),
g AS (SELECT DISTINCT doc_id,
    md5(array_to_string(toks[i + 1:i + 8], ' ')) AS h
  FROM t, unnest(range(len(toks) - 8 + 1)) AS u(i) WHERE len(toks) >= 8),
f AS (SELECT h, min(doc_id) AS first_doc FROM g GROUP BY h),
a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_grams,
    CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
      AS n_novel
  FROM g JOIN f USING (h) GROUP BY doc_id)
SELECT doc_id, n_distinct_grams, n_novel,
  round(CAST(n_novel AS DOUBLE) / n_distinct_grams, 4) AS novelty_frac
FROM a ORDER BY doc_id""",
    "text_hash_embed" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
hb AS (SELECT doc_id,
  CAST(list_sum(list_transform(range(4), dd ->
    CAST(strpos('0123456789abcdef', md5(token)[dd+1:dd+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-dd))))) % 64 AS BIGINT) AS pos,
  CASE WHEN strpos('01234567', md5(token)[5:5]) > 0 THEN 1 ELSE -1 END AS sgn
  FROM t WHERE len(token) > 0),
agg AS (SELECT doc_id, pos, CAST(sum(sgn) AS BIGINT) AS v
  FROM hb GROUP BY doc_id, pos),
nz AS (SELECT * FROM agg WHERE v <> 0),
nm AS (SELECT *, sqrt(CAST(sum(v * v) OVER (PARTITION BY doc_id) AS DOUBLE))
    AS norm FROM nz)
SELECT doc_id, pos, round(CAST(v AS DOUBLE) / norm, 4) + 0.0 AS val
FROM nm ORDER BY doc_id, pos""",
    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_md5 FROM documents),
nv AS (SELECT doc_id, CASE WHEN doc_id % 10 = 1 THEN upper(text)
    ELSE text END AS text FROM documents WHERE doc_id % 10 <> 0
  UNION ALL SELECT doc_id + 1000000, text FROM documents
  WHERE doc_id % 10 = 2),
n AS (SELECT doc_id, md5(text) AS new_md5 FROM nv),
j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_md5, new_md5,
    CASE WHEN old_md5 IS NULL THEN 'added'
      WHEN new_md5 IS NULL THEN 'removed'
      WHEN old_md5 <> new_md5 THEN 'changed'
      ELSE 'unchanged' END AS status
  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT doc_id, status, old_md5, new_md5 FROM j
WHERE status <> 'unchanged' ORDER BY doc_id""",
    "dedup_minhash" ->
      s"""WITH
$shingleSetCtes,
$minhashPairCtes
SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""",
    "dedup_clusters" ->
      s"""WITH RECURSIVE
$shingleSetCtes,
$minhashPairCtes,
pairs AS (SELECT doc_a, doc_b FROM v WHERE jaccard >= 0.8),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src),
lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT doc_id, cluster_id,
  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM lab ORDER BY doc_id""",
    // the dedup_clusters closure + quality-ranked retention per cluster
    "canonical_select" ->
      s"""WITH RECURSIVE
$shingleSetCtes,
$minhashPairCtes,
pairs AS (SELECT doc_a, doc_b FROM v WHERE jaccard >= 0.8),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src),
lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
cw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
cq AS (SELECT doc_id,
  least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.4
  + least(1.0, CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS DOUBLE) / len(toks) * 5.0) * 0.3
  + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.3 AS q
FROM cw),
cqq AS (SELECT doc_id, CAST(floor(round(q, 4) * 10000 + 0.5) AS BIGINT) AS quality_q4 FROM cq),
cl AS (SELECT lab.doc_id, cluster_id,
  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
  quality_q4
  FROM lab JOIN cqq USING (doc_id)),
cr AS (SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY quality_q4 DESC, doc_id) AS rn FROM cl)
SELECT cluster_id, doc_id, cluster_size, quality_q4, rn = 1 AS kept
FROM cr ORDER BY cluster_id, doc_id""",
    // the dedup_jaccard blocking with both containment directions
    "dedup_containment" ->
      s"""WITH
$shingleSetCtes,
k AS (SELECT doc_id, list_min(list_transform(s, x -> md5('99:' || x))) AS block FROM ss),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM k a JOIN k b ON a.block = b.block AND a.doc_id < b.doc_id),
v AS (SELECT doc_a, doc_b,
    CAST(len(list_intersect(x.s, y.s)) AS BIGINT) AS n_common,
    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(x.s), 4) AS cont_ab,
    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(y.s), 4) AS cont_ba
  FROM cand JOIN ss x ON cand.doc_a = x.doc_id JOIN ss y ON cand.doc_b = y.doc_id)
SELECT doc_a, doc_b, n_common, cont_ab, cont_ba,
  CASE WHEN cont_ab >= cont_ba THEN 'a_in_b' ELSE 'b_in_a' END AS direction
FROM v WHERE greatest(cont_ab, cont_ba) >= 0.8 ORDER BY doc_a, doc_b""",
    "dedup_jaccard" ->
      s"""WITH
$shingleSetCtes,
k AS (SELECT doc_id, list_min(list_transform(s, x -> md5('99:' || x))) AS block FROM ss),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM k a JOIN k b ON a.block = b.block AND a.doc_id < b.doc_id),
v AS (SELECT doc_a, doc_b,
    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
  FROM cand JOIN ss x ON cand.doc_a = x.doc_id JOIN ss y ON cand.doc_b = y.doc_id)
SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""",
    "dedup_simhash" ->
      """WITH 
th AS (SELECT doc_id, list_transform(string_split(text, ' '), t ->
    list_sum(list_transform(range(8), d -> CAST(strpos('0123456789abcdef', md5(t)[d+1:d+1]) - 1 AS BIGINT) * (1::BIGINT << (4*(7-d)))))) AS hs
  FROM documents),
sh AS (SELECT doc_id,
  list_sum(list_transform(range(32), b -> CASE WHEN
    list_sum(list_transform(hs, h -> CAST((h >> b) & 1 AS INTEGER) * 2 - 1)) > 0
    THEN (1::BIGINT << b) ELSE 0 END)) AS sim
  FROM th)
,
bands AS (SELECT doc_id, sim, b.band, (sim >> (b.band*8)) & 255 AS val
  FROM sh, (SELECT unnest(range(4)) AS band) b),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 3 ORDER BY doc_a, doc_b""",
    "q14_promo" ->
      """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0 /
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""",
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "except_users" ->
      """SELECT DISTINCT user_id, CAST(hour(ts) AS BIGINT) AS hour FROM events WHERE event_type = 'click'
EXCEPT SELECT DISTINCT user_id, CAST(hour(ts) AS BIGINT) AS hour FROM events WHERE event_type = 'purchase'
ORDER BY user_id, hour""",
    "intersect_users" ->
      """SELECT DISTINCT user_id, CAST(hour(ts) AS BIGINT) AS hour FROM events WHERE event_type = 'click'
INTERSECT SELECT DISTINCT user_id, CAST(hour(ts) AS BIGINT) AS hour FROM events WHERE event_type = 'purchase'
ORDER BY user_id, hour""",
    "except_all_users" ->
      """WITH c AS (SELECT user_id, CAST(hour(ts) AS BIGINT) AS hour
  FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, CAST(hour(ts) AS BIGINT) AS hour
  FROM events WHERE event_type = 'purchase'),
x AS (SELECT * FROM c EXCEPT ALL SELECT * FROM p)
SELECT user_id, hour, CAST(count(*) AS BIGINT) AS n_surviving
FROM x GROUP BY user_id, hour ORDER BY user_id, hour""",
    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice) OVER w AS last_price,
  nth_value(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey""",
    "window_pct" ->
      """SELECT o_custkey, o_orderkey,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
ORDER BY o_custkey, o_orderkey""",
    "resample_daily" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day, o_totalprice
  FROM orders),
d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_orders,
  sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rd FROM o GROUP BY day),
sp AS (SELECT CAST(unnest(generate_series(
    (SELECT min(day) FROM o), (SELECT max(day) FROM o),
    INTERVAL 1 DAY)) AS DATE) AS day),
j AS (SELECT sp.day, coalesce(n_orders, 0) AS n_orders,
  coalesce(rd, 0) AS rd FROM sp LEFT JOIN d ON sp.day = d.day)
SELECT day, n_orders, CAST(rd AS DOUBLE) AS revenue,
  CAST(sum(rd) OVER (ORDER BY day
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev7
FROM j ORDER BY day""",
    "window_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
  CAST(count(*) OVER w AS BIGINT) AS n_30d,
  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_30d,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
    / (count(*) OVER w), 4) AS avg_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey""",
    "window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
  lag(o_totalprice, 1) OVER w AS prev_price,
  lead(o_totalprice, 1) OVER w AS next_price,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey""",
    "q1_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q1_sets" ->
      """SELECT l_returnflag, l_linestatus, CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
c AS (SELECT token, count(*) AS n FROM t GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
SELECT token, n, total FROM c, tot
WHERE n * 100 > total ORDER BY n DESC, token""",
    "sample_fixed_k" ->
      """WITH r AS (SELECT doc_id, lang,
  CAST(row_number() OVER (PARTITION BY lang
    ORDER BY md5('fk:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents)
SELECT doc_id, lang, rk FROM r WHERE rk <= 20 ORDER BY lang, rk""",
    "unpivot_stats" ->
      """WITH w AS (SELECT doc_id, len(text) AS n_chars,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_distinct FROM documents)
SELECT doc_id, 'n_chars' AS metric, n_chars AS value FROM w
UNION ALL SELECT doc_id, 'n_tokens', n_tokens FROM w
UNION ALL SELECT doc_id, 'n_distinct', n_distinct FROM w
ORDER BY doc_id, metric""",
    "assign_ids" ->
      """SELECT doc_id,
  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS global_id
FROM documents ORDER BY doc_id""",
    "chunk_sliding" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, toks,
  CASE WHEN len(toks) <= 32 THEN 1
    ELSE ((len(toks) - 32 + 23) // 24) + 1 END AS nc FROM t),
e AS (SELECT doc_id, toks, unnest(range(nc)) AS chunk_idx FROM c)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
  CAST(chunk_idx * 24 AS BIGINT) AS start_tok,
  CAST(len(toks[chunk_idx*24+1:chunk_idx*24+32]) AS BIGINT) AS n_tokens,
  md5(array_to_string(toks[chunk_idx*24+1:chunk_idx*24+32], ' ')) AS chunk_md5
FROM e ORDER BY doc_id, chunk_idx""",
    "corpus_distinct" ->
      """WITH t AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
SELECT lang, count(DISTINCT doc_id) AS n_docs,
  count(DISTINCT token) AS distinct_tokens,
  count(*) AS token_occurrences
FROM t GROUP BY lang ORDER BY lang""",
    "semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
ORDER BY c_custkey""",
    "q1_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "pivot_hourly" ->
      """SELECT CAST(hour(ts) AS BIGINT) AS hour,
  count(*) FILTER (event_type = 'click') AS click,
  count(*) FILTER (event_type = 'error') AS error,
  count(*) FILTER (event_type = 'purchase') AS purchase,
  count(*) FILTER (event_type = 'signup') AS signup,
  count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY 1 ORDER BY hour""",
    "range_join" ->
      """WITH c AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS pt FROM events WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id, epoch_ms(c.t * 1000) AS ts, count(p.pt) AS n_nearby_purchases
FROM c LEFT JOIN p ON c.user_id = p.user_id AND abs(p.pt - c.t) <= 300
GROUP BY c.event_id, c.user_id, c.t ORDER BY c.event_id""",
    "graph_pagerank" -> graft.operators.Graph.pagerankOracleSql,
    "graph_ppr" -> graft.operators.Graph.pprOracleSql,
    "graph_lpa" -> graft.operators.Graph.lpaOracleSql,
    "graph_hits" -> graft.operators.Graph.hitsOracleSql,
    "graph_components" -> graft.operators.Graph.componentsOracleSql,
    // generated unrolled replays of the unigram-LM trainer (recursive
    // path CTEs re-derive each round's Viterbi E-step independently)
    "unigram_vocab" ->
      graft.operators.UnigramTrainer.unigramVocabOracleSql,
    "unigram_coverage" ->
      graft.operators.UnigramTrainer.unigramCoverageOracleSql(bpeReplayCtes),
    // the generated unrolled replay of the hybrid trainer — the last
    // former rows-only exemption, killed by the same pattern
    "bpe_merges" -> graft.operators.BpeTrainer.bpeOracleSql(10),
    // generated from the same QueryPanel as the Spark query
    "index_topk_batch" -> Retrieval.indexTopKBatchOracleSql(5),
    "emb_pca_power" -> SimilarityPipeline.embPcaPowerOracleSql,
    "emb_pca_project" -> SimilarityPipeline.embPcaProjectOracleSql,
    "sim_recall_tune" -> SimilarityPipeline.simRecallTuneOracleSql,
    "bm25_topk" -> Retrieval.bm25OracleSql(10),
    // the persisted-index search answers the SAME whole-corpus BM25
    // recompute (avgdl from persisted sums — exact, integer-valued
    // double summation merges across segments)
    "bm25_store" -> Retrieval.bm25OracleSql(10),
    "ranker_agreement" -> Retrieval.rankerAgreementOracleSql(20),
    "hybrid_rrf" -> Retrieval.hybridRrfOracleSql(10, 20),
    // the composed RAG chain replayed stage-for-stage from ONE shared
    // CTE generator (chunks, sparse embed, seeded IVF, BM25, fusion)
    "retrieval_program" ->
      graft.operators.RetrievalProgram.retrievalProgramOracleSql,
    "retrieval_funnel" ->
      graft.operators.RetrievalProgram.retrievalFunnelOracleSql,
    // the persisted store's probe answers the SAME chain replay — the
    // green hash proves build + append + probe == in-query composition
    "retrieval_store" ->
      graft.operators.RetrievalProgram.retrievalProgramOracleSql,
    // the scorecard replay: indexTopKBatch scoring CTEs graded by
    // n_terms_hit, the SAME embedded gain/discount/reciprocal literals
    "retrieval_ndcg" -> Retrieval.retrievalEvalOracleSql,
    // per-artifact checksums replayed from the shared chain CTEs
    "retrieval_store_stats" ->
      graft.operators.RetrievalProgram.retrievalStoreStatsOracleSql,
    // the batched panel probe replayed from the SAME corpus CTEs +
    // per-query panel stages (one generator, the batch cannot drift)
    "retrieval_store_batch" ->
      graft.operators.RetrievalProgram.retrievalStoreBatchOracleSql,
    // the four-ranker scorecard replay: seed-B qrels + each ranker's
    // top-k CTEs (the store side from the SAME panel chain generator)
    "retrieval_ndcg_rankers" ->
      graft.operators.RankerEval.rankerScorecardOracleSql,
    // the filtered probe replayed from the SAME chain CTEs + f-stages
    // (global stats, range-restricted candidates, widened probe)
    "retrieval_store_filtered" ->
      graft.operators.RetrievalProgram.retrievalStoreFilteredOracleSql,
    // both releases' scorecards replayed from the shared qrels/TF-IDF
    // CTEs (descending + ascending rankings), unpivoted and diffed
    "scorecard_drift" ->
      graft.operators.RankerEval.scorecardDriftOracleSql,
    "sessionize" ->
      """WITH f AS (SELECT user_id, ts, event_id, value,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
g AS (SELECT *, CASE WHEN prev_ts IS NULL OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800 THEN 1 ELSE 0 END AS new_session FROM f),
h AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq FROM g)
SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
  count(*) AS n_events,
  CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_s
FROM h GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",
    // sessions as dialogues: ~4-chars-per-token turn estimates, left
    // truncation to the (deliberately tight) 8-token context so the
    // truncation path is exercised, assistant-token loss mask
    "sft_pack" ->
      """WITH sf AS (SELECT user_id, ts, event_id, event_type, props,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
sg AS (SELECT *, CASE WHEN prev_ts IS NULL OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800 THEN 1 ELSE 0 END AS new_session FROM sf),
sh AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq FROM sg),
st AS (SELECT user_id, session_seq,
  CAST(row_number() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS BIGINT) AS turn_idx,
  CAST(floor((length(event_type) + length(props) + 3) / 4.0) AS BIGINT) AS turn_tokens FROM sh),
sr AS (SELECT *, sum(turn_tokens) OVER (PARTITION BY user_id, session_seq ORDER BY turn_idx DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rcum FROM st)
SELECT user_id, session_seq,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(turn_tokens) AS BIGINT) AS total_tokens,
  CAST(sum(CASE WHEN rcum <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS kept_turns,
  CAST(coalesce(sum(CASE WHEN rcum <= 8 THEN turn_tokens END), 0) AS BIGINT) AS kept_tokens,
  CAST(coalesce(sum(CASE WHEN rcum <= 8 AND turn_idx % 2 = 0 THEN turn_tokens END), 0) AS BIGINT) AS assistant_tokens,
  sum(turn_tokens) > 8 AS truncated
FROM sr GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",
    "asof_join" ->
      """SELECT event_id, c.user_id, c.ts, c.value, p.value AS asof_purchase_value
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY event_id""",
    // DuckDB's ASOF with <= picks the nearest ts AT OR AFTER — the
    // forward direction our union-scan mirrors
    "asof_forward" ->
      """SELECT event_id, c.user_id, c.ts, c.value, p.value AS next_purchase_value
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY event_id""",
    "text_normalize" ->
      """SELECT doc_id,
  CAST(len(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS BIGINT) AS norm_len,
  md5(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_md5
FROM documents ORDER BY doc_id""",
    "corpus_stats" ->
      """SELECT lang, count(*) AS n_docs,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
  round(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*), 4) AS avg_tokens
FROM documents GROUP BY lang ORDER BY lang""",
    "q6_filter" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN CAST(0.05 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
  AND l_quantity < 24""",
    "q10_returns" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q18_big_orders" ->
      """WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 300.0)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big, orders, customer
WHERE big.l_orderkey = o_orderkey AND o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "text_vocab" ->
      """SELECT token, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY n_total DESC, token LIMIT 20""",
    "emb_centroid_stats" ->
      """WITH e AS (SELECT label, unnest(embedding) AS v, unnest(range(64)) AS pos FROM embeddings),
cent AS (SELECT label, list(m ORDER BY pos) AS centroid, first(cnt) AS n
  FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS m, count(*) AS cnt FROM e GROUP BY label, pos)
  GROUP BY label)
SELECT label, n, round(sqrt(list_sum(list_transform(range(64), i -> centroid[i+1] * centroid[i+1]))), 4) AS centroid_norm
FROM cent ORDER BY label""",
    "emb_outliers" ->
      """WITH e AS (SELECT vec_id, unnest(range(64)) AS i,
  CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
c AS (SELECT i, sum(x) / count(*) AS m FROM e GROUP BY i),
d AS (SELECT vec_id, sqrt(sum((x - m) * (x - m))) AS dist
  FROM e JOIN c USING (i) GROUP BY vec_id),
s AS (SELECT sum(dist) / count(*) AS mu,
  sqrt(sum(dist * dist) / count(*)
    - (sum(dist) / count(*)) * (sum(dist) / count(*))) AS sigma FROM d)
SELECT vec_id, round(dist, 4) AS dist,
  round((dist - mu) / sigma, 4) AS z,
  (dist - mu) / sigma > 2 AS is_outlier
FROM d, s ORDER BY vec_id""",
    "media_meta" ->
      """SELECT doc_id AS media_id, 'GR' AS magic,
  ['image','audio','video'][(doc_id % 3) + 1] AS kind,
  CAST(n_chars % 64 + 1 AS BIGINT) AS width,
  CAST(doc_id % 48 + 1 AS BIGINT) AS height,
  CAST(len(text) AS BIGINT) AS body_bytes,
  md5(text) AS body_md5
FROM documents ORDER BY media_id""",
    // the construction-input replay: Spark's row is parsed OUT of real
    // JPEG bytes (variable-offset SOF), the oracle recomputes what went in
    "media_jpeg_meta" ->
      """SELECT doc_id AS media_id, TRUE AS soi_ok,
  CAST(25 + doc_id % 7 AS BIGINT) AS sof_at,
  CAST(n_chars % 64 + 1 AS BIGINT) AS width,
  CAST(doc_id % 48 + 1 AS BIGINT) AS height,
  TRUE AS roundtrip_ok
FROM documents ORDER BY media_id""",
    // the pixel-law replay: Spark's numbers come from DECODED PNG
    // rasters; the oracle recomputes gray(x,y) = (d*31+x*7+y*13) % 256
    // over the same grid — integer-exact both sides
    "media_png_features" ->
      """WITH pf AS (SELECT doc_id AS media_id,
  CAST(n_chars % 16 + 4 AS BIGINT) AS width,
  CAST(doc_id % 12 + 4 AS BIGINT) AS height,
  CAST(list_sum(flatten(list_transform(range(n_chars % 16 + 4), x ->
    list_transform(range(doc_id % 12 + 4), y ->
      (doc_id * 31 + x * 7 + y * 13) % 256)))) AS BIGINT) AS luma_sum
  FROM documents)
SELECT media_id, width, height,
  CAST(width * height AS BIGINT) AS n_pixels,
  luma_sum,
  CAST(luma_sum * 10000 // (width * height) AS BIGINT) AS luma_q4
FROM pf ORDER BY media_id""",
    "media_mp4_meta" ->
      """SELECT doc_id AS media_id, 'isom' AS brand,
  CAST(25 + doc_id % 7 AS BIGINT) AS moov_at,
  CAST(600 + (doc_id % 5) * 120 AS BIGINT) AS timescale,
  CAST(n_chars * 25 + doc_id % 97 AS BIGINT) AS duration,
  CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
  CAST((n_chars * 25 + doc_id % 97) * 1000 // (600 + (doc_id % 5) * 120) AS BIGINT) AS duration_ms,
  TRUE AS roundtrip_ok
FROM documents ORDER BY media_id""",
    // the frame-walk replay: Spark's numbers come from the byte-level
    // MP3 header walk (ID3 skip + sync-validated frame stepping); the
    // oracle recomputes the construction law — bitrate/sample-rate
    // tables by the synthesized indexes, 1152-sample MPEG-1 frames
    "media_mp3_meta" ->
      """WITH m AS (SELECT doc_id AS media_id,
  list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
    CAST(1 + doc_id % 14 AS INT)) AS kbps,
  list_extract([44100,48000,32000], CAST(doc_id % 3 + 1 AS INT)) AS sr,
  CAST(1 + n_chars % 4 AS BIGINT) AS n_frames,
  CAST(11 + doc_id % 7 AS BIGINT) AS first_frame_at
  FROM documents)
SELECT media_id, first_frame_at,
  CAST(kbps AS BIGINT) AS bitrate_kbps,
  CAST(sr AS BIGINT) AS sample_rate,
  n_frames,
  CAST(n_frames * 1152 * 1000 // sr AS BIGINT) AS duration_ms,
  TRUE AS roundtrip_ok
FROM m ORDER BY media_id""",
    // the ADTS replay: audio-object/rate/channel law + 1024-sample frames
    "media_aac_meta" ->
      """WITH m AS (SELECT doc_id AS media_id,
  CAST(1 + doc_id % 3 AS BIGINT) AS aot,
  list_extract([96000,88200,64000,48000,44100,32000,24000,22050,16000,12000,11025,8000,7350],
    CAST(3 + doc_id % 5 + 1 AS INT)) AS sr,
  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
  CAST(1 + n_chars % 4 AS BIGINT) AS n_frames
  FROM documents)
SELECT media_id, aot,
  CAST(sr AS BIGINT) AS sample_rate,
  channels, n_frames,
  CAST(n_frames * 1024 * 1000 // sr AS BIGINT) AS duration_ms,
  TRUE AS roundtrip_ok
FROM m ORDER BY media_id""",
    // the AVCC replay: profile/level law + the NAL census (1 SPS, 1 PPS,
    // 1 IDR + 0-3 non-IDR slices)
    "media_h264_meta" ->
      """SELECT doc_id AS media_id,
  CAST(66 + (doc_id % 3) * 11 AS BIGINT) AS profile_idc,
  CAST(10 + (doc_id % 5) * 10 AS BIGINT) AS level_idc,
  CAST(1 AS BIGINT) AS n_sps, CAST(1 AS BIGINT) AS n_pps,
  CAST(1 + n_chars % 4 AS BIGINT) AS n_frames,
  TRUE AS roundtrip_ok
FROM documents ORDER BY media_id""",
    // the sample-law replay: Spark's numbers come from PCM frames decoded
    // by the JDK's WAV reader; the oracle recomputes
    // s(i) = (d*17 + i*29) % 256 over the same index range
    "media_wav_features" ->
      """WITH wf AS (SELECT doc_id AS media_id,
  CAST(8000 + (doc_id % 4) * 1000 AS BIGINT) AS sample_rate,
  CAST((n_chars % 16) * 2 + 8 AS BIGINT) AS n_samples,
  list_transform(range((n_chars % 16) * 2 + 8), i -> (doc_id * 17 + i * 29) % 256) AS s
  FROM documents)
SELECT media_id, sample_rate, n_samples,
  CAST(list_sum(s) AS BIGINT) AS pcm_sum,
  CAST(len(list_filter(range(n_samples - 1), i -> (s[i+1] < 128) <> (s[i+2] < 128))) AS BIGINT) AS zero_cross,
  CAST(list_sum(s) * 10000 // n_samples AS BIGINT) AS amp_q4
FROM wf ORDER BY media_id""",
    "media_frame_sample" ->
      """WITH f AS (SELECT doc_id AS media_id, text,
  CAST((len(text)+15)//16 AS BIGINT) AS n_frames FROM documents)
SELECT media_id, n_frames,
  unnest(range((n_frames-1)//4 + 1)) AS sample_idx,
  unnest(list_transform(range((n_frames-1)//4 + 1), i -> md5(substr(text, CAST(i*64+1 AS INT), 16)))) AS frame_md5
FROM f ORDER BY media_id, sample_idx""",
    "media_resize" ->
      """WITH d AS (SELECT doc_id AS media_id,
  CAST(n_chars % 64 + 1 AS BIGINT) AS width,
  CAST(doc_id % 48 + 1 AS BIGINT) AS height,
  text FROM documents),
r AS (SELECT media_id, width, height,
  greatest(1, width * 32 // greatest(width, height)) AS out_w,
  greatest(1, height * 32 // greatest(width, height)) AS out_h,
  text FROM d)
SELECT media_id, width, height, out_w, out_h,
  md5(text || 'x' || CAST(out_w AS VARCHAR) || 'x' || CAST(out_h AS VARCHAR)) AS resized_md5
FROM r ORDER BY media_id""",
    "dedup_pipeline" ->
      """WITH reps AS (
  SELECT min(doc_id) AS doc_id, min(text) AS text, count(*) AS n_copies
  FROM documents GROUP BY md5(lower(trim(text)))),
sh AS (
  SELECT doc_id, n_copies, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' ')) END AS sg
  FROM (SELECT doc_id, n_copies, string_split(text, ' ') AS toks FROM reps)),
ss AS (SELECT doc_id, n_copies, list_distinct(sg) AS s FROM sh),
sig AS (SELECT doc_id, s, list_transform(range(16), k -> list_min(list_transform(s, x -> md5(k || ':' || x)))) AS mh FROM ss),
bands AS (SELECT doc_id, b.band, md5(mh[b.band*4+1] || '|' || mh[b.band*4+2] || '|' || mh[b.band*4+3] || '|' || mh[b.band*4+4]) AS digest
  FROM sig, (SELECT unnest(range(4)) AS band) b),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id),
v AS (SELECT doc_a, doc_b,
    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard,
    x.n_copies AS copies_a, y.n_copies AS copies_b
  FROM cand JOIN ss x ON cand.doc_a = x.doc_id JOIN ss y ON cand.doc_b = y.doc_id)
SELECT doc_a, doc_b, jaccard, copies_a, copies_b FROM v WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""",
    "dedup_incremental" ->
      s"""WITH
$shingleSetCtes,
sig AS (SELECT doc_id, s, list_transform(range(16), k -> list_min(list_transform(s, x -> md5(k || ':' || x)))) AS mh FROM ss),
bands AS (SELECT doc_id, b.band, md5(mh[b.band*4+1] || '|' || mh[b.band*4+2] || '|' || mh[b.band*4+3] || '|' || mh[b.band*4+4]) AS digest
  FROM sig, (SELECT unnest(range(4)) AS band) b),
bkt AS (SELECT doc_id, CAST(list_sum(list_transform(range(4), d ->
    CAST(strpos('0123456789abcdef', md5('inc:' || CAST(doc_id AS VARCHAR))[d+1:d+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-d))))) % 100 AS BIGINT) AS bucket FROM documents),
delta AS (SELECT doc_id FROM bkt WHERE bucket < 10),
corp AS (SELECT doc_id FROM bkt WHERE bucket >= 10),
hx AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM documents),
cand AS (SELECT DISTINCT d.doc_id AS doc_id, c.doc_id AS corpus_doc
  FROM bands d JOIN delta ON d.doc_id = delta.doc_id
  JOIN bands c ON d.band = c.band AND d.digest = c.digest
  JOIN corp ON c.doc_id = corp.doc_id),
nearv AS (SELECT cand.doc_id, cand.corpus_doc,
    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))), 4) AS j
  FROM cand JOIN ss x ON cand.doc_id = x.doc_id JOIN ss y ON cand.corpus_doc = y.doc_id),
nearagg AS (SELECT doc_id, count(*) AS n_near FROM nearv WHERE j >= 0.8 GROUP BY doc_id),
ex AS (SELECT DISTINCT h, TRUE AS dup_exact FROM hx JOIN corp ON hx.doc_id = corp.doc_id)
SELECT delta.doc_id,
  coalesce(ex.dup_exact, FALSE) AS dup_exact,
  CAST(coalesce(nearagg.n_near, 0) AS BIGINT) AS n_near,
  ((NOT coalesce(ex.dup_exact, FALSE)) AND coalesce(nearagg.n_near, 0) = 0) AS novel
FROM delta
JOIN hx dh ON delta.doc_id = dh.doc_id
LEFT JOIN ex ON dh.h = ex.h
LEFT JOIN nearagg ON delta.doc_id = nearagg.doc_id
ORDER BY delta.doc_id""",
    "mmr_rerank" -> SimilarityPipeline.mmrOracleSql,
    "sim_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (SELECT vec_id, label, (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) AS c
  FROM embeddings, q WHERE vec_id <> 0),
t AS (SELECT vec_id, label, c, row_number() OVER (ORDER BY c DESC, vec_id) AS rank FROM s)
SELECT rank, vec_id, label, round(c, 4) AS sim FROM t WHERE rank <= 20 ORDER BY rank""",
    "sim_topk_ivf" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
e AS (SELECT label, unnest(embedding) AS v, unnest(range(64)) AS pos FROM embeddings),
cent AS (SELECT label, list(avg ORDER BY pos) AS centroid
  FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS avg FROM e GROUP BY label, pos) GROUP BY label),
probe AS (SELECT label FROM cent, q
  ORDER BY (list_sum(list_transform(range(64), i -> CAST(centroid[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(centroid[i+1] AS DOUBLE) * CAST(centroid[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) DESC, label LIMIT 2),
s AS (SELECT vec_id, embeddings.label, (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) AS c
  FROM embeddings JOIN probe ON embeddings.label = probe.label, q WHERE vec_id <> 0),
t AS (SELECT vec_id, label, c, row_number() OVER (ORDER BY c DESC, vec_id) AS rank FROM s)
SELECT rank, vec_id, label, round(c, 4) AS sim FROM t WHERE rank <= 10 ORDER BY rank""",
    "emb_neardup" ->
      s"""WITH
$hyperplanePairCtes
SELECT vec_a, vec_b, sim FROM v WHERE sim >= 0.4 ORDER BY vec_a, vec_b""",
    // LSH probe replay: same signature scheme as emb_neardup's CTEs but
    // query-sided — candidates share a (band, val) bucket with vec 0
    "sim_topk_lsh" ->
      """WITH hyper AS (SELECT vec_id AS h_idx, embedding AS h FROM embeddings WHERE vec_id < 16),
bits AS (SELECT e.vec_id, CAST(h_idx // 4 AS INTEGER) AS band,
    CASE WHEN list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(h.h[i+1] AS DOUBLE))) > 0 THEN 1 ELSE 0 END
      * CAST(2 ** (h_idx % 4) AS INTEGER) AS bit
  FROM embeddings e, hyper h),
bv AS (SELECT vec_id, band, sum(bit) AS val FROM bits GROUP BY vec_id, band),
qb AS (SELECT band, val FROM bv WHERE vec_id = 0),
cand AS (SELECT DISTINCT b.vec_id FROM bv b JOIN qb ON b.band = qb.band AND b.val = qb.val WHERE b.vec_id <> 0),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
ex AS (SELECT vec_id FROM (SELECT vec_id, row_number() OVER (ORDER BY (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) DESC, vec_id) AS rank
  FROM embeddings, q WHERE vec_id <> 0) WHERE rank <= 10),
s AS (SELECT e.vec_id, e.label, (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) AS c
  FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id, q),
t AS (SELECT vec_id, label, c, row_number() OVER (ORDER BY c DESC, vec_id) AS rank FROM s)
SELECT rank, vec_id, label, round(c, 4) AS sim,
  (vec_id IN (SELECT vec_id FROM ex)) AS in_exact
FROM t WHERE rank <= 10 ORDER BY rank""",
    // generated grid replay: sign bits once, per-config band pack +
    // bucket probe + candidate/hit scalar counts
    "lsh_recall_grid" -> lshRecallGridOracleSql,
    // the persisted-store probe answers the SAME recompute as
    // sim_topk_lsh: frozen normals (vec_id < 16, all in the base build),
    // whole-corpus buckets (base + delta segments), brute-force audit —
    // append == recompute proven by the shared oracle
    "lsh_store" ->
      """WITH hyper AS (SELECT vec_id AS h_idx, embedding AS h FROM embeddings WHERE vec_id < 16),
bits AS (SELECT e.vec_id, CAST(h_idx // 4 AS INTEGER) AS band,
    CASE WHEN list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(h.h[i+1] AS DOUBLE))) > 0 THEN 1 ELSE 0 END
      * CAST(2 ** (h_idx % 4) AS INTEGER) AS bit
  FROM embeddings e, hyper h),
bv AS (SELECT vec_id, band, sum(bit) AS val FROM bits GROUP BY vec_id, band),
qb AS (SELECT band, val FROM bv WHERE vec_id = 0),
cand AS (SELECT DISTINCT b.vec_id FROM bv b JOIN qb ON b.band = qb.band AND b.val = qb.val WHERE b.vec_id <> 0),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
ex AS (SELECT vec_id FROM (SELECT vec_id, row_number() OVER (ORDER BY (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) DESC, vec_id) AS rank
  FROM embeddings, q WHERE vec_id <> 0) WHERE rank <= 10),
s AS (SELECT e.vec_id, e.label, (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) AS c
  FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id, q),
t AS (SELECT vec_id, label, c, row_number() OVER (ORDER BY c DESC, vec_id) AS rank FROM s)
SELECT rank, vec_id, label, round(c, 4) AS sim,
  (vec_id IN (SELECT vec_id FROM ex)) AS in_exact
FROM t WHERE rank <= 10 ORDER BY rank""",
    // the filtered LSH probe: same signature/bucket replay, the label
    // predicate applied to BOTH the candidate verify and the exact audit
    "lsh_store_filtered" ->
      """WITH hyper AS (SELECT vec_id AS h_idx, embedding AS h FROM embeddings WHERE vec_id < 16),
bits AS (SELECT e.vec_id, CAST(h_idx // 4 AS INTEGER) AS band,
    CASE WHEN list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(h.h[i+1] AS DOUBLE))) > 0 THEN 1 ELSE 0 END
      * CAST(2 ** (h_idx % 4) AS INTEGER) AS bit
  FROM embeddings e, hyper h),
bv AS (SELECT vec_id, band, sum(bit) AS val FROM bits GROUP BY vec_id, band),
qb AS (SELECT band, val FROM bv WHERE vec_id = 0),
cand AS (SELECT DISTINCT b.vec_id FROM bv b JOIN qb ON b.band = qb.band AND b.val = qb.val WHERE b.vec_id <> 0),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
ex AS (SELECT vec_id FROM (SELECT vec_id, row_number() OVER (ORDER BY (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) DESC, vec_id) AS rank
  FROM embeddings, q WHERE vec_id <> 0 AND label = 3) WHERE rank <= 10),
s AS (SELECT e.vec_id, e.label, (list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) AS c
  FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id, q WHERE e.label = 3),
t AS (SELECT vec_id, label, c, row_number() OVER (ORDER BY c DESC, vec_id) AS rank FROM s)
SELECT rank, vec_id, label, round(c, 4) AS sim,
  (vec_id IN (SELECT vec_id FROM ex)) AS in_exact
FROM t WHERE rank <= 10 ORDER BY rank""",
    // the batch replay: 8 query signatures joined to corpus buckets,
    // per-query candidate rank + per-query brute-force audit set
    "sim_topk_lsh_batch" ->
      """WITH hyper AS (SELECT vec_id AS h_idx, embedding AS h FROM embeddings WHERE vec_id < 16),
bits AS (SELECT e.vec_id, CAST(h_idx // 4 AS INTEGER) AS band,
    CASE WHEN list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(h.h[i+1] AS DOUBLE))) > 0 THEN 1 ELSE 0 END
      * CAST(2 ** (h_idx % 4) AS INTEGER) AS bit
  FROM embeddings e, hyper h),
bv AS MATERIALIZED (SELECT vec_id, band, sum(bit) AS val FROM bits GROUP BY vec_id, band),
qb AS (SELECT vec_id AS q_id, band, val FROM bv WHERE vec_id < 8),
cand AS (SELECT DISTINCT qb.q_id, b.vec_id FROM bv b
  JOIN qb ON b.band = qb.band AND b.val = qb.val WHERE b.vec_id >= 8),
qv AS (SELECT vec_id AS q_id, embedding AS q FROM embeddings WHERE vec_id < 8),
s AS (SELECT cand.q_id, e.vec_id,
  (list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(qv.q[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(e.embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv.q[i+1] AS DOUBLE) * CAST(qv.q[i+1] AS DOUBLE)))))) AS c
  FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id JOIN qv ON cand.q_id = qv.q_id),
ex AS (SELECT q_id, vec_id FROM (SELECT qv.q_id, e.vec_id,
    row_number() OVER (PARTITION BY qv.q_id ORDER BY (list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(qv.q[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(e.embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv.q[i+1] AS DOUBLE) * CAST(qv.q[i+1] AS DOUBLE)))))) DESC, e.vec_id) AS r
  FROM embeddings e, qv WHERE e.vec_id >= 8) WHERE r <= 5),
t AS (SELECT q_id, vec_id, c, row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rank FROM s)
SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, round(c, 4) AS sim,
  EXISTS(SELECT 1 FROM ex WHERE ex.q_id = t.q_id AND ex.vec_id = t.vec_id) AS in_exact
FROM t WHERE rank <= 5 ORDER BY q_id, rank""",
    // the persisted store's batch probe answers the SAME recompute —
    // build + append + broadcast-signature bucket join, audited
    "lsh_store_batch" ->
      """WITH hyper AS (SELECT vec_id AS h_idx, embedding AS h FROM embeddings WHERE vec_id < 16),
bits AS (SELECT e.vec_id, CAST(h_idx // 4 AS INTEGER) AS band,
    CASE WHEN list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(h.h[i+1] AS DOUBLE))) > 0 THEN 1 ELSE 0 END
      * CAST(2 ** (h_idx % 4) AS INTEGER) AS bit
  FROM embeddings e, hyper h),
bv AS MATERIALIZED (SELECT vec_id, band, sum(bit) AS val FROM bits GROUP BY vec_id, band),
qb AS (SELECT vec_id AS q_id, band, val FROM bv WHERE vec_id < 8),
cand AS (SELECT DISTINCT qb.q_id, b.vec_id FROM bv b
  JOIN qb ON b.band = qb.band AND b.val = qb.val WHERE b.vec_id >= 8),
qv AS (SELECT vec_id AS q_id, embedding AS q FROM embeddings WHERE vec_id < 8),
s AS (SELECT cand.q_id, e.vec_id,
  (list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(qv.q[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(e.embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv.q[i+1] AS DOUBLE) * CAST(qv.q[i+1] AS DOUBLE)))))) AS c
  FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id JOIN qv ON cand.q_id = qv.q_id),
ex AS (SELECT q_id, vec_id FROM (SELECT qv.q_id, e.vec_id,
    row_number() OVER (PARTITION BY qv.q_id ORDER BY (list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(qv.q[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(e.embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv.q[i+1] AS DOUBLE) * CAST(qv.q[i+1] AS DOUBLE)))))) DESC, e.vec_id) AS r
  FROM embeddings e, qv WHERE e.vec_id >= 8) WHERE r <= 5),
t AS (SELECT q_id, vec_id, c, row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rank FROM s)
SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, round(c, 4) AS sim,
  EXISTS(SELECT 1 FROM ex WHERE ex.q_id = t.q_id AND ex.vec_id = t.vec_id) AS in_exact
FROM t WHERE rank <= 5 ORDER BY q_id, rank""",
    // the batched FILTERED store probe: the lsh_store_batch replay with
    // per-query label predicates (generated — one label recipe shared
    // with the Spark probe)
    "lsh_store_filtered_batch" ->
      graft.operators.PersistedIndex.lshFilteredBatchOracleSql(),
    "emb_kmeans" ->
      s"""WITH
$kmeansCtes
SELECT vec_id, cluster, round(d2, 4) AS d2 FROM a2 WHERE rn = 1 ORDER BY vec_id""",
    // per-label pairwise-distance moments via the O(n) identity
    "emb_diversity" -> SimilarityPipeline.embDiversityOracleSql,
    // per-label diagonal participation ratio (embedding collapse audit)
    "emb_eff_rank" -> SimilarityPipeline.embEffRankOracleSql,
    // hardest positive/negative per panel anchor (contrastive mining)
    "hard_negatives" -> SimilarityPipeline.hardNegativesOracleSql(),
    // simplified silhouette against the same two-round Lloyd model: a =
    // own-centroid distance, b = nearest other centroid, per-cluster mean
    "cluster_silhouette" ->
      s"""WITH
$kmeansCtes,
sown AS (SELECT vec_id, cluster AS own FROM a2 WHERE rn = 1),
sab AS (SELECT d2t.vec_id, sown.own,
  sum(CASE WHEN d2t.cluster = sown.own THEN d2 END) AS a2d,
  min(CASE WHEN d2t.cluster <> sown.own THEN d2 END) AS b2d
  FROM d2t JOIN sown USING (vec_id) GROUP BY d2t.vec_id, sown.own),
ss AS (SELECT own AS cluster,
  CAST(floor((sqrt(b2d) - sqrt(a2d)) / greatest(sqrt(a2d), sqrt(b2d))
    * 1000000 + 0.5) AS BIGINT) AS sil_micro FROM sab)
SELECT cluster, CAST(count(*) AS BIGINT) AS n,
  round(CAST(sum(sil_micro) AS DOUBLE) / count(*) / 1000000, 4) AS mean_sil
FROM ss GROUP BY cluster ORDER BY cluster""",
    "sim_topk_kmeans" ->
      s"""WITH
$kmeansCtes,
q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv FROM embeddings WHERE vec_id = 0),
probe AS (SELECT cluster FROM c1, q
  ORDER BY (list_sum(list_transform(range(64), i -> c[i+1] * qv[i+1])) / (sqrt(list_sum(list_transform(range(64), i -> c[i+1] * c[i+1]))) * sqrt(list_sum(list_transform(range(64), i -> qv[i+1] * qv[i+1]))))) DESC, cluster LIMIT 2),
s AS (SELECT a2.vec_id, a2.cluster,
    (list_sum(list_transform(range(64), i -> v[i+1] * qv[i+1])) / (sqrt(list_sum(list_transform(range(64), i -> v[i+1] * v[i+1]))) * sqrt(list_sum(list_transform(range(64), i -> qv[i+1] * qv[i+1]))))) AS c
  FROM a2 JOIN ek ON a2.vec_id = ek.vec_id JOIN probe ON a2.cluster = probe.cluster, q
  WHERE a2.rn = 1 AND a2.vec_id <> 0),
t AS (SELECT vec_id, cluster, c, row_number() OVER (ORDER BY c DESC, vec_id) AS rank FROM s)
SELECT rank, vec_id, cluster, round(c, 4) AS sim FROM t WHERE rank <= 10 ORDER BY rank""",
    // filtered IVF probe replay: kmeans rounds + q8 quantization + the
    // WIDENED 4-cluster probe + label predicate in stage 1 + exact rerank
    "sim_topk_filtered" ->
      s"""WITH
$kmeansCtes,
nq AS (SELECT vec_id, label, list_transform(v, x -> x / (CASE WHEN sqrt(list_sum(list_transform(v, y -> y*y))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform(v, y -> y*y))) END)) AS u FROM ek),
s8 AS (SELECT vec_id, label, u, CASE WHEN list_max(list_transform(u, x -> abs(x))) = 0 THEN 0.0 ELSE 127.0 / list_max(list_transform(u, x -> abs(x))) END AS sc FROM nq),
qt AS (SELECT vec_id, label, list_transform(u, x -> floor(x * sc + 0.5)) AS qv8 FROM s8),
qq AS (SELECT qv8 AS qqv FROM qt WHERE vec_id = 0),
q0 AS (SELECT v AS qv FROM ek WHERE vec_id = 0),
probe AS (SELECT cluster FROM c1, q0
  ORDER BY (list_sum(list_transform(range(64), i -> c[i+1] * qv[i+1])) / (sqrt(list_sum(list_transform(range(64), i -> c[i+1] * c[i+1]))) * sqrt(list_sum(list_transform(range(64), i -> qv[i+1] * qv[i+1]))))) DESC, cluster LIMIT 4),
asg AS (SELECT a2.vec_id, a2.cluster FROM a2 JOIN probe ON a2.cluster = probe.cluster WHERE a2.rn = 1),
st1 AS (SELECT qt.vec_id, asg.cluster,
  CAST(list_sum(list_transform(range(64), i -> qt.qv8[i+1] * qqv[i+1])) AS BIGINT) AS q8_dot
  FROM qt JOIN asg ON qt.vec_id = asg.vec_id, qq
  WHERE qt.label = 3 AND qt.vec_id <> 0),
c80 AS (SELECT vec_id, cluster, q8_dot,
  row_number() OVER (ORDER BY q8_dot DESC, vec_id) AS q8r FROM st1),
st2 AS (SELECT c80.vec_id, c80.cluster, c80.q8_dot,
  (list_sum(list_transform(range(64), i -> ek.v[i+1] * qv[i+1])) / (sqrt(list_sum(list_transform(range(64), i -> ek.v[i+1] * ek.v[i+1]))) * sqrt(list_sum(list_transform(range(64), i -> qv[i+1] * qv[i+1]))))) AS sim_raw
  FROM c80 JOIN ek ON c80.vec_id = ek.vec_id, q0 WHERE c80.q8r <= 80),
fr AS (SELECT vec_id, cluster, q8_dot, sim_raw,
  row_number() OVER (ORDER BY sim_raw DESC, vec_id) AS rank FROM st2)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, cluster, q8_dot,
  round(sim_raw, 4) AS sim
FROM fr WHERE rank <= 10 ORDER BY rank""",
    // per-subspace Lloyd replay + codeword-concat reconstruction; the
    // recon-error row sums per-row micro-quantized d2 (order-invariant)
    "pq_topk" -> SimilarityPipeline.pqTopkOracleSql,
    // probe decision + codebook replay + both stages, one generator
    "sim_topk_ivfpq" -> SimilarityPipeline.ivfPqOracleSql,
    "sim_topk_ivfpq_batch" -> SimilarityPipeline.ivfPqBatchOracleSql(),
    // the persisted store's pruned decode-probe answers the same replay
    "ivfpq_store" -> SimilarityPipeline.ivfPqOracleSql,
    // same generator with the stage-1 range predicate + widened
    // probe/fetch compensations
    "ivfpq_store_filtered" -> SimilarityPipeline.ivfPqFilteredOracleSql,
    // the batched filtered replay: per-query ranges + widened
    // probe/fetch through the shared batch core generator
    "sim_topk_filtered_batch" ->
      SimilarityPipeline.ivfPqFilteredBatchOracleSql(),
    // the persisted store's decode-probe answers the same replay
    "pq_store" -> SimilarityPipeline.pqTopkOracleSql,
    "pq_recon_error" -> SimilarityPipeline.pqReconErrorOracleSql,
    "pq_recall" -> SimilarityPipeline.pqRecallOracleSql,
    "mrl_recall" -> SimilarityPipeline.mrlRecallOracleSql,
    // unrolled EG rounds over the micro-NLL domain losses
    "domain_reweight" ->
      graft.operators.MixtureOptimizer.domainReweightOracleSql,
    // unrolled MM rounds over the derived comparison matrix
    "bt_ratings" -> graft.operators.Preference.btRatingsOracleSql,
    "elo_ratings" -> graft.operators.Preference.eloRatingsOracleSql,
    "pref_cycles" -> graft.operators.Preference.prefCyclesOracleSql,
    "excess_loss_select" ->
      graft.operators.MixtureOptimizer.excessLossSelectOracleSql(),
    "fim_split" -> {
      def h16(salt: String): String =
        s"CAST(list_sum(list_transform(range(4), dd -> " +
          s"CAST(strpos('0123456789abcdef', md5('$salt' || CAST(doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)" +
          s" * (1::BIGINT << (4*(3-dd))))) AS BIGINT)"
      s"""WITH ft AS (SELECT doc_id,
  list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
  FROM documents),
fh AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
  (${h16("fimr:")} % 100) < 50 AS fim,
  ${h16("fim1:")} % (CAST(len(toks) AS BIGINT) + 1) AS c1,
  ${h16("fim2:")} % (CAST(len(toks) AS BIGINT) + 1) AS c2
  FROM ft),
fc AS (SELECT doc_id, toks, n_tokens, fim,
  CASE WHEN fim THEN least(c1, c2) ELSE n_tokens END AS lo,
  CASE WHEN fim THEN greatest(c1, c2) ELSE n_tokens END AS hi
  FROM fh)
SELECT doc_id, fim, n_tokens, lo AS n_prefix, hi - lo AS n_middle,
  n_tokens - hi AS n_suffix,
  md5(coalesce(array_to_string(toks[CAST(lo + 1 AS INTEGER):CAST(hi AS INTEGER)], ' '), '')) AS middle_md5
FROM fc ORDER BY doc_id"""
    },
    // SemDeDup: within-cluster greedy keep-first — a vector is a dup iff
    // a lower-id same-cluster vector has round(cosine, 4) >= 0.4
    // the semantic_dedup cluster join ranked per vector at top-5
    "knn_graph" ->
      s"""WITH
$kmeansCtes,
asg AS (SELECT a2.vec_id, a2.cluster, ek.v
  FROM a2 JOIN ek ON a2.vec_id = ek.vec_id WHERE a2.rn = 1),
pr AS (SELECT x.vec_id AS vec_id, y.vec_id AS nbr_id,
  list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) /
    (sqrt(list_sum(list_transform(range(64), i -> x.v[i+1] * x.v[i+1]))) *
     sqrt(list_sum(list_transform(range(64), i -> y.v[i+1] * y.v[i+1])))) AS s
  FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id <> y.vec_id),
rk AS (SELECT vec_id, nbr_id, s,
  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, nbr_id) AS rank
  FROM pr)
SELECT vec_id, CAST(rank AS BIGINT) AS rank, nbr_id, round(s, 4) AS sim
FROM rk WHERE rank <= 5 ORDER BY vec_id, rank""",
    // full recompute under BASE-trained frozen centroids (train on
    // vec_id % 100 <> 7, assign everyone, cluster-blocked top-5) — the
    // Spark side only rebuilds delta-touched clusters, so hash equality
    // IS the append==recompute proof
    "knn_graph_delta" ->
      s"""WITH $frozenKnnCtes,
tc AS (SELECT DISTINCT cluster FROM asg WHERE vec_id % 100 = 7)
SELECT vec_id, CAST(rank AS BIGINT) AS rank, nbr_id, round(s, 4) AS sim,
  (cluster IN (SELECT cluster FROM tc)) AS recomputed
FROM rk WHERE rank <= 5 ORDER BY vec_id, rank""",
    // the PERSISTED store answers the same frozen-centroid recompute
    // (build on base residue + append delta + read back)
    "knn_store" ->
      s"""WITH $frozenKnnCtes
SELECT vec_id, CAST(rank AS BIGINT) AS rank, nbr_id, round(s, 4) AS sim
FROM rk WHERE rank <= 5 ORDER BY vec_id, rank""",
    // triangle census of the mutual kNN graph: knn edges -> mutual
    // (both directions present) -> degree-ordered orientation -> wedge
    // + closing join; per-node counts and micro clustering coefficient
    "knn_triangles" ->
      s"""WITH
$kmeansCtes,
asg AS (SELECT a2.vec_id, a2.cluster, ek.v
  FROM a2 JOIN ek ON a2.vec_id = ek.vec_id WHERE a2.rn = 1),
pr AS (SELECT x.vec_id AS vec_id, y.vec_id AS nbr_id,
  list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) /
    (sqrt(list_sum(list_transform(range(64), i -> x.v[i+1] * x.v[i+1]))) *
     sqrt(list_sum(list_transform(range(64), i -> y.v[i+1] * y.v[i+1])))) AS s
  FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id <> y.vec_id),
rk AS (SELECT vec_id, nbr_id,
  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, nbr_id) AS rank
  FROM pr),
kn AS (SELECT vec_id, nbr_id FROM rk WHERE rank <= 5),
mu AS (SELECT f.vec_id AS u, f.nbr_id AS v
  FROM kn f JOIN kn g ON f.vec_id = g.nbr_id AND f.nbr_id = g.vec_id
  WHERE f.vec_id < f.nbr_id),
und AS (SELECT u AS node FROM mu UNION ALL SELECT v AS node FROM mu),
dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY node),
ori AS (SELECT
  CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND mu.u < mu.v)
    THEN mu.u ELSE mu.v END AS s,
  CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND mu.u < mu.v)
    THEN mu.v ELSE mu.u END AS t,
  CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND mu.u < mu.v)
    THEN dv.deg ELSE du.deg END AS dt
  FROM mu JOIN dg du ON mu.u = du.node JOIN dg dv ON mu.v = dv.node),
tr AS (SELECT e1.s AS x, e1.t AS y, e2.t AS z
  FROM ori e1 JOIN ori e2 ON e1.s = e2.s
    AND (e1.dt < e2.dt OR (e1.dt = e2.dt AND e1.t < e2.t))
  JOIN ori e3 ON e3.s = e1.t AND e3.t = e2.t),
tc AS (SELECT node FROM (SELECT x AS node FROM tr
  UNION ALL SELECT y AS node FROM tr UNION ALL SELECT z AS node FROM tr)),
tn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM tc GROUP BY node)
SELECT ek.vec_id, CAST(coalesce(dg.deg, 0) AS BIGINT) AS deg,
  CAST(coalesce(tn.tri, 0) AS BIGINT) AS tri,
  CASE WHEN dg.deg >= 2
    THEN CAST(floor(2000000.0 * coalesce(tn.tri, 0) / (dg.deg * (dg.deg - 1)) + 0.5) AS BIGINT)
    ELSE CAST(0 AS BIGINT) END AS coef_q6
FROM ek LEFT JOIN dg ON ek.vec_id = dg.node
LEFT JOIN tn ON ek.vec_id = tn.node
ORDER BY ek.vec_id""",
    // ratio-margin bitext mining: cluster-blocked en x de candidates,
    // micro-quantized shifted cosine, exact integer neighborhood sums,
    // one identical margin division both engines
    "bitext_mine" ->
      s"""WITH
$kmeansCtes,
asg AS (SELECT a2.vec_id, a2.cluster, ek.v
  FROM a2 JOIN ek ON a2.vec_id = ek.vec_id WHERE a2.rn = 1),
al AS (SELECT asg.vec_id, asg.cluster, asg.v, d.lang
  FROM asg JOIN documents d ON asg.vec_id = d.doc_id),
px AS (SELECT vec_id AS src_id, cluster, v AS xv FROM al WHERE lang = 'en'),
py AS (SELECT vec_id AS tgt_id, cluster, v AS yv FROM al WHERE lang = 'de'),
pc AS (SELECT src_id, tgt_id,
  CAST(floor((list_sum(list_transform(range(64), i -> xv[i+1] * yv[i+1])) /
    (sqrt(list_sum(list_transform(range(64), i -> xv[i+1] * xv[i+1]))) *
     sqrt(list_sum(list_transform(range(64), i -> yv[i+1] * yv[i+1])))) + 1.0)
    * 1000000 + 0.5) AS BIGINT) AS sq6
  FROM px JOIN py ON px.cluster = py.cluster),
fx AS (SELECT src_id, sum(sq6) AS sx, count(*) AS nx FROM
  (SELECT src_id, sq6,
     row_number() OVER (PARTITION BY src_id ORDER BY sq6 DESC, tgt_id) AS rn
   FROM pc) WHERE rn <= 4 GROUP BY src_id),
fy AS (SELECT tgt_id, sum(sq6) AS sy, count(*) AS ny FROM
  (SELECT tgt_id, sq6,
     row_number() OVER (PARTITION BY tgt_id ORDER BY sq6 DESC, src_id) AS rn
   FROM pc) WHERE rn <= 4 GROUP BY tgt_id),
sc AS (SELECT pc.src_id, pc.tgt_id, pc.sq6,
  CAST(floor(2000000.0 * pc.sq6 * fx.nx * fy.ny
    / greatest(fx.sx * fy.ny + fy.sy * fx.nx, 1) + 0.5) AS BIGINT) AS margin_q6
  FROM pc JOIN fx USING (src_id) JOIN fy USING (tgt_id)),
bs AS (SELECT src_id, tgt_id, sq6, margin_q6,
  row_number() OVER (PARTITION BY src_id ORDER BY margin_q6 DESC, tgt_id) AS rn
  FROM sc)
SELECT src_id, tgt_id, sq6 AS sim_q6, margin_q6
FROM bs WHERE rn = 1 AND margin_q6 > 1000000 ORDER BY src_id""",
    // generated unrolled peeling rounds over the mutual kNN edges
    "knn_kcore" -> knnKcoreOracleSql,
    // generated unrolled farthest-point rounds, exact integer argmax
    "coreset_kcenter" -> coresetKcenterOracleSql,
    // generated label-spreading rounds, integer floor arithmetic
    "quality_propagate" -> qualityPropagateOracleSql,
    // both rankers' scoring CTEs + the same integer RBO weight literals
    "rbo_overlap" -> graft.operators.Retrieval.rboOverlapOracleSql,
    // same integer regression sums, same final double expressions
    "zipf_fit" -> TextPipeline.zipfFitOracleSql,
    // per-source mean-vector distance + norm audit, exact integer sums
    "emb_drift" -> SimilarityPipeline.embDriftOracleSql,
    // same unrolled 32-term Morton interleave, per-bucket boxes
    "zorder_stats" -> Relational.zorderStatsOracleSql,
    "semantic_dedup" ->
      s"""WITH
$kmeansCtes,
asg AS (SELECT a2.vec_id, a2.cluster, ek.v
  FROM a2 JOIN ek ON a2.vec_id = ek.vec_id WHERE a2.rn = 1),
dup AS (SELECT DISTINCT x.vec_id
  FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id > y.vec_id
  WHERE round(list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) /
    (sqrt(list_sum(list_transform(range(64), i -> x.v[i+1] * x.v[i+1]))) *
     sqrt(list_sum(list_transform(range(64), i -> y.v[i+1] * y.v[i+1])))), 4) >= 0.4)
SELECT asg.vec_id, asg.cluster,
  (dup.vec_id IS NOT NULL) AS is_dup,
  (dup.vec_id IS NULL) AS keep
FROM asg LEFT JOIN dup ON asg.vec_id = dup.vec_id
ORDER BY asg.vec_id""",
    // Recall grid: replay the full two-stage retrieval (label-IVF probe ->
    // normalized-int8 stage 1 -> exact rerank) per (nprobe, over_fetch)
    // cell and compare against brute-force top-10 per panel query
    "ann_recall_grid" ->
      """WITH e AS (SELECT vec_id, label,
  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
n AS (SELECT vec_id, label,
  list_transform(v, x -> x / (CASE WHEN sqrt(list_sum(list_transform(v, y -> y*y))) = 0 THEN 1.0
    ELSE sqrt(list_sum(list_transform(v, y -> y*y))) END)) AS u FROM e),
sq AS (SELECT vec_id, label, u,
  CASE WHEN list_max(list_transform(u, x -> abs(x))) = 0 THEN 0.0
    ELSE 127.0 / list_max(list_transform(u, x -> abs(x))) END AS sc FROM n),
qt AS (SELECT vec_id, label, list_transform(u, x -> floor(x * sc + 0.5)) AS qv FROM sq),
pan AS (SELECT vec_id AS qid, v AS q FROM e WHERE vec_id < 8),
pq8 AS (SELECT vec_id AS qid, qv AS qq FROM qt WHERE vec_id < 8),
ex0 AS (SELECT label, unnest(v) AS x, unnest(range(64)) AS pos FROM e),
cent AS (SELECT label, list(a ORDER BY pos) AS c
  FROM (SELECT label, pos, avg(x) AS a FROM ex0 GROUP BY label, pos) GROUP BY label),
cr AS (SELECT qid, label, row_number() OVER (PARTITION BY qid
    ORDER BY (list_sum(list_transform(range(64), i -> c[i+1] * q[i+1])) / (sqrt(list_sum(list_transform(range(64), i -> c[i+1] * c[i+1]))) * sqrt(list_sum(list_transform(range(64), i -> q[i+1] * q[i+1]))))) DESC, label) AS crank
  FROM cent, pan),
pm AS (SELECT cr.qid, cr.label, cr.crank, pq8.qq
  FROM cr JOIN pq8 ON cr.qid = pq8.qid WHERE crank <= 4),
s1 AS (SELECT pm.qid, pm.crank, qt.vec_id,
  CAST(list_sum(list_transform(range(64), i -> qt.qv[i+1] * pm.qq[i+1])) AS BIGINT) AS q8_dot
  FROM qt JOIN pm ON qt.label = pm.label WHERE qt.vec_id <> pm.qid),
np AS (SELECT CAST(unnest([1,2,4]) AS BIGINT) AS nprobe),
ofs AS (SELECT CAST(unnest([1,2,4]) AS BIGINT) AS over_fetch),
s1r AS (SELECT np.nprobe, s1.qid, s1.vec_id,
  row_number() OVER (PARTITION BY np.nprobe, s1.qid ORDER BY s1.q8_dot DESC, s1.vec_id) AS s1rank
  FROM s1, np WHERE s1.crank <= np.nprobe),
surv AS (SELECT * FROM s1r WHERE s1rank <= 40),
sc2 AS (SELECT surv.nprobe, surv.qid, surv.vec_id, surv.s1rank,
  (list_sum(list_transform(range(64), i -> e.v[i+1] * pan.q[i+1])) / (sqrt(list_sum(list_transform(range(64), i -> e.v[i+1] * e.v[i+1]))) * sqrt(list_sum(list_transform(range(64), i -> pan.q[i+1] * pan.q[i+1]))))) AS sim
  FROM surv JOIN e ON surv.vec_id = e.vec_id JOIN pan ON pan.qid = surv.qid),
r2 AS (SELECT ofs.over_fetch, sc2.nprobe, sc2.qid, sc2.vec_id,
  row_number() OVER (PARTITION BY sc2.nprobe, ofs.over_fetch, sc2.qid ORDER BY sim DESC, vec_id) AS rk
  FROM sc2, ofs WHERE sc2.s1rank <= ofs.over_fetch * 10),
retr AS (SELECT nprobe, over_fetch, qid, vec_id FROM r2 WHERE rk <= 10),
bt AS (SELECT pan.qid, e.vec_id, row_number() OVER (PARTITION BY pan.qid
    ORDER BY (list_sum(list_transform(range(64), i -> e.v[i+1] * pan.q[i+1])) / (sqrt(list_sum(list_transform(range(64), i -> e.v[i+1] * e.v[i+1]))) * sqrt(list_sum(list_transform(range(64), i -> pan.q[i+1] * pan.q[i+1]))))) DESC, e.vec_id) AS rk
  FROM e, pan WHERE e.vec_id <> pan.qid),
truth AS (SELECT qid, vec_id FROM bt WHERE rk <= 10),
hits AS (SELECT retr.nprobe, retr.over_fetch, retr.qid, count(*) AS h
  FROM retr JOIN truth ON retr.qid = truth.qid AND retr.vec_id = truth.vec_id
  GROUP BY 1, 2, 3),
cells AS (SELECT nprobe, over_fetch, qid FROM np, ofs, pan)
SELECT c.nprobe, c.over_fetch, CAST(count(*) AS BIGINT) AS n_queries,
  round(sum(COALESCE(h.h, 0)) / (count(*) * 10.0), 4) AS recall_avg,
  round(min(COALESCE(h.h, 0)) / 10.0, 4) AS recall_min
FROM cells c LEFT JOIN hits h ON c.nprobe = h.nprobe
  AND c.over_fetch = h.over_fetch AND c.qid = h.qid
GROUP BY c.nprobe, c.over_fetch
ORDER BY c.nprobe, c.over_fetch""",
    "emb_clusters" ->
      s"""WITH RECURSIVE
$hyperplanePairCtes,
pairs AS (SELECT vec_a, vec_b FROM v WHERE sim >= 0.4),
edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src),
lab AS (SELECT node AS vec_id, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT vec_id, cluster_id,
  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM lab ORDER BY vec_id""",
    "domain_cap" ->
      """WITH r AS (SELECT doc_id, source,
  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 30 ORDER BY source, rk""",
    "lang_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
  sum(pow(n_docs, 0.3)) AS z FROM c)
SELECT lang, n_docs,
  round(CAST(n_docs AS DOUBLE) / n_total, 6) AS doc_share,
  round(pow(n_docs, 0.3) / z, 6) AS weight,
  round((pow(n_docs, 0.3) / z) / (CAST(n_docs AS DOUBLE) / n_total), 4) AS boost
FROM c, t ORDER BY lang""",
    // temperature resampling APPLIED: per-lang first floor(w_l * n_total)
    // docs in seeded "tmp:" md5 order (weights unrounded, as the operator)
    "temperature_sample" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
nz AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total, sum(pow(n_docs, 0.3)) AS z FROM c),
tg AS (SELECT lang, CAST(floor(CAST(round(pow(n_docs, 0.3) / z, 6) AS DECIMAL(12,6)) * CAST(n_total AS DECIMAL(20,0))) AS BIGINT) AS target FROM c, nz),
b AS (SELECT doc_id, lang, md5('tmp:' || CAST(doc_id AS VARCHAR)) AS skey FROM documents),
r AS (SELECT doc_id, b.lang,
  CAST(row_number() OVER (PARTITION BY b.lang ORDER BY skey, doc_id) AS BIGINT) AS rk, target
  FROM b JOIN tg ON b.lang = tg.lang)
SELECT doc_id, lang, rk, target FROM r WHERE rk <= target ORDER BY lang, rk""",
    // A-ES weighted sampling replayed key-for-key: u rebuilt from the
    // first 8 md5 nibbles (exact in a double), key = pow(u, 1/w), global
    // per-lang rank — the Spark side's two-level top-k must select the
    // identical k per language
    "weighted_sample" ->
      """WITH b AS (SELECT doc_id, lang, CAST(greatest(n_chars, 1) AS DOUBLE) AS w,
  md5('ws:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
u AS (SELECT doc_id, lang, w,
  (CAST(strpos('0123456789abcdef', h[1:1]) - 1 AS DOUBLE) * 268435456
   + (strpos('0123456789abcdef', h[2:2]) - 1) * 16777216
   + (strpos('0123456789abcdef', h[3:3]) - 1) * 1048576
   + (strpos('0123456789abcdef', h[4:4]) - 1) * 65536
   + (strpos('0123456789abcdef', h[5:5]) - 1) * 4096
   + (strpos('0123456789abcdef', h[6:6]) - 1) * 256
   + (strpos('0123456789abcdef', h[7:7]) - 1) * 16
   + (strpos('0123456789abcdef', h[8:8]) - 1)) / 4294967296.0 AS uu
  FROM b),
r AS (SELECT doc_id, lang, pow(uu, 1.0 / w) AS es_key FROM u),
rr AS (SELECT doc_id, lang, es_key,
  row_number() OVER (PARTITION BY lang ORDER BY es_key DESC, doc_id) AS rk FROM r)
SELECT doc_id, lang, round(es_key, 6) AS es_key, CAST(rk AS BIGINT) AS rk
FROM rr WHERE rk <= 20 ORDER BY lang, rk""",
    // HLL sketch replayed register-for-register: md5 first byte ->
    // register, leading 1-bit position of the next 56 bits -> rho, exact
    // DECIMAL register sum, identical IEEE estimator expression
    "hll_distinct" ->
      s"""WITH $hllEstimateCtes,
ex AS (SELECT lang, CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct FROM t GROUP BY lang)
SELECT est.lang, CAST(present AS BIGINT) AS n_registers,
  round(est, 4) AS hll_distinct, exact_distinct,
  round(abs(est - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE), 4) AS rel_err
FROM est JOIN ex ON est.lang = ex.lang
ORDER BY est.lang""",
    // the merge-losslessness proof: Spark sketches doc_id-parity shards
    // separately and merges; the oracle sketches the whole corpus ONCE —
    // the hash can only match because register-wise max over shard
    // sketches IS the whole-corpus sketch
    // the merge-lossless proof: Spark merges per-source shard histograms,
    // the oracle histograms the whole corpus in ONE pass — the hash can
    // only match because summed shard bins equal whole-corpus bins
    "hist_quantiles" ->
      """WITH b AS (SELECT CAST(floor(n_chars / 64) AS BIGINT) AS bin,
  CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY 1),
c AS (SELECT bin, cnt,
  CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
  CAST(sum(cnt) OVER () AS BIGINT) AS total FROM b),
e AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p,
  bin, cnt, cum, total FROM c)
SELECT p, total AS n_total, bin,
  round(bin * 64 + 64.0 * (p * total - (cum - cnt)) / cnt, 4) AS est
FROM e WHERE cum >= p * total AND cum - cnt < p * total ORDER BY p""",
    "hll_union" ->
      s"""WITH $hllEstimateCtes
SELECT lang, CAST(present AS BIGINT) AS n_registers,
  round(est, 4) AS hll_distinct
FROM est ORDER BY lang""",
    // the CMS prefilter is answer-neutral (one-sided error): the oracle
    // is the PLAIN threshold filter, re-proving neutrality per run
    "heavy_hitters_cms" ->
      graft.operators.Sketches.heavyHittersCmsOracleSql,
    // count-min replayed cell-for-cell: row-seeded md5 ("i:" prefix),
    // first 3 hex chars mod 512 as the counter index, min over the 4
    // rows as the estimate for the exact-top-20 calibration tokens
    "cms_freq" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
t AS (SELECT token FROM tok WHERE length(token) > 0),
ii AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS v(i)),
hc AS (SELECT i, token,
  ((strpos('0123456789abcdef', h[1:1]) - 1) * 256
   + (strpos('0123456789abcdef', h[2:2]) - 1) * 16
   + (strpos('0123456789abcdef', h[3:3]) - 1)) % 512 AS cell
  FROM (SELECT i, token, md5(CAST(i AS VARCHAR) || ':' || token) AS h FROM t, ii) z),
sk AS (SELECT i, cell, CAST(count(*) AS BIGINT) AS cnt FROM hc GROUP BY i, cell),
ex AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_count FROM t
  GROUP BY token ORDER BY exact_count DESC, token LIMIT 20),
pr AS (SELECT token, exact_count, i,
  ((strpos('0123456789abcdef', h[1:1]) - 1) * 256
   + (strpos('0123456789abcdef', h[2:2]) - 1) * 16
   + (strpos('0123456789abcdef', h[3:3]) - 1)) % 512 AS cell
  FROM (SELECT token, exact_count, i, md5(CAST(i AS VARCHAR) || ':' || token) AS h FROM ex, ii) z),
est AS (SELECT token, exact_count, min(cnt) AS cms_est
  FROM pr JOIN sk USING (i, cell) GROUP BY token, exact_count)
SELECT token, exact_count, CAST(cms_est AS BIGINT) AS cms_est,
  CAST(cms_est - exact_count AS BIGINT) AS overcount
FROM est ORDER BY token""",
    // bottom-k replayed rank-for-rank: distinct md5s per language,
    // ascending order, est = (k-1)/u_k with u_k exact from 13 nibbles;
    // under k distinct values the sketch is the set and est is exact
    "kmv_distinct" ->
      s"""WITH $kmvSketchCtes,
per AS (SELECT lang, CAST(count(*) AS BIGINT) AS k_used,
  max(CASE WHEN rk = 64 THEN ${u13Sql("h")} END) AS u_k
  FROM sk GROUP BY lang),
ex AS (SELECT lang, CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct
  FROM tt GROUP BY lang),
est AS (SELECT lang, k_used,
  CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE) ELSE 63.0 / u_k END AS est
  FROM per)
SELECT est.lang, k_used, round(est, 4) AS kmv_distinct, exact_distinct,
  round(abs(est - CAST(exact_distinct AS DOUBLE))
    / CAST(exact_distinct AS DOUBLE), 4) AS rel_err
FROM est JOIN ex ON est.lang = ex.lang
ORDER BY est.lang""",
    // theta intersection replayed pair-for-pair: theta = u of the union
    // sketch's k-th smallest hash (1.0 when the union is under k),
    // common = hashes in both sketches below theta, est = common/theta
    "window_ntile" ->
      """SELECT event_id, event_type, value,
  CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS quartile
FROM events ORDER BY event_id""",
    // per-user lag sequence (ts, event_id total order) -> pair counts
    "event_transitions" ->
      """WITH s AS (SELECT user_id, ts, event_id, event_type,
  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_event
  FROM events),
m AS (SELECT from_event, event_type AS to_event, CAST(count(*) AS BIGINT) AS n
  FROM s WHERE from_event IS NOT NULL GROUP BY from_event, event_type)
SELECT from_event, to_event, n,
  floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_event)
    * 10000 + 0.5) / 10000 AS p
FROM m ORDER BY from_event, to_event""",
    // user-day dedup first, then the calendar-bounded range join
    "rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
days AS (SELECT DISTINCT d AS day FROM ud)
SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
FROM days JOIN ud ON ud.d <= days.day AND ud.d >= days.day - 6
GROUP BY day ORDER BY day""",
    // first-touch cohorts + distinct user-weeks, exact ints until the
    // final floor-quantized ratio
    "cohort_retention" ->
      """WITH f AS (SELECT user_id,
  CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
  FROM events GROUP BY user_id),
a AS (SELECT DISTINCT user_id,
  CAST(date_trunc('week', ts) AS TIMESTAMP) AS w FROM events),
o AS (SELECT cohort,
  CAST(datediff('day', CAST(cohort AS DATE), CAST(w AS DATE)) / 7 AS BIGINT) AS week_offset
  FROM a JOIN f ON a.user_id = f.user_id),
c AS (SELECT cohort, week_offset, CAST(count(*) AS BIGINT) AS n_active
  FROM o GROUP BY cohort, week_offset),
s AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY cohort)
SELECT c.cohort, week_offset, n_active, cohort_size,
  floor(CAST(n_active AS DOUBLE) / cohort_size * 10000 + 0.5) / 10000 AS retention
FROM c JOIN s ON c.cohort = s.cohort
ORDER BY c.cohort, week_offset""",
    // first-touch sequence match; conversion uses the explicit
    // floor-quantization so both engines round identically
    "event_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS vt FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e
  JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e
  JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY e.user_id),
n AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS nv,
  (SELECT CAST(count(*) AS BIGINT) FROM c) AS nc,
  (SELECT CAST(count(*) AS BIGINT) FROM p) AS np)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage, nv AS n_users,
    1.0 AS conv_rate FROM n
  UNION ALL
  SELECT 2, 'click_after_view', nc,
    CASE WHEN nv = 0 THEN 0.0
      ELSE floor(CAST(nc AS DOUBLE) / nv * 10000 + 0.5) / 10000 END FROM n
  UNION ALL
  SELECT 3, 'purchase_after_click', np,
    CASE WHEN nc = 0 THEN 0.0
      ELSE floor(CAST(np AS DOUBLE) / nc * 10000 + 0.5) / 10000 END FROM n)
ORDER BY stage_idx""",
    // change-row detection + interval stamping, all exact types
    "scd2_history" ->
      """WITH obs AS (SELECT o_custkey, o_orderdate, min(o_orderstatus) AS status
  FROM orders GROUP BY o_custkey, o_orderdate),
ch AS (SELECT o_custkey, o_orderdate, status,
  lag(status) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS prev
  FROM obs),
c2 AS (SELECT o_custkey, status, o_orderdate AS valid_from
  FROM ch WHERE prev IS NULL OR prev <> status)
SELECT o_custkey, status, valid_from,
  lead(valid_from) OVER w2 AS valid_to,
  CAST(row_number() OVER w2 AS BIGINT) AS version,
  lead(valid_from) OVER w2 IS NULL AS is_current
FROM c2 WINDOW w2 AS (PARTITION BY o_custkey ORDER BY valid_from)
ORDER BY o_custkey, valid_from""",
    // full-log recompute — the merge(history, delta) ≡ recompute proof
    "agg_incremental" -> Relational.aggIncrementalOracleSql,
    // all-integer sketch: signed cells, squared-row sums, middle-two
    // median — replayed cell-for-cell (the cms seeding idiom)
    "f2_moment" ->
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
tt AS (SELECT lang, token FROM tok WHERE length(token) > 0),
c0 AS (SELECT lang, token, unnest([0, 1, 2, 3]) AS r FROM tt),
ch AS (SELECT lang, r, md5(CAST(r AS VARCHAR) || ':' || token) AS h FROM c0),
cb AS (SELECT lang, r,
  CAST(((strpos('0123456789abcdef', h[1:1]) - 1) * 256
      + (strpos('0123456789abcdef', h[2:2]) - 1) * 16
      + (strpos('0123456789abcdef', h[3:3]) - 1)) % 512 AS BIGINT) AS bucket,
  CASE WHEN strpos('0123456789abcdef', h[4:4]) - 1 >= 8 THEN 1 ELSE -1 END AS sgn
  FROM ch),
cells AS (SELECT lang, r, bucket, CAST(sum(sgn) AS BIGINT) AS x
  FROM cb GROUP BY lang, r, bucket),
re AS (SELECT lang, r, CAST(sum(x * x) AS BIGINT) AS f2_row
  FROM cells GROUP BY lang, r),
rr AS (SELECT lang, f2_row,
  row_number() OVER (PARTITION BY lang ORDER BY f2_row) AS rn FROM re),
m AS (SELECT lang,
  CAST(sum(CASE WHEN rn IN (2, 3) THEN f2_row END) AS DOUBLE) / 2.0 AS f2_est
  FROM rr GROUP BY lang),
ex AS (SELECT lang, CAST(sum(c * c) AS BIGINT) AS f2_exact
  FROM (SELECT lang, token, count(*) AS c FROM tt GROUP BY lang, token)
  GROUP BY lang)
SELECT m.lang, f2_est, f2_exact,
  round(abs(f2_est - CAST(f2_exact AS DOUBLE)) / CAST(f2_exact AS DOUBLE), 4) AS rel_err
FROM m JOIN ex ON m.lang = ex.lang ORDER BY m.lang""",
    // the intersect CTEs + exists-anti survivor counts; every division
    // is an exact-count double over the same theta on both engines
    "kmv_difference" ->
      s"""WITH $kmvSketchCtes,
langs AS (SELECT DISTINCT lang FROM sk),
pairs AS (SELECT x.lang AS lang_a, y.lang AS lang_b
  FROM langs x JOIN langs y ON x.lang < y.lang),
un AS (SELECT DISTINCT lang_a, lang_b, h FROM (
  SELECT p.lang_a, p.lang_b, s.h FROM pairs p JOIN sk s ON s.lang = p.lang_a
  UNION ALL
  SELECT p.lang_a, p.lang_b, s.h FROM pairs p JOIN sk s ON s.lang = p.lang_b) z),
ur AS (SELECT lang_a, lang_b, h,
  row_number() OVER (PARTITION BY lang_a, lang_b ORDER BY h) AS rk FROM un),
th AS (SELECT lang_a, lang_b,
  coalesce(max(CASE WHEN rk = 64 THEN ${u13Sql("h")} END), 1.0) AS theta
  FROM ur GROUP BY lang_a, lang_b),
ao AS (SELECT p.lang_a, p.lang_b, s.h
  FROM pairs p JOIN sk s ON s.lang = p.lang_a
  WHERE NOT EXISTS (SELECT 1 FROM sk b WHERE b.lang = p.lang_b AND b.h = s.h)),
nao AS (SELECT ao.lang_a, ao.lang_b, CAST(count(*) AS BIGINT) AS n_a_only
  FROM ao JOIN th ON ao.lang_a = th.lang_a AND ao.lang_b = th.lang_b
  WHERE ${u13Sql("ao.h")} < th.theta GROUP BY ao.lang_a, ao.lang_b),
bo AS (SELECT p.lang_a, p.lang_b, s.h
  FROM pairs p JOIN sk s ON s.lang = p.lang_b
  WHERE NOT EXISTS (SELECT 1 FROM sk a WHERE a.lang = p.lang_a AND a.h = s.h)),
nbo AS (SELECT bo.lang_a, bo.lang_b, CAST(count(*) AS BIGINT) AS n_b_only
  FROM bo JOIN th ON bo.lang_a = th.lang_a AND bo.lang_b = th.lang_b
  WHERE ${u13Sql("bo.h")} < th.theta GROUP BY bo.lang_a, bo.lang_b),
dt AS (SELECT DISTINCT lang, token FROM tt),
exd AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd FROM dt GROUP BY lang),
ex AS (SELECT x.lang AS lang_a, y.lang AS lang_b,
  CAST(count(*) AS BIGINT) AS exact_intersect
  FROM dt x JOIN dt y ON x.token = y.token AND x.lang < y.lang
  GROUP BY x.lang, y.lang)
SELECT th.lang_a, th.lang_b,
  round(CAST(coalesce(n_a_only, 0) AS DOUBLE) / theta, 4) AS kmv_diff_ab,
  round(CAST(coalesce(n_b_only, 0) AS DOUBLE) / theta, 4) AS kmv_diff_ba,
  da.nd - coalesce(exact_intersect, 0) AS exact_diff_ab,
  db.nd - coalesce(exact_intersect, 0) AS exact_diff_ba
FROM th
LEFT JOIN nao ON th.lang_a = nao.lang_a AND th.lang_b = nao.lang_b
LEFT JOIN nbo ON th.lang_a = nbo.lang_a AND th.lang_b = nbo.lang_b
JOIN exd da ON da.lang = th.lang_a
JOIN exd db ON db.lang = th.lang_b
LEFT JOIN ex ON th.lang_a = ex.lang_a AND th.lang_b = ex.lang_b
ORDER BY th.lang_a, th.lang_b""",
    "kmv_intersect" ->
      s"""WITH $kmvSketchCtes,
langs AS (SELECT DISTINCT lang FROM sk),
pairs AS (SELECT x.lang AS lang_a, y.lang AS lang_b
  FROM langs x JOIN langs y ON x.lang < y.lang),
un AS (SELECT DISTINCT lang_a, lang_b, h FROM (
  SELECT p.lang_a, p.lang_b, s.h FROM pairs p JOIN sk s ON s.lang = p.lang_a
  UNION ALL
  SELECT p.lang_a, p.lang_b, s.h FROM pairs p JOIN sk s ON s.lang = p.lang_b) z),
ur AS (SELECT lang_a, lang_b, h,
  row_number() OVER (PARTITION BY lang_a, lang_b ORDER BY h) AS rk FROM un),
th AS (SELECT lang_a, lang_b,
  coalesce(max(CASE WHEN rk = 64 THEN ${u13Sql("h")} END), 1.0) AS theta
  FROM ur GROUP BY lang_a, lang_b),
cm AS (SELECT a.lang AS lang_a, b.lang AS lang_b, ${u13Sql("a.h")} AS u
  FROM sk a JOIN sk b ON a.h = b.h AND a.lang < b.lang),
nc AS (SELECT cm.lang_a, cm.lang_b, CAST(count(*) AS BIGINT) AS n_common
  FROM cm JOIN th ON cm.lang_a = th.lang_a AND cm.lang_b = th.lang_b
  WHERE cm.u < th.theta GROUP BY cm.lang_a, cm.lang_b),
est AS (SELECT th.lang_a, th.lang_b,
  round(CAST(coalesce(n_common, 0) AS DOUBLE) / theta, 4) AS kmv_intersect
  FROM th LEFT JOIN nc ON th.lang_a = nc.lang_a AND th.lang_b = nc.lang_b),
dt AS (SELECT DISTINCT lang, token FROM tt),
ex AS (SELECT x.lang AS lang_a, y.lang AS lang_b,
  CAST(count(*) AS BIGINT) AS exact_intersect
  FROM dt x JOIN dt y ON x.token = y.token AND x.lang < y.lang
  GROUP BY x.lang, y.lang)
SELECT est.lang_a, est.lang_b, kmv_intersect,
  coalesce(exact_intersect, 0) AS exact_intersect
FROM est LEFT JOIN ex ON est.lang_a = ex.lang_a AND est.lang_b = ex.lang_b
ORDER BY est.lang_a, est.lang_b""",
    // duplicated spans replayed island-for-island: identical shingle
    // hashes, starts, and lag-based merge on both engines
    "dup_spans" ->
      s"""WITH $dupSpanCtes
SELECT doc_id, span_start, span_end, span_end - span_start AS span_len
FROM sp ORDER BY doc_id, span_start""",
    // the whole curation chain replayed stage-for-stage, split buckets
    // from the split_train nibble arithmetic; quality leaves as the
    // scaled BIGINT quality_q4 — an all-integer/string surface (the
    // round-8 driver red survived even the quantized DOUBLE, while the
    // same scaled integer was digest-green in curation_cols)
    "curation_program" ->
      s"""WITH $curationCtes,
sp AS (SELECT *, CAST(list_sum(list_transform(range(4), dd ->
    CAST(strpos('0123456789abcdef', md5('split:' || CAST(doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-dd))))) % 100 AS BIGINT) AS bucket FROM f)
SELECT doc_id, source, lang, n_tokens,
  CAST(floor(quality * 10000 + 0.5) AS BIGINT) AS quality_q4,
  cap_rk, start_offset, bucket,
  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
    ELSE 'test' END AS split
FROM sp ORDER BY doc_id""",
    // per-doc lineage: first rejecting stage via presence left-joins on
    // the same stage CTEs (all-BIGINT/VARCHAR surface)
    "curation_trace" ->
      s"""WITH $curationCtes
SELECT q.doc_id, q.source, q.lang, q.n_tokens,
  CAST(floor(q.quality * 10000 + 0.5) AS BIGINT) AS quality_q4,
  CASE WHEN g.doc_id IS NULL THEN 'quality_gate'
    WHEN d.doc_id IS NULL THEN 'dedup_exact'
    WHEN c.doc_id IS NULL THEN 'domain_cap'
    WHEN f.doc_id IS NULL THEN 'token_budget'
    ELSE 'admitted' END AS outcome
FROM q LEFT JOIN g ON q.doc_id = g.doc_id
LEFT JOIN d ON q.doc_id = d.doc_id
LEFT JOIN c ON q.doc_id = c.doc_id
LEFT JOIN f ON q.doc_id = f.doc_id
ORDER BY q.doc_id""",
    // the delta-folded store answers the SAME oracle: append==recompute
    "curation_store_delta" ->
      s"""WITH $curationCtes,
sp AS (SELECT *, CAST(list_sum(list_transform(range(4), dd ->
    CAST(strpos('0123456789abcdef', md5('split:' || CAST(doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-dd))))) % 100 AS BIGINT) AS bucket FROM f)
SELECT doc_id, source, lang, n_tokens,
  CAST(floor(quality * 10000 + 0.5) AS BIGINT) AS quality_q4,
  cap_rk, start_offset, bucket,
  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
    ELSE 'test' END AS split
FROM sp ORDER BY doc_id""",
    // round-11 store round-trip: the persisted manifest must equal the
    // in-query program — byte-identical oracle by construction
    "curation_store" ->
      s"""WITH $curationCtes,
sp AS (SELECT *, CAST(list_sum(list_transform(range(4), dd ->
    CAST(strpos('0123456789abcdef', md5('split:' || CAST(doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-dd))))) % 100 AS BIGINT) AS bucket FROM f)
SELECT doc_id, source, lang, n_tokens,
  CAST(floor(quality * 10000 + 0.5) AS BIGINT) AS quality_q4,
  cap_rk, start_offset, bucket,
  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
    ELSE 'test' END AS split
FROM sp ORDER BY doc_id""",
    // round-11 interchange round trips: all three queries answer the
    // SAME profile over the original parquet — the round trip must be
    // invisible
    "jsonl_roundtrip" -> interchangeProfileSql,
    "csv_roundtrip" -> interchangeProfileSql,
    "orc_roundtrip" -> interchangeProfileSql,
    // round-11 time travel: the program at BOTH corpus states (first
    // half by the max/2 cut, then everything), diffed — added docs and
    // re-leveled-out docs between manifest v1 and v2
    "curation_diff" ->
      s"""WITH ${prefixedCurationCtes("v1_",
        "doc_id < (SELECT max(doc_id) // 2 FROM documents)")},
${prefixedCurationCtes("v2_", "")},
m1 AS (SELECT doc_id, source, lang, n_tokens FROM v1_f),
m2 AS (SELECT doc_id, source, lang, n_tokens FROM v2_f)
SELECT m2.doc_id, m2.source, m2.lang, m2.n_tokens, 'added' AS change
FROM m2 WHERE m2.doc_id NOT IN (SELECT doc_id FROM m1)
UNION ALL
SELECT m1.doc_id, m1.source, m1.lang, m1.n_tokens, 'removed' AS change
FROM m1 WHERE m1.doc_id NOT IN (SELECT doc_id FROM m2)
ORDER BY doc_id""",
    // round-11 forget path: the program over the corpus MINUS the
    // forgotten residue class — succession/re-rank/budget all implied by
    // re-running the same staged CTEs on the filtered base
    "curation_forget" ->
      s"""WITH ${curationCtes.replace("FROM documents)",
        "FROM documents WHERE doc_id % 13 <> 2)")},
sp AS (SELECT *, CAST(list_sum(list_transform(range(4), dd ->
    CAST(strpos('0123456789abcdef', md5('split:' || CAST(doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-dd))))) % 100 AS BIGINT) AS bucket FROM f)
SELECT doc_id, source, lang, n_tokens,
  CAST(floor(quality * 10000 + 0.5) AS BIGINT) AS quality_q4,
  cap_rk, start_offset, bucket,
  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
    ELSE 'test' END AS split
FROM sp ORDER BY doc_id""",
    // per-column in-engine digests of the exact curation_program output
    // (doubles rendered as scaled BIGINT; identical rendering in
    // ColumnDigest.digests on the Spark side)
    "curation_cols" ->
      graft.operators.ColumnDigest.oracleDigestSql(
        s"""WITH $curationCtes,
sp AS (SELECT *, CAST(list_sum(list_transform(range(4), dd ->
    CAST(strpos('0123456789abcdef', md5('split:' || CAST(doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)
      * (1::BIGINT << (4*(3-dd))))) % 100 AS BIGINT) AS bucket FROM f)
SELECT doc_id, source, lang, n_tokens,
  CAST(floor(quality * 10000 + 0.5) AS BIGINT) AS quality_q4,
  cap_rk, start_offset, bucket,
  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
    ELSE 'test' END AS split
FROM sp""",
        "doc_id",
        // tuple syntax (not ->): EntryContractSpec counts `"key" ->`
        // literals in this method's source to catch duplicate map keys
        Seq(
          ("doc_id", "CAST(doc_id AS VARCHAR)"),
          ("source", "source"),
          ("lang", "lang"),
          ("n_tokens", "CAST(n_tokens AS VARCHAR)"),
          ("quality_q4", "CAST(quality_q4 AS VARCHAR)"),
          ("cap_rk", "CAST(cap_rk AS VARCHAR)"),
          ("start_offset", "CAST(start_offset AS VARCHAR)"),
          ("bucket", "CAST(bucket AS VARCHAR)"),
          ("split", "split"))),
    "curation_funnel" ->
      s"""WITH $curationCtes
SELECT 1 AS stage_no, 'ingest' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM q
UNION ALL SELECT 2, 'gated', CAST(count(*) AS BIGINT),
  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM g
UNION ALL SELECT 3, 'deduped', CAST(count(*) AS BIGINT),
  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM d
UNION ALL SELECT 4, 'capped', CAST(count(*) AS BIGINT),
  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM c
UNION ALL SELECT 5, 'budgeted', CAST(count(*) AS BIGINT),
  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM f
ORDER BY stage_no""",
    // per-eval-doc shingle hit-rate against the distinct train-side
    // hash set — replayed hash-for-hash
    "overlap_report" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (SELECT doc_id, CAST(i AS BIGINT) AS start,
  md5(array_to_string(toks[i + 1:i + 8], ' ')) AS h
  FROM t, unnest(range(len(toks) - 8 + 1)) AS u(i) WHERE len(toks) >= 8),
tr AS (SELECT DISTINCT h FROM sh WHERE doc_id % 2 = 0),
hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit FROM sh
  WHERE doc_id % 2 = 1 AND h IN (SELECT h FROM tr) GROUP BY doc_id),
tot AS (SELECT doc_id, CAST(len(toks) - 7 AS BIGINT) AS n_grams FROM t
  WHERE doc_id % 2 = 1 AND len(toks) >= 8)
SELECT tot.doc_id, n_grams, coalesce(n_hit, 0) AS n_hit,
  round(CAST(coalesce(n_hit, 0) AS DOUBLE) / n_grams, 4) AS overlap_frac,
  CAST(coalesce(n_hit, 0) AS DOUBLE) / n_grams >= 0.2 AS contaminated
FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id
ORDER BY tot.doc_id""",
    // the span-removed corpus, digest-proven: kept tokens in position
    // order hashed with md5 — byte-equality of cleaned content without
    // shipping text
    "substring_dedup" ->
      s"""WITH $dupSpanCtes,
cov AS (SELECT doc_id, CAST(p AS BIGINT) AS pos
  FROM sp, unnest(range(span_start, span_end)) AS v(p)),
px AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i + 1] AS token
  FROM t, unnest(range(len(toks))) AS u2(i)),
kept AS (SELECT px.doc_id, px.pos, px.token FROM px
  LEFT JOIN cov ON px.doc_id = cov.doc_id AND px.pos = cov.pos
  WHERE cov.pos IS NULL),
ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
  md5(string_agg(token, ' ' ORDER BY pos)) AS kept_digest
  FROM kept GROUP BY doc_id),
nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
SELECT nt.doc_id, n_tokens, coalesce(n_kept, 0) AS n_kept,
  round(CAST(n_tokens - coalesce(n_kept, 0) AS DOUBLE) / n_tokens, 4) AS dup_frac,
  coalesce(kept_digest, md5('')) AS kept_digest
FROM nt LEFT JOIN ka ON nt.doc_id = ka.doc_id
ORDER BY nt.doc_id""",
    "boilerplate_ngrams" ->
      s"""WITH
$shingleSetCtes,
g AS (SELECT doc_id, unnest(s) AS gram FROM ss),
d AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS df FROM g),
a AS (SELECT doc_id, count(*) AS n_grams,
  CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
  FROM d GROUP BY doc_id)
SELECT doc_id, n_grams, n_common,
  round(CAST(n_common AS DOUBLE) / n_grams, 4) AS common_frac,
  CAST(n_common AS DOUBLE) / n_grams >= 0.5 AS is_boilerplate
FROM a ORDER BY doc_id""",
    "curriculum" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, round(
  least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.4
  + least(1.0, CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS DOUBLE) / len(toks) * 5.0) * 0.3
  + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.3, 4) AS quality
FROM w)
SELECT doc_id, quality,
  CAST(ntile(10) OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS shard
FROM s ORDER BY doc_id""",
    "token_budget_sample" ->
      """WITH b AS (SELECT doc_id, lang,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  md5('tb:' || CAST(doc_id AS VARCHAR)) AS skey FROM documents),
c AS (SELECT lang, doc_id, n_tokens,
  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY skey, doc_id) - n_tokens AS BIGINT) AS start_offset
  FROM b)
SELECT lang, doc_id, n_tokens, start_offset
FROM c WHERE start_offset < 2000 ORDER BY lang, start_offset, doc_id""",
    // PII scrub over deterministically-enriched text: email -> ip -> phone
    // replacement order, counts from the ORIGINAL text
    "pii_scrub" ->
      """WITH e AS (SELECT doc_id,
  'user' || CAST(doc_id AS VARCHAR) || '@example.com call 555-' ||
  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.' ||
  CAST(doc_id % 256 AS VARCHAR) || '.0.1 ' || text AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
    '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g'),
    '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS scrubbed,
  CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS BIGINT) AS n_ips,
  CAST(len(regexp_extract_all(text, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones
FROM e ORDER BY doc_id""",
    // Gopher-style repetition: duplicate-occurrence fractions by
    // sorted-adjacency (out-of-range list reads are NULL on both engines,
    // and NULL equality folds false in a filter/when)
    "rep_stats" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
  list_sort(toks) AS s1,
  list_sort(list_transform(range(len(toks) - 1),
    i -> toks[i+1] || ' ' || toks[i+2])) AS s2,
  list_sort(list_transform(range(len(toks) - 2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS s3
  FROM t),
d AS (SELECT doc_id, n_words,
  CASE WHEN len(s1) = 0 THEN 0.0 ELSE round(CAST(len(list_filter(range(len(s1)),
    i -> s1[i+1] = s1[i] OR s1[i+1] = s1[i+2])) AS DOUBLE) / len(s1), 4) END AS dup_word_frac,
  CASE WHEN len(s2) = 0 THEN 0.0 ELSE round(CAST(len(list_filter(range(len(s2)),
    i -> s2[i+1] = s2[i] OR s2[i+1] = s2[i+2])) AS DOUBLE) / len(s2), 4) END AS dup_2gram_frac,
  CASE WHEN len(s3) = 0 THEN 0.0 ELSE round(CAST(len(list_filter(range(len(s3)),
    i -> s3[i+1] = s3[i] OR s3[i+1] = s3[i+2])) AS DOUBLE) / len(s3), 4) END AS dup_3gram_frac
  FROM s)
SELECT doc_id, n_words, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
  (dup_word_frac > 0.6 OR dup_2gram_frac > 0.4 OR dup_3gram_frac > 0.3) AS is_repetitive
FROM d ORDER BY doc_id""",
    // frozen-tokenizer fertility/compression per language (same replay
    // chain as token_budget_bpe)
    // the bpeStats replay bucketed into the fertility distribution
    "bpe_coverage" ->
      s"""WITH
$bpeReplayCtes,
tok AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
j AS (SELECT t.lang,
  CASE WHEN e.n_sym = 1 THEN '1' WHEN e.n_sym = 2 THEN '2'
       WHEN e.n_sym = 3 THEN '3' ELSE '4+' END AS bucket
  FROM tok t JOIN nsym e USING (word) WHERE length(t.word) > 0),
m AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_words
  FROM j GROUP BY lang, bucket)
SELECT lang, bucket, n_words,
  floor(CAST(n_words AS DOUBLE) / sum(n_words) OVER (PARTITION BY lang)
    * 10000 + 0.5) / 10000 AS share
FROM m ORDER BY lang, bucket""",
    "bpe_stats" ->
      s"""WITH
$bpeReplayCtes,
tok AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT t.lang, count(*) AS n_words,
  CAST(sum(e.n_sym) AS BIGINT) AS n_tokens,
  CAST(sum(e.word_chars) AS BIGINT) AS n_chars,
  round(CAST(sum(e.n_sym) AS DOUBLE) / count(*), 4) AS tokens_per_word,
  round(CAST(sum(e.word_chars) AS DOUBLE) / sum(e.n_sym), 4) AS chars_per_token
FROM tok t JOIN nsym e USING (word) WHERE length(t.word) > 0
GROUP BY t.lang ORDER BY t.lang""",
    // replays the FROZEN 16-merge tokenizer (BpeTrainer.FrozenMerges):
    // each word's chars wrap as <c> symbols, the merge chain applies in
    // order via left-to-right non-overlapping replace (DuckDB replace and
    // the Spark fold share that rule), and n_sym = count of '<'
    "token_budget_bpe" ->
      s"""WITH
$bpeReplayCtes,
tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents),
cnt AS (SELECT t.doc_id, t.lang, CAST(sum(e.n_sym) AS BIGINT) AS n_tokens
  FROM tok t JOIN nsym e USING (word) WHERE length(t.word) > 0
  GROUP BY t.doc_id, t.lang),
b AS (SELECT doc_id, lang, n_tokens,
  md5('tb:' || CAST(doc_id AS VARCHAR)) AS skey FROM cnt),
c AS (SELECT lang, doc_id, n_tokens,
  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY skey, doc_id) - n_tokens AS BIGINT) AS start_offset
  FROM b)
SELECT lang, doc_id, n_tokens, start_offset
FROM c WHERE start_offset < 2000 ORDER BY lang, start_offset, doc_id""",
    // the frozen-unigram pricing replay + the same budget running sum
    // generated unrolled likelihood-merge replay (the bpe_merges pattern
    // with per-round MATERIALIZED unigram-count CTEs and the identical
    // IEEE score expression — see WordPieceTrainer.wordpieceOracleSql)
    "wordpiece_merges" ->
      graft.operators.WordPieceTrainer.wordpieceOracleSql(12),
    // frozen greedy-match replay (recursive single-path CTE over the
    // pinned piece VALUES literal) feeding the shared budget CTEs
    "token_budget_wordpiece" ->
      s"""WITH RECURSIVE
${graft.operators.WordPieceTrainer.frozenGreedyCtes},
tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents),
cnt AS (SELECT t.doc_id, t.lang, CAST(sum(e.n_symbols) AS BIGINT) AS n_tokens
  FROM tok t JOIN wpsym e USING (word) WHERE length(t.word) > 0
  GROUP BY t.doc_id, t.lang),
b AS (SELECT doc_id, lang, n_tokens,
  md5('tb:' || CAST(doc_id AS VARCHAR)) AS skey FROM cnt),
c AS (SELECT lang, doc_id, n_tokens,
  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY skey, doc_id) - n_tokens AS BIGINT) AS start_offset
  FROM b)
SELECT lang, doc_id, n_tokens, start_offset
FROM c WHERE start_offset < 2000 ORDER BY lang, start_offset, doc_id""",
    "token_budget_unigram" ->
      s"""WITH RECURSIVE
${graft.operators.UnigramTrainer.frozenReplayCtes},
tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents),
cnt AS (SELECT t.doc_id, t.lang, CAST(sum(e.n_symbols) AS BIGINT) AS n_tokens
  FROM tok t JOIN unsym e USING (word) WHERE length(t.word) > 0
  GROUP BY t.doc_id, t.lang),
b AS (SELECT doc_id, lang, n_tokens,
  md5('tb:' || CAST(doc_id AS VARCHAR)) AS skey FROM cnt),
c AS (SELECT lang, doc_id, n_tokens,
  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY skey, doc_id) - n_tokens AS BIGINT) AS start_offset
  FROM b)
SELECT lang, doc_id, n_tokens, start_offset
FROM c WHERE start_offset < 2000 ORDER BY lang, start_offset, doc_id""",
    // both frozen tokenizers replayed over distinct words: BPE recon =
    // the <sym> wrapping stripped; unigram recon = the chr(1)-joined
    // best path re-concatenated; unsegmentable = uw rows ubest lacks
    "tokenizer_roundtrip" ->
      s"""WITH RECURSIVE
${graft.operators.UnigramTrainer.frozenReplayCtes},
${graft.operators.WordPieceTrainer.frozenGreedyCtes},
$bpeReplayCtes,
brt AS (SELECT word, CASE WHEN replace(replace(s, '<', ''), '>', '') = word
    THEN 1 ELSE 0 END AS ok FROM enc),
urt AS (SELECT u.word,
    CASE WHEN b.segs IS NOT NULL THEN 1 ELSE 0 END AS priced,
    CASE WHEN b.segs IS NOT NULL AND replace(b.segs, chr(1), '') = u.word
      THEN 1 ELSE 0 END AS ok
  FROM uw u LEFT JOIN ubest b USING (word)),
wrt AS (SELECT u.word,
    CASE WHEN s.n_symbols IS NOT NULL THEN 1 ELSE 0 END AS priced
  FROM wpw u LEFT JOIN wpsym s USING (word))
SELECT 'bpe' AS tokenizer, CAST(count(*) AS BIGINT) AS n_words,
  CAST(count(*) AS BIGINT) AS n_priced,
  CAST(sum(ok) AS BIGINT) AS n_roundtrip,
  CAST(0 AS BIGINT) AS n_unsegmentable, '' AS first_unsegmentable
FROM brt
UNION ALL
SELECT 'unigram', CAST(count(*) AS BIGINT), CAST(sum(priced) AS BIGINT),
  CAST(sum(ok) AS BIGINT), CAST(count(*) - sum(priced) AS BIGINT),
  coalesce(min(CASE WHEN priced = 0 THEN word END), '')
FROM urt
UNION ALL
-- greedy matches are exact substrings, so a completed segmentation
-- concatenates back structurally: n_roundtrip = n_priced (the engine
-- MEASURES the reconstruction; the replay needs only completion)
SELECT 'wordpiece', CAST(count(*) AS BIGINT), CAST(sum(priced) AS BIGINT),
  CAST(sum(priced) AS BIGINT), CAST(count(*) - sum(priced) AS BIGINT),
  coalesce(min(CASE WHEN priced = 0 THEN word END), '')
FROM wrt
ORDER BY tokenizer""",
    // freq-weighted sums over the SAME frozen replays: BPE joins every
    // word (structural losslessness), unigram only priced words
    "tokenizer_fertility" ->
      s"""WITH RECURSIVE
${graft.operators.UnigramTrainer.frozenReplayCtes},
${graft.operators.WordPieceTrainer.frozenGreedyCtes},
$bpeReplayCtes,
ftok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
fwf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM ftok
  WHERE len(word) > 0 GROUP BY word),
fb AS (SELECT 'bpe' AS tokenizer,
  CAST(sum(freq) AS BIGINT) AS n_occurrences,
  CAST(sum(freq * n_sym) AS BIGINT) AS n_tokens,
  CAST(sum(freq * word_chars) AS BIGINT) AS n_chars
  FROM fwf JOIN nsym USING (word)),
fu AS (SELECT 'unigram' AS tokenizer,
  CAST(sum(freq) AS BIGINT) AS n_occurrences,
  CAST(sum(freq * n_symbols) AS BIGINT) AS n_tokens,
  CAST(sum(freq * len(word)) AS BIGINT) AS n_chars
  FROM fwf JOIN unsym USING (word)),
fw AS (SELECT 'wordpiece' AS tokenizer,
  CAST(sum(freq) AS BIGINT) AS n_occurrences,
  CAST(sum(freq * n_symbols) AS BIGINT) AS n_tokens,
  CAST(sum(freq * len(word)) AS BIGINT) AS n_chars
  FROM fwf JOIN wpsym USING (word))
SELECT * FROM fb UNION ALL SELECT * FROM fu
UNION ALL SELECT * FROM fw ORDER BY tokenizer""",
    "emb_quantize" ->
      """WITH a AS (SELECT vec_id,
  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
s AS (SELECT vec_id, v,
  CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 0.0
    ELSE 127.0 / list_max(list_transform(v, x -> abs(x))) END AS sc FROM a)
SELECT vec_id, unnest(range(64)) AS pos, round(sc, 6) AS scale,
  unnest(list_transform(v, x -> CAST(floor(x * sc + 0.5) AS BIGINT))) AS q_val
FROM s ORDER BY vec_id, pos""",
    "sim_topk_q8" ->
      """WITH a AS (SELECT vec_id, embedding,
  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
n AS (SELECT vec_id, embedding,
  list_transform(v, x -> x / (CASE WHEN sqrt(list_sum(list_transform(v, y -> y*y))) = 0 THEN 1.0
    ELSE sqrt(list_sum(list_transform(v, y -> y*y))) END)) AS u FROM a),
s AS (SELECT vec_id, embedding, u,
  CASE WHEN list_max(list_transform(u, x -> abs(x))) = 0 THEN 0.0
    ELSE 127.0 / list_max(list_transform(u, x -> abs(x))) END AS sc FROM n),
qt AS (SELECT vec_id, embedding,
  list_transform(u, x -> floor(x * sc + 0.5)) AS qv FROM s),
qq AS (SELECT qv AS qqv FROM qt WHERE vec_id = 0),
d AS (SELECT vec_id, embedding,
  CAST(list_sum(list_transform(range(64), i -> qv[i+1] * qqv[i+1])) AS BIGINT) AS q8_dot
  FROM qt, qq WHERE vec_id <> 0),
t AS (SELECT vec_id, embedding, q8_dot,
  row_number() OVER (ORDER BY q8_dot DESC, vec_id) AS q8_rank FROM d),
qe AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
r AS (SELECT vec_id, q8_dot,
  (list_sum(list_transform(range(64), i -> CAST(t.embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))) / (sqrt(list_sum(list_transform(range(64), i -> CAST(t.embedding[i+1] AS DOUBLE) * CAST(t.embedding[i+1] AS DOUBLE)))) * sqrt(list_sum(list_transform(range(64), i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))))) AS sim_raw
  FROM t, qe WHERE q8_rank <= 80),
f AS (SELECT vec_id, q8_dot, sim_raw,
  row_number() OVER (ORDER BY sim_raw DESC, vec_id) AS rank FROM r)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, q8_dot, round(sim_raw, 4) AS sim
FROM f WHERE rank <= 20 ORDER BY rank""",
    "lm_bigram" ->
      """WITH tp AS (SELECT doc_id,
  unnest(range(len(string_split(text, ' ')))) AS pos,
  unnest(string_split(text, ' ')) AS token FROM documents),
bg AS (SELECT doc_id, pos, token,
  lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM tp),
b2 AS (SELECT * FROM bg WHERE nxt IS NOT NULL),
f AS (SELECT doc_id, pos,
  count(*) OVER (PARTITION BY token, nxt) AS c_bg,
  count(*) OVER (PARTITION BY token) AS c_prefix FROM b2),
v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v_size FROM tp),
d AS (SELECT doc_id,
  list(ln((CAST(c_bg AS DOUBLE) + 1.0) /
    (CAST(c_prefix AS DOUBLE) + v_size)) ORDER BY pos) AS lps
  FROM f, v GROUP BY doc_id)
SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_bigrams,
  round(-list_sum(lps) / len(lps), 4) AS avg_nll,
  round(exp(-list_sum(lps) / len(lps)), 4) AS perplexity
FROM d ORDER BY doc_id""",
    "lm_trigram" ->
      """WITH tp AS (SELECT doc_id,
  unnest(range(len(string_split(text, ' ')))) AS pos,
  unnest(string_split(text, ' ')) AS w1 FROM documents),
tg AS (SELECT doc_id, pos, w1,
  lead(w1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
  lead(w1, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3 FROM tp),
t3 AS (SELECT * FROM tg WHERE w3 IS NOT NULL),
f AS (SELECT doc_id, pos,
  count(*) OVER (PARTITION BY w1, w2, w3) AS c_tri,
  count(*) OVER (PARTITION BY w1, w2) AS c_b12,
  count(*) OVER (PARTITION BY w2, w3) AS c_b23,
  count(*) OVER (PARTITION BY w2) AS c_b2,
  count(*) OVER (PARTITION BY w3) AS c_u3 FROM t3),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_tri FROM t3),
d AS (SELECT doc_id,
  list(ln(0.6 * CAST(c_tri AS DOUBLE) / CAST(c_b12 AS DOUBLE) +
    0.3 * CAST(c_b23 AS DOUBLE) / CAST(c_b2 AS DOUBLE) +
    0.1 * CAST(c_u3 AS DOUBLE) / CAST(n_tri AS DOUBLE)) ORDER BY pos) AS lps
  FROM f, n GROUP BY doc_id)
SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_trigrams,
  round(-list_sum(lps) / len(lps), 4) AS avg_nll,
  round(exp(-list_sum(lps) / len(lps)), 4) AS perplexity
FROM d ORDER BY doc_id""",
    "lm_kneser_ney" ->
      """WITH tp AS (SELECT doc_id,
  unnest(range(len(string_split(text, ' ')))) AS pos,
  unnest(string_split(text, ' ')) AS token FROM documents),
bg AS (SELECT doc_id, pos, token,
  lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM tp),
b2 AS (SELECT * FROM bg WHERE nxt IS NOT NULL),
f AS (SELECT doc_id, pos, token, nxt,
  count(*) OVER (PARTITION BY token, nxt) AS c_bg,
  count(*) OVER (PARTITION BY token) AS c_prefix FROM b2),
bt AS (SELECT DISTINCT token, nxt FROM b2),
n1f AS (SELECT token, CAST(count(*) AS BIGINT) AS n1_fwd FROM bt GROUP BY token),
n1b AS (SELECT nxt, CAST(count(*) AS BIGINT) AS n1_bwd FROM bt GROUP BY nxt),
ty AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bt),
d AS (SELECT doc_id,
  list(ln((CAST(c_bg AS DOUBLE) - 0.75) / CAST(c_prefix AS DOUBLE) +
    0.75 * CAST(n1_fwd AS DOUBLE) / CAST(c_prefix AS DOUBLE) *
    (CAST(n1_bwd AS DOUBLE) / CAST(n_types AS DOUBLE))) ORDER BY pos) AS lps
  FROM f JOIN n1f USING (token) JOIN n1b USING (nxt), ty GROUP BY doc_id)
SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_bigrams,
  round(-list_sum(lps) / len(lps), 4) AS avg_nll,
  round(exp(-list_sum(lps) / len(lps)), 4) AS perplexity
FROM d ORDER BY doc_id""",
    "inverted_index" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents),
tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM t GROUP BY term, doc_id),
p AS (SELECT term, CAST(doc_id % 8 AS INTEGER) AS shard,
  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tf) AS BIGINT) AS n_occ,
  array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids,
  array_to_string(list(tf ORDER BY doc_id), ',') AS tfs
  FROM tf GROUP BY term, doc_id % 8),
tot AS (SELECT term, CAST(sum(n_docs) AS BIGINT) AS df,
  CAST(sum(n_occ) AS BIGINT) AS cf FROM p GROUP BY term)
SELECT p.term, shard, df, cf, n_docs, doc_ids, tfs
FROM p JOIN tot ON p.term = tot.term WHERE df >= 20
ORDER BY p.term, shard""",
    "index_topk" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t
  WHERE term IN ('spark', 'join', 'window') GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM documents),
s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
  round(sum(CAST(tf AS DOUBLE) * ln(CAST(n_corpus AS DOUBLE) / df)), 4)
    AS score
  FROM tf JOIN df USING (term), n GROUP BY doc_id)
SELECT doc_id, n_terms_hit, score FROM s
ORDER BY score DESC, doc_id LIMIT 10""",
    // unigram freq rank (integer, monotone in lnp) picks the bottom 20%
    // per doc; micro-quantized lnp integer sums — order-invariant
    "mink_contamination" ->
      """WITH tp AS (SELECT doc_id,
  unnest(range(len(string_split(text, ' ')))) AS pos,
  unnest(string_split(text, ' ')) AS token FROM documents),
f AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY token) AS freq FROM tp),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tp),
r AS (SELECT doc_id,
  row_number() OVER (PARTITION BY doc_id ORDER BY freq, pos) AS rn,
  CAST(floor(ln(CAST(freq AS DOUBLE) / n_total) * 1000000 + 0.5) AS BIGINT)
    AS m
  FROM f, tot),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST((count(*) + 4) // 5 AS BIGINT) AS n_mink
  FROM r GROUP BY doc_id),
d AS (SELECT r.doc_id, n_tokens, n_mink, CAST(sum(m) AS BIGINT) AS s
  FROM r JOIN sz USING (doc_id) WHERE rn <= n_mink
  GROUP BY r.doc_id, n_tokens, n_mink)
SELECT doc_id, n_tokens, n_mink,
  floor((-(CAST(s AS DOUBLE) / 1000000) / n_mink) * 10000 + 0.5) / 10000
    AS mink_avg_nll
FROM d ORDER BY doc_id""",
    "pair_alignment" -> SimilarityPipeline.pairAlignmentOracleSql,
    "lm_perplexity" ->
      """WITH tp AS (SELECT doc_id,
  unnest(range(len(string_split(text, ' ')))) AS pos,
  unnest(string_split(text, ' ')) AS token FROM documents),
f AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY token) AS freq FROM tp),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tp),
d AS (SELECT doc_id,
  list(ln(CAST(freq AS DOUBLE) / n_total) ORDER BY pos) AS lps
  FROM f, tot GROUP BY doc_id)
SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_tokens,
  round(-list_sum(lps) / len(lps), 4) AS avg_nll,
  round(exp(-list_sum(lps) / len(lps)), 4) AS perplexity
FROM d ORDER BY doc_id""",
    // the lm_perplexity replay + a per-lang ntile(3) over the ROUNDED
    // perplexity with doc_id tie-break (total order both engines)
    "perplexity_gate" ->
      """WITH tp AS (SELECT doc_id,
  unnest(range(len(string_split(text, ' ')))) AS pos,
  unnest(string_split(text, ' ')) AS token FROM documents),
f AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY token) AS freq FROM tp),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tp),
d AS (SELECT doc_id, CAST(len(list(pos)) AS BIGINT) AS n_tokens,
  round(exp(-list_sum(list(ln(CAST(freq AS DOUBLE) / n_total) ORDER BY pos))
    / len(list(pos))), 4) AS perplexity
  FROM f, tot GROUP BY doc_id),
g AS (SELECT d.doc_id, doc.lang, d.n_tokens, d.perplexity,
  CAST(ntile(3) OVER (PARTITION BY doc.lang
    ORDER BY d.perplexity, d.doc_id) AS BIGINT) AS tercile
  FROM d JOIN documents doc ON d.doc_id = doc.doc_id)
SELECT doc_id, lang, n_tokens, perplexity,
  CASE WHEN tercile = 1 THEN 'head' WHEN tercile = 2 THEN 'middle'
    ELSE 'tail' END AS bucket
FROM g ORDER BY doc_id""",
    "data_profile" ->
      """WITH w AS (SELECT CAST(count(*) AS DOUBLE) AS rows_n,
  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS text_nulls,
  CAST(count(DISTINCT lang) AS DOUBLE) AS lang_distinct,
  CAST(count(DISTINCT source) AS DOUBLE) AS source_distinct,
  CAST(min(n_chars) AS DOUBLE) AS n_chars_min,
  CAST(max(n_chars) AS DOUBLE) AS n_chars_max,
  CAST(sum(n_chars) AS DOUBLE) / count(*) AS n_chars_mean,
  CAST(min(doc_id) AS DOUBLE) AS doc_id_min,
  CAST(max(doc_id) AS DOUBLE) AS doc_id_max FROM documents)
SELECT 'rows' AS "column", 'n' AS metric, round(rows_n, 4) AS value FROM w
UNION ALL SELECT 'text', 'nulls', round(text_nulls, 4) FROM w
UNION ALL SELECT 'lang', 'distinct', round(lang_distinct, 4) FROM w
UNION ALL SELECT 'source', 'distinct', round(source_distinct, 4) FROM w
UNION ALL SELECT 'n_chars', 'min', round(n_chars_min, 4) FROM w
UNION ALL SELECT 'n_chars', 'max', round(n_chars_max, 4) FROM w
UNION ALL SELECT 'n_chars', 'mean', round(n_chars_mean, 4) FROM w
UNION ALL SELECT 'doc_id', 'min', round(doc_id_min, 4) FROM w
UNION ALL SELECT 'doc_id', 'max', round(doc_id_max, 4) FROM w
ORDER BY "column", metric""",
    "quality_checks" ->
      """WITH w AS (SELECT
  CAST(sum(CASE WHEN text IS NULL OR len(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
  CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS dup_ids,
  CAST(sum(CASE WHEN lang NOT IN ('de','en','es','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
  CAST(sum(CASE WHEN n_chars < 0 OR n_chars > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS bad_len
  FROM documents)
SELECT 'bad_lang' AS "check", bad_lang = 0 AS passed, bad_lang AS observed FROM w
UNION ALL SELECT 'bad_len', bad_len = 0, bad_len FROM w
UNION ALL SELECT 'dup_ids', dup_ids = 0, dup_ids FROM w
UNION ALL SELECT 'empty_text', empty_text = 0, empty_text FROM w
ORDER BY "check"""",
    "dist_drift" ->
      """WITH a AS (SELECT lang, count(*) AS n_a FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
b AS (SELECT lang, count(*) AS n_b FROM documents WHERE doc_id % 2 = 1 GROUP BY lang),
j AS (SELECT coalesce(a.lang, b.lang) AS lang,
  CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
  CAST(coalesce(n_b, 0) AS BIGINT) AS n_b FROM a FULL JOIN b ON a.lang = b.lang),
s AS (SELECT lang, n_a, n_b,
  CAST(n_a AS DOUBLE) / sum(n_a) OVER () AS sa,
  CAST(n_b AS DOUBLE) / sum(n_b) OVER () AS sb FROM j)
SELECT lang, n_a, n_b, round(sa, 6) AS share_a, round(sb, 6) AS share_b,
  round((greatest(sa, 0.000001) - greatest(sb, 0.000001))
    * ln(greatest(sa, 0.000001) / greatest(sb, 0.000001)), 6) AS psi_term
FROM s ORDER BY lang""",
    // the dist_drift PSI formula over fixed-width length bins
    "hist_drift" ->
      """WITH a AS (SELECT CAST(floor(n_chars / 64) AS BIGINT) AS bin, count(*) AS n_a
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
b AS (SELECT CAST(floor(n_chars / 64) AS BIGINT) AS bin, count(*) AS n_b
  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
j AS (SELECT coalesce(a.bin, b.bin) AS bin,
  CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
  CAST(coalesce(n_b, 0) AS BIGINT) AS n_b FROM a FULL JOIN b ON a.bin = b.bin),
s AS (SELECT bin, n_a, n_b,
  CAST(n_a AS DOUBLE) / sum(n_a) OVER () AS sa,
  CAST(n_b AS DOUBLE) / sum(n_b) OVER () AS sb FROM j)
SELECT bin, n_a, n_b, round(sa, 6) AS share_a, round(sb, 6) AS share_b,
  round((greatest(sa, 0.000001) - greatest(sb, 0.000001))
    * ln(greatest(sa, 0.000001) / greatest(sb, 0.000001)), 6) AS psi_term
FROM s ORDER BY bin""",
    // one NOT-EXISTS count per FK relationship, all exact
    "ref_integrity" ->
      """WITH rel AS (
SELECT 'lineitem_orders' AS relationship,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL SELECT 'lineitem_part',
  (SELECT count(*) FROM lineitem),
  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL SELECT 'lineitem_supplier',
  (SELECT count(*) FROM lineitem),
  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
UNION ALL SELECT 'orders_customer',
  (SELECT count(*) FROM orders),
  (SELECT count(*) FROM orders o WHERE NOT EXISTS
    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL SELECT 'customer_nation',
  (SELECT count(*) FROM customer),
  (SELECT count(*) FROM customer c WHERE NOT EXISTS
    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
UNION ALL SELECT 'supplier_nation',
  (SELECT count(*) FROM supplier),
  (SELECT count(*) FROM supplier s WHERE NOT EXISTS
    (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
UNION ALL SELECT 'nation_region',
  (SELECT count(*) FROM nation),
  (SELECT count(*) FROM nation n WHERE NOT EXISTS
    (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)))
SELECT relationship, n_child, n_orphans, n_orphans = 0 AS passed
FROM rel ORDER BY relationship""",
    // QI equivalence classes with k / l and the release-threshold flags
    "k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
  CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
  CAST(count(*) AS BIGINT) AS k,
  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l,
  count(*) < 5 AS violates_k,
  count(DISTINCT c_mktsegment) < 2 AS violates_l
FROM customer GROUP BY 1, 2 ORDER BY nationkey, acctbal_band""",
    // the Gopher/MassiveText document-quality rule battery
    "gopher_rules" -> graft.operators.CorpusRules.gopherRulesOracleSql,
    "eval_alloc" -> graft.operators.CorpusRules.evalAllocOracleSql(),
    "eval_sample" -> graft.operators.CorpusRules.evalSampleOracleSql(),
    "layout_advisor" ->
      graft.operators.PlannerTelemetry.layoutAdvisorOracleSql(),
    // data-constrained repetition schedule (epoch multipliers per source)
    "data_epochs" -> graft.operators.CorpusRules.dataEpochsOracleSql(),
    // exact cross-source shingle-Jaccard overlap matrix
    "source_overlap" -> graft.operators.CorpusRules.sourceOverlapOracleSql,
    // the 16-hash MinHash sketch estimate of the same matrix + exact audit
    "source_overlap_sketch" ->
      graft.operators.CorpusRules.sourceOverlapSketchOracleSql,
    // exact integer water-filling token allocation under supply caps
    "budget_waterfill" ->
      graft.operators.CorpusRules.budgetWaterfillOracleSql(),
    // key-skew concentration per canonical shuffle axis
    "skew_report" ->
      graft.operators.PlannerTelemetry.skewReportOracleSql,
    // exact equi-join output cardinality from keyed counts
    "join_cardinality" ->
      graft.operators.PlannerTelemetry.joinCardinalityOracleSql,
    // the same integer rule ladder over the cardinality body
    "plan_advisor" ->
      graft.operators.PlannerTelemetry.planAdvisorOracleSql,
    // the text_lang_id panels aggregated into a confusion matrix
    "lang_confusion" ->
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, lang,
  len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht'))) AS s_de,
  len(list_filter(toks, t -> t IN ('the','a','of','and','is','not'))) AS s_en,
  len(list_filter(toks, t -> t IN ('el','la','los','de','y','es'))) AS s_es,
  len(list_filter(toks, t -> t IN ('le','les','des','et','est','ne'))) AS s_fr,
  len(list_filter(toks, t -> t IN ('de5','le5','shi4','bu4','wo3','ni3'))) AS s_zh
FROM w),
p AS (SELECT doc_id, lang,
  CASE WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
       WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
       WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
       WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
       ELSE 'zh' END AS lang_pred
FROM s),
m AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
  FROM p GROUP BY lang, lang_pred)
SELECT lang, lang_pred, n_docs,
  floor(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang)
    * 10000 + 0.5) / 10000 AS share
FROM m ORDER BY lang, lang_pred""",
    // the adaptive-baseline anomaly series: rolling mean/std from
    // DECIMAL-exact frame sums, float math on identical operands
    "metric_anomaly" ->
      """WITH m AS (SELECT event_type, date_trunc('minute', ts) AS minute,
  max(value) AS mx FROM events GROUP BY 1, 2),
w AS (SELECT event_type, minute, mx,
  sum(CAST(mx AS DECIMAL(18,6))) OVER fr AS s1,
  sum(CAST(mx AS DECIMAL(18,6)) * CAST(mx AS DECIMAL(18,6))) OVER fr AS s2,
  count(*) OVER fr AS n FROM m
  WINDOW fr AS (PARTITION BY event_type ORDER BY minute
    ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)),
z AS (SELECT event_type, minute, mx,
  CAST(s1 AS DOUBLE) / n AS mean,
  greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
    / (n - 1), 0.0) AS variance
  FROM w WHERE n >= 10)
SELECT event_type, minute, mx, round(mean, 6) AS baseline_mean,
  round(CASE WHEN sqrt(variance) > 0.0
    THEN (mx - mean) / sqrt(variance) ELSE 0.0 END, 6) AS z,
  abs(CASE WHEN sqrt(variance) > 0.0
    THEN (mx - mean) / sqrt(variance) ELSE 0.0 END) > 3.0 AS is_anomaly
FROM z ORDER BY event_type, minute""",
  )
}
