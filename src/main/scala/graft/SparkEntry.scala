package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see SURVEY.md §7 + TESTDATA.md.
  *
  * Every implemented operator from SURVEY.md §2 registers a named query
  * here; each SQL-expressible one carries a DuckDB oracle in [[oracleSql]]
  * with IDENTICAL column names and deterministic values (exact decimal
  * arithmetic surfaced as double, MD5-derived hashing so both engines
  * agree, doubles rounded to 6 dp where sub-ulp accumulation order could
  * differ). Operators themselves are sort-free; Verify applies the
  * canonical dump ordering.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * The reference's one real query shape: DISTINCT over two chained LEFT
    * equi-joins (`dag-knlp.py:65-80`) on the testdata analog. */
  def entry(spark: SparkSession): DataFrame =
    Relational.dimensionTable(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+§2.8 EXT). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference parity (SURVEY §2.4/§2.5/§2.3) —
    "q_dim_join_distinct" -> ((s, d) => Relational.dimensionTable(s, d)),
    "q_dim_sql"           -> ((s, d) => Relational.dimensionTableSql(s, d)),
    "q_count"             -> ((s, d) => Relational.rowCount(s, d)),
    "q_count_check"       -> ((s, d) => Relational.countCheck(s, d)),
    "q_top1_by_length"    -> ((s, d) => Relational.top1ByLength(s, d)),
    "q_length_check"      -> ((s, d) => Relational.lengthCheck(s, d)),
    // dbt-style expectations battery: PK/FK/domain/range, one row per check
    "q_expectations"      -> ((s, d) => Relational.expectations(s, d)),
    "q_distinct"          -> ((s, d) => Relational.distinctPairs(s, d)),
    "q_limit"             -> ((s, d) => Relational.limitRows(s, d)),
    "q_split_parse"       -> ((s, d) => Relational.splitParse(s, d)),
    // correlated scalar + EXISTS subqueries (Catalyst decorrelation)
    "q_correlated_subq"   -> ((s, d) => Relational.correlatedSubqueries(s, d)),
    // — the reference's whole pipeline (S1-S3, K1-K4, P1-P3, O4/O5) —
    "q_pipeline_dimension" -> ((s, d) => Pipeline.dimensionPipeline(s, d)),
    // CSV sink + declared-schema CSV source round-trip
    "q_csv_roundtrip"     -> ((s, d) => Pipeline.csvRoundTrip(s, d)),
    // ORC sink + self-describing ORC source round-trip
    "q_orc_roundtrip"     -> ((s, d) => Pipeline.orcRoundTrip(s, d)),
    // PERMISSIVE JSONL load with _corrupt_record quarantine counts
    "q_corrupt_load"      -> ((s, d) => Pipeline.corruptLoad(s, d)),
    // small-file compaction: fragmented dir -> size-targeted rewrite,
    // file counts + lossless content digest
    "q_compaction"        -> ((s, d) => Pipeline.compactRewrite(s, d)),
    // mergeSchema read over evolving parquet batches (NULL-padded union)
    "q_schema_evolution"  -> ((s, d) => Pipeline.schemaEvolutionRead(s, d)),
    // zstd + snappy parquet write/read losslessness (codec audit)
    "q_codec_roundtrip"   -> ((s, d) => Pipeline.codecRoundTrip(s, d)),
    // idempotent backfill: dynamic partition overwrite replaces ONE
    // hive partition, every other slice's files untouched
    "q_partition_overwrite" -> ((s, d) => Pipeline.partitionOverwrite(s, d)),
    // keyed delete list purges corpus AND cascades into the signature
    // store (broadcast anti/semi-joins; one-row audit couples both)
    "q_forget_purge"      -> ((s, d) => Curation.forgetPurge(s, d)),
    // per-language exact-quantile length thresholds via integer histogram
    "q_length_outliers"   -> ((s, d) => Curation.lengthOutliers(s, d)),
    // keyed MERGE/upsert corpus maintenance (full-outer + coalesce)
    "q_corpus_merge"      -> ((s, d) => Curation.corpusMerge(s, d)),
    // ordered CDC op-log apply: latest-op-wins via one max_by hash agg,
    // tombstones filtered after the aggregate
    "q_cdc_apply"         -> ((s, d) => Curation.cdcApply(s, d)),
    // safety blocklist quarantine: per-source block rates via one
    // codegen arrays_overlap predicate (no shuffle before the rollup)
    "q_blocklist"         -> ((s, d) => Curation.blocklistFilter(s, d)),
    // shuffle-free per-doc character entropy (HOF fold, no explode)
    "q_char_entropy"      -> ((s, d) => TextAnalysis.charEntropy(s, d)),
    // lang-ID audit: (declared x predicted) confusion cells
    "q_lang_confusion"    -> ((s, d) => TextAnalysis.langConfusion(s, d)),
    // BPE tokenizer-training step: best pair + greedy merge contraction,
    // vocabulary-bounded after the one word-count shuffle
    "q_bpe_step"          -> ((s, d) => TextAnalysis.bpeStep(s, d)),
    // the training LOOP: k sequential merge steps emitting the learned
    // merge table (each step one vocabulary-bounded job)
    "q_bpe_merges"        -> ((s, d) => TextAnalysis.bpeMerges(s, d)),
    // asymmetric doc-inside-doc detection via df-capped inverted index
    "q_containment_pairs" -> ((s, d) => Dedup.containmentPairs(s, d)),
    // immutable pre/post-merge snapshots (v= partition dirs) + per-version
    // digest profile: time-travel + reproducibility proof in one scan
    "q_snapshot_versions" -> ((s, d) => Curation.snapshotVersions(s, d)),
    // manifest-only diff of two snapshot versions (added/changed/unchanged)
    "q_snapshot_diff"     -> ((s, d) => Curation.snapshotDiff(s, d)),
    // two writers racing merges through the atomic-rename commit loop;
    // rebase makes the final state the serial composition (oracle-checked)
    "q_concurrent_commit" -> ((s, d) => Curation.concurrentCommit(s, d)),
    // per-column row/null/exact-distinct audit in one melted scan
    "q_column_profile"    -> ((s, d) => Analytics.columnProfile(s, d)),
    // persisted per-day HLL sketch store: distinct-users-ever answered by
    // an O(days) metadata merge; union-of-daily == direct-sketch pinned
    "q_hll_store"         -> ((s, d) => Analytics.hllSketchStore(s, d)),
    // HLL inclusion-exclusion audience overlap per event-type pair
    // (sketch-merge intersection next to the exact user-keyed join)
    "q_sketch_intersection" -> ((s, d) => Analytics.sketchIntersection(s, d)),
    // PSI distribution-drift monitor between corpus halves per event_type
    "q_dist_drift"        -> ((s, d) => Analytics.distributionDrift(s, d)),
    // runtime bloom-filter semi-join reduction: might_contain probe pushed
    // into the fact scan (plan verdict emitted as a column)
    "q_bloom_prune"       -> ((s, d) => Bucketing.bloomPrunedJoin(s, d)),
    // the merge against a doc_id-bucketed corpus: only the delta shuffles
    // (one Exchange, plan-asserted) — the 100 TB layout for upserts
    "q_corpus_merge_bucketed" -> ((s, d) => Curation.corpusMergeBucketed(s, d)),
    // — headline analytics [EXT] —
    "q_pricing_summary"   -> ((s, d) => Analytics.pricingSummary(s, d)),
    // — TPC-H-shaped decision-support suite [EXT] (TpchSuite.scala) —
    "q_shipping_priority" -> ((s, d) => TpchSuite.shippingPriority(s, d)),
    "q_order_priority_exists" -> ((s, d) => TpchSuite.orderPriorityExists(s, d)),
    "q_local_supplier_volume" -> ((s, d) => TpchSuite.localSupplierVolume(s, d)),
    "q_forecast_revenue"  -> ((s, d) => TpchSuite.forecastRevenue(s, d)),
    "q_nation_trade_volume" -> ((s, d) => TpchSuite.nationTradeVolume(s, d)),
    "q_market_share"      -> ((s, d) => TpchSuite.marketShare(s, d)),
    "q_returned_items"    -> ((s, d) => TpchSuite.returnedItems(s, d)),
    "q_cust_order_distribution" -> ((s, d) => TpchSuite.custOrderDistribution(s, d)),
    "q_promo_revenue"     -> ((s, d) => TpchSuite.promoRevenue(s, d)),
    "q_supplier_part_breadth" -> ((s, d) => TpchSuite.supplierPartBreadth(s, d)),
    "q_small_qty_revenue" -> ((s, d) => TpchSuite.smallQtyRevenue(s, d)),
    "q_large_volume_cust" -> ((s, d) => TpchSuite.largeVolumeCustomers(s, d)),
    "q_special_revenue"   -> ((s, d) => TpchSuite.specialRevenue(s, d)),
    "q_dormant_customers" -> ((s, d) => TpchSuite.dormantCustomers(s, d)),
    "q_late_priority"     -> ((s, d) => TpchSuite.latePriority(s, d)),
    "q_top_supplier"      -> ((s, d) => TpchSuite.topSupplier(s, d)),
    "q_waiting_suppliers" -> ((s, d) => TpchSuite.waitingSuppliers(s, d)),
    "q_revenue_by_segment"-> ((s, d) => Analytics.revenueBySegment(s, d)),
    "q_revenue_by_region" -> ((s, d) => Analytics.revenueByRegion(s, d)),
    // supply-side dim rollup (the supplier table's coverage row)
    "q_supplier_profile"  -> ((s, d) => Analytics.supplierProfile(s, d)),
    "q_lineitem_order_join" -> ((s, d) => Analytics.lineitemOrderJoin(s, d)),
    // full 5-table star join with fact-side pushdown (Catalyst ordering)
    "q_star_join"         -> ((s, d) => Analytics.starJoinRevenue(s, d)),
    // incremental view maintenance: base state + delta batch merge ==
    // full recompute (the oracle IS the recompute)
    "q_incremental_agg"   -> ((s, d) => Analytics.incrementalRevenue(s, d)),
    "q_bucketed_join"     -> ((s, d) => Bucketing.bucketedLineitemOrderJoin(s, d)),
    "q_cbo_star"          -> ((s, d) => Bucketing.cboStarJoin(s, d)),
    // SQL-statement maintenance verbs over the snapshot-versioned DSv2
    // catalog: MERGE INTO / UPDATE / DELETE FROM as spark.sql text, plus
    // VERSION AS OF reads of every historical version after the chain
    "q_sql_merge"         -> ((s, d) => SqlVerbs.sqlMergeResult(s, d)),
    "q_sql_time_travel"   -> ((s, d) => SqlVerbs.sqlTimeTravel(s, d)),
    "q_sql_expire"        -> ((s, d) => SqlVerbs.sqlExpire(s, d)),
    // OPTIMIZE via CALL system.compact: rows/content/time-travel all
    // preserved across the bin-pack REPLACE commit
    "q_sql_compact"       -> ((s, d) => SqlVerbs.sqlCompact(s, d)),
    // manifest data skipping: footer stats in the manifest prune the
    // file list at plan time; aggregate oracle pins losslessness
    "q_sql_skipping"      -> ((s, d) => SqlVerbs.sqlSkipping(s, d)),
    // clustering rewrite (compact sort_by): scattered manifest is
    // unprunable, the re-laid-out one plans a strict file subset
    "q_sql_cluster"       -> ((s, d) => SqlVerbs.sqlCluster(s, d)),
    // change data feed: the verb chain's row-level changes reconstructed
    // from the COW manifests at touched-file cost, vs a relational replay
    "q_sql_cdf"           -> ((s, d) => SqlVerbs.sqlCdf(s, d)),
    // write-audit-publish: curation staged on a zero-copy branch, audited
    // in isolation, fast-forward published; output is the published table
    "q_sql_wap"           -> ((s, d) => SqlVerbs.sqlWap(s, d)),
    // the WAP audit artifact: the branch's change feed from the fork,
    // materialized pre-publish ("what will this publish change?")
    "q_sql_wap_diff"      -> ((s, d) => SqlVerbs.sqlWapDiff(s, d)),
    // clustered-table DDL: PARTITIONED BY identity cols force a range
    // distribution + sort on every write; first scan prunes, no OPTIMIZE
    "q_sql_partitioned"   -> ((s, d) => SqlVerbs.sqlPartitioned(s, d)),
    "q_sql_spj"           -> ((s, d) => SqlVerbs.sqlSpj(s, d)),
    "q_sql_spj_agg"       -> ((s, d) => SqlVerbs.sqlSpjAgg(s, d)),
    "q_sql_mor_spj"       -> ((s, d) => SqlVerbs.sqlMorSpj(s, d)),
    "q_sql_spj_delta"     -> ((s, d) => SqlVerbs.sqlSpjDelta(s, d)),
    "q_sql_dpp"           -> ((s, d) => SqlVerbs.sqlDpp(s, d)),
    "q_sql_dpp_bucket"    -> ((s, d) => SqlVerbs.sqlDppBucket(s, d)),
    "q_sql_spj_lookup"    -> ((s, d) => SqlVerbs.sqlSpjLookup(s, d)),
    // aggregate pushdown: bare COUNT/MIN/MAX answered from manifest stats
    // (LocalTableScan, zero data files); LIMIT k plans a manifest prefix
    "q_sql_agg_pushdown"  -> ((s, d) => SqlVerbs.sqlAggPushdown(s, d)),
    "q_sql_limit_prune"   -> ((s, d) => SqlVerbs.sqlLimitPrune(s, d)),
    // ADD COLUMN ... DEFAULT as a metadata commit: old files serve the
    // default on read, zero backfill
    "q_sql_default"       -> ((s, d) => SqlVerbs.sqlDefault(s, d)),
    // nested struct fields evolve as metadata: ADD/RENAME of meta.* are
    // era commits, old files null-fill/resolve by nested field id
    "q_sql_nested"        -> ((s, d) => SqlVerbs.sqlNested(s, d)),
    "q_sql_rebase"        -> ((s, d) => SqlVerbs.sqlRebase(s, d)),
    "q_sql_mv_where"      -> ((s, d) => SqlVerbs.sqlMvWhere(s, d)),
    "q_sql_rename"        -> ((s, d) => SqlVerbs.sqlRename(s, d)),
    "q_sql_widen"         -> ((s, d) => SqlVerbs.sqlWiden(s, d)),
    "q_sql_rtas"          -> ((s, d) => SqlVerbs.sqlRtas(s, d)),
    // RESTORE as a new commit: rollback re-references v1's files under a
    // new version; the bad deploy stays time-travelable for forensics
    "q_sql_restore"       -> ((s, d) => SqlVerbs.sqlRestore(s, d)),
    // hidden partitioning: PARTITIONED BY (days(ts)) clusters writes on
    // the derived day (catalog FunctionCatalog resolves the transform);
    // a month window on raw ts prunes via ordinary footer stats
    "q_sql_days_table"    -> ((s, d) => SqlVerbs.sqlDaysTable(s, d)),
    // file-granular COW: a clustered-range UPDATE + one-row DELETE each
    // rewrite a strict subset of the manifest (inherited files pinned)
    "q_sql_cow_subset"    -> ((s, d) => SqlVerbs.sqlCowSubset(s, d)),
    // DESCRIBE HISTORY: the verb chain's commit log via CALL system.history
    "q_sql_history"       -> ((s, d) => SqlVerbs.sqlHistory(s, d)),
    // TRUNCATE TABLE as a metadata-only replace commit; pre-truncate
    // version stays readable (RESTORE-able), writes continue after
    "q_sql_truncate"      -> ((s, d) => SqlVerbs.sqlTruncate(s, d)),
    // metadata-only DELETE (SupportsDeleteV2): a stats-provable predicate
    // drops whole files in one manifest swap, zero data IO; an
    // unprovable one falls back to the COW rewrite (both pinned)
    "q_sql_metadata_delete" -> ((s, d) => SqlVerbs.sqlMetadataDelete(s, d)),
    // merge-on-read deletion vectors (SupportsDelta): the verb chain as
    // per-row deltas — tombstone blobs + appends, zero files rewritten
    // (manifest-diff pinned); content identical to the COW chain
    "q_sql_mor"           -> ((s, d) => SqlVerbs.sqlMor(s, d)),
    // parquet-native bloom filters on declared columns: point lookups on
    // a scattered table skip row groups the bloom proves value-free
    "q_sql_bloom"         -> ((s, d) => SqlVerbs.sqlBloom(s, d)),
    // z-order OPTIMIZE (CALL compact zorder_by): rank-bucketed Morton
    // layout; file-list skipping pinned on BOTH dimensions
    "q_sql_zorder"        -> ((s, d) => SqlVerbs.sqlZorder(s, d)),
    // snapshot tags: an immutable named version survives rolling
    // expire_versions; VERSION AS OF 'tag' reads the pinned snapshot
    "q_sql_tag"           -> ((s, d) => SqlVerbs.sqlTag(s, d)),
    // clustering evolution: set_clustering changes the write-path layout
    // for future writes only - no rewrite; skipping verdicts pre/post
    "q_sql_evolve"        -> ((s, d) => SqlVerbs.sqlEvolve(s, d)),
    // incrementally-maintained materialized view: CALL create_mv /
    // refresh_mv, affected-key recompute off the change feed (cost
    // proportional to churn; mode columns pin no full-recompute fallback)
    "q_sql_mv"            -> ((s, d) => SqlVerbs.sqlMv(s, d)),
    // persistent SQL views on the v2 catalog: CREATE VIEW / view-on-view
    // / SHOW VIEWS as statements (parser-intercepted DDL + rule-resolved
    // reads); metadata-only, always-current over the verb chain
    "q_sql_view"          -> ((s, d) => SqlVerbs.sqlView(s, d)),
    // CALL system.analyze + DSv2 column statistics: exact manifest
    // bounds/rows free, NDV persisted - join reorder on catalog tables
    // (CboCatalogSpec pins the dimension-first flip)
    "q_sql_analyze"       -> ((s, d) => SqlVerbs.sqlAnalyze(s, d)),
    "q_top_order_per_customer" -> ((s, d) => Analytics.topOrderPerCustomer(s, d)),
    // per-group top-3 via the custom typed Aggregator (bounded map-side
    // state; k values per partition-group cross the shuffle, no sort)
    "q_topk_aggregator"   -> ((s, d) => Analytics.topPricesPerCustomer(s, d)),
    "q_hourly_events"     -> ((s, d) => Analytics.hourlyEvents(s, d)),
    // calendar densification + LOCF carry over the filled axis
    "q_gap_fill"          -> ((s, d) => Analytics.gapFill(s, d)),
    // sliding-window COUNT DISTINCT via bounded contribution explode
    "q_rolling_dau"       -> ((s, d) => Analytics.rollingDau(s, d)),
    // RFM quintile scoring via broadcast percentile cuts (no ntile sort)
    "q_rfm_segments"      -> ((s, d) => Analytics.rfmSegments(s, d)),
    // native session_window gap sessions (batch twin of q_sessionize)
    "q_session_window"    -> ((s, d) => Analytics.sessionWindowAgg(s, d)),
    // hive-partitioned parquet layout + partition-pruned scan
    "q_partition_pruned"  -> ((s, d) => Bucketing.partitionPrunedEvents(s, d)),
    // Z-order (Morton) layout key: bit-interleaved (user, hour) so one
    // sort clusters BOTH dims for row-group min/max pruning
    "q_zorder_key"        -> ((s, d) => Bucketing.zorderKey(s, d)),
    // write-side z-order: range-partitioned z layout + pushed-down 2-D scan
    "q_zorder_scan"       -> ((s, d) => Bucketing.zorderScan(s, d)),
    // dynamic partition pruning: runtime dim predicate prunes fact
    // partition directories (dynamicpruning subquery, plan-asserted)
    "q_dpp_join"          -> ((s, d) => Bucketing.dppJoin(s, d)),
    // nested-column pruning: only the touched struct SUBFIELDS reach the
    // parquet reader (ReadSchema plan-asserted)
    "q_nested_prune"      -> ((s, d) => Bucketing.nestedPrunedScan(s, d)),
    // file-manifest data skipping over a date-range layout: per-file
    // min/max stats plan the file subset, window scan reads only those
    "q_manifest_prune"    -> ((s, d) => Bucketing.manifestPrunedScan(s, d)),
    // the layout property the manifest rests on, as a gate query: files
    // tile the date line without overlap, layout lossless
    "q_sorted_layout"     -> ((s, d) => Bucketing.sortedLayoutProof(s, d)),
    "q_events_by_type_salted" -> ((s, d) => Analytics.eventsByTypeSalted(s, d)),
    // manual salt-replicate JOIN (deterministic salt, dim replicated
    // x salts): the explicit hot-key spread when broadcast + AQE can't
    "q_salted_join"       -> ((s, d) => Analytics.saltedUserJoin(s, d)),
    // exact duplicated-PASSAGE spans: >=2-occurrence k-gram windows
    // merged per doc into maximal spans (substring-level dedup signal)
    "q_dup_spans"         -> ((s, d) => Curation.dupSpans(s, d)),
    // content-defined chunking (Rabin/FastCDC family): rolling-hash
    // boundaries + chunk-level corpus dedup census, shift-resistant
    "q_cdc_chunks"        -> ((s, d) => Curation.cdcChunks(s, d)),
    // winnowing (SIGMOD'03 / MOSS): per-window min-hash fingerprint
    // selection with bounded density + cross-document share census
    "q_winnowing"         -> ((s, d) => Curation.winnowing(s, d)),
    // MOSS pair mining from the winnowed sketch: df-capped fingerprint
    // join at ~2/(ww+1) density instead of the full inverted index
    "q_winnow_pairs"      -> ((s, d) => Curation.winnowPairs(s, d)),
    // per-dimension whitening/standardization stats over the embedding
    // matrix (exact-decimal moments; dimension-sized shuffle)
    "q_embed_dim_stats"   -> ((s, d) => Similarity.embedDimStats(s, d)),
    "q_revenue_rollup"    -> ((s, d) => Analytics.revenueRollup(s, d)),
    // regex field extraction (parser-family pattern arm)
    "q_regex_parse"       -> ((s, d) => Relational.regexParse(s, d)),
    // PIVOT crosstab with explicit pivot values (fixed schema, one pass)
    "q_revenue_pivot"     -> ((s, d) => Analytics.revenuePivot(s, d)),
    // ...and its inverse: UNPIVOT (stack) back to long form — the round
    // trip must land exactly on the plain GROUP BY
    "q_revenue_unpivot"   -> ((s, d) => Analytics.revenueUnpivot(s, d)),
    // LEFT SEMI join (the EXISTS shape; no left-side duplication)
    "q_semi_join"         -> ((s, d) => Analytics.customersWithOpenOrders(s, d)),
    // LEFT ANTI join (the NOT-EXISTS shape; selective build side)
    "q_anti_join"         -> ((s, d) => Relational.customersNoBigOrder(s, d)),
    "q_exact_distinct_count" -> ((s, d) => Analytics.exactDistinctCount(s, d)),
    "q_approx_distinct"   -> ((s, d) => Analytics.approxDistinct(s, d)),
    // exact percentiles (oracle arm) + GK-sketch approx (scale arm)
    "q_value_percentiles" -> ((s, d) => Analytics.valuePercentiles(s, d)),
    // trailing-hour RANGE-frame rolling aggregate per user
    "q_rolling_value"     -> ((s, d) => Analytics.rollingUserValue(s, d)),
    // first-active-day cohort x day-offset distinct-user retention
    "q_user_retention"    -> ((s, d) => Analytics.userRetention(s, d)),
    // from_json over the events.props JSON column (declared schema)
    "q_json_props"        -> ((s, d) => Analytics.jsonProps(s, d)),
    // FULL OUTER join of pre-aggregated order/event activity per customer
    "q_full_outer"        -> ((s, d) => Analytics.fullOuterActivity(s, d)),
    // INTERSECT / EXCEPT / UNION ALL over distinct user key sets
    "q_set_ops"           -> ((s, d) => Analytics.setOpsUsers(s, d)),
    // GROUPING SETS: by-region + by-segment + grand total in one pass
    "q_grouping_sets"     -> ((s, d) => Analytics.revenueGroupingSets(s, d)),
    // CUBE: all four (region x status) grouping combinations in one pass
    "q_revenue_cube"      -> ((s, d) => Analytics.revenueCube(s, d)),
    // lag() inter-event gaps per user (epoch-micros arithmetic)
    "q_event_gaps"        -> ((s, d) => Analytics.eventGaps(s, d)),
    // per-user ordered event paths (sequence-model feature assembly)
    "q_event_sequences"   -> ((s, d) => Analytics.eventSequences(s, d)),
    // corr/covar from exact decimal moment sums (bit-reproducible)
    "q_stats_corr"        -> ((s, d) => Analytics.statsCorr(s, d)),
    // decile segmentation via broadcast percentile cuts (no global window)
    "q_revenue_deciles"   -> ((s, d) => Analytics.revenueDeciles(s, d)),
    // — X7 as-of join —
    "q_events_asof"       -> ((s, d) => AsofJoin.eventOrderAsof(s, d)),
    // SCD-2 point-in-time lookup: validity-interval join against the
    // purchase-versioned dimension, LEFT semantics (version 0 = pre)
    "q_temporal_join"     -> ((s, d) => AsofJoin.temporalJoin(s, d)),
    // its streaming twin: stream-static join with the range residual,
    // shared join+agg code with the batch operator, same oracle
    "q_stream_temporal_join" -> ((s, d) =>
      graft.streaming.StreamingOps.streamTemporalJoinEndToEnd(s, d)),
    // — X4 text analysis over documents —
    "q_doc_stats"         -> ((s, d) => TextAnalysis.docStats(s, d)),
    "q_token_freq"        -> ((s, d) => TextAnalysis.tokenFreq(s, d)),
    "q_lang_profile"      -> ((s, d) => TextAnalysis.langProfile(s, d)),
    "q_doc_quality"       -> ((s, d) => TextAnalysis.docQuality(s, d)),
    // domain-level curation: per-source quality profile + block verdict
    "q_source_quality"    -> ((s, d) => TextAnalysis.sourceQuality(s, d)),
    "q_lang_id"           -> ((s, d) => TextAnalysis.langId(s, d)),
    "q_doc_fingerprint"   -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "q_script_profile"    -> ((s, d) => TextAnalysis.scriptProfile(s, d)),
    "q_token_counts"      -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    // Unicode NFC canonicalization (codegen'd custom expression; DuckDB's
    // own nfc_normalize as the independent-implementation oracle)
    "q_unicode_nfc"       -> ((s, d) => TextAnalysis.unicodeNfc(s, d)),
    // Gopher-style intra-doc repetition quality signal
    "q_repetition"        -> ((s, d) => TextAnalysis.repetitionScore(s, d)),
    // unigram cross-entropy quality score (perplexity proxy)
    "q_doc_logprob"       -> ((s, d) => TextAnalysis.docLogProb(s, d)),
    // interpolated bigram LM score (the next perplexity-proxy rung)
    "q_bigram_logprob"    -> ((s, d) => TextAnalysis.bigramLogProb(s, d)),
    // Kneser-Ney smoothed bigram LM (absolute discounting +
    // continuation-count backoff — the third perplexity-proxy rung)
    "q_kn_logprob"        -> ((s, d) => TextAnalysis.knLogProb(s, d)),
    // Okapi BM25 per-(doc, query-term) relevance scoring
    "q_bm25"              -> ((s, d) => TextAnalysis.bm25(s, d)),
    // TF-IDF top-k keyword extraction per document
    "q_keywords_tfidf"    -> ((s, d) => TextAnalysis.keywordsTfidf(s, d)),
    // sparse-vector cosine pairs over the df-capped TF-IDF space
    // (inverted-index self-join — token-space twin of embedding ANN)
    "q_tfidf_cosine"      -> ((s, d) => TextAnalysis.tfidfCosinePairs(s, d)),
    // count-min sketch heavy hitters (third sketch family next to
    // HLL++/GK); exact counts oracle-checked, sketch bound self-verified
    "q_cms_heavy_hitters" -> ((s, d) => TextAnalysis.cmsTokenCounts(s, d)),
    // per-micro-batch CMS sketches merged counter-wise (mergeability)
    "q_stream_cms"        -> ((s, d) =>
      graft.streaming.StreamingOps.streamCmsEndToEnd(s, d)),
    // inverted-index head: df + bounded posting heads via a custom
    // SmallestKLongs aggregator (map-side k-element state, no sort)
    "q_inverted_index"    -> ((s, d) => TextAnalysis.invertedIndex(s, d)),
    // PMI collocation mining (tokenizer-vocabulary promotion signal)
    "q_pmi_collocations"  -> ((s, d) => TextAnalysis.pmiCollocations(s, d)),
    // incremental inverted-index refresh under the merge delta: drop
    // touched postings, re-tokenize only the delta; digest == full rebuild
    "q_invindex_refresh"  -> ((s, d) => TextAnalysis.invindexRefresh(s, d)),
    // watermark late-data accounting: which late rows a watermarked
    // aggregation drops (window-end vs watermark rule pinned exactly)
    "q_stream_late_audit" -> ((s, d) => graft.streaming.StreamingOps.streamLateAuditEndToEnd(s, d)),
    // model-based filter scoring: frozen hashed linear weights, sigmoid
    // keep verdict; zero-shuffle integer fold per document
    "q_quality_classifier"-> ((s, d) => TextAnalysis.qualityClassifier(s, d)),
    // crawl-overlap audit: exact cross-half shingle Jaccard/containment
    "q_corpus_overlap"    -> ((s, d) => Dedup.corpusOverlap(s, d)),
    // — X1/X2 dedup —
    "q_dedup_exact"       -> ((s, d) => Dedup.exactDedup(s, d)),
    "q_minhash_signatures"-> ((s, d) => Dedup.minhashSignatures(s, d)),
    // index maintenance under merge: incremental store refresh digested
    // equal to the oracle's independent full re-sign of the merged corpus
    "q_sigstore_refresh"  -> ((s, d) => Dedup.sigstoreRefresh(s, d)),
    "q_dedup_near"        -> ((s, d) => Dedup.nearDupPairs(s, d)),
    // n-gram (bigram) Jaccard near-dup: same banded-LSH pipeline at the
    // k-gram operating point — 32 bands × 4 rows for usable recall at the
    // J≈0.9 threshold (bigram similarity is far more selective than
    // unigram: the sf0.01 corpus is bimodal, 25 pairs at J≥0.91 vs a
    // J≤0.13 background).
    "q_dedup_ngram"       -> ((s, d) => Dedup.nearDupPairs(s, d, threshold = 0.9,
                                estJaccard = 0.8, shingleK = 2, bands = 32, rowsPerBand = 4)),
    // incremental flow: new batch (top id decile) vs historical corpus
    "q_dedup_incremental" -> ((s, d) => Dedup.nearDupNewVsCorpus(s, d)),
    // pairs -> transitive clusters -> keeper per cluster (the dedup
    // story's last step; A~B, B~C dedup as one group without A~C)
    "q_dedup_clusters"    -> ((s, d) => Dedup.nearDupClusters(s, d)),
    // ...and the final artifact: the pruned corpus (keepers + unclustered)
    "q_dedup_pruned"      -> ((s, d) => Dedup.dedupedCorpus(s, d)),
    "q_simhash"           -> ((s, d) => Dedup.simhash(s, d)),
    // degree distribution of the near-dup pair graph (graph health check)
    "q_dedup_degree"      -> ((s, d) => Dedup.nearDupDegreeProfile(s, d)),
    // PageRank centrality over the near-dup graph (template-hub keeper
    // policy) in fixed-point BIGINT arithmetic (damping = 17/20, units of
    // 1e-15) so 3 Jacobi iterations oracle bit-exactly
    "q_pagerank"          -> ((s, d) => Dedup.nearDupPageRank(s, d)),
    // degree-ordered triangle count + closure ratio over the pair graph
    "q_triangle_count"    -> ((s, d) => Dedup.triangleCount(s, d)),
    // blocked fuzzy matching (entity resolution): Levenshtein within
    // nation-key blocks, never a corpus-wide cross join
    "q_fuzzy_match"       -> ((s, d) => Dedup.fuzzyNameMatch(s, d)),
    // quality-aware keeper per near-dup cluster (keep-the-longest argmax)
    "q_cluster_canonical" -> ((s, d) => Dedup.clusterCanonical(s, d)),
    // estimator calibration: MinHash-128 Jaccard estimate vs exact
    // Jaccard over the verified pair list (integer micro-unit banking)
    "q_minhash_error"     -> ((s, d) => Dedup.minhashErrorAudit(s, d)),
    // near-dup leakage across the 98/1/1 split + cluster-atomic repair
    "q_split_leakage"     -> ((s, d) => Dedup.splitLeakage(s, d)),
    // soft dedup: integer ppm down-weights (1/cluster_size) per doc
    "q_dedup_soft"        -> ((s, d) => Dedup.softDedupWeights(s, d)),
    // per-source MinHash-union sketch vs exact source-level Jaccard
    "q_source_overlap"    -> ((s, d) => Dedup.sourceOverlapSketch(s, d)),
    // — X3 similarity search —
    "q_topk_cosine"       -> ((s, d) => Similarity.topkCosine(s, d)),
    // metadata-filtered vector search: label predicate PRE-filters the
    // candidate set inside the join condition (dense in-filter ranks)
    "q_ann_filtered"      -> ((s, d) => Similarity.topkCosineFiltered(s, d)),
    "q_embed_near_dup"    -> ((s, d) => Similarity.embedNearDup(s, d)),
    "q_ann_lsh"           -> ((s, d) => Similarity.annLshRecall(s, d)),
    "q_ann_ivf"           -> ((s, d) => Similarity.annIvfRecall(s, d)),
    // IVF with 2 distributed Lloyd (k-means) refinement iterations
    "q_ann_ivf_kmeans"    -> ((s, d) => Similarity.annIvfRecall(s, d, lloydIters = 2)),
    // IVF emitting actual neighbor rows, hash-checked exactly (the oracle
    // rebuilds cells/probes/candidates from the same constants)
    "q_ann_topk"          -> ((s, d) => Similarity.annIvfTopk(s, d)),
    "q_quantize_int8"     -> ((s, d) => Similarity.quantizeInt8Stats(s, d)),
    // product quantization: 32x-compressed codes + ADC top-k, exact oracle
    "q_pq_adc"            -> ((s, d) => Similarity.pqAdcTopk(s, d)),
    // per-label centroid/compactness profile (class-conditional geometry)
    "q_label_centroids"   -> ((s, d) => Similarity.labelCentroids(s, d)),
    // SEMANTIC dedup: connected components over the embedding-cosine
    // near-dup graph (translations/paraphrases never collide in MinHash
    // space; their embeddings do)
    "q_semantic_dedup"    -> ((s, d) => Similarity.semanticDedupClusters(s, d)),
    // hybrid retrieval: reciprocal-rank fusion of dense cosine + token
    // Jaccard rankings (per-list top-20, fused top-10)
    "q_hybrid_rrf"        -> ((s, d) => Similarity.hybridRrf(s, d)),
    "q_rerank_ce"         -> ((s, d) => Similarity.rerankCrossEncoder(s, d)),
    "q_semantic_canonical" -> ((s, d) => Similarity.semanticCanonical(s, d)),
    "q_opq_audit"         -> ((s, d) => Similarity.opqRotationAudit(s, d)),
    "q_ivf_refresh"       -> ((s, d) => Similarity.ivfRefresh(s, d)),
    "q_embedding_quality" -> ((s, d) => Similarity.embeddingQuality(s, d)),
    // — training-data curation: deterministic sampling + token packing —
    "q_sample_hash"       -> ((s, d) => Curation.sampleByHash(s, d)),
    "q_sample_stratified" -> ((s, d) => Curation.stratifiedSample(s, d)),
    // temperature (alpha=0.5) source mixing: integer isqrt weights,
    // per-group targets, deterministic hash keep rule
    "q_sample_temperature" -> ((s, d) => Curation.temperatureSample(s, d)),
    // fixed-size deterministic uniform sample (TakeOrderedAndProject)
    "q_sample_fixed"      -> ((s, d) => Curation.sampleFixed(s, d)),
    // CCNet head/middle/tail LM-score tertiles (distributed rank, no
    // global window)
    "q_perplexity_buckets" -> ((s, d) => Curation.perplexityBuckets(s, d)),
    // greedy quality-per-token budget fill (distributed prefix sum)
    "q_token_budget"      -> ((s, d) => Curation.tokenBudgetSelect(s, d)),
    // deterministic 98/1/1 train/val/test manifest by source
    "q_split_assign"      -> ((s, d) => Curation.splitAssign(s, d)),
    // per-(source, lang) data card: docs/chars/tokens/share/exact-dup
    "q_data_card"         -> ((s, d) => Curation.dataCard(s, d)),
    // temperature-weighted per-source token allocation + epoch cap
    "q_mixture_epochs"    -> ((s, d) => Curation.mixtureEpochs(s, d)),
    // TTR quintiles crossed with near-dup membership (score calibration)
    "q_quality_calibration" -> ((s, d) => Curation.qualityCalibration(s, d)),
    // incremental data-card maintenance: card' = card - replaced + delta;
    // oracle recomputes from a full merge (incremental == recompute)
    "q_card_refresh"      -> ((s, d) => Curation.cardRefresh(s, d)),
    // first-order Markov transition matrix over user event sequences
    "q_event_transitions" -> ((s, d) => Analytics.eventTransitions(s, d)),
    // order-independent corpus content digest (dataset versioning)
    "q_corpus_fingerprint" -> ((s, d) => Curation.corpusFingerprint(s, d)),
    "q_token_pack"        -> ((s, d) => Curation.tokenPack(s, d)),
    // DSIR importance weights: hashed-bigram target-vs-raw log-ratio
    // score, broadcast lambda table, exact-decimal top-k selection
    "q_dsir_weights"      -> ((s, d) => Curation.dsirWeights(s, d)),
    // merge-on-read deletion vectors: immutable base + positional DV
    // sidecar, read = anti-join on (_metadata.file_path, row_index)
    "q_delete_vectors"    -> ((s, d) => Curation.deleteVectors(s, d)),
    // column-level security: salted pseudonym, banded lengths, preview
    "q_masked_view"       -> ((s, d) => Curation.maskedView(s, d)),
    // MOR compaction: apply DVs, rewrite live rows, digest-proved lossless
    "q_dv_compaction"     -> ((s, d) => Curation.dvCompaction(s, d)),
    // train/eval decontamination: benchmark 8-gram overlap, broadcast
    // semi-join shape (benchmark side is tiny at any corpus scale)
    "q_decontam"          -> ((s, d) => Curation.contamination(s, d)),
    // ...and the decontaminated training corpus (broadcast anti prune)
    "q_decontam_pruned"   -> ((s, d) => Curation.decontaminatedCorpus(s, d)),
    // top-V vocabulary + out-of-vocabulary occurrence rate
    "q_vocab_oov"         -> ((s, d) => Curation.vocabOov(s, d)),
    // the whole curation flow fused into one plan: quality filter ->
    // hash sample -> token packing (filters live inside the scan)
    "q_curation_pipeline" -> ((s, d) => Curation.curationPipeline(s, d)),
    // CAPSTONE record assembly: quality AND dedup-keeper AND decontam,
    // all stages fused into the corpus a training run actually reads
    "q_training_records"  -> ((s, d) => Curation.trainingRecords(s, d)),
    // boilerplate mining: k-grams shared by the most documents
    "q_common_ngrams"     -> ((s, d) => Curation.commonNgrams(s, d)),
    // PII scrub: plant deterministic email/phone/IP fixtures, redact
    // with codegen'd regex passes, audit counts + corpus digest
    "q_pii_redact"        -> ((s, d) => Curation.piiRedact(s, d)),
    // C4-style line-level exact dedup (first-occurrence keeps, corpus audit)
    "q_line_dedup"        -> ((s, d) => Curation.lineDedup(s, d)),
    // retrieval-prep sliding-window chunker (50-token windows, stride 25)
    "q_chunk_sliding"     -> ((s, d) => Curation.chunkSliding(s, d)),
    // ...and the per-doc boilerplate fraction against the mined set
    "q_boilerplate_score" -> ((s, d) => Curation.boilerplateScore(s, d)),
    // fixed-width value histogram per event type
    "q_value_histogram"   -> ((s, d) => Analytics.valueHistogram(s, d)),
    // day-of-week x hour activity heatmap (epoch-arithmetic dow)
    "q_dow_hour_profile"  -> ((s, d) => Analytics.dowHourProfile(s, d)),
    // ordered conversion funnel (view -> click -> purchase, stage-gated)
    "q_funnel"            -> ((s, d) => Analytics.funnelConversion(s, d)),
    // SCD-2 dimension history: versioned status validity intervals
    "q_scd2_history"      -> ((s, d) => Analytics.scd2History(s, d)),
    // ntile/percent_rank/cume_dist/lag/lead/first in ONE window pass
    "q_window_suite"      -> ((s, d) => Analytics.windowSuite(s, d)),
    // interval join done scale-right: day-binned equi-join + residue filter
    "q_attribution"       -> ((s, d) => Analytics.purchaseAttribution(s, d)),
    // — multimodal plumbing (real BMP/WAV container parse + quarantine) —
    "q_multimodal_meta"   -> ((s, d) => Multimodal.mediaMeta(s, d)),
    "q_audio_meta"        -> ((s, d) => Multimodal.audioMeta(s, d)),
    "q_media_quarantine"  -> ((s, d) => Multimodal.mediaQuarantine(s, d)),
    "q_frame_sample"      -> ((s, d) => Multimodal.sampleFrames(s, d)),
    // payload decode at the planned offsets: real sample values out of
    // the container bytes, oracle-recomputed from the builder's rule
    "q_frame_extract"     -> ((s, d) => Multimodal.frameExtract(s, d)),
    // resize plan: fit decoded dims into a 224-box, aspect preserved
    "q_media_resize"      -> ((s, d) => Multimodal.resizePlan(s, d)),
    // feature extraction after decode: bytes -> stub embedding through
    // the per-partition batch boundary, exactly oracle-checked
    "q_media_embed"       -> ((s, d) => Multimodal.mediaEmbed(s, d)),
    // perceptual dHash over the real pixel payload; banded hamming join
    // (4×16-bit bands, exact for hamming ≤ 3 by pigeonhole) vs an
    // all-pairs oracle proves the banding lossless
    "q_media_phash"       -> ((s, d) => Multimodal.perceptualHash(s, d)),
    "q_image_near_dup"    -> ((s, d) => Multimodal.imageNearDup(s, d)),
    // per-clip PCM energy features, Long-exact sum-of-squares
    "q_audio_stats"       -> ((s, d) => Multimodal.audioStats(s, d)),
    // exact set-similarity self-join via prefix filtering (AllPairs/
    // PPJoin): all Jaccard >= 0.9 pairs with zero misses, never
    // all-pairs; brute-force oracle proves the filter lossless
    "q_ppjoin"            -> ((s, d) => PrefixJoin.ppJoin(s, d)),
    // incremental arm: new-batch prefixes probe the corpus prefix index;
    // candidate work scales with the batch, never corpus squared
    "q_ppjoin_incremental"-> ((s, d) => PrefixJoin.ppJoinIncremental(s, d)),
    // connected components by alternating large-star/small-star edge
    // contraction (SoCC'14) — same clusters, same oracle as
    // q_dedup_clusters: two independent published CC algorithms agree
    "q_cc_star"           -> ((s, d) => Dedup.nearDupClustersStar(s, d)),
    // contrastive triplet mining: hardest same-label positive + hardest
    // different-label negative per anchor, margin = pos - neg
    "q_triplet_mining"    -> ((s, d) => Similarity.tripletMining(s, d)),
    // streaming multimodal: arriving images phash per row (narrow
    // build+decode+dHash kernel), stream-static banded hamming probe of
    // the corpus phash table; banding exact at hamming <= 3
    "q_stream_image_dedup"-> ((s, d) => graft.streaming.StreamingOps.streamImageDedupEndToEnd(s, d)),
    // audio fingerprint (segment-energy difference hash over real PCM)
    // + near-dup through the SAME banded hamming machinery as images
    "q_audio_fingerprint" -> ((s, d) => Multimodal.audioFingerprint(s, d)),
    "q_audio_near_dup"    -> ((s, d) => Multimodal.audioNearDup(s, d)),
    // multi-frame GVID video container: parse + per-frame phash + any-
    // frame banded near-dup (min qualifying frame-pair distance)
    "q_video_meta"        -> ((s, d) => Multimodal.videoMeta(s, d)),
    "q_video_frame_phash" -> ((s, d) => Multimodal.videoFramePHash(s, d)),
    "q_video_near_dup"    -> ((s, d) => Multimodal.videoNearDup(s, d)),
    "q_video_quarantine"  -> ((s, d) => Multimodal.videoQuarantine(s, d)),
    // cross-modal calibration: text vs image near-dup pair-set overlap
    "q_modality_agreement"-> ((s, d) => Multimodal.modalityAgreement(s, d)),
    // IR-metric evaluation of the deterministic IVF ANN arm vs exact
    // ground truth: per-query recall@10 / MRR@10 / nDCG@10, fully
    // oracle-reproduced (centroids, probes, ranking, metrics)
    "q_retrieval_eval"    -> ((s, d) => Similarity.retrievalEval(s, d)),
    // Zipf-law exponent over the top-100 token frequencies (corpus
    // health: natural text slopes near -1); TakeOrdered cut, OLS over
    // the fit panel only
    "q_zipf_fit"          -> ((s, d) => TextAnalysis.zipfFit(s, d)),
    // SentencePiece-style unigram-LM tokenizer step: Viterbi-best
    // segmentation per distinct word under micro-log integer scores
    // (oracle enumerates ALL segmentations — agreement proves the DP),
    // plus one EM count step over the best segmentations
    "q_unigram_lm"        -> ((s, d) => UnigramLM.viterbiSegment(s, d)),
    "q_unigram_em"        -> ((s, d) => UnigramLM.emStep(s, d)),
    // — Structured Streaming, end-to-end (file stream → watermarked
    //   window agg → foreachBatch sink), checked against the same oracle
    //   as its batch twin q_hourly_events —
    "q_stream_hourly_events" -> ((s, d) => graft.streaming.StreamingOps.hourlyCountsEndToEnd(s, d)),
    // Gap-sessionization replayed as a real stream (flatMapGroupsWithState
    // custom state), oracle-checked against a DuckDB window-gap query.
    "q_sessionize"        -> ((s, d) => graft.streaming.StreamingOps.sessionizeEndToEnd(s, d)),
    // Stateful streaming exact-dedup (X1's streaming twin): first-seen
    // fingerprints survive; the distinct-fp set is the deterministic part.
    "q_stream_dedup"      -> ((s, d) => graft.streaming.StreamingOps.streamDedupEndToEnd(s, d)),
    // running per-(source, lang) composition monitor; final state equals
    // the batch data card's count columns
    "q_stream_data_card"  -> ((s, d) => graft.streaming.StreamingOps.streamDataCardEndToEnd(s, d)),
    // The state-BOUNDED production variant: dropDuplicatesWithinWatermark
    // holds only the re-ingest window in the state store (bound asserted
    // in StreamingSpec); same distinct-fp result on a bounded replay.
    "q_stream_dedup_bounded" -> ((s, d) =>
      graft.streaming.StreamingOps.streamDedupBoundedEndToEnd(s, d)),
    // Stream-static enrichment: event stream joins the customer dim
    // (broadcast, re-planned per micro-batch), revenue per segment.
    "q_stream_enrich"     -> ((s, d) => graft.streaming.StreamingOps.streamEnrichEndToEnd(s, d)),
    // STREAMING upsert (q_corpus_merge's twin): the delta replayed as
    // micro-batches, each applied to the keyed corpus store with the
    // same full-outer delta-wins merge; oracle = the batch merge.
    "q_stream_upsert"     -> ((s, d) => graft.streaming.StreamingOps.streamUpsertEndToEnd(s, d)),
    // the op-LOG twin: versioned I/U/D micro-batches in shuffled order,
    // max-version state merge with retained tombstones -> batch fixpoint
    "q_stream_cdc"        -> ((s, d) => graft.streaming.StreamingOps.streamCdcEndToEnd(s, d)),
    // STREAMING near-dup: arriving documents scored against the static
    // corpus signature store — per-row narrow MinHash kernel, stream-
    // static bucket join, codegen'd agreement/Jaccard filters. Same
    // result set (and oracle) as the batch incremental flow.
    "q_stream_dedup_near" -> ((s, d) => graft.streaming.StreamingOps.streamNearDupEndToEnd(s, d)),
    // STREAM-STREAM watermarked interval self-join: each event matched to
    // same-user events in the preceding 30 min; oracle = the identical
    // batch interval join.
    "q_stream_stream_join" -> ((s, d) => graft.streaming.StreamingOps.streamStreamJoinEndToEnd(s, d)),
    // ...and its LEFT OUTER arm: watermark-gated null emission for events
    // with no prior same-user context
    "q_stream_stream_outer" -> ((s, d) => graft.streaming.StreamingOps.streamStreamLeftOuterEndToEnd(s, d)),
    // MULTI-STATEFUL pipeline: stream-stream join chained into a
    // windowed aggregation in ONE query (cross-operator watermark)
    "q_stream_join_agg"   -> ((s, d) => graft.streaming.StreamingOps.streamJoinAggEndToEnd(s, d)),
    // NATIVE streaming session windows (append mode): the batch session
    // list minus sessions the final watermark left open.
    "q_stream_session_window" -> ((s, d) => graft.streaming.StreamingOps.sessionWindowStreamEndToEnd(s, d)),
    // CHECKPOINT-RESTART recovery: a stopped aggregation resumed by a new
    // query instance — state + offsets recovered, phase-2 input pinned
    // incremental, final result equals the batch aggregate
    "q_stream_restart"    -> ((s, d) => graft.streaming.StreamingOps.streamRestartEndToEnd(s, d)),
    // exactly-once foreachBatch sink under simulated batch redelivery:
    // idempotent per-batchId overwrite, audit proves zero duplicates
    "q_stream_exactly_once" -> ((s, d) => graft.streaming.StreamingOps.streamExactlyOnceEndToEnd(s, d)),
    // exactly-once streaming ingest into the versioned catalog: the SINK
    // dedupes replayed epochs on (queryId, epochId) manifest commits
    "q_stream_catalog_sink" -> ((s, d) => graft.streaming.StreamingOps.streamCatalogSinkEndToEnd(s, d)),
    // the catalog table as a streaming SOURCE: snapshot + incremental
    // version tail, compaction invisible via dataChange=false
    "q_stream_catalog_source" -> ((s, d) => graft.streaming.StreamingOps.streamCatalogSourceEndToEnd(s, d)),
    // the change feed as a stream: row-level deltas per commit, COW
    // rewrites included, one micro-batch per version (.changes suffix)
    "q_stream_cdf_tail" -> ((s, d) => graft.streaming.StreamingOps.streamCdfTailEndToEnd(s, d)),
    // the full lakehouse loop: upstream table -> version-tail stream ->
    // per-batch MERGE maintains a downstream aggregate table
    "q_stream_derived_table" -> ((s, d) => graft.streaming.StreamingOps.streamDerivedTableEndToEnd(s, d)),
    // streaming CDC apply under merge-on-read: per-batch MERGE into a
    // corpus-sized mirror commits tombstone deltas, zero files rewritten
    "q_stream_mor_upsert" -> ((s, d) => graft.streaming.StreamingOps.streamMorUpsertEndToEnd(s, d)),
    // equality-delete twin: per-batch upsert cost ∝ the batch, ZERO
    // fact-file reads in the write job (insert files + one key tombstone)
    "q_stream_eq_upsert" -> ((s, d) => graft.streaming.StreamingOps.streamEqUpsertEndToEnd(s, d)),
    // online ANN serving: new vectors stream in, each answered with its
    // IVF top-k against the pinned old-corpus index
    "q_stream_ann"        -> ((s, d) => graft.streaming.StreamingOps.streamAnnEndToEnd(s, d)),
  )

  private val dimSql =
    """SELECT DISTINCT o_orderkey, c_name, n_name, o_orderstatus
       FROM orders
       LEFT JOIN customer ON o_custkey = c_custkey
       LEFT JOIN nation ON c_nationkey = n_nationkey
       ORDER BY o_orderkey, c_name, n_name, o_orderstatus"""

  /** DuckDB hex→int: value of the 8-hex-char column `h8` (for simhash). */
  private val hexToLong: String = (1 to 8)
    .map(i => s"(strpos('0123456789abcdef', substr(h8,$i,1))-1)*${1L << (4 * (8 - i))}")
    .mkString(" + ")

  /** DuckDB-runnable ANSI SQL oracles, same parquet tables, same column
    * names. Keys absent here get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_dim_join_distinct" -> dimSql,
    "q_dim_sql" -> dimSql,
    "q_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q_count_check" ->
      "SELECT count(*) AS cnt, count(*) >= 1 AS ok FROM customer",
    "q_top1_by_length" ->
      """SELECT c_mktsegment, length(c_mktsegment) AS len FROM customer
         ORDER BY len DESC, c_mktsegment ASC LIMIT 1""",
    "q_length_check" ->
      """SELECT max(length(o_orderpriority)) AS max_len,
                max(length(o_orderpriority)) <= 15 AS ok
         FROM orders""",
    "q_expectations" -> Relational.expectationsOracleSql,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 100""",
    "q_split_parse" ->
      """SELECT p_partkey,
                string_split(p_type, ' ')[1] AS head_field,
                coalesce(array_to_string(string_split(p_type, ' ')[2:], ' '), '') AS tail_field,
                len(string_split(p_type, ' ')) AS arity
         FROM part ORDER BY p_partkey""",
    // The pipeline parses raw text synthesized from orders/customer/
    // lineitem (Pipeline.scala stage 1); a correct parse round-trips, so
    // the oracle computes the dimension straight from the parquet sources.
    "q_pipeline_dimension" ->
      """SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS word_id,
                CAST(o_custkey AS VARCHAR) AS korean,
                l_returnflag AS japanese,
                c_mktsegment AS hanjya
         FROM orders
         LEFT JOIN lineitem ON o_orderkey = l_orderkey
         LEFT JOIN customer ON o_custkey = c_custkey
         ORDER BY CAST(word_id AS BIGINT), japanese NULLS FIRST""",
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_revenue_by_segment" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_revenue_by_region" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_lineitem_order_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // Bucketed co-located join must produce the same result as the
    // plain shuffled join.
    "q_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_top_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t
         WHERE rn = 1 ORDER BY o_custkey""",
    "q_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "q_gap_fill" -> Analytics.gapFillOracleSql,
    "q_rolling_dau" -> Analytics.rollingDauOracleSql(),
    "q_rfm_segments" -> Analytics.rfmSegmentsOracleSql,
    // The streaming path must equal its batch twin exactly.
    "q_stream_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "q_exact_distinct_count" ->
      "SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem",
    "q_value_percentiles" -> Analytics.valuePercentilesOracleSql,
    "q_json_props" -> Analytics.jsonPropsOracleSql,
    "q_full_outer" -> Analytics.fullOuterActivityOracleSql,
    "q_set_ops" -> Analytics.setOpsUsersOracleSql,
    "q_grouping_sets" -> Analytics.revenueGroupingSetsOracleSql,
    "q_revenue_cube" -> Analytics.revenueCubeOracleSql,
    "q_event_gaps" -> Analytics.eventGapsOracleSql,
    "q_event_sequences" -> Analytics.eventSequencesOracleSql(),
    "q_stats_corr" -> Analytics.statsCorrOracleSql,
    "q_revenue_deciles" -> Analytics.revenueDecilesOracleSql,
    "q_bm25" -> TextAnalysis.bm25OracleSql,
    "q_revenue_pivot" -> Analytics.revenuePivotOracleSql,
    "q_revenue_unpivot" -> Analytics.revenueUnpivotOracleSql,
    "q_semi_join" -> Analytics.customersWithOpenOrdersOracleSql,
    "q_rolling_value" -> Analytics.rollingUserValueOracleSql(),
    "q_session_window" -> Analytics.sessionWindowAggOracleSql(),
    "q_partition_pruned" -> Bucketing.partitionPrunedEventsOracleSql(),
    "q_dpp_join" -> Bucketing.dppJoinOracleSql,
    "q_nested_prune" -> Bucketing.nestedPrunedScanOracleSql,
    "q_regex_parse" -> Relational.regexParseOracleSql,
    "q_zorder_key" -> Bucketing.zorderKeyOracleSql(),
    "q_zorder_scan" -> Bucketing.zorderScanOracleSql(),
    "q_user_retention" -> Analytics.userRetentionOracleSql,
    // The salted two-phase aggregate must equal the naive GROUP BY.
    "q_events_by_type_salted" ->
      """SELECT event_type, count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_revenue_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    // Self-verifying HLL++: oracle checks the exact counts and asserts the
    // Spark-side 1%-rsd estimate landed within 5% (always true for HLL++).
    "q_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts_exact,
                count(DISTINCT l_orderkey) AS n_orders_exact,
                TRUE AS parts_ok, TRUE AS orders_ok
         FROM lineitem""",
    // As-of join, tie-break: latest o_orderdate, then highest o_orderkey.
    "q_events_asof" ->
      """SELECT event_id, user_id, last_orderkey FROM (
           SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey,
                  row_number() OVER (PARTITION BY e.event_id
                                     ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
           FROM events e
           LEFT JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
         WHERE rn = 1 ORDER BY event_id""",
    "q_temporal_join" -> AsofJoin.temporalJoinOracleSql,
    // stream twin shares the batch contract exactly
    "q_stream_temporal_join" -> AsofJoin.temporalJoinOracleSql,
    "q_doc_stats" ->
      """SELECT doc_id, lang, length(text) AS n_chars_calc,
                len(string_split(text, ' ')) AS n_tokens,
                len(list_distinct(string_split(text, ' '))) AS n_types,
                round(CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
                      / len(string_split(text, ' ')), 6) AS mean_token_len
         FROM documents ORDER BY doc_id""",
    "q_token_freq" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
         GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""",
    // NB: DuckDB bare integer sum() returns HUGEINT (INT128); the driver's
    // hash compare is type-sensitive, so every integer sum must be cast to
    // BIGINT to match Spark's LongType (VERDICT r3 #1/#2).
    "q_lang_profile" ->
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_doc_quality" ->
      """SELECT *, len_ok AND stopword_ratio <= 0.5 AND type_token_ratio >= 0.05 AS keep
         FROM (
           SELECT doc_id,
                  len(string_split(text, ' ')) AS n_tokens,
                  round(CAST(len(list_filter(string_split(text, ' '),
                        t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
                        / len(string_split(text, ' ')), 6) AS stopword_ratio,
                  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / len(string_split(text, ' ')), 6) AS type_token_ratio,
                  n_chars BETWEEN 50 AND 2000 AS len_ok
           FROM documents) t
         ORDER BY doc_id""",
    "q_lang_id" ->
      """SELECT doc_id, lang_declared, en_hits, es_hits, fr_hits,
                CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
                     WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
                     WHEN fr_hits > 0 THEN 'fr'
                     ELSE 'und' END AS lang_pred
         FROM (
           SELECT doc_id, lang AS lang_declared,
                  len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS en_hits,
                  len(list_filter(string_split(text, ' '), t -> t IN ('el', 'la', 'de', 'que'))) AS es_hits,
                  len(list_filter(string_split(text, ' '), t -> t IN ('le', 'la', 'et', 'les'))) AS fr_hits
           FROM documents) t
         ORDER BY doc_id""",
    "q_doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, substr(md5(text), 1, 16) AS fp64
         FROM documents ORDER BY doc_id""",
    "q_token_counts" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) AS n_ws_tokens,
                len(list_filter(string_split_regex(text, '[^a-z0-9]+'),
                    t -> length(t) > 0)) AS n_subword_tokens,
                round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 6) AS chars_per_token
         FROM documents ORDER BY doc_id""",
    // Mirrors ScriptClass exactly: same negated-class regexes (literal
    // \x{..} syntax is valid in both Java regex and RE2), same dominance
    // CASE ladder (hangul > hanja > latin > digit > other tie-break),
    // 'und' when nothing countable. other = total - all classes - space.
    "q_script_profile" -> {
      import graft.operators.TextAnalysis.{DigitRe, HangulRe, HanjaRe, LatinRe, SpaceRe}
      s"""WITH c AS (
           SELECT lang,
                  length(regexp_replace(text, '$HangulRe', '', 'g')) AS hc,
                  length(regexp_replace(text, '$HanjaRe', '', 'g')) AS jc,
                  length(regexp_replace(text, '$LatinRe', '', 'g')) AS lc,
                  length(regexp_replace(text, '$DigitRe', '', 'g')) AS dc,
                  length(text)
                    - length(regexp_replace(text, '$HangulRe', '', 'g'))
                    - length(regexp_replace(text, '$HanjaRe', '', 'g'))
                    - length(regexp_replace(text, '$LatinRe', '', 'g'))
                    - length(regexp_replace(text, '$DigitRe', '', 'g'))
                    - length(regexp_replace(text, '$SpaceRe', '', 'g')) AS oc
           FROM documents)
         SELECT lang,
                CASE WHEN hc=0 AND jc=0 AND lc=0 AND dc=0 AND oc=0 THEN 'und'
                     WHEN hc>=jc AND hc>=lc AND hc>=dc AND hc>=oc THEN 'hangul'
                     WHEN jc>=lc AND jc>=dc AND jc>=oc THEN 'hanja'
                     WHEN lc>=dc AND lc>=oc THEN 'latin'
                     WHEN dc>=oc THEN 'digit'
                     ELSE 'other' END AS script,
                count(*) AS n_docs,
                CAST(sum(hc) AS BIGINT) AS hangul_chars,
                CAST(sum(jc) AS BIGINT) AS hanja_chars,
                CAST(sum(lc) AS BIGINT) AS latin_chars,
                CAST(sum(dc) AS BIGINT) AS digit_chars
         FROM c GROUP BY lang, script ORDER BY lang, script"""
    },
    "q_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS doc_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY fp""",
    // MinHash-128 banded signatures: minhash_i = min over shingles of the
    // affine rehash (a_i*h+b_i) mod 2^31-1 of the shingle's 32-bit md5
    // prefix; band sig = md5 of its 16 row-minhashes (decimal-rendered)
    // joined by '|'. Generated from the operator's own constants.
    "q_minhash_signatures" -> Dedup.minhashSignaturesOracleSql,
    "q_sigstore_refresh" -> Dedup.sigstoreRefreshOracleSql,
    // Generated from the operator's own constants (band geometry, both
    // signature-agreement pre-filter thresholds) — see Dedup.nearDupOracleSql.
    "q_dedup_near" -> Dedup.nearDupOracleSql(),
    "q_dedup_ngram" -> Dedup.nearDupOracleSql(threshold = 0.9,
      estJaccard = 0.8, shingleK = 2, bands = 32, rowsPerBand = 4),
    "q_dedup_incremental" -> Dedup.nearDupNewVsCorpusOracleSql(),
    // The streaming flow must reproduce the batch incremental result.
    "q_stream_dedup_near" -> Dedup.nearDupNewVsCorpusOracleSql(),
    // Same pair CTEs + recursive transitive closure (min reachable id).
    "q_dedup_clusters" -> Dedup.nearDupClustersOracleSql(),
    "q_minhash_error" -> Dedup.minhashErrorAuditOracleSql(),
    "q_split_leakage" -> Dedup.splitLeakageOracleSql(),
    "q_dedup_soft" -> Dedup.softDedupWeightsOracleSql(),
    "q_source_overlap" -> Dedup.sourceOverlapSketchOracleSql(),
    "q_dedup_pruned" -> Dedup.dedupedCorpusOracleSql(),
    "q_fuzzy_match" -> Dedup.fuzzyNameMatchOracleSql(),
    "q_simhash" ->
      s"""SELECT doc_id,
                 CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
          FROM (
            SELECT doc_id, bit,
                   sum(CASE WHEN (hval >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
            FROM (SELECT doc_id, $hexToLong AS hval
                  FROM (SELECT doc_id, substr(md5(token), 1, 8) AS h8
                        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
                              FROM documents) tk) hh) hv
            CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) b
            GROUP BY doc_id, bit) bits
          GROUP BY doc_id ORDER BY doc_id""",
    "q_topk_cosine" ->
      """WITH n AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
           FROM embeddings)
         SELECT query_id, neighbor_id, "rank", round(sim_raw, 6) AS sim FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_dot_product(c.emb, q.emb) / (c.norm * q.norm) AS sim_raw,
                  row_number() OVER (PARTITION BY q.vec_id
                                     ORDER BY list_dot_product(c.emb, q.emb) / (c.norm * q.norm) DESC,
                                              c.vec_id ASC) AS "rank"
           FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id) t
         WHERE "rank" <= 5 ORDER BY query_id, "rank"""",
    "q_ann_filtered" -> Similarity.topkCosineFilteredOracleSql(),
    "q_embed_near_dup" -> Similarity.embedNearDupOracleSql(),
    // Shared pair CTEs + recursive transitive closure (min reachable id).
    "q_semantic_dedup" -> Similarity.semanticDedupOracleSql(),
    // Generated from the operator's own gap constant.
    "q_sessionize" -> graft.streaming.StreamingOps.sessionizeOracleSql(),
    // Generated from the operator's own window constant.
    "q_stream_stream_join" -> graft.streaming.StreamingOps.streamStreamJoinOracleSql(),
    "q_stream_stream_outer" -> graft.streaming.StreamingOps.streamStreamLeftOuterOracleSql(),
    "q_stream_join_agg" -> graft.streaming.StreamingOps.streamJoinAggOracleSql(),
    "q_stream_session_window" -> graft.streaming.StreamingOps.sessionWindowStreamOracleSql(),
    // The streaming dedup's surviving-fingerprint set is exactly DISTINCT.
    "q_stream_dedup" ->
      "SELECT DISTINCT md5(text) AS fp FROM documents ORDER BY fp",
    // Bounded-state variant: on a bounded replay every duplicate lands
    // inside the watermark window, so the output is the same DISTINCT set
    // (the state BOUND is the non-SQL-expressible part, spec-asserted).
    "q_stream_dedup_bounded" ->
      "SELECT DISTINCT md5(text) AS fp FROM documents ORDER BY fp",
    // The stream-static join must equal the plain batch join.
    "q_stream_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // Generated from the operators' own constants (pct / token budget).
    "q_sample_hash" -> Curation.sampleByHashOracleSql(),
    "q_sample_stratified" -> Curation.stratifiedSampleOracleSql(),
    "q_sample_temperature" -> Curation.temperatureSampleOracleSql(),
    "q_sample_fixed" -> Curation.sampleFixedOracleSql(),
    "q_perplexity_buckets" -> Curation.perplexityBucketsOracleSql,
    "q_token_budget" -> Curation.tokenBudgetSelectOracleSql,
    "q_split_assign" -> Curation.splitAssignOracleSql(),
    "q_data_card" -> Curation.dataCardOracleSql,
    "q_stream_data_card" ->
      """SELECT source, lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS n_chars,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_mixture_epochs" -> Curation.mixtureEpochsOracleSql(),
    "q_quality_calibration" -> Curation.qualityCalibrationOracleSql,
    "q_card_refresh" -> Curation.cardRefreshOracleSql,
    "q_event_transitions" -> Analytics.eventTransitionsOracleSql,
    "q_cluster_canonical" -> Dedup.clusterCanonicalOracleSql(),
    "q_corpus_fingerprint" -> Curation.corpusFingerprintOracleSql,
    "q_token_pack" -> Curation.tokenPackOracleSql(),
    "q_dsir_weights" -> Curation.dsirWeightsOracleSql(),
    "q_delete_vectors" -> Curation.deleteVectorsOracleSql,
    "q_dv_compaction" -> Curation.dvCompactionOracleSql,
    "q_masked_view" -> Curation.maskedViewOracleSql(),
    "q_decontam" -> Curation.contaminationOracleSql(),
    "q_decontam_pruned" -> Curation.decontaminatedCorpusOracleSql(),
    "q_vocab_oov" -> Curation.vocabOovOracleSql(),
    "q_curation_pipeline" -> Curation.curationPipelineOracleSql(),
    "q_training_records" -> Curation.trainingRecordsOracleSql(),
    "q_common_ngrams" -> Curation.commonNgramsOracleSql(),
    "q_boilerplate_score" -> Curation.boilerplateScoreOracleSql(),
    "q_value_histogram" -> Analytics.valueHistogramOracleSql(),
    "q_dow_hour_profile" -> Analytics.dowHourProfileOracleSql,
    "q_funnel" -> Analytics.funnelConversionOracleSql,
    "q_scd2_history" -> Analytics.scd2HistoryOracleSql,
    "q_window_suite" -> Analytics.windowSuiteOracleSql,
    "q_attribution" -> Analytics.purchaseAttributionOracleSql(),
    "q_correlated_subq" -> Relational.correlatedSubqueriesOracleSql,
    "q_csv_roundtrip" -> Pipeline.csvRoundTripOracleSql,
    "q_orc_roundtrip" -> Pipeline.orcRoundTripOracleSql,
    "q_corrupt_load" -> Pipeline.corruptLoadOracleSql,
    "q_compaction" -> Pipeline.compactRewriteOracleSql(),
    "q_schema_evolution" -> Pipeline.schemaEvolutionOracleSql,
    "q_codec_roundtrip" -> Pipeline.codecRoundTripOracleSql,
    "q_partition_overwrite" -> Pipeline.partitionOverwriteOracleSql(),
    "q_manifest_prune" -> Bucketing.manifestPrunedScanOracleSql(),
    "q_sorted_layout" -> Bucketing.sortedLayoutProofOracleSql,
    "q_anti_join" -> Relational.customersNoBigOrderOracleSql(),
    "q_forget_purge" -> Curation.forgetPurgeOracleSql,
    "q_length_outliers" -> Curation.lengthOutliersOracleSql(),
    "q_corpus_merge" -> Curation.corpusMergeOracleSql,
    "q_cdc_apply" -> Curation.cdcApplyOracleSql,
    // The out-of-order streaming replay must land on the batch apply.
    "q_stream_cdc" -> Curation.cdcApplyOracleSql,
    "q_blocklist" -> Curation.blocklistFilterOracleSql(),
    "q_char_entropy" -> TextAnalysis.charEntropyOracleSql,
    "q_lang_confusion" -> TextAnalysis.langConfusionOracleSql,
    "q_bpe_step" -> TextAnalysis.bpeStepOracleSql,
    "q_bpe_merges" -> TextAnalysis.bpeMergesOracleSql(),
    "q_containment_pairs" -> Dedup.containmentPairsOracleSql(),
    "q_snapshot_versions" -> Curation.snapshotVersionsOracleSql,
    "q_snapshot_diff" -> Curation.snapshotDiffOracleSql,
    "q_concurrent_commit" -> Curation.concurrentCommitOracleSql,
    "q_column_profile" -> Analytics.columnProfileOracleSql,
    "q_hll_store" -> Analytics.hllSketchStoreOracleSql,
    "q_sketch_intersection" -> Analytics.sketchIntersectionOracleSql,
    "q_dist_drift" -> Analytics.distributionDriftOracleSql(),
    "q_bloom_prune" -> Bucketing.bloomPrunedJoinOracleSql(),
    "q_cbo_star" -> Bucketing.cboStarJoinOracleSql,
    "q_sql_merge" -> SqlVerbs.sqlMergeOracleSql,
    "q_sql_time_travel" -> SqlVerbs.sqlTimeTravelOracleSql,
    "q_sql_expire" -> SqlVerbs.sqlExpireOracleSql,
    "q_sql_compact" -> SqlVerbs.sqlCompactOracleSql,
    "q_sql_skipping" -> SqlVerbs.sqlSkippingOracleSql,
    "q_sql_cluster" -> SqlVerbs.sqlClusterOracleSql,
    "q_sql_cdf" -> SqlVerbs.sqlCdfOracleSql,
    "q_sql_wap" -> SqlVerbs.sqlWapOracleSql,
    "q_sql_wap_diff" -> SqlVerbs.sqlWapDiffOracleSql,
    "q_sql_partitioned" -> SqlVerbs.sqlPartitionedOracleSql,
    "q_sql_spj" -> SqlVerbs.sqlSpjOracleSql,
    "q_sql_spj_agg" -> SqlVerbs.sqlSpjAggOracleSql,
    "q_sql_mor_spj" -> SqlVerbs.sqlMorSpjOracleSql,
    "q_sql_spj_delta" -> SqlVerbs.sqlSpjDeltaOracleSql,
    "q_sql_dpp" -> SqlVerbs.sqlDppOracleSql,
    "q_sql_dpp_bucket" -> SqlVerbs.sqlDppBucketOracleSql,
    "q_sql_spj_lookup" -> SqlVerbs.sqlSpjLookupOracleSql,
    "q_sql_agg_pushdown" -> SqlVerbs.sqlAggPushdownOracleSql,
    "q_sql_limit_prune" -> SqlVerbs.sqlLimitPruneOracleSql,
    "q_sql_default" -> SqlVerbs.sqlDefaultOracleSql,
    "q_sql_nested" -> SqlVerbs.sqlNestedOracleSql,
    "q_sql_rebase" -> SqlVerbs.sqlRebaseOracleSql,
    "q_sql_mv_where" -> SqlVerbs.sqlMvWhereOracleSql,
    "q_sql_rename" -> SqlVerbs.sqlRenameOracleSql,
    "q_sql_widen" -> SqlVerbs.sqlWidenOracleSql,
    "q_sql_rtas" -> SqlVerbs.sqlRtasOracleSql,
    "q_sql_restore" -> SqlVerbs.sqlRestoreOracleSql,
    "q_sql_days_table" -> SqlVerbs.sqlDaysTableOracleSql,
    "q_sql_cow_subset" -> SqlVerbs.sqlCowSubsetOracleSql,
    "q_sql_history" -> SqlVerbs.sqlHistoryOracleSql,
    "q_sql_truncate" -> SqlVerbs.sqlTruncateOracleSql,
    "q_sql_metadata_delete" -> SqlVerbs.sqlMetadataDeleteOracleSql,
    "q_sql_mor" -> SqlVerbs.sqlMorOracleSql,
    "q_sql_bloom" -> SqlVerbs.sqlBloomOracleSql,
    "q_sql_zorder" -> SqlVerbs.sqlZorderOracleSql,
    "q_sql_tag" -> SqlVerbs.sqlTagOracleSql,
    "q_sql_evolve" -> SqlVerbs.sqlEvolveOracleSql,
    "q_sql_mv" -> SqlVerbs.sqlMvOracleSql,
    "q_sql_view" -> SqlVerbs.sqlViewOracleSql,
    "q_sql_analyze" -> SqlVerbs.sqlAnalyzeOracleSql,
    "q_stream_catalog_sink" -> graft.streaming.StreamingOps.streamCatalogSinkOracleSql,
    "q_stream_catalog_source" -> graft.streaming.StreamingOps.streamCatalogSourceOracleSql,
    "q_stream_cdf_tail" -> graft.streaming.StreamingOps.streamCdfTailOracleSql,
    "q_stream_derived_table" -> graft.streaming.StreamingOps.streamDerivedTableOracleSql,
    "q_stream_mor_upsert" -> graft.streaming.StreamingOps.streamMorUpsertOracleSql,
    "q_stream_eq_upsert" -> graft.streaming.StreamingOps.streamEqUpsertOracleSql,
    "q_stream_restart" -> graft.streaming.StreamingOps.streamRestartOracleSql,
    "q_stream_exactly_once" -> graft.streaming.StreamingOps.streamExactlyOnceOracleSql,
    "q_stream_ann" -> graft.streaming.StreamingOps.streamAnnOracleSql(),
    // The bucketed-layout merge must equal the plain merge exactly.
    "q_corpus_merge_bucketed" -> Curation.corpusMergeOracleSql,
    // The micro-batched streaming upsert must land on the batch merge.
    "q_stream_upsert" ->
      """WITH delta AS (
           SELECT doc_id, text || ' [rev2]' AS text, lang FROM documents WHERE doc_id % 7 = 0
           UNION ALL
           SELECT doc_id + 100000, '[new] ' || text, lang FROM documents WHERE doc_id % 13 = 3)
         SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
                coalesce(d.lang, b.lang) AS lang,
                md5(coalesce(d.text, b.text)) AS fp
         FROM documents b FULL OUTER JOIN delta d ON b.doc_id = d.doc_id
         ORDER BY doc_id""",
    "q_dedup_degree" -> Dedup.nearDupDegreeProfileOracleSql(),
    "q_pagerank" -> Dedup.nearDupPageRankOracleSql(),
    "q_triangle_count" -> Dedup.triangleCountOracleSql(),
    "q_pq_adc" -> Similarity.pqAdcTopkOracleSql(),
    "q_label_centroids" -> Similarity.labelCentroidsOracleSql,
    "q_star_join" -> Analytics.starJoinRevenueOracleSql(),
    "q_shipping_priority" -> TpchSuite.shippingPriorityOracleSql,
    "q_order_priority_exists" -> TpchSuite.orderPriorityExistsOracleSql,
    "q_local_supplier_volume" -> TpchSuite.localSupplierVolumeOracleSql,
    "q_forecast_revenue" -> TpchSuite.forecastRevenueOracleSql,
    "q_nation_trade_volume" -> TpchSuite.nationTradeVolumeOracleSql,
    "q_market_share" -> TpchSuite.marketShareOracleSql,
    "q_returned_items" -> TpchSuite.returnedItemsOracleSql,
    "q_cust_order_distribution" -> TpchSuite.custOrderDistributionOracleSql,
    "q_promo_revenue" -> TpchSuite.promoRevenueOracleSql,
    "q_supplier_part_breadth" -> TpchSuite.supplierPartBreadthOracleSql,
    "q_small_qty_revenue" -> TpchSuite.smallQtyRevenueOracleSql,
    "q_large_volume_cust" -> TpchSuite.largeVolumeCustomersOracleSql,
    "q_special_revenue" -> TpchSuite.specialRevenueOracleSql,
    "q_dormant_customers" -> TpchSuite.dormantCustomersOracleSql,
    "q_late_priority" -> TpchSuite.latePriorityOracleSql,
    "q_top_supplier" -> TpchSuite.topSupplierOracleSql,
    "q_waiting_suppliers" -> TpchSuite.waitingSuppliersOracleSql,
    "q_incremental_agg" -> Analytics.incrementalRevenueOracleSql,
    "q_supplier_profile" -> Analytics.supplierProfileOracleSql,
    "q_topk_aggregator" -> Analytics.topPricesPerCustomerOracleSql,
    "q_repetition" -> TextAnalysis.repetitionScoreOracleSql(),
    "q_doc_logprob" -> TextAnalysis.docLogProbOracleSql,
    "q_bigram_logprob" -> TextAnalysis.bigramLogProbOracleSql(),
    "q_source_quality" -> TextAnalysis.sourceQualityOracleSql(),
    "q_unicode_nfc" -> TextAnalysis.unicodeNfcOracleSql,
    "q_keywords_tfidf" -> TextAnalysis.keywordsTfidfOracleSql(),
    "q_tfidf_cosine" -> TextAnalysis.tfidfCosinePairsOracleSql(),
    "q_cms_heavy_hitters" -> TextAnalysis.cmsTokenCountsOracleSql(),
    "q_stream_cms" -> TextAnalysis.cmsTokenCountsOracleSql(),
    "q_inverted_index" -> TextAnalysis.invertedIndexOracleSql(),
    "q_pmi_collocations" -> TextAnalysis.pmiCollocationsOracleSql(),
    "q_invindex_refresh" -> TextAnalysis.invindexRefreshOracleSql,
    "q_stream_late_audit" -> graft.streaming.StreamingOps.streamLateAuditOracleSql,
    "q_quality_classifier" -> TextAnalysis.qualityClassifierOracleSql,
    "q_corpus_overlap" -> Dedup.corpusOverlapOracleSql(),
    "q_pii_redact" -> Curation.piiRedactOracleSql,
    "q_line_dedup" -> Curation.lineDedupOracleSql(),
    "q_chunk_sliding" -> Curation.chunkSlidingOracleSql(),
    "q_salted_join" -> Analytics.saltedUserJoinOracleSql,
    "q_dup_spans" -> Curation.dupSpansOracleSql(),
    "q_cdc_chunks" -> Curation.cdcChunksOracleSql(),
    "q_winnowing" -> Curation.winnowingOracleSql(),
    "q_winnow_pairs" -> Curation.winnowPairsOracleSql(),
    "q_embed_dim_stats" -> Similarity.embedDimStatsOracleSql,
    "q_hybrid_rrf" -> Similarity.hybridRrfOracleSql(),
    "q_rerank_ce" -> Similarity.rerankCrossEncoderOracleSql(),
    "q_semantic_canonical" -> Similarity.semanticCanonicalOracleSql(),
    "q_opq_audit" -> Similarity.opqRotationAuditOracleSql,
    "q_ivf_refresh" -> Similarity.ivfRefreshOracleSql,
    "q_embedding_quality" -> Similarity.embeddingQualityOracleSql,
    "q_kn_logprob" -> TextAnalysis.knLogProbOracleSql(),
    // Self-verifying ANN: embeddings are deterministic per sf; the LSH
    // multiprobe recall@10 comfortably clears the 0.2 floor.
    "q_ann_lsh" ->
      "SELECT CAST(10 AS BIGINT) AS n_queries, TRUE AS recall_ok",
    // IVF ANN, deterministic arm: the oracle rebuilds the full pipeline
    // and reproduces the MEASURED recall@10 exactly (floor 0.6).
    "q_ann_ivf" -> Similarity.annIvfRecallOracleSql(),
    // k-means-refined arm: float-sum-order sensitive at the ulp level,
    // so the verdict stays boolean (floor 0.6, measured ≈ 0.87–0.93).
    "q_ann_ivf_kmeans" ->
      "SELECT CAST(10 AS BIGINT) AS n_queries, TRUE AS recall_ok",
    // Exact-match oracle for the IVF neighbor rows (deterministic
    // centroids make the whole approximate pipeline reproducible).
    "q_ann_topk" -> Similarity.annIvfTopkOracleSql(),
    "q_quantize_int8" -> Similarity.quantizeInt8StatsOracleSql,
    // Generated from the media builders' closed-form container geometry;
    // the Spark side parses the actual bytes.
    "q_multimodal_meta" -> Multimodal.mediaMetaOracleSql,
    "q_audio_meta" -> Multimodal.audioMetaOracleSql,
    "q_media_quarantine" -> Multimodal.mediaQuarantineOracleSql,
    "q_frame_sample" -> Multimodal.sampleFramesOracleSql(),
    "q_frame_extract" -> Multimodal.frameExtractOracleSql(),
    "q_media_resize" -> Multimodal.resizePlanOracleSql(),
    "q_media_embed" -> Multimodal.mediaEmbedOracleSql,
    "q_media_phash" -> Multimodal.perceptualHashOracleSql,
    "q_image_near_dup" -> Multimodal.imageNearDupOracleSql(),
    "q_audio_stats" -> Multimodal.audioStatsOracleSql,
    "q_ppjoin" -> PrefixJoin.ppJoinOracleSql(),
    "q_ppjoin_incremental" -> PrefixJoin.ppJoinIncrementalOracleSql(),
    "q_cc_star" -> Dedup.nearDupClustersOracleSql(),
    "q_triplet_mining" -> Similarity.tripletMiningOracleSql(),
    "q_stream_image_dedup" -> graft.streaming.StreamingOps.streamImageDedupOracleSql(),
    "q_audio_fingerprint" -> Multimodal.audioFingerprintOracleSql,
    "q_audio_near_dup" -> Multimodal.audioNearDupOracleSql(),
    "q_video_meta" -> Multimodal.videoMetaOracleSql,
    "q_video_frame_phash" -> Multimodal.videoFramePHashOracleSql,
    "q_video_near_dup" -> Multimodal.videoNearDupOracleSql(),
    "q_video_quarantine" -> Multimodal.videoQuarantineOracleSql,
    "q_modality_agreement" -> Multimodal.modalityAgreementOracleSql,
    "q_retrieval_eval" -> Similarity.retrievalEvalOracleSql(),
    "q_zipf_fit" -> TextAnalysis.zipfFitOracleSql(),
    "q_unigram_lm" -> UnigramLM.viterbiSegmentOracleSql(),
    "q_unigram_em" -> UnigramLM.emStepOracleSql(),
  )
}
