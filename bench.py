"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints exactly ONE JSON line to stdout:
  {"metric": "extract_e2e", "value": <sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ...}

`--scaling` runs the headline job at two parallelism levels (default 4 and
16 CPUs, env-overridable) in fresh processes on the same input and reports
both throughputs plus the scaling efficiency (the sandbox stand-in for N vs
4N nodes — BASELINE.md documents the pair choice and the host's own
measured scaling ceiling).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TMP = "/tmp/docler_ray_bench"
# best-of-N: this host's documented run variance is ~2x (shared-host steal),
# so single-run numbers are noise-dominated; every timed item runs N times
# and the MIN is recorded (round-2 VERDICT item 6)
REPEATS = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "3")))
# --scaling legs only need the headline job (the efficiency ratio is
# computed from extract_e2e); skipping the query suite keeps the two-leg
# protocol affordable at best-of-3
HEADLINE_ONLY = os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") == "1"


def _sf_factor() -> float:
    """Parse the scale factor from the sf dir name (sf0.1 -> 0.1)."""
    tag = os.path.basename(os.path.normpath(SF_DIR))
    try:
        return float(tag.replace("sf", ""))
    except ValueError:
        return 0.01


# 2M pages per unit scale factor at size boost 4 (~15KB mean page):
# sf0.1 -> 200k pages, enough sustained compute that actor-pool ramp-up and
# session overhead stop dominating the scaling measurement.
ROWS_PER_SF = 2_000_000
ROWS_PER_SHARD = 2_500
PAGE_BOOST = 4


def _corpus_dir() -> str:
    tag = os.path.basename(os.path.normpath(SF_DIR))
    return os.path.join(BENCH_TMP, f"pages_{tag}")


def prepare_corpus() -> list[str]:
    """Materialize the deterministic synthetic pages corpus once, sized by
    the sf factor (untimed; cached so both scaling levels read identical
    input). Shards are generated in parallel Ray tasks — every row is a pure
    function of (seed, row_index) so parallel generation is reproducible."""
    import glob

    import ray

    out = _corpus_dir()
    done_marker = os.path.join(out, "_DONE")
    if os.path.exists(done_marker):
        return sorted(glob.glob(os.path.join(out, "*.parquet")))
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    n_rows = max(1000, int(ROWS_PER_SF * _sf_factor()))

    @ray.remote
    def gen_shard(shard: int, start: int, n: int) -> str:
        import pyarrow.parquet as pq

        from docler_ray.sources.synth import generate_pages_table

        path = os.path.join(out, f"pages-{shard:05d}.parquet")
        table = generate_pages_table(n, seed=42, start=start, boost=PAGE_BOOST)
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        return path

    futures = [
        gen_shard.remote(i, start, min(ROWS_PER_SHARD, n_rows - start))
        for i, start in enumerate(range(0, n_rows, ROWS_PER_SHARD))
    ]
    ray.get(futures)
    with open(done_marker, "w") as f:
        f.write("ok")
    return sorted(glob.glob(os.path.join(out, "*.parquet")))


def bench_once() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # worker prints must not pollute the
        # one-JSON-line stdout contract (a MapBatches log leaked once)
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import __ray_entry__ as entry_mod

    from docler_ray.pipelines.extract_pipeline import PipelineConfig, run_extract_job

    results: dict = {}
    try:
        input_files = prepare_corpus()

        # warm OS page cache (untimed)
        for p in input_files:
            with open(p, "rb") as f:
                f.read()

        # headline: extraction end-to-end (read -> classify -> extract ->
        # partitioned write + manifests), best of REPEATS fresh runs
        out_dir = os.path.join(BENCH_TMP, f"out_{NUM_CPUS}")
        headline_runs = []
        for _ in range(REPEATS):
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.time()
            totals = run_extract_job(input_files, out_dir, PipelineConfig())
            headline_runs.append(time.time() - t0)
        results["extract_e2e"] = min(headline_runs)
        results["_headline_runs"] = [round(s, 3) for s in headline_runs]
        results["_docs"] = totals["docs"] + totals["errors"]
        if HEADLINE_ONLY:
            return results

        # secondary pipelines (each timed to full consumption, best of
        # REPEATS back-to-back runs per query)
        q = entry_mod.queries()

        def timed(name: str, fn) -> None:
            best = None
            for _ in range(REPEATS):
                t = time.time()
                res = fn(SF_DIR)
                import ray.data as rd

                if isinstance(res, rd.Dataset):
                    # consume without driver materialization
                    for _ in res.iter_batches(
                        batch_size=8192, batch_format="pyarrow"
                    ):
                        pass
                sec = time.time() - t
                best = sec if best is None else min(best, sec)
            results[name] = best

        timed("extract_chunks", q["extract_chunks"])
        timed("text_analysis", q["text_analysis"])
        timed("exact_dedup_first", q["exact_dedup_first"])
        timed("minhash_survivors", q["minhash_survivors"])
        timed("ngram_jaccard_survivors", q["ngram_jaccard_survivors"])
        timed("knn_self_top5", q["knn_self_top5"])
        timed("events_window_counts", q["events_window_counts"])
        timed("events_sessionize", q["events_sessionize"])
        timed("events_last_order_asof", q["events_last_order_asof"])
        timed("events_click_attribution", q["events_click_attribution"])
        timed("daily_order_event_activity", q["daily_order_event_activity"])
        timed("shared_tokens_en_de", q["shared_tokens_en_de"])
        timed("en_only_texts", q["en_only_texts"])
        timed("orders_by_mktsegment", q["orders_by_mktsegment"])
        timed("simhash_fingerprints", q["simhash_fingerprints"])
        timed("doc_keywords", q["doc_keywords"])
        timed("top_orders_by_price", q["top_orders_by_price"])
        timed("events_props_k_counts", q["events_props_k_counts"])
        timed("median_chars_by_lang", q["median_chars_by_lang"])
        timed("sample_docs_pct10", q["sample_docs_pct10"])
        timed("orders_price_band_counts", q["orders_price_band_counts"])
        timed("knn_ivf_top5", q["knn_ivf_top5"])
        timed("knn_sq8_top5", q["knn_sq8_top5"])
        timed("embedding_neardup_survivors", q["embedding_neardup_survivors"])
        timed("approx_distinct_texts", q["approx_distinct_texts"])
        timed("neardup_pairs_exact", q["neardup_pairs_exact"])
        timed("text_metrics", q["text_metrics"])
        timed("mime_dispatch_counts", q["mime_dispatch_counts"])
        timed("office_extract_docs", q["office_extract_docs"])
        timed("pdf_real_extract", q["pdf_real_extract"])
        timed("pdf_decrypt_extract", q["pdf_decrypt_extract"])
        timed("pdf_decrypt_aes_extract", q["pdf_decrypt_aes_extract"])
        timed("pdf_decrypt_aes256_extract", q["pdf_decrypt_aes256_extract"])
        timed("doc_legacy_extract", q["doc_legacy_extract"])
        timed("xls_legacy_extract", q["xls_legacy_extract"])
        timed("ppt_legacy_extract", q["ppt_legacy_extract"])
        timed("odt_extract_docs", q["odt_extract_docs"])
        timed("rtf_extract_docs", q["rtf_extract_docs"])
        timed("epub_extract_docs", q["epub_extract_docs"])
        timed("image_pixel_stats", q["image_pixel_stats"])
        timed("pdf_page_metadata", q["pdf_page_metadata"])
        timed("lineitem_order_status_counts", q["lineitem_order_status_counts"])
        timed("audio_probe_features", q["audio_probe_features"])
        timed("video_frame_schedule", q["video_frame_schedule"])
        timed("simhash_survivors", q["simhash_survivors"])
        timed("events_hopping_counts", q["events_hopping_counts"])
        timed("price_quantiles_sampled", q["price_quantiles_sampled"])
        timed("top_tokens", q["top_tokens"])
        timed("stratified_sample_by_lang", q["stratified_sample_by_lang"])
        timed("span_dedup_docs", q["span_dedup_docs"])
        timed("repetition_signals", q["repetition_signals"])
        timed("events_user_seq", q["events_user_seq"])
        timed("decontaminate_docs", q["decontaminate_docs"])
        timed("tfidf_top15", q["tfidf_top15"])
        timed("bm25_top15", q["bm25_top15"])
        timed("top_docs_per_lang", q["top_docs_per_lang"])
        timed("lineitem_f_order_counts", q["lineitem_f_order_counts"])
        timed("price_histogram", q["price_histogram"])
        timed("redact_pii", q["redact_pii"])
        timed("approx_distinct_by_lang", q["approx_distinct_by_lang"])
        timed("url_host_profile", q["url_host_profile"])
        timed("url_blocklist_survivors", q["url_blocklist_survivors"])
        timed("c4_line_filter", q["c4_line_filter"])
        timed("events_rolling_value", q["events_rolling_value"])
        timed("customers_no_orders", q["customers_no_orders"])
        timed("mixture_sample_by_lang", q["mixture_sample_by_lang"])
        timed("events_ntile", q["events_ntile"])
        timed("orders_star_revenue", q["orders_star_revenue"])
        timed("cm_top_token_counts", q["cm_top_token_counts"])
        timed("docs_above_p90_len", q["docs_above_p90_len"])
        timed("pack_sequences", q["pack_sequences"])
        timed("gopher_quality_flags", q["gopher_quality_flags"])
        timed("canonical_doc_per_host", q["canonical_doc_per_host"])
        timed("doc_rule_tags", q["doc_rule_tags"])
        timed("top_char_pairs", q["top_char_pairs"])
        timed("ngram_novelty_docs", q["ngram_novelty_docs"])
        timed("inverted_postings", q["inverted_postings"])
        timed("vocab_unk_rate", q["vocab_unk_rate"])
        timed("normalize_ws_docs", q["normalize_ws_docs"])
        timed("curation_pipeline", q["curation_pipeline"])
        timed("epoch_shuffle", q["epoch_shuffle"])
        timed("chunk_pack_pipeline", q["chunk_pack_pipeline"])
        timed("regional_revenue", q["regional_revenue"])
        timed("kmeans_assign_counts", q["kmeans_assign_counts"])
        timed("kmeans_update_centroids", q["kmeans_update_centroids"])
        timed("kmeans_lloyd_means", q["kmeans_lloyd_means"])
        timed("retention_cohorts", q["retention_cohorts"])
        timed("lang_confusion", q["lang_confusion"])
        timed("funnel_counts", q["funnel_counts"])
        timed("warc_roundtrip_docs", q["warc_roundtrip_docs"])
        timed("lm_quality_scores", q["lm_quality_scores"])
        timed("dsir_importance", q["dsir_importance"])
        timed("ccnet_perplexity_tiers", q["ccnet_perplexity_tiers"])
        timed("chunk_by_bpe_tokens", q["chunk_by_bpe_tokens"])
        timed("paragraph_dedup_docs", q["paragraph_dedup_docs"])
        timed("curation_pipeline_v2", q["curation_pipeline_v2"])
        timed("semdedup_survivors", q["semdedup_survivors"])
        timed("bpe_merges", q["bpe_merges"])
        timed("bpe_encode_stats", q["bpe_encode_stats"])
        timed("dup_cluster_sizes", q["dup_cluster_sizes"])
        timed("events_window_distinct_users", q["events_window_distinct_users"])
        timed("customer_region_left_join", q["customer_region_left_join"])
        timed("length_moments_by_lang", q["length_moments_by_lang"])
        timed("incremental_dedup_new_docs", q["incremental_dedup_new_docs"])
        timed("docs_global_rank", q["docs_global_rank"])
        timed("docs_rollup_counts", q["docs_rollup_counts"])
        timed("length_token_cov_by_lang", q["length_token_cov_by_lang"])
        timed("modal_length_bucket_by_lang", q["modal_length_bucket_by_lang"])
        timed("type_token_ratio_by_lang", q["type_token_ratio_by_lang"])
        timed("snapshot_overlap_stats", q["snapshot_overlap_stats"])
        timed("events_hopping_distinct_users", q["events_hopping_distinct_users"])
        timed("clickers_no_purchase", q["clickers_no_purchase"])
        timed("corpus_checksum_by_lang", q["corpus_checksum_by_lang"])
        timed("events_type_dow_matrix", q["events_type_dow_matrix"])
        timed("events_dow_long", q["events_dow_long"])
        timed("docs_cube_counts", q["docs_cube_counts"])
        timed("length_token_corr_by_lang", q["length_token_corr_by_lang"])
        timed("user_interarrival_stats", q["user_interarrival_stats"])
        timed("user_activity_skew", q["user_activity_skew"])
        timed("token_skewness_by_lang", q["token_skewness_by_lang"])
        timed("event_type_cooccurrence", q["event_type_cooccurrence"])
        timed("events_percent_rank", q["events_percent_rank"])
        timed("token_kurtosis_by_lang", q["token_kurtosis_by_lang"])
        timed("event_transition_matrix", q["event_transition_matrix"])
        timed("sample_k_per_lang", q["sample_k_per_lang"])
        timed("trending_types_hourly", q["trending_types_hourly"])
        timed("session_duration_stats", q["session_duration_stats"])
        timed("daily_event_deltas", q["daily_event_deltas"])
        timed("rolling_dau_7d", q["rolling_dau_7d"])
        timed("doc_length_zscore", q["doc_length_zscore"])
        timed("user_type_entropy", q["user_type_entropy"])
        timed("length_outliers_by_lang", q["length_outliers_by_lang"])
        timed("user_feature_table", q["user_feature_table"])
        timed("weekday_weekend_type_kl", q["weekday_weekend_type_kl"])
        timed("edit_neardup_pairs", q["edit_neardup_pairs"])
        timed("edit_neardup_survivors", q["edit_neardup_survivors"])
        timed("q3_shipping_priority", q["q3_shipping_priority"])
        timed("q18_large_orders", q["q18_large_orders"])
        timed("price_exact_quantiles", q["price_exact_quantiles"])
        timed("phrase_hit_counts", q["phrase_hit_counts"])
        timed("priority_sample_docs", q["priority_sample_docs"])
        timed("charset_extract_docs", q["charset_extract_docs"])
        timed("edit_dedup_keep_best", q["edit_dedup_keep_best"])
        timed("q14_promo_revenue", q["q14_promo_revenue"])
        timed("q7_nation_volume", q["q7_nation_volume"])
        timed("q10_returned_items", q["q10_returned_items"])
        timed("q12_delay_bands", q["q12_delay_bands"])
        timed("q15_top_supplier", q["q15_top_supplier"])
        timed("q17_small_qty_revenue", q["q17_small_qty_revenue"])
        timed("q19_disjunctive_revenue", q["q19_disjunctive_revenue"])
        timed("q22_dormant_customers", q["q22_dormant_customers"])
        timed("q16_supplier_cardinality", q["q16_supplier_cardinality"])
        timed("q20_dominant_suppliers", q["q20_dominant_suppliers"])
        timed("q8_market_share", q["q8_market_share"])
        timed("q9_product_profit", q["q9_product_profit"])
        timed("q2_min_cost_supplier", q["q2_min_cost_supplier"])
        timed("q6_forecast_revenue", q["q6_forecast_revenue"])
        timed("q11_important_parts", q["q11_important_parts"])
        timed("q21_sole_returner", q["q21_sole_returner"])
        timed("extract_links_docs", q["extract_links_docs"])
        timed("host_pagerank", q["host_pagerank"])
        timed("host_hits", q["host_hits"])
        timed("host_kcore", q["host_kcore"])
        timed("host_random_walks", q["host_random_walks"])
        timed("walk_skipgram_pairs", q["walk_skipgram_pairs"])
        timed("mutual_link_pairs", q["mutual_link_pairs"])
        timed("glove_cooccurrence", q["glove_cooccurrence"])
        timed("link_prediction_cn", q["link_prediction_cn"])
        timed("robots_directives", q["robots_directives"])
        timed("crawl_schedule_robots", q["crawl_schedule_robots"])
        timed("winnow_dedup_survivors", q["winnow_dedup_survivors"])
        timed("idn_host_decode", q["idn_host_decode"])
        timed("host_degree_profile", q["host_degree_profile"])
        timed("host_triangles", q["host_triangles"])
        timed("data_quality_audit", q["data_quality_audit"])
        timed("events_value_resample_6h", q["events_value_resample_6h"])
        timed("peak_concurrent_sessions", q["peak_concurrent_sessions"])
        timed("length_token_ols_by_lang", q["length_token_ols_by_lang"])
        timed("mad_chars_by_lang", q["mad_chars_by_lang"])
        timed("anchor_topk_per_host", q["anchor_topk_per_host"])
        timed("readability_scores", q["readability_scores"])
        timed("snapshot_apply_cdc", q["snapshot_apply_cdc"])
        timed("event_type_bursts", q["event_type_bursts"])
        timed("custdist", q["custdist"])
        timed("q4_priority_exists", q["q4_priority_exists"])
        timed("host_components", q["host_components"])
        timed("event_type_pmi", q["event_type_pmi"])
        timed("events_close_pairs", q["events_close_pairs"])
        timed("robust_outliers_by_lang", q["robust_outliers_by_lang"])
        timed("reconcile_order_totals", q["reconcile_order_totals"])
        timed("price_quantile_sketch", q["price_quantile_sketch"])
        timed("nfc_normalize_stats", q["nfc_normalize_stats"])
        timed("page_metadata_extract", q["page_metadata_extract"])
        timed("url_query_params", q["url_query_params"])
        timed("url_canonicalize", q["url_canonicalize"])
        timed("winnow_profile_docs", q["winnow_profile_docs"])
        timed("winnow_shared_pairs", q["winnow_shared_pairs"])
        timed("sitemap_frontier_rows", q["sitemap_frontier_rows"])
        timed("registered_domains", q["registered_domains"])
        timed("crawl_budget_quotas", q["crawl_budget_quotas"])
        timed("events_late_flags", q["events_late_flags"])
        timed("cdc_dedup_profile", q["cdc_dedup_profile"])
        timed("ac_pattern_counts", q["ac_pattern_counts"])
        timed("resolve_redirects", q["resolve_redirects"])
        timed("frontier_pipeline", q["frontier_pipeline"])
        timed("user_value_ewma", q["user_value_ewma"])
        timed("span_corruption_plan", q["span_corruption_plan"])
        timed("jsonld_metadata", q["jsonld_metadata"])
        timed("feed_frontier_rows", q["feed_frontier_rows"])
        timed("url_aligned_pairs", q["url_aligned_pairs"])
        timed("page_nav_signals", q["page_nav_signals"])
        timed("conform_docs_schema", q["conform_docs_schema"])
        timed("containment_pairs", q["containment_pairs"])
        timed("trap_suspect_params", q["trap_suspect_params"])
        timed("bitext_pair_scores", q["bitext_pair_scores"])
        timed("hreflang_alternates", q["hreflang_alternates"])
        timed("canonical_clusters", q["canonical_clusters"])
        timed("storage_order_gain", q["storage_order_gain"])
    finally:
        ray.shutdown()
    return results


SF1_DIR = os.path.join(BENCH_TMP, "sf1")
SF1_COPIES = 10
# the shuffle-heavy family (verdict r04 #7): at sf0.1 fixed AllToAll setup
# dominates these, hiding regressions inside host noise; the sf1 tier (10x
# sf0.1) gives the exchanges real data volume
SF1_QUERIES = [
    "exact_dedup_first",
    "span_dedup_docs",
    "paragraph_dedup_docs",
    "minhash_survivors",
    "ngram_jaccard_survivors",
    "simhash_survivors",
    "embedding_neardup_survivors",
    "semdedup_survivors",
    "ngram_novelty_docs",
    "curation_pipeline_v2",
    # LLM-pipeline family at 10x (map-heavy / sketch / shuffle mixes)
    "gopher_quality_flags",
    "c4_line_filter",
    "lm_quality_scores",
    "ccnet_perplexity_tiers",
    "dsir_importance",
    "decontaminate_docs",
    "epoch_shuffle",
    "pack_sequences",
    "knn_ivf_top5",
    "chunk_by_bpe_tokens",
    # events/window family at 10x (1M events: sort-heavy windows,
    # sessionize, as-of join in its distributed co-partition regime)
    "events_window_counts",
    "events_hopping_counts",
    "events_window_distinct_users",
    "events_hopping_distinct_users",
    "events_sessionize",
    "events_user_seq",
    "events_rolling_value",
    "events_ntile",
    "events_props_k_counts",
    "events_last_order_asof",
    "clickers_no_purchase",
    # round-5 continuation events/window additions (1M-event exchanges:
    # coarse per-user co-location, dimension-sized pivot/co-occurrence
    # tails, windowed top-k)
    "events_type_dow_matrix",
    "user_interarrival_stats",
    "user_activity_skew",
    "events_percent_rank",
    "event_transition_matrix",
    "event_type_cooccurrence",
    "trending_types_hourly",
    "session_duration_stats",
    "user_feature_table",
    # session-3 additions: sweep-line prefix sum, resample grid, burst
    # windows, CDC winner exchange, count-of-counts, graph family
    "peak_concurrent_sessions",
    "events_value_resample_6h",
    "event_type_bursts",
    "snapshot_apply_cdc",
    # custdist removed from the tier: it reads customer.parquet, which
    # prepare_sf1 does not materialize (dimension FK would need the same
    # per-copy custkey shift as orders); sf0.1 + driver cover it
    "event_type_pmi",
    "host_pagerank",
    "host_triangles",
    # session-5 additions: posting-pair exchanges (shared-fingerprint and
    # containment pairs over 10x docs), k-core peel rounds, the watermark
    # prefix scan over 10M events, EWMA per-key scan, flagship frontier
    "winnow_shared_pairs",
    "containment_pairs",
    "host_kcore",
    "events_late_flags",
    "user_value_ewma",
    "frontier_pipeline",
]


def prepare_sf1() -> str:
    """Materialize the sf1 tier: 10 deterministic perturbed copies of the
    sf0.1 documents/embeddings/events/orders tables (50k docs / 20k
    vectors / 1M events / 1.5M orders), written as one shard per copy
    under ``<table>.parquet/`` directories so the queries'
    ``{sf_dir}/<table>.parquet`` paths resolve unchanged.

    Perturbation preserves the duplicate structure: copy 0 is byte-identical
    to the base; copy k>0 appends a suffix keyed on (k, crc32(text)) so
    exact duplicates WITHIN a copy stay exact duplicates, while copies of
    the same base doc become near-duplicates of each other (high-Jaccard
    10-clusters — the near-dup-heavy shape of a real web corpus).
    Embeddings get per-copy deterministic gaussian noise at 1e-3 scale."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # v2: + events (1M rows, ids/users shifted per copy so sessions and
    # join keys stay within-copy) and orders (for the as-of join's
    # distributed regime). Bumping the marker regenerates stale tiers.
    done_marker = os.path.join(SF1_DIR, "_DONE_v2")
    if os.path.exists(done_marker):
        return SF1_DIR
    shutil.rmtree(SF1_DIR, ignore_errors=True)
    base = "/root/testdata/sf0.1"

    docs = pq.read_table(os.path.join(base, "documents.parquet"))
    texts = docs.column("text").to_pylist()
    crcs = [zlib.crc32(t.encode()) % 97 for t in texts]
    out_docs = os.path.join(SF1_DIR, "documents.parquet")
    os.makedirs(out_docs, exist_ok=True)
    for k in range(SF1_COPIES):
        if k == 0:
            new_texts = texts
        else:
            new_texts = [f"{t}\ncopy-{k}-{c}" for t, c in zip(texts, crcs)]
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    [d + k * 10_000_000 for d in docs.column("doc_id").to_pylist()],
                    pa.int64(),
                ),
                "text": pa.array(new_texts, pa.string()),
                "lang": docs.column("lang"),
                "source": docs.column("source"),
                "n_chars": pa.array([len(t) for t in new_texts], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(out_docs, f"part-{k:02d}.parquet"))

    emb = pq.read_table(os.path.join(base, "embeddings.parquet"))
    vecs = np.asarray(emb.column("embedding").to_pylist(), dtype=np.float32)
    out_emb = os.path.join(SF1_DIR, "embeddings.parquet")
    os.makedirs(out_emb, exist_ok=True)
    for k in range(SF1_COPIES):
        if k == 0:
            new_vecs = vecs
        else:
            rng = np.random.default_rng(1000 + k)
            new_vecs = vecs + rng.standard_normal(vecs.shape).astype(np.float32) * 1e-3
        tbl = pa.table(
            {
                "vec_id": pa.array(
                    [v + k * 10_000_000 for v in emb.column("vec_id").to_pylist()],
                    pa.int64(),
                ),
                "embedding": pa.array(
                    [row.tolist() for row in new_vecs], pa.list_(pa.float32())
                ),
                "label": emb.column("label"),
            }
        )
        pq.write_table(tbl, os.path.join(out_emb, f"part-{k:02d}.parquet"))

    events = pq.read_table(os.path.join(base, "events.parquet"))
    out_events = os.path.join(SF1_DIR, "events.parquet")
    os.makedirs(out_events, exist_ok=True)
    ev_ids = events.column("event_id").to_numpy(zero_copy_only=False)
    ev_users = events.column("user_id").to_numpy(zero_copy_only=False)
    for k in range(SF1_COPIES):
        tbl = pa.table(
            {
                "event_id": pa.array(ev_ids + k * 10_000_000, pa.int64()),
                "ts": events.column("ts"),
                "user_id": pa.array(ev_users + k * 10_000_000, pa.int64()),
                "event_type": events.column("event_type"),
                "value": events.column("value"),
                "props": events.column("props"),
            }
        )
        pq.write_table(tbl, os.path.join(out_events, f"part-{k:02d}.parquet"))

    orders = pq.read_table(os.path.join(base, "orders.parquet"))
    out_orders = os.path.join(SF1_DIR, "orders.parquet")
    os.makedirs(out_orders, exist_ok=True)
    o_keys = orders.column("o_orderkey").to_numpy(zero_copy_only=False)
    o_cust = orders.column("o_custkey").to_numpy(zero_copy_only=False)
    for k in range(SF1_COPIES):
        tbl = pa.table(
            {
                "o_orderkey": pa.array(o_keys + k * 100_000_000, pa.int64()),
                "o_custkey": pa.array(o_cust + k * 10_000_000, pa.int64()),
                "o_orderstatus": orders.column("o_orderstatus"),
                "o_totalprice": orders.column("o_totalprice"),
                "o_orderdate": orders.column("o_orderdate"),
                "o_orderpriority": orders.column("o_orderpriority"),
            }
        )
        pq.write_table(tbl, os.path.join(out_orders, f"part-{k:02d}.parquet"))

    with open(done_marker, "w") as f:
        f.write("ok")
    return SF1_DIR


def run_sf1() -> None:
    """Time the shuffle-heavy family at the sf1 tier (best of REPEATS each)
    and print one JSON line."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import __ray_entry__ as entry_mod

    results: dict = {}
    try:
        sf_dir = prepare_sf1()
        q = entry_mod.queries()
        import ray.data as rd

        for name in SF1_QUERIES:
            best = None
            try:
                for _ in range(REPEATS):
                    t0 = time.time()
                    res = q[name](sf_dir)
                    if isinstance(res, rd.Dataset):
                        for _ in res.iter_batches(
                            batch_size=8192, batch_format="pyarrow"
                        ):
                            pass
                    sec = time.time() - t0
                    best = sec if best is None else min(best, sec)
            except Exception as exc:  # record and keep going: one blown
                # query must not lose the whole tier's timings
                print(f"sf1 {name}: ERROR {exc}", file=sys.stderr)
                results[name] = -1.0
                continue
            results[name] = round(best, 3)
            print(f"sf1 {name}: {results[name]}s", file=sys.stderr)
    finally:
        ray.shutdown()
    print(
        json.dumps(
            {
                "metric": "shuffle_family_sf1",
                "value": round(sum(results.values()), 3),
                "unit": "sec",
                "queries": results,
                "sf": "sf1 (10x sf0.1: 50k docs, 20k vectors, 1M events)",
                "num_cpus": NUM_CPUS,
                "repeats": REPEATS,
            },
            sort_keys=True,
        )
    )


def prepare_only() -> None:
    """Generate/caches the corpus at full host width (used by --scaling so
    the low-CPU run doesn't pay generation at 4 procs)."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # worker prints must not pollute the
        # one-JSON-line stdout contract (a MapBatches log leaked once)
    )
    try:
        files = prepare_corpus()
        print(json.dumps({"prepared_shards": len(files)}))
    finally:
        ray.shutdown()


def run_scaling() -> None:
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--prepare"],
        env=dict(os.environ, RAY_GRAFT_CPUS="32"),
        capture_output=True,
        text=True,
        check=True,
    )

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_HEADLINE_ONLY="1"
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Default pair 4 vs 16: measured sustained-load hardware ceiling in this
    # sandbox is ~3.3x from 8->32 procs (SMT/steal; see BASELINE.md) which
    # caps ANY job's 8->32 efficiency at ~0.83; 4->16 has a ~0.91 ceiling and
    # isolates the engine's scaling from the host's. Override with
    # GRAFT_SCALE_LO / GRAFT_SCALE_HI.
    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    lo = run(lo_cpus)
    hi = run(hi_cpus)
    t_lo, t_hi = lo["value"], hi["value"]
    speedup = t_lo / t_hi
    eff = speedup / (hi_cpus / lo_cpus)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "cpus_lo": lo_cpus,
                "cpus_hi": hi_cpus,
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "docs_per_sec_lo": lo.get("docs_per_sec"),
                "docs_per_sec_hi": hi.get("docs_per_sec"),
                "speedup": round(speedup, 3),
                "sf": lo.get("sf"),
            },
            sort_keys=True,
        )
    )


def main() -> None:
    if "--prepare" in sys.argv:
        prepare_only()
        return
    if "--scaling" in sys.argv:
        run_scaling()
        return
    if "--sf1" in sys.argv:
        run_sf1()
        return
    results = bench_once()
    docs = results.pop("_docs", 0)
    headline = results.pop("extract_e2e")
    headline_runs = results.pop("_headline_runs", [])
    print(
        json.dumps(
            {
                "metric": "extract_e2e",
                "value": round(headline, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in sorted(results.items())},
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "docs_per_sec": round(docs / headline, 1) if headline else None,
                "repeats": REPEATS,
                "headline_runs": headline_runs,
            },
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
