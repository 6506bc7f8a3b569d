"""Driver contract for the suckit_ray graft (Ray Data target).

- ``entry()``    — flagship seed-list crawl over the deterministic
  synthetic corpus sized from sf0.001, returning the interleaved-span
  documents table as a Dataset.
- ``queries()``  — one entry per operator family from SURVEY.md §2 plus
  the training-data-pipeline extensions (dedup/ANN/text analysis).
- ``oracle_sql()`` — DuckDB equivalents over the same parquet views.
  Every constant (regexes, thresholds, derivations) mirrors the Python
  implementation verbatim; integer counts / floor(x*10000) scores keep
  the value-hash comparison exact. 46 of 54 queries are SQL-oracled
  (incl. the whole crawl engine via a recursive-CTE closure, the
  per-doc interleaved SPAN SEQUENCE (kind, media_ref, order) — the
  BASELINE.json row invariant — via ``crawl_spans``, per-host mirror
  stats over the same closure, incremental recrawl diffs via a
  two-closure FULL OUTER JOIN, the winnowing fingerprint via a HUGEINT
  polynomial, the FULL minhash-LSH and simhash pipelines — banding and
  bit votes included — via md5-derived hashing, near-dup connected
  components via distributed min-label propagation, exact histogram
  quantiles, benchmark decontamination and duplicate-n-gram fractions,
  grouped top-k windows, as-of and range joins via LATERAL / non-equi
  joins, and the WARC archive round-trip); the 8
  approximate/sketch/codec/float-iterative ones are rows-only here and
  verified otherwise in tests/test_dedup_pins.py and
  tests/test_graph.py (pinned rows, brute-force equality, recall/error
  bounds, allclose vs a numpy power-iteration reference).

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or below this module.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


# ---------------------------------------------------------------------------
# flagship crawl
# ---------------------------------------------------------------------------

def _corpus_for(sf_dir: str):
    """See suckit_ray.pipelines.flagship.corpus_for (moved there so
    mirror-consuming pipelines can share it without importing this
    driver module)."""
    from suckit_ray.pipelines.flagship import corpus_for

    return corpus_for(sf_dir)


def _crawl_docs(sf_dir: str):
    """Memoized flagship crawl through the STREAMING output path —
    see suckit_ray.pipelines.flagship.crawl_docs. All crawl-backed
    queries (crawl_mirror, crawl_spans, crawl_pagerank) and entry()
    share one crawl per process."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return crawl_docs(sf_dir)


def _crawl_hoststats(sf_dir: str):
    """Per-host mirror aggregates — see
    suckit_ray.pipelines.flagship.crawl_hoststats."""
    from suckit_ray.pipelines.flagship import crawl_hoststats

    return crawl_hoststats(sf_dir)


def _crawl_diff(sf_dir: str):
    """Incremental recrawl diff — see
    suckit_ray.pipelines.flagship.crawl_diff."""
    from suckit_ray.pipelines.flagship import crawl_diff

    return crawl_diff(sf_dir)


def _crawl_depths(sf_dir: str):
    """Per-document fetch wave (= BFS depth) — see
    suckit_ray.pipelines.flagship.crawl_depths."""
    from suckit_ray.pipelines.flagship import crawl_depths

    return crawl_depths(sf_dir)


def _crawl_media_dedup(sf_dir: str):
    """Payload-digest dedup of downloaded assets — see
    suckit_ray.pipelines.flagship.crawl_media_dedup."""
    from suckit_ray.pipelines.flagship import crawl_media_dedup

    return crawl_media_dedup(sf_dir)


def _crawl_media_manifest(sf_dir: str):
    """Per-asset reference counts — see
    suckit_ray.pipelines.flagship.crawl_media_manifest."""
    from suckit_ray.pipelines.flagship import crawl_media_manifest

    return crawl_media_manifest(sf_dir)


def _crawl_media_features(sf_dir: str):
    """Actor-pool media decode + features over the mirror's assets —
    see suckit_ray.pipelines.flagship.crawl_media_features. Rows-only
    (media decode is not SQL-expressible); determinism pinned in
    tests/test_round3b_ops.py."""
    from suckit_ray.pipelines.flagship import crawl_media_features

    return crawl_media_features(sf_dir)


def entry() -> Any:
    """Flagship pipeline: full crawl of the sf0.001-sized synthetic web
    → interleaved-span documents Dataset."""
    return _crawl_docs("/root/testdata/sf0.001")


def _crawl_mirror_summary(sf_dir: str, docs=None):
    """Crawl result as a flat summary table (doc_id, host, status,
    is_html, n_outlinks, n_spans) — rows-only correctness surface.
    ``docs`` overrides the docs source (compaction check)."""
    import pyarrow as pa

    ds = _crawl_docs(sf_dir) if docs is None else docs

    def summarize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "host": t.column("host"),
                "status": t.column("status"),
                "is_html": t.column("is_html"),
                "n_outlinks": t.column("n_outlinks"),
                "n_spans": pc.cast(pc.list_value_length(t.column("spans")), pa.int32()),
            }
        )

    return ds.map_batches(summarize, batch_format="pyarrow")


def _crawl_mirror_compacted(sf_dir: str):
    """The flagship mirror summary read through a COMPACTED copy of
    the per-wave parquet tree (sinks.compact_parquet: streaming
    block-coalesce repartition + atomic staging-dir swap). Shares the
    crawl_mirror recursive-CTE oracle verbatim — a compaction that
    drops, duplicates or corrupts one row hash-fails."""
    from suckit_ray.pipelines.flagship import crawl_docs_compacted

    return _crawl_mirror_summary(sf_dir, docs=crawl_docs_compacted(sf_dir))


def _crawl_spans(sf_dir: str):
    """The BASELINE.json per-row invariant as a flat SQL-checkable
    table: every NON-TEXT span of the crawled mirror in document order
    — (doc_id, ord, kind, media_ref), where ord numbers the media/link
    spans of a doc 0..n-1. The oracle regenerates the exact rewritten
    link targets (relative-rewrite output, M14) from the synthetic link
    graph, so a hash match pins span KIND, MEDIA_REF and ORDER for
    every crawled page and asset."""
    import pyarrow as pa

    ds = _crawl_docs(sf_dir)

    def flatten(t: pa.Table) -> pa.Table:
        doc_ids, ords, kinds, refs = [], [], [], []
        for doc_id, spans in zip(
            t.column("doc_id").to_pylist(), t.column("spans").to_pylist()
        ):
            k = 0
            for s in spans:
                if s["kind"] != "text":
                    doc_ids.append(doc_id)
                    ords.append(k)
                    kinds.append(s["kind"])
                    refs.append(s["media_ref"])
                    k += 1
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "ord": pa.array(ords, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "media_ref": pa.array(refs, pa.string()),
            }
        )

    return ds.map_batches(flatten, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    from suckit_ray.pipelines import (
        ann,
        dedup,
        flagship,
        formats,
        graph,
        relops,
        textops,
        tpch,
        tpch2,
        urlops,
        warcops,
    )

    return {
        # crawl URL kernels (SURVEY §2.2 M8/M9/M11/M13)
        "url_to_path": urlops.url_to_path,
        "normalize_url": urlops.normalize_url,
        "should_visit": urlops.should_visit,
        "is_external": urlops.is_external,
        # crawl pipeline (full wave-loop engine; crawl_spans pins the
        # interleaved span-sequence invariant per doc)
        "crawl_mirror": _crawl_mirror_summary,
        "crawl_spans": _crawl_spans,
        "crawl_pagerank": graph.crawl_pagerank,
        "crawl_pagerank_exact": graph.crawl_pagerank_exact,
        "crawl_trustrank": graph.crawl_trustrank,
        "crawl_anchor_text": graph.crawl_anchor_text,
        "crawl_communities_lpa": graph.crawl_communities_lpa,
        "crawl_hits": graph.crawl_hits,
        "crawl_triangles": graph.crawl_triangles,
        "crawl_clustering_coeff": graph.crawl_clustering_coeff,
        "crawl_degrees": graph.crawl_degrees,
        "crawl_kcore": graph.crawl_kcore,
        "crawl_ktruss": graph.crawl_ktruss,
        "crawl_richclub": graph.crawl_richclub,
        "crawl_modularity": graph.crawl_modularity,
        "crawl_components": graph.crawl_components,
        "crawl_scc": graph.crawl_scc,
        "crawl_bowtie": graph.crawl_bowtie,
        "crawl_closeness": graph.crawl_closeness,
        "crawl_harmonic": graph.crawl_harmonic,
        "crawl_distance_stats": graph.crawl_distance_stats,
        "crawl_betweenness": graph.crawl_betweenness,
        "crawl_neighborhood_est": graph.crawl_neighborhood_est,
        "crawl_simrank": graph.crawl_simrank,
        "crawl_walk_corpus": graph.crawl_walk_corpus,
        "crawl_resource_allocation": graph.crawl_resource_allocation,
        "crawl_assortativity": graph.crawl_assortativity,
        "crawl_sssp": graph.crawl_sssp,
        "crawl_cocitation": graph.crawl_cocitation,
        "crawl_link_jaccard": graph.crawl_link_jaccard,
        "crawl_hoststats": _crawl_hoststats,
        "crawl_depths": _crawl_depths,
        "crawl_wave_skew": flagship.crawl_wave_skew,
        "crawl_diff": _crawl_diff,
        "crawl_revisit_plan": flagship.crawl_revisit_plan,
        "crawl_media_manifest": _crawl_media_manifest,
        "crawl_media_dedup": _crawl_media_dedup,
        # rows-only: content-defined chunk boundaries aren't
        # SQL-expressible; pinned by a pure-Python reference + the CDC
        # locality property (tests/test_session9_ops.py)
        "crawl_chunk_dedup": dedup.crawl_chunk_dedup,
        "crawl_delta_bytes": dedup.crawl_delta_bytes,
        "crawl_media_features": _crawl_media_features,
        "crawl_text_extract": flagship.crawl_text_extract,
        "crawl_pack_multimodal": flagship.crawl_pack_multimodal,
        # WARC archive source+sink round-trip
        "warc_roundtrip": warcops.warc_roundtrip,
        "warc_cdx": warcops.warc_cdx,
        # text analysis
        "token_count": textops.token_count,
        "bpe_token_count": textops.bpe_token_count,
        "winnow_fingerprint": textops.winnow_fingerprint,
        "docs_winnow_overlap_pairs": textops.winnow_overlap_pairs,
        "quality_score": textops.quality_score,
        "gopher_repetition": textops.gopher_repetition,
        "docs_gopher_filter": textops.docs_gopher_filter,
        "docs_quality_report": textops.docs_quality_report,
        "docs_c4_filter": textops.docs_c4_filter,
        "training_corpus": textops.training_corpus,
        "lang_id": textops.lang_id,
        "fingerprint": textops.fingerprint,
        # dedup family
        "exact_dedup": dedup.exact_dedup,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "docs_ngram_novelty": dedup.docs_ngram_novelty,
        "ngram_containment_pairs": dedup.ngram_containment_pairs,
        "near_dup_clusters": dedup.near_dup_clusters,
        "docs_dedup_keep_best": dedup.docs_dedup_keep_best,
        "docs_incremental_dedup": dedup.docs_incremental_dedup,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "minhash_calibration": dedup.minhash_calibration,
        "minhash_lsh_pairs_shuffled": dedup.minhash_lsh_pairs_shuffled,
        "simhash": dedup.simhash,
        "simhash_dup_pairs": dedup.simhash_dup_pairs,
        "embedding_dup_pairs": dedup.embedding_dup_pairs,
        "embedding_dup_pairs_ivf": dedup.embedding_dup_pairs_ivf,
        # SemDeDup: eps at this corpus's near-dup threshold (max pair
        # cosine is ~0.48; the paper's 0.95+ regime assumes web-scale
        # embedding density) — rows-only, numpy-reference pinned
        "semantic_dedup": lambda sf: dedup.semantic_dedup(sf, eps=0.40),
        # similarity search
        "ann_topk": ann.brute_force_topk,
        "ann_range_search": ann.range_search,
        "ann_ivf_topk": ann.ivf_topk,
        "ann_lsh_topk": ann.lsh_topk,
        "ann_pq_topk": ann.pq_topk,
        "embeddings_kmeans": ann.kmeans_assign,
        "embeddings_norm_stats": ann.embeddings_norm_stats,
        "embeddings_sq8": ann.embeddings_sq8,
        "ann_recall_report": ann.ann_recall_report,
        "ann_knn_classify": ann.ann_knn_classify,
        "embeddings_dbscan": ann.embeddings_dbscan,
        "embeddings_knn_graph": ann.embeddings_knn_graph,
        "embeddings_hard_negatives": ann.embeddings_hard_negatives,
        "embeddings_logreg": ann.embeddings_logreg,
        "embeddings_drift": ann.embeddings_drift,
        # relational / windowed
        "lineitem_agg": relops.lineitem_agg,
        "revenue_by_nation": relops.revenue_by_nation,
        "events_windowed": relops.events_windowed,
        "events_sessionize": relops.events_sessionize,
        "events_sliding": relops.events_sliding,
        "top_customers": relops.top_customers,
        "events_distinct_users": relops.events_distinct_users,
        "events_distinct_users_hll": relops.events_distinct_users_hll,
        "events_user_overlap": relops.events_user_overlap,
        "events_user_overlap_theta": relops.events_user_overlap_theta,
        "events_regression": relops.events_regression,
        "events_cusum": relops.events_cusum,
        "events_changepoint": relops.events_changepoint,
        "events_kendall_tau": relops.events_kendall_tau,
        "events_seq_support": relops.events_seq_support,
        "lineitem_group_regression": relops.lineitem_group_regression,
        "orders_abc_class": relops.orders_abc_class,
        "events_scd2": relops.events_scd2,
        "events_bootstrap_ci": relops.events_bootstrap_ci,
        "events_mannwhitney": relops.events_mannwhitney,
        "events_km_survival": relops.events_km_survival,
        "events_haar": relops.events_haar,
        "docs_vocab_growth": textops.docs_vocab_growth,
        "crawl_motifs": graph.crawl_motifs,
        "events_ohlc": relops.events_ohlc,
        "events_dispersion": relops.events_dispersion,
        "docs_simpson_diversity": textops.docs_simpson_diversity,
        "crawl_reciprocity": graph.crawl_reciprocity,
        "docs_zipf_slope": textops.docs_zipf_slope,
        "events_forecast_eval": relops.events_forecast_eval,
        "events_absorption": relops.events_absorption,
        "lineitem_price_index": relops.lineitem_price_index,
        "events_lorenz": relops.events_lorenz,
        "docs_keyness_llr": textops.docs_keyness_llr,
        "orders_latency_anova": relops.orders_latency_anova,
        "ann_mmr_topk": ann.mmr_topk,
        "events_value_mode": relops.events_value_mode,
        "events_runs_test": relops.events_runs_test,
        "events_mann_kendall": relops.events_mann_kendall,
        "docs_langid_confusion": textops.docs_langid_confusion,
        "embeddings_silhouette": ann.embeddings_silhouette,
        "referential_audit": relops.referential_audit,
        "orders_yoy_growth": relops.orders_yoy_growth,
        "customer_k_anonymity": relops.customer_k_anonymity,
        "table_stats": relops.table_stats,
        "table_fds": relops.table_fds,
        "events_value_mad": relops.events_value_mad,
        "orders_pareto": relops.orders_pareto,
        "events_value_entropy": relops.events_value_entropy,
        "events_gini": relops.events_gini,
        "events_seasonality": relops.events_seasonality,
        "customer_hhi": relops.customer_hhi,
        "lineitem_frequent_pairs": relops.lineitem_frequent_pairs,
        "lineitem_assoc_rules": relops.lineitem_assoc_rules,
        "orders_cohort_retention": relops.orders_cohort_retention,
        "events_theilsen": relops.events_theilsen,
        "events_mutual_information": relops.events_mutual_information,
        "events_ab_test": relops.events_ab_test,
        "events_user_paths": relops.events_user_paths,
        "events_ewma": relops.events_ewma,
        "events_holt": relops.events_holt,
        "events_holtwinters": relops.events_holtwinters,
        "events_acf": relops.events_acf,
        "events_ks_test": relops.events_ks_test,
        "events_welch_t": relops.events_welch_t,
        "events_benford": relops.events_benford,
        "orders_open_backlog": relops.orders_open_backlog,
        "orders_fulfillment_latency": relops.orders_fulfillment_latency,
        "events_attribution": relops.events_attribution,
        "events_spearman": relops.events_spearman,
        "events_value_median_cont": relops.events_value_median_cont,
        "events_bursts": relops.events_bursts,
        "part_price_topk_ties": relops.part_price_topk_ties,
        "events_value_quantiles": relops.events_value_quantiles,
        "events_asof_join": relops.events_asof_join,
        "events_range_join": relops.events_range_join,
        "events_rate_limit": relops.events_rate_limit,
        "events_top_users": relops.events_top_users,
        "events_top_users_cms": relops.events_top_users_cms,
        "events_top_k_per_user": relops.events_top_k_per_user,
        "events_value_rank": relops.events_value_rank,
        "events_retention": relops.events_retention,
        "events_outliers": relops.events_outliers,
        "events_funnel": relops.events_funnel,
        "events_funnel_windowed": relops.events_funnel_windowed,
        "docs_by_lang": textops.docs_by_lang,
        "docs_top_terms": textops.docs_top_terms,
        "docs_stratified_sample": textops.docs_stratified_sample,
        "docs_domain_mix": textops.docs_domain_mix,
        "docs_bm25_topk": textops.docs_bm25_topk,
        "docs_hybrid_rrf": textops.docs_hybrid_rrf,
        "docs_bpe_pairs": textops.docs_bpe_pairs,
        "docs_bpe_train": textops.docs_bpe_train,
        "docs_bpe_encode": textops.docs_bpe_encode,
        "docs_nb_classify": textops.docs_nb_classify,
        "docs_dsir_weights": textops.docs_dsir_weights,
        "docs_nfc_normalize": textops.docs_nfc_normalize,
        "docs_readability": textops.docs_readability,
        "docs_token_entropy": textops.docs_token_entropy,
        "docs_compression_ratio": textops.docs_compression_ratio,
        "docs_rake_topk": textops.docs_rake_topk,
        "docs_weighted_sample": textops.docs_weighted_sample,
        "docs_zorder_layout": textops.docs_zorder_layout,
        "docs_stratum_sample": textops.docs_stratum_sample,
        "docs_pmi_topk": textops.docs_pmi_topk,
        "q3_shipping_priority": relops.q3_shipping_priority,
        "orders_unshipped": relops.orders_unshipped,
        "orders_rapid_reorder": relops.orders_rapid_reorder,
        "q17_small_qty_revenue": relops.q17_small_qty_revenue,
        "q13_order_histogram": relops.q13_order_histogram,
        "q8_market_share": relops.q8_market_share,
        "events_markov": relops.events_markov,
        "q22_global_sales_opportunity": relops.q22_global_sales_opportunity,
        "lineitem_rollup": relops.lineitem_rollup,
        "events_cube": relops.events_cube,
        "q4_order_priority": relops.q4_order_priority,
        "q14_promo_revenue": relops.q14_promo_revenue,
        "events_daily_gapfill": relops.events_daily_gapfill,
        "events_moving_avg": relops.events_moving_avg,
        "events_interarrival": relops.events_interarrival,
        "events_first_last": relops.events_first_last,
        "events_latest_state": relops.events_latest_state,
        "events_peak_concurrency": relops.events_peak_concurrency,
        "events_watermark_agg": relops.events_watermark_agg,
        "events_trailing_7d": relops.events_trailing_7d,
        "customer_rfm": relops.customer_rfm,
        "part_type_price_stats": relops.part_type_price_stats,
        "part_skyline": relops.part_skyline,
        "events_new_vs_returning": relops.events_new_vs_returning,
        "events_trailing_7d_users": relops.events_trailing_7d_users,
        "docs_inverted_index": textops.docs_inverted_index,
        "customer_editdist_pairs": relops.customer_editdist_pairs,
        "customer_entity_clusters": relops.customer_entity_clusters,
        "events_value_winsorized": relops.events_value_winsorized,
        "events_props_hist": relops.events_props_hist,
        "customer_order_paths": relops.customer_order_paths,
        "q10_returned_revenue": relops.q10_returned_revenue,
        "events_running_total": relops.events_running_total,
        "events_value_quantiles_kll": relops.events_value_quantiles_kll,
        "embeddings_pca": ann.embeddings_pca,
        "orders_priority_pivot": relops.orders_priority_pivot,
        "orders_priority_unpivot": relops.orders_priority_unpivot,
        "docs_train_test_split": textops.docs_train_test_split,
        "docs_curriculum_order": textops.docs_curriculum_order,
        "quality_dedup_overlap": textops.quality_dedup_overlap,
        "docs_decontaminate": textops.docs_decontaminate,
        "docs_semantic_decontaminate": textops.docs_semantic_decontaminate,
        "docs_dup_ngram_fraction": textops.docs_dup_ngram_fraction,
        "docs_dup_spans": textops.docs_dup_spans,
        "docs_segment_dedup": textops.docs_segment_dedup,
        "docs_lm_score": textops.docs_lm_score,
        "docs_ccnet_buckets": textops.docs_ccnet_buckets,
        "docs_cut_dup_spans": textops.docs_cut_dup_spans,
        "docs_redact_pii": textops.docs_redact_pii,
        "docs_tfidf_topk": textops.docs_tfidf_topk,
        "docs_global_shuffle": textops.docs_global_shuffle,
        "docs_pack_sequences": textops.docs_pack_sequences,
        # TPC-H batch two (pipelines/tpch.py): the remaining classic
        # shapes feasible over these tables — q19/q21 adapted to the
        # columns that exist, mirrored in their oracles
        "q5_local_supplier_volume": tpch.q5_local_supplier_volume,
        "q6_forecast_revenue": tpch.q6_forecast_revenue,
        "q7_volume_shipping": tpch.q7_volume_shipping,
        "q15_top_supplier": tpch.q15_top_supplier,
        "q18_large_volume_customers": tpch.q18_large_volume_customers,
        "q19_discounted_revenue": tpch.q19_discounted_revenue,
        "q21_suppliers_kept_waiting": tpch.q21_suppliers_kept_waiting,
        # TPC-H batch three (pipelines/tpch2.py): the partsupp family,
        # adapted — lineitem's distinct (partkey, suppkey) pairs stand
        # in as the part↔supplier relation; completes all 22 shapes
        "q2_min_cost_supplier": tpch2.q2_min_cost_supplier,
        "q9_product_profit": tpch2.q9_product_profit,
        "q11_important_stock": tpch2.q11_important_stock,
        "q12_shipmode_priority": tpch2.q12_shipmode_priority,
        "q16_supplier_part_count": tpch2.q16_supplier_part_count,
        "q20_promo_suppliers": tpch2.q20_promo_suppliers,
        # text-format source/sink round-trips (pipelines/formats.py):
        # identity oracles — any quoting/escaping/dtype defect in the
        # distributed JSONL/CSV write+read breaks the hash
        "docs_jsonl_roundtrip": formats.docs_jsonl_roundtrip,
        "docs_arrow_roundtrip": formats.docs_arrow_roundtrip,
        "docs_webdataset_roundtrip": formats.docs_webdataset_roundtrip,
        "docs_csv_roundtrip": formats.docs_csv_roundtrip,
        "docs_tfrecord_roundtrip": formats.docs_tfrecord_roundtrip,
        # compaction: bin-pack the per-wave small files, then pass the
        # SAME recursive-CTE mirror oracle over the compacted tree
        "crawl_mirror_compacted": _crawl_mirror_compacted,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_HOST = "'site-' || (doc_id % 20) || '.test'"
_URL_CASE = f"""CASE doc_id % 4
        WHEN 0 THEN 'http://' || {_HOST} || '/a/page' || doc_id || '.html'
        WHEN 1 THEN 'http://' || {_HOST} || '/b/dir' || doc_id || '/'
        WHEN 2 THEN 'http://' || {_HOST} || '/c/noext' || doc_id
        ELSE 'http://' || {_HOST} || '/d/q' || doc_id || '?x=1&y=2'
    END"""

_CAND_CASE = """CASE doc_id % 6
        WHEN 0 THEN '///ext' || doc_id || '.test/x'
        WHEN 1 THEN '//ext' || doc_id || '.test/y'
        WHEN 2 THEN 'page' || doc_id || '.html'
        WHEN 3 THEN 'mailto:user' || doc_id || '@x.test'
        WHEN 4 THEN 'javascript:void(0)'
        ELSE 'https://other' || doc_id || '.test/z.html'
    END"""

_STOP_RE = r"\b(the|a|of|and|in)\b"
_TOKEN_RE = "[A-Za-z0-9_]+"
_PUNCT_RE = "[.,!?;:]"

_LANG_SCORES = """
    len(regexp_extract_all(lower(text), '\\b(the|a|data)\\b')) AS s_en,
    len(regexp_extract_all(lower(text), '\\b(line|part|value)\\b')) AS s_es,
    len(regexp_extract_all(lower(text), '\\b(group|window|stream)\\b')) AS s_de,
    len(regexp_extract_all(lower(text), '\\b(sort|merge|filter)\\b')) AS s_fr,
    len(regexp_extract_all(lower(text), '\\b(hash|join|scan)\\b')) AS s_zh
"""


# word-3-gram shingle CTEs shared by the Jaccard-family oracles
# (assumes every document has >= 3 tokens — true for this corpus)
_SHINGLE_CTE = r"""docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 1)) AS i FROM docs2
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     L[i] || ' ' || L[i + 1] || ' ' || L[i + 2] AS s
              FROM pos
            )"""


def _minhash_oracle_sql() -> str:
    """Bit-exact DuckDB replay of the FULL minhash pipeline — banding
    included (round 3): md5-60-bit shingle hashes reduced mod 2^31−1,
    the seeded (a, b) permutation table inlined as VALUES, per-band
    hashes as md5 of the '|'-joined decimal minhash values, candidate
    pairs from band-bucket equality, then the same exact string-shingle
    Jaccard verify the Ray path runs. Every hash is md5-derived
    precisely so this oracle can exist (suckit_ray/pipelines/dedup.py
    ``_md5h60``); products a*h + b < 2^62 are exact in BIGINT."""
    from suckit_ray.pipelines import dedup

    perms = ", ".join(
        f"({j}, {int(a)}, {int(b)})"
        for j, (a, b) in enumerate(zip(dedup._PERM_A, dedup._PERM_B))
    )
    p = dedup.MINHASH_PRIME
    rpb = dedup.NUM_PERM // dedup.LSH_BANDS
    return rf"""
            WITH {_SHINGLE_CTE},
            shh AS (
              SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % {p} AS h
              FROM sh
            ),
            perms(j, a, b) AS (VALUES {perms}),
            mh AS (
              SELECT doc_id, j, min((a * h + b) % {p}) AS v
              FROM shh CROSS JOIN perms GROUP BY doc_id, j
            ),
            bh AS (
              SELECT doc_id, j // {rpb} AS band_id,
                     ('0x' || substr(md5(array_to_string(list(v ORDER BY j), '|')), 1, 15))::BIGINT
                       AS band_hash
              FROM mh GROUP BY doc_id, j // {rpb}
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
              FROM bh x
              JOIN bh y ON x.band_id = y.band_id
                       AND x.band_hash = y.band_hash
                       AND x.doc_id < y.doc_id
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT c.a_id, c.b_id, count(*) AS i
              FROM cand c
              JOIN sh x ON x.doc_id = c.a_id
              JOIN sh y ON y.doc_id = c.b_id AND y.s = x.s
              GROUP BY 1, 2
            )
            SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
                   CAST((10000 * i) // (sa.n + sb.n - i) AS BIGINT) AS jaccard_pct
            FROM inter
            JOIN sizes sa ON sa.doc_id = a_id
            JOIN sizes sb ON sb.doc_id = b_id
            WHERE 1.0 * i / (sa.n + sb.n - i) >= 0.5
        """



def _minhash_calibration_oracle_sql() -> str:
    """The minhash replay CTEs (see ``_minhash_oracle_sql``) extended
    with a per-pair signature-component equality count — no Jaccard
    threshold, LEFT JOIN restores zero-intersection candidates."""
    from suckit_ray.pipelines import dedup

    perms = ", ".join(
        f"({j}, {int(a)}, {int(b)})"
        for j, (a, b) in enumerate(zip(dedup._PERM_A, dedup._PERM_B))
    )
    p = dedup.MINHASH_PRIME
    rpb = dedup.NUM_PERM // dedup.LSH_BANDS
    return rf"""
            WITH {_SHINGLE_CTE},
            shh AS (
              SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % {p} AS h
              FROM sh
            ),
            perms(j, a, b) AS (VALUES {perms}),
            mh AS (
              SELECT doc_id, j, min((a * h + b) % {p}) AS v
              FROM shh CROSS JOIN perms GROUP BY doc_id, j
            ),
            bh AS (
              SELECT doc_id, j // {rpb} AS band_id,
                     ('0x' || substr(md5(array_to_string(list(v ORDER BY j), '|')), 1, 15))::BIGINT
                       AS band_hash
              FROM mh GROUP BY doc_id, j // {rpb}
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
              FROM bh x
              JOIN bh y ON x.band_id = y.band_id
                       AND x.band_hash = y.band_hash
                       AND x.doc_id < y.doc_id
            ),
            eq AS (
              SELECT c.a_id, c.b_id,
                     count(*) FILTER (WHERE x.v = y.v) AS eqc
              FROM cand c
              JOIN mh x ON x.doc_id = c.a_id
              JOIN mh y ON y.doc_id = c.b_id AND y.j = x.j
              GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT c.a_id, c.b_id, count(*) AS i
              FROM cand c
              JOIN sh x ON x.doc_id = c.a_id
              JOIN sh y ON y.doc_id = c.b_id AND y.s = x.s
              GROUP BY 1, 2
            ),
            scored AS (
              SELECT e.a_id, e.b_id,
                     (10000 * e.eqc) // {dedup.NUM_PERM} AS est_pct,
                     CASE WHEN sa.n + sb.n - COALESCE(i.i, 0) = 0 THEN 0
                          ELSE CAST((10000 * COALESCE(i.i, 0))
                               // (sa.n + sb.n - COALESCE(i.i, 0)) AS BIGINT)
                     END AS jaccard_pct
              FROM eq e
              JOIN sizes sa ON sa.doc_id = e.a_id
              JOIN sizes sb ON sb.doc_id = e.b_id
              LEFT JOIN inter i ON i.a_id = e.a_id AND i.b_id = e.b_id
            )
            SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
                   CAST(est_pct AS BIGINT) AS est_pct,
                   CAST(jaccard_pct AS BIGINT) AS jaccard_pct,
                   CAST(abs(est_pct - jaccard_pct) AS BIGINT) AS abs_err
            FROM scored
        """


# SimHash fingerprint replay: 60-bit md5 token hashes (bits 60–63
# structurally 0), ±1 bit votes over the token MULTISET (UNNEST keeps
# duplicates, matching Python's text.split() iteration), sign → bit.
# Token-less docs fall out of the vote aggregation, so the LEFT JOIN
# restores them with the Python path's simhash = 0.
_SIMHASH_SIG_SQL = r"""
            WITH toks AS (
              SELECT doc_id,
                     UNNEST(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
              FROM documents
            ),
            th AS (
              SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
            ),
            votes AS (
              SELECT doc_id, k,
                     sum(CASE WHEN (h // (1::BIGINT << k)) % 2 = 1 THEN 1 ELSE -1 END) AS vote
              FROM th CROSS JOIN (SELECT UNNEST(range(0, 60)) AS k)
              GROUP BY doc_id, k
            ),
            sig AS (
              SELECT doc_id,
                     sum(CASE WHEN vote > 0 THEN (1::BIGINT << k) ELSE 0 END) AS simhash
              FROM votes GROUP BY doc_id
            )
            SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS BIGINT) AS simhash
            FROM documents d
            LEFT JOIN sig s ON s.doc_id = d.doc_id
        """


def _reach_cte(sfx: str, n_docs_expr: str, n_hosts: int = 8) -> str:
    """The synthetic-web reachability closure (BFS from page 0 of every
    host over the deterministic links_of() fanout) as a CTE block —
    THE single source of truth for the link formula across every
    crawl-backed oracle. ``sfx`` suffixes the table names so one oracle
    can hold TWO closures (crawl_diff diffs the flagship web against
    the grown-but-one-host-down v2 web); ``n_docs_expr`` is a SQL
    expression over ``(SELECT count(*) FROM documents)``."""
    return rf"""params{sfx} AS (
              SELECT {n_docs_expr} AS n_docs, {n_hosts} AS n_hosts, 16 AS n_assets
            ),
            hosts{sfx} AS (
              SELECT UNNEST(range(0, n_hosts)) AS h,
                     n_docs // n_hosts
                       + CASE WHEN UNNEST(range(0, n_hosts)) < n_docs % n_hosts
                              THEN 1 ELSE 0 END AS m,
                     n_hosts, n_assets
              FROM params{sfx}
            ),
            reach{sfx}(h, j) AS (
              SELECT h, 0 FROM hosts{sfx}
              UNION
              SELECT e.h, e.t
              FROM (
                SELECT r.h AS h, x.t AS t
                FROM reach{sfx} r
                JOIN hosts{sfx} ho ON ho.h = r.h
                CROSS JOIN LATERAL (VALUES
                  ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                  ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              ) e
            ),
            hostname{sfx} AS (
              SELECT h, 'host' || lpad(CAST(h AS VARCHAR), 4, '0') || '.test' AS hn
              FROM hosts{sfx}
            )"""


def _sig_cte(sfx: str) -> str:
    """Per-page rewritten link-span target sequence of closure ``sfx``
    — the string the Ray path hashes per page in crawl_diff."""
    return rf"""sig{sfx} AS (
              SELECT hn.hn || '//p' || r.j || '.html' AS doc_id,
                     'media:img' || ((13*r.j+7) % ho.n_assets) || '.jpg'
                       || '|link:p' || ((2*r.j+1) % ho.m) || '.html'
                       || '|link:p' || ((2*r.j+2) % ho.m) || '.html'
                       || '|link:p' || ((5*r.j+3) % ho.m) || '.html'
                       || '|link:p' || ((5*r.j+10) % ho.m) || '.html' AS sig
              FROM reach{sfx} r
              JOIN hostname{sfx} hn ON hn.h = r.h
              JOIN hosts{sfx} ho ON ho.h = r.h
            )"""


# unsuffixed instance shared by crawl_mirror / crawl_spans /
# crawl_hoststats / crawl_media_manifest
_CRAWL_REACH_CTE = _reach_cte("", "(SELECT count(*) FROM documents)")


def _simrank_step(out: str, prev: str | None) -> str:
    """One unrolled SimRank iteration as a CTE: s_{k+1}(a,b) over the
    in-edge cross join, with s_k(i,j) read from ``prev`` (iteration 1
    reads the implicit s₀ = 1e6·[i=j]). Emits BOTH orderings so the
    next step's lookup is direct; every division floors like the
    engine's integer kernel."""
    sval = (
        "CASE WHEN ea.a = eb.a THEN 1000000 ELSE 0 END"
        if prev is None
        else "CASE WHEN ea.a = eb.a THEN 1000000 ELSE COALESCE(p.s, 0) END"
    )
    joinprev = (
        ""
        if prev is None
        else f"LEFT JOIN {prev} p ON p.h = ea.h AND p.a = ea.a AND p.b = eb.a"
    )
    return f"""{out} AS (
              SELECT ea.h, ea.b AS a, eb.b AS b,
                     (4 * SUM({sval}))
                       // (5 * ia.indeg * ib.indeg) AS s
              FROM e ea
              JOIN e eb ON eb.h = ea.h AND ea.b <> eb.b
              {joinprev}
              JOIN ind ia ON ia.h = ea.h AND ia.node = ea.b
              JOIN ind ib ON ib.h = ea.h AND ib.node = eb.b
              GROUP BY ea.h, ea.b, eb.b, ia.indeg, ib.indeg
            )"""


_NEAR_DUP_CTES = r"""
            WITH RECURSIVE docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 1)) AS i FROM docs2
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     L[i] || ' ' || L[i + 1] || ' ' || L[i + 2] AS s
              FROM pos
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT a_id, b_id FROM inter
              JOIN sizes sa ON sa.doc_id = a_id
              JOIN sizes sb ON sb.doc_id = b_id
              WHERE 1.0 * i / (sa.n + sb.n - i) >= 0.5
            ),
            edges AS (
              SELECT a_id AS u, b_id AS v FROM pairs
              UNION SELECT b_id, a_id FROM pairs
            ),
            reach(id, r) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id
            ),
            clusters AS (
              SELECT CAST(id AS BIGINT) AS doc_id,
                     CAST(min(r) AS BIGINT) AS cluster_id
              FROM reach GROUP BY id
            )"""
"""The exact-Jaccard near-dup closure ending in a ``clusters`` CTE —
shared by the near_dup_clusters oracle and every oracle that composes
on top of the cluster labels (docs_dedup_keep_best), so the pair
threshold and BFS can't drift between them."""


_LM_SCORE_SQL = r"""
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (SELECT doc_id, L, UNNEST(range(1, len(L))) AS i FROM docs2),
            big AS (SELECT doc_id, L[i] AS w1, L[i+1] AS w2 FROM pos),
            c2 AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cc FROM c2 GROUP BY w1),
            vv AS (SELECT count(DISTINCT t) AS V
                   FROM (SELECT UNNEST(L) AS t FROM docs2)),
            scored AS (
              SELECT b.doc_id,
                     CAST(floor(-ln((c2.c + 1.0) / (c1.cc + vv.V))
                                * 1000000.0) AS BIGINT) AS nll
              FROM big b
              JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
              JOIN c1 ON b.w1 = c1.w1
              CROSS JOIN vv
            )
            SELECT d.doc_id,
                   CAST(count(s.nll) AS BIGINT) AS n_bigrams,
                   CAST(coalesce(sum(s.nll), 0) AS BIGINT) AS nll_micro,
                   CAST(coalesce(sum(s.nll), 0)
                        // greatest(count(s.nll), 1) AS BIGINT) AS avg_nll_micro
            FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
            GROUP BY d.doc_id
        """
"""Per-doc bigram-LM scores — docs_lm_score's full oracle, shared by
every oracle that composes on the scores (docs_ccnet_buckets), so the
smoothing and quantization can't drift between them."""


def _fanout_values(r: str, ho: str) -> str:
    """The synthetic links_of() fanout as a LATERAL VALUES block —
    the same formula `_reach_cte` recurses over, factored out so the
    depth-labeled and edge-multiset oracles below can't drift from
    it (aliases parameterized because each oracle binds its own
    reach/hosts rows)."""
    return (
        f"(VALUES ((2*{r}.j+1) % {ho}.m), ((2*{r}.j+2) % {ho}.m), "
        f"((5*{r}.j+3) % {ho}.m), ((5*{r}.j+10) % {ho}.m))"
    )


def _xlx(e: str) -> str:
    """floor(x·ln(x)·10^6) as BIGINT with the x<=0 → 0 limit — the
    entropy-term quantizer of the docs_keyness_llr oracle (must
    mirror relops/textops' math.floor(x*math.log(x)*1e6))."""
    return (
        f"(CASE WHEN ({e}) <= 0 THEN 0 ELSE "
        f"CAST(floor(({e}) * ln(CAST(({e}) AS DOUBLE)) * 1000000) "
        f"AS BIGINT) END)"
    )


def _hits_oracle_sql(iters: int = 5, scale: int = 10**9) -> str:
    """Integer HITS over the reachability closure, mirrored half-round
    by half-round: raw in-sums along edges, then one global scalar
    divisor d = max(Σ // S, 1) — all floors, so the distributed run
    (suckit_ray.pipelines.graph.hits_from_docs) hash-matches."""
    head = rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            nodes AS MATERIALIZED (SELECT h, j FROM reach),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
            edges AS MATERIALIZED (
              SELECT r.h AS h, r.j AS src, x.t AS dst
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
            ),
            h0 AS (
              SELECT h, j, {scale} // (SELECT n FROM nn) AS r FROM nodes
            )"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f""",
            ar{k}r AS MATERIALIZED (
              SELECT e.h, e.dst AS j, SUM(hk.r) AS r
              FROM edges e
              JOIN h{k - 1} hk ON hk.h = e.h AND hk.j = e.src
              JOIN nodes n2 ON n2.h = e.h AND n2.j = e.dst
              GROUP BY e.h, e.dst
            ),
            ar{k}t AS (
              SELECT GREATEST(COALESCE(SUM(r), 0) // {scale}, 1) AS d
              FROM ar{k}r
            ),
            a{k} AS MATERIALIZED (
              SELECT n.h, n.j,
                     COALESCE(ar.r, 0) // (SELECT d FROM ar{k}t) AS r
              FROM nodes n
              LEFT JOIN ar{k}r ar ON ar.h = n.h AND ar.j = n.j
            ),
            hr{k}r AS MATERIALIZED (
              SELECT e.h, e.src AS j, SUM(ak.r) AS r
              FROM edges e
              JOIN a{k} ak ON ak.h = e.h AND ak.j = e.dst
              JOIN nodes n2 ON n2.h = e.h AND n2.j = e.src
              GROUP BY e.h, e.src
            ),
            hr{k}t AS (
              SELECT GREATEST(COALESCE(SUM(r), 0) // {scale}, 1) AS d
              FROM hr{k}r
            ),
            h{k} AS MATERIALIZED (
              SELECT n.h, n.j,
                     COALESCE(hr.r, 0) // (SELECT d FROM hr{k}t) AS r
              FROM nodes n
              LEFT JOIN hr{k}r hr ON hr.h = n.h AND hr.j = n.j
            )"""
        )
    tail = f"""
            SELECT hn.hn || '/p' || n.j || '.html' AS doc_id,
                   CAST(hh.r AS BIGINT) AS hub_nano,
                   CAST(aa.r AS BIGINT) AS auth_nano
            FROM nodes n
            JOIN h{iters} hh ON hh.h = n.h AND hh.j = n.j
            JOIN a{iters} aa ON aa.h = n.h AND aa.j = n.j
            JOIN hostname hn ON hn.h = n.h
        """
    return head + "".join(steps) + tail


def _pagerank_exact_oracle_sql(iters: int = 10, scale: int = 10**12) -> str:
    """All-integer PageRank over the reachability closure, mirrored
    step by step: rank in 10^-12 units, per-edge contribution
    (85·r)//(100·deg) and teleport (15·S)//(100·n) — every division a
    floor, so integer sums make the result reduction-order-exact and
    the unrolled ``iters`` CTE steps hash-match the distributed run
    (suckit_ray.pipelines.graph.pagerank_exact_from_docs). Node ids
    are normpath'd (single slash), unlike the mirror's raw doc_ids."""
    head = rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            nodes AS MATERIALIZED (SELECT h, j FROM reach),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
            edges AS MATERIALIZED (
              SELECT r.h AS h, r.j AS src, x.t AS dst
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
            ),
            deg AS MATERIALIZED (
              SELECT h, src, CAST(count(*) AS BIGINT) AS d
              FROM edges GROUP BY h, src
            ),
            r0 AS (
              SELECT h, j, {scale} // (SELECT n FROM nn) AS r FROM nodes
            )"""
    steps = []
    for k in range(iters):
        steps.append(
            f""",
            r{k + 1} AS MATERIALIZED (
              SELECT n.h, n.j,
                     (15 * {scale}) // (100 * nn.n)
                       + COALESCE(m.s, 0) AS r
              FROM nodes n CROSS JOIN nn
              LEFT JOIN (
                SELECT e.h, e.dst AS j,
                       SUM((85 * rk.r) // (100 * dg.d)) AS s
                FROM edges e
                JOIN r{k} rk ON rk.h = e.h AND rk.j = e.src
                JOIN deg dg ON dg.h = e.h AND dg.src = e.src
                GROUP BY e.h, e.dst
              ) m ON m.h = n.h AND m.j = n.j
            )"""
        )
    tail = f"""
            SELECT hn.hn || '/p' || r.j || '.html' AS doc_id,
                   CAST(r.r AS BIGINT) AS rank_pico
            FROM r{iters} r JOIN hostname hn ON hn.h = r.h
        """
    return head + "".join(steps) + tail


def _kcore_oracle_sql(k: int = 2, rounds: int = 8) -> str:
    """The k-core of the mirror's undirected simple link graph via
    UNROLLED simultaneous peeling (each step drops every node whose
    within-alive degree < k; the fixpoint is the unique maximal k-core
    and extra rounds past it are idempotent, so a fixed unroll depth ≥
    the graph's peel depth is EXACT — the measured peel depth of the
    synthetic web is 0 at every sf because each page keeps ≥ 2
    undirected neighbors, and the engine raises rather than return a
    superset if its own loop ever exhausts, so depth mismatches are
    loud, not silent). Mirrors graph.kcore_from_docs: self-loops
    dropped, (min,max)-dedup'd undirected edges, normpath'd node ids,
    output = core nodes with their within-core degree."""
    head = rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            de AS (
              SELECT r.h AS h, r.j AS a, x.t AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
            ),
            ue AS MATERIALIZED (
              SELECT DISTINCT h, LEAST(a, b) AS a, GREATEST(a, b) AS b
              FROM de WHERE a <> b
            ),
            half AS MATERIALIZED (
              SELECT h, a AS node, b AS peer FROM ue
              UNION ALL
              SELECT h, b AS node, a AS peer FROM ue
            ),
            a0 AS MATERIALIZED (
              SELECT h, node FROM (
                SELECT h, node, count(*) AS c FROM half GROUP BY 1, 2
              ) WHERE c >= {k}
            )"""
    steps = []
    for i in range(rounds):
        steps.append(
            f""",
            a{i + 1} AS MATERIALIZED (
              SELECT h, node FROM (
                SELECT hf.h, hf.node, count(*) AS c
                FROM half hf
                JOIN a{i} s ON s.h = hf.h AND s.node = hf.node
                JOIN a{i} p ON p.h = hf.h AND p.node = hf.peer
                GROUP BY 1, 2
              ) WHERE c >= {k}
            )"""
        )
    tail = f"""
            SELECT hn.hn || '/p' || f.node || '.html' AS doc_id,
                   CAST(f.c AS BIGINT) AS core_degree
            FROM (
              SELECT hf.h, hf.node, count(*) AS c
              FROM half hf
              JOIN a{rounds} s ON s.h = hf.h AND s.node = hf.node
              JOIN a{rounds} p ON p.h = hf.h AND p.node = hf.peer
              GROUP BY 1, 2
            ) f JOIN hostname hn ON hn.h = f.h
        """
    return head + "".join(steps) + tail


def _ktruss_oracle_sql(k: int = 3, rounds: int = 4) -> str:
    """The k-truss via UNROLLED edge peeling: per step, keep every
    edge in ≥ k−2 triangles of the current subgraph (triangles
    enumerated once from their smallest vertex: e1=(u,v), e2=(u,w)
    w>v, closing edge (v,w)). Idempotent past the fixpoint like the
    kcore peel (measured peel depth of the synthetic web: 1 at every
    sf; the engine raises on loop exhaustion, keeping any depth
    mismatch loud). The peel runs on integer-canonical per-host
    pairs — the unordered edge set is order-independent — and the
    OUTPUT pair re-canonicalizes on the rendered doc_id strings to
    match the engine's lexicographic (src < dst)."""
    thresh = k - 2

    def tri_sup(i: int) -> str:
        return f""",
            tri{i} AS (
              SELECT e1.h, e1.a AS u, e1.b AS v, e2.b AS w
              FROM e{i} e1
              JOIN e{i} e2 ON e2.h = e1.h AND e2.a = e1.a
                          AND e2.b > e1.b
              JOIN e{i} e3 ON e3.h = e1.h AND e3.a = e1.b
                          AND e3.b = e2.b
            ),
            sup{i} AS MATERIALIZED (
              SELECT h, a, b, CAST(count(*) AS BIGINT) AS s FROM (
                SELECT h, u AS a, v AS b FROM tri{i}
                UNION ALL SELECT h, u AS a, w AS b FROM tri{i}
                UNION ALL SELECT h, v AS a, w AS b FROM tri{i}
              ) GROUP BY 1, 2, 3
            )"""

    head = rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e0 AS MATERIALIZED (
              SELECT DISTINCT r.h, LEAST(r.j, x.t) AS a,
                     GREATEST(r.j, x.t) AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
              WHERE r.j <> x.t
            )"""
    steps = []
    for i in range(rounds):
        steps.append(tri_sup(i))
        steps.append(
            f""",
            e{i + 1} AS MATERIALIZED (
              SELECT h, a, b FROM sup{i} WHERE s >= {thresh}
            )"""
        )
    steps.append(tri_sup(rounds))
    tail = f"""
            SELECT LEAST(hn.hn || '/p' || f.a || '.html',
                         hn.hn || '/p' || f.b || '.html') AS src,
                   GREATEST(hn.hn || '/p' || f.a || '.html',
                            hn.hn || '/p' || f.b || '.html') AS dst,
                   f.s AS support
            FROM sup{rounds} f
            JOIN hostname hn ON hn.h = f.h
            WHERE f.s >= {thresh}
        """
    return head + "".join(steps) + tail


def _trustrank_oracle_sql(iters: int = 10, scale: int = 10**12) -> str:
    """All-integer TrustRank (personalized PageRank) mirrored step by
    step: identical arithmetic to ``_pagerank_exact_oracle_sql`` except
    initial mass and the per-round teleport go only to the seed nodes
    (page 0 of every host — the crawl seeds), divided by |seeds|; every
    other node starts at 0 and receives teleport 0 (see
    suckit_ray.pipelines.graph.trustrank_exact_from_docs)."""
    head = rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            nodes AS MATERIALIZED (SELECT h, j FROM reach),
            ns AS (
              SELECT CAST(count(*) AS BIGINT) AS n FROM hosts WHERE m > 0
            ),
            edges AS MATERIALIZED (
              SELECT r.h AS h, r.j AS src, x.t AS dst
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
            ),
            deg AS MATERIALIZED (
              SELECT h, src, CAST(count(*) AS BIGINT) AS d
              FROM edges GROUP BY h, src
            ),
            r0 AS (
              SELECT h, j,
                     CASE WHEN j = 0 THEN {scale} // (SELECT n FROM ns)
                          ELSE 0 END AS r
              FROM nodes
            )"""
    steps = []
    for k in range(iters):
        steps.append(
            f""",
            r{k + 1} AS MATERIALIZED (
              SELECT n.h, n.j,
                     CASE WHEN n.j = 0
                          THEN (15 * {scale}) // (100 * ns.n)
                          ELSE 0 END
                       + COALESCE(m.s, 0) AS r
              FROM nodes n CROSS JOIN ns
              LEFT JOIN (
                SELECT e.h, e.dst AS j,
                       SUM((85 * rk.r) // (100 * dg.d)) AS s
                FROM edges e
                JOIN r{k} rk ON rk.h = e.h AND rk.j = e.src
                JOIN deg dg ON dg.h = e.h AND dg.src = e.src
                GROUP BY e.h, e.dst
              ) m ON m.h = n.h AND m.j = n.j
            )"""
        )
    tail = f"""
            SELECT hn.hn || '/p' || r.j || '.html' AS doc_id,
                   CAST(r.r AS BIGINT) AS trust_pico
            FROM r{iters} r JOIN hostname hn ON hn.h = r.h
        """
    return head + "".join(steps) + tail


def _lpa_oracle_sql(rounds: int = 4) -> str:
    """Synchronous label propagation mirrored round by round: labels
    start as each node's own id; every round a node adopts the most
    frequent label among its UNDIRECTED multigraph neighbors
    (ROW_NUMBER over per-(node,label) counts), ties to the
    lexicographically smallest label STRING — the exact total order
    the engine sorts by (within a host the full doc_id order reduces
    to the 'p<j>.html' order used here); isolated nodes keep their
    own label (see suckit_ray.pipelines.graph.lpa_communities_from_docs)."""
    head = rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            nodes AS MATERIALIZED (SELECT h, j FROM reach),
            edges AS MATERIALIZED (
              SELECT r.h AS h, r.j AS src, x.t AS dst
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
            ),
            sym AS MATERIALIZED (
              SELECT h, src AS u, dst AS v FROM edges
              UNION ALL
              SELECT h, dst AS u, src AS v FROM edges
            ),
            l0 AS (SELECT h, j, j AS lab FROM nodes)"""
    steps = []
    for k in range(rounds):
        steps.append(
            f""",
            l{k + 1} AS MATERIALIZED (
              SELECT n.h, n.j, COALESCE(w.lab, lk.lab) AS lab
              FROM nodes n
              JOIN l{k} lk ON lk.h = n.h AND lk.j = n.j
              LEFT JOIN (
                SELECT h, v AS j, lab FROM (
                  SELECT e.h, e.v, lx.lab,
                         ROW_NUMBER() OVER (
                           PARTITION BY e.h, e.v
                           ORDER BY count(*) DESC,
                                    'p' || lx.lab || '.html') AS rk
                  FROM sym e
                  JOIN l{k} lx ON lx.h = e.h AND lx.j = e.u
                  GROUP BY e.h, e.v, lx.lab
                ) WHERE rk = 1
              ) w ON w.h = n.h AND w.j = n.j
            )"""
        )
    tail = f"""
            SELECT hn.hn || '/p' || l.j || '.html' AS doc_id,
                   hn.hn || '/p' || l.lab || '.html' AS community
            FROM l{rounds} l JOIN hostname hn ON hn.h = l.h
        """
    return head + "".join(steps) + tail


def _modularity_oracle_sql(rounds: int = 4) -> str:
    """Newman modularity of the LPA communities over the undirected
    SIMPLE link graph: per community c, the quantized term
    (10⁶·e_c)//m − (10⁶·d_c²)//(4m²) — the integer-ratio spelling on
    both engines (repo invariant), HUGEINT through the squares. The
    label CTEs are the exact `_lpa_oracle_sql` unroll; the edge set
    here is SIMPLE (LEAST/GREATEST DISTINCT) because degrees and e_c
    count relationships, not link multiplicity — LPA's vote keeps
    using the multigraph, matching the engine's definitions."""
    lpa = _lpa_oracle_sql(rounds)
    head, _, _tail = lpa.rpartition("SELECT hn.hn")
    return (
        head
        + f""",
            ue AS MATERIALIZED (
              SELECT DISTINCT h, LEAST(src, dst) AS a,
                     GREATEST(src, dst) AS b
              FROM edges WHERE src <> dst
            ),
            half AS (
              SELECT h, a AS node FROM ue
              UNION ALL SELECT h, b AS node FROM ue
            ),
            dg AS (
              SELECT h, node, CAST(count(*) AS BIGINT) AS d
              FROM half GROUP BY 1, 2
            ),
            mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ue),
            dc AS (
              SELECT l.h, l.lab, CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(SUM(COALESCE(dg.d, 0)) AS BIGINT) AS d_tot
              FROM l{rounds} l
              LEFT JOIN dg ON dg.h = l.h AND dg.node = l.j
              GROUP BY 1, 2
            ),
            ec AS (
              SELECT la.h, la.lab, CAST(count(*) AS BIGINT) AS e_in
              FROM ue
              JOIN l{rounds} la ON la.h = ue.h AND la.j = ue.a
              JOIN l{rounds} lb ON lb.h = ue.h AND lb.j = ue.b
              WHERE la.lab = lb.lab
              GROUP BY 1, 2
            )
            SELECT hn.hn || '/p' || dc.lab || '.html' AS community,
                   dc.n_nodes,
                   CAST(COALESCE(ec.e_in, 0) AS BIGINT) AS e_in,
                   dc.d_tot,
                   CAST((1000000 * CAST(COALESCE(ec.e_in, 0) AS HUGEINT))
                          // (SELECT m FROM mm)
                        - (1000000 * CAST(dc.d_tot AS HUGEINT)
                                   * CAST(dc.d_tot AS HUGEINT))
                          // (4 * CAST((SELECT m FROM mm) AS HUGEINT)
                                * CAST((SELECT m FROM mm) AS HUGEINT))
                        AS BIGINT) AS term_micro
            FROM dc
            LEFT JOIN ec ON ec.h = dc.h AND ec.lab = dc.lab
            JOIN hostname hn ON hn.h = dc.h
        """
    )


def _bpe_ctes(steps: int = 5) -> str:
    """Shared chained CTEs mirroring docs_bpe_train: per step, weighted
    char-pair counts over the current vocabulary, argmax by
    (n DESC, pair ASC), then replace(pair -> chr(0x100+step)) rewrites
    the vocabulary for the next round — the same surrogate-symbol
    representation the Ray side uses, so merges are bit-identical."""
    ctes = [
        "w0 AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM "
        "(SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w "
        "FROM documents) GROUP BY w)"
    ]
    for i in range(steps):
        ctes.append(
            f"p{i} AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, "
            f"CAST(SUM(f) AS BIGINT) AS n "
            f"FROM w{i}, LATERAL unnest(generate_series(1, len(w) - 1)) t(i) "
            f"WHERE len(w) >= 2 GROUP BY 1)"
        )
        ctes.append(
            f"t{i} AS (SELECT pair, n FROM p{i} ORDER BY n DESC, pair LIMIT 1)"
        )
        if i < steps - 1:
            ctes.append(
                f"w{i + 1} AS (SELECT replace(w, (SELECT pair FROM t{i}), "
                f"chr({0x100 + i})) AS w, f FROM w{i})"
            )
    return "WITH " + ",\n".join(ctes)


def _bpe_train_oracle_sql(steps: int = 5) -> str:
    union = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, pair, n FROM t{i}"
        for i in range(steps)
    )
    return _bpe_ctes(steps) + "\n" + union


def _bpe_encode_oracle_sql(steps: int = 5) -> str:
    """docs_bpe_encode mirror: nested replace() applies the learned
    merges to every doc's lowercased text (merge pairs contain only
    word/surrogate chars, so whole-text replace == per-word replace),
    then count remaining word-or-surrogate symbols."""
    x = "lower(text)"
    for i in range(steps):
        x = f"replace({x}, (SELECT pair FROM t{i}), chr({0x100 + i}))"
    hi = 0x100 + steps - 1
    return (
        _bpe_ctes(steps)
        + f""",
        enc AS (SELECT doc_id, {x} AS x FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(x,
                 '[a-z0-9_\\x{{0100}}-\\x{{{hi:04x}}}]')) AS BIGINT)
                 AS n_symbols
        FROM enc"""
    )


def oracle_sql() -> dict[str, str]:
    from suckit_ray.pipelines.relops import REGRESSION_ANCHOR_MIN

    d = {
        "url_to_path": f"""
            SELECT doc_id, {_URL_CASE} AS url,
              CASE doc_id % 4
                WHEN 0 THEN {_HOST} || '/a/page' || doc_id || '.html'
                WHEN 1 THEN {_HOST} || '/b/dir' || doc_id || '/index.html'
                WHEN 2 THEN {_HOST} || '/c/noext' || doc_id || '/index_no_slash.html'
                ELSE {_HOST} || '/d/q' || doc_id || '__querystring__x=1&y=2/index_no_slash.html'
              END AS path
            FROM documents
        """,
        "normalize_url": f"""
            SELECT doc_id, {_CAND_CASE} AS candidate,
              CASE doc_id % 6
                WHEN 0 THEN 'https://ext' || doc_id || '.test/x'
                WHEN 1 THEN 'https://ext' || doc_id || '.test/y'
                ELSE {_CAND_CASE}
              END AS normalized
            FROM documents
        """,
        "should_visit": f"""
            SELECT doc_id, {_CAND_CASE} AS candidate,
                   (doc_id % 6) NOT IN (3, 4) AS visit
            FROM documents
        """,
        "is_external": f"""
            SELECT doc_id, {_CAND_CASE} AS candidate,
                   (doc_id % 6) <> 2 AS external
            FROM documents
        """,
        "token_count": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "bpe_token_count": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "quality_score": f"""
            WITH c AS (
              SELECT doc_id,
                CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT) AS n_tokens,
                CAST(len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS BIGINT) AS n_stopwords,
                CAST(len(regexp_extract_all(text, '{_PUNCT_RE}')) AS BIGINT) AS n_punct
              FROM documents)
            SELECT doc_id, n_tokens, n_stopwords, n_punct,
                   (n_tokens >= 20 AND n_stopwords >= 1) AS is_quality
            FROM c
        """,
        # end-to-end curation: quality gate ∧ near-dup-cluster
        # representative (min-label propagation), per-lang accounting
        "training_corpus": r"""
            WITH RECURSIVE docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 1)) AS i FROM docs2
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     L[i] || ' ' || L[i + 1] || ' ' || L[i + 2] AS s
              FROM pos
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            ),
            prs AS (
              SELECT a_id, b_id FROM inter
              JOIN sizes sa ON sa.doc_id = a_id
              JOIN sizes sb ON sb.doc_id = b_id
              WHERE 1.0 * i / (sa.n + sb.n - i) >= 0.5
            ),
            edges AS (
              SELECT a_id AS u, b_id AS v FROM prs
              UNION SELECT b_id, a_id FROM prs
            ),
            reach(id, r) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id
            ),
            comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
            q AS (
              SELECT doc_id, lang,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens,
                len(regexp_extract_all(lower(text), '\b(the|a|of|and|in)\b')) AS n_stop
              FROM documents
            ),
            keep AS (
              SELECT q.lang, q.n_tokens FROM q
              JOIN comp c ON c.id = q.doc_id
              WHERE q.n_tokens >= 20 AND q.n_stop >= 1 AND c.root = q.doc_id
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
            FROM keep GROUP BY lang
        """,
        # Gopher repetition signals (integer-scaled): most-frequent
        # word/bigram share + mean word length per doc
        "gopher_repetition": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            base AS (SELECT doc_id, len(L) AS n FROM toks),
            words AS (SELECT doc_id, UNNEST(L) AS w FROM toks),
            wcnt AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
            topw AS (SELECT doc_id, max(c) AS mc FROM wcnt GROUP BY 1),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L))) AS i
              FROM toks WHERE len(L) >= 2
            ),
            bg AS (SELECT doc_id, L[i] || ' ' || L[i + 1] AS b FROM pos),
            bcnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
            topb AS (SELECT doc_id, max(c) AS mc FROM bcnt GROUP BY 1),
            lens AS (SELECT doc_id, sum(length(w)) AS tl FROM words GROUP BY 1)
            SELECT b.doc_id,
                   CAST(b.n AS BIGINT) AS n_words,
                   CAST(CASE WHEN b.n = 0 THEN 0 ELSE 100 * l.tl // b.n END AS BIGINT)
                     AS mean_word_len_c,
                   CAST(CASE WHEN b.n = 0 THEN 0 ELSE 10000 * tw.mc // b.n END AS BIGINT)
                     AS top_word_pct,
                   CAST(COALESCE(10000 * tb.mc // (b.n - 1), 0) AS BIGINT)
                     AS top_bigram_pct
            FROM base b
            LEFT JOIN lens l USING (doc_id)
            LEFT JOIN topw tw USING (doc_id)
            LEFT JOIN topb tb USING (doc_id)
        """,
        # full Gopher rule set (Rae et al. 2021 Table A1): every count
        # is the SAME non-overlapping regex both engines run, every
        # threshold an integer cross-multiplied inequality
        # C4 line+page cleaning: kept lines re-joined in doc order
        # must match byte-for-byte (string_agg ORDER BY line index)
        "docs_c4_filter": r"""
            WITH l AS (
              SELECT doc_id,
                     generate_subscripts(ls, 1) AS idx,
                     unnest(ls) AS line
              FROM (SELECT doc_id,
                           string_split(COALESCE(text, ''), chr(10)) AS ls
                    FROM documents)
            ),
            k AS (
              SELECT doc_id, idx, line FROM l
              WHERE regexp_matches(
                      rtrim(line, ' ' || chr(9) || chr(13)),
                      '[.!?"”]$')
                AND len(regexp_extract_all(line, '\S+')) >= 3
                AND NOT contains(lower(line), 'javascript')
            ),
            kt AS (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY idx) AS kept_text,
                     CAST(count(*) AS BIGINT) AS n_kept
              FROM k GROUP BY doc_id
            ),
            pg AS (
              SELECT d.doc_id,
                     CAST(len(string_split(COALESCE(d.text, ''), chr(10)))
                          AS BIGINT) AS n_lines,
                     COALESCE(kt.n_kept, 0) AS n_kept,
                     COALESCE(kt.kept_text, '') AS kept_text,
                     CAST(len(regexp_extract_all(
                            COALESCE(kt.kept_text, ''), '[.!?]+'))
                          AS BIGINT) AS n_sentences,
                     contains(lower(COALESCE(d.text, '')), 'lorem ipsum')
                       AS lorem,
                     contains(COALESCE(d.text, ''), '{') AS brace
              FROM documents d LEFT JOIN kt ON kt.doc_id = d.doc_id
            )
            SELECT doc_id, n_lines, n_kept, n_sentences, kept_text,
                   (n_sentences >= 5 AND NOT lorem AND NOT brace) AS keep
            FROM pg
        """,
        "docs_gopher_filter": r"""
            WITH c AS (
              SELECT doc_id,
                CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
                CAST(len(regexp_extract_all(text, '\S')) AS BIGINT) AS total_len,
                CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS BIGINT) AS n_alpha,
                CAST(len(regexp_extract_all(text, '#'))
                   + len(regexp_extract_all(text, '\.\.\.'))
                   + len(regexp_extract_all(text, '…')) AS BIGINT) AS n_sym,
                CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
                CAST(len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]')) AS BIGINT) AS n_bullet,
                CAST(len(regexp_extract_all(text, '(?m)(?:\.\.\.|…)[ \t]*$')) AS BIGINT) AS n_ell_end,
                CAST(CASE WHEN regexp_matches(lower(text), '\bthe\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bbe\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bto\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bof\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\band\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bthat\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bhave\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bwith\b') THEN 1 ELSE 0 END
                  AS BIGINT) AS n_stop_types
              FROM documents),
            r AS (
              SELECT doc_id, n_words, n_lines, n_stop_types,
                (n_words >= 50 AND n_words <= 100000) AS r_words,
                (3 * n_words <= total_len AND total_len <= 10 * n_words) AS r_mean_len,
                (10 * n_sym <= n_words) AS r_symbol,
                (10 * n_bullet <= 9 * n_lines) AS r_bullet,
                (10 * n_ell_end <= 3 * n_lines) AS r_ellipsis,
                (5 * n_alpha >= 4 * n_words) AS r_alpha,
                (n_stop_types >= 2) AS r_stop
              FROM c)
            SELECT doc_id, n_words, n_lines, n_stop_types,
                   r_words, r_mean_len, r_symbol, r_bullet, r_ellipsis,
                   r_alpha, r_stop,
                   (r_words AND r_mean_len AND r_symbol AND r_bullet
                    AND r_ellipsis AND r_alpha AND r_stop) AS keep
            FROM r
        """,
        "lang_id": f"""
            WITH s AS (SELECT doc_id, {_LANG_SCORES} FROM documents)
            SELECT doc_id,
              CASE
                WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh'
              END AS pred_lang
            FROM s
        """,
        # confusion matrix of the heuristic lang_id vs true labels;
        # prediction CTE shared with the lang_id oracle's scores
        "docs_langid_confusion": f"""
            WITH s AS (
              SELECT doc_id, lang, {_LANG_SCORES} FROM documents
            ),
            p AS (
              SELECT lang AS actual_lang,
                CASE
                  WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr
                       AND s_en >= s_zh THEN 'en'
                  WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh
                       THEN 'es'
                  WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
                  WHEN s_fr >= s_zh THEN 'fr'
                  ELSE 'zh'
                END AS pred_lang
              FROM s
            )
            SELECT actual_lang, pred_lang,
                   CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY 1, 2
        """,
        "fingerprint": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        # winnowing (Schleimer/Wilkerson/Aiken): k=8-gram polynomial
        # hashes base 257 mod 2^61-1 (terms in HUGEINT — max term
        # 255·257^7 ≈ 1.9e19 overflows BIGINT), window W=16 sliding
        # min, distinct fingerprints per doc. ord(substr) == utf-8 byte
        # because the corpus is ASCII (asserted in tests).
        # MOSS shared-fingerprint pairs: the winnow replay CTE + a
        # max-df boilerplate guard + self-join (mirrors the engine's
        # per-fp pairing exactly)
        "docs_winnow_overlap_pairs": """
            WITH pos AS (
              SELECT doc_id, len(text) - 7 AS g, text,
                     UNNEST(range(1, len(text) - 6)) AS i
              FROM documents WHERE len(text) >= 8
            ),
            h AS (
              SELECT doc_id, g, i,
                CAST((
                  CAST(ord(substr(text, CAST(i + 0 AS INT), 1)) AS HUGEINT) * 74051159531521793
                + CAST(ord(substr(text, CAST(i + 1 AS INT), 1)) AS HUGEINT) * 288136807515649
                + CAST(ord(substr(text, CAST(i + 2 AS INT), 1)) AS HUGEINT) * 1121154893057
                + CAST(ord(substr(text, CAST(i + 3 AS INT), 1)) AS HUGEINT) * 4362470401
                + CAST(ord(substr(text, CAST(i + 4 AS INT), 1)) AS HUGEINT) * 16974593
                + CAST(ord(substr(text, CAST(i + 5 AS INT), 1)) AS HUGEINT) * 66049
                + CAST(ord(substr(text, CAST(i + 6 AS INT), 1)) AS HUGEINT) * 257
                + CAST(ord(substr(text, CAST(i + 7 AS INT), 1)) AS HUGEINT)
                ) % 2305843009213693951 AS BIGINT) AS hv
              FROM pos
            ),
            w AS (
              SELECT doc_id, g, i,
                     min(hv) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wmin
              FROM h
            ),
            f AS (SELECT doc_id, g, wmin FROM w WHERE i <= greatest(1, g - 15)),
            fps AS (SELECT DISTINCT doc_id, wmin FROM f),
            okfp AS (
              SELECT wmin FROM fps GROUP BY wmin HAVING count(*) <= 50
            ),
            kept AS (SELECT fps.* FROM fps JOIN okfp USING (wmin))
            SELECT CAST(x.doc_id AS BIGINT) AS a_id,
                   CAST(y.doc_id AS BIGINT) AS b_id,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM kept x
            JOIN kept y ON y.wmin = x.wmin AND y.doc_id > x.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "winnow_fingerprint": """
            WITH pos AS (
              SELECT doc_id, len(text) - 7 AS g, text,
                     UNNEST(range(1, len(text) - 6)) AS i
              FROM documents WHERE len(text) >= 8
            ),
            h AS (
              SELECT doc_id, g, i,
                CAST((
                  CAST(ord(substr(text, CAST(i + 0 AS INT), 1)) AS HUGEINT) * 74051159531521793
                + CAST(ord(substr(text, CAST(i + 1 AS INT), 1)) AS HUGEINT) * 288136807515649
                + CAST(ord(substr(text, CAST(i + 2 AS INT), 1)) AS HUGEINT) * 1121154893057
                + CAST(ord(substr(text, CAST(i + 3 AS INT), 1)) AS HUGEINT) * 4362470401
                + CAST(ord(substr(text, CAST(i + 4 AS INT), 1)) AS HUGEINT) * 16974593
                + CAST(ord(substr(text, CAST(i + 5 AS INT), 1)) AS HUGEINT) * 66049
                + CAST(ord(substr(text, CAST(i + 6 AS INT), 1)) AS HUGEINT) * 257
                + CAST(ord(substr(text, CAST(i + 7 AS INT), 1)) AS HUGEINT)
                ) % 2305843009213693951 AS BIGINT) AS hv
              FROM pos
            ),
            w AS (
              SELECT doc_id, g, i,
                     min(hv) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wmin
              FROM h
            ),
            f AS (SELECT doc_id, g, wmin FROM w WHERE i <= greatest(1, g - 15))
            SELECT doc_id, CAST(max(g) AS BIGINT) AS n_grams,
                   CAST(count(DISTINCT wmin) AS BIGINT) AS n_fps,
                   CAST(min(wmin) AS BIGINT) AS min_fp
            FROM f GROUP BY doc_id
            UNION ALL
            SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            FROM documents WHERE len(text) < 8
        """,
        "warc_roundtrip": """
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        "exact_dedup": """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        # per-doc novelty contribution in doc_id order: shingle first
        # occurrences via min(doc_id), exact integer pct
        "docs_ngram_novelty": rf"""
            WITH {_SHINGLE_CTE},
            firsts AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
            per AS (
              SELECT sh.doc_id, count(*) AS n_shingles,
                     SUM(CASE WHEN f.first_doc = sh.doc_id
                              THEN 1 ELSE 0 END) AS n_novel
              FROM sh JOIN firsts f USING (s) GROUP BY 1)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_shingles AS BIGINT) AS n_shingles,
                   CAST(n_novel AS BIGINT) AS n_novel,
                   CAST((10000 * n_novel) // n_shingles AS BIGINT)
                     AS novelty_pct
            FROM per
        """,
        "ngram_jaccard_pairs": r"""
            -- assumes every document has >= 3 tokens (true for this corpus);
            -- 1-based list indexing, lateral generate_series per doc
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 1)) AS i FROM docs2
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     L[i] || ' ' || L[i + 1] || ' ' || L[i + 2] AS s
              FROM pos
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
                   CAST((10000 * i) // (sa.n + sb.n - i) AS BIGINT) AS jaccard_pct
            FROM inter
            JOIN sizes sa ON sa.doc_id = a_id
            JOIN sizes sb ON sb.doc_id = b_id
            WHERE 1.0 * i / (sa.n + sb.n - i) >= 0.5
        """,
        # asymmetric containment |A∩B|/min(|A|,|B|) over the same
        # 3-gram shingle sets; all-integer threshold and percentage
        "ngram_containment_pairs": r"""
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 1)) AS i FROM docs2
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     L[i] || ' ' || L[i + 1] || ' ' || L[i + 2] AS s
              FROM pos
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
                   CAST((10000 * i) // LEAST(sa.n, sb.n) AS BIGINT) AS cont_pct
            FROM inter
            JOIN sizes sa ON sa.doc_id = a_id
            JOIN sizes sb ON sb.doc_id = b_id
            WHERE 100 * i >= 80 * LEAST(sa.n, sb.n)
        """,
        # connected components of the exact near-dup graph: min-label
        # propagation to a fixpoint via recursive CTE (UNION dedups the
        # frontier, so it converges); cluster_id = min doc_id reachable.
        "near_dup_clusters": _NEAR_DUP_CTES + """
            SELECT doc_id, cluster_id FROM clusters
        """,
        # canonical-doc selection: per near-dup cluster keep the
        # most-token member (ties to smallest doc_id) — argmax join
        "docs_dedup_keep_best": _NEAR_DUP_CTES + f""",
            tok AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '{_TOKEN_RE}'))
                          AS BIGINT) AS n_tokens
              FROM documents
            ),
            j AS (
              SELECT c.cluster_id, c.doc_id, t.n_tokens
              FROM clusters c JOIN tok t USING (doc_id)
            ),
            rk AS (
              SELECT *,
                     ROW_NUMBER() OVER (
                       PARTITION BY cluster_id
                       ORDER BY n_tokens DESC, doc_id) AS rnk,
                     COUNT(*) OVER (PARTITION BY cluster_id) AS nd
              FROM j
            )
            SELECT cluster_id, doc_id AS keep_doc_id, n_tokens,
                   CAST(nd AS BIGINT) AS n_docs
            FROM rk WHERE rnk = 1
        """,
        "embedding_dup_pairs": """
            SELECT CAST(a.vec_id AS BIGINT) AS a_id, CAST(b.vec_id AS BIGINT) AS b_id,
                   CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                     CAST(b.embedding AS DOUBLE[])) * 10000) AS BIGINT) AS cos_pct
            FROM embeddings a
            JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.40
        """,
        # triplet mining: hardest same-label positive + hardest
        # other-label negative per anchor, margin-violation flag
        "embeddings_hard_negatives": """
            WITH c AS (
              SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings
            ),
            scored AS (
              SELECT a.vec_id, a.label AS la, b.vec_id AS cand,
                     b.label AS lb,
                     CAST(floor(list_cosine_similarity(a.e, b.e)
                                * 10000) AS BIGINT) AS cos_pct
              FROM c a JOIN c b ON b.vec_id <> a.vec_id
            ),
            pos AS (
              SELECT vec_id, cand AS pos_id, cos_pct AS pos_cos
              FROM scored WHERE la = lb
              QUALIFY row_number() OVER (
                PARTITION BY vec_id
                ORDER BY cos_pct DESC, cand ASC) = 1
            ),
            neg AS (
              SELECT vec_id, cand AS neg_id, cos_pct AS neg_cos
              FROM scored WHERE la <> lb
              QUALIFY row_number() OVER (
                PARTITION BY vec_id
                ORDER BY cos_pct DESC, cand ASC) = 1
            )
            SELECT CAST(p.vec_id AS BIGINT) AS vec_id,
                   CAST(p.pos_id AS BIGINT) AS pos_id, p.pos_cos,
                   CAST(n.neg_id AS BIGINT) AS neg_id, n.neg_cos,
                   CAST(CASE WHEN n.neg_cos + 500 > p.pos_cos
                        THEN 1 ELSE 0 END AS BIGINT) AS violation
            FROM pos p JOIN neg n USING (vec_id)
        """,
        # exact k-NN graph: every vector's top-5 cosine neighbors on
        # the shared floor(cos*1e4) quantization, id-ascending ties
        "embeddings_knn_graph": """
            WITH c AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings
            ),
            scored AS (
              SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                     CAST(floor(list_cosine_similarity(a.e, b.e)
                                * 10000) AS BIGINT) AS cos_pct
              FROM c a JOIN c b ON b.vec_id <> a.vec_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY vec_id
                ORDER BY cos_pct DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(rank AS BIGINT) AS rank,
                   CAST(neighbor_id AS BIGINT) AS neighbor_id,
                   cos_pct
            FROM ranked WHERE rank <= 5
        """,
        # DBSCAN with cosine>=eps neighbors; deterministic border rule
        # (min-rooted core neighbor); core = >= min_pts OTHER points
        "embeddings_dbscan": """
            WITH RECURSIVE e AS (
              SELECT a.vec_id AS a, b.vec_id AS b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) >= 0.30
            ),
            sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
            deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
            core AS (SELECT u FROM deg WHERE d >= 3),
            ce AS (
              SELECT s.u, s.v FROM sym s
              JOIN core c1 ON c1.u = s.u JOIN core c2 ON c2.u = s.v
            ),
            reach(id, r) AS (
              SELECT u, u FROM core
              UNION
              SELECT ce.v, reach.r FROM reach JOIN ce ON ce.u = reach.id
            ),
            comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
            border AS (
              SELECT s.u AS id, min(comp.root) AS root
              FROM sym s
              JOIN core c ON c.u = s.v
              JOIN comp ON comp.id = s.v
              WHERE s.u NOT IN (SELECT u FROM core)
              GROUP BY s.u
            )
            SELECT CAST(v.vec_id AS BIGINT) AS vec_id,
                   (comp.root IS NOT NULL) AS is_core,
                   CAST(COALESCE(comp.root, border.root, -1) AS BIGINT) AS cluster
            FROM embeddings v
            LEFT JOIN comp ON comp.id = v.vec_id
            LEFT JOIN border ON border.id = v.vec_id
        """,
        # leave-one-out kNN classification: scored cross join,
        # ROW_NUMBER <= 5 by (cos_pct desc, vec_id asc), majority
        # label with count-desc/label-asc tie rule
        "ann_knn_classify": """
            WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                              CAST(embedding AS DOUBLE[]) e FROM embeddings),
            scored AS (
              SELECT a.vec_id, b.label AS nlabel,
                     row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY CAST(floor(list_cosine_similarity(a.e, b.e)
                                           * 10000) AS BIGINT) DESC,
                                b.vec_id ASC) AS rnk
              FROM v a JOIN v b ON b.vec_id <> a.vec_id),
            votes AS (
              SELECT vec_id, nlabel, count(*) AS c
              FROM scored WHERE rnk <= 5 GROUP BY 1, 2),
            pred AS (
              SELECT vec_id, nlabel AS predicted,
                     row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY c DESC, nlabel ASC) AS pr
              FROM votes)
            SELECT CAST(v.vec_id AS BIGINT) AS vec_id, v.label,
                   CAST(p.predicted AS BIGINT) AS predicted,
                   (p.predicted = v.label) AS correct
            FROM v JOIN pred p ON p.vec_id = v.vec_id AND p.pr = 1
        """,
        "embeddings_norm_stats": """
            WITH q AS (
              SELECT label,
                     (SELECT SUM(CAST(floor(CAST(u.x AS DOUBLE) * 1000)
                                      AS BIGINT)
                                 * CAST(floor(CAST(u.x AS DOUBLE) * 1000)
                                        AS BIGINT))
                      FROM UNNEST(embedding) AS u(x)) AS n2
              FROM embeddings)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(min(n2) AS BIGINT) AS min_norm2_q,
                   CAST(max(n2) AS BIGINT) AS max_norm2_q,
                   CAST(sum(n2) AS BIGINT) AS sum_norm2_q
            FROM q GROUP BY label
        """,
        # SQ8 scalar quantization digest: global per-dim (min, max)
        # ranges, midpoint dequant, per-component integer error floors
        # (floor-before-square, so SUM is reduction-order-exact); both
        # engines evaluate the same float64 expression tree
        "embeddings_sq8": """
            WITH q AS (
              SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
              FROM embeddings,
                   LATERAL unnest(generate_series(1, len(embedding))) t(i)
            ),
            s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM q GROUP BY dim),
            c AS (
              SELECT q.vec_id, q.x, s.mn, s.mx,
                     CASE WHEN s.mx > s.mn
                          THEN LEAST(GREATEST(CAST(floor(
                                 (q.x - s.mn) / (s.mx - s.mn) * 256.0)
                               AS BIGINT), 0), 255)
                          ELSE 0 END AS code
              FROM q JOIN s USING (dim)
            ),
            d AS (
              SELECT vec_id, code, x,
                     CASE WHEN mx > mn
                          THEN mn + (code + 0.5) * (mx - mn) / 256.0
                          ELSE mn END AS deq
              FROM c
            )
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(SUM(code) AS BIGINT) AS code_sum,
                   CAST(MIN(code) AS BIGINT) AS code_min,
                   CAST(MAX(code) AS BIGINT) AS code_max,
                   CAST(SUM(CAST(floor((x - deq) * 1000.0) AS BIGINT)
                            * CAST(floor((x - deq) * 1000.0) AS BIGINT))
                        AS BIGINT) AS err_q
            FROM d GROUP BY vec_id
        """,
        "docs_semantic_decontaminate": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) e FROM embeddings WHERE vec_id < 10),
                 t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings WHERE vec_id >= 10)
            SELECT CAST(t.vec_id AS BIGINT) AS doc_id,
                   MAX(CAST(floor(list_cosine_similarity(q.e, t.e) * 10000) AS BIGINT)) AS max_test_cos_pct,
                   (MAX(CAST(floor(list_cosine_similarity(q.e, t.e) * 10000) AS BIGINT)) >= 3000) AS contaminated
            FROM t CROSS JOIN q GROUP BY t.vec_id
        """,
        "ann_range_search": """
            WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings WHERE vec_id < 10),
                 c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings)
            SELECT CAST(q.vec_id AS BIGINT) AS query_id,
                   CAST(c.vec_id AS BIGINT) AS neighbor_id,
                   CAST(floor(list_cosine_similarity(q.e, c.e) * 10000) AS BIGINT) AS cos_pct
            FROM q JOIN c ON c.vec_id <> q.vec_id
            WHERE floor(list_cosine_similarity(q.e, c.e) * 10000) >= 3000
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings WHERE vec_id < 10),
                 c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
                 scored AS (
                   SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                          CAST(floor(list_cosine_similarity(q.e, c.e) * 10000) AS BIGINT) AS cos_pct
                   FROM q JOIN c ON c.vec_id <> q.vec_id),
                 ranked AS (
                   SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY cos_pct DESC, neighbor_id ASC) AS rank
                   FROM scored)
            SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
                   CAST(neighbor_id AS BIGINT) AS neighbor_id, cos_pct
            FROM ranked WHERE rank <= 10
        """,
        # TPC-H-Q5 shape: the big-big equi-join (lineitem x orders)
        "revenue_by_nation": """
            SELECT n_name AS nation,
              CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                AS sum_rev,
              CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem
            JOIN orders   ON o_orderkey  = l_orderkey
            JOIN customer ON c_custkey   = o_custkey
            JOIN nation   ON n_nationkey = c_nationkey
            GROUP BY 1
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
              CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
              CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
              CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "events_windowed": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "events_sessionize": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
            o AS (
              SELECT user_id, ts_us,
                CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > 1800 * 1000000
                     THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
            ),
            ses AS (
              SELECT user_id, ts_us,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING) - 1 AS session_id
              FROM o
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(ts_us) AS BIGINT) AS start_us,
                   CAST(max(ts_us) AS BIGINT) AS end_us
            FROM ses GROUP BY user_id, session_id
        """,
        "events_sliding": """
            WITH e AS (
              SELECT event_type, epoch_us(ts) // 1000000 AS ts_s,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            x AS (SELECT event_type, ts_s, v, UNNEST([0, 1, 2, 3]) AS k FROM e),
            w AS (SELECT event_type, ts_s // 900 - k AS slot_id, v FROM x)
            SELECT event_type, CAST(slot_id AS BIGINT) AS slot_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(v) AS BIGINT) AS sum_value_cents
            FROM w GROUP BY 1, 2
        """,
        "events_distinct_users": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type
        """,
        # exact discrete quantiles of integer-cent values per type;
        # quantile_disc = 1-based rank ceil(q*n), matching the Ray
        # histogram walk bit for bit
        "events_value_quantiles": """
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS value_c
              FROM events
            ),
            a AS (
              SELECT event_type,
                     quantile_disc(value_c, 0.25) AS q25,
                     quantile_disc(value_c, 0.50) AS q50,
                     quantile_disc(value_c, 0.75) AS q75,
                     quantile_disc(value_c, 0.90) AS q90,
                     quantile_disc(value_c, 0.99) AS q99
              FROM c GROUP BY event_type
            )
            SELECT event_type, CAST(25 AS BIGINT) AS q_pct, CAST(q25 AS BIGINT) AS value_cents FROM a
            UNION ALL SELECT event_type, 50, CAST(q50 AS BIGINT) FROM a
            UNION ALL SELECT event_type, 75, CAST(q75 AS BIGINT) FROM a
            UNION ALL SELECT event_type, 90, CAST(q90 AS BIGINT) FROM a
            UNION ALL SELECT event_type, 99, CAST(q99 AS BIGINT) FROM a
        """,
        # per-user 3-sigma outliers with the sigma threshold in EXACT
        # integer algebra over cents: |v-mu|>3*sigma iff
        # (n*v - S1)^2 > 9*(n*S2 - S1^2); no float sigma exists
        "events_outliers": """
            WITH c AS (
              SELECT event_id, user_id,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            s AS (
              -- HUGEINT throughout the threshold algebra: 9·n·S2
              -- exceeds BIGINT for heavy users (the Ray side settles
              -- the same cases with exact Python ints)
              SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
                     CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS s1,
                     CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
              FROM c GROUP BY user_id
            )
            SELECT c.event_id, c.user_id, c.v AS value_cents
            FROM c JOIN s USING (user_id)
            WHERE (s.n * c.v - s.s1) * (s.n * c.v - s.s1)
                  > 9 * (s.n * s.s2 - s.s1 * s.s1)
        """,
        # cohort retention: users bucketed by first-event day, counted
        # per later active day; day = epoch_us // 86400000000 exactly
        # as the Ray side computes it (no calendar functions)
        "events_retention": """
            WITH d AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ),
            f AS (
              SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id
            )
            SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
                   CAST(d.day - f.cohort_day AS BIGINT) AS day_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM d JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        # as-of join: each purchase matched to the user's latest click
        # at-or-before (ties -> larger event_id); -1 sentinels keep the
        # no-match rows integer-exact for the hash compare
        "events_asof_join": """
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts_us
              FROM events WHERE event_type = 'purchase'
            ),
            c AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts_us
              FROM events WHERE event_type = 'click'
            )
            SELECT p.event_id, CAST(p.user_id AS BIGINT) AS user_id, p.ts_us,
                   CAST(COALESCE(c2.event_id, -1) AS BIGINT) AS click_event_id,
                   CAST(COALESCE(c2.ts_us, -1) AS BIGINT) AS click_ts_us
            FROM p LEFT JOIN LATERAL (
              SELECT event_id, ts_us FROM c
              WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us
              ORDER BY ts_us DESC, event_id DESC LIMIT 1
            ) c2 ON TRUE
        """,
        # range join: clicks strictly after the purchase, within 1 hour
        "events_range_join": """
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts_us
              FROM events WHERE event_type = 'purchase'
            ),
            c AS (
              SELECT user_id, epoch_us(ts) AS ts_us
              FROM events WHERE event_type = 'click'
            )
            SELECT p.event_id, CAST(p.user_id AS BIGINT) AS user_id, p.ts_us,
                   CAST(count(c.ts_us) AS BIGINT) AS n_clicks_1h
            FROM p LEFT JOIN c
              ON c.user_id = p.user_id
             AND c.ts_us > p.ts_us
             AND c.ts_us <= p.ts_us + 3600000000
            GROUP BY p.event_id, p.user_id, p.ts_us
        """,
        # sliding-window rate-limiter audit: trailing 24 h count per
        # event; integer µs make RANGE W-1 PRECEDING the exact
        # half-open (ts-W, ts] bound
        "events_rate_limit": """
            WITH e AS (
              SELECT event_id, user_id,
                     CAST(epoch_us(ts) AS BIGINT) AS ts_us
              FROM events
            ),
            w AS (
              SELECT event_id, user_id, ts_us,
                     CAST(COUNT(*) OVER (
                       PARTITION BY user_id ORDER BY ts_us
                       RANGE BETWEEN 86399999999 PRECEDING
                             AND CURRENT ROW
                     ) AS BIGINT) AS n_in_window
              FROM e
            )
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(user_id AS BIGINT) AS user_id,
                   ts_us, n_in_window,
                   (n_in_window > 6) AS violation
            FROM w
        """,
        "events_top_users": """
            WITH agg AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY user_id
            ),
            ranked AS (
              SELECT row_number() OVER (ORDER BY n_events DESC, user_id ASC)
                       AS rank, user_id, n_events
              FROM agg
            )
            SELECT CAST(rank AS BIGINT) AS rank,
                   CAST(user_id AS BIGINT) AS user_id, n_events
            FROM ranked WHERE rank <= 20
        """,
        # deterministic stratified sample: same multiplicative-hash
        # slice as the Ray side, per-lang accounting
        "docs_stratified_sample": """
            WITH s AS (
              SELECT lang, doc_id, length(text) AS n_chars
              FROM documents
              WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 < 10
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM s GROUP BY lang
        """,
        # budget-constrained domain mixing: integer weights 1+(idx%4),
        # token budget w_s*T//sum(w), docs kept in multiplicative-hash
        # order while the EXCLUSIVE cumulative stays under budget —
        # all-integer arithmetic, mirrored exactly in the Ray scan
        "docs_domain_mix": f"""
            WITH tok AS (
              SELECT doc_id, source,
                     CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT) AS n_toks,
                     ((doc_id % 2147483648) * 2654435761) % 4294967296 AS hkey
              FROM documents
            ),
            w AS (
              SELECT source, CAST(SUM(n_toks) AS BIGINT) AS src_toks,
                     1 + (CAST(substr(source, 4) AS BIGINT) % 4) AS wgt
              FROM tok GROUP BY source
            ),
            tot AS (
              SELECT CAST(SUM(src_toks) AS BIGINT) * 40 // 100 AS t,
                     CAST(SUM(wgt) AS BIGINT) AS all_w
              FROM w
            ),
            b AS (
              SELECT w.source, w.wgt * tot.t // tot.all_w AS budget
              FROM w, tot
            ),
            cum AS (
              SELECT tok.*,
                     CAST(SUM(n_toks) OVER (
                       PARTITION BY source ORDER BY hkey, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
              FROM tok
            )
            SELECT c.doc_id, c.source, c.n_toks, c.cum_toks
            FROM cum c JOIN b ON c.source = b.source
            WHERE c.cum_toks - c.n_toks < b.budget
        """,
        # hybrid similar-document search: Reciprocal Rank Fusion of a
        # dense cosine leg and a lexical shingle-Jaccard leg — both
        # rankings are ROW_NUMBER windows over the proven quantized
        # scores; the fusion sum is pure integer division
        "docs_hybrid_rrf": r"""
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 1)) AS i FROM docs2
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     L[i] || ' ' || L[i + 1] || ' ' || L[i + 2] AS s
              FROM pos
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            lexinter AS (
              SELECT a.doc_id AS qid, d.doc_id AS doc_id, count(*) AS i
              FROM sh a JOIN sh d ON a.s = d.s AND d.doc_id <> a.doc_id
              WHERE a.doc_id < 5
              GROUP BY 1, 2
            ),
            lex AS (
              SELECT qid, li.doc_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY qid
                       ORDER BY (10000 * i) // (sq.n + sd.n - i) DESC,
                                li.doc_id ASC) AS rnk
              FROM lexinter li
              JOIN sizes sq ON sq.doc_id = li.qid
              JOIN sizes sd ON sd.doc_id = li.doc_id
            ),
            dq AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings WHERE vec_id < 5
            ),
            dense AS (
              SELECT q.vec_id AS qid, c.vec_id AS doc_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY CAST(floor(list_cosine_similarity(
                                  q.e, CAST(c.embedding AS DOUBLE[])) * 10000)
                                AS BIGINT) DESC,
                                c.vec_id ASC) AS rnk
              FROM dq q JOIN embeddings c ON c.vec_id <> q.vec_id
            ),
            fused AS (
              SELECT qid, doc_id,
                     CAST(SUM(1000000000 // (60 + rnk)) AS BIGINT) AS rrf_score
              FROM (
                SELECT qid, doc_id, rnk FROM lex   WHERE rnk <= 20
                UNION ALL
                SELECT qid, doc_id, rnk FROM dense WHERE rnk <= 20
              )
              GROUP BY 1, 2
            ),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY qid ORDER BY rrf_score DESC, doc_id ASC) AS rnk
              FROM fused
            )
            SELECT CAST(qid AS BIGINT) AS qid, CAST(rnk AS BIGINT) AS rnk,
                   CAST(doc_id AS BIGINT) AS doc_id, rrf_score
            FROM ranked WHERE rnk <= 10
        """,
        # BM25 top-k for the static query workload: k1=6/5, b=3/4
        # folded into one all-integer expression (multiply through by
        # 20*T), idf quantized to micro-nats first; HUGEINT keeps the
        # products exact, positive operands make // unambiguous
        "docs_bm25_topk": f"""
            WITH q(qid, term) AS (VALUES
              (0,'data'),(0,'stream'),
              (1,'hash'),(1,'join'),
              (2,'sort'),(2,'merge'),(2,'filter'),
              (3,'window'),(3,'group'),
              (4,'value'),(4,'part'),(4,'line')
            ),
            docs2 AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '{_TOKEN_RE}') AS L
              FROM documents
            ),
            stats AS (
              SELECT CAST(count(*) AS BIGINT) AS N,
                     CAST(SUM(len(L)) AS BIGINT) AS T
              FROM docs2
            ),
            tf AS (
              SELECT d.doc_id, qt.term,
                     CAST(len(list_filter(d.L, x -> x = qt.term)) AS BIGINT) AS tf,
                     CAST(len(d.L) AS BIGINT) AS dl
              FROM docs2 d
              CROSS JOIN (SELECT DISTINCT term FROM q) qt
              WHERE len(list_filter(d.L, x -> x = qt.term)) > 0
            ),
            idf AS (
              SELECT term,
                     CAST(floor(ln((2.0*N + 2) / (2*df + 1)) * 1000000) AS BIGINT)
                       AS idf_micro
              FROM (SELECT term, count(*) AS df FROM tf GROUP BY term), stats
            ),
            sc AS (
              SELECT q.qid, t.doc_id,
                     CAST(SUM(
                       (44::HUGEINT * i.idf_micro * t.tf * s.T)
                       // (20::HUGEINT * s.T * t.tf + 6*s.T + 18*t.dl*s.N)
                     ) AS BIGINT) AS score_micro
              FROM tf t
              JOIN idf i USING (term)
              JOIN q USING (term), stats s
              GROUP BY 1, 2
            ),
            r AS (
              SELECT qid, doc_id, score_micro,
                     ROW_NUMBER() OVER (
                       PARTITION BY qid
                       ORDER BY score_micro DESC, doc_id) AS rnk
              FROM sc
            )
            SELECT CAST(qid AS BIGINT) AS qid, CAST(rnk AS BIGINT) AS rnk,
                   doc_id, score_micro
            FROM r WHERE rnk <= 5
        """,
        # full BPE training loop: 5 merge rounds over the word
        # vocabulary via chained CTEs (see _bpe_train_oracle_sql)
        "docs_bpe_train": _bpe_train_oracle_sql(),
        # encode with the learned merges + count post-merge symbols
        "docs_bpe_encode": _bpe_encode_oracle_sql(),
        # corpus-trained multinomial Naive Bayes, applied back per
        # doc: per-occurrence micronat factors floor(ln·1e6) summed
        # as ints (order-free), argmax (score DESC, lang ASC)
        "docs_nb_classify": r"""
            WITH tok AS (
              SELECT doc_id, lang,
                     UNNEST(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS w
              FROM documents
            ),
            vv AS (SELECT count(DISTINCT w) AS v FROM tok),
            tl AS (SELECT lang, CAST(count(*) AS BIGINT) AS t
                   FROM tok GROUP BY lang),
            dl AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd
                   FROM documents GROUP BY lang),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            cw AS (SELECT w, lang, CAST(count(*) AS BIGINT) AS c
                   FROM tok GROUP BY w, lang),
            cl AS (SELECT DISTINCT lang FROM documents),
            sc AS (
              SELECT t.doc_id, cl.lang AS cand,
                     CAST(SUM(CAST(floor(
                       ln((COALESCE(cw.c, 0) + 1.0)
                          / (COALESCE(tl.t, 0) + vv.v))
                       * 1000000.0) AS BIGINT)) AS BIGINT) AS s
              FROM tok t
              CROSS JOIN cl
              LEFT JOIN cw ON cw.w = t.w AND cw.lang = cl.lang
              -- LEFT: a candidate lang whose docs are all empty has no
              -- tok rows; smoothing must still apply (t=0), matching
              -- the Ray side's tokL.get(lang, 0)
              LEFT JOIN tl ON tl.lang = cl.lang
              CROSS JOIN vv
              GROUP BY 1, 2
            ),
            pr AS (SELECT dl.lang,
                          CAST(floor(ln(dl.nd * 1.0 / nn.n) * 1000000.0)
                               AS BIGINT) AS p
                   FROM dl CROSS JOIN nn),
            base AS (
              SELECT d.doc_id, cl.lang AS cand,
                     COALESCE(sc.s, 0) + pr.p AS score
              FROM documents d
              CROSS JOIN cl
              LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.cand = cl.lang
              JOIN pr ON pr.lang = cl.lang
            ),
            r AS (SELECT doc_id, cand, score,
                         ROW_NUMBER() OVER (
                           PARTITION BY doc_id
                           ORDER BY score DESC, cand) AS rn
                  FROM base)
            SELECT doc_id, cand AS pred_lang,
                   CAST(score AS BIGINT) AS score_micro
            FROM r WHERE rn = 1
        """,
        # DSIR importance weights: per-occurrence micronat factors
        # floor(ln p_target · 1e6) − floor(ln p_raw · 1e6), add-one
        # smoothed over the shared vocab, summed per doc as ints
        # (target domain = lang 'en'); zero-token docs weight 0
        "docs_dsir_weights": r"""
            WITH tok AS (
              SELECT doc_id, lang,
                     UNNEST(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS w
              FROM documents
            ),
            vv AS (SELECT count(DISTINCT w) AS v FROM tok),
            tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tok
                   WHERE lang = 'en'),
            tr AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tok),
            cwt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
                    WHERE lang = 'en' GROUP BY w),
            cwr AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
                    GROUP BY w),
            sc AS (
              SELECT t.doc_id,
                     CAST(SUM(
                       CAST(floor(ln((COALESCE(cwt.c, 0) + 1.0)
                                     / (tt.t + vv.v))
                                  * 1000000.0) AS BIGINT)
                       - CAST(floor(ln((cwr.c + 1.0) / (tr.t + vv.v))
                                    * 1000000.0) AS BIGINT)
                     ) AS BIGINT) AS s
              FROM tok t
              LEFT JOIN cwt ON cwt.w = t.w
              JOIN cwr ON cwr.w = t.w
              CROSS JOIN tt CROSS JOIN tr CROSS JOIN vv
              GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(COALESCE(sc.s, 0) AS BIGINT) AS weight_micro
            FROM documents d LEFT JOIN sc USING (doc_id)
        """,
        # Unicode NFC normalization + touched flag
        "docs_nfc_normalize": """
            SELECT doc_id, nfc_normalize(text) AS text_nfc,
                   CAST(nfc_normalize(text) <> text AS BIGINT) AS changed
            FROM documents
        """,
        # Flesch reading-ease as one exact trunc-division (// is
        # truncating in DuckDB; the engine mirrors it)
        # per-doc token-distribution entropy in exact micronats (the
        # shared _xlx quantizer; x<=0 and c=1 terms are 0)
        "docs_token_entropy": rf"""
            WITH toks AS (
              SELECT doc_id,
                     UNNEST(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS tok
              FROM documents),
            cnt AS (
              SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
            per AS (
              SELECT doc_id, SUM(c) AS n, count(*) AS types,
                     SUM({_xlx('c')}) AS s
              FROM cnt GROUP BY 1)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n AS BIGINT) AS n_tokens,
                   CAST(types AS BIGINT) AS n_types,
                   CAST(({_xlx('n')} - s) // n AS BIGINT) AS ent_micro
            FROM per
        """,
        "docs_readability": """
            WITH c AS (
              SELECT doc_id,
                     greatest(1, len(regexp_extract_all(lower(text),
                       '[a-z]+'))) AS w,
                     len(regexp_extract_all(lower(text), '[a-z]+'))
                       AS raw_w,
                     greatest(1, len(regexp_extract_all(text,
                       '[.!?]+'))) AS s,
                     len(regexp_extract_all(lower(text), '[aeiouy]+'))
                       AS vruns,
                     len(regexp_extract_all(lower(text),
                       '[a-z]*[aeiouy][a-z]*')) AS vwords
              FROM documents
            )
            SELECT doc_id, CAST(w AS BIGINT) AS words,
                   CAST(s AS BIGINT) AS sentences,
                   CAST(vruns + raw_w - vwords AS BIGINT) AS syllables,
                   CAST((206835000 * s * w - 1015000 * w * w
                         - 84600000 * (vruns + raw_w - vwords) * s)
                        // (s * w) AS BIGINT) AS flesch_micro
            FROM c
        """,
        # RAKE keyphrases: deg/freq word scores quantized to micro
        # before the phrase sum; stopwords-only boundary rule
        "docs_rake_topk": """
            WITH d AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z]+') AS L
              FROM documents
            ),
            w AS (
              SELECT doc_id, i, L[i] AS w,
                     (L[i] IN ('the', 'a', 'of', 'and', 'in')) AS stop
              FROM (SELECT doc_id, L, UNNEST(range(1, len(L) + 1)) AS i
                    FROM d)
            ),
            nw AS (
              SELECT doc_id, i, w,
                     CAST(i AS BIGINT)
                       - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY i) AS grp
              FROM w WHERE NOT stop
            ),
            ph AS (
              SELECT doc_id, grp,
                     string_agg(w, ' ' ORDER BY i) AS phrase,
                     CAST(count(*) AS BIGINT) AS plen
              FROM nw GROUP BY doc_id, grp
            ),
            pw AS (
              SELECT nw.doc_id, nw.grp, nw.w, ph.phrase, ph.plen
              FROM nw JOIN ph USING (doc_id, grp)
            ),
            ws AS (
              SELECT w, CAST(count(*) AS BIGINT) AS freq,
                     CAST(SUM(plen) AS BIGINT) AS deg
              FROM pw GROUP BY w
            ),
            wsc AS (
              SELECT w, CAST((1000000 * deg) // freq AS BIGINT) AS score
              FROM ws
            ),
            occ AS (
              SELECT pw.doc_id, pw.grp, pw.phrase,
                     CAST(SUM(wsc.score) AS BIGINT) AS s
              FROM pw JOIN wsc USING (w) GROUP BY 1, 2, 3
            ),
            agg AS (
              SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
                     CAST(min(s) AS BIGINT) AS score_micro
              FROM occ GROUP BY phrase
            )
            SELECT phrase, n_occ, score_micro
            FROM agg ORDER BY score_micro DESC, phrase LIMIT 20
        """,
        # A-ES weighted sampling: top-20 by floor(−ln(u)·1e9/w) with
        # u md5-derived from doc_id, w = token count + 1
        # Z-order layout zone map: 4+4-bit Morton interleave, top 4
        # bits = partition; per-partition min/max bounds per dimension
        "docs_zorder_layout": """
            WITH z AS (
              SELECT LEAST(15, n_chars // 40) AS d1,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))::INT
                       AS d2
              FROM documents
            ),
            k AS (
              SELECT d1, d2,
                     ((d1 & 1) + (d2 & 1)*2 + (d1 & 2)*2 + (d2 & 2)*4
                    + (d1 & 4)*4 + (d2 & 4)*8 + (d1 & 8)*8 + (d2 & 8)*16)
                       AS zkey
              FROM z
            )
            SELECT CAST(zkey // 16 AS BIGINT) AS part,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(min(d1) AS BIGINT) AS d1_min,
                   CAST(max(d1) AS BIGINT) AS d1_max,
                   CAST(min(d2) AS BIGINT) AS d2_min,
                   CAST(max(d2) AS BIGINT) AS d2_max,
                   CAST(min(zkey) AS BIGINT) AS z_min,
                   CAST(max(zkey) AS BIGINT) AS z_max
            FROM k GROUP BY 1
        """,
        "docs_weighted_sample": r"""
            WITH w AS (
              SELECT doc_id,
                     CAST(len(list_filter(
                       string_split_regex(text, '\s+'), x -> x <> ''))
                       AS BIGINT) + 1 AS wt,
                     ('0x' || substr(
                        md5('ws|' || CAST(doc_id AS VARCHAR)),
                        1, 15))::BIGINT AS h
              FROM documents
            ),
            k AS (
              SELECT doc_id, wt,
                     CAST(floor(
                       -ln((h + 1.0) / 1152921504606846976.0)
                       * 1000000000.0 / wt) AS BIGINT) AS key_micro
              FROM w
            ),
            r AS (
              SELECT doc_id, wt, key_micro,
                     ROW_NUMBER() OVER (ORDER BY key_micro, doc_id)
                       AS rnk
              FROM k
            )
            SELECT CAST(rnk AS BIGINT) AS rnk, doc_id,
                   wt AS weight, key_micro
            FROM r WHERE rnk <= 20
        """,
        # per-stratum A-ES: same jitter/key, top-5 within each lang
        "docs_stratum_sample": r"""
            WITH w AS (
              SELECT doc_id, lang,
                     CAST(len(list_filter(
                       string_split_regex(text, '\s+'), x -> x <> ''))
                       AS BIGINT) + 1 AS wt,
                     ('0x' || substr(
                        md5('ws|' || CAST(doc_id AS VARCHAR)),
                        1, 15))::BIGINT AS h
              FROM documents
            ),
            k AS (
              SELECT doc_id, lang, wt,
                     CAST(floor(
                       -ln((h + 1.0) / 1152921504606846976.0)
                       * 1000000000.0 / wt) AS BIGINT) AS key_micro
              FROM w
            ),
            r AS (
              SELECT lang, doc_id, wt, key_micro,
                     ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY key_micro, doc_id) AS rnk
              FROM k
            )
            SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id,
                   wt AS weight, key_micro
            FROM r WHERE rnk <= 5
        """,
        # top-20 PMI collocations, pair count >= 5; float64 products
        # in both engines (N·c(a,b) can pass 2^63 at scale)
        "docs_pmi_topk": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS ws
              FROM documents
            ),
            tok AS (
              SELECT doc_id, UNNEST(ws) AS w,
                     generate_subscripts(ws, 1) AS pos
              FROM toks
            ),
            uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                    FROM tok GROUP BY w),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
            big AS (
              SELECT a.w AS w1, b.w AS w2,
                     CAST(count(*) AS BIGINT) AS cab
              FROM tok a
              JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              GROUP BY 1, 2
              HAVING count(*) >= 5
            ),
            sc AS (
              SELECT big.w1, big.w2, big.cab,
                     ua.c AS ca, ub.c AS cb,
                     CAST(floor(ln(
                       (CAST(nn.n AS DOUBLE) * big.cab)
                       / (CAST(ua.c AS DOUBLE) * ub.c))
                       * 1000000.0) AS BIGINT) AS pmi_micro
              FROM big
              JOIN uni ua ON ua.w = big.w1
              JOIN uni ub ON ub.w = big.w2
              CROSS JOIN nn
            ),
            r AS (
              SELECT *, ROW_NUMBER() OVER (
                ORDER BY pmi_micro DESC, w1, w2) AS rnk
              FROM sc
            )
            SELECT CAST(rnk AS BIGINT) AS rnk, w1, w2,
                   cab AS n_pair, ca AS n_w1, cb AS n_w2, pmi_micro
            FROM r WHERE rnk <= 20
        """,
        # TPC-H-Q3-shaped: top-10 unshipped orders by revenue for one
        # market segment; revenue in integer 10^-4 dollars
        "q3_shipping_priority": """
            WITH li AS (
              SELECT l_orderkey,
                     SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS revenue
              FROM lineitem
              WHERE l_shipdate > TIMESTAMP '1998-06-01'
              GROUP BY l_orderkey
            ),
            o AS (
              SELECT o_orderkey, epoch_us(o_orderdate) AS odate_us,
                     o_orderpriority
              FROM orders
              JOIN customer ON c_custkey = o_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1998-06-01'
            ),
            r AS (
              SELECT li.l_orderkey AS o_orderkey, li.revenue,
                     o.odate_us, o.o_orderpriority,
                     ROW_NUMBER() OVER (
                       ORDER BY li.revenue DESC, li.l_orderkey) AS rnk
              FROM li JOIN o ON o.o_orderkey = li.l_orderkey
            )
            SELECT o_orderkey, CAST(revenue AS BIGINT) AS revenue,
                   odate_us, o_orderpriority
            FROM r WHERE rnk <= 10
        """,
        # distributed anti-join: orders with no lineitem shipped
        # before the cutoff
        "orders_unshipped": """
            SELECT o.o_orderkey, o.o_custkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                     AS total_cents
            FROM orders o
            WHERE NOT EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate < TIMESTAMP '1997-01-01'
            )
        """,
        # TPC-H-Q17-shaped correlated-AVG subquery: revenue from
        # lineitems below 20% of their part's average quantity, one
        # brand; threshold exact-integer (5·qty·n < sum_qty)
        "q17_small_qty_revenue": """
            WITH l AS (
              SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                       AS price_c
              FROM lineitem
              JOIN part ON p_partkey = l_partkey
              WHERE p_brand = 'Brand#4'
            ),
            s AS (
              SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS n_tot
              FROM l GROUP BY l_partkey
            ),
            sm AS (
              SELECT l.price_c
              FROM l JOIN s USING (l_partkey)
              WHERE 5 * l.qty * s.n_tot < s.sum_qty
            )
            SELECT CAST(count(*) AS BIGINT) AS n_small,
                   CAST(COALESCE(sum(price_c), 0) AS BIGINT)
                     AS total_cents,
                   CAST((CAST(COALESCE(sum(price_c), 0) AS HUGEINT)
                         * 1000) // 7 AS BIGINT) AS avg_yearly_milli
            FROM sm
        """,
        # TPC-H-Q13-shaped: customers-per-order-count distribution,
        # zero bucket via LEFT OUTER JOIN
        "q13_order_histogram": """
            WITH c AS (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer
              LEFT OUTER JOIN orders
                ON o_custkey = c_custkey
               AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey
            )
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS custdist
            FROM c GROUP BY c_count
        """,
        # TPC-H-Q8-shaped market share: one nation's fraction of
        # region revenue per order year; HUGEINT share arithmetic
        "q8_market_share": """
            WITH rk AS (
              SELECT n_nationkey FROM nation
              JOIN region ON r_regionkey = n_regionkey
              WHERE r_name = 'ASIA'
            ),
            o AS (
              SELECT o_orderkey,
                     CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                       AS o_year
              FROM orders
              JOIN customer ON c_custkey = o_custkey
              JOIN rk ON rk.n_nationkey = c_nationkey
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01'
            ),
            l AS (
              SELECT l_orderkey,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS rev,
                     CASE WHEN s_nationkey IN (
                       SELECT n_nationkey FROM nation
                       WHERE n_name = 'NATION_12'
                     ) THEN 1 ELSE 0 END AS is_nat
              FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
            ),
            y AS (
              SELECT o.o_year,
                     CAST(SUM(CASE WHEN l.is_nat = 1 THEN l.rev
                              ELSE 0 END) AS HUGEINT) AS nat_rev,
                     CAST(SUM(l.rev) AS HUGEINT) AS tot_rev
              FROM l JOIN o ON o.o_orderkey = l.l_orderkey
              GROUP BY o.o_year
            ),
            yy AS (SELECT UNNEST([1996, 1997]) AS o_year)
            SELECT CAST(yy.o_year AS BIGINT) AS o_year,
                   CAST(COALESCE(y.nat_rev, 0) AS BIGINT) AS nation_rev,
                   CAST(COALESCE(y.tot_rev, 0) AS BIGINT) AS total_rev,
                   CAST(CASE WHEN COALESCE(y.tot_rev, 0) = 0 THEN 0
                        ELSE (1000000 * y.nat_rev) // y.tot_rev
                        END AS BIGINT) AS share_micro
            FROM yy LEFT JOIN y ON y.o_year = yy.o_year
        """,
        # exact distinct-user intersection per event-type pair a<b —
        # the set-operation (audience-overlap) shape
        "events_user_overlap": """
            WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
            SELECT x.event_type AS a, y.event_type AS b,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM du x
            JOIN du y ON y.user_id = x.user_id
                     AND y.event_type > x.event_type
            GROUP BY 1, 2
        """,
        # per-type OLS regression of value-cents on minutes since the
        # 2024-01-01 anchor, solved from integer sufficient statistics
        # in HUGEINT; slope/intercept in nano units, // truncation
        "events_regression": f"""
            WITH m AS (
              SELECT event_type,
                     epoch_us(ts) // 60000000
                       - {REGRESSION_ANCHOR_MIN} AS x,
                     CAST(round(value * 100) AS BIGINT) AS y
              FROM events
            ),
            s AS (
              SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(x*x) AS HUGEINT) AS sxx,
                     CAST(sum(x*y) AS HUGEINT) AS sxy
              FROM m GROUP BY 1
            )
            SELECT event_type,
                   CAST(n AS BIGINT) AS n,
                   CAST(sx AS BIGINT) AS sum_x,
                   CAST(sy AS BIGINT) AS sum_y,
                   CAST(((n*sxy - sx*sy) * CAST(1000000000 AS HUGEINT))
                        // (n*sxx - sx*sx) AS BIGINT) AS slope_nano,
                   CAST(((sy*(n*sxx - sx*sx) - (n*sxy - sx*sy)*sx)
                         * CAST(1000000000 AS HUGEINT))
                        // (n*(n*sxx - sx*sx)) AS BIGINT) AS intercept_nano
            FROM s
        """,
        # seven-rule data-quality audit: bidirectional referential
        # integrity plus row-level range checks; zero counts included
        "referential_audit": """
            SELECT rule, CAST(n AS BIGINT) AS n_violations FROM (
              SELECT 'customers_without_orders' AS rule,
                     (SELECT count(*) FROM customer c
                      WHERE NOT EXISTS (SELECT 1 FROM orders o
                                        WHERE o.o_custkey = c.c_custkey)) AS n
              UNION ALL
              SELECT 'lineitem_discount_out_of_range',
                     (SELECT count(*) FROM lineitem
                      WHERE l_discount < 0 OR l_discount > 0.5)
              UNION ALL
              SELECT 'lineitem_nonpositive_quantity',
                     (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
              UNION ALL
              SELECT 'lineitems_orphaned',
                     (SELECT count(*) FROM lineitem l
                      WHERE NOT EXISTS (SELECT 1 FROM orders o
                                        WHERE o.o_orderkey = l.l_orderkey))
              UNION ALL
              SELECT 'orders_nonpositive_total',
                     (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
              UNION ALL
              SELECT 'orders_orphaned_customer',
                     (SELECT count(*) FROM orders o
                      WHERE NOT EXISTS (SELECT 1 FROM customer c
                                        WHERE c.c_custkey = o.o_custkey))
              UNION ALL
              SELECT 'orders_without_lineitems',
                     (SELECT count(*) FROM orders o
                      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                        WHERE l.l_orderkey = o.o_orderkey))
            )
        """,
        # per-type Shannon entropy in floor-ln micronats (dsir idiom)
        "events_value_entropy": """
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            h AS (
              SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
              FROM c GROUP BY event_type, v
            ),
            t AS (
              SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS n_distinct
              FROM h GROUP BY event_type
            )
            SELECT t.event_type, t.n, t.n_distinct,
                   CAST(SUM(h.c * CAST(floor(1000000 * ln(
                          CAST(t.n AS DOUBLE) / h.c)) AS BIGINT))
                        // t.n AS BIGINT) AS entropy_micronats
            FROM h JOIN t USING (event_type)
            GROUP BY t.event_type, t.n, t.n_distinct
        """,
        # Gini over the (type, cent) histogram: tie-run closed form,
        # HUGEINT weighted position sum, one floored micro division
        "events_gini": """
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS v,
                     CAST(count(*) AS HUGEINT) AS n
              FROM events GROUP BY 1, 2
            ),
            s AS (
              SELECT event_type, v, n,
                     SUM(n) OVER (PARTITION BY event_type ORDER BY v)
                       - n AS prior
              FROM c
            ),
            a AS (
              SELECT event_type,
                     SUM(n) AS nn,
                     SUM(v * n) AS tot,
                     SUM(v * (n * prior + n * (n + 1) // 2)) AS wsum
              FROM s GROUP BY 1
            )
            SELECT event_type,
                   CAST(nn AS BIGINT) AS n,
                   CAST(tot AS BIGINT) AS total_c,
                   CAST(CASE WHEN tot = 0 THEN 0
                        ELSE (1000000 * (2 * wsum - (nn + 1) * tot))
                             // (nn * tot) END AS BIGINT) AS gini_micro
            FROM a
        """,
        # ISO-weekday profile + uniformity chi-square with cleared
        # denominators: sum of (7*o_d - n)^2 over ALL 7 days, // (7n)
        "events_seasonality": """
            WITH d AS (
              SELECT event_type,
                     CAST(isodow(ts) AS BIGINT) AS dow
              FROM events
            ),
            p AS (
              SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     SUM(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS c1,
                     SUM(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS c2,
                     SUM(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS c3,
                     SUM(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS c4,
                     SUM(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS c5,
                     SUM(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS c6,
                     SUM(CASE WHEN dow = 7 THEN 1 ELSE 0 END) AS c7
              FROM d GROUP BY 1
            ),
            q AS (
              SELECT event_type, n, c1, c2, c3, c4, c5, c6, c7,
                     7 * CAST(c1 AS HUGEINT) - n AS d1,
                     7 * CAST(c2 AS HUGEINT) - n AS d2,
                     7 * CAST(c3 AS HUGEINT) - n AS d3,
                     7 * CAST(c4 AS HUGEINT) - n AS d4,
                     7 * CAST(c5 AS HUGEINT) - n AS d5,
                     7 * CAST(c6 AS HUGEINT) - n AS d6,
                     7 * CAST(c7 AS HUGEINT) - n AS d7
              FROM p
            )
            SELECT event_type,
                   CAST(n AS BIGINT) AS n,
                   CAST(c1 AS BIGINT) AS cnt_d1,
                   CAST(c2 AS BIGINT) AS cnt_d2,
                   CAST(c3 AS BIGINT) AS cnt_d3,
                   CAST(c4 AS BIGINT) AS cnt_d4,
                   CAST(c5 AS BIGINT) AS cnt_d5,
                   CAST(c6 AS BIGINT) AS cnt_d6,
                   CAST(c7 AS BIGINT) AS cnt_d7,
                   CAST(CASE WHEN n = 0 THEN 0 ELSE (1000000 * (
                          d1*d1 + d2*d2 + d3*d3 + d4*d4
                        + d5*d5 + d6*d6 + d7*d7))
                        // (7 * n) END AS BIGINT) AS chi2_uniform_micro
            FROM q
        """,
        # per-nation HHI: HUGEINT sum of squared customer cent totals
        # over squared nation total, customers with >= 1 order
        "customer_hhi": """
            WITH x AS (
              SELECT c.c_nationkey AS nk,
                     CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                          AS HUGEINT) AS cents
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
              GROUP BY c.c_nationkey, o.o_custkey
            ),
            a AS (
              SELECT nk,
                     count(*) AS n_customers,
                     SUM(cents) AS tot,
                     SUM(cents * cents) AS sq
              FROM x GROUP BY 1
            )
            SELECT n.n_name,
                   CAST(a.n_customers AS BIGINT) AS n_customers,
                   CAST(a.tot AS BIGINT) AS total_c,
                   CAST(CASE WHEN a.tot = 0 THEN 0
                        ELSE (1000000 * a.sq) // (a.tot * a.tot)
                        END AS BIGINT) AS hhi_micro
            FROM a JOIN nation n ON n.n_nationkey = a.nk
        """,
        # revenue concentration: first rank covering 80%, top-20% share
        "orders_pareto": """
            WITH r AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS rev
              FROM orders GROUP BY o_custkey
            ),
            t AS (
              SELECT CAST(SUM(rev) AS HUGEINT) AS tot,
                     CAST(count(*) AS BIGINT) AS n
              FROM r
            ),
            c AS (
              SELECT rev,
                     SUM(CAST(rev AS HUGEINT))
                       OVER (ORDER BY rev DESC, o_custkey) AS cum,
                     ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rn
              FROM r
            )
            SELECT t.n AS n_customers,
                   CAST((SELECT min(rn) FROM c, t
                         WHERE 5 * cum >= 4 * tot) AS BIGINT)
                     AS n_top_for_80pct,
                   CAST(((SELECT cum FROM c, t
                          WHERE rn = GREATEST(1, CAST(ceil(0.2 * t.n)
                                                      AS BIGINT)))
                         * 1000000) // t.tot AS BIGINT)
                     AS top20_share_micro
            FROM t
        """,
        # market-basket frequent pairs: support >= 2 + integer lift
        "lineitem_frequent_pairs": """
            WITH items AS (
              SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ),
            t AS (
              SELECT CAST(count(DISTINCT o) AS HUGEINT) AS n_orders
              FROM items
            ),
            ic AS (
              SELECT p, CAST(count(*) AS HUGEINT) AS c
              FROM items GROUP BY p
            ),
            pc AS (
              SELECT a.p AS part_a, b.p AS part_b,
                     CAST(count(*) AS BIGINT) AS support
              FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
              GROUP BY a.p, b.p
              HAVING count(*) >= 2
            )
            SELECT pc.part_a, pc.part_b, pc.support,
                   CAST((1000000 * t.n_orders * pc.support)
                        // (ia.c * ib.c) AS BIGINT) AS lift_micro
            FROM pc
            CROSS JOIN t
            JOIN ic ia ON ia.p = pc.part_a
            JOIN ic ib ON ib.p = pc.part_b
        """,
        # directed A-priori rules: both orientations of each frequent
        # pair; confidence over the antecedent count, symmetric lift
        "lineitem_assoc_rules": """
            WITH items AS (
              SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ),
            t AS (
              SELECT CAST(count(DISTINCT o) AS HUGEINT) AS n_orders
              FROM items
            ),
            ic AS (
              SELECT p, CAST(count(*) AS HUGEINT) AS c
              FROM items GROUP BY p
            ),
            pc AS (
              SELECT a.p AS pa, b.p AS pb,
                     CAST(count(*) AS BIGINT) AS support
              FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
              GROUP BY a.p, b.p
              HAVING count(*) >= 2
            ),
            r AS (
              SELECT pa AS antecedent, pb AS consequent, support FROM pc
              UNION ALL
              SELECT pb AS antecedent, pa AS consequent, support FROM pc
            )
            SELECT r.antecedent, r.consequent, r.support,
                   CAST((1000000 * r.support) // ia.c AS BIGINT)
                     AS conf_micro,
                   CAST((1000000 * t.n_orders * r.support)
                        // (ia.c * ib.c) AS BIGINT) AS lift_micro
            FROM r
            CROSS JOIN t
            JOIN ic ia ON ia.p = r.antecedent
            JOIN ic ib ON ib.p = r.consequent
        """,
        # cohort triangle: first-order month x month offset, distinct
        # active customers (offset-0 row = cohort size)
        "orders_cohort_retention": """
            WITH m AS (
              SELECT DISTINCT o_custkey AS c,
                     CAST(year(o_orderdate) * 12
                          + (month(o_orderdate) - 1) AS BIGINT) AS mi
              FROM orders
            ),
            f AS (SELECT c, min(mi) AS fmi FROM m GROUP BY c)
            SELECT printf('%d-%02d', f.fmi // 12, f.fmi % 12 + 1)
                     AS cohort_month,
                   CAST(m.mi - f.fmi AS BIGINT) AS month_offset,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM m JOIN f ON f.c = m.c
            GROUP BY 1, 2
        """,
        # Theil-Sen: lower median of per-pair truncated micro slopes
        # over the daily cent sums (DuckDB // truncates toward zero)
        "events_theilsen": """
            WITH d AS (
              SELECT event_type,
                     (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                       AS day,
                     CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS y
              FROM events GROUP BY 1, 2
            ),
            p AS (
              SELECT a.event_type,
                     (1000000 * CAST(b.y - a.y AS HUGEINT))
                       // (b.day - a.day) AS s
              FROM d a
              JOIN d b ON b.event_type = a.event_type AND b.day > a.day
            ),
            r AS (
              SELECT event_type, s,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY s) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS k
              FROM p
            ),
            nd AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
              FROM d GROUP BY 1
            )
            SELECT nd.event_type, nd.n_days,
                   CAST(COALESCE(max(r.k), 0) AS BIGINT) AS n_pairs,
                   CAST(COALESCE(max(CASE WHEN r.rn = (r.k + 1) // 2
                                     THEN r.s END), 0) AS BIGINT)
                     AS slope_micro
            FROM nd LEFT JOIN r ON r.event_type = nd.event_type
            GROUP BY nd.event_type, nd.n_days
        """,
        # MI(event_type, day-of-week) in floor-ln micronats
        "events_mutual_information": """
            WITH e AS (
              SELECT event_type AS x,
                     (CAST(epoch_us(ts) AS BIGINT) // 86400000000) % 7
                       AS y
              FROM events
            ),
            c AS (
              SELECT x, y, CAST(count(*) AS BIGINT) AS n
              FROM e GROUP BY x, y
            ),
            mx AS (SELECT x, CAST(SUM(n) AS BIGINT) AS cx FROM c GROUP BY x),
            my AS (SELECT y, CAST(SUM(n) AS BIGINT) AS cy FROM c GROUP BY y),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM c)
            SELECT t.n,
                   (SELECT count(*) FROM mx) AS n_types,
                   (SELECT count(*) FROM my) AS n_days,
                   CAST(SUM(c.n * CAST(floor(1000000 * ln(
                          CAST(t.n AS DOUBLE) * c.n / (mx.cx * my.cy)))
                          AS BIGINT)) // t.n AS BIGINT) AS mi_micronats
            FROM c
            JOIN mx USING (x)
            JOIN my USING (y)
            CROSS JOIN t
            GROUP BY t.n
        """,
        # 2x2 A/B chi-square, exact integer (HUGEINT: (ad-bc)^2
        # overflows BIGINT), zero denominator -> 0
        "events_ab_test": """
            WITH u AS (
              SELECT user_id, user_id % 2 AS arm,
                     CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) >= 14
                          THEN 1 ELSE 0 END AS conv
              FROM events GROUP BY user_id
            ),
            cells AS (
              SELECT
                CAST(SUM(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0
                         END) AS HUGEINT) AS a,
                CAST(SUM(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0
                         END) AS HUGEINT) AS b,
                CAST(SUM(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0
                         END) AS HUGEINT) AS c,
                CAST(SUM(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0
                         END) AS HUGEINT) AS d
              FROM u
            )
            SELECT CAST(a + b AS BIGINT) AS users_a,
                   CAST(a AS BIGINT) AS conv_a,
                   CAST(c + d AS BIGINT) AS users_b,
                   CAST(c AS BIGINT) AS conv_b,
                   CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) = 0 THEN 0
                        ELSE CAST((1000000 * (a+b+c+d)
                                   * (a*d - b*c) * (a*d - b*c))
                                  // ((a+b)*(c+d)*(a+c)*(b+d))
                                  AS BIGINT)
                   END AS chi2_micro
            FROM cells
        """,
        # top-20 user journeys: first 8 types per (user, day) joined
        # with '>', counted, (n DESC, path ASC) deterministic cut
        "events_user_paths": """
            WITH e AS (
              SELECT user_id, event_type, ts, event_id,
                     (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                       AS day,
                     ROW_NUMBER() OVER (
                       PARTITION BY user_id,
                         (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                       ORDER BY ts, event_id) AS rn
              FROM events
            ),
            p AS (
              SELECT user_id, day,
                     string_agg(event_type, '>' ORDER BY ts, event_id)
                       AS path
              FROM e WHERE rn <= 8 GROUP BY user_id, day
            ),
            c AS (
              SELECT path, CAST(count(*) AS BIGINT) AS n
              FROM p GROUP BY path
            )
            SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20
        """,
        # integer alpha=1/2 EWMA: genuinely sequential fold (the floor
        # per step has no prefix identity) replayed by a recursive CTE
        "events_ewma": """
            WITH RECURSIVE d AS (
              SELECT event_type,
                     (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                       AS day,
                     CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS x
              FROM events GROUP BY 1, 2
            ),
            dr AS (
              SELECT event_type, day, x,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY day) AS rn
              FROM d
            ),
            r(event_type, rn, day, x, e) AS (
              SELECT event_type, rn, day, x, x FROM dr WHERE rn = 1
              UNION ALL
              SELECT dr.event_type, dr.rn, dr.day, dr.x,
                     (dr.x + r.e) // 2
              FROM r JOIN dr ON dr.event_type = r.event_type
                            AND dr.rn = r.rn + 1
            )
            SELECT event_type, day, x AS x_cents,
                   CAST(e AS BIGINT) AS ewma_cents
            FROM r
        """,
        # Holt linear-trend smoothing: two coupled truncating
        # recursions (level, trend); trend goes negative, so // is
        # DuckDB's toward-zero division on both sides
        # additive Holt-Winters (weekly season m=7) over the
        # gap-filled daily grid; the recursive CTE carries the seven
        # seasonal slots as columns and rotates them each step
        "events_holtwinters": """
            WITH RECURSIVE e AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            c AS (
              SELECT event_type, day, CAST(SUM(v) AS BIGINT) AS s
              FROM e GROUP BY event_type, day
            ),
            bnd AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
            days AS (
              SELECT UNNEST(generate_series(lo, hi)) AS day FROM bnd
            ),
            types AS (SELECT DISTINCT event_type FROM e),
            z AS (
              SELECT t.event_type, d.day,
                     CAST(COALESCE(c.s, 0) AS BIGINT) AS x,
                     ROW_NUMBER() OVER (PARTITION BY t.event_type
                                        ORDER BY d.day) AS rn
              FROM types t
              CROSS JOIN days d
              LEFT JOIN c ON c.event_type = t.event_type
                         AND c.day = d.day
            ),
            r(event_type, rn, day, x, l, b,
              s1, s2, s3, s4, s5, s6, s7) AS (
              SELECT event_type, rn, day, x, x, CAST(0 AS BIGINT),
                     CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                     CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                     CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                     CAST(0 AS BIGINT)
              FROM z WHERE rn = 1
              UNION ALL
              SELECT z.event_type, z.rn, z.day, z.x,
                     (z.x - r.s1 + r.l + r.b) // 2,
                     (((z.x - r.s1 + r.l + r.b) // 2) - r.l + r.b) // 2,
                     r.s2, r.s3, r.s4, r.s5, r.s6, r.s7,
                     (z.x - ((z.x - r.s1 + r.l + r.b) // 2) + r.s1) // 2
              FROM r JOIN z ON z.event_type = r.event_type
                           AND z.rn = r.rn + 1
            )
            SELECT event_type, CAST(day AS BIGINT) AS day,
                   x AS x_cents,
                   CAST(l AS BIGINT) AS level_c,
                   CAST(b AS BIGINT) AS trend_c,
                   CAST(s7 AS BIGINT) AS season_c,
                   CAST(l + b + s1 AS BIGINT) AS forecast_c
            FROM r
        """,
        "events_holt": """
            WITH RECURSIVE d AS (
              SELECT event_type,
                     (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                       AS day,
                     CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS x
              FROM events GROUP BY 1, 2
            ),
            dr AS (
              SELECT event_type, day, x,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY day) AS rn
              FROM d
            ),
            r(event_type, rn, day, x, l, b) AS (
              SELECT event_type, rn, day, x, x, CAST(0 AS BIGINT)
              FROM dr WHERE rn = 1
              UNION ALL
              SELECT dr.event_type, dr.rn, dr.day, dr.x,
                     (dr.x + (r.l + r.b)) // 2,
                     (((dr.x + (r.l + r.b)) // 2) - r.l + r.b) // 2
              FROM r JOIN dr ON dr.event_type = r.event_type
                            AND dr.rn = r.rn + 1
            )
            SELECT event_type, day, x AS x_cents,
                   CAST(l AS BIGINT) AS level_c,
                   CAST(b AS BIGINT) AS trend_c,
                   CAST(l + b AS BIGINT) AS forecast_c
            FROM r
        """,
        # autocorrelation of gap-filled daily counts: signed SQUARED
        # Pearson in micro units (sign(num)·num²·1e6 // (denx·deny) —
        # the square makes floor == trunc, so `//` agrees on both
        # sides); HUGEINT holds to ~1e9 events/day × 1e3 days
        "events_acf": """
            WITH e AS (
              SELECT event_type,
                     (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                       AS day
              FROM events
            ),
            c AS (
              SELECT event_type, day, CAST(count(*) AS HUGEINT) AS n
              FROM e GROUP BY 1, 2
            ),
            b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
            days AS (
              SELECT UNNEST(generate_series(lo, hi)) AS day FROM b
            ),
            types AS (SELECT DISTINCT event_type FROM e),
            filled AS (
              SELECT t.event_type, d.day,
                     COALESCE(c.n, CAST(0 AS HUGEINT)) AS n
              FROM types t CROSS JOIN days d
              LEFT JOIN c ON c.event_type = t.event_type
                         AND c.day = d.day
            ),
            lags AS (SELECT UNNEST(generate_series(1, 7)) AS lag),
            pairs AS (
              SELECT f1.event_type, l.lag, f1.n AS x, f2.n AS y
              FROM filled f1
              CROSS JOIN lags l
              JOIN filled f2 ON f2.event_type = f1.event_type
                            AND f2.day = f1.day + l.lag
            ),
            s AS (
              SELECT event_type, lag,
                     CAST(count(*) AS HUGEINT) AS n,
                     SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                     SUM(x * x) AS sxx, SUM(y * y) AS syy
              FROM pairs GROUP BY 1, 2
            )
            SELECT event_type,
                   CAST(lag AS BIGINT) AS lag,
                   CAST(n AS BIGINT) AS n_days,
                   CAST(CASE
                     WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0
                       THEN 0
                     ELSE (CASE WHEN n * sxy - sx * sy < 0
                                THEN -1 ELSE 1 END)
                          * (((n * sxy - sx * sy) * (n * sxy - sx * sy)
                              * 1000000)
                             // ((n * sxx - sx * sx)
                                 * (n * syy - sy * sy)))
                   END AS BIGINT) AS acf2_micro
            FROM s
        """,
        # two-sample KS: cross-multiplied ECDFs over the merged value
        # grid — max of integers, one final floored division
        # Welch two-sample t^2 between type pairs, exact integer algebra
        "events_welch_t": """
            WITH s AS (
              SELECT event_type AS t,
                     CAST(count(*) AS HUGEINT) AS n,
                     CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS HUGEINT) AS s1,
                     SUM(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                         * CAST(round(value * 100) AS BIGINT)) AS s2
              FROM events GROUP BY 1
            )
            SELECT a.t AS type_a, b.t AS type_b,
                   CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
                   CAST(CASE WHEN ((a.n*a.s2 - a.s1*a.s1)*b.n*b.n*(b.n-1)
                                 + (b.n*b.s2 - b.s1*b.s1)*a.n*a.n*(a.n-1)) = 0
                        THEN -1
                        ELSE (1000000
                              * (a.s1*b.n - b.s1*a.n) * (a.s1*b.n - b.s1*a.n)
                              * (a.n-1) * (b.n-1))
                             // ((a.n*a.s2 - a.s1*a.s1)*b.n*b.n*(b.n-1)
                               + (b.n*b.s2 - b.s1*b.s1)*a.n*a.n*(a.n-1))
                        END AS BIGINT) AS t2_micro
            FROM s a JOIN s b ON a.t < b.t
        """,
        "events_ks_test": """
            WITH c AS (
              SELECT event_type AS t,
                     CAST(round(value * 100) AS BIGINT) AS v,
                     CAST(count(*) AS HUGEINT) AS n
              FROM events GROUP BY 1, 2
            ),
            ty AS (SELECT DISTINCT t FROM c),
            pairs AS (
              SELECT a.t AS ta, b.t AS tb
              FROM ty a JOIN ty b ON b.t > a.t
            ),
            grid AS (
              SELECT DISTINCT p.ta, p.tb, c.v
              FROM pairs p JOIN c ON c.t = p.ta OR c.t = p.tb
            ),
            s AS (
              SELECT g.ta, g.tb, g.v,
                     SUM(COALESCE(ca.n, 0)) OVER w AS cuma,
                     SUM(COALESCE(cb.n, 0)) OVER w AS cumb
              FROM grid g
              LEFT JOIN c ca ON ca.t = g.ta AND ca.v = g.v
              LEFT JOIN c cb ON cb.t = g.tb AND cb.v = g.v
              WINDOW w AS (PARTITION BY g.ta, g.tb ORDER BY g.v)
            ),
            tot AS (SELECT t, SUM(n) AS nt FROM c GROUP BY 1)
            SELECT s.ta AS type_a, s.tb AS type_b,
                   CAST(na.nt AS BIGINT) AS n_a,
                   CAST(nb.nt AS BIGINT) AS n_b,
                   CAST((1000000 * MAX(ABS(nb.nt * s.cuma
                                           - na.nt * s.cumb)))
                        // (na.nt * nb.nt) AS BIGINT) AS ks_micro
            FROM s
            JOIN tot na ON na.t = s.ta
            JOIN tot nb ON nb.t = s.tb
            GROUP BY s.ta, s.tb, na.nt, nb.nt
        """,
        # open-order backlog: interval sweep over [orderdate,
        # max(l_shipdate)] inclusive, running sum at delta days
        "orders_open_backlog": """
            WITH ship AS (
              SELECT l_orderkey AS okey,
                     MAX(CAST(epoch_us(l_shipdate) AS BIGINT)
                         // 86400000000) AS close_day
              FROM lineitem GROUP BY 1
            ),
            op AS (
              SELECT o_orderkey AS okey,
                     CAST(epoch_us(o_orderdate) AS BIGINT)
                       // 86400000000 AS open_day
              FROM orders
            ),
            iv AS (
              SELECT op.okey, op.open_day, s.close_day
              FROM op JOIN ship s USING (okey)
            ),
            delta AS (
              SELECT open_day AS day, 1 AS d FROM iv
              UNION ALL
              SELECT close_day + 1, -1 FROM iv
            ),
            byday AS (
              SELECT day, CAST(SUM(d) AS BIGINT) AS d
              FROM delta GROUP BY day
            )
            SELECT day,
                   CAST(SUM(d) OVER (ORDER BY day) AS BIGINT) AS n_open
            FROM byday
        """,
        # fulfillment latency percentiles: integer rank rules over
        # the per-priority latency histogram
        "orders_fulfillment_latency": """
            WITH ship AS (
              SELECT l_orderkey AS okey,
                     MAX(CAST(epoch_us(l_shipdate) AS BIGINT)
                         // 86400000000) AS close_day
              FROM lineitem GROUP BY 1
            ),
            lat AS (
              SELECT o.o_orderpriority AS priority,
                     s.close_day
                       - (CAST(epoch_us(o.o_orderdate) AS BIGINT)
                          // 86400000000) AS lat
              FROM orders o JOIN ship s ON s.okey = o.o_orderkey
            ),
            hist AS (
              SELECT priority, lat, count(*) AS c
              FROM lat GROUP BY 1, 2
            ),
            cum AS (
              SELECT priority, lat,
                     SUM(c) OVER (PARTITION BY priority
                                  ORDER BY lat) AS cm,
                     SUM(c) OVER (PARTITION BY priority) AS n
              FROM hist
            )
            SELECT priority,
                   CAST(MAX(n) AS BIGINT) AS n_orders,
                   CAST(MIN(CASE WHEN 2 * cm >= n THEN lat END)
                        AS BIGINT) AS p50_days,
                   CAST(MIN(CASE WHEN 10 * cm >= 9 * n THEN lat END)
                        AS BIGINT) AS p90_days,
                   CAST(MAX(lat) AS BIGINT) AS max_days
            FROM cum GROUP BY priority
        """,
        # Benford first-digit audit: the SAME nano constants as the
        # engine's _BENFORD_NANO; zero-obs digits still contribute
        "events_benford": """
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events
              WHERE CAST(round(value * 100) AS BIGINT) > 0
            ),
            obs AS (
              SELECT event_type,
                     CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                       AS digit,
                     CAST(count(*) AS BIGINT) AS n_obs
              FROM c GROUP BY 1, 2
            ),
            tot AS (
              SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS n
              FROM obs GROUP BY 1
            ),
            p(digit, p_nano) AS (VALUES
              (1, 301029995), (2, 176091259), (3, 124938736),
              (4, 96910013), (5, 79181246), (6, 66946789),
              (7, 57991946), (8, 51152522), (9, 45757490)),
            f AS (
              SELECT t.event_type, p.digit,
                     COALESCE(o.n_obs, 0) AS n_obs, t.n, p.p_nano
              FROM tot t CROSS JOIN p
              LEFT JOIN obs o ON o.event_type = t.event_type
                             AND o.digit = p.digit
            ),
            terms AS (
              SELECT event_type, CAST(digit AS BIGINT) AS digit,
                     CAST(n_obs AS BIGINT) AS n_obs,
                     CAST(((CAST(n_obs AS HUGEINT) * 1000000000
                            - CAST(n AS HUGEINT) * p_nano)
                           * (CAST(n_obs AS HUGEINT) * 1000000000
                              - CAST(n AS HUGEINT) * p_nano)
                           * 1000000)
                          // (CAST(n AS HUGEINT) * p_nano * 1000000000)
                          AS BIGINT) AS term_micro
              FROM f
            )
            SELECT event_type, digit, n_obs, term_micro,
                   CAST(SUM(term_micro) OVER (PARTITION BY event_type)
                        AS BIGINT) AS chi2_micro
            FROM terms
        """,
        # last-touch attribution: latest prior click within 7 days
        "events_attribution": """
            WITH w AS (
              SELECT user_id, ts, event_id, event_type,
                     MAX(CASE WHEN event_type = 'click' THEN ts END)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS last_click
              FROM events
            ),
            p AS (
              SELECT (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                       AS day,
                     CASE WHEN last_click IS NOT NULL
                           AND epoch_us(ts) - epoch_us(last_click)
                               <= 7 * 86400000000
                          THEN 1 ELSE 0 END AS attr
              FROM w WHERE event_type = 'purchase'
            )
            SELECT day, CAST(count(*) AS BIGINT) AS n_purchases,
                   CAST(SUM(attr) AS BIGINT) AS n_attributed
            FROM p GROUP BY day
        """,
        # Spearman rank correlation (ROW_NUMBER ranks, integer rho)
        "events_spearman": """
            WITH u AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
                     CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS sum_c
              FROM events GROUP BY user_id
            ),
            r AS (
              SELECT user_id,
                     ROW_NUMBER() OVER (ORDER BY n_ev, user_id) AS rx,
                     ROW_NUMBER() OVER (ORDER BY sum_c, user_id) AS ry
              FROM u
            ),
            s AS (
              SELECT CAST(count(*) AS HUGEINT) AS n,
                     CAST(SUM(CAST(rx - ry AS HUGEINT) * (rx - ry))
                          AS HUGEINT) AS d2
              FROM r
            )
            SELECT CAST(n AS BIGINT) AS n_users,
                   CASE WHEN n <= 1 THEN 0
                        ELSE CAST((1000000 * (n * (n * n - 1) - 6 * d2))
                                  // (n * (n * n - 1)) AS BIGINT)
                   END AS rho_micro
            FROM s
        """,
        # interpolated median, exact in half-cents (2*quantile_cont
        # is exactly representable: cents < 2^52, /2 is a power of 2)
        "events_value_median_cont": """
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(2 * quantile_cont(v, 0.5) AS BIGINT)
                     AS median_halfcents
            FROM c GROUP BY event_type
        """,
        # 2-state integer min-plus Viterbi (Kleinberg bursts): the
        # forward recursive CTE accumulates the backpointer string,
        # a second recursive CTE walks it backwards — full DP in SQL
        "events_bursts": """
            WITH RECURSIVE cnt AS (
              SELECT event_type,
                     (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                       AS day,
                     CAST(count(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2
            ),
            span AS (
              SELECT min(day) AS lo, max(day) AS hi FROM cnt
            ),
            grid AS (
              SELECT t.event_type, d.day,
                     CAST(d.day - s.lo + 1 AS BIGINT) AS rn,
                     COALESCE(c.x, 0) AS x
              FROM (SELECT DISTINCT event_type FROM cnt) t
              CROSS JOIN span s
              CROSS JOIN LATERAL (
                SELECT UNNEST(range(s.lo, s.hi + 1)) AS day) d
              LEFT JOIN cnt c ON c.event_type = t.event_type
                             AND c.day = d.day
            ),
            par AS (
              SELECT event_type,
                     CAST(floor(1000000 * (CAST(SUM(x) AS DOUBLE)
                                           / count(*))) AS BIGINT) AS a0,
                     CAST(floor(1000000 * ln(CAST(SUM(x) AS DOUBLE)
                                             / count(*))) AS BIGINT)
                       AS b0,
                     CAST(floor(1000000 * (2 * CAST(SUM(x) AS DOUBLE)
                                           / count(*))) AS BIGINT) AS a1,
                     CAST(floor(1000000 * ln(2 * CAST(SUM(x) AS DOUBLE)
                                             / count(*))) AS BIGINT)
                       AS b1,
                     CAST(max(rn) AS BIGINT) AS t_max
              FROM grid GROUP BY event_type
            ),
            f(event_type, rn, c0, c1, bps) AS (
              SELECT g.event_type, g.rn,
                     p.a0 - g.x * p.b0,
                     1000000 + p.a1 - g.x * p.b1,
                     ''
              FROM grid g JOIN par p USING (event_type)
              WHERE g.rn = 1
              UNION ALL
              SELECT g.event_type, g.rn,
                     (p.a0 - g.x * p.b0) + LEAST(f.c0, f.c1),
                     (p.a1 - g.x * p.b1)
                       + LEAST(f.c0 + 1000000, f.c1),
                     f.bps
                       || (CASE WHEN f.c0 <= f.c1
                                THEN '0' ELSE '1' END)
                       || (CASE WHEN f.c0 + 1000000 <= f.c1
                                THEN '0' ELSE '1' END)
              FROM f
              JOIN grid g ON g.event_type = f.event_type
                         AND g.rn = f.rn + 1
              JOIN par p ON p.event_type = f.event_type
            ),
            last AS (
              SELECT f.event_type, f.rn, f.c0, f.c1, f.bps
              FROM f JOIN par p ON p.event_type = f.event_type
                               AND p.t_max = f.rn
            ),
            b(event_type, rn, s) AS (
              SELECT event_type, rn,
                     CASE WHEN c0 <= c1 THEN 0 ELSE 1 END
              FROM last
              UNION ALL
              SELECT b.event_type, b.rn - 1,
                     CAST(substr(l.bps, CAST(2 * (b.rn - 2) + 1 + b.s
                                             AS BIGINT), 1) AS INT)
              FROM b JOIN last l ON l.event_type = b.event_type
              WHERE b.rn > 1
            ),
            sp2 AS (SELECT lo FROM span)
            SELECT g.event_type, g.day, g.x,
                   CAST(b.s AS BIGINT) AS burst
            FROM b
            JOIN grid g ON g.event_type = b.event_type AND g.rn = b.rn
        """,
        # robust dispersion: exact discrete median + MAD per type
        "events_value_mad": """
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            med AS (
              SELECT event_type,
                     CAST(quantile_disc(v, 0.5) AS BIGINT) AS m,
                     CAST(count(*) AS BIGINT) AS n
              FROM c GROUP BY event_type
            )
            SELECT m.event_type, m.n, m.m AS median_cents,
                   CAST(quantile_disc(abs(c.v - m.m), 0.5) AS BIGINT)
                     AS mad_cents
            FROM c JOIN med m USING (event_type)
            GROUP BY m.event_type, m.n, m.m
        """,
        # ANALYZE statistics: exact per-column cardinalities/NDV/nulls
        # functional-dependency audit: exact distinct(A) vs distinct(A,B)
        "table_fds": """
            WITH f AS (
              SELECT 'customer' AS tbl, 'c_custkey' AS det, 'c_nationkey' AS dep,
                (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer)) AS n_det,
                (SELECT count(*) FROM (SELECT DISTINCT c_custkey, c_nationkey FROM customer)) AS n_pairs
              UNION ALL
              SELECT 'customer', 'c_nationkey', 'c_mktsegment',
                (SELECT count(*) FROM (SELECT DISTINCT c_nationkey FROM customer)),
                (SELECT count(*) FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer))
              UNION ALL
              SELECT 'documents', 'doc_id', 'lang',
                (SELECT count(*) FROM (SELECT DISTINCT doc_id FROM documents)),
                (SELECT count(*) FROM (SELECT DISTINCT doc_id, lang FROM documents))
              UNION ALL
              SELECT 'documents', 'lang', 'source',
                (SELECT count(*) FROM (SELECT DISTINCT lang FROM documents)),
                (SELECT count(*) FROM (SELECT DISTINCT lang, source FROM documents))
              UNION ALL
              SELECT 'events', 'event_id', 'user_id',
                (SELECT count(*) FROM (SELECT DISTINCT event_id FROM events)),
                (SELECT count(*) FROM (SELECT DISTINCT event_id, user_id FROM events))
              UNION ALL
              SELECT 'events', 'user_id', 'event_type',
                (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events)),
                (SELECT count(*) FROM (SELECT DISTINCT user_id, event_type FROM events))
              UNION ALL
              SELECT 'lineitem', 'l_orderkey', 'l_partkey',
                (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem)),
                (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
              UNION ALL
              SELECT 'lineitem', 'l_orderkey,l_linenumber', 'l_partkey',
                (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)),
                (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey FROM lineitem))
              UNION ALL
              SELECT 'orders', 'o_custkey', 'o_orderpriority',
                (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders)),
                (SELECT count(*) FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders))
              UNION ALL
              SELECT 'orders', 'o_orderkey', 'o_custkey',
                (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders)),
                (SELECT count(*) FROM (SELECT DISTINCT o_orderkey, o_custkey FROM orders))
              UNION ALL
              SELECT 'part', 'p_brand', 'p_type',
                (SELECT count(*) FROM (SELECT DISTINCT p_brand FROM part)),
                (SELECT count(*) FROM (SELECT DISTINCT p_brand, p_type FROM part))
              UNION ALL
              SELECT 'part', 'p_partkey', 'p_brand',
                (SELECT count(*) FROM (SELECT DISTINCT p_partkey FROM part)),
                (SELECT count(*) FROM (SELECT DISTINCT p_partkey, p_brand FROM part))
            )
            SELECT tbl, det, dep,
                   CAST(n_det AS BIGINT) AS n_det,
                   CAST(n_pairs AS BIGINT) AS n_pairs,
                   CAST(n_pairs - n_det AS BIGINT) AS n_violations,
                   CAST(CASE WHEN n_pairs = n_det THEN 1 ELSE 0 END
                        AS BIGINT) AS holds
            FROM f
        """,
        "table_stats": """
              SELECT 'customer' AS tbl, 'c_custkey' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(c_custkey) AS BIGINT) AS n_null, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct FROM customer
              UNION ALL
              SELECT 'customer' AS tbl, 'c_name' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(c_name) AS BIGINT) AS n_null, CAST(count(DISTINCT c_name) AS BIGINT) AS n_distinct FROM customer
              UNION ALL
              SELECT 'customer' AS tbl, 'c_nationkey' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(c_nationkey) AS BIGINT) AS n_null, CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_distinct FROM customer
              UNION ALL
              SELECT 'customer' AS tbl, 'c_acctbal' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(c_acctbal) AS BIGINT) AS n_null, CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_distinct FROM customer
              UNION ALL
              SELECT 'customer' AS tbl, 'c_mktsegment' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(c_mktsegment) AS BIGINT) AS n_null, CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_distinct FROM customer
              UNION ALL
              SELECT 'orders' AS tbl, 'o_orderkey' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct FROM orders
              UNION ALL
              SELECT 'orders' AS tbl, 'o_custkey' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct FROM orders
              UNION ALL
              SELECT 'orders' AS tbl, 'o_orderstatus' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(o_orderstatus) AS BIGINT) AS n_null, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct FROM orders
              UNION ALL
              SELECT 'orders' AS tbl, 'o_totalprice' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(o_totalprice) AS BIGINT) AS n_null, CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct FROM orders
              UNION ALL
              SELECT 'orders' AS tbl, 'o_orderdate' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(o_orderdate) AS BIGINT) AS n_null, CAST(count(DISTINCT o_orderdate) AS BIGINT) AS n_distinct FROM orders
              UNION ALL
              SELECT 'orders' AS tbl, 'o_orderpriority' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(o_orderpriority) AS BIGINT) AS n_null, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_distinct FROM orders
              UNION ALL
              SELECT 'part' AS tbl, 'p_partkey' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(p_partkey) AS BIGINT) AS n_null, CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_distinct FROM part
              UNION ALL
              SELECT 'part' AS tbl, 'p_name' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(p_name) AS BIGINT) AS n_null, CAST(count(DISTINCT p_name) AS BIGINT) AS n_distinct FROM part
              UNION ALL
              SELECT 'part' AS tbl, 'p_brand' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(p_brand) AS BIGINT) AS n_null, CAST(count(DISTINCT p_brand) AS BIGINT) AS n_distinct FROM part
              UNION ALL
              SELECT 'part' AS tbl, 'p_type' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(p_type) AS BIGINT) AS n_null, CAST(count(DISTINCT p_type) AS BIGINT) AS n_distinct FROM part
              UNION ALL
              SELECT 'part' AS tbl, 'p_size' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(p_size) AS BIGINT) AS n_null, CAST(count(DISTINCT p_size) AS BIGINT) AS n_distinct FROM part
              UNION ALL
              SELECT 'part' AS tbl, 'p_retailprice' AS col, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(p_retailprice) AS BIGINT) AS n_null, CAST(count(DISTINCT p_retailprice) AS BIGINT) AS n_distinct FROM part
        """,
        # k-anonymity audit: quasi-identifier classes below k members
        "customer_k_anonymity": """
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   c_mktsegment,
                   CAST(count(*) AS BIGINT) AS group_size
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
            HAVING count(*) < 10
        """,
        # year-over-year monthly revenue growth; growth in 10^-6 with
        # truncating division; months lacking a prior-year month omitted
        "orders_yoy_growth": """
            WITH m AS (
              SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
                     CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS month,
                     CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS rev
              FROM orders GROUP BY 1, 2
            )
            SELECT c.year, c.month,
                   c.rev AS rev_cents,
                   p.rev AS prev_rev_cents,
                   CAST(((CAST(c.rev AS HUGEINT) - p.rev) * 1000000)
                        // p.rev AS BIGINT) AS growth_micro
            FROM m c JOIN m p ON p.year = c.year - 1 AND p.month = c.month
            WHERE p.rev > 0
        """,
        # per-type top-k priciest parts INCLUDING ties (RANK <= k);
        # ranked on cents so double rounding can't reorder
        "part_price_topk_ties": """
            SELECT p_type, p_partkey,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
                   CAST(rnk AS BIGINT) AS rnk
            FROM (
              SELECT p_type, p_partkey, p_retailprice,
                     RANK() OVER (
                       PARTITION BY p_type
                       ORDER BY CAST(round(p_retailprice * 100) AS BIGINT)
                                DESC) AS rnk
              FROM part
            )
            WHERE rnk <= 5
        """,
        # one-sided upper CUSUM per type over gap-filled daily cent
        # sums: the max(0, S+(x−k)) recursion closed to prefix-sum
        # minus running-min (both window functions); k = total //
        # n_days truncating
        # length-2 sequence support: users with an a-event strictly
        # before some b-event (per-user min/max extrema comparison)
        "events_seq_support": """
            WITH m AS (
              SELECT user_id, event_type,
                     min(ts) AS mn, max(ts) AS mx
              FROM events GROUP BY 1, 2
            )
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM m a JOIN m b ON b.user_id = a.user_id
                             AND b.event_type <> a.event_type
                             AND a.mn < b.mx
            GROUP BY 1, 2
        """,
        # grouped OLS: price cents on discount percent units, exact
        # integer cross-products, trunc division (sign-after-floor)
        "lineitem_group_regression": """
            WITH p AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(round(l_discount * 100) AS HUGEINT) AS x,
                     CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
              FROM lineitem
            ),
            s AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(count(*) AS HUGEINT) AS n,
                     SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * y) AS sxy, SUM(x * x) AS sxx
              FROM p GROUP BY 1, 2
            ),
            f AS (
              SELECT l_returnflag, l_linestatus, n,
                     n * sxy - sx * sy AS num_s,
                     sy * sxx - sx * sxy AS num_i,
                     n * sxx - sx * sx AS den
              FROM s
            )
            SELECT l_returnflag, l_linestatus,
                   CAST(n AS BIGINT) AS n,
                   CAST(CASE WHEN den = 0 THEN 0
                        ELSE (CASE WHEN num_s >= 0 THEN 1 ELSE -1 END)
                             * ((abs(num_s) * 1000000) // den)
                        END AS BIGINT) AS slope_micro,
                   CAST(CASE WHEN den = 0 THEN 0
                        ELSE (CASE WHEN num_i >= 0 THEN 1 ELSE -1 END)
                             * (abs(num_i) // den)
                        END AS BIGINT) AS intercept_c
            FROM f
        """,
        # ABC classification: per-customer revenue, cumulative share
        # thresholds compared as exact integers (100·cum vs 80/95·tot)
        "orders_abc_class": """
            WITH r AS (
              SELECT o_custkey AS custkey,
                     CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS revenue_c
              FROM orders GROUP BY 1
            ),
            t AS (SELECT CAST(SUM(revenue_c) AS HUGEINT) AS tot FROM r),
            c AS (
              SELECT custkey, revenue_c,
                     ROW_NUMBER()
                       OVER (ORDER BY revenue_c DESC, custkey) AS rn,
                     SUM(CAST(revenue_c AS HUGEINT))
                       OVER (ORDER BY revenue_c DESC, custkey) AS cum
              FROM r
            )
            SELECT custkey, revenue_c, CAST(rn AS BIGINT) AS rn,
                   CAST(cum AS BIGINT) AS cum_c,
                   CASE WHEN 100 * cum <= 80 * tot THEN 'A'
                        WHEN 100 * cum <= 95 * tot THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM c CROSS JOIN t
        """,
        # SCD Type 2: consecutive equal event_type values per user
        # collapse into validity intervals; open record valid_to = -1
        "events_scd2": """
            WITH e AS (
              SELECT user_id, event_type,
                     CAST(epoch_us(ts) AS BIGINT) AS us, event_id
              FROM events
            ),
            o AS (
              SELECT user_id, event_type, us, event_id,
                     CASE WHEN LAG(event_type) OVER w
                               IS DISTINCT FROM event_type
                          THEN 1 ELSE 0 END AS is_start
              FROM e WINDOW w AS (PARTITION BY user_id
                                  ORDER BY us, event_id)
            ),
            isl AS (
              SELECT user_id, event_type, us,
                     SUM(is_start) OVER (PARTITION BY user_id
                                         ORDER BY us, event_id
                                         ROWS UNBOUNDED PRECEDING)
                       AS ver
              FROM o
            ),
            runs AS (
              SELECT user_id, CAST(ver AS BIGINT) AS version,
                     MIN(event_type) AS event_type,
                     MIN(us) AS valid_from_us
              FROM isl GROUP BY user_id, ver
            )
            SELECT user_id, version, event_type, valid_from_us,
                   COALESCE(LEAD(valid_from_us)
                              OVER (PARTITION BY user_id
                                    ORDER BY version), -1)
                     AS valid_to_us
            FROM runs
        """,
        # deterministic bootstrap: resample b redraws n observed daily
        # cent totals picking index md5h60('b:j') % n; mean truncates
        "events_bootstrap_ci": """
            WITH daily AS (
              SELECT epoch_us(ts) // 86400000000 AS day,
                     SUM(CAST(round(value * 100) AS BIGINT)) AS t
              FROM events GROUP BY 1
            ),
            idx AS (
              SELECT t, ROW_NUMBER() OVER (ORDER BY day) - 1 AS i
              FROM daily
            ),
            nn AS (SELECT COUNT(*) AS n FROM idx),
            -- draw slot j reuses idx.i (already exactly 0..n-1);
            -- generate_series can't take a subquery bound in DuckDB
            draws AS (
              SELECT b.b AS b,
                     ('0x' || substr(md5(b.b || ':' || j.i), 1, 15))
                       ::BIGINT % nn.n AS pick
              FROM generate_series(1, 200) b(b)
              CROSS JOIN nn
              CROSS JOIN (SELECT i FROM idx) j
            )
            SELECT CAST(d.b AS BIGINT) AS b,
                   CAST(SUM(CAST(i.t AS HUGEINT))
                        // (SELECT n FROM nn) AS BIGINT) AS mean_c
            FROM draws d JOIN idx i ON i.i = d.pick
            GROUP BY d.b
        """,
        # simplified silhouette against trunc-div integer label
        # centroids; sil = sign(b-a)·(10^6·|b-a|)//max(a,b)
        "embeddings_silhouette": """
            WITH q AS (
              -- CAST to DOUBLE first: FLOAT * INT stays float32 in
              -- DuckDB and floor() then disagrees with numpy's
              -- float64 path on ~0.4% of components
              SELECT vec_id, label, i AS dim,
                     CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
                          AS BIGINT) AS qv
              FROM embeddings,
                   LATERAL unnest(generate_series(1, len(embedding)))
                     t(i)
            ),
            s AS (
              SELECT label, dim, SUM(CAST(qv AS HUGEINT)) AS sv,
                     CAST(COUNT(*) AS HUGEINT) AS n
              FROM q GROUP BY 1, 2
            ),
            c AS (SELECT label, dim, sv // n AS cv FROM s),
            d2 AS (
              SELECT q.vec_id, q.label AS own, c.label AS other,
                     SUM((CAST(q.qv AS HUGEINT) - c.cv)
                         * (CAST(q.qv AS HUGEINT) - c.cv)) AS d2
              FROM q JOIN c ON c.dim = q.dim
              GROUP BY 1, 2, 3
            ),
            a AS (
              SELECT vec_id, own, d2 AS a FROM d2 WHERE own = other
            ),
            b AS (
              SELECT vec_id, other, d2,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY d2, other) AS rn
              FROM d2 WHERE own <> other
            )
            SELECT a.vec_id,
                   CAST(a.own AS BIGINT) AS label,
                   CAST(b.other AS BIGINT) AS best_other,
                   CAST(CASE WHEN GREATEST(a.a, b.d2) = 0 THEN 0
                        ELSE (CASE WHEN b.d2 >= a.a THEN 1 ELSE -1 END)
                             * ((1000000 * abs(b.d2 - a.a))
                                // GREATEST(a.a, b.d2))
                        END AS BIGINT) AS sil_micro
            FROM a JOIN b ON b.vec_id = a.vec_id AND b.rn = 1
        """,
        # Mann-Kendall S over observed daily sums: exact signed
        # pair counts via a day<day self-join
        "events_mann_kendall": """
            WITH d AS (
              SELECT epoch_us(ts) // 86400000000 AS day,
                     SUM(CAST(round(value * 100) AS BIGINT)) AS t
              FROM events GROUP BY 1
            ),
            p AS (
              SELECT CASE WHEN b.t > a.t THEN 1
                          WHEN b.t < a.t THEN -1 ELSE 0 END AS sgn
              FROM d a JOIN d b ON b.day > a.day
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
                   CAST(COALESCE(SUM(sgn), 0) AS BIGINT) AS s_stat,
                   CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos,
                   CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_neg,
                   CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tie
            FROM p
        """,
        # Wald-Wolfowitz runs test over gap-filled daily changes;
        # zero-change days excluded, expected runs in exact micro
        "events_runs_test": """
            WITH daily AS (
              SELECT epoch_us(ts) // 86400000000 AS day,
                     SUM(CAST(round(value * 100) AS BIGINT)) AS t
              FROM events GROUP BY 1
            ),
            b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
            grid AS (
              SELECT gs.i AS i, COALESCE(d.t, 0) AS x
              FROM generate_series(0, 131071) gs(i)
              CROSS JOIN b
              LEFT JOIN daily d ON d.day = b.lo + gs.i
              WHERE gs.i <= b.hi - b.lo
            ),
            ch AS (
              SELECT i, x - LAG(x) OVER (ORDER BY i) AS dv FROM grid
            ),
            s AS (
              SELECT CASE WHEN dv > 0 THEN 1 ELSE -1 END AS sgn,
                     ROW_NUMBER() OVER (ORDER BY i) AS rn
              FROM ch WHERE dv IS NOT NULL AND dv <> 0
            ),
            r AS (
              SELECT COUNT(*) AS n_runs FROM (
                SELECT sgn, LAG(sgn) OVER (ORDER BY rn) AS prev
                FROM s) q
              WHERE prev IS NULL OR prev <> sgn
            ),
            agg AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                     CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                          AS HUGEINT) AS np,
                     CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)
                          AS HUGEINT) AS nm
              FROM s
            )
            SELECT CAST(n AS BIGINT) AS n_moves,
                   CAST(np AS BIGINT) AS n_plus,
                   CAST(nm AS BIGINT) AS n_minus,
                   CAST((SELECT n_runs FROM r) AS BIGINT) AS n_runs,
                   CAST((1000000 * (n + 2 * np * nm)) // n AS BIGINT)
                     AS expected_micro
            FROM agg WHERE n > 0
        """,
        # exact mode per type from the (type, cent) histogram;
        # ties to the smallest value (SQL mode() is tie-undefined)
        "events_value_mode": """
            WITH h AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS v,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            r AS (
              SELECT event_type, v, n,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY n DESC, v ASC) AS rn
              FROM h
            )
            SELECT event_type, v AS mode_c, n AS n_mode
            FROM r WHERE rn = 1
        """,
        # quantized one-way ANOVA of fulfillment latency across
        # priorities: trunc-div integer group means, exact integer
        # SSB'/SSW', one floored F in micro
        "orders_latency_anova": """
            WITH ship AS (
              SELECT l_orderkey AS okey,
                     MAX(CAST(epoch_us(l_shipdate) AS BIGINT)
                         // 86400000000) AS close_day
              FROM lineitem GROUP BY 1
            ),
            lat AS (
              SELECT o.o_orderpriority AS priority,
                     s.close_day
                       - (CAST(epoch_us(o.o_orderdate) AS BIGINT)
                          // 86400000000) AS lat
              FROM orders o JOIN ship s ON s.okey = o.o_orderkey
            ),
            g AS (
              SELECT priority,
                     CAST(COUNT(*) AS HUGEINT) AS n,
                     CAST(SUM(lat) AS HUGEINT) AS s1,
                     CAST(SUM(lat * lat) AS HUGEINT) AS s2
              FROM lat GROUP BY 1
            ),
            t AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS k,
                     SUM(n) AS n, SUM(s1) AS s FROM g
            ),
            q AS (
              SELECT g.n AS ng, g.s1 AS sg, g.s2 AS qg,
                     g.s1 // g.n AS mg,
                     (SELECT s FROM t) // (SELECT n FROM t) AS m
              FROM g
            ),
            f AS (
              SELECT SUM(ng * (mg - m) * (mg - m)) AS ssb,
                     SUM(qg - 2 * mg * sg + ng * mg * mg) AS ssw
              FROM q
            )
            SELECT CAST((SELECT k FROM t) AS BIGINT) AS k_groups,
                   CAST((SELECT n FROM t) AS BIGINT) AS n_total,
                   CAST(ssb AS BIGINT) AS ssb_q,
                   CAST(ssw AS BIGINT) AS ssw_q,
                   CAST(CASE WHEN (SELECT k FROM t) < 2 OR ssw = 0
                        THEN 0
                        ELSE (1000000 * ssb
                              * ((SELECT n FROM t)
                                 - (SELECT k FROM t)))
                             // (ssw * ((SELECT k FROM t) - 1))
                        END AS BIGINT) AS f_micro
            FROM f
        """,
        # Lorenz curve of per-user totals: NTILE(10) ascending by
        # (total, user_id), cumulative exact shares in micro
        "events_lorenz": """
            WITH u AS (
              SELECT user_id,
                     SUM(CAST(round(value * 100) AS BIGINT)) AS t
              FROM events GROUP BY 1
            ),
            nt AS (
              SELECT user_id, t,
                     NTILE(10) OVER (ORDER BY t, user_id) AS decile
              FROM u
            ),
            p AS (
              SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(t) AS HUGEINT) AS v
              FROM nt GROUP BY 1
            ),
            c AS (
              SELECT decile,
                     SUM(n) OVER (ORDER BY decile) AS ncum,
                     SUM(v) OVER (ORDER BY decile) AS vcum,
                     (SELECT SUM(v) FROM p) AS tot
              FROM p
            )
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(ncum AS BIGINT) AS n_users_cum,
                   CAST(vcum AS BIGINT) AS value_cum_c,
                   CAST(CASE WHEN tot = 0 THEN 0
                        ELSE (1000000 * vcum) // tot END AS BIGINT)
                     AS share_micro
            FROM c
        """,
        # Laspeyres/Paasche vs the base ship year over the matched
        # basket; unit prices trunc-div quantized BEFORE weighting
        "lineitem_price_index": """
            WITH l AS (
              SELECT year(l_shipdate) AS year, l_partkey AS part,
                     CAST(round(l_extendedprice * 100) AS HUGEINT)
                       AS ep,
                     CAST(round(l_quantity) AS BIGINT) AS q
              FROM lineitem
            ),
            py AS (
              SELECT year, part, SUM(ep) AS ep, SUM(q) AS q
              FROM l GROUP BY 1, 2
            ),
            u AS (SELECT year, part, ep // q AS u, q FROM py),
            m AS (
              SELECT u.year, CAST(COUNT(*) AS BIGINT) AS np,
                     SUM(u.u * b.q0) AS ln,
                     SUM(b.u0 * b.q0) AS ld,
                     SUM(u.u * u.q) AS pn,
                     SUM(b.u0 * u.q) AS pdn
              FROM u
              JOIN (SELECT part, u AS u0, q AS q0 FROM u
                    WHERE year = (SELECT MIN(year) FROM u)) b
                USING (part)
              WHERE u.year <> (SELECT MIN(year) FROM u)
              GROUP BY u.year
            )
            SELECT CAST(year AS BIGINT) AS year, np AS n_parts,
                   CAST((1000000 * ln) // ld AS BIGINT)
                     AS lasp_micro,
                   CAST((1000000 * pn) // pdn AS BIGINT)
                     AS paasche_micro
            FROM m WHERE ld > 0 AND pdn > 0
        """,
        # absorbing-Markov conversion probability within 4 steps:
        # every lookup of the target pins 10^6 (absorbing), one floor
        # per (step, state); dst-only states stay 0
        "events_absorption": """
            WITH s0 AS (
              SELECT event_type AS src,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS dst
              FROM events
            ),
            p AS (
              SELECT src, dst, CAST(count(*) AS HUGEINT) AS n_pair
              FROM s0 WHERE dst IS NOT NULL GROUP BY src, dst
            ),
            t AS (SELECT src, SUM(n_pair) AS tot FROM p GROUP BY src),
            q1 AS (
              SELECT p.src AS s,
                     SUM(p.n_pair * (CASE WHEN p.dst = 'purchase'
                         THEN 1000000 ELSE 0 END)) // t.tot AS q
              FROM p JOIN t USING (src)
              WHERE p.src <> 'purchase'
              GROUP BY p.src, t.tot
            ),
            q2 AS (
              SELECT p.src AS s,
                     SUM(p.n_pair * (CASE WHEN p.dst = 'purchase'
                         THEN 1000000 ELSE COALESCE(l.q, 0) END))
                       // t.tot AS q
              FROM p JOIN t USING (src)
              LEFT JOIN q1 l ON l.s = p.dst
              WHERE p.src <> 'purchase'
              GROUP BY p.src, t.tot
            ),
            q3 AS (
              SELECT p.src AS s,
                     SUM(p.n_pair * (CASE WHEN p.dst = 'purchase'
                         THEN 1000000 ELSE COALESCE(l.q, 0) END))
                       // t.tot AS q
              FROM p JOIN t USING (src)
              LEFT JOIN q2 l ON l.s = p.dst
              WHERE p.src <> 'purchase'
              GROUP BY p.src, t.tot
            ),
            q4 AS (
              SELECT p.src AS s,
                     SUM(p.n_pair * (CASE WHEN p.dst = 'purchase'
                         THEN 1000000 ELSE COALESCE(l.q, 0) END))
                       // t.tot AS q
              FROM p JOIN t USING (src)
              LEFT JOIN q3 l ON l.s = p.dst
              WHERE p.src <> 'purchase'
              GROUP BY p.src, t.tot
            ),
            states AS (
              SELECT DISTINCT src AS s FROM p
              UNION SELECT DISTINCT dst FROM p
            )
            SELECT st.s AS event_type,
                   CAST(COALESCE(t.tot, 0) AS BIGINT) AS n_out,
                   CAST(CASE WHEN st.s = 'purchase' THEN 1000000
                        ELSE COALESCE(q4.q, 0) END AS BIGINT)
                     AS p4_micro
            FROM states st
            LEFT JOIN t ON t.src = st.s
            LEFT JOIN q4 ON q4.s = st.s
        """,
        # walk-forward Holt backtest: the holt recursive CTE extended
        # with LAG'd forecast errors vs the naive last-value baseline
        "events_forecast_eval": """
            WITH RECURSIVE d AS (
              SELECT event_type,
                     (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                       AS day,
                     CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS x
              FROM events GROUP BY 1, 2
            ),
            dr AS (
              SELECT event_type, day, x,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY day) AS rn
              FROM d
            ),
            r(event_type, rn, day, x, l, b) AS (
              SELECT event_type, rn, day, x, x, CAST(0 AS BIGINT)
              FROM dr WHERE rn = 1
              UNION ALL
              SELECT dr.event_type, dr.rn, dr.day, dr.x,
                     (dr.x + (r.l + r.b)) // 2,
                     (((dr.x + (r.l + r.b)) // 2) - r.l + r.b) // 2
              FROM r JOIN dr ON dr.event_type = r.event_type
                            AND dr.rn = r.rn + 1
            ),
            e AS (
              SELECT event_type, rn, x,
                     LAG(l + b) OVER w AS f_prev,
                     LAG(x) OVER w AS x_prev
              FROM r WINDOW w AS (PARTITION BY event_type
                                  ORDER BY rn)
            ),
            s AS (
              SELECT event_type,
                     CAST(COUNT(*) AS BIGINT) AS n_eval,
                     CAST(SUM(ABS(x - f_prev)) AS HUGEINT)
                       AS sum_abs_err,
                     CAST(SUM(ABS(x - x_prev)) AS HUGEINT)
                       AS sum_abs_naive
              FROM e WHERE rn > 1 GROUP BY 1
            )
            SELECT event_type, n_eval,
                   CAST(sum_abs_err AS BIGINT) AS sum_abs_err,
                   CAST(sum_abs_naive AS BIGINT) AS sum_abs_naive,
                   CAST(sum_abs_err // n_eval AS BIGINT) AS mae_c,
                   CAST((1000000 * sum_abs_err) // sum_abs_naive
                        AS BIGINT) AS mase_micro
            FROM s WHERE sum_abs_naive > 0
        """,
        # OHLC candlestick rollup: open/close picked by the full
        # (us, event_id) ordering key via ROW_NUMBER both directions
        "events_ohlc": """
            WITH e AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(epoch_us(ts) AS BIGINT) AS us, event_id,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            w AS (
              SELECT *,
                     ROW_NUMBER() OVER (PARTITION BY event_type, day
                                        ORDER BY us, event_id) AS rf,
                     ROW_NUMBER() OVER (PARTITION BY event_type, day
                                        ORDER BY us DESC,
                                                 event_id DESC) AS rl
              FROM e
            )
            SELECT event_type, CAST(day AS BIGINT) AS day,
                   CAST(MAX(CASE WHEN rf = 1 THEN v END) AS BIGINT)
                     AS open_c,
                   CAST(MAX(v) AS BIGINT) AS high_c,
                   CAST(MIN(v) AS BIGINT) AS low_c,
                   CAST(MAX(CASE WHEN rl = 1 THEN v END) AS BIGINT)
                     AS close_c,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM w GROUP BY 1, 2
        """,
        # Fisher dispersion index of daily counts over the gap-filled
        # span: vmr = (1e6·(n·Σc² − S²)) // (n·S), zero days add 0
        "events_dispersion": """
            WITH e AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ),
            b AS (SELECT MAX(day) - MIN(day) + 1 AS n FROM e),
            d AS (
              SELECT event_type, day,
                     CAST(COUNT(*) AS HUGEINT) AS c
              FROM e GROUP BY 1, 2
            ),
            s AS (
              SELECT event_type, SUM(c) AS s, SUM(c * c) AS s2
              FROM d GROUP BY 1
            )
            SELECT event_type,
                   CAST((SELECT n FROM b) AS BIGINT) AS n_days,
                   CAST(s AS BIGINT) AS sum_c,
                   CAST(s2 AS BIGINT) AS sum_sq,
                   CAST((1000000 * ((SELECT n FROM b) * s2 - s * s))
                        // ((SELECT n FROM b) * s) AS BIGINT)
                     AS vmr_micro
            FROM s
        """,
        # Dunning G² keyness: per lang, top-10 of the 50 most
        # frequent terms; every x·ln x entropy term quantized via
        # the shared _xlx expression (x<=0 → 0)
        "docs_keyness_llr": rf"""
            WITH terms AS (
              SELECT lang,
                     UNNEST(regexp_split_to_array(lower(text), '\s+'))
                       AS term
              FROM documents
            ),
            lt AS (
              SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
              FROM terms WHERE term <> '' GROUP BY 1, 2
            ),
            pool AS (
              SELECT term, SUM(n) AS tn,
                     ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, term)
                       AS pr
              FROM lt GROUP BY term QUALIFY pr <= 50
            ),
            lgt AS (SELECT lang, SUM(n) AS lt_tot FROM lt GROUP BY 1),
            nn AS (SELECT SUM(n) AS n FROM lt),
            cells AS (
              SELECT g.lang, p.term,
                     COALESCE(x.n, 0) AS a,
                     p.tn - COALESCE(x.n, 0) AS b,
                     g.lt_tot - COALESCE(x.n, 0) AS c,
                     (SELECT n FROM nn) - g.lt_tot
                       - (p.tn - COALESCE(x.n, 0)) AS d,
                     (SELECT n FROM nn) AS nt
              FROM lgt g CROSS JOIN pool p
              LEFT JOIN lt x ON x.lang = g.lang AND x.term = p.term
            ),
            g2 AS (
              SELECT lang, term, a, b,
                     2 * ({_xlx("a")} + {_xlx("b")} + {_xlx("c")}
                          + {_xlx("d")} + {_xlx("nt")}
                          - {_xlx("a + b")} - {_xlx("c + d")}
                          - {_xlx("a + c")} - {_xlx("b + d")})
                       AS g2_micro
              FROM cells
            ),
            ranked AS (
              SELECT lang, term, a, b, g2_micro,
                     ROW_NUMBER() OVER (PARTITION BY lang
                                        ORDER BY g2_micro DESC,
                                                 term ASC) AS rank
              FROM g2
            )
            SELECT lang, CAST(rank AS BIGINT) AS rank, term,
                   CAST(a AS BIGINT) AS n_in,
                   CAST(b AS BIGINT) AS n_out, g2_micro
            FROM ranked WHERE rank <= 10
        """,
        # Zipf rank-frequency OLS over the top-200 terms; both logs
        # quantized floor(ln·1e6) before the integer closed form
        "docs_zipf_slope": r"""
            WITH terms AS (
              SELECT UNNEST(regexp_split_to_array(lower(text), '\s+'))
                       AS term
              FROM documents
            ),
            cnt AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS n
              FROM terms WHERE term <> '' GROUP BY term
            ),
            top AS (
              SELECT term, n,
                     ROW_NUMBER() OVER (ORDER BY n DESC, term ASC)
                       AS r
              FROM cnt QUALIFY r <= 200
            ),
            q AS (
              SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000)
                          AS HUGEINT) AS x,
                     CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000)
                          AS HUGEINT) AS y
              FROM top
            ),
            s AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS k,
                     SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * x) AS sxx, SUM(x * y) AS sxy
              FROM q
            ),
            f AS (
              SELECT k, k * sxy - sx * sy AS num_s,
                     sy * sxx - sx * sxy AS num_i,
                     k * sxx - sx * sx AS den
              FROM s
            )
            SELECT CAST(k AS BIGINT) AS k,
                   (SELECT CAST(SUM(n) AS BIGINT) FROM top) AS n,
                   CAST((CASE WHEN num_s >= 0 THEN 1 ELSE -1 END)
                        * ((abs(num_s) * 1000000) // den)
                        AS BIGINT) AS slope_micro,
                   CAST((CASE WHEN num_i >= 0 THEN 1 ELSE -1 END)
                        * (abs(num_i) // den)
                        AS BIGINT) AS intercept_micro
            FROM f WHERE k >= 2  -- engine returns empty below 2 terms
        """,
        # Simpson's diversity of the lang mix per source, exact
        # without-replacement pair probability
        "docs_simpson_diversity": """
            WITH c AS (
              SELECT source, lang, CAST(COUNT(*) AS HUGEINT) AS n
              FROM documents GROUP BY 1, 2
            ),
            s AS (
              SELECT source, SUM(n) AS nn,
                     SUM(n * (n - 1)) AS same
              FROM c GROUP BY 1
            )
            SELECT source, CAST(nn AS BIGINT) AS n_docs,
                   CAST(CASE WHEN nn <= 1 THEN 0
                        ELSE (1000000 * (nn * (nn - 1) - same))
                             // (nn * (nn - 1)) END AS BIGINT)
                     AS d_micro
            FROM s
        """,
        # Mann-Whitney U with exact tie handling: doubled average rank
        # R2 = 2·cum − c + 1 keeps every statistic integer
        "events_mannwhitney": """
            WITH c AS (
              SELECT event_type AS t,
                     CAST(round(value * 100) AS BIGINT) AS v,
                     CAST(count(*) AS HUGEINT) AS n
              FROM events GROUP BY 1, 2
            ),
            ty AS (SELECT DISTINCT t FROM c),
            pairs AS (
              SELECT a.t AS ta, b.t AS tb
              FROM ty a JOIN ty b ON b.t > a.t
            ),
            grid AS (
              SELECT DISTINCT p.ta, p.tb, c.v
              FROM pairs p JOIN c ON c.t = p.ta OR c.t = p.tb
            ),
            s AS (
              SELECT g.ta, g.tb, g.v,
                     COALESCE(ca.n, 0) AS nav,
                     COALESCE(cb.n, 0) AS nbv,
                     SUM(COALESCE(ca.n, 0) + COALESCE(cb.n, 0))
                       OVER w AS cumt
              FROM grid g
              LEFT JOIN c ca ON ca.t = g.ta AND ca.v = g.v
              LEFT JOIN c cb ON cb.t = g.tb AND cb.v = g.v
              WINDOW w AS (PARTITION BY g.ta, g.tb ORDER BY g.v)
            ),
            r AS (
              SELECT ta, tb,
                     SUM(nav * (2 * cumt - (nav + nbv) + 1)) AS s2a
              FROM s GROUP BY 1, 2
            ),
            tot AS (SELECT t, SUM(n) AS nt FROM c GROUP BY 1)
            SELECT r.ta AS type_a, r.tb AS type_b,
                   CAST(na.nt AS BIGINT) AS n_a,
                   CAST(nb.nt AS BIGINT) AS n_b,
                   CAST(r.s2a - na.nt * (na.nt + 1) AS BIGINT) AS u2_a,
                   CAST(2 * na.nt * nb.nt
                        - (r.s2a - na.nt * (na.nt + 1))
                        AS BIGINT) AS u2_b
            FROM r
            JOIN tot na ON na.t = r.ta
            JOIN tot nb ON nb.t = r.tb
        """,
        # Kaplan-Meier time-to-first-purchase, right-censored at a
        # 3-day horizon: per-step integer floor has no prefix form,
        # so the oracle replays the recursion
        "events_km_survival": """
            WITH RECURSIVE d AS (
              SELECT user_id,
                     MIN(epoch_us(ts) // 86400000000) AS f,
                     MIN(CASE WHEN event_type = 'purchase'
                         THEN epoch_us(ts) // 86400000000 END) AS p
              FROM events GROUP BY 1
            ),
            u AS (
              SELECT LEAST(COALESCE(p - f, 4611686018427387904), 3)
                       AS t,
                     CASE WHEN p - f <= 3 THEN 1 ELSE 0 END AS ev
              FROM d
            ),
            ev_times AS (
              SELECT t, CAST(COUNT(*) AS HUGEINT) AS d_events,
                     ROW_NUMBER() OVER (ORDER BY t) AS k
              FROM u WHERE ev = 1 GROUP BY t
            ),
            risk AS (
              SELECT e.t, e.k, e.d_events,
                     (SELECT CAST(COUNT(*) AS HUGEINT) FROM u
                      WHERE u.t >= e.t) AS n_risk
              FROM ev_times e
            ),
            km AS (
              SELECT CAST(0 AS BIGINT) AS k,
                     CAST(1000000 AS HUGEINT) AS s
              UNION ALL
              SELECT r.k,
                     km.s * (r.n_risk - r.d_events) // r.n_risk
              FROM km JOIN risk r ON r.k = km.k + 1
            )
            SELECT CAST(r.t AS BIGINT) AS t_days,
                   CAST(r.n_risk AS BIGINT) AS n_risk,
                   CAST(r.d_events AS BIGINT) AS d_events,
                   CAST(km.s AS BIGINT) AS s_micro
            FROM risk r JOIN km ON km.k = r.k
        """,
        # 3-level unnormalized integer Haar over the gap-filled daily
        # grid, zero-padded to a multiple of 8 (lossless, no division;
        # generate_series takes no subquery bound, so a constant
        # 131072-day ceiling is filtered down to the padded span)
        "events_haar": """
            WITH daily AS (
              SELECT epoch_us(ts) // 86400000000 AS day,
                     SUM(CAST(round(value * 100) AS BIGINT)) AS t
              FROM events GROUP BY 1
            ),
            b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
            n AS (
              SELECT ((hi - lo + 1 + 7) // 8) * 8 AS padded FROM b
            ),
            grid AS (
              SELECT gs.i AS i, COALESCE(d.t, 0) AS x
              FROM generate_series(0, 131071) gs(i)
              CROSS JOIN n
              LEFT JOIN daily d
                ON d.day = (SELECT lo FROM b) + gs.i
              WHERE gs.i < n.padded
            ),
            l1 AS (
              SELECT i // 2 AS i, SUM(x) AS a,
                     SUM(CASE WHEN i % 2 = 0 THEN x ELSE -x END) AS d
              FROM grid GROUP BY 1
            ),
            l2 AS (
              SELECT i // 2 AS i, SUM(a) AS a,
                     SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END) AS d
              FROM l1 GROUP BY 1
            ),
            l3 AS (
              SELECT i // 2 AS i, SUM(a) AS a,
                     SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END) AS d
              FROM l2 GROUP BY 1
            )
            SELECT CAST(1 AS BIGINT) AS lvl, CAST(i AS BIGINT) AS i,
                   CAST(a AS BIGINT) AS approx_c,
                   CAST(d AS BIGINT) AS detail_c
            FROM l1
            UNION ALL
            SELECT 2, CAST(i AS BIGINT), CAST(a AS BIGINT),
                   CAST(d AS BIGINT) FROM l2
            UNION ALL
            SELECT 3, CAST(i AS BIGINT), CAST(a AS BIGINT),
                   CAST(d AS BIGINT) FROM l3
        """,
        # Kendall tau-b (signed squared, micro) between daily count
        # and daily cent sum over the gap-filled grid
        "events_kendall_tau": """
            WITH e AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            c AS (
              SELECT event_type, day,
                     CAST(count(*) AS BIGINT) AS x,
                     CAST(SUM(v) AS BIGINT) AS y
              FROM e GROUP BY event_type, day
            ),
            bnd AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
            days AS (
              SELECT UNNEST(generate_series(lo, hi)) AS day FROM bnd
            ),
            types AS (SELECT DISTINCT event_type FROM e),
            z AS (
              SELECT t.event_type, d.day,
                     CAST(COALESCE(c.x, 0) AS HUGEINT) AS x,
                     CAST(COALESCE(c.y, 0) AS HUGEINT) AS y
              FROM types t
              CROSS JOIN days d
              LEFT JOIN c ON c.event_type = t.event_type
                         AND c.day = d.day
            ),
            p AS (
              SELECT a.event_type,
                     SUM(CASE WHEN (a.x-b.x)*(a.y-b.y) > 0
                         THEN 1 ELSE 0 END) AS conc,
                     SUM(CASE WHEN (a.x-b.x)*(a.y-b.y) < 0
                         THEN 1 ELSE 0 END) AS disc,
                     SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS tx,
                     SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS ty,
                     CAST(count(*) AS HUGEINT) AS n0
              FROM z a JOIN z b ON b.event_type = a.event_type
                               AND b.day > a.day
              GROUP BY 1
            ),
            nd AS (SELECT count(*) AS n_days FROM days)
            SELECT p.event_type,
                   CAST(nd.n_days AS BIGINT) AS n_days,
                   CAST(conc AS BIGINT) AS concordant,
                   CAST(disc AS BIGINT) AS discordant,
                   CAST(CASE WHEN (n0-tx)*(n0-ty) = 0 THEN 0
                        ELSE (CASE WHEN conc >= disc THEN 1 ELSE -1 END)
                             * ((CAST(conc-disc AS HUGEINT)*(conc-disc)
                                 * 1000000) // ((n0-tx)*(n0-ty)))
                        END AS BIGINT) AS tau2_micro
            FROM p CROSS JOIN nd
        """,
        # offline single changepoint: binary segmentation's first
        # split, argmax of the exact between-segment SSE gain
        "events_changepoint": """
            WITH e AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            c AS (
              SELECT event_type, day, CAST(SUM(v) AS BIGINT) AS s
              FROM e GROUP BY event_type, day
            ),
            b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
            days AS (
              SELECT UNNEST(generate_series(lo, hi)) AS day FROM b
            ),
            types AS (SELECT DISTINCT event_type FROM e),
            z AS (
              SELECT t.event_type, d.day,
                     CAST(COALESCE(c.s, 0) AS HUGEINT) AS x
              FROM types t
              CROSS JOIN days d
              LEFT JOIN c ON c.event_type = t.event_type
                         AND c.day = d.day
            ),
            p AS (
              SELECT event_type, day,
                     SUM(x) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS pre,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY day) AS t,
                     CAST(COUNT(*) OVER (PARTITION BY event_type)
                          AS HUGEINT) AS n,
                     SUM(x) OVER (PARTITION BY event_type) AS tot
              FROM z
            ),
            g AS (
              SELECT event_type, day, t, n, pre, tot,
                     (1000000 * (n*pre - t*tot) * (n*pre - t*tot))
                       // (t * (n - t) * n) AS gain
              FROM p WHERE t < n
            ),
            r AS (
              SELECT event_type, day, gain, pre, t, n, tot,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY gain DESC, t) AS rn
              FROM g
            )
            SELECT event_type, CAST(day AS BIGINT) AS split_day,
                   CAST(gain AS BIGINT) AS gain_micro,
                   CAST(pre // t AS BIGINT) AS mean_left_c,
                   CAST((tot - pre) // (n - t) AS BIGINT) AS mean_right_c
            FROM r WHERE rn = 1
        """,
        "events_cusum": """
            WITH e AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            c AS (
              SELECT event_type, day, CAST(SUM(v) AS BIGINT) AS s
              FROM e GROUP BY event_type, day
            ),
            b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
            days AS (
              SELECT UNNEST(generate_series(lo, hi)) AS day FROM b
            ),
            types AS (SELECT DISTINCT event_type FROM e),
            z AS (
              SELECT t.event_type, d.day,
                     CAST(COALESCE(c.s, 0) AS HUGEINT) AS x
              FROM types t
              CROSS JOIN days d
              LEFT JOIN c ON c.event_type = t.event_type
                         AND c.day = d.day
            ),
            k AS (
              SELECT event_type,
                     SUM(x) // CAST(COUNT(*) AS HUGEINT) AS kref
              FROM z GROUP BY event_type
            ),
            p AS (
              SELECT z.event_type, z.day,
                     SUM(z.x - k.kref) OVER (
                       PARTITION BY z.event_type ORDER BY z.day
                       ROWS UNBOUNDED PRECEDING) AS pre
              FROM z JOIN k USING (event_type)
            )
            SELECT event_type, CAST(day AS BIGINT) AS day,
                   CAST(pre - LEAST(CAST(0 AS HUGEINT),
                                    MIN(pre) OVER (
                                      PARTITION BY event_type
                                      ORDER BY day
                                      ROWS UNBOUNDED PRECEDING))
                        AS BIGINT) AS cusum
            FROM p
        """,
        # first-order Markov transition matrix over per-user event
        # streams; probabilities in integer micro-units (HUGEINT)
        "events_markov": """
            WITH s AS (
              SELECT event_type AS src,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS dst
              FROM events
            ),
            p AS (
              SELECT src, dst, CAST(count(*) AS BIGINT) AS n_pair
              FROM s WHERE dst IS NOT NULL GROUP BY src, dst
            ),
            t AS (SELECT src, SUM(n_pair) AS tot FROM p GROUP BY src)
            SELECT p.src, p.dst, p.n_pair,
                   CAST((CAST(1000000 AS HUGEINT) * p.n_pair) // t.tot
                        AS BIGINT) AS prob_micro
            FROM p JOIN t USING (src)
        """,
        # TPC-H-Q22-shaped: above-average-balance customers with no
        # orders, per nation; threshold exact (bal·n > sum, no division)
        "q22_global_sales_opportunity": """
            WITH a AS (
              SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_c,
                     COUNT(*) AS n
              FROM customer
              WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0
            ),
            q AS (
              SELECT c_custkey, c_nationkey,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
              FROM customer, a
              WHERE CAST(round(c_acctbal * 100) AS BIGINT) * a.n > a.sum_c
                AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01'
                )
            )
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   CAST(count(*) AS BIGINT) AS numcust,
                   CAST(SUM(bal_c) AS BIGINT) AS totacctbal_cents
            FROM q GROUP BY c_nationkey
        """,
        # ROLLUP(l_returnflag, l_linestatus): finest grain + per-flag
        # subtotals + grand total; NULL group values carried as ''
        "lineitem_rollup": """
            SELECT CAST(GROUPING(l_returnflag)
                        + GROUPING(l_linestatus) AS BIGINT) AS lvl,
                   COALESCE(l_returnflag, '') AS l_returnflag,
                   COALESCE(l_linestatus, '') AS l_linestatus,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                     AS sum_qty,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        # UNPIVOT: the pivot melted back — must equal the direct GROUP BY
        "orders_priority_unpivot": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            GROUP BY 1, 2
        """,
        # ordered string aggregation: per-customer priority sequence
        "customer_order_paths": """
            SELECT o_custkey AS c_custkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   string_agg(o_orderpriority, '>'
                              ORDER BY o_orderdate, o_orderkey) AS path
            FROM orders
            GROUP BY o_custkey
        """,
        # semi-structured: JSON props field extracted and binned
        "events_props_hist": """
            SELECT event_type,
                   CAST(CAST(json_extract(props, '$.k') AS BIGINT) // 10
                        AS BIGINT) AS k_bin,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY 1, 2
        """,
        # LAG window: time since the user's previous event (first
        # event per user omitted — no predecessor)
        "events_interarrival": """
            WITH e AS (
              SELECT user_id, event_id,
                     epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS gap_us
              FROM events
            )
            SELECT user_id, event_id, CAST(gap_us AS BIGINT) AS gap_us
            FROM e WHERE gap_us IS NOT NULL
        """,
        # bloom-prefiltered join: top-20 customers by returned-item
        # revenue (10^-4 dollars) for one quarter's orders
        "q10_returned_revenue": """
            WITH o AS (
              SELECT o_orderkey, o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1997-04-01'
            ),
            li AS (
              SELECT l_orderkey,
                     SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS rev
              FROM lineitem WHERE l_returnflag = 'R'
              GROUP BY l_orderkey
            ),
            c AS (
              SELECT o.o_custkey AS ck, SUM(li.rev) AS revenue
              FROM li JOIN o ON o.o_orderkey = li.l_orderkey
              GROUP BY o.o_custkey
            ),
            r AS (
              SELECT ck, revenue,
                     ROW_NUMBER() OVER (ORDER BY revenue DESC, ck) AS rnk
              FROM c
            )
            SELECT r.ck AS c_custkey, cu.c_name,
                   CAST(r.revenue AS BIGINT) AS revenue
            FROM r JOIN customer cu ON cu.c_custkey = r.ck
            WHERE rnk <= 20
        """,
        # bounded-frame window: per-user 3-row moving average in
        # integer milli-cents (TRUNCATING // on both engines)
        "events_moving_avg": """
            WITH w AS (
              SELECT user_id, event_id,
                     SUM(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                     ) AS s,
                     COUNT(*) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                     ) AS c
              FROM events
            )
            SELECT user_id, event_id,
                   CAST((s * 1000) // c AS BIGINT) AS mov_avg_milli
            FROM w
        """,
        # densification: daily counts per type with explicit zero
        # rows for every silent day in the corpus span
        "events_daily_gapfill": """
            WITH e AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            c AS (
              SELECT event_type, day,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(SUM(v) AS BIGINT) AS s
              FROM e GROUP BY event_type, day
            ),
            b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
            days AS (
              SELECT UNNEST(generate_series(lo, hi)) AS day FROM b
            ),
            types AS (SELECT DISTINCT event_type FROM e)
            SELECT t.event_type, CAST(d.day AS BIGINT) AS day,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events,
                   CAST(COALESCE(c.s, 0) AS BIGINT) AS sum_value_cents
            FROM types t
            CROSS JOIN days d
            LEFT JOIN c ON c.event_type = t.event_type AND c.day = d.day
        """,
        # TPC-H-Q4-shaped semi-join: orders of one quarter with a
        # lineitem shipped after the order date (EXISTS ⇔ max > odate)
        "q4_order_priority": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-04-01'
              AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate
              )
            GROUP BY o_orderpriority
        """,
        # TPC-H-Q14-shaped: PROMO-type share of one month's shipped
        # revenue, HUGEINT micro share
        "q14_promo_revenue": """
            WITH l AS (
              SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS rev,
                     CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END
                       AS is_promo
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE l_shipdate >= TIMESTAMP '1997-06-01'
                AND l_shipdate < TIMESTAMP '1997-07-01'
            )
            SELECT CAST(COALESCE(SUM(CASE WHEN is_promo = 1 THEN rev
                                     ELSE 0 END), 0) AS BIGINT)
                     AS promo_rev,
                   CAST(COALESCE(SUM(rev), 0) AS BIGINT) AS total_rev,
                   CAST(CASE WHEN COALESCE(SUM(rev), 0) = 0 THEN 0
                        ELSE (CAST(1000000 AS HUGEINT)
                              * SUM(CASE WHEN is_promo = 1 THEN rev
                                    ELSE 0 END)) // SUM(rev)
                        END AS BIGINT) AS promo_micro
            FROM l
        """,
        # CUBE(event_type, weekday): all four grouping levels; lvl is
        # the GROUPING bitmask, rolled-up keys carried as ''/-1
        "events_cube": """
            WITH e AS (
              SELECT event_type,
                     CAST(isodow(ts) - 1 AS BIGINT) AS weekday,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            )
            SELECT CAST(GROUPING(event_type) * 2
                        + GROUPING(weekday) AS BIGINT) AS lvl,
                   COALESCE(event_type, '') AS event_type,
                   CAST(COALESCE(weekday, -1) AS BIGINT) AS weekday,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(SUM(v) AS BIGINT) AS sum_value_cents
            FROM e GROUP BY CUBE(event_type, weekday)
        """,
        # pivot/crosstab: order counts by year × priority, one column
        # per priority (conditional aggregation mirror)
        "orders_priority_pivot": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
                   CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
                   CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
                   CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_not_specified,
                   CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
                   CAST(count(*) AS BIGINT) AS total
            FROM orders GROUP BY 1
        """,
        # deterministic hash-based train/test split (leakage-safe:
        # membership is a pure function of doc_id)
        "docs_train_test_split": """
            SELECT doc_id,
                   CASE WHEN CAST(
                     '0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) % 100 < 80
                   THEN 'train' ELSE 'test' END AS split
            FROM documents
        """,
        # per-user running value total in time order (partitioned
        # prefix sum; cumulative window-function shape)
        "events_running_total": """
            SELECT user_id, event_id,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS run_total_cents
            FROM events
        """,
        # BPE training, first iteration: adjacent char pairs within
        # [a-z0-9_]+ words of the lowercased corpus, top-20 by count
        "docs_bpe_pairs": """
            WITH words AS (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
              FROM documents
            ),
            pairs AS (
              SELECT substr(w, CAST(i AS INT), 2) AS pair
              FROM words, LATERAL unnest(generate_series(1, len(w) - 1)) AS t(i)
              WHERE len(w) >= 2
            ),
            c AS (
              SELECT pair, CAST(count(*) AS BIGINT) AS n
              FROM pairs GROUP BY pair
            ),
            r AS (
              SELECT pair, n,
                     ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk
              FROM c
            )
            SELECT CAST(rnk AS BIGINT) AS rnk, pair, n
            FROM r WHERE rnk <= 20
        """,
        # set ops between the quality-gated set and the exact-dedup
        # survivor set: intersection and both differences
        "quality_dedup_overlap": f"""
            WITH q AS (
              SELECT doc_id FROM documents
              WHERE len(regexp_extract_all(text, '{_TOKEN_RE}')) >= 20
                AND len(regexp_extract_all(lower(text), '{_STOP_RE}')) >= 1
            ),
            d AS (
              SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
              FROM documents GROUP BY md5(text)
            )
            SELECT
              CAST((SELECT count(*) FROM q) AS BIGINT) AS n_quality,
              CAST((SELECT count(*) FROM d) AS BIGINT) AS n_dedup_survivors,
              CAST((SELECT count(*) FROM q JOIN d USING (doc_id)) AS BIGINT)
                AS n_both,
              CAST((SELECT count(*) FROM q WHERE doc_id NOT IN (SELECT doc_id FROM d))
                AS BIGINT) AS n_quality_only,
              CAST((SELECT count(*) FROM d WHERE doc_id NOT IN (SELECT doc_id FROM q))
                AS BIGINT) AS n_dedup_only
        """,
        "docs_top_terms": r"""
            WITH terms AS (
              SELECT doc_id,
                     UNNEST(regexp_split_to_array(lower(text), '\s+')) AS term
              FROM documents
            ),
            df AS (
              SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM terms WHERE term <> '' GROUP BY term
            ),
            ranked AS (
              SELECT row_number() OVER (ORDER BY n_docs DESC, term ASC)
                       AS rank, term, n_docs
              FROM df
            )
            SELECT CAST(rank AS BIGINT) AS rank, term, n_docs
            FROM ranked WHERE rank <= 50
        """,
        # Heaps-law vocabulary growth: decile of a term's first
        # occurrence (dense doc_ids; identical formula both engines)
        "docs_vocab_growth": r"""
            WITH nn AS (SELECT COUNT(*) AS n FROM documents),
            terms AS (
              SELECT doc_id,
                     UNNEST(regexp_split_to_array(lower(text), '\s+'))
                       AS term
              FROM documents
            ),
            firsts AS (
              SELECT term, MIN(doc_id) AS fd
              FROM terms WHERE term <> '' GROUP BY term
            ),
            dec AS (
              SELECT (fd * 10) // (SELECT n FROM nn) AS decile,
                     CAST(COUNT(*) AS BIGINT) AS new_terms
              FROM firsts GROUP BY 1
            )
            SELECT CAST(g.d AS BIGINT) AS decile,
                   COALESCE(dec.new_terms, 0) AS new_terms,
                   CAST(SUM(COALESCE(dec.new_terms, 0))
                          OVER (ORDER BY g.d) AS BIGINT) AS vocab_cum
            FROM generate_series(0, 9) g(d)
            LEFT JOIN dec ON dec.decile = g.d
        """,
        # PII redaction: the injection expression below derives the
        # SAME deterministic PII-bearing input as the Ray kernel (the
        # synthetic corpus has no PII), so the regexes / application
        # order / counts are what the hash compares.
        "docs_redact_pii": r"""
            WITH pii AS (
              SELECT doc_id,
                     text || ' Contact u' || CAST(doc_id AS VARCHAR)
                          || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                          || '.com or +1-'
                          || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.' || CAST(doc_id * 7 % 256 AS VARCHAR)
                          || '.' || CAST(doc_id * 13 % 256 AS VARCHAR)
                          || ' now.' AS t
              FROM documents
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   regexp_replace(regexp_replace(regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '[EMAIL]', 'g'),
                     '\+\d{1,2}-\d{3}-\d{4}', '[PHONE]', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')
                     AS clean_text,
                   CAST(len(regexp_extract_all(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                     AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(t,
                     '\+\d{1,2}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
                   CAST(len(regexp_extract_all(t,
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                     AS BIGINT) AS n_ips
            FROM pii
        """,
        # deterministic seeded global shuffle: position under
        # ORDER BY md5(seed || ':' || doc_id) — seed 42 mirrored from
        # textops.SHUFFLE_SEED.
        "docs_global_shuffle": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   md5('42:' || CAST(doc_id AS VARCHAR)) AS key,
                   CAST(row_number() OVER (
                     ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id)
                     AS BIGINT) AS pos
            FROM documents
        """,
        # TF-IDF: idf quantized to integer micro-nats per term BEFORE
        # the tf multiply (the docs_lm_score trick) so ranking is an
        # exact-int comparison in both engines.
        "docs_tfidf_topk": r"""
            WITH tok AS (
              SELECT doc_id,
                     UNNEST(regexp_split_to_array(lower(text), '\s+')) AS term
              FROM documents
            ),
            tf AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM tok WHERE term <> '' GROUP BY doc_id, term
            ),
            dfx AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY term
            ),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
                     tf.tf * CAST(floor(ln(
                       (SELECT CAST(count(*) AS DOUBLE) FROM documents)
                       / CAST(dfx.df AS DOUBLE)) * 1000000) AS BIGINT)
                       AS tfidf_micro
              FROM tf JOIN dfx USING (term)
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY tfidf_micro DESC, term ASC) AS rank
              FROM scored
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(rank AS BIGINT) AS rank, term, tf, df,
                   CAST(tfidf_micro AS BIGINT) AS tfidf_micro
            FROM ranked WHERE rank <= 3
        """,
        "docs_curriculum_order": """
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(NTILE(4) OVER (ORDER BY n_chars, doc_id)
                        AS BIGINT) AS stage,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id)
                        AS BIGINT) AS position
            FROM documents
        """,
        "docs_by_lang": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(min(doc_id) AS BIGINT) AS min_doc_id
            FROM documents GROUP BY lang
        """,
        "top_customers": """
            WITH agg AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                     CAST(count(*) AS BIGINT) AS n_orders
              FROM orders GROUP BY o_custkey)
            SELECT CAST(a.o_custkey AS BIGINT) AS c_custkey, c.c_name, a.total_cents, a.n_orders
            FROM agg a JOIN customer c ON c.c_custkey = a.o_custkey
            ORDER BY a.total_cents DESC, c_custkey ASC LIMIT 10
        """,
        # The flagship: the WHOLE crawl engine (frontier waves, sharded
        # dedup, depth gates, span assembly) checked against a DuckDB
        # recursive-CTE BFS closure of the same deterministic link graph.
        "crawl_mirror": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            pages AS (
              SELECT hn.hn || '//p' || r.j || '.html' AS doc_id, hn.hn AS host,
                     CAST(200 AS INT) AS status, TRUE AS is_html,
                     CAST(5 AS INT) AS n_outlinks, CAST(11 AS INT) AS n_spans
              FROM reach r JOIN hostname hn ON hn.h = r.h
            ),
            assets AS (
              SELECT DISTINCT
                     hn.hn || '//img' || ((13*r.j+7) % ho.n_assets) || '.jpg' AS doc_id,
                     hn.hn AS host, CAST(200 AS INT) AS status, FALSE AS is_html,
                     CAST(0 AS INT) AS n_outlinks, CAST(1 AS INT) AS n_spans
              FROM reach r JOIN hostname hn ON hn.h = r.h JOIN hosts ho ON ho.h = r.h
            )
            SELECT * FROM pages UNION ALL SELECT * FROM assets
        """,
        # span-sequence invariant (kind, media_ref, order) per doc_id:
        # regenerate the rewritten link targets of every crawled page
        # in document order — img first (src), then the 4 hrefs in
        # links_of() order; assets carry one media span of themselves
        "crawl_spans": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            page_spans AS (
              SELECT hn.hn || '//p' || r.j || '.html' AS doc_id,
                     CAST(x.ord AS BIGINT) AS ord,
                     CASE WHEN x.ord = 0 THEN 'media' ELSE 'link' END AS kind,
                     CASE WHEN x.ord = 0
                          THEN 'img' || ((13*r.j+7) % ho.n_assets) || '.jpg'
                          ELSE 'p' || x.t || '.html' END AS media_ref
              FROM reach r
              JOIN hostname hn ON hn.h = r.h
              JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                (0, 0), (1, (2*r.j+1) % ho.m), (2, (2*r.j+2) % ho.m),
                (3, (5*r.j+3) % ho.m), (4, (5*r.j+10) % ho.m)) AS x(ord, t)
            ),
            asset_spans AS (
              SELECT DISTINCT
                     hn.hn || '//img' || ((13*r.j+7) % ho.n_assets) || '.jpg'
                       AS doc_id,
                     CAST(0 AS BIGINT) AS ord, 'media' AS kind,
                     hn.hn || '//img' || ((13*r.j+7) % ho.n_assets) || '.jpg'
                       AS media_ref
              FROM reach r
              JOIN hostname hn ON hn.h = r.h
              JOIN hosts ho ON ho.h = r.h
            )
            SELECT * FROM page_spans UNION ALL SELECT * FROM asset_spans
        """,
        # per-host triangle counts of the same closure's undirected
        # link graph: compact-forward as a 3-way self-join (every
        # triangle u<v<w once, via its smallest vertex)
        "crawl_triangles": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            edges AS (
              SELECT DISTINCT r.h,
                     LEAST(r.j, x.t) AS a, GREATEST(r.j, x.t) AS b
              FROM reach r
              JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            tri AS (
              SELECT e1.h, CAST(count(*) AS BIGINT) AS n_triangles
              FROM edges e1
              JOIN edges e2 ON e2.h = e1.h AND e2.a = e1.a
                           AND e2.b > e1.b
              JOIN edges e3 ON e3.h = e1.h AND e3.a = e1.b
                           AND e3.b = e2.b
              GROUP BY e1.h
            )
            SELECT hn.hn AS host, t.n_triangles
            FROM tri t JOIN hostname hn ON hn.h = t.h
        """,
        # directed triad motifs: feed-forward (a→b,b→c,a→c) counted
        # once per middle vertex; 3-cycles seen once per rotation,
        # so the raw match count divides by 3. Self-loops are absent,
        # so the a≠c guard is implied by the closing edge's existence.
        "crawl_motifs": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            dedges AS (
              SELECT DISTINCT r.h, r.j AS s, x.t AS t
              FROM reach r
              JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
              WHERE r.j <> x.t
            ),
            ffl AS (
              SELECT e1.h, CAST(count(*) AS BIGINT) AS n
              FROM dedges e1
              JOIN dedges e2 ON e2.h = e1.h AND e2.s = e1.t
                            AND e2.t <> e1.s
              JOIN dedges e3 ON e3.h = e1.h AND e3.s = e1.s
                            AND e3.t = e2.t
              GROUP BY e1.h
            ),
            cyc AS (
              SELECT e1.h, CAST(count(*) // 3 AS BIGINT) AS n
              FROM dedges e1
              JOIN dedges e2 ON e2.h = e1.h AND e2.s = e1.t
                            AND e2.t <> e1.s
              JOIN dedges e3 ON e3.h = e1.h AND e3.s = e2.t
                            AND e3.t = e1.s
              GROUP BY e1.h
            )
            SELECT hn.hn AS host,
                   COALESCE(f.n, 0) AS ffl,
                   COALESCE(c.n, 0) AS cycles
            FROM ffl f
            FULL OUTER JOIN cyc c ON c.h = f.h
            JOIN hostname hn ON hn.h = COALESCE(f.h, c.h)
        """,
        # directed-edge reciprocity per host: share of edges whose
        # reverse exists
        "crawl_reciprocity": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            dedges AS (
              SELECT DISTINCT r.h, r.j AS s, x.t AS t
              FROM reach r
              JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
              WHERE r.j <> x.t
            ),
            m AS (
              SELECT d.h, CAST(COUNT(*) AS BIGINT) AS n_edges,
                     CAST(SUM(CASE WHEN EXISTS (
                       SELECT 1 FROM dedges r
                       WHERE r.h = d.h AND r.s = d.t AND r.t = d.s)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_mutual
              FROM dedges d GROUP BY d.h
            )
            SELECT hn.hn AS host, m.n_edges, m.n_mutual,
                   CAST((1000000 * m.n_mutual) // m.n_edges
                        AS BIGINT) AS recip_micro
            FROM m JOIN hostname hn ON hn.h = m.h
        """,
        # per-page local clustering coefficient over the undirected
        # link graph: lcc = floor(1e6 * 2*tri(v) / (deg*(deg-1)))
        "crawl_clustering_coeff": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            edges AS (
              SELECT DISTINCT r.h,
                     LEAST(r.j, x.t) AS a, GREATEST(r.j, x.t) AS b
              FROM reach r
              JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            und AS (
              SELECT h, a AS v, b AS w FROM edges
              UNION ALL
              SELECT h, b AS v, a AS w FROM edges
            ),
            deg AS (
              SELECT h, v, CAST(count(*) AS BIGINT) AS deg
              FROM und GROUP BY 1, 2
            ),
            tri AS (
              SELECT u1.h, u1.v, CAST(count(*) AS BIGINT) AS tri
              FROM und u1
              JOIN und u2 ON u2.h = u1.h AND u2.v = u1.v
                         AND u2.w > u1.w
              JOIN edges e ON e.h = u1.h AND e.a = u1.w AND e.b = u2.w
              GROUP BY 1, 2
            )
            SELECT hn.hn AS host, CAST(d.v AS BIGINT) AS page, d.deg,
                   COALESCE(t.tri, 0) AS tri,
                   CAST((2000000 * COALESCE(t.tri, 0))
                        // (d.deg * (d.deg - 1)) AS BIGINT) AS lcc_micro
            FROM deg d
            LEFT JOIN tri t ON t.h = d.h AND t.v = d.v
            JOIN hostname hn ON hn.h = d.h
            WHERE d.deg >= 2
        """,
        # co-citation similarity of the same link graph: pairs of
        # pages cited together by >= 2 common sources (directed
        # simple-graph semantics, self-loops dropped)
        "crawl_cocitation": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            edges AS (
              SELECT DISTINCT r.h, r.j AS s, x.t AS t
              FROM reach r
              JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            coc AS (
              SELECT e1.h, e1.t AS a, e2.t AS b,
                     CAST(count(*) AS BIGINT) AS n_common
              FROM edges e1
              JOIN edges e2 ON e2.h = e1.h AND e2.s = e1.s
                           AND e2.t > e1.t
              GROUP BY 1, 2, 3
              HAVING count(*) >= 2
            )
            SELECT hn.hn AS host, CAST(c.a AS BIGINT) AS a,
                   CAST(c.b AS BIGINT) AS b, c.n_common
            FROM coc c JOIN hostname hn ON hn.h = c.h
        """,
        # out-link-set Jaccard >= 1/3 source pairs, all-integer gate
        "crawl_link_jaccard": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            edges AS (
              SELECT DISTINCT r.h, r.j AS s, x.t AS t
              FROM reach r
              JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            deg AS (
              SELECT h, s, CAST(count(*) AS BIGINT) AS d
              FROM edges GROUP BY 1, 2
            ),
            i AS (
              SELECT e1.h, e1.s AS a, e2.s AS b,
                     CAST(count(*) AS BIGINT) AS n_common
              FROM edges e1
              JOIN edges e2 ON e2.h = e1.h AND e2.t = e1.t
                           AND e2.s > e1.s
              GROUP BY 1, 2, 3
            )
            SELECT hn.hn AS host, CAST(i.a AS BIGINT) AS a,
                   CAST(i.b AS BIGINT) AS b, i.n_common,
                   CAST((1000000 * i.n_common)
                        // (da.d + db.d - i.n_common) AS BIGINT)
                     AS jaccard_micro
            FROM i
            JOIN deg da ON da.h = i.h AND da.s = i.a
            JOIN deg db ON db.h = i.h AND db.s = i.b
            JOIN hostname hn ON hn.h = i.h
            WHERE 3 * i.n_common >= (da.d + db.d - i.n_common)
        """,
        # degree histogram of the same link graph: simple-graph
        # semantics (distinct neighbors, self-loops dropped)
        "crawl_degrees": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            edges AS (
              SELECT DISTINCT r.h, r.j AS s, x.t AS t
              FROM reach r
              JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            outd AS (SELECT h, s, count(*) AS d FROM edges GROUP BY 1, 2),
            ind  AS (SELECT h, t, count(*) AS d FROM edges GROUP BY 1, 2)
            SELECT 'out' AS direction, CAST(d AS BIGINT) AS degree,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM outd GROUP BY 2
            UNION ALL
            SELECT 'in' AS direction, CAST(d AS BIGINT) AS degree,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM ind GROUP BY 2
        """,
        # round 3: the minhash/simhash families moved to md5-derived
        # hashing (dedup._md5h60) and gained FULL bit-exact SQL
        # oracles — banding, band hashes and bit votes included.
        "minhash_lsh_pairs": _minhash_oracle_sql(),
        "minhash_calibration": _minhash_calibration_oracle_sql(),
        "minhash_lsh_pairs_shuffled": _minhash_oracle_sql(),
        "simhash": _SIMHASH_SIG_SQL,
        "simhash_dup_pairs": f"""
            WITH s AS ({_SIMHASH_SIG_SQL})
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        # per-host mirror aggregates over the same reachability closure
        "crawl_hoststats": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            pages AS (
              SELECT hn.hn AS host, count(*) AS n_pages
              FROM reach r JOIN hostname hn ON hn.h = r.h GROUP BY 1
            ),
            assets AS (
              SELECT host, count(*) AS n_assets FROM (
                SELECT DISTINCT hn.hn AS host,
                       ((13*r.j+7) % ho.n_assets) AS a
                FROM reach r
                JOIN hostname hn ON hn.h = r.h
                JOIN hosts ho ON ho.h = r.h
              ) GROUP BY 1
            )
            SELECT p.host,
                   CAST(p.n_pages AS BIGINT) AS n_pages,
                   CAST(a.n_assets AS BIGINT) AS n_assets,
                   CAST(5 * p.n_pages AS BIGINT) AS n_outlinks,
                   CAST(11 * p.n_pages + a.n_assets AS BIGINT) AS n_spans
            FROM pages p JOIN assets a USING (host)
        """,
        # all-integer PageRank (10 unrolled steps; reduction-order
        # exact, so the distributed run hash-matches)
        "crawl_pagerank_exact": _pagerank_exact_oracle_sql(),
        # unrolled simultaneous k-core peel (depth ≥ measured peel
        # depth; idempotent past the fixpoint, so exact)
        "crawl_kcore": _kcore_oracle_sql(),
        # unrolled triangle-support edge peel (same idempotency)
        "crawl_ktruss": _ktruss_oracle_sql(),
        # rich-club: suffix counts over the degree / min-endpoint-
        # degree histograms; integer-ratio quantization both engines
        "crawl_richclub": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            ue AS MATERIALIZED (
              SELECT DISTINCT r.h, LEAST(r.j, x.t) AS a,
                     GREATEST(r.j, x.t) AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
              WHERE r.j <> x.t
            ),
            half AS (
              SELECT h, a AS node, b AS peer FROM ue
              UNION ALL SELECT h, b AS node, a AS peer FROM ue
            ),
            deg AS MATERIALIZED (
              SELECT h, node, CAST(count(*) AS BIGINT) AS d
              FROM half GROUP BY 1, 2
            ),
            em AS MATERIALIZED (
              SELECT LEAST(da.d, db.d) AS m
              FROM ue
              JOIN deg da ON da.h = ue.h AND da.node = ue.a
              JOIN deg db ON db.h = ue.h AND db.node = ue.b
            ),
            ks AS (
              SELECT UNNEST(range(0, (SELECT max(d) FROM deg))) AS k
            )
            SELECT CAST(ks.k AS BIGINT) AS k,
                   CAST(nk.n AS BIGINT) AS n_nodes,
                   CAST(COALESCE(ek.n, 0) AS BIGINT) AS n_edges,
                   CAST((10000 * 2 * COALESCE(ek.n, 0))
                        // (nk.n * (nk.n - 1)) AS BIGINT) AS phi_pct
            FROM ks
            JOIN (
              SELECT ks.k AS k, count(*) AS n FROM ks, deg
              WHERE deg.d > ks.k GROUP BY 1
            ) nk ON nk.k = ks.k
            LEFT JOIN (
              SELECT ks.k AS k, count(*) AS n FROM ks, em
              WHERE em.m > ks.k GROUP BY 1
            ) ek ON ek.k = ks.k
            WHERE nk.n >= 2
        """,
        # personalized-teleport variant: seeds = page 0 of every host
        "crawl_trustrank": _trustrank_oracle_sql(),
        # 4-round deterministic label propagation (mode + lexicographic tie)
        "crawl_communities_lpa": _lpa_oracle_sql(),
        # Newman modularity of those communities (quantized per-community terms)
        "crawl_modularity": _modularity_oracle_sql(),
        # snapshot drift of embedding means: per-dim integer sums on
        # the even/odd vec_id split; d2 = sum((sa*nb - sb*na)^2) exact
        # in HUGEINT, scaled by 10^12 into BIGINT
        "embeddings_drift": f"""
            WITH q AS (
              -- CAST to DOUBLE first (FLOAT * INT stays float32 and
              -- floor() then drifts off numpy's float64 quantization)
              SELECT label, vec_id % 2 AS snap, i AS dim,
                     CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
                          AS HUGEINT) AS qv
              FROM embeddings,
                   LATERAL unnest(generate_series(1, len(embedding))) t(i)
            ),
            s AS (
              SELECT label, snap, dim, SUM(qv) AS s,
                     CAST(count(*) AS HUGEINT) AS n
              FROM q GROUP BY 1, 2, 3
            ),
            j AS (
              SELECT a.label, a.dim, a.s AS sa, b.s AS sb,
                     a.n AS na, b.n AS nb
              FROM s a
              JOIN s b ON b.label = a.label AND b.dim = a.dim
                      AND a.snap = 0 AND b.snap = 1
            )
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(max(na) AS BIGINT) AS n_a,
                   CAST(max(nb) AS BIGINT) AS n_b,
                   CAST(SUM((sa * nb - sb * na) * (sa * nb - sb * na))
                        // 1000000000000 AS BIGINT) AS d2_scaled
            FROM j GROUP BY label
        """,
        # inbound anchor-text index: the synthetic corpus renders every
        # anchor as 'link <raw candidate>', so the reach closure + the
        # shared fanout VALUES regenerate (target, anchor, count)
        "crawl_anchor_text": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            edges AS (
              SELECT r.h AS h, x.t AS t
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
            )
            SELECT hn.hn || '/p' || e.t || '.html' AS doc_id,
                   'link p' || e.t || '.html' AS anchor,
                   CAST(count(*) AS BIGINT) AS n_refs
            FROM edges e JOIN hostname hn ON hn.h = e.h
            GROUP BY 1, 2
        """,
        # all-integer HITS (5 unrolled rounds, two halves each with a
        # global scalar renormalization)
        "crawl_hits": _hits_oracle_sql(),
        # per-document fetch wave: min-depth BFS over the same link
        # formula (depth-labeled reach, bounded by ho.m so the
        # recursion terminates; MIN(d) is exact because every true
        # depth < m). Pages take their BFS distance from the host
        # seed; an asset lands one wave after the first page that
        # references it — hash-equality pins the frontier's wave
        # SCHEDULING, not just the crawl set.
        # frontier scheduling-skew audit: the depth closure grouped
        # per wave with per-host counts (pages + their assets)
        "crawl_wave_skew": rf"""
            WITH RECURSIVE
            params AS (
              SELECT (SELECT count(*) FROM documents) AS n_docs,
                     8 AS n_hosts, 16 AS n_assets
            ),
            hosts AS (
              SELECT UNNEST(range(0, n_hosts)) AS h,
                     n_docs // n_hosts
                       + CASE WHEN UNNEST(range(0, n_hosts)) < n_docs % n_hosts
                              THEN 1 ELSE 0 END AS m,
                     n_hosts, n_assets
              FROM params
            ),
            reachd(h, j, d) AS (
              SELECT h, 0, 0 FROM hosts
              UNION
              SELECT e.h, e.t, e.d
              FROM (
                SELECT r.h AS h, x.t AS t, r.d + 1 AS d
                FROM reachd r
                JOIN hosts ho ON ho.h = r.h
                CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
                WHERE r.d < ho.m
              ) e
            ),
            pdep AS (
              SELECT h, j, CAST(MIN(d) AS BIGINT) AS depth
              FROM reachd GROUP BY h, j
            ),
            adep AS (
              SELECT p.h, (13*p.j+7) % ho.n_assets AS a,
                     CAST(MIN(p.depth) + 1 AS BIGINT) AS depth
              FROM pdep p JOIN hosts ho ON ho.h = p.h
              GROUP BY p.h, (13*p.j+7) % ho.n_assets
            ),
            alldocs AS (
              SELECT h, depth FROM pdep
              UNION ALL
              SELECT h, depth FROM adep
            ),
            per_host AS (
              SELECT depth, h, count(*) AS n FROM alldocs GROUP BY 1, 2
            )
            SELECT CAST(depth AS BIGINT) AS depth,
                   CAST(SUM(n) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_hosts,
                   CAST((10000 * MAX(n)) // SUM(n) AS BIGINT)
                     AS top_share_pct
            FROM per_host GROUP BY depth
        """,
        "crawl_depths": rf"""
            WITH RECURSIVE
            params AS (
              SELECT (SELECT count(*) FROM documents) AS n_docs,
                     8 AS n_hosts, 16 AS n_assets
            ),
            hosts AS (
              SELECT UNNEST(range(0, n_hosts)) AS h,
                     n_docs // n_hosts
                       + CASE WHEN UNNEST(range(0, n_hosts)) < n_docs % n_hosts
                              THEN 1 ELSE 0 END AS m,
                     n_hosts, n_assets
              FROM params
            ),
            reachd(h, j, d) AS (
              SELECT h, 0, 0 FROM hosts
              UNION
              SELECT e.h, e.t, e.d
              FROM (
                SELECT r.h AS h, x.t AS t, r.d + 1 AS d
                FROM reachd r
                JOIN hosts ho ON ho.h = r.h
                CROSS JOIN LATERAL {_fanout_values("r", "ho")} AS x(t)
                WHERE r.d < ho.m
              ) e
            ),
            hostname AS (
              SELECT h, 'host' || lpad(CAST(h AS VARCHAR), 4, '0')
                       || '.test' AS hn
              FROM hosts
            ),
            pdep AS (
              SELECT h, j, CAST(MIN(d) AS BIGINT) AS depth
              FROM reachd GROUP BY h, j
            ),
            adep AS (
              SELECT p.h, (13*p.j+7) % ho.n_assets AS a,
                     CAST(MIN(p.depth) + 1 AS BIGINT) AS depth
              FROM pdep p JOIN hosts ho ON ho.h = p.h
              GROUP BY p.h, (13*p.j+7) % ho.n_assets
            )
            SELECT hn.hn || '//p' || p.j || '.html' AS doc_id, p.depth
            FROM pdep p JOIN hostname hn ON hn.h = p.h
            UNION ALL
            SELECT hn.hn || '//img' || a.a || '.jpg' AS doc_id, a.depth
            FROM adep a JOIN hostname hn ON hn.h = a.h
        """,
        # incremental recrawl diff: two reachability closures (flagship
        # web vs the v2 web — 25% more pages, one host gone), FULL
        # OUTER JOIN on page id;
        # 'changed' compares the rewritten link-span target sequence —
        # the same string the Ray path hashes per page
        "crawl_diff": rf"""
            WITH RECURSIVE
            {_reach_cte('_a', '(SELECT count(*) FROM documents)')},
            {_reach_cte('_b', '(SELECT count(*) FROM documents) + (SELECT count(*) FROM documents) // 4', n_hosts=7)},
            {_sig_cte('_a')},
            {_sig_cte('_b')}
            SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                   CASE
                     WHEN a.doc_id IS NULL THEN 'added'
                     WHEN b.doc_id IS NULL THEN 'removed'
                     WHEN a.sig <> b.sig THEN 'changed'
                     ELSE 'same'
                   END AS status
            FROM sig_a a FULL OUTER JOIN sig_b b ON a.doc_id = b.doc_id
        """,
        # per-asset reference counts: every reachable page embeds ONE
        # img span, (13j+7) % n_assets, so the manifest is a grouped
        # count over the closure
        "crawl_media_dedup": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            assets AS (
              -- raw mirror doc_ids keep the to_path root-file '//' quirk
              SELECT DISTINCT hn.hn || '//img' || ((13*r.j+7) % ho.n_assets)
                       || '.jpg' AS doc_id
              FROM reach r
              JOIN hostname hn ON hn.h = r.h
              JOIN hosts ho ON ho.h = r.h
            ),
            agg AS (
              SELECT min(doc_id) AS canonical, CAST(count(*) AS BIGINT) AS n
              FROM assets
            )
            SELECT a.doc_id, agg.canonical AS canonical_id,
                   agg.n AS n_copies
            FROM assets a CROSS JOIN agg
        """,
        "crawl_media_manifest": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE}
            SELECT hn.hn AS host,
                   'img' || ((13*r.j+7) % ho.n_assets) || '.jpg' AS media_ref,
                   CAST(count(*) AS BIGINT) AS n_refs
            FROM reach r
            JOIN hostname hn ON hn.h = r.h
            JOIN hosts ho ON ho.h = r.h
            GROUP BY 1, 2
        """,
        # ordered funnel: stage k needs a step-k event STRICTLY after
        # the first qualifying step-(k-1) event
        # windowed funnel: the funnel CTE chain with a per-step
        # 7-day conversion bound in exact epoch microseconds
        "events_funnel_windowed": """
            WITH v AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY 1
            ),
            c AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > v.t
                AND epoch_us(e.ts) <= epoch_us(v.t) + 604800000000 GROUP BY 1
            ),
            p AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.t
                AND epoch_us(e.ts) <= epoch_us(c.t) + 604800000000 GROUP BY 1
            )
            SELECT u.user_id,
                   CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                             WHEN c.user_id IS NOT NULL THEN 2
                             WHEN v.user_id IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS stage
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN v ON v.user_id = u.user_id
            LEFT JOIN c ON c.user_id = u.user_id
            LEFT JOIN p ON p.user_id = u.user_id
        """,
        # rapid repeat orders: the literal same-customer self-join
        # with a whole-day window (dates have no time component)
        "orders_rapid_reorder": """
            SELECT CAST(a.o_custkey AS BIGINT) AS o_custkey,
                   CAST(a.o_orderkey AS BIGINT) AS first_key,
                   CAST(b.o_orderkey AS BIGINT) AS second_key,
                   CAST(abs(datediff('day', b.o_orderdate, a.o_orderdate))
                        AS BIGINT) AS gap_days
            FROM orders a
            JOIN orders b ON b.o_custkey = a.o_custkey
                         AND a.o_orderkey < b.o_orderkey
            WHERE abs(datediff('day', b.o_orderdate, a.o_orderdate)) <= 7
        """,
        "events_funnel": """
            WITH v AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY 1
            ),
            c AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY 1
            ),
            p AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY 1
            )
            SELECT u.user_id,
                   CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                             WHEN c.user_id IS NOT NULL THEN 2
                             WHEN v.user_id IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS stage
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN v ON v.user_id = u.user_id
            LEFT JOIN c ON c.user_id = u.user_id
            LEFT JOIN p ON p.user_id = u.user_id
        """,
        # grouped top-k window: row_number per user over (value DESC,
        # event_id) — ties on value break deterministically on event_id
        "events_top_k_per_user": """
            SELECT user_id, event_id, rnk FROM (
              SELECT user_id, event_id,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY value DESC, event_id
                     ) AS rnk
              FROM events
            ) WHERE rnk <= 3
        """,
        # decontamination: training docs (doc_id % 23 != 0) sharing any
        # word-4-gram with the eval slice (doc_id % 23 == 0); n_shared
        # counts the doc's DISTINCT 4-grams that occur in the eval set
        "docs_decontaminate": r"""
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 2)) AS i FROM docs2
            ),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(L[i:i+3], ' ') AS s
              FROM pos
            ),
            ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 23 = 0),
            hits AS (
              SELECT sh.doc_id, count(*) AS n
              FROM sh JOIN ev USING (s)
              WHERE sh.doc_id % 23 <> 0 GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.n, 0) AS BIGINT) AS n_shared,
                   CAST(coalesce(h.n, 0) > 0 AS BIGINT) AS contaminated
            FROM documents d
            LEFT JOIN hits h ON h.doc_id = d.doc_id
            WHERE d.doc_id % 23 <> 0
        """,
        # corpus-wide duplicate-4-gram fraction per doc
        "docs_dup_ngram_fraction": r"""
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 2)) AS i FROM docs2
            ),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(L[i:i+3], ' ') AS s
              FROM pos
            ),
            freq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
            SELECT sh.doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                   CAST(floor(10000.0 * sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)
                              / count(*)) AS BIGINT) AS dup_pct
            FROM sh JOIN freq f USING (s)
            GROUP BY sh.doc_id
        """,
        "docs_dup_spans": r"""
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 2)) AS i FROM docs2
            ),
            grams AS (
              SELECT doc_id, i, array_to_string(L[i:i+3], ' ') AS s FROM pos
            ),
            freq AS (SELECT s, count(DISTINCT doc_id) AS df FROM grams GROUP BY s),
            dup AS (
              SELECT g.doc_id, g.i FROM grams g JOIN freq f USING (s)
              WHERE f.df >= 2
            ),
            isl AS (
              SELECT doc_id, i,
                     i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
              FROM dup
            )
            SELECT doc_id,
                   CAST(min(i) - 1 AS BIGINT) AS start_pos,
                   CAST(max(i) - 1 AS BIGINT) AS end_pos,
                   CAST(count(*) AS BIGINT) AS n_grams
            FROM isl GROUP BY doc_id, grp
        """,
        # global rank by (value, event_id): the distributed-sort shape
        # (sampled range splits + per-bucket scan) checked exactly
        "events_value_rank": r"""
            SELECT event_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY value, event_id)
                        AS BIGINT) AS rnk
            FROM events
        """,
        # sequence packing: global token offset per doc (a prefix sum
        # in doc_id order) and the packed seq_len=32 sequence range
        "docs_pack_sequences": r"""
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            cnt AS (SELECT doc_id, len(L) AS n FROM docs2),
            sc AS (
              SELECT doc_id, n,
                     coalesce(SUM(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS start_off
              FROM cnt
            )
            SELECT doc_id,
                   CAST(n AS BIGINT) AS n_tokens,
                   CAST(start_off AS BIGINT) AS start_off,
                   CAST(CASE WHEN n = 0 THEN -1
                        ELSE start_off // 32 END AS BIGINT) AS first_seq,
                   CAST(CASE WHEN n = 0 THEN -1
                        ELSE (start_off + n - 1) // 32 END AS BIGINT) AS last_seq
            FROM sc
        """,
        # APPLY the duplicated-span cuts: drop every token covered by a
        # docs_dup_spans range [start, end + k - 1], rejoin survivors
        "docs_cut_dup_spans": r"""
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            pos AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) - 2)) AS i FROM docs2
            ),
            grams AS (
              SELECT doc_id, i, array_to_string(L[i:i+3], ' ') AS s FROM pos
            ),
            freq AS (SELECT s, count(DISTINCT doc_id) AS df FROM grams GROUP BY s),
            dup AS (
              SELECT g.doc_id, g.i FROM grams g JOIN freq f USING (s)
              WHERE f.df >= 2
            ),
            isl AS (
              SELECT doc_id, i,
                     i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
              FROM dup
            ),
            spans AS (
              SELECT doc_id, min(i) AS s, max(i) + 3 AS e
              FROM isl GROUP BY doc_id, grp
            ),
            toks AS (
              SELECT doc_id, L, UNNEST(range(1, len(L) + 1)) AS p FROM docs2
            ),
            cutpos AS (
              SELECT t.doc_id, t.p
              FROM toks t JOIN spans sp
                ON t.doc_id = sp.doc_id AND t.p BETWEEN sp.s AND sp.e
              GROUP BY t.doc_id, t.p
            ),
            kept AS (
              SELECT t.doc_id, t.p, t.L[t.p] AS tok
              FROM toks t LEFT JOIN cutpos c
                ON t.doc_id = c.doc_id AND t.p = c.p
              WHERE c.p IS NULL
            )
            SELECT d2.doc_id,
                   CAST(len(d2.L) AS BIGINT) AS n_tokens,
                   CAST(coalesce(cnt.n_cut, 0) AS BIGINT) AS n_cut,
                   coalesce(agg.text_clean, '') AS text_clean
            FROM docs2 d2
            LEFT JOIN (
              SELECT doc_id, count(*) AS n_cut FROM cutpos GROUP BY doc_id
            ) cnt ON d2.doc_id = cnt.doc_id
            LEFT JOIN (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_clean
              FROM kept GROUP BY doc_id
            ) agg ON d2.doc_id = agg.doc_id
        """,
        # corpus-wide exact segment (paragraph-style) dedup: first
        # occurrence by (doc_id, seg_idx) wins; segments are 8-word
        # windows, last keeps the remainder (textops.SEGMENT_W)
        "docs_segment_dedup": r"""
            WITH docs2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
              FROM documents
            ),
            segs AS (
              SELECT doc_id, L,
                     UNNEST(range(0, CAST(ceil(len(L) / 8.0) AS BIGINT))) AS s
              FROM docs2
            ),
            seg2 AS (
              SELECT doc_id, s AS seg_idx,
                     array_to_string(L[s*8+1 : least((s+1)*8, len(L))], ' ') AS seg
              FROM segs
            )
            SELECT doc_id,
                   CAST(seg_idx AS BIGINT) AS seg_idx,
                   CAST(CASE WHEN ROW_NUMBER() OVER (
                          PARTITION BY seg ORDER BY doc_id, seg_idx) = 1
                        THEN 1 ELSE 0 END AS BIGINT) AS kept
            FROM seg2
        """,
        # add-one-smoothed bigram LM score in integer MICRONATS:
        # per-bigram floor(-ln((c2+1)/(c1+V))*1e6) quantized BEFORE the
        # per-doc sum, so the float reduction is order-free and
        # bit-reproducible (textops.docs_lm_score mirrors term by term)
        "docs_lm_score": _LM_SCORE_SQL,
        # CCNet head/middle/tail: rank every doc by its avg LM score
        # and cut in exact integer thirds — bucket = rownum0·3 // n
        "docs_ccnet_buckets": f"""
            WITH lm AS ({_LM_SCORE_SQL}),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lm),
            rk AS (
              SELECT doc_id, avg_nll_micro,
                     ROW_NUMBER() OVER (
                       ORDER BY avg_nll_micro, doc_id) AS rnk
              FROM lm
            )
            SELECT rk.doc_id, rk.avg_nll_micro,
                   CAST(((rk.rnk - 1) * 3) // nn.n AS BIGINT)
                     AS ccnet_bucket
            FROM rk CROSS JOIN nn
        """,
        # TPC-H batch two (pipelines/tpch.py) — constants mirror the
        # module's Q*_ globals verbatim
        "q6_forecast_revenue": """
            SELECT CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(COALESCE(SUM(
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT)), 0)
                     AS BIGINT) AS revenue_i4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 3 AND 5
              AND l_quantity < 24
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS sum_rev,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM customer
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
                         AND s_nationkey = c_nationkey
            JOIN nation ON n_nationkey = c_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_i4
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
        """,
        "q15_top_supplier": """
            WITH r AS (
              SELECT l_suppkey,
                     SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS total
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name,
                   CAST(total AS BIGINT) AS total_revenue_i4
            FROM r JOIN supplier ON s_suppkey = l_suppkey
            WHERE total = (SELECT max(total) FROM r)
        """,
        "q18_large_volume_customers": """
            WITH q AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS sum_qty
              FROM lineitem
              GROUP BY l_orderkey
              HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 300
            )
            SELECT c_custkey, c_name, o_orderkey,
                   epoch_us(o_orderdate) AS odate_us,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
                   q.sum_qty
            FROM q
            JOIN orders ON o_orderkey = q.l_orderkey
            JOIN customer ON c_custkey = o_custkey
        """,
        "q19_discounted_revenue": """
            SELECT CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(COALESCE(SUM(
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))), 0)
                     AS BIGINT) AS revenue_i4
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 30)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 20 AND 40)
        """,
        "q21_suppliers_kept_waiting": """
            WITH w AS (
              SELECT l1.l_suppkey AS s_suppkey, count(*) AS numwait
              FROM lineitem l1
              JOIN orders ON o_orderkey = l1.l_orderkey
              WHERE o_orderstatus = 'F'
                AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
                AND EXISTS (
                  SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
                AND NOT EXISTS (
                  SELECT 1 FROM lineitem l3
                  JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
              GROUP BY l1.l_suppkey
            ),
            rk AS (
              SELECT s_suppkey, numwait,
                     ROW_NUMBER() OVER (
                       ORDER BY numwait DESC, s_suppkey) AS rnk
              FROM w
            )
            SELECT rk.s_suppkey, s.s_name,
                   CAST(rk.numwait AS BIGINT) AS numwait
            FROM rk JOIN supplier s ON s.s_suppkey = rk.s_suppkey
            WHERE rk.rnk <= 20
        """,
        # TPC-H batch three (pipelines/tpch2.py) — the partsupp family
        # adapted: lineitem's distinct (partkey, suppkey) pairs are the
        # part↔supplier relation; constants mirror the Q*_ globals
        "q2_min_cost_supplier": """
            WITH cost AS (
              SELECT l_partkey AS pk, l_suppkey AS sk,
                     CAST(MIN(round(l_extendedprice * 100)) AS BIGINT)
                       AS cost_c
              FROM lineitem GROUP BY 1, 2
            ),
            cand AS (
              SELECT cost.* FROM cost
              JOIN part ON p_partkey = pk
              JOIN supplier ON s_suppkey = sk
              JOIN nation ON n_nationkey = s_nationkey
              JOIN region ON r_regionkey = n_regionkey
              WHERE r_name = 'EUROPE' AND p_size <= 10
                AND p_type = 'SMALL'
            ),
            mn AS (SELECT pk, MIN(cost_c) AS m FROM cand GROUP BY 1)
            SELECT cand.pk AS p_partkey, cand.sk AS s_suppkey,
                   s_name, n_name, cost_c
            FROM cand JOIN mn USING (pk)
            JOIN supplier ON s_suppkey = cand.sk
            JOIN nation ON n_nationkey = s_nationkey
            WHERE cost_c = m
        """,
        "q9_product_profit": """
            SELECT n_name,
                   CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     - CAST(round(l_quantity) AS BIGINT)
                       * CAST(round(p_retailprice * 100) AS BIGINT) * 100
                   ) AS BIGINT) AS profit_i4
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%gear%'
            GROUP BY 1, 2
        """,
        "q11_important_stock": """
            WITH v AS (
              SELECT l_partkey,
                     CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS value_c
              FROM lineitem
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation ON n_nationkey = s_nationkey
              WHERE n_name = 'NATION_12'
              GROUP BY 1
            )
            SELECT l_partkey, value_c FROM v
            WHERE value_c * 1000 > (SELECT SUM(value_c) FROM v)
        """,
        "q12_shipmode_priority": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                     ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
                     AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority NOT IN
                     ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
                     AS low_line_count
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1
        """,
        "q16_supplier_part_count": """
            WITH ps AS (
              SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
              FROM lineitem
            )
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT sk) AS BIGINT) AS supplier_cnt
            FROM ps JOIN part ON p_partkey = pk
            WHERE p_brand <> 'Brand#1' AND p_type <> 'ECONOMY'
              AND p_size IN (1, 5, 9, 15, 20, 25, 30, 36)
              AND sk NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
        """,
        "q20_promo_suppliers": """
            WITH q AS (
              SELECT l_partkey AS pk, l_suppkey AS sk,
                     CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS qty
              FROM lineitem
              JOIN part ON p_partkey = l_partkey
              WHERE p_name LIKE 'red %'
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY 1, 2
            ),
            tot AS (SELECT pk, SUM(qty) AS t FROM q GROUP BY 1)
            SELECT DISTINCT s_suppkey, s_name
            FROM q JOIN tot USING (pk)
            JOIN supplier ON s_suppkey = sk
            JOIN nation ON n_nationkey = s_nationkey
            WHERE q.qty * 2 > t AND n_name = 'NATION_12'
        """,
        # mergeable sufficient statistics for per-type price variance
        # (integer-exact; float moments would be order-dependent)
        "part_type_price_stats": """
            SELECT p_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT))
                     AS BIGINT) AS sum_c,
                   CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)
                            * CAST(round(p_retailprice * 100) AS BIGINT))
                     AS BIGINT) AS sumsq_c2
            FROM part GROUP BY 1
        """,
        # RFM segmentation: three independent exact NTILE(4)s over the
        # per-customer aggregate, ties broken by custkey
        "customer_rfm": """
            WITH a AS (
              SELECT o_custkey AS c_custkey,
                     MAX(epoch_us(o_orderdate)) AS r_us,
                     COUNT(*) AS f,
                     SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS m_c
              FROM orders GROUP BY 1
            )
            SELECT c_custkey,
                   CAST(NTILE(4) OVER (ORDER BY r_us, c_custkey) AS BIGINT)
                     AS r_tile,
                   CAST(NTILE(4) OVER (ORDER BY f, c_custkey) AS BIGINT)
                     AS f_tile,
                   CAST(NTILE(4) OVER (ORDER BY m_c, c_custkey) AS BIGINT)
                     AS m_tile
            FROM a
        """,
        # RANGE-interval frame: trailing 7-day per-user window found
        # by VALUE (not position) — ties at the current instant all
        # included, per SQL RANGE semantics
        "events_trailing_7d": """
            SELECT event_id,
                   CAST(COUNT(*) OVER w AS BIGINT) AS trail_n,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w
                     AS BIGINT) AS trail_sum_c
            FROM events
            WINDOW w AS (
              PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
        """,
        # streaming watermark: running-max event time over the
        # md5-jittered arrival order, minus 36 h allowed lateness;
        # events older than the watermark AT ARRIVAL are dropped
        # (constants mirror WATERMARK_* in relops.py)
        "events_watermark_agg": """
            WITH e AS (
              SELECT event_id, epoch_us(ts) AS ts_us, event_type,
                     CAST(round(value * 100) AS BIGINT) AS v,
                     epoch_us(ts)
                       + ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                         1, 15))::BIGINT % 172800000000
                       - 86400000000 AS arr
              FROM events
            ),
            w AS (
              SELECT *, MAX(ts_us) OVER (
                ORDER BY arr, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
              FROM e
            )
            SELECT event_type,
                   CAST(ts_us // 86400000000 * 86400000000 AS BIGINT)
                     AS day_us,
                   CAST(count(*) AS BIGINT) AS n_accepted,
                   CAST(SUM(v) AS BIGINT) AS sum_value_c
            FROM w
            WHERE pm IS NULL OR ts_us >= pm - 129600000000
            GROUP BY 1, 2
        """,
        # incremental ingest: new (odd doc_id) docs surviving dedup
        # against the old (even) corpus AND within themselves
        "docs_incremental_dedup": """
            WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
            old AS (SELECT DISTINCT hh FROM h WHERE doc_id % 2 = 0),
            new AS (SELECT doc_id, hh FROM h WHERE doc_id % 2 = 1)
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
            FROM new WHERE hh NOT IN (SELECT hh FROM old)
            GROUP BY hh
        """,
        # sweep-line max-overlap over the sessionize intervals: +1/−1
        # endpoint deltas, running sum ordered by (ts, +1 first), max
        # and its earliest instant — chains the sessionize CTE
        "events_peak_concurrency": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
            o AS (
              SELECT user_id, ts_us,
                CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > 1800 * 1000000
                     THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
            ),
            ses AS (
              SELECT user_id, ts_us,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING) AS session_id
              FROM o
            ),
            sess AS (
              SELECT min(ts_us) AS s, max(ts_us) AS t
              FROM ses GROUP BY user_id, session_id
            ),
            pts AS (
              SELECT s AS ts_us, 1 AS d FROM sess
              UNION ALL
              SELECT t AS ts_us, -1 AS d FROM sess
            ),
            run AS (
              SELECT ts_us,
                SUM(d) OVER (ORDER BY ts_us, d DESC
                             ROWS UNBOUNDED PRECEDING) AS conc
              FROM pts
            )
            SELECT CAST(MAX(conc) AS BIGINT) AS max_concurrent,
                   CAST(MIN(CASE WHEN conc = (SELECT MAX(conc) FROM run)
                            THEN ts_us END) AS BIGINT) AS first_peak_us
            FROM run
        """,
        # argmin/argmax-by-ordering: first/last value per user and the
        # CDC last-write-wins compaction, (ts, event_id) tiebreak
        "events_first_last": """
            WITH o AS (
              SELECT user_id,
                     CAST(round(value * 100) AS BIGINT) AS value_c,
                     ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS ra,
                     ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rz
              FROM events
            )
            SELECT user_id,
                   CAST(MAX(CASE WHEN ra = 1 THEN value_c END) AS BIGINT)
                     AS first_value_c,
                   CAST(MAX(CASE WHEN rz = 1 THEN value_c END) AS BIGINT)
                     AS last_value_c,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM o GROUP BY user_id
        """,
        "events_latest_state": """
            SELECT user_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
                   CAST(round(value * 100) AS BIGINT) AS last_value_c
            FROM events
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY user_id, event_type
              ORDER BY ts DESC, event_id DESC) = 1
        """,
        # connected components: ext_links=False means no cross-host
        # edges, and every crawled page is link-reachable from its
        # host's seed, so each host's reachable page set is EXACTLY
        # one component — the closure CTE counts them per host
        "crawl_components": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            per_host AS (
              SELECT h, CAST(count(*) AS BIGINT) AS size
              FROM reach GROUP BY h
            )
            SELECT size, CAST(count(*) AS BIGINT) AS n_components
            FROM per_host GROUP BY size
        """,
        # strongly connected components of the DIRECTED link graph:
        # the shared reach CTE regenerates the formulaic edges, a
        # second recursive CTE takes the per-host transitive closure
        # (bounded: pages² per host at test scale), mutual pairs give
        # each page its min-partner SCC label, and the histogram
        # groups label sizes — every crawled page's link targets are
        # themselves crawled, so no membership filter is needed here
        # (the engine applies one for generality)
        # resource-allocation link prediction: undirected degree +
        # wedge self-join, integer 1e9 // deg(z) terms, existing
        # edges excluded
        "crawl_resource_allocation": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS a, x.t AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            und AS (
              SELECT DISTINCT h, a, b FROM (
                SELECT h, a, b FROM e
                UNION ALL SELECT h, b, a FROM e
              )
            ),
            deg AS (SELECT h, a AS z, count(*) AS d FROM und GROUP BY 1, 2),
            wedge AS (
              SELECT u1.h, u1.a AS z, u1.b AS x, u2.b AS y
              FROM und u1
              JOIN und u2 ON u2.h = u1.h AND u2.a = u1.a
                          AND u1.b < u2.b
            ),
            scored AS (
              SELECT w.h, w.x AS a, w.y AS b,
                     CAST(count(*) AS BIGINT) AS n_common,
                     CAST(SUM(1000000000 // d.d) AS BIGINT) AS ra_nano
              FROM wedge w JOIN deg d ON d.h = w.h AND d.z = w.z
              GROUP BY 1, 2, 3
            )
            SELECT hn.hn AS host, CAST(s.a AS BIGINT) AS a,
                   CAST(s.b AS BIGINT) AS b, s.n_common, s.ra_nano
            FROM scored s JOIN hostname hn ON hn.h = s.h
            WHERE s.n_common >= 2
              AND NOT EXISTS (SELECT 1 FROM und u
                              WHERE u.h = s.h AND u.a = s.a
                                AND u.b = s.b)
        """,
        # degree assortativity: across directed edges, signed SQUARED
        # Pearson between src out-degree and dst in-degree, micro
        # units — the events_acf closed form in HUGEINT
        "crawl_assortativity": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS s, x.t AS t
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            odeg AS (
              SELECT h, s, CAST(count(*) AS HUGEINT) AS d
              FROM e GROUP BY 1, 2
            ),
            ideg AS (
              SELECT h, t, CAST(count(*) AS HUGEINT) AS d
              FROM e GROUP BY 1, 2
            ),
            xy AS (
              SELECT e.h, o.d AS x, i.d AS y
              FROM e
              JOIN odeg o ON o.h = e.h AND o.s = e.s
              JOIN ideg i ON i.h = e.h AND i.t = e.t
            ),
            st AS (
              SELECT h, CAST(count(*) AS HUGEINT) AS n,
                     SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                     SUM(x * x) AS sxx, SUM(y * y) AS syy
              FROM xy GROUP BY 1
            )
            SELECT hn.hn AS host,
                   CAST(st.n AS BIGINT) AS n_edges,
                   CAST(CASE
                     WHEN (st.n * st.sxx - st.sx * st.sx)
                          * (st.n * st.syy - st.sy * st.sy) = 0
                       THEN 0
                     ELSE (CASE WHEN st.n * st.sxy - st.sx * st.sy < 0
                                THEN -1 ELSE 1 END)
                          * (((st.n * st.sxy - st.sx * st.sy)
                              * (st.n * st.sxy - st.sx * st.sy)
                              * 1000000)
                             // ((st.n * st.sxx - st.sx * st.sx)
                                 * (st.n * st.syy - st.sy * st.sy)))
                   END AS BIGINT) AS assort2_micro
            FROM st JOIN hostname hn ON hn.h = st.h
        """,
        # SimRank: 3 unrolled integer iterations over the in-edge
        # cross join; diagonal 1e6 implicit in the CASE, pairs with
        # empty in-sets never join in
        "crawl_simrank": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS a, x.t AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            ind AS (SELECT h, b AS node, count(*) AS indeg
                    FROM e GROUP BY 1, 2),
            {_simrank_step("s1", None)},
            {_simrank_step("s2", "s1")},
            {_simrank_step("s3", "s2")}
            SELECT hn.hn AS host, CAST(s3.a AS BIGINT) AS a,
                   CAST(s3.b AS BIGINT) AS b,
                   CAST(s3.s AS BIGINT) AS sim_micro
            FROM s3 JOIN hostname hn ON hn.h = s3.h
            WHERE s3.a < s3.b AND s3.s > 0
        """,
        # betweenness via full shortest-path enumeration: the mind
        # join inside the recursion admits exactly the BFS-DAG steps
        # (a prefix of a shortest path is shortest), interior nodes
        # unnest from the via string, per-ordered-pair floored terms
        "crawl_betweenness": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS a, x.t AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            bfs(h, s, n, d) AS (
              SELECT h, a, b, 1 FROM e
              UNION
              SELECT b2.h, b2.s, e2.b, b2.d + 1
              FROM bfs b2
              JOIN hosts ho ON ho.h = b2.h
              JOIN e e2 ON e2.h = b2.h AND e2.a = b2.n
              WHERE b2.d < ho.m
            ),
            mind AS (
              SELECT h, s, n, MIN(d) AS d FROM bfs
              WHERE s <> n GROUP BY 1, 2, 3
            ),
            sp(h, s, t, d, via) AS (
              SELECT h, a, b, 1, '' FROM e
              UNION ALL
              SELECT p.h, p.s, e2.b, p.d + 1,
                     p.via || ',' || CAST(p.t AS VARCHAR)
              FROM sp p
              JOIN e e2 ON e2.h = p.h AND e2.a = p.t
              JOIN mind md ON md.h = p.h AND md.s = p.s
                          AND md.n = e2.b AND md.d = p.d + 1
            ),
            sig AS (
              SELECT h, s, t, count(*) AS sigma FROM sp
              GROUP BY 1, 2, 3
            ),
            through AS (
              SELECT p.h, p.s, p.t,
                     CAST(u.x AS BIGINT) AS v, count(*) AS sv
              FROM sp p, UNNEST(string_split(p.via, ',')) AS u(x)
              WHERE u.x <> ''
              GROUP BY 1, 2, 3, 4
            ),
            bc AS (
              SELECT t2.h, t2.v,
                     CAST(SUM((CAST(t2.sv AS HUGEINT) * 1000000)
                              // g.sigma) AS BIGINT) AS bc_micro
              FROM through t2
              JOIN sig g ON g.h = t2.h AND g.s = t2.s AND g.t = t2.t
              GROUP BY 1, 2
            )
            SELECT hn.hn AS host, CAST(r.j AS BIGINT) AS page,
                   CAST(COALESCE(bc.bc_micro, 0) AS BIGINT) AS bc_micro
            FROM reach r
            LEFT JOIN bc ON bc.h = r.h AND bc.v = r.j
            JOIN hostname hn ON hn.h = r.h
        """,
        # per-host distance distribution: BFS min distances rolled
        # into integer cumulative rank rules (lower median, 90%
        # effective diameter, true diameter)
        "crawl_distance_stats": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS a, x.t AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            bfs(h, s, n, d) AS (
              SELECT h, a, b, 1 FROM e
              UNION
              SELECT b2.h, b2.s, e2.b, b2.d + 1
              FROM bfs b2
              JOIN hosts ho ON ho.h = b2.h
              JOIN e e2 ON e2.h = b2.h AND e2.a = b2.n
              WHERE b2.d < ho.m
            ),
            mind AS (
              SELECT h, s, n, MIN(d) AS d FROM bfs
              WHERE s <> n GROUP BY 1, 2, 3
            ),
            hist AS (SELECT h, d, count(*) AS c FROM mind GROUP BY 1, 2),
            cum AS (
              SELECT h, d,
                     SUM(c) OVER (PARTITION BY h ORDER BY d) AS cm,
                     SUM(c) OVER (PARTITION BY h) AS np
              FROM hist
            ),
            st AS (
              SELECT h,
                     MIN(CASE WHEN 2 * cm >= np THEN d END) AS med,
                     MIN(CASE WHEN 10 * cm >= 9 * np THEN d END) AS eff,
                     MAX(d) AS diam, MAX(np) AS np
              FROM cum GROUP BY h
            ),
            msz AS (SELECT h, count(*) AS mh FROM reach GROUP BY h)
            SELECT hn.hn AS host, CAST(ms.mh AS BIGINT) AS n_pages,
                   CAST(COALESCE(st.np, 0) AS BIGINT) AS n_pairs,
                   CAST(COALESCE(st.med, 0) AS BIGINT) AS median_dist,
                   CAST(COALESCE(st.eff, 0) AS BIGINT)
                     AS eff_diameter_90,
                   CAST(COALESCE(st.diam, 0) AS BIGINT) AS diameter
            FROM msz ms
            LEFT JOIN st ON st.h = ms.h
            JOIN hostname hn ON hn.h = ms.h
        """,
        # directed closeness centrality: bounded-depth recursive BFS
        # (UNION dedups (h,s,n,d) rows; d < host size caps cycles),
        # min distance per (host, src, node), Wasserman-Faust ppm
        "crawl_harmonic": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS a, x.t AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            bfs(h, s, n, d) AS (
              SELECT h, a, b, 1 FROM e
              UNION
              SELECT b2.h, b2.s, e2.b, b2.d + 1
              FROM bfs b2
              JOIN hosts ho ON ho.h = b2.h
              JOIN e e2 ON e2.h = b2.h AND e2.a = b2.n
              WHERE b2.d < ho.m
            ),
            mind AS (
              SELECT h, s, n, MIN(d) AS d FROM bfs
              WHERE s <> n GROUP BY 1, 2, 3
            ),
            agg AS (
              SELECT h, s, CAST(count(*) AS BIGINT) AS n_reach,
                     CAST(SUM(1000000 // d) AS BIGINT) AS harmonic_micro
              FROM mind GROUP BY 1, 2
            )
            SELECT hn.hn AS host, CAST(r.j AS BIGINT) AS page,
                   CAST(COALESCE(a.n_reach, 0) AS BIGINT) AS n_reach,
                   CAST(COALESCE(a.harmonic_micro, 0) AS BIGINT)
                     AS harmonic_micro
            FROM reach r
            JOIN hostname hn ON hn.h = r.h
            LEFT JOIN agg a ON a.h = r.h AND a.s = r.j
        """,
        "crawl_closeness": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS a, x.t AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            bfs(h, s, n, d) AS (
              SELECT h, a, b, 1 FROM e
              UNION
              SELECT b2.h, b2.s, e2.b, b2.d + 1
              FROM bfs b2
              JOIN hosts ho ON ho.h = b2.h
              JOIN e e2 ON e2.h = b2.h AND e2.a = b2.n
              WHERE b2.d < ho.m
            ),
            mind AS (
              SELECT h, s, n, MIN(d) AS d FROM bfs
              WHERE s <> n GROUP BY 1, 2, 3
            ),
            agg AS (
              SELECT h, s, CAST(count(*) AS BIGINT) AS n_reach,
                     CAST(SUM(d) AS BIGINT) AS dist_sum
              FROM mind GROUP BY 1, 2
            ),
            msz AS (SELECT h, count(*) AS mh FROM reach GROUP BY h)
            SELECT hn.hn AS host, CAST(r.j AS BIGINT) AS page,
                   CAST(COALESCE(a.n_reach, 0) AS BIGINT) AS n_reach,
                   CAST(COALESCE(a.dist_sum, 0) AS BIGINT) AS dist_sum,
                   CAST(CASE WHEN COALESCE(a.dist_sum, 0) > 0
                              AND ms.mh > 1
                        THEN (CAST(a.n_reach AS HUGEINT) * a.n_reach
                              * 1000000)
                             // (CAST(a.dist_sum AS HUGEINT)
                                 * (ms.mh - 1))
                        ELSE 0 END AS BIGINT) AS closeness_ppm
            FROM reach r
            JOIN msz ms ON ms.h = r.h
            JOIN hostname hn ON hn.h = r.h
            LEFT JOIN agg a ON a.h = r.h AND a.s = r.j
        """,
        # Broder bow-tie per host: largest SCC + four reach sets over
        # the same closure the SCC oracle uses
        "crawl_bowtie": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS a, x.t AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            tc(h, a, b) AS (
              SELECT h, a, b FROM e
              UNION
              SELECT tc.h, tc.a, e2.b
              FROM tc JOIN e e2 ON e2.h = tc.h AND e2.a = tc.b
            ),
            mutual AS (
              SELECT t1.h, t1.a AS j, t1.b AS k
              FROM tc t1
              JOIN tc t2
                ON t2.h = t1.h AND t2.a = t1.b AND t2.b = t1.a
            ),
            lab AS (
              SELECT r.h, r.j,
                     LEAST(r.j, COALESCE(MIN(m.k), r.j)) AS scc_id
              FROM reach r
              LEFT JOIN mutual m ON m.h = r.h AND m.j = r.j
              GROUP BY r.h, r.j
            ),
            sz AS (
              SELECT h, scc_id, count(*) AS size FROM lab GROUP BY 1, 2
            ),
            core_pick AS (
              SELECT h, scc_id FROM sz
              QUALIFY row_number() OVER (
                PARTITION BY h ORDER BY size DESC, scc_id ASC) = 1
            ),
            coreset AS (
              SELECT l.h, l.j FROM lab l
              JOIN core_pick c ON c.h = l.h AND c.scc_id = l.scc_id
            ),
            -- DISTINCT wrappers: inside WITH RECURSIVE, DuckDB's
            -- non-recursive CTE UNIONs do not deduplicate
            fwd AS (
              SELECT DISTINCT h, j FROM (
                SELECT h, j FROM coreset
                UNION ALL
                SELECT tc.h, tc.b FROM tc
                JOIN coreset c ON c.h = tc.h AND c.j = tc.a
              )
            ),
            bwd AS (
              SELECT DISTINCT h, j FROM (
                SELECT h, j FROM coreset
                UNION ALL
                SELECT tc.h, tc.a FROM tc
                JOIN coreset c ON c.h = tc.h AND c.j = tc.b
              )
            ),
            inset AS (
              SELECT b2.h, b2.j FROM bwd b2
              WHERE NOT EXISTS (
                SELECT 1 FROM fwd f WHERE f.h = b2.h AND f.j = b2.j)
            ),
            outset AS (
              SELECT f2.h, f2.j FROM fwd f2
              WHERE NOT EXISTS (
                SELECT 1 FROM bwd b3 WHERE b3.h = f2.h AND b3.j = f2.j)
            ),
            fromin AS (
              SELECT DISTINCT tc.h, tc.b AS j FROM tc
              JOIN inset i ON i.h = tc.h AND i.j = tc.a
            ),
            toout AS (
              SELECT DISTINCT tc.h, tc.a AS j FROM tc
              JOIN outset o ON o.h = tc.h AND o.j = tc.b
            ),
            cls AS (
              SELECT r.h, r.j,
                CASE
                  WHEN f.j IS NOT NULL AND bw.j IS NOT NULL THEN 'CORE'
                  WHEN bw.j IS NOT NULL THEN 'IN'
                  WHEN f.j IS NOT NULL THEN 'OUT'
                  WHEN fi.j IS NOT NULL AND t_o.j IS NOT NULL THEN 'TUBE'
                  WHEN fi.j IS NOT NULL THEN 'TENDRIL_IN'
                  WHEN t_o.j IS NOT NULL THEN 'TENDRIL_OUT'
                  ELSE 'DISC'
                END AS cls
              FROM reach r
              LEFT JOIN fwd f ON f.h = r.h AND f.j = r.j
              LEFT JOIN bwd bw ON bw.h = r.h AND bw.j = r.j
              LEFT JOIN fromin fi ON fi.h = r.h AND fi.j = r.j
              LEFT JOIN toout t_o ON t_o.h = r.h AND t_o.j = r.j
            )
            SELECT hn.hn AS host, cls, CAST(count(*) AS BIGINT) AS n_nodes
            FROM cls JOIN hostname hn ON hn.h = cls.h
            GROUP BY 1, 2
        """,
        "crawl_scc": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS a, x.t AS b
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            tc(h, a, b) AS (
              SELECT h, a, b FROM e
              UNION
              SELECT tc.h, tc.a, e2.b
              FROM tc JOIN e e2 ON e2.h = tc.h AND e2.a = tc.b
            ),
            mutual AS (
              SELECT t1.h, t1.a AS j, t1.b AS k
              FROM tc t1
              JOIN tc t2
                ON t2.h = t1.h AND t2.a = t1.b AND t2.b = t1.a
            ),
            lab AS (
              SELECT r.h, r.j,
                     LEAST(r.j, COALESCE(MIN(m.k), r.j)) AS scc_id
              FROM reach r
              LEFT JOIN mutual m ON m.h = r.h AND m.j = r.j
              GROUP BY r.h, r.j
            ),
            sz AS (
              SELECT h, scc_id, count(*) AS size FROM lab GROUP BY 1, 2
            )
            SELECT CAST(size AS BIGINT) AS size,
                   CAST(count(*) AS BIGINT) AS n_sccs
            FROM sz GROUP BY size
        """,
        # weighted bounded-hop SSSP: cheapest ≤15-edge path from each
        # host seed, edge cost = rewritten-link string length
        # ('p<t>.html' → 6 + digits); recursive path enumeration with
        # a hop counter, then MIN per node — pages unreached within
        # the cap report −1 (assets are not graph nodes)
        "crawl_sssp": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            e AS (
              SELECT DISTINCT r.h, r.j AS a, x.t AS b,
                     6 + length(CAST(x.t AS VARCHAR)) AS w
              FROM reach r JOIN hosts ho ON ho.h = r.h
              CROSS JOIN LATERAL (VALUES
                ((2*r.j+1) % ho.m), ((2*r.j+2) % ho.m),
                ((5*r.j+3) % ho.m), ((5*r.j+10) % ho.m)) AS x(t)
              WHERE r.j <> x.t
            ),
            paths(h, j, dist, hops) AS (
              SELECT h, 0, 0, 0 FROM hosts
              UNION
              SELECT e.h, e.b, p.dist + e.w, p.hops + 1
              FROM paths p JOIN e ON e.h = p.h AND e.a = p.j
              WHERE p.hops < 15
            ),
            best AS (SELECT h, j, MIN(dist) AS d FROM paths GROUP BY 1, 2)
            SELECT hn.hn || '//p' || r.j || '.html' AS doc_id,
                   CAST(COALESCE(b.d, -1) AS BIGINT) AS dist
            FROM reach r
            JOIN hostname hn ON hn.h = r.h
            LEFT JOIN best b ON b.h = r.h AND b.j = r.j
        """,
        # 2D skyline (Pareto frontier): min price, max size, one
        # strict — the NOT EXISTS dominance shape; integer cents keep
        # the frontier membership exact
        "part_skyline": """
            WITH p AS (
              SELECT p_partkey,
                     CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
                     CAST(p_size AS BIGINT) AS p_size
              FROM part
            )
            SELECT p_partkey, price_c, p_size FROM p a
            WHERE NOT EXISTS (
              SELECT 1 FROM p b
              WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
                AND (b.price_c < a.price_c OR b.p_size > a.p_size)
            )
        """,
        # growth accounting: per-day distinct actives split into
        # first-ever-day (new) vs returning, plus the cumulative
        # distinct user count (= running sum of new); day arithmetic
        # is the shared truncating epoch-us // 86400000000 idiom
        "events_new_vs_returning": """
            WITH du AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ),
            f AS (SELECT user_id, MIN(day) AS d0 FROM du GROUP BY 1),
            d AS (
              SELECT day,
                     CAST(COUNT(*) AS BIGINT) AS active_users,
                     CAST(COUNT(*) FILTER (WHERE day = d0) AS BIGINT)
                       AS new_users
              FROM du JOIN f USING (user_id) GROUP BY day
            )
            SELECT day, active_users, new_users,
                   active_users - new_users AS returning_users,
                   CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT)
                     AS cum_users
            FROM d
        """,
        # sliding-window DISTINCT: for every calendar day, distinct
        # users active in [day-6, day]; gap days report 0 via the
        # LEFT JOIN (COUNT DISTINCT over NULLs)
        "events_trailing_7d_users": """
            WITH du AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ),
            days AS (
              SELECT UNNEST(generate_series(
                       (SELECT MIN(day) FROM du),
                       (SELECT MAX(day) FROM du))) AS day
            )
            SELECT d.day,
                   CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users
            FROM days d
            LEFT JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day
        """,
        # inverted index: every distinct lowercased whitespace term
        # with document frequency and the first 20 doc_ids ascending
        # as a comma-joined postings string (cap mirrors
        # textops.INVIDX_POSTINGS_CAP)
        "docs_inverted_index": r"""
            WITH t AS (
              SELECT doc_id,
                     UNNEST(regexp_split_to_array(lower(text), '\s+'))
                       AS term
              FROM documents
            ),
            p2 AS (
              SELECT DISTINCT term, doc_id FROM t WHERE term <> ''
            ),
            dfc AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM p2 GROUP BY term
            ),
            ranked AS (
              SELECT term, doc_id,
                     row_number() OVER (
                       PARTITION BY term ORDER BY doc_id) AS rn
              FROM p2
            ),
            posts AS (
              SELECT term,
                     string_agg(CAST(doc_id AS VARCHAR), ','
                                ORDER BY doc_id) AS postings
              FROM ranked WHERE rn <= 20 GROUP BY term
            )
            SELECT term, df, postings FROM dfc JOIN posts USING (term)
        """,
        # string-similarity self-join: every name pair at Levenshtein
        # distance ≤ 1 — the oracle runs the O(n²) cross join the
        # engine's deletion-neighborhood blocking avoids
        "customer_editdist_pairs": """
            SELECT a.c_custkey AS a_custkey, b.c_custkey AS b_custkey,
                   CAST(levenshtein(a.c_name, b.c_name) AS BIGINT)
                     AS dist
            FROM customer a JOIN customer b
              ON a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        """,
        # entity resolution: connected components of the ed<=1 match
        # graph, canonical = min custkey — the near-dup-closure CTE
        # shape over levenshtein pairs
        "customer_entity_clusters": """
            WITH RECURSIVE pairs AS (
              SELECT a.c_custkey AS u, b.c_custkey AS v
              FROM customer a JOIN customer b
                ON a.c_custkey < b.c_custkey
              WHERE levenshtein(a.c_name, b.c_name) <= 1
            ),
            edges AS (
              SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
            ),
            reach(id, r) AS (
              SELECT c_custkey, c_custkey FROM customer
              UNION
              SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id
            )
            SELECT CAST(id AS BIGINT) AS c_custkey,
                   CAST(MIN(r) AS BIGINT) AS canon_key
            FROM reach GROUP BY id
        """,
        # winsorized sum: values clipped to exact per-type
        # quantile_disc [P5, P95] before summing — integer cents keep
        # both the bounds and the clipped sum hash-exact
        "events_value_winsorized": """
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ),
            q AS (
              SELECT event_type,
                     CAST(quantile_disc(v, 0.05) AS BIGINT) AS lo,
                     CAST(quantile_disc(v, 0.95) AS BIGINT) AS hi,
                     CAST(count(*) AS BIGINT) AS n
              FROM c GROUP BY 1
            )
            SELECT q.event_type, q.n,
                   q.lo AS p05_cents, q.hi AS p95_cents,
                   CAST(SUM(LEAST(GREATEST(c.v, q.lo), q.hi)) AS BIGINT)
                     AS sum_wins_c
            FROM c JOIN q USING (event_type)
            GROUP BY 1, 2, 3, 4
        """,
        # text-format round-trips: the oracle is the identity select —
        # the Ray side must return documents EXACTLY after the full
        # distributed write+read cycle
        "docs_jsonl_roundtrip": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
        """,
        "docs_csv_roundtrip": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
        """,
        # TFRecord framing round-trip: same identity-oracle idiom
        "docs_tfrecord_roundtrip": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
        """,
        "docs_arrow_roundtrip": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
        """,
        # WebDataset tar-shard round-trip: same identity-oracle idiom
        "docs_webdataset_roundtrip": """
            SELECT doc_id, text, lang FROM documents
        """,
        # the EXTRACTED TRAINING TEXT of every crawled page: the
        # synthetic renderer's visible text (title + 3 filler
        # paragraphs + 4 anchor texts, tag-stripped,
        # whitespace-collapsed) regenerated string-for-string from the
        # reach closure — any splice/ordering/rewrite defect in the
        # crawl OR the extractor breaks the hash (sixteenth session;
        # the spans-vs-body cross-representation pin remains in tests)
        "crawl_text_extract": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            t AS (
              SELECT hn.hn || '//p' || r.j || '.html' AS doc_id,
                     'h' || r.h || ' p' || r.j
                     || ' host ' || r.h || ' doc ' || r.j
                     || ' paragraph 0 — deterministic filler text '
                     || ((r.j * 2654435761) % 100000)
                     || ' host ' || r.h || ' doc ' || r.j
                     || ' paragraph 1 — deterministic filler text '
                     || ((r.j * 2654435761 + 1) % 100000)
                     || ' host ' || r.h || ' doc ' || r.j
                     || ' paragraph 2 — deterministic filler text '
                     || ((r.j * 2654435761 + 2) % 100000)
                     || ' link p' || ((2*r.j+1) % ho.m)
                     || '.html link p' || ((2*r.j+2) % ho.m)
                     || '.html link p' || ((5*r.j+3) % ho.m)
                     || '.html link p' || ((5*r.j+10) % ho.m) || '.html'
                       AS text
              FROM reach r
              JOIN hostname hn ON hn.h = r.h
              JOIN hosts ho ON ho.h = r.h
            )
            SELECT doc_id, CAST(6 AS BIGINT) AS n_text_spans,
                   CAST(length(text) AS BIGINT) AS n_chars, text
            FROM t
        """,
        # adaptive-revisit change rates over the v1→v2 recrawl pair:
        # the crawl_diff closures extended with the Laplace-smoothed
        # rate arithmetic — a page's body changes iff its link-target
        # sequence (the sig CTE) moves under the grown m; asset bodies
        # are constant so assets never change; host-7 / new-page urls
        # have no adjacent snapshot pair (sixteenth session)
        "crawl_revisit_plan": rf"""
            WITH RECURSIVE
            {_reach_cte('_a', '(SELECT count(*) FROM documents)')},
            {_reach_cte('_b', '(SELECT count(*) FROM documents) + (SELECT count(*) FROM documents) // 4', n_hosts=7)},
            {_sig_cte('_a')},
            {_sig_cte('_b')},
            pages AS (
              SELECT coalesce(a.url, b.url) AS url,
                     CASE WHEN a.url IS NOT NULL AND b.url IS NOT NULL
                          THEN 1 ELSE 0 END AS intervals,
                     CASE WHEN a.url IS NOT NULL AND b.url IS NOT NULL
                               AND a.sig <> b.sig
                          THEN 1 ELSE 0 END AS changes
              FROM (SELECT 'http://' || replace(doc_id, '//', '/') AS url,
                           sig FROM sig_a) a
              FULL OUTER JOIN
                   (SELECT 'http://' || replace(doc_id, '//', '/') AS url,
                           sig FROM sig_b) b
              ON a.url = b.url
            ),
            assets_a AS (
              SELECT DISTINCT 'http://' || hn.hn || '/img'
                       || ((13*r.j+7) % ho.n_assets) || '.jpg' AS url
              FROM reach_a r
              JOIN hostname_a hn ON hn.h = r.h
              JOIN hosts_a ho ON ho.h = r.h
            ),
            assets_b AS (
              SELECT DISTINCT 'http://' || hn.hn || '/img'
                       || ((13*r.j+7) % ho.n_assets) || '.jpg' AS url
              FROM reach_b r
              JOIN hostname_b hn ON hn.h = r.h
              JOIN hosts_b ho ON ho.h = r.h
            ),
            assets AS (
              SELECT coalesce(a.url, b.url) AS url,
                     CASE WHEN a.url IS NOT NULL AND b.url IS NOT NULL
                          THEN 1 ELSE 0 END AS intervals,
                     0 AS changes
              FROM assets_a a FULL OUTER JOIN assets_b b ON a.url = b.url
            ),
            everything AS (
              SELECT * FROM pages UNION ALL SELECT * FROM assets
            )
            SELECT url, CAST(changes AS BIGINT) AS changes,
                   CAST(intervals AS BIGINT) AS intervals,
                   CAST((changes + 1) * 1000000 // (intervals + 2)
                        AS BIGINT) AS rate_micro
            FROM everything
        """,
        # per-asset media features: every downloaded asset shares the
        # ONE synthetic body, so the feature row is a closed-form
        # constant per doc_id — the 90-byte pseudo-JPEG's deterministic
        # fake-decode raster (88×95×3) and its feature fingerprint.
        # Pins that the actor-pool decode stage is byte-deterministic
        # and covers exactly the downloaded-asset set
        "crawl_media_features": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE}
            SELECT DISTINCT hn.hn || '//img' || ((13*r.j+7) % ho.n_assets)
                     || '.jpg' AS doc_id,
                   CAST(88 AS BIGINT) AS width,
                   CAST(95 AS BIGINT) AS height,
                   CAST(3 AS BIGINT) AS channels,
                   'jpeg' AS format,
                   CAST(90 AS BIGINT) AS n_bytes,
                   CAST(854535263615573671 AS BIGINT) AS feat_fp
            FROM reach r
            JOIN hostname hn ON hn.h = r.h
            JOIN hosts ho ON ho.h = r.h
        """,
        # multimodal sequence packing: the md5('pack:'+doc_id) epoch
        # order and the per-modality token pricing are both
        # SQL-replayable — page cost is the CONSTANT 63 (43 visible
        # words + 16 media + 4 anchor tokens: the synthetic text's
        # word count is j-invariant) and asset cost 16, so the whole
        # distributed bucket-prefix scan reduces to one window
        # cumulative sum (sixteenth session)
        "crawl_pack_multimodal": rf"""
            WITH RECURSIVE
            {_CRAWL_REACH_CTE},
            docs AS (
              SELECT hn.hn || '//p' || r.j || '.html' AS doc_id, 63 AS n
              FROM reach r JOIN hostname hn ON hn.h = r.h
              UNION ALL
              SELECT DISTINCT hn.hn || '//img'
                       || ((13*r.j+7) % ho.n_assets) || '.jpg', 16
              FROM reach r
              JOIN hostname hn ON hn.h = r.h
              JOIN hosts ho ON ho.h = r.h
            ),
            keyed AS (
              SELECT doc_id, n,
                     ('0x' || substr(md5('pack:' || doc_id), 1, 8))::BIGINT
                       AS hkey
              FROM docs
            ),
            packed AS (
              SELECT doc_id, n,
                     COALESCE(SUM(n) OVER (
                       ORDER BY hkey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS off
              FROM keyed
            )
            SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                   CAST(off AS BIGINT) AS start_off,
                   CAST(off // 64 AS BIGINT) AS first_seq,
                   CAST((off + n - 1) // 64 AS BIGINT) AS last_seq
            FROM packed
        """,
        # no oracle (rows-only): embedding_dup_pairs_ivf, ann_ivf_topk,
        # ann_lsh_topk, ann_pq_topk (product-quantization ADC scan with
        # exact re-rank; recall-vs-brute + determinism pins),
        # events_distinct_users_hll, events_top_users_cms,
        # events_user_overlap_theta (KMV set-intersection estimate;
        # error-bound + exact-below-k pins vs events_user_overlap),
        # crawl_pagerank — quantizer-/sketch-/float-based operators
        # DuckDB can't recompute bit for bit. Each is verified another
        # way (tests/test_dedup_pins.py and friends): pinned rows
        # (ivf_topk), global brute-force recall≥0.7 + precision 1.0
        # (embedding ivf, lsh_topk), error-bound asserts (HLL, CMS),
        # numpy-reference allclose (pagerank). Tenth session:
        # docs_compression_ratio (deflate is not SQL; independent
        # zlib reference pin), warc_cdx (offsets depend on block
        # partitioning; random-access byte-equality pin),
        # embeddings_logreg (float GD; numpy-reference allclose +
        # above-majority accuracy pins).
    }
    # the compacted mirror must satisfy the EXACT same recursive-CTE
    # reachability oracle as the uncompacted one — compaction proven
    # lossless by the strongest oracle in the suite
    d["crawl_mirror_compacted"] = d["crawl_mirror"]
    # quality-gate stack: the three gate oracles composed as scoped
    # subqueries — any drift in ANY gate breaks this hash too
    d["docs_quality_report"] = f"""
        SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
               g.keep AS gopher_keep,
               c.keep AS c4_keep,
               (r.flesch_micro >= 50000000) AS readable,
               (g.keep AND c.keep AND r.flesch_micro >= 50000000) AS keep,
               CAST((CASE WHEN g.keep THEN 0 ELSE 1 END)
                  + (CASE WHEN c.keep THEN 0 ELSE 1 END)
                  + (CASE WHEN r.flesch_micro >= 50000000 THEN 0 ELSE 1 END)
                 AS BIGINT) AS n_fail
        FROM ({d['docs_gopher_filter']}) g
        JOIN ({d['docs_c4_filter']}) c ON c.doc_id = g.doc_id
        JOIN ({d['docs_readability']}) r ON r.doc_id = g.doc_id
    """
    return d
