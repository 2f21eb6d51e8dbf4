"""Guards the driver-budget invariant (VERDICT r1 §next-round #6).

The driver's correctness harness oracle-checks only the FIRST
``registry.DRIVER_WINDOW`` registered queries; a careless reorder or a
new module appended early could silently evict an operator family from
the judged window.  These tests pin: the window is exactly ``PRIORITY``,
every operator family contributes at least one query to it, and no
rows-only (oracle-less) query wastes a judged slot (the driver records
those as errors).
"""

from __future__ import annotations

from velib_lakehouse_spark import registry

WINDOW = list(registry.QUERIES)[: registry.DRIVER_WINDOW]

# At least one judged-window query per operator family.  Round-3
# rotation: operators that never had a driver row (round-2 training
# pipeline, round-3 chunking/LM/quantiles/dispersion/session-windows)
# hold window slots; demoted two-rounds-green showcases are listed in
# registry.SECONDARY.  Window/top-n/ordered-agg semantics stay covered
# through velib_sparkline (top-n + ordered collect + semi join);
# dedup-to-latest (velib_dedup_latest) and the remaining velib
# showcases rely on their byte-identical r1+r2 green rows.
FAMILY_REPRESENTATIVES = {
    "velib": ["velib_sparkline"],
    "chunking": ["chunk_documents", "dedup_chunks"],
    "relational": ["tpch_q1_pricing"],
    "windows": ["velib_sparkline", "hypertable_rollup"],
    # asof/range/session showcases all carry >=2 green rows
    # (asof_join_latest_state, range_join_periods, pandas_session_gaps);
    # sessionization semantics stay in-window via
    # streaming_session_windows and event_funnel.
    "dedup": [
        "dedup_embedding_cosine",
        "dedup_incremental_minhash",
        "dedup_containment",
        "dedup_canonicalize",
        "ngram_novelty",
    ],
    "decontamination": ["decontaminate_ngram"],
    "similarity": [
        "ann_ivf_topk",
        "ann_banded_lsh_topk",
        "ann_recall_audit",
        "ann_banded_recall_audit",
        "embedding_centroids",
        "embedding_quantize_int8",
        "embedding_outliers",
    ],
    "retrieval": ["hybrid_rank_fusion", "inverted_index"],
    "text": [
        "repetition_stats",
        "gopher_quality_filter",
        "tfidf_top_terms",
        "bm25_rank",
        "vocab_coverage",
        "unigram_logprob_score",
        "lang_consistency_audit",
        "corpus_quality_report",
        "quality_classifier_score",
        "zipf_slope_audit",
        "bpe_merge_step",
    ],
    "curation": [
        "stratified_split",
        "corpus_composition",
        "corpus_mix_temperature",
        "corpus_mix_apply",
        "split_leakage_audit",
        "source_drift_ks",
        "length_quantiles_by_source",
    ],
    "training": [
        "pack_sequences",
        "export_shuffled_shards",
        "dsir_importance_weights",
    ],
    # the Arrow/pandas boundary is in-window via multimodal_frame_sample
    # (mapInPandas); pandas_session_gaps carries r1+r2 green rows.
    "multimodal": ["multimodal_frame_sample"],
    "events": ["event_funnel", "retention_cohorts"],
    "graph": ["pagerank_user_graph"],
    # rollups (hypertable_rollup, scd2_merge) rotated out entirely in
    # the sixth rotation: both reps carry r1+r2 green rows with
    # unchanged code, the same basis the demoted velib showcases use.
    "streaming": [
        "streaming_stateful_enumerate",
        "streaming_session_windows",
        "streaming_join_click_purchase",
    ],
    "lake": [
        "lake_zorder_layout",
    ],
}


def test_window_is_exactly_priority():
    assert len(registry.PRIORITY) == registry.DRIVER_WINDOW
    assert WINDOW == list(registry.PRIORITY)


def test_every_family_inside_window():
    for family, names in FAMILY_REPRESENTATIVES.items():
        present = [n for n in names if n in WINDOW]
        assert present, f"family {family} has no query in the driver window"


def test_all_family_representatives_registered():
    for names in FAMILY_REPRESENTATIVES.values():
        for n in names:
            assert n in registry.QUERIES, f"{n} not registered"


def test_no_oracle_less_query_in_window():
    missing = [n for n in WINDOW if registry.ORACLE.get(n) is None]
    assert not missing, f"oracle-less queries waste judged slots: {missing}"


def test_window_outputs_are_driver_hashable(spark):
    """Round-1 regression: the driver canonicalizes results with pandas
    ``sort_values``, which raises ``TypeError: unhashable type`` on
    array/map cells.  Every judged-window query must therefore emit only
    scalar columns (arrays are serialized with to_json/concat_ws before
    they leave the query)."""
    from tests.conftest import SF_DIR

    bad: list[str] = []
    for name in WINDOW:
        df = registry.QUERIES[name](spark, SF_DIR)
        for col, dtype in df.dtypes:
            if dtype.startswith(("array", "map", "struct")):
                bad.append(f"{name}.{col}: {dtype}")
    assert not bad, "non-scalar columns in driver window: " + "; ".join(bad)


def test_every_registered_query_has_oracle_entry_key():
    # ORACLE may be None (rows-only) but the key must exist so the
    # omission is deliberate, not a typo.
    assert set(registry.ORACLE) == set(registry.QUERIES)
