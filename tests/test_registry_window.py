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

# At least one judged-window query per operator family.
FAMILY_REPRESENTATIVES = {
    "velib": ["velib_silver_parse", "velib_sparkline", "velib_alerts"],
    "relational": ["tpch_q1_pricing", "join_broadcast_chain"],
    "windows": ["topn_orders_per_customer", "collect_ordered_quantities"],
    "asof_range_session": [
        "asof_join_latest_state",
        "range_join_periods",
        "sessionize_events",
    ],
    "dedup": [
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_minhash_lsh",
        "simhash_sketch",
        "dedup_embedding_cosine",
    ],
    "similarity": ["ann_cosine_topk", "ann_lsh_topk"],
    "text": ["text_stats", "lang_id_heuristic", "token_count", "doc_fingerprint"],
    "curation": ["deterministic_sample", "text_clean_redact", "quality_topk_mix"],
    "pandas": ["pandas_text_features", "pandas_session_gaps"],
    "multimodal": ["multimodal_decode_meta", "multimodal_frame_sample"],
    "rollups": ["hypertable_rollup", "scd2_merge"],
    "streaming": [
        "kafka_shaped_roundtrip",
        "streaming_silver_availablenow",
        "streaming_gold_foreachbatch",
        "streaming_windowed_counts",
        "streaming_dedup",
    ],
    "lake": ["json_file_scan", "lake_partition_pruned", "lake_gold_snapshot"],
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
