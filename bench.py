#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs on ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is fully materialized through the ``noop`` sink so every
column is computed (a bare ``count()`` would let Catalyst prune the
aggregates being measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from velib_lakehouse_spark import registry
from velib_lakehouse_spark.session import get_spark

HEADLINE = [
    "tpch_q1_pricing",
    "join_shuffle_revenue",
    "join_broadcast_chain",
    "join_left_order_counts",
    "topn_orders_per_customer",
    "window_running_totals",
    "velib_history_enrich",
    "velib_sparkline",
    "velib_alerts",
    "collect_ordered_quantities",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "text_stats",
    "simhash_sketch",
    "dedup_exact",
    "sessionize_events",
    "asof_join_latest_state",
    "hypertable_rollup",
    "scd2_merge",
    "pandas_session_gaps",
    "decontaminate_ngram",
    "dedup_incremental_minhash",
    "repetition_stats",
    "pack_sequences",
    "export_shuffled_shards",
    "gopher_quality_filter",
    "tfidf_top_terms",
    "bm25_rank",
    "vocab_coverage",
    "embedding_centroids",
    "unigram_logprob_score",
    "lake_zorder_layout",
    "corpus_quality_report",
    "source_drift_ks",
    "embedding_quantize_int8",
    "dedup_containment",
    "streaming_stateful_enumerate",
    "streaming_silver_availablenow",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="velib-lakehouse-bench")

    # Warm the JVM/codegen paths and the OS page cache for the input
    # files (steady-state reads are what's being measured, not first-touch
    # disk IO).
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        # full-column noop write: actually pulls the data pages (count()
        # would satisfy itself from parquet footers)
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
