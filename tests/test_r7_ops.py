"""Golden-behavior tests for the round-7 operators: properties the
oracle-parity sweep can't see (brute-force percentile semantics behind
the merged sketch, the priority-sampling estimator recomputed in plain
Python, Hamming-rank invariants, the cross-partition replay scenario
actually colliding)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from velib_lakehouse_spark import registry
from velib_lakehouse_spark.catalog import load_table
from tests.conftest import SF_DIR


# ---- quantile_sketch_merge_rollup -------------------------------------------


def test_qmr_merge_flag_and_guarantees(spark):
    rows = registry.QUERIES["quantile_sketch_merge_rollup"](
        spark, SF_DIR
    ).collect()
    from velib_lakehouse_spark.operators.sketches import QMR_QS

    prios = {r["prio"] for r in rows}
    assert len(rows) == len(prios) * len(QMR_QS)
    for r in rows:
        # additive merge must be bit-identical to the direct build
        assert r["merge_matches_direct"] == 1
        # histogram estimate guarantees: one-sided, within one bin
        assert r["one_sided"] is True
        assert r["within_bin"] is True
        assert r["err_cents"] == r["est_cents"] - r["exact_cents"]


def test_qmr_exact_side_matches_bruteforce(spark):
    """The audited exact percentile must be the true rank-th smallest
    price per priority (percentile_disc semantics), recomputed by a
    plain sort."""
    o = load_table(spark, SF_DIR, "orders")
    by_prio: dict[str, list[int]] = {}
    for r in o.select(
        F.col("o_orderpriority").alias("prio"),
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("p"),
    ).collect():
        by_prio.setdefault(r["prio"], []).append(r["p"])
    for vals in by_prio.values():
        vals.sort()
    rows = registry.QUERIES["quantile_sketch_merge_rollup"](
        spark, SF_DIR
    ).collect()
    for r in rows:
        vals = by_prio[r["prio"]]
        target = (r["q"] * len(vals) + 99) // 100
        assert r["n_rows"] == len(vals)
        assert r["target_rank"] == target
        assert r["exact_cents"] == vals[target - 1]


# ---- priority_sample_subset_sum ---------------------------------------------


def _bruteforce_priority_sample(docs):
    """Plain-Python recomputation of the DLT estimator: docs is a list
    of (doc_id, lang, n_chars) with n_chars > 0."""
    import math

    from velib_lakehouse_spark.operators.curation import _PS_U_MOD, PS_K

    scored = []
    for doc_id, lang, w in docs:
        h = int(
            hashlib.md5(f"ps|{doc_id}".encode()).hexdigest()[:15], 16
        )
        u = (h % _PS_U_MOD + 1) / _PS_U_MOD
        prio_milli = math.floor(w / u * 1000)
        scored.append((prio_milli, doc_id, lang, w))
    scored.sort(key=lambda t: (-t[0], t[1]))
    frame = scored[: PS_K + 1]
    tau = frame[-1][0] if len(frame) == PS_K + 1 else 0
    sample = frame[:PS_K]
    est: dict[str, tuple[int, int]] = {}
    for prio, _doc, lang, w in sample:
        n, s = est.get(lang, (0, 0))
        est[lang] = (n + 1, s + max(w * 1000, tau))
    return est


def test_priority_sample_matches_bruteforce(spark):
    d = load_table(spark, SF_DIR, "documents").filter(F.col("n_chars") > 0)
    docs = [
        (r["doc_id"], r["lang"], r["n_chars"])
        for r in d.select("doc_id", "lang", "n_chars").collect()
    ]
    est = _bruteforce_priority_sample(docs)
    exact: dict[str, tuple[int, int]] = {}
    for _doc, lang, w in docs:
        n, s = exact.get(lang, (0, 0))
        exact[lang] = (n + 1, s + w)
    got = {
        r["lang"]: r
        for r in registry.QUERIES["priority_sample_subset_sum"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(exact)
    for lang, (n_docs, total) in exact.items():
        r = got[lang]
        assert r["n_docs"] == n_docs
        assert r["exact_total_chars"] == total
        n_sampled, est_milli = est.get(lang, (0, 0))
        assert r["n_sampled"] == n_sampled
        assert r["est_total_chars"] == est_milli // 1000
    # the fixture must exercise the REAL estimator (corpus > K so tau
    # is live and at least one language is only partially sampled)
    from velib_lakehouse_spark.operators.curation import PS_K

    assert len(docs) > PS_K + 1
    assert any(got[l]["n_sampled"] < got[l]["n_docs"] for l in got)


def test_priority_sample_small_corpus_is_exact(spark, tmp_path):
    """Boundary case: corpus <= K docs -> the whole corpus is the
    sample, tau = 0, every per-language estimate is EXACT."""
    from velib_lakehouse_spark.catalog import TABLES

    out = str(tmp_path / "small")
    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(0).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    d = load_table(spark, SF_DIR, "documents").limit(20)
    d.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    spark.catalog.clearCache()
    rows = registry.QUERIES["priority_sample_subset_sum"](
        spark, out
    ).collect()
    assert rows
    for r in rows:
        assert r["n_sampled"] == r["n_docs"]
        assert r["est_total_chars"] == r["exact_total_chars"]
        assert r["err_ppm"] == 0


# ---- srp_hamming_topk_audit -------------------------------------------------


def test_srp_hamming_rank_invariants(spark):
    from velib_lakehouse_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    rows = registry.QUERIES["srp_hamming_topk_audit"](
        spark, SF_DIR
    ).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["q_vec_id"], []).append(r)
    assert set(by_q) <= set(range(N_QUERIES))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        # hamming non-decreasing along the ranking; ties break on vec_id
        for a, b in zip(rs, rs[1:]):
            assert (a["hamming"], a["vec_id"]) < (b["hamming"], b["vec_id"])
        for r in rs:
            assert 0 <= r["hamming"] <= 16
            assert r["in_exact_topk"] in (0, 1)


def test_srp_hamming_matches_signature_xor(spark):
    """Recompute the Hamming distances from the signature table
    directly: popcount(sig XOR q_sig) for every returned pair."""
    from velib_lakehouse_spark.operators.similarity import (
        _bucket_expr,
        _vectors,
    )

    sigs = {
        r["vec_id"]: r["sig"]
        for r in _vectors(spark, SF_DIR)
        .select("vec_id", F.expr(_bucket_expr("v")).alias("sig"))
        .collect()
    }
    rows = registry.QUERIES["srp_hamming_topk_audit"](
        spark, SF_DIR
    ).collect()
    for r in rows:
        expect = bin(sigs[r["vec_id"]] ^ sigs[r["q_vec_id"]]).count("1")
        assert r["hamming"] == expect


def test_srp_hamming_recall_is_nondegenerate(spark):
    """The sketch-only ranking must actually find exact neighbours on
    the fixture (a 0-recall index would pass every rank invariant)."""
    rows = registry.QUERIES["srp_hamming_topk_audit"](
        spark, SF_DIR
    ).collect()
    assert sum(r["in_exact_topk"] for r in rows) > 0


# ---- backfill_dedup_reconcile -----------------------------------------------


def test_backfill_dedup_scenario_is_nondegenerate(spark):
    """The composition only proves something if (a) the late batch is
    non-empty, (b) replays exist, and (c) the replays' arrival dates
    actually differ from their canonical dates (cross-partition
    collision is real, not hypothetical)."""
    from velib_lakehouse_spark.sources.lake import (
        BF2_LATE_MOD,
        BF2_LATE_REM,
        BF2_REPLAY_MOD,
        BF2_REPLAY_REM,
    )

    ev = load_table(spark, SF_DIR, "events")
    missing = ev.filter(F.col("event_id") % BF2_LATE_MOD == BF2_LATE_REM)
    replays = ev.filter(
        F.col("event_id") % BF2_REPLAY_MOD == BF2_REPLAY_REM
    )
    n_missing, n_replays = missing.count(), replays.count()
    assert n_missing > 0 and n_replays > 0
    # replays overlap silver (they are NOT all in the missing class)
    overlap = replays.filter(
        F.col("event_id") % BF2_LATE_MOD != BF2_LATE_REM
    ).count()
    assert overlap > 0
    # shifted arrival date != canonical date for every replay (date+1)
    shifted = replays.select(
        F.to_date("ts").alias("d"),
        F.date_add(F.to_date("ts"), 1).alias("a"),
    ).filter(F.col("d") == F.col("a"))
    assert shifted.count() == 0


def test_backfill_dedup_reconstructs_and_counts_late_sources(spark):
    from velib_lakehouse_spark.sources.lake import (
        BF2_LATE_MOD,
        BF2_LATE_REM,
        BF2_REPLAY_MOD,
        BF2_REPLAY_REM,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id",
        F.to_date("ts").cast("string").alias("date"),
        F.expr("cast(round(value * 100) as bigint)").alias("v"),
    )
    src = {
        r["date"]: (r["n"], r["s"], r["late"])
        for r in ev.groupBy("date")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(
                (
                    (F.col("event_id") % BF2_LATE_MOD == BF2_LATE_REM)
                    | (F.col("event_id") % BF2_REPLAY_MOD == BF2_REPLAY_REM)
                ).cast("bigint")
            ).alias("late"),
        )
        .collect()
    }
    got = {
        r["date"]: r
        for r in registry.QUERIES["backfill_dedup_reconcile"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(src)
    for date, (n, s, late) in src.items():
        r = got[date]
        assert r["n_events"] == n, f"count mismatch on {date}"
        assert r["checksum_centi"] == s, f"checksum mismatch on {date}"
        assert r["n_late_sourced"] == late, f"late-source mismatch on {date}"
