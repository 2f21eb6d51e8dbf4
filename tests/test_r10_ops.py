"""Golden-behavior tests for the round-10 operators: properties the
oracle-parity sweep can't see — the tf-idf-ranked capped ICWS consumer
contract (rank order, agreement with the full audit, replication
invariance), the transactional streaming sink's exactly-once-through-
the-log guarantee under kill/restart and concurrent batch writers, and
the transactional OPTIMIZE interleaves (Delta's OPTIMIZE-vs-delete
taxonomy)."""

from __future__ import annotations

import collections
import os
import tempfile

from pyspark.sql import functions as F

from velib_lakehouse_spark import registry
from velib_lakehouse_spark.catalog import load_table
from tests.conftest import SF_DIR

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _corpus_dir(spark, corpus, tmp: str) -> str:
    corpus.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        os.symlink(f"{SF_DIR}/{t}.parquet", os.path.join(tmp, f"{t}.parquet"))
    return tmp


# ---- dedup_icws_capped -------------------------------------------------------


def test_icws_capped_rank_contract(spark):
    """Per-anchor output bounded at WMH_PAIR_TOPK, ranks contiguous
    from 1, ordered by the tf-idf wjaccard (then estimate, then
    neighbor id)."""
    from velib_lakehouse_spark.operators.dedup import WMH_PAIR_TOPK

    rows = registry.QUERIES["dedup_icws_capped"](spark, SF_DIR).collect()
    assert rows
    per_anchor = collections.Counter(r["anchor"] for r in rows)
    assert max(per_anchor.values()) <= WMH_PAIR_TOPK
    by_anchor = collections.defaultdict(list)
    for r in rows:
        by_anchor[r["anchor"]].append(r)
    for anchor, rs in by_anchor.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["wjaccard_ppm"], -r["est_ppm"], r["neighbor"]) for r in rs]
        assert keys == sorted(keys)


def test_icws_capped_ranks_by_the_icws_metric(spark):
    """Every capped row's metrics must match the FULL ICWS audit's row
    for the same rep pair — the op consumes `_icws_rep_pairs` (tf-idf
    fixed-point weights), not the integer-weight `_wmh_rep_pairs` the
    r9 capped op ranks by (the gap the r9 VERDICT flagged)."""
    full = {}
    for r in registry.QUERIES["dedup_icws_weighted_minhash"](
        spark, SF_DIR
    ).collect():
        full[(r["doc_a"], r["doc_b"])] = (
            r["n_bands"], r["est_ppm"], r["wjaccard_ppm"]
        )
    capped = registry.QUERIES["dedup_icws_capped"](spark, SF_DIR).collect()
    non_reflexive = [r for r in capped if r["anchor"] != r["neighbor"]]
    assert non_reflexive, "need near-dup candidates to check against"
    for r in non_reflexive:
        key = (min(r["anchor"], r["neighbor"]), max(r["anchor"], r["neighbor"]))
        assert full[key] == (r["n_bands"], r["est_ppm"], r["wjaccard_ppm"])


def test_icws_capped_output_rep_granular_under_replication(spark):
    """4-deep exact-dup replication: each dup group is ONE reflexive
    row carrying the group size; anchors stay at rep cardinality (the
    scale-invariant output contract the SCALE.md sweep measures)."""
    from velib_lakehouse_spark.operators.dedup import dedup_icws_capped

    d = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 30)
    corpus = d
    for i in (1, 2, 3):
        corpus = corpus.unionByName(
            d.select(
                (F.col("doc_id") + 100000 * i).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
    with tempfile.TemporaryDirectory() as tmp:
        rows = dedup_icws_capped(
            spark, _corpus_dir(spark, corpus, tmp)
        ).collect()
    reflexive = [r for r in rows if r["anchor"] == r["neighbor"]]
    assert reflexive, "dup groups must surface as reflexive rows"
    for r in reflexive:
        assert r["n_a"] == r["n_b"] == 4
        assert r["est_ppm"] == r["wjaccard_ppm"] == 1_000_000
        assert r["rnk"] == 1
    assert len({r["anchor"] for r in rows}) <= 30


# ---- streaming_txn_sink / commit_stream_batch --------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )


def test_commit_stream_batch_idempotent_replay(spark, tmp_path):
    """Replaying a committed batch id commits NOTHING; later batches
    proceed; the table holds each batch exactly once."""
    from velib_lakehouse_spark.sources import snapshots as snap

    table = str(tmp_path / "t")
    schema = "event_id bigint, event_type string, value double"
    b0 = _ev(spark, [(1, "click", 1.0), (2, "view", 2.0)])
    b1 = _ev(spark, [(3, "click", 3.0)])

    e0 = snap.commit_stream_batch(table, "app", 0, b0, "event_type")
    assert e0 is not None and e0["stream_txn"] == {"app_id": "app", "batch_id": 0}
    assert snap.commit_stream_batch(table, "app", 0, b0, "event_type") is None
    assert snap.last_txn_batch(table, "app") == 0
    assert snap.commit_stream_batch(table, "app", 1, b1, "event_type") is not None
    # replaying batch 0 again AFTER batch 1 is still dropped
    assert snap.commit_stream_batch(table, "app", 0, b0, "event_type") is None
    got = {r.event_id for r in snap.read_table(spark, table, schema).collect()}
    assert got == {1, 2, 3}
    # a different app has an independent watermark
    assert snap.last_txn_batch(table, "other") == -1


def test_txn_watermark_survives_checkpoint_retention(spark, tmp_path):
    """Log checkpoints fold the per-app high-water mark forward: after
    vacuum_log retires the commits that carried stream_txn actions, a
    replayed batch id is STILL dropped (a reopened idempotence window
    would double-append after restart-past-retention)."""
    from velib_lakehouse_spark.sources import snapshots as snap

    table = str(tmp_path / "t")
    schema = "event_id bigint, event_type string, value double"
    snap.commit_stream_batch(table, "app", 0, _ev(spark, [(1, "click", 1.0)]),
                             "event_type")
    snap.commit_stream_batch(table, "app", 1, _ev(spark, [(2, "view", 2.0)]),
                             "event_type")
    snap.write_log_checkpoint(table)
    assert snap.vacuum_log(table) == 2
    assert snap.read_commits(table) == []  # the carrying commits are gone
    assert snap.last_txn_batch(table, "app") == 1
    assert snap.commit_stream_batch(
        table, "app", 1, _ev(spark, [(2, "view", 2.0)]), "event_type"
    ) is None
    assert snap.commit_stream_batch(
        table, "app", 2, _ev(spark, [(3, "click", 3.0)]), "event_type"
    ) is not None
    got = {r.event_id for r in snap.read_table(spark, table, schema).collect()}
    assert got == {1, 2, 3}


def test_stream_append_vs_batch_delete_conflict(spark, tmp_path):
    """A batch deleter staged BEFORE stream micro-batches landed in its
    domain detects ConcurrentAppend against the stream's commits,
    re-stages from the fresh snapshot, and its retry deletes the
    streamed rows too — the stream/batch shared-table story the raw
    parquet sink cannot tell."""
    from velib_lakehouse_spark.sources import snapshots as snap

    table = str(tmp_path / "t")
    schema = "event_id bigint, event_type string, value double"
    snap.commit_stream_batch(table, "app", 0,
                             _ev(spark, [(1, "click", 1.0), (2, "view", 2.0)]),
                             "event_type")

    calls = {"n": 0}

    def stage_delete(rv):
        calls["n"] += 1
        cur = snap.read_table(spark, table, schema, version=rv,
                              domain={"click"})
        kept = cur.filter("event_id < 0")  # delete every click row
        adds = snap.stage_partition_files(
            kept, table, f"del{calls['n']}", "event_type"
        )
        removes = [f for f in snap.live_files(table, rv) if f[1] == "click"]
        return adds, removes

    d_read = snap.table_head(table)
    d_pre = stage_delete(d_read)
    # stream batches land while the deleter is stalled: one in the
    # deleter's domain, one disjoint
    snap.commit_stream_batch(table, "app", 1, _ev(spark, [(3, "click", 3.0)]),
                             "event_type")
    snap.commit_stream_batch(table, "app", 2, _ev(spark, [(4, "view", 4.0)]),
                             "event_type")
    entry = snap.optimistic_commit(
        table, "delete", {"click"}, "deleter", stage_delete,
        prestaged=(d_read, *d_pre),
    )
    assert entry["attempt"] == 2
    assert entry["conflicts"][0]["kind"] == "ConcurrentAppend"
    assert calls["n"] == 2  # the retry re-read the fresh snapshot
    got = {r.event_id for r in snap.read_table(spark, table, schema).collect()}
    assert got == {2, 4}  # clicks gone (including the streamed 3), views kept


# ---- bpe_train_merges_batched -------------------------------------------------


def _doc_corpus(spark, texts):
    rows = [
        (i, t, "en", "test", len(t)) for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_bpe_batched_equals_sequential_on_disjoint_tops(spark):
    """Where the top pairs are symbol-disjoint with distinct counts,
    one batched round selects exactly the merges the sequential loop
    learns one job at a time — same pairs, same counts, same order."""
    from velib_lakehouse_spark.operators.text import (
        bpe_train_merges,
        bpe_train_merges_batched,
    )

    corpus = _doc_corpus(
        spark, ["ab " * 8 + "cd " * 4 + "ef " * 2]
    )
    with tempfile.TemporaryDirectory() as tmp:
        sf = _corpus_dir(spark, corpus, tmp)
        seq = bpe_train_merges(spark, sf).orderBy("merge_rank").collect()
        bat = bpe_train_merges_batched(spark, sf).orderBy(
            "merge_rank"
        ).collect()
    key = lambda r: (r["left_sym"], r["right_sym"], r["merged"],
                     r["pair_count"])
    assert [key(r) for r in seq] == [key(r) for r in bat] == [
        ("a", "b", "ab", 8), ("c", "d", "cd", 4), ("e", "f", "ef", 2)
    ]
    # and the batched trainer learned all three in ONE round
    assert [(r["round"], r["slot"]) for r in bat] == [(1, 1), (1, 2), (1, 3)]


def test_bpe_batched_per_symbol_argmax_selection(spark):
    """The dominance rule, pinned: with pairs (a,b):8 > (b,c):7 >
    (c,d):6, round 1 selects ONLY (a,b) — (b,c) loses symbol b to the
    higher-ranked (a,b), and (c,d) loses symbol c to the higher-ranked
    (b,c) EVEN THOUGH (b,c) itself was not selected (stricter than the
    greedy accepted-set scan, by design — see the module comment)."""
    from velib_lakehouse_spark.operators.text import bpe_train_merges_batched

    corpus = _doc_corpus(spark, ["ab " * 8 + "bc " * 7 + "cd " * 6])
    with tempfile.TemporaryDirectory() as tmp:
        rows = bpe_train_merges_batched(
            spark, _corpus_dir(spark, corpus, tmp)
        ).orderBy("merge_rank").collect()
    got = [(r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
           for r in rows]
    assert got == [(1, "a", "b", 8), (2, "b", "c", 7), (3, "c", "d", 6)]


def test_bpe_batched_round_merges_are_symbol_disjoint(spark):
    """Within any round on real data, no two selected merges share a
    symbol (the invariant that makes the chained replace a faithful
    batch application)."""
    from velib_lakehouse_spark.operators.text import bpe_train_merges_batched

    rows = bpe_train_merges_batched(spark, SF_DIR).collect()
    assert rows
    by_round = collections.defaultdict(list)
    for r in rows:
        by_round[r["round"]].append((r["left_sym"], r["right_sym"]))
    for rnd, pairs in by_round.items():
        syms = [s for p in pairs for s in p]
        assert len(syms) == len(set(syms)), (rnd, pairs)


def test_txn_sink_registered_query_exactly_once(spark):
    """The registered interleave end-to-end at sf0.001: the injected
    mid-drain crash plus restart must not double-count any event (the
    in-query asserts pin commit count and replay count; this pins the
    aggregate against a batch recompute)."""
    from velib_lakehouse_spark.catalog import load_table as lt

    out = {
        r["event_type"]: (r["n_events"], r["id_sum"])
        for r in registry.QUERIES["streaming_txn_sink"](
            spark, SF_DIR
        ).collect()
    }
    expect = {
        r["event_type"]: (r["n"], r["s"])
        for r in lt(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    assert out == expect
