"""Golden-behavior tests for the round-7 second operator batch:
properties the oracle-parity sweep can't see — the Misra-Gries merge
recomputed in plain Python, merge-on-read delete conservation and
precedence, attribution credit conservation across models, weighted
quantiles against a plain-Python cumulative walk."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from velib_lakehouse_spark import registry
from velib_lakehouse_spark.catalog import load_table
from tests.conftest import SF_DIR


# ---- heavy_hitters_mg_audit --------------------------------------------------


def _bruteforce_mg(shard_words, k):
    """Prune-merge MG (Agarwal et al. merge rule) from per-shard word
    lists: per-shard count -> prune to k -> keywise sum -> prune to k.
    Returns (summary dict, total decrement bound, n_total)."""

    def prune(counts):
        if len(counts) <= k:
            return dict(counts), 0
        t = sorted(counts.values(), reverse=True)[k]
        return {w: c - t for w, c in counts.items() if c - t > 0}, t

    dec = 0
    merged: Counter = Counter()
    n_total = 0
    for words in shard_words.values():
        c = Counter(words)
        n_total += sum(c.values())
        pruned, t = prune(c)
        dec += t
        merged.update(pruned)
    summary, tg = prune(merged)
    return summary, dec + tg, n_total


def test_mg_matches_bruteforce(spark):
    d = load_table(spark, SF_DIR, "documents")
    shard_words: dict[str, list[str]] = defaultdict(list)
    for r in d.select("source", "text").collect():
        shard_words[r["source"]].extend(
            w for w in r["text"].split(" ") if w
        )
    from velib_lakehouse_spark.operators.sketches import MG_K, MG_TOPK

    summary, dec_bound, n_total = _bruteforce_mg(shard_words, MG_K)
    exact = Counter(w for ws in shard_words.values() for w in ws)
    rows = registry.QUERIES["heavy_hitters_mg_audit"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == min(MG_TOPK, len(exact))
    for r in rows:
        assert r["exact_cnt"] == exact[r["w"]]
        assert r["est_cnt"] == summary.get(r["w"], 0)
        assert r["dec_bound"] == dec_bound
        assert r["one_sided"] is True
        assert r["within_bound"] is True
        assert r["guarantee_held"] is True
        assert r["theory_bound_ok"] is True
        # frequent-items guarantee, recomputed independently
        if exact[r["w"]] * (MG_K + 1) > n_total:
            assert r["in_summary"] is True


def test_mg_summary_is_bounded(spark):
    """The merged summary can never exceed K entries — the whole point
    of the sketch (est_cnt > 0 rows are summary members)."""
    from velib_lakehouse_spark.operators.sketches import MG_K

    rows = registry.QUERIES["heavy_hitters_mg_audit"](
        spark, SF_DIR
    ).collect()
    assert sum(1 for r in rows if r["in_summary"]) <= MG_K


# ---- merge_on_read_deletes ---------------------------------------------------


def test_mor_conservation_and_bruteforce(spark):
    from velib_lakehouse_spark.sources.lake import MOR_EQ_MOD

    ev = [
        (
            r["event_id"],
            r["user_id"],
            r["event_type"],
            int(round(r["value"] * 100)),
            str(r["date"]),
        )
        for r in load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.to_date("ts").alias("date"),
        )
        .collect()
    ]
    expect: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    for eid, uid, etype, v, date in ev:
        agg = expect[date]
        agg[0] += 1
        if etype == "error":  # position-deleted (precedence: pos first)
            agg[1] += 1
        elif uid % MOR_EQ_MOD == 0:
            agg[2] += 1
        else:
            agg[3] += 1
            agg[4] += v
    rows = registry.QUERIES["merge_on_read_deletes"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == len(expect)
    for r in rows:
        exp = expect[r["date"]]
        assert [
            r["n_total"],
            r["n_pos_deleted"],
            r["n_eq_deleted"],
            r["n_live"],
            r["live_value_centi"],
        ] == exp
        # conservation: every base row is pos-deleted, eq-deleted, or live
        assert r["n_total"] == (
            r["n_pos_deleted"] + r["n_eq_deleted"] + r["n_live"]
        )


def test_mor_positions_are_stable_per_file(spark):
    """Positions recorded at write time must be unique within their
    (date, fbucket) file scope and dense from 1 — the (path, pos)
    contract position deletes rely on."""
    from velib_lakehouse_spark.functions.hashing import md5_long
    from velib_lakehouse_spark.sources.lake import MOR_FILES
    from pyspark.sql import Window

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id",
        F.to_date("ts").cast("string").alias("date"),
        (md5_long(F.col("event_id").cast("string")) % MOR_FILES).alias(
            "fbucket"
        ),
    )
    base = ev.withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("date", "fbucket").orderBy("event_id")
        ),
    )
    stats = base.groupBy("date", "fbucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("pos").alias("n_distinct"),
        F.min("pos").alias("mn"),
        F.max("pos").alias("mx"),
    )
    for r in stats.collect():
        assert r["n"] == r["n_distinct"]
        assert r["mn"] == 1 and r["mx"] == r["n"]


# ---- multitouch_attribution --------------------------------------------------


def test_mta_conservation(spark):
    """Every model's column must sum to exactly the total purchase
    cents — the integer split with remainder-to-last guarantees it."""
    e = load_table(spark, SF_DIR, "events")
    total = (
        e.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.expr("cast(round(value * 100) as bigint)")))
        .first()[0]
    )
    rows = registry.QUERIES["multitouch_attribution"](
        spark, SF_DIR
    ).collect()
    assert {r["channel"] for r in rows} <= {"click", "view", "direct"}
    for col in ("first_touch_centi", "last_touch_centi", "linear_centi"):
        assert sum(r[col] for r in rows) == total, col


def test_mta_matches_bruteforce(spark):
    from velib_lakehouse_spark.operators.rollups import MTA_LOOKBACK_DAYS

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    ).collect()
    touches = defaultdict(list)
    for r in ev:
        if r["event_type"] in ("click", "view"):
            touches[r["user_id"]].append(
                (r["ts"], r["event_id"], r["event_type"])
            )
    for lst in touches.values():
        lst.sort()
    import datetime

    look = datetime.timedelta(days=MTA_LOOKBACK_DAYS)
    first_c: Counter = Counter()
    last_c: Counter = Counter()
    linear_c: Counter = Counter()
    n_assign: Counter = Counter()
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        v = int(round(r["value"] * 100))
        window = [
            t
            for t in touches.get(r["user_id"], [])
            if r["ts"] - look <= t[0] < r["ts"]
        ]
        if not window:
            for c in (first_c, last_c, linear_c):
                c["direct"] += v
            n_assign["direct"] += 1
            continue
        n = len(window)
        first_c[window[0][2]] += v
        last_c[window[-1][2]] += v
        for t in window:
            linear_c[t[2]] += v // n
        linear_c[window[-1][2]] += v - n * (v // n)
        for t in window:
            n_assign[t[2]] += 1
    rows = registry.QUERIES["multitouch_attribution"](
        spark, SF_DIR
    ).collect()
    for r in rows:
        ch = r["channel"]
        assert r["n_assignments"] == n_assign[ch]
        assert r["first_touch_centi"] == first_c[ch]
        assert r["last_touch_centi"] == last_c[ch]
        assert r["linear_centi"] == linear_c[ch]


# ---- weighted_quantiles_exact ------------------------------------------------


def test_wq_matches_bruteforce(spark):
    from velib_lakehouse_spark.operators.rollups import WQ_QS

    docs = defaultdict(list)
    for r in (
        load_table(spark, SF_DIR, "documents")
        .select("lang", "n_chars", "text")
        .collect()
    ):
        w = len([x for x in r["text"].split(" ") if x])
        docs[r["lang"]].append((r["n_chars"], w))
    rows = registry.QUERIES["weighted_quantiles_exact"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == len(docs) * len(WQ_QS)
    for r in rows:
        pairs = sorted(docs[r["lang"]])
        total_w = sum(w for _, w in pairs)
        n_docs = len(pairs)
        assert r["total_w"] == total_w and r["n_docs"] == n_docs
        target_w = (r["q"] * total_w + 99) // 100
        target_n = (r["q"] * n_docs + 99) // 100
        cumw = cumn = 0
        wq = uq = None
        for val, w in pairs:
            cumw += w
            cumn += 1
            if wq is None and cumw >= target_w:
                wq = val
            if uq is None and cumn >= target_n:
                uq = val
        # ties: the cumulative table aggregates weight per value, so the
        # first row reaching the target maps to that value
        assert r["weighted_q_chars"] == wq
        assert r["unweighted_q_chars"] == uq
        assert r["weight_shift_chars"] == wq - uq


# ---- dimsum_cosine_estimate ---------------------------------------------------


def test_dimsum_matches_bruteforce(spark):
    """Every sampling decision, threshold, and the estimator arithmetic
    recomputed in plain Python."""
    import hashlib
    import math

    from velib_lakehouse_spark.operators.sketches import (
        DS_G,
        DS_PANEL,
        DS_U_MOD,
    )

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    counts: dict[tuple[int, str], int] = Counter()
    tot: Counter = Counter()
    for r in docs:
        for w in r["text"].split(" "):
            if w:
                counts[(r["doc_id"], w)] += 1
                tot[w] += 1
    panel = sorted(tot, key=lambda w: (-tot[w], w))[:DS_PANEL]
    n2 = {
        w: sum(a * a for (_, ww), a in counts.items() if ww == w)
        for w in panel
    }
    by_doc: dict[int, dict[str, int]] = defaultdict(dict)
    for (doc, w), a in counts.items():
        if w in n2:
            by_doc[doc][w] = a
    exact: Counter = Counter()
    s_emit: Counter = Counter()
    n_emit: Counter = Counter()
    for doc, terms in by_doc.items():
        ws = sorted(terms)
        for i, wa in enumerate(ws):
            for wb in ws[i + 1 :]:
                t = (DS_G * DS_U_MOD) // (n2[wa] * n2[wb])
                h = int(
                    hashlib.md5(f"ds|{doc}|{wa}|{wb}".encode()).hexdigest()[
                        :15
                    ],
                    16,
                )
                u = h % DS_U_MOD + 1
                exact[(wa, wb)] += terms[wa] * terms[wb]
                if u <= t:
                    s_emit[(wa, wb)] += terms[wa] * terms[wb]
                    n_emit[(wa, wb)] += 1
    rows = registry.QUERIES["dimsum_cosine_estimate"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == len(exact)
    for r in rows:
        key = (r["term_a"], r["term_b"])
        assert r["exact_dot"] == exact[key]
        assert r["n2_a"] == n2[r["term_a"]] and r["n2_b"] == n2[r["term_b"]]
        if r["n2_a"] * r["n2_b"] <= DS_G:
            assert r["sampled"] is False
            assert r["est_dot_milli"] == exact[key] * 1000
            assert r["err_ppm"] == 0
        else:
            assert r["sampled"] is True
            assert r["n_rows_emitted"] == n_emit[key]
            t = (DS_G * DS_U_MOD) // (r["n2_a"] * r["n2_b"])
            est = math.floor(s_emit[key] * 1000.0 * DS_U_MOD / t)
            assert r["est_dot_milli"] == est


# ---- partition_join_size_audit -------------------------------------------------


def test_pjs_matches_bruteforce(spark):
    """Per-partition stats, the Selinger estimate, exact join sizes,
    and both skew verdicts recomputed in plain Python."""
    import hashlib
    import statistics

    from velib_lakehouse_spark.operators.sketches import PJS_B, PJS_SKEW_X

    def bucket(k):
        return (
            int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % PJS_B
        )

    o = Counter(
        r["o_orderkey"]
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey")
        .collect()
    )
    l = Counter(
        r["l_orderkey"]
        for r in load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey")
        .collect()
    )
    n1: Counter = Counter()
    d1: Counter = Counter()
    n2: Counter = Counter()
    d2: Counter = Counter()
    exact: Counter = Counter()
    for k, c in o.items():
        p = bucket(k)
        n1[p] += c
        d1[p] += 1
        exact[p] += c * l.get(k, 0)
    for k, c in l.items():
        p = bucket(k)
        n2[p] += c
        d2[p] += 1
    parts = sorted(set(n1) | set(n2))
    est = {
        p: n1[p] * n2[p] // max(d1[p], d2[p], 1) for p in parts
    }
    med_est = statistics.median_low(sorted(est.values()))
    med_exact = statistics.median_low(sorted(exact[p] for p in parts))
    rows = registry.QUERIES["partition_join_size_audit"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == len(parts)
    for r in rows:
        p = r["p"]
        assert (r["n1"], r["d1"], r["n2"], r["d2"]) == (
            n1[p],
            d1[p],
            n2[p],
            d2[p],
        )
        assert r["est_rows"] == est[p]
        assert r["exact_rows"] == exact[p]
        assert r["predicted_skew"] == (est[p] > PJS_SKEW_X * med_est)
        assert r["true_skew"] == (exact[p] > PJS_SKEW_X * med_exact)


# ---- ivm_join_view_delta -------------------------------------------------------


def test_ivm_join_delta_rule_is_complete(spark):
    """The refreshed view must equal the from-scratch rebuild on EVERY
    date (the audit flags), and the delta slices must be non-trivial in
    the fixture (all three delta terms exercised)."""
    from velib_lakehouse_spark.operators.rollups import (
        IVMJ_L_MOD,
        IVMJ_O_MOD,
    )

    rows = registry.QUERIES["ivm_join_view_delta"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_matches"] is True
        assert r["rev_matches"] is True
    # fixture sanity: both delta slices are non-empty, so a missing
    # delta term would actually change totals somewhere
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    assert o.filter(F.col("o_orderkey") % IVMJ_O_MOD == 0).count() > 0
    assert l.filter(F.col("l_orderkey") % IVMJ_L_MOD == 0).count() > 0


def test_ivm_join_delta_terms_sum_to_full(spark):
    """Brute-force conservation: |A ⋈ B| must equal the four disjoint
    term sizes (base⋈base + dA⋈B + A⋈dB + dA⋈dB) — the identity the
    three-term rule relies on."""
    from velib_lakehouse_spark.operators.rollups import (
        IVMJ_L_MOD,
        IVMJ_O_MOD,
    )

    o = [
        (r["o_orderkey"], r["o_orderkey"] % IVMJ_O_MOD == 0)
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey")
        .collect()
    ]
    l = Counter()
    dl = Counter()
    for r in load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey"
    ).collect():
        k = r["l_orderkey"]
        if k % IVMJ_L_MOD == 0:
            dl[k] += 1
        else:
            l[k] += 1
    full = base = t1 = t2 = t3 = 0
    for k, is_do in o:
        full += l.get(k, 0) + dl.get(k, 0)
        if is_do:
            t1 += l.get(k, 0)
            t3 += dl.get(k, 0)
        else:
            base += l.get(k, 0)
            t2 += dl.get(k, 0)
    assert full == base + t1 + t2 + t3
    rows = registry.QUERIES["ivm_join_view_delta"](spark, SF_DIR).collect()
    assert sum(r["n_lines"] for r in rows) == full
