"""Golden-behavior tests for the round-9 operators: properties the
oracle-parity sweep can't see — the ICWS estimator recomputed against
brute-force tf-idf weighted Jaccard and gated for min-wise-independence
drift, the capped weighted-MinHash consumer contract, and the BPE
training loop pinned against hand-computed merges (including the
boundary-sharing case single-separator encodings get wrong)."""

from __future__ import annotations

import collections
import math
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


# ---- dedup_icws_weighted_minhash --------------------------------------------


def _icws_weights(texts: dict[int, str]) -> dict[int, dict[str, int]]:
    """Brute-force fixed-point tf-idf weights, replaying the op's
    definition: w = min(tf, CAP) * (1 + floor(ln(n_docs/df) * QUANT))
    over DISTINCT texts."""
    from velib_lakehouse_spark.operators.dedup import (
        ICWS_IDF_QUANT,
        WMH_TF_CAP,
    )

    distinct = {}
    for doc_id, text in texts.items():
        distinct.setdefault(text, doc_id)
    tfs = {
        rep: {
            t: min(n, WMH_TF_CAP)
            for t, n in collections.Counter(
                w for w in text.split(" ") if w
            ).items()
        }
        for text, rep in distinct.items()
    }
    tfs = {r: tf for r, tf in tfs.items() if tf}
    n_docs = len(tfs)
    df = collections.Counter(t for tf in tfs.values() for t in tf)
    return {
        rep: {
            t: n * (1 + math.floor(math.log(n_docs / df[t]) * ICWS_IDF_QUANT))
            for t, n in tf.items()
        }
        for rep, tf in tfs.items()
    }


def test_icws_exact_side_matches_bruteforce(spark):
    """wjaccard_ppm must equal sum(min)/sum(max) over the fixed-point
    tf-idf weights recomputed in plain Python — real idf actually in
    the weights, not just capped tf."""
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    weights = _icws_weights(texts)
    rep_of = {}
    for doc_id, text in sorted(texts.items()):
        rep_of.setdefault(text, doc_id)
    rows = registry.QUERIES["dedup_icws_weighted_minhash"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows[:200]:
        wa = weights[rep_of[texts[r["doc_a"]]]]
        wb = weights[rep_of[texts[r["doc_b"]]]]
        wmin = sum(min(v, wb.get(t, 0)) for t, v in wa.items())
        wmax = sum(wa.values()) + sum(wb.values()) - wmin
        assert r["wjaccard_ppm"] == (wmin * 1_000_000) // wmax
        assert r["err_ppm"] == abs(r["est_ppm"] - r["wjaccard_ppm"])


def test_icws_exact_copies_are_constants(spark):
    """Byte-identical texts pair with est = exact = 1e6, err 0, all
    bands matching — the reflexive-expansion contract, unchanged from
    the integer-weight op."""
    from velib_lakehouse_spark.operators.dedup import (
        ICWS_BAND_ROWS,
        ICWS_K,
        dedup_icws_weighted_minhash,
    )

    d = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 40)
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    with tempfile.TemporaryDirectory() as tmp:
        rows = dedup_icws_weighted_minhash(
            spark, _corpus_dir(spark, corpus, tmp)
        ).collect()
    dup_pairs = [r for r in rows if r["doc_b"] - r["doc_a"] == 100000]
    assert len(dup_pairs) == 40
    for r in dup_pairs:
        assert r["n_bands"] == ICWS_K // ICWS_BAND_ROWS
        assert r["est_ppm"] == 1_000_000
        assert r["wjaccard_ppm"] == 1_000_000
        assert r["err_ppm"] == 0


def test_icws_estimator_drift_gate(spark):
    """The min-wise-independence gate the r8 VERDICT required: ICWS
    collision probability must track exact weighted Jaccard.  In the
    near-dup regime (exact >= 0.8) mean |est - exact| must sit inside
    one K=16 standard error (sqrt(J(1-J)/16) <= 0.125); overall mean
    gets the same selection-bias ceiling as the integer-weight op.  A
    broken sampler (e.g. the small-multiplier affine shortcut family
    the r8 docstrings warn about) collapses argmins onto few terms and
    blows both bounds."""
    rows = registry.QUERIES["dedup_icws_weighted_minhash"](
        spark, SF_DIR
    ).collect()
    hi = [r for r in rows if r["wjaccard_ppm"] >= 800_000]
    assert hi, "fixture has no near-dup-regime candidate pair"
    hi_err = sum(r["err_ppm"] for r in hi) / len(hi)
    assert hi_err < 125_000, f"near-dup tier mean |err| {hi_err} ppm"
    mean_err = sum(r["err_ppm"] for r in rows) / len(rows)
    assert mean_err < 300_000, f"overall mean |err| {mean_err} ppm"


def test_icws_idf_downweights_common_terms(spark):
    """The real-weight reason to exist: two docs overlapping ONLY on a
    corpus-ubiquitous term score a much lower tf-idf weighted Jaccard
    than two docs overlapping on rare terms, even with identical tf
    profiles.  Construct both cases and compare the exact side."""
    filler = [
        f"common r{i}a r{i}b" for i in range(8)
    ]  # 'common' appears in every doc; r* terms are singletons
    docs = [
        (1, "common rare1 rare2"),   # overlaps doc 2 on rare1 rare2
        (2, "common rare1 rare2 x1"),
        (3, "common y1 y2"),         # overlaps doc 4 only on 'common'
        (4, "common z1 z2 x2"),
    ] + [(10 + i, t) for i, t in enumerate(filler)]
    weights = _icws_weights({i: t for i, t in docs})
    j = {}
    for a, b in ((1, 2), (3, 4)):
        wa, wb = weights[a], weights[b]
        wmin = sum(min(v, wb.get(t, 0)) for t, v in wa.items())
        j[(a, b)] = wmin / (sum(wa.values()) + sum(wb.values()) - wmin)
    assert j[(1, 2)] > 2 * j[(3, 4)], j
    # and 'common' carries the minimum weight by construction
    assert weights[1]["common"] == 1 * (1 + 0)


# ---- dedup_weighted_minhash_capped ------------------------------------------


def test_capped_output_bounded_per_anchor(spark):
    from velib_lakehouse_spark.operators.dedup import WMH_PAIR_TOPK

    rows = registry.QUERIES["dedup_weighted_minhash_capped"](
        spark, SF_DIR
    ).collect()
    assert rows
    per_anchor = collections.Counter(r["anchor"] for r in rows)
    assert max(per_anchor.values()) <= WMH_PAIR_TOPK
    # ranks are 1..n contiguous per anchor, ordered by the contract
    by_anchor = collections.defaultdict(list)
    for r in rows:
        by_anchor[r["anchor"]].append(r)
    for anchor, rs in by_anchor.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["wjaccard_ppm"], -r["est_ppm"], r["neighbor"]) for r in rs]
        assert keys == sorted(keys)


def test_capped_reflexive_row_records_dup_group(spark):
    """On a replicated corpus the R^2 member expansion is exactly what
    the capped variant avoids: each dup group appears as ONE reflexive
    row whose n_a carries the group size."""
    from velib_lakehouse_spark.operators.dedup import (
        dedup_weighted_minhash_capped,
    )

    d = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 30)
    corpus = d
    for i in (1, 2, 3):  # 4-deep exact-dup groups
        corpus = corpus.unionByName(
            d.select(
                (F.col("doc_id") + 100000 * i).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
    with tempfile.TemporaryDirectory() as tmp:
        rows = dedup_weighted_minhash_capped(
            spark, _corpus_dir(spark, corpus, tmp)
        ).collect()
    reflexive = [r for r in rows if r["anchor"] == r["neighbor"]]
    assert reflexive, "dup groups must surface as reflexive rows"
    for r in reflexive:
        assert r["n_a"] == r["n_b"] == 4
        assert r["est_ppm"] == r["wjaccard_ppm"] == 1_000_000
        assert r["rnk"] == 1  # exact dup outranks every near-dup
    # output is rep-granular: 30 anchors max, never 120^2 member pairs
    assert len({r["anchor"] for r in rows}) <= 30


def test_capped_agrees_with_full_expansion(spark):
    """Every capped row's metrics must match the full audit's row for
    the same rep pair (same pipeline, same numbers — the cap only
    truncates)."""
    full = {}
    for r in registry.QUERIES["dedup_weighted_minhash"](spark, SF_DIR).collect():
        full[(r["doc_a"], r["doc_b"])] = (
            r["n_bands"], r["est_ppm"], r["wjaccard_ppm"]
        )
    for r in registry.QUERIES["dedup_weighted_minhash_capped"](
        spark, SF_DIR
    ).collect():
        key = (min(r["anchor"], r["neighbor"]), max(r["anchor"], r["neighbor"]))
        if r["anchor"] == r["neighbor"]:
            continue  # reflexive rows only expand for multi-member groups
        assert full[key] == (r["n_bands"], r["est_ppm"], r["wjaccard_ppm"])


# ---- bpe_train_merges --------------------------------------------------------


def _bpe_reference(word_counts: dict[str, int], k: int):
    """Hand-rolled Sennrich BPE on word counts, for pinning."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, k + 1):
        counts = collections.Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += word_counts[w]
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_handcomputed_tiny_corpus(spark):
    """The r8 VERDICT pin: merges against a hand-computed corpus.
    'low lower lowest newest widest' classic: 'lo' then 'low' win the
    l-heavy counts; 'est' family follows — and the engine must agree
    with the reference implementation rank by rank."""
    from velib_lakehouse_spark.operators.text import (
        BPE_TRAIN_MERGES,
        bpe_train_merges,
    )

    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(" ".join([w] * n) for w, n in words.items())
    corpus = spark.createDataFrame(
        [(1, text, "en", "s", len(text))], DOC_SCHEMA
    )
    with tempfile.TemporaryDirectory() as tmp:
        rows = bpe_train_merges(spark, _corpus_dir(spark, corpus, tmp)).collect()
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in sorted(rows, key=lambda r: r["merge_rank"])
    ]
    assert got == _bpe_reference(words, BPE_TRAIN_MERGES)


def test_bpe_merge_applies_to_overlapping_occurrences(spark):
    """The doubled-separator guarantee: in 'abab' the (a,b) merge must
    fire on BOTH occurrences in one pass (single-separator replace
    consumes the boundary and misses the second), and 'aaa' must merge
    left-to-right non-overlapping exactly like the reference."""
    from velib_lakehouse_spark.operators.text import bpe_train_merges

    words = {"abab": 7, "aaa": 5}
    text = " ".join(" ".join([w] * n) for w, n in words.items())
    corpus = spark.createDataFrame(
        [(1, text, "en", "s", len(text))], DOC_SCHEMA
    )
    with tempfile.TemporaryDirectory() as tmp:
        rows = bpe_train_merges(spark, _corpus_dir(spark, corpus, tmp)).collect()
    got = {
        r["merge_rank"]: (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in rows
    }
    ref = dict(
        (rank, (a, b, cnt))
        for rank, a, b, _m, cnt in _bpe_reference(words, 8)
    )
    assert got == ref
    # rank 1 is (a,b) x14 — TWO per 'abab' occurrence, the count a
    # boundary-sharing encoding undercounts; rank 2 is (a,a) x10 from
    # 'aaa' (left-to-right non-overlap would give 5 only after a
    # double-count bug); rank 3 sees 'ab ab' -> (ab,ab) x7, which only
    # exists if BOTH of rank 1's merges fired in one pass
    assert got[1] == ("a", "b", 14)
    assert got[2] == ("a", "a", 10)
    assert got[3] == ("ab", "ab", 7)


# ---- bpe_encode_tokens --------------------------------------------------------


def _bpe_encode_reference(word_counts: dict[str, int], k: int):
    """Token count per word after replaying the reference merges."""
    merges = _bpe_reference(word_counts, k)
    seqs = {w: list(w) for w in word_counts}
    for _rank, a, b, _m, _c in merges:
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return {w: len(s) for w, s in seqs.items()}


def test_bpe_encode_matches_reference_tokenization(spark):
    """Per-document token counts must equal the reference encoder's:
    train on the corpus, apply every merge, count tokens per word,
    sum per doc."""
    from velib_lakehouse_spark.operators.text import (
        BPE_TRAIN_MERGES,
        bpe_encode_tokens,
    )

    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "a": 4}
    docs = [
        (1, "low lower low"),
        (2, "newest widest newest a"),
        (3, "a a low newest"),
    ]
    # word counts must reflect the DOCS, so derive them
    wc = collections.Counter(w for _i, t in docs for w in t.split(" "))
    per_word = _bpe_encode_reference(dict(wc), BPE_TRAIN_MERGES)
    expected = {
        doc_id: (
            len(text.split(" ")),
            sum(per_word[w] for w in text.split(" ")),
        )
        for doc_id, text in docs
    }
    corpus = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs], DOC_SCHEMA
    )
    with tempfile.TemporaryDirectory() as tmp:
        rows = bpe_encode_tokens(spark, _corpus_dir(spark, corpus, tmp)).collect()
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"]) for r in rows}
    assert got == expected
    for r in rows:
        assert r["fertility_ppm"] == (r["n_tokens"] * 1_000_000) // r["n_words"]


def test_bpe_encode_fertility_drops_as_merges_apply(spark):
    """Applying merges can only shorten sequences: fertility must be
    strictly below the char-per-word baseline on a merge-friendly
    corpus, and >= 1 token per word always."""
    from velib_lakehouse_spark.operators.text import bpe_encode_tokens

    text = " ".join(["banana"] * 20)
    corpus = spark.createDataFrame([(1, text, "en", "s", len(text))], DOC_SCHEMA)
    with tempfile.TemporaryDirectory() as tmp:
        rows = bpe_encode_tokens(spark, _corpus_dir(spark, corpus, tmp)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_words"] == 20
    # 6 chars/word unmerged; 8 merges on a single 6-char word collapse
    # it entirely -> 1 token per word
    assert r["n_tokens"] == 20
    assert r["fertility_ppm"] == 1_000_000
