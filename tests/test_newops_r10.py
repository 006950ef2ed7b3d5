"""Round-10 operator units: the min-span-thresholded ExactSubstr
rewrite (Lee et al. 2022 production setting — cut only duplicated
spans >= L tokens) must (a) agree with an independent pure-Python
model on collision-rich 2-symbol inputs, (b) degenerate to the
oracle-pinned all-windows rewrite at L == K, and (c) keep short
duplicated idioms that the all-windows rewrite excises."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.dedup import (
    EXACT_SUBSTR_K,
    _minspan_cut,
    _substr_cut,
    _substr_dups,
)


def _minspan_model(rows, L, k=EXACT_SUBSTR_K):
    """Independent model: keep-first covered windows -> merge into
    maximal contiguous runs -> drop runs shorter than L -> cut."""
    toks = {d: t.split(" ") for d, t in rows}
    occ = []
    first = {}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(len(ts) - k + 1):
            g = " ".join(ts[p : p + k])
            occ.append((g, d, p))
            if g not in first:
                first[g] = (d, p)
    cnt = Counter(g for g, _, _ in occ)
    covered = {d: set() for d in toks}
    for g, d, p in occ:
        if cnt[g] > 1 and first[g] != (d, p):
            covered[d].update(range(p, p + k))
    out = []
    for d, ts in toks.items():
        cut = set()
        run = []
        for i in sorted(covered[d]) + [None]:
            if run and (i is None or i != run[-1] + 1):
                if len(run) >= L:
                    cut.update(run)
                run = []
            if i is not None:
                run.append(i)
        kept = [t for i, t in enumerate(ts) if i not in cut]
        out.append((d, len(ts), len(ts) - len(kept), " ".join(kept)))
    return sorted(out)


def _frame(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return df.select("doc_id", F.split(F.col("text"), " ").alias("toks"))


_doc = st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=25)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=4),
    L=st.sampled_from([EXACT_SUBSTR_K, 12, 16]),
)
def test_minspan_rewrite_matches_model(spark, docs, L):
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    got = sorted(
        tuple(r) for r in _minspan_cut(_frame(spark, rows), L).collect()
    )
    assert got == _minspan_model(rows, L)


def test_minspan_at_k_equals_all_windows(spark):
    # at L == K every covered island is >= K long by construction,
    # so the threshold is a no-op and both rewrites agree exactly
    rows = [
        (0, "a b c d e f g h i j k l m n o p"),
        (1, "x a b c d e f g h i j y z w q r"),
        (2, "a b c d e f g h a b c d e f g h"),
    ]
    frame = _frame(spark, rows)
    base = sorted(
        tuple(r) for r in _substr_cut(frame, _substr_dups(frame)).collect()
    )
    thr = sorted(
        tuple(r) for r in _minspan_cut(frame, EXACT_SUBSTR_K).collect()
    )
    assert base == thr


def test_minspan_keeps_short_spans(spark):
    # doc 1 repeats doc 0's 8-token idiom once (island of exactly 8
    # covered tokens) inside otherwise-unique text: the all-windows
    # rewrite cuts it, the L=16 threshold keeps the doc intact
    idiom = "the quick brown fox jumps over the dog"
    rows = [
        (0, idiom + " u0 u1 u2 u3 u4 u5 u6 u7"),
        (1, "v0 v1 v2 v3 " + idiom + " v4 v5 v6 v7"),
    ]
    frame = _frame(spark, rows)
    base = {r["doc_id"]: r for r in _substr_cut(frame, _substr_dups(frame)).collect()}
    thr = {r["doc_id"]: r for r in _minspan_cut(frame, 16).collect()}
    assert base[1]["n_removed"] == EXACT_SUBSTR_K
    assert thr[1]["n_removed"] == 0
    assert thr[1]["cleaned_text"] == rows[1][1]
    # and a >=16-token duplicated block IS still cut at L=16
    block = " ".join(f"b{i}" for i in range(16))
    rows2 = [(0, block + " s0 s1"), (1, "t0 t1 " + block)]
    frame2 = _frame(spark, rows2)
    thr2 = {r["doc_id"]: r for r in _minspan_cut(frame2, 16).collect()}
    assert thr2[1]["n_removed"] == 16
    assert thr2[1]["cleaned_text"] == "t0 t1"


# ---------------------------------------------------------------------------
# Batched BPE merge selection (r10, VERDICT r9 item 8): per-merge cost
# is Spark job overhead (~107-204 ms flat from sf0.01 to sf0.1), so
# batching rank-ordered SYMBOL-DISJOINT picks per round cuts it ~6.5x
# (measured 204 -> 31 ms/merge at select=8, sf0.1). The sequential
# path's byte-equality with the Python trainer is pinned in
# test_bpe_train.py; here the batched variant is pinned against an
# independent Python model of the same round rules.
from collections import Counter as _Counter

from orionld_to_hive_spark.operators.bpe import (
    _doc_word_counts_frame,
    train_bpe_frame,
)


def _batched_py_model(rows, n_merges, select, rounds_out=None):
    seqs = {w: " " + "  ".join(w) + " " for w, _ in rows}
    counts = dict(rows)
    merges = []
    while len(merges) < n_merges:
        pairs = _Counter()
        for w, s in seqs.items():
            syms = s.strip(" ").split("  ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += counts[w]
        ranked = sorted(
            ((p, c) for p, c in pairs.items() if c >= 2),
            key=lambda kv: (-kv[1], kv[0]),
        )[: select * 8]
        picks, used = [], set()
        for (a, b), _c in ranked:
            if len(picks) >= min(select, n_merges - len(merges)):
                break
            if a in used or b in used:
                continue
            picks.append((a, b))
            used.update((a, b))
        if not picks:
            break
        if rounds_out is not None:
            rounds_out.append(list(picks))
        for a, b in picks:
            merges.append((a, b))
            pat, rep = f" {a}  {b} ", f" {a}{b} "
            seqs = {w: s.replace(pat, rep) for w, s in seqs.items()}
    return merges


def _word_rows(spark, sf_smoke):
    from pyspark.sql import functions as SF

    from orionld_to_hive_spark.operators.bpe import _docs

    docs = _docs(spark, sf_smoke)
    wc = (
        _doc_word_counts_frame(docs)
        .groupBy("word")
        .agg(SF.sum("cnt").alias("cnt"))
        .collect()
    )
    return docs, [(r["word"], r["cnt"]) for r in wc]


def test_batched_bpe_matches_python_model(spark, sf_smoke):
    docs, rows = _word_rows(spark, sf_smoke)
    for select in (4, 8):
        got = train_bpe_frame(docs, 30, select_per_round=select)
        want = _batched_py_model(rows, 30, select)
        assert got == want, (select, got[:5], want[:5])


def test_batched_bpe_picks_are_symbol_disjoint_per_round(
    spark, sf_smoke
):
    """Structural guarantee the count-correctness argument rests on:
    within a round no two picks share a symbol — verified through the
    model (the Spark path is byte-identical to it, above)."""
    _docs_f, rows = _word_rows(spark, sf_smoke)
    rounds: list = []
    _batched_py_model(rows, 32, 8, rounds_out=rounds)
    assert rounds and any(len(r) > 1 for r in rounds)
    for batch in rounds:
        # a self-pair like (t, t) is a single pick with symbol set
        # {t}; the invariant is PAIRWISE disjointness between picks
        sets = [set(p) for p in batch]
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                assert not (sets[i] & sets[j]), (batch[i], batch[j])
