"""Unigram-LM tokenizer units: the Spark trainer must reproduce the
frozen table byte-identically AND agree with an independent
pure-Python trainer; Viterbi semantics are pinned by hand cases and a
concatenation property."""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.unigram import (
    EM_ITERS,
    LP_SCALE,
    PIECE_MAX,
    SEED_SIZE,
    UNK_LP,
    VOCAB_SIZE,
    WORD_CAP,
    FROZEN_UNIGRAM,
    _E_SCALE,
    train_unigram,
    viterbi_segment,
)
from orionld_to_hive_spark.operators.text import _PRETOK_RE

SF_SMOKE = "/root/testdata/sf0.001"
SF_FROZEN = "/root/testdata/sf0.01"


# ------------------------------------------------------------------ Viterbi


def test_viterbi_prefers_higher_score():
    # "abc" as one piece beats chars when its lp exceeds the char sum
    v = {"a": -2 * LP_SCALE, "b": -2 * LP_SCALE, "c": -2 * LP_SCALE,
         "abc": -3 * LP_SCALE}
    assert viterbi_segment("abc", v) == ["abc"]
    v["abc"] = -7 * LP_SCALE
    assert viterbi_segment("abc", v) == ["a", "b", "c"]


def test_viterbi_tie_prefers_longer_last_piece():
    # score("ab") == score("a")+score("b"): the k-DESC tie-break keeps "ab"
    v = {"a": -1 * LP_SCALE, "b": -1 * LP_SCALE, "ab": -2 * LP_SCALE}
    assert viterbi_segment("ab", v) == ["ab"]


def test_viterbi_unknown_char_falls_back():
    v = {"a": -1 * LP_SCALE}
    assert viterbi_segment("a#a", v) == ["a", "#", "a"]
    # the UNK penalty makes any in-vocab split preferable
    v2 = {"a": -1 * LP_SCALE, "x": UNK_LP + 1, "ax": -30 * LP_SCALE}
    assert viterbi_segment("ax", v2) == ["a", "x"]


def test_viterbi_concatenation_invariant_frozen():
    for w in ("the", "aggregate", "measurement", "x" * WORD_CAP, "a1_b2"):
        assert "".join(viterbi_segment(w)) == w


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               min_size=1, max_size=WORD_CAP))
def test_viterbi_concatenation_property(word):
    pieces = viterbi_segment(word)
    assert "".join(pieces) == word
    assert all(1 <= len(p) <= PIECE_MAX for p in pieces)


# ------------------------------------------------------------ trainer twins


def _python_trainer(sf_dir: str) -> list:
    """Independent single-process reimplementation of the documented
    training semantics (pretokenize → cap → seed → EM on the 1e-9
    integer grid → prune → micro-nat logs)."""
    import re

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    rx = re.compile(_PRETOK_RE)
    wcnt: dict[str, int] = {}
    for txt in t["text"].to_pylist():
        for w in rx.findall(txt or ""):
            w = w[:WORD_CAP]
            wcnt[w] = wcnt.get(w, 0) + 1

    freq: dict[str, int] = {}
    for w, c in wcnt.items():
        for i in range(len(w)):
            for L in range(1, min(PIECE_MAX, len(w) - i) + 1):
                p = w[i : i + L]
                freq[p] = freq.get(p, 0) + c
    chars = {p for p in freq if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in freq.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[: max(SEED_SIZE - len(chars), 0)]
    sel = {p: freq[p] for p in chars}
    sel.update(dict(multi))
    z = sum(sel.values())
    probs = {p: c / z for p, c in sel.items()}

    for _ in range(EM_ITERS):
        cnt: dict[str, int] = {}
        for w, c in wcnt.items():
            n = len(w)
            alpha = [0.0] * (n + 1)
            alpha[0] = 1.0
            for j in range(1, n + 1):
                alpha[j] = sum(
                    alpha[j - k] * probs[w[j - k : j]]
                    for k in range(1, min(PIECE_MAX, j) + 1)
                    if w[j - k : j] in probs
                )
            if alpha[n] == 0.0:
                continue
            beta = [0.0] * (n + 1)
            beta[n] = 1.0
            for i in range(n - 1, -1, -1):
                beta[i] = sum(
                    probs[w[i : i + k]] * beta[i + k]
                    for k in range(1, min(PIECE_MAX, n - i) + 1)
                    if w[i : i + k] in probs
                )
            per_word: dict[str, float] = {}
            for i in range(n):
                for k in range(1, min(PIECE_MAX, n - i) + 1):
                    p = w[i : i + k]
                    pr = probs.get(p)
                    if pr:
                        e = alpha[i] * pr * beta[i + k] / alpha[n]
                        if e:
                            per_word[p] = per_word.get(p, 0.0) + e
            for p, e in per_word.items():
                scaled = math.floor(e * c * _E_SCALE + 0.5)
                if scaled:
                    cnt[p] = cnt.get(p, 0) + scaled
        for ch in chars:
            cnt.setdefault(ch, 1)
        z = sum(cnt.values())
        probs = {p: c / z for p, c in cnt.items() if c}

    multi_sorted = sorted(
        ((p, pr) for p, pr in probs.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )
    keep = {p: probs[p] for p in chars if p in probs}
    for p, pr in multi_sorted[: max(VOCAB_SIZE - len(keep), 0)]:
        keep[p] = pr
    z = sum(keep.values())
    return sorted(
        (p, math.floor(math.log(pr / z) * LP_SCALE + 0.5)) for p, pr in keep.items()
    )


def test_trainer_agrees_with_python_model(spark):
    assert train_unigram(spark, SF_SMOKE) == _python_trainer(SF_SMOKE)


@pytest.mark.slow
def test_trainer_reproduces_frozen_table(spark):
    assert tuple(
        (p, lp) for p, lp in train_unigram(spark, SF_FROZEN)
    ) == FROZEN_UNIGRAM


def test_frozen_table_wellformed():
    pieces = [p for p, _ in FROZEN_UNIGRAM]
    assert len(set(pieces)) == len(pieces) == VOCAB_SIZE
    assert pieces == sorted(pieces)
    assert all(0 < len(p) <= PIECE_MAX for p in pieces)
    assert all(isinstance(lp, int) and lp < 0 for _, lp in FROZEN_UNIGRAM)
    # log-probs normalize to ~1 (floor rounding only loses micro-nats)
    total = sum(math.exp(lp / LP_SCALE) for _, lp in FROZEN_UNIGRAM)
    assert abs(total - 1.0) < 1e-3


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="ab#", min_size=1, max_size=8),
    st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=PIECE_MAX),
        st.integers(min_value=-15 * LP_SCALE, max_value=-1),
        max_size=12,
    ),
)
def test_viterbi_is_score_optimal(word, extra):
    """Viterbi total score must equal the brute-force maximum over ALL
    segmentations (single chars always segmentable via vocab or the
    UNK fallback); the emitted pieces must reproduce that score."""
    vocab = {"a": -2 * LP_SCALE, "b": -3 * LP_SCALE}
    vocab.update(extra)

    def lp(piece):
        if piece in vocab:
            return vocab[piece]
        return UNK_LP if len(piece) == 1 else None

    def best(rest):
        if not rest:
            return 0
        cands = []
        for k in range(1, min(PIECE_MAX, len(rest)) + 1):
            v = lp(rest[:k])
            if v is not None:
                tail = best(rest[k:])
                cands.append(v + tail)
        return max(cands)

    pieces = viterbi_segment(word, vocab)
    assert "".join(pieces) == word
    got = sum(lp(p) for p in pieces)
    assert got == best(word)
