"""SemDeDup units: an independent numpy reimplementation of the whole
operator (Lloyd's fit → assignment → centroid cosine → pairwise drop
rule) must agree with the Spark query on sf0.001, plus invariants the
rule guarantees by construction."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from orionld_to_hive_spark.operators.similarity import (
    KMEANS_ITERS,
    SEMDEDUP_TAU,
    _semdedup_k,
    semdedup_prune_report,
)

SF = "/root/testdata/sf0.001"


def _numpy_model():
    """Pure-numpy SemDeDup at sf0.001, written against the operator's
    documented semantics (not its code): exact-decimal means are
    approximated with float64 sums, which match at this scale because
    assignments are decided by well-separated distances."""
    t = pq.read_table(f"{SF}/embeddings.parquet")
    vec_id = np.array(t["vec_id"])
    v = np.array([np.array(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    order = np.argsort(vec_id)
    vec_id, v = vec_id[order], v[order]
    KMEANS_K = _semdedup_k(len(v))  # corpus-proportional cluster count

    cent = v[vec_id < KMEANS_K].copy()
    for _ in range(KMEANS_ITERS):
        d = ((v[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        asg = d.argmin(axis=1)  # ties break to lowest cid like the op
        for c in range(KMEANS_K):
            if (asg == c).any():
                cent[c] = v[asg == c].mean(axis=0)
    d = ((v[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    asg = d.argmin(axis=1)

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    ccos = np.array([cos(v[i], cent[asg[i]]) for i in range(len(v))])
    report = {}
    for c in range(KMEANS_K):
        ids = np.where(asg == c)[0]
        dropped, ndup = set(), 0
        for i in ids:
            for j in ids:
                if i >= j:
                    continue
                if cos(v[i], v[j]) >= SEMDEDUP_TAU:
                    ndup += 1
                    # the later member in (ccos, vec_id) order drops
                    lo, hi = sorted((i, j), key=lambda k: (ccos[k], vec_id[k]))
                    dropped.add(int(vec_id[hi]))
        if len(ids):
            report[c] = (len(ids), ndup, len(dropped))
    return report


def test_semdedup_matches_numpy_model(spark):
    rows = semdedup_prune_report(spark, SF).collect()
    model = _numpy_model()
    got = {r["cid"]: (r["n_points"], r["n_dup_pairs"], r["n_dropped"]) for r in rows}
    assert got == model
    total_dropped = sum(r["n_dropped"] for r in rows)
    assert total_dropped > 0, "tau too high: the test corpus has no semantic dups"
    for r in rows:
        assert r["n_kept"] == r["n_points"] - r["n_dropped"]
        # the cluster's (ccos, vec_id)-minimal member never drops
        assert r["n_kept"] >= 1


def test_fast_assign_margin_guard_fires(spark):
    """The numpy assignment's exactness contract: a sub-tolerance
    near-tie between NON-identical centroids must raise, not answer."""
    import pytest

    from orionld_to_hive_spark.operators.similarity import _assign_fast

    v = [0.5] * 64
    emb = spark.createDataFrame(
        [(0, v)], "vec_id LONG, vec ARRAY<DOUBLE>"
    )
    # two centroids equidistant from v up to ~1e-12 but not identical
    c0 = [0.5] * 64
    c0[0] = 0.5 + 1e-7
    c1 = [0.5] * 64
    c1[1] = 0.5 + 1e-7 + 1e-14
    with pytest.raises(Exception, match="near-tie below tolerance"):
        _assign_fast(emb, [(0, c0), (1, c1)]).collect()


def test_fast_assign_identical_tie_is_fine(spark):
    """Bitwise-identical centroids tie exactly; both engines pick the
    lowest cid, so the guard must NOT fire."""
    from orionld_to_hive_spark.operators.similarity import _assign_fast

    v = [0.25] * 64
    emb = spark.createDataFrame([(7, v)], "vec_id LONG, vec ARRAY<DOUBLE>")
    c = [0.5] * 64
    rows = _assign_fast(emb, [(3, c), (1, list(c))]).collect()
    assert rows[0]["cid"] == 1  # lowest cid wins the exact tie
