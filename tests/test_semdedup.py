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


def test_bucketed_assign_equals_fast_and_fold(spark):
    """The branch-and-bound bucketed assignment is an EXACT twin of
    both the n×K numpy path and the fold-based _assign — on real
    testdata embeddings with many centroid counts (cells degenerate,
    balanced, and singleton)."""
    from orionld_to_hive_spark.operators.similarity import (
        _assign,
        _assign_bucketed,
        _assign_fast,
        _emb,
    )

    emb = _emb(spark, SF).select("vec_id", "vec")
    rows = emb.collect()
    for k in (4, 7, 16, 40):
        centroids = [
            (int(r["vec_id"]), [float(x) for x in r["vec"]])
            for r in rows
            if r["vec_id"] < k
        ]
        got = {
            r["vec_id"]: r["cid"]
            for r in _assign_bucketed(emb, centroids).collect()
        }
        fast = {
            r["vec_id"]: r["cid"] for r in _assign_fast(emb, centroids).collect()
        }
        cdf = spark.createDataFrame(centroids, schema="cid INT, cvec ARRAY<DOUBLE>")
        fold = {r["vec_id"]: r["cid"] for r in _assign(emb, cdf).collect()}
        assert got == fast == fold, f"divergence at K={k}"


def test_nprobe_production_path_equals_exact_at_graded_scale(spark):
    """The nprobe-bounded production dispatch (what semdedup actually
    runs) is provably identical to the exact twins whenever nprobe ≥
    the coarse-cell count — which holds at the SemDeDup operating
    point on every graded scale (K = 8 ⇒ ⌈√8⌉ = 3 cells ≤ 4)."""
    import numpy as np

    from orionld_to_hive_spark.operators.similarity import (
        SEMDEDUP_NPROBE,
        _assign_auto,
        _assign_fast,
        _coarse_cells,
        _emb,
        _semdedup_k,
    )

    emb = _emb(spark, SF).select("vec_id", "vec")
    rows = emb.collect()
    k = _semdedup_k(len(rows))
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["vec"]])
        for r in rows
        if r["vec_id"] < k
    ]
    C = np.array([v for _, v in sorted(centroids)], dtype=np.float64)
    n_cells = len(_coarse_cells(C)[0])
    assert SEMDEDUP_NPROBE >= n_cells, "cap binds — dispatch no longer exact here"
    got = {r["vec_id"]: r["cid"] for r in _assign_auto(emb, centroids).collect()}
    fast = {r["vec_id"]: r["cid"] for r in _assign_fast(emb, centroids).collect()}
    assert got == fast


def test_bucketed_assign_guard_fires(spark):
    """Same near-tie construction as the _assign_fast guard test: the
    bucketed path must raise, not answer, when non-identical centroids
    tie below tolerance."""
    import pytest

    from orionld_to_hive_spark.operators.similarity import _assign_bucketed

    v = [0.5] * 64
    emb = spark.createDataFrame([(0, v)], "vec_id LONG, vec ARRAY<DOUBLE>")
    c0 = [0.5] * 64
    c0[0] = 0.5 + 1e-7
    c1 = [0.5] * 64
    c1[1] = 0.5 + 1e-7 + 1e-14
    # pad with far-away centroids so K ≥ _BUCKETED_MIN_K shapes real cells
    far = [(10 + i, [5.0 + i] * 64) for i in range(4)]
    with pytest.raises(Exception, match="near-tie below tolerance"):
        _assign_bucketed(emb, [(0, c0), (1, c1)] + far).collect()


def test_bucketed_assign_identical_tie_is_fine(spark):
    """Bitwise-identical centroid duplicates tie exactly; lowest cid
    wins in every engine, so the bucketed guard must NOT fire."""
    from orionld_to_hive_spark.operators.similarity import _assign_bucketed

    v = [0.25] * 64
    emb = spark.createDataFrame([(7, v)], "vec_id LONG, vec ARRAY<DOUBLE>")
    c = [0.5] * 64
    far = [(10 + i, [5.0 + i] * 64) for i in range(3)]
    rows = _assign_bucketed(emb, [(3, c), (1, list(c))] + far).collect()
    assert rows[0]["cid"] == 1
