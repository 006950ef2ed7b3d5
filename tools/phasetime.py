"""Per-phase timing for a multi-job query — where do the seconds sit?

Usage: python tools/phasetime.py <probe> [sf_dir] [reps]

Each probe is a hand-split version of one expensive registry query with
a perf_counter around every driver-synchronous action (collect /
broadcast-forcing join / mapInPandas ladder step), so the job ladder's
cost distribution is measured instead of guessed. Probes compute the
same values as the registry query (asserted where cheap) — they exist
for measurement only and are never registered.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orionld_to_hive_spark.session import get_spark


def _t(label, fn, out):
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    out.append((label, dt))
    return r


def probe_ann_ivf(spark, sf_dir, out):
    from pyspark.sql import functions as F

    from orionld_to_hive_spark.operators import similarity as S

    emb = S._emb(spark, sf_dir).select("vec_id", "vec").persist()
    _t("warm persist (count)", lambda: emb.count(), out)
    k = S.ANN_IVF_K
    init = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("vec").alias("cvec")
    )
    cents = _t(
        "init collect",
        lambda: [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in init.collect()],
        out,
    )
    cents2 = list(cents)
    for i in range(S.KMEANS_ITERS):
        cents = _t(
            f"iter {i}: two-step assign+means",
            lambda c=cents: S._fast_means(S._assign_auto(emb, c)),
            out,
        )
        cents2 = _t(
            f"iter {i}: fused round",
            lambda c=cents2: S._fit_round_means(emb, c),
            out,
        )
        assert cents == cents2
    _t("full topk after fit", lambda: S._ivf_multiprobe_topk(spark, emb).collect(), out)
    emb.unpersist()


def probe_semdedup(spark, sf_dir, out):
    from pyspark.sql import functions as F

    from orionld_to_hive_spark.operators import similarity as S
    from orionld_to_hive_spark.sources.warehouse import table_rows

    emb = S._emb(spark, sf_dir).select("vec_id", "vec").persist()
    _t("warm persist (count)", lambda: emb.count(), out)
    n = table_rows(spark, sf_dir, "embeddings")
    k = S._semdedup_k(n)
    init = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("vec").alias("cvec")
    )
    cents = _t(
        "init collect",
        lambda: [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in init.collect()],
        out,
    )
    cents2 = list(cents)
    for i in range(S.KMEANS_ITERS):
        cents = _t(
            f"iter {i}: two-step assign+means",
            lambda c=cents: S._fast_means(S._assign_auto(emb, c)),
            out,
        )
        cents2 = _t(
            f"iter {i}: fused round",
            lambda c=cents2: S._fit_round_means(emb, c),
            out,
        )
        assert cents == cents2
    _t(
        "full report after fit",
        lambda: S.semdedup_prune_report(spark, sf_dir).collect(),
        out,
    )
    emb.unpersist()


PROBES = {
    "ann_ivf": probe_ann_ivf,
    "semdedup": probe_semdedup,
}


def main() -> int:
    probe = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name=f"phasetime-{probe}")
    for rep in range(reps):
        out: list[tuple[str, float]] = []
        PROBES[probe](spark, sf_dir, out)
        total = sum(dt for _, dt in out)
        print(f"--- rep {rep} total {total:6.3f}s")
        for label, dt in out:
            print(f"  {label:28s} {dt:6.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
