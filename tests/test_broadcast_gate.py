"""Source-level gate: no forced F.broadcast() on sf-proportional frames.

VERDICT r3 finding: explicit `F.broadcast()` hints on orders/customer/
supplier/part-derived frames (and on vocabulary-cardinality text/LM
tables) are correct and fast at bench scale but OOM fuel at the 100 TB
design point — the hint bypasses `autoBroadcastJoinThreshold`, so Spark
attempts the broadcast regardless of runtime size. The fix (round 4)
removed every such hint; join strategy for sf-proportional sides is
AQE's call (it still broadcasts them while genuinely small).

This gate makes the discipline permanent: every `F.broadcast(<arg>)`
call site in the package is AST-scanned and the identifiers inside
<arg> must come from the allowlist below — names that denote genuinely
bounded frames (nation/region dims, 1-row scalar aggregates, k-bounded
centroid/sketch/probe tables, capped top-V vocabularies). Adding a new
hint on a frame whose cardinality scales with the data requires
consciously extending the allowlist, which is exactly the review
friction the gate exists to create.

r5 (ADVICE fix): the allowlist is scoped PER MODULE — generic local
names like `stats` or `ref` are only allowed in the file where the
bounded frame was reviewed, so a future sf-proportional frame reusing
one of those names in another module still trips the gate.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "orionld_to_hive_spark"

# (module, identifier) pairs that may appear inside an F.broadcast(...)
# argument. Every entry is bounded-cardinality BY CONSTRUCTION in that
# module (not merely small at bench scale); the module scoping means a
# same-named frame elsewhere gets no free pass.
ALLOWED = {
    # analytics.py: 1-row/per-bounded-group aggregates
    ("analytics.py", "med"), ("analytics.py", "bounds"),
    ("analytics.py", "stats"), ("analytics.py", "n_orders_df"),
    ("analytics.py", "mad"), ("analytics.py", "cuts"),
    ("analytics.py", "sa"), ("analytics.py", "sb"),
    ("analytics.py", "ref"),
    # curation.py: 1-row totals / fixed-bin histograms / vocab-size scalar
    ("curation.py", "total_df"), ("curation.py", "hist"),
    ("curation.py", "totals"), ("curation.py", "thresh"),
    ("curation.py", "v_df"),
    # dedup.py / similarity.py: capped query sets, k-bounded centroids,
    # per-bounded-group stats, k-point CDF
    ("dedup.py", "queries"), ("similarity.py", "queries"),
    ("similarity.py", "cent"), ("similarity.py", "centroids"),
    ("similarity.py", "stats"), ("similarity.py", "cdf"),
    # similarity.py: K-bounded NORMALIZED centroid frame (SemDeDup)
    ("similarity.py", "ncdf"),
    # similarity.py: LSH_BITS-row per-bit median threshold table
    ("similarity.py", "thr"),
    # similarity.py: N_QUERIES × ANN_IVF_PROBES probed-cell rows (r11)
    ("similarity.py", "cells"),
    # graph.py: ≤25-node nation-keyed state / 1-row dangling-mass agg
    ("graph.py", "out_w"), ("graph.py", "nation"), ("graph.py", "dm"),
    # sketches.py: ≤ d×w counters / ≤ m bit positions / 20-row exact set
    ("sketches.py", "cm"), ("sketches.py", "bits"),
    ("sketches.py", "exact"),
    # stats.py: 1-row or bounded-group marginals
    ("stats.py", "total"), ("stats.py", "row_m"), ("stats.py", "col_m"),
    ("stats.py", "cuts"),
    # subqueries.py: 1-row global average
    ("subqueries.py", "global_avg"),
    # temporal.py: 1-row bounds / bounded calendar intervals
    ("temporal.py", "bounds"), ("temporal.py", "iv"),
    # text.py: 1-row totals and capped top-V vocab; the eval-benchmark
    # n-gram set is a fixed corpus, not sf-proportional
    ("text.py", "totals"), ("text.py", "total_df"),
    ("text.py", "vocab"), ("text.py", "eval_g"),
    # streaming/contamination.py: the same fixed eval-benchmark gram
    # set as text.py's eval_g — bounded by the eval suite, not sf
    ("contamination.py", "eval_g"),
    ("text.py", "n_docs"), ("text.py", "n_uni"), ("text.py", "n_bi"),
    ("text.py", "avg_dl"),
    # tpch.py / tpch2.py: nation/region dims and their ≤25-row
    # derivations, 1-row scalars
    ("tpch.py", "region"), ("tpch.py", "asia_nations"),
    ("tpch.py", "max_rev"),
    ("tpch2.py", "region"), ("tpch2.py", "eu_nations"),
    ("tpch2.py", "nation"), ("tpch2.py", "asia_keys"),
    ("tpch2.py", "total_df"), ("tpch2.py", "avg_pos"),
    # streaming/joins.py: static room-config dim
    ("joins.py", "room_dim"),
    # frontier.py: host-keyed robots rule / crawl-delay frames — the
    # fixture host universe is 10 rows (distinct over ex-0..ex-9), and
    # in production rules-per-host is host-metadata-sized, not sf
    ("frontier.py", "rules"), ("frontier.py", "delays"),
}

# Names allowed in any module: the functions alias itself (walking the
# arg AST sees the `F` in `F.broadcast(x.withColumn(...))` chains).
ALLOWED_GLOBAL = {"F"}

# Names that must NEVER appear inside a broadcast hint in ANY module:
# sf-proportional base tables and their conventional local aliases, plus
# the vocabulary-cardinality LM/DF tables the r3 verdict flagged.
DENIED = {
    "orders", "cust", "customer", "supp", "supplier", "li", "lineitem",
    "part", "ps", "big", "excluded", "supp_nation", "df_", "lm", "cu",
    "uni", "ev", "docs", "emb", "words", "tf", "counts", "edges", "raw",
    "rev", "codes",
}


def _broadcast_sites():
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
            ):
                names = {
                    n.id
                    for a in node.args
                    for n in ast.walk(a)
                    if isinstance(n, ast.Name)
                }
                yield path, node.lineno, names


def test_no_fact_scale_broadcast_hints():
    violations = []
    for path, lineno, names in _broadcast_sites():
        bad = {
            n
            for n in names - ALLOWED_GLOBAL
            if (path.name, n) not in ALLOWED
        }
        if bad:
            violations.append(f"{path.name}:{lineno} broadcasts {sorted(bad)}")
    assert not violations, (
        "F.broadcast() hint on a non-allowlisted frame — if the frame is "
        "genuinely bounded, add (module, name) to ALLOWED in "
        "test_broadcast_gate.py; if it scales with sf, drop the hint and "
        "let AQE choose:\n" + "\n".join(violations)
    )


def test_denylist_disjoint_from_allowlist():
    # a name can't be both; keeps future edits honest
    assert not ({n for _, n in ALLOWED} & DENIED)
    assert not (ALLOWED_GLOBAL & DENIED)


def test_fact_aliases_never_hinted():
    for path, lineno, names in _broadcast_sites():
        hits = names & DENIED
        assert not hits, f"{path.name}:{lineno} hints fact-scale {sorted(hits)}"
