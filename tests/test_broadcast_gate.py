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
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "orionld_to_hive_spark"

# Identifiers that may appear inside an F.broadcast(...) argument.
# Every name here is bounded-cardinality BY CONSTRUCTION (not merely
# small at bench scale):
ALLOWED = {
    # module alias (F.broadcast(bits.withColumn(...)) walks the F too)
    "F",
    # nation/region dims and their ≤25-row derivations
    "nation", "region", "asia_nations", "asia_keys", "eu_nations",
    # 1-row scalar aggregates (global totals / bounds / thresholds)
    "total", "totals", "total_df", "n_docs", "n_uni", "n_bi", "avg_dl",
    "n_orders_df", "global_avg", "avg_pos", "max_rev", "dm", "thresh",
    "v_df",
    # per-group stats where the group key is bounded (event_type ≤ 5,
    # label ≤ few, brand ≤ 25, dow ≤ 7): one row per group
    "stats", "bounds", "med", "mad", "cuts", "row_m", "col_m",
    "sa", "sb", "ref", "hist",
    # ≤25-node graph state (nation-keyed)
    "out_w",
    # fixed small probe/query sets and k-bounded centroid tables
    "queries", "cent", "centroids", "cdf", "exact",
    # sketch tables: ≤ d×w counters / ≤ m bit positions (constants)
    "cm", "bits",
    # capped top-V vocabulary (explicit bound, text.py vocab_coverage)
    # and the 1-row vocab-size scalar (bigram LM's V)
    "vocab",
    # eval-benchmark n-gram set (contamination screen: the eval corpus
    # is a fixed benchmark, not sf-proportional)
    "eval_g",
    # bounded interval dims (calendar windows / static room config)
    "iv", "room_dim",
}

# Names that must NEVER appear inside a broadcast hint: sf-proportional
# base tables and their conventional local aliases, plus the
# vocabulary-cardinality LM/DF tables the r3 verdict flagged.
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
        bad = names - ALLOWED
        if bad:
            violations.append(f"{path.name}:{lineno} broadcasts {sorted(bad)}")
    assert not violations, (
        "F.broadcast() hint on a non-allowlisted frame — if the frame is "
        "genuinely bounded, extend ALLOWED in test_broadcast_gate.py; if "
        "it scales with sf, drop the hint and let AQE choose:\n"
        + "\n".join(violations)
    )


def test_denylist_disjoint_from_allowlist():
    # a name can't be both; keeps future edits honest
    assert not (ALLOWED & DENIED)


def test_fact_aliases_never_hinted():
    for path, lineno, names in _broadcast_sites():
        hits = names & DENIED
        assert not hits, f"{path.name}:{lineno} hints fact-scale {sorted(hits)}"
