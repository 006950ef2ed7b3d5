"""Generate the high-end bench ladder point (sf0.3) from sf0.1.

/root/testdata ships sf0.001/0.01/0.1 only; the scaling-curve claim at
the top end needs one more point (VERDICT r4 item 7). This builds a 3x
replica of sf0.1 under <repo>/.ladder/sf0.3 (gitignored, regenerable):

  - every sf-proportional key space (custkey, orderkey, suppkey,
    partkey, user_id, event_id, doc_id) is shifted by replica*OFFSET,
    so referential integrity holds WITHIN each replica and the three
    replicas are disjoint — join/group cardinalities scale 3x, the
    honest scaling for "3x more tenants/users/documents";
  - bounded dims (nation, region) are copied as-is — a 3x corpus does
    not get more nations, so nation-keyed state (pagerank) stays 25
    nodes while edge-derivation work triples;
  - document text is DECORRELATED per replica (identity / reverse /
    upper) so the near-dup pair structure scales 3x instead of every
    doc gaining two exact cross-replica twins (which would measure a
    different problem);
  - events keep their timestamps — 3x event density per hour, i.e.
    sessionization state and window fan-in scale 3x.

Usage: python tools/gen_ladder.py [0.3|1.0] (default 0.3; idempotent;
sf0.3 ~70 MB, sf1.0 ~240 MB). The r6 sf1.0 point (VERDICT r5 item 5)
uses the same construction with 10 replicas; decorrelation variants
3..9 are per-replica Caesar rotations (bijective character maps keep
every replica's internal shingle/similarity structure while killing
cross-replica matches) and, for embeddings, coordinate rotations ±
negation (isometries — internal pairwise distances preserved).
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
LADDER_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ladder"
)
OFFSET = 10_000_000

# table -> list of key columns to shift by replica*OFFSET
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["nation", "region"]

# per-replica text decorrelation for documents (keeps intra-replica
# similarity structure, kills cross-replica near-dups). 0-2 unchanged
# from the original sf0.3 build (comparability of that ladder point);
# 3+ are Caesar rotations.
ABC = "abcdefghijklmnopqrstuvwxyz"


def _text_variant(i: int) -> str:
    if i == 0:
        return "text"
    if i == 1:
        return "reverse(text)"
    if i == 2:
        return "upper(text)"
    r = i - 2
    rot = ABC[r:] + ABC[:r]
    return (
        f"translate(text, '{ABC}{ABC.upper()}', '{rot}{rot.upper()}')"
    )

# same idea for embedding vectors: a fixed per-replica isometry
# (identity / dimension reversal / negation) preserves every replica's
# internal pairwise-distance structure while killing cross-replica
# exact twins — otherwise every vector would gain two perfect
# duplicates and near-dup/top-k queries would measure a different
# problem than "3x more vectors".
def _vec_variant(i: int) -> str:
    if i == 0:
        return "embedding"
    if i == 1:
        return "list_reverse(embedding)"
    if i == 2:
        return "list_transform(embedding, x -> -x)"
    r = 6 * (i - 2)  # coordinate rotation: a permutation = isometry
    rolled = f"list_concat(embedding[{r + 1}:], embedding[1:{r}])"
    if i % 2:
        return f"list_transform({rolled}, x -> -x)"
    return rolled


def main() -> None:
    import sys

    scale = sys.argv[1] if len(sys.argv) > 1 else "0.3"
    replicas = {"0.3": 3, "1.0": 10}[scale]
    dst = os.path.join(LADDER_ROOT, f"sf{scale}")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, keys in SHIFT.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        required = list(keys)
        if t == "documents":
            required.append("text")  # TEXT_VARIANT target
        if t == "embeddings":
            required.append("embedding")  # VEC_VARIANT target
        missing = [k for k in required if k not in cols]
        if missing:
            # a typo'd key (or renamed variant column) would otherwise
            # silently copy the replicas verbatim, violating the
            # disjoint-key / decorrelation contract above
            raise SystemExit(f"{t}: required columns {missing} not in {cols}")
        parts = []
        for i in range(replicas):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {i * OFFSET} AS {c}")
                elif t == "documents" and c == "text":
                    sel.append(f"{_text_variant(i)} AS text")
                elif t == "embeddings" and c == "embedding":
                    sel.append(f"{_vec_variant(i)} AS embedding")
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
