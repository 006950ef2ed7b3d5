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

Usage: python tools/gen_ladder.py  (idempotent; ~50 MB)
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".ladder", "sf0.3")
OFFSET = 10_000_000
REPLICAS = 3

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
# similarity structure, kills cross-replica near-dups)
TEXT_VARIANT = {0: "text", 1: "reverse(text)", 2: "upper(text)"}

# same idea for embedding vectors: a fixed per-replica isometry
# (identity / dimension reversal / negation) preserves every replica's
# internal pairwise-distance structure while killing cross-replica
# exact twins — otherwise every vector would gain two perfect
# duplicates and near-dup/top-k queries would measure a different
# problem than "3x more vectors".
VEC_VARIANT = {
    0: "embedding",
    1: "list_reverse(embedding)",
    2: "list_transform(embedding, x -> -x)",
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{DST}/{t}.parquet' (FORMAT PARQUET)"
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
        for i in range(REPLICAS):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {i * OFFSET} AS {c}")
                elif t == "documents" and c == "text":
                    sel.append(f"{TEXT_VARIANT[i]} AS text")
                elif t == "embeddings" and c == "embedding":
                    sel.append(f"{VEC_VARIANT[i]} AS embedding")
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
