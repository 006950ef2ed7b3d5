"""One-shot deterministic BPE trainer — produces the frozen merge table
embedded in `orionld_to_hive_spark/operators/bpe.py` (FROZEN_MERGES).

Run: `python tools/train_bpe.py [n_merges]` (default 128). Trains on
the sf0.001 documents corpus (the smallest fixture — tokenizers are
trained once on a sample and applied everywhere; the table is FROZEN
so every scale factor tokenizes identically) over the same
pre-tokenizer the engine uses (`operators/text.py::_PRETOK_RE`).

Semantics (identical in this trainer, the Spark apply, and the DuckDB
oracle): a word is encoded as its symbols each wrapped in single
spaces — `" f  a  st "` — i.e. double-space BETWEEN symbols, single
space at the ends; applying merge (a, b) replaces every left-to-right
non-overlapping occurrence of `" a  b "` with `" ab "` (Python
str.replace ≡ Spark `replace` ≡ DuckDB `replace`). The full both-side
delimitation is load-bearing: with bare single-space joins the pattern
`"a s"` also matches inside `"a st"` (symbol `st` has prefix `s`), a
cross-boundary false merge an earlier draft of this trainer actually
produced. Merges are learned greedily: highest total pair count
(adjacent-pair counts weighted by word frequency, overlaps counted),
ties broken by lexicographically smallest (a, b). Training stops early
if the best pair occurs < 2 times. Applying the table in rank order is
equivalent to greedy best-pair-first application for a well-formed
table (merge k's operands are single chars or outputs of merges < k,
so applying merge k can never re-enable an earlier merge); the emitted
table is asserted well-formed before printing.
"""

from __future__ import annotations

import collections
import sys

import duckdb

PRETOK_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"
CORPUS = "/root/testdata/sf0.001/documents.parquet"


def train(n_merges: int) -> list[tuple[str, str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(regexp_extract_all(text, '{PRETOK_RE}')) AS w
              FROM '{CORPUS}')
        GROUP BY w ORDER BY w
        """
    ).fetchall()
    # state: both-side-delimited symbol string per word (" f  a  st ")
    seqs: dict[str, str] = {
        w: " " + "  ".join(w) + " " for w, _ in rows
    }
    counts: dict[str, int] = dict(rows)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, s in seqs.items():
            syms = s.strip(" ").split("  ")
            c = counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        a, b = best
        merges.append(best)
        pat, rep = f" {a}  {b} ", f" {a}{b} "
        seqs = {w: s.replace(pat, rep) for w, s in seqs.items()}
    return merges


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    merges = train(n)
    known: set[str] = set()
    for a, b in merges:
        for x in (a, b):
            assert len(x) == 1 or x in known, (a, b, x)
        known.add(a + b)
    print(f"# trained {len(merges)} merges from {CORPUS}")
    print("FROZEN_MERGES = (")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print(")")
