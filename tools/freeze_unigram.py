"""One-off: train the unigram-LM vocabulary on sf0.01 and freeze it
into orionld_to_hive_spark/operators/unigram_frozen.py (the analog of
bpe.FROZEN_MERGES). tests/test_unigram.py re-runs the trainer and
asserts byte-identical reproduction."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
OUT = "/root/repo/orionld_to_hive_spark/operators/unigram_frozen.py"


def main() -> None:
    from orionld_to_hive_spark.session import get_spark
    from orionld_to_hive_spark.operators import unigram

    spark = get_spark()
    table = unigram.train_unigram(spark, SF)
    with open(OUT, "w") as f:
        f.write(
            '"""Frozen unigram-LM vocabulary — trained ONCE by\n'
            "tools/freeze_unigram.py (train_unigram on testdata sf0.01,\n"
            f"vocab_size={unigram.VOCAB_SIZE}, em_iters={unigram.EM_ITERS}); "
            "lp values are micro-nat\nintegers (ln p · 1e6, "
            'floor-rounded). Do not edit by hand."""\n\n'
            "FROZEN_UNIGRAM = (\n"
        )
        for piece, lp in table:
            f.write(f"    ({piece!r}, {lp}),\n")
        f.write(")\n")
    print(f"froze {len(table)} pieces to {OUT}")


if __name__ == "__main__":
    main()
