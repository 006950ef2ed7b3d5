"""Streaming token accounting ≡ batch bpe_token_accounting.

Counts are associative, so any micro-batch split of the corpus must
produce byte-identical totals (including the read-time-derived ratio
columns); a replayed batch must not double-count."""

from __future__ import annotations

from orionld_to_hive_spark.operators.bpe import bpe_token_accounting
from orionld_to_hive_spark.sources.warehouse import load_table
from orionld_to_hive_spark.streaming.tokens import StreamingTokenAccounting


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_accounting_equals_batch(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source", "text"
    )
    acct = StreamingTokenAccounting(str(tmp_path / "tok"))

    in_dir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = acct.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    n_batches = (
        spark.read.parquet(str(tmp_path / "tok" / "partials"))
        .select("batch_id").distinct().count()
    )
    assert n_batches > 1
    assert _rows(acct.accounting(spark)) == _rows(
        bpe_token_accounting(spark, sf_smoke)
    )


def test_replayed_batch_does_not_double_count(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source", "text"
    )
    acct = StreamingTokenAccounting(str(tmp_path / "tok"))
    chunk = docs.limit(60)
    acct.write_batch(chunk, batch_id=0)
    before = _rows(acct.accounting(spark))
    acct.write_batch(chunk, batch_id=0)  # checkpoint replay
    assert _rows(acct.accounting(spark)) == before


def test_accounting_before_any_batch_names_bootstrap_step(
    spark, tmp_path
):
    """r9 (r8 ADVICE): reading the totals view before any batch must
    raise the bootstrap contract, not a path-missing
    AnalysisException."""
    import pytest

    from orionld_to_hive_spark.streaming.tokens import (
        StreamingTokenAccounting,
    )

    acc = StreamingTokenAccounting(str(tmp_path / "none"))
    with pytest.raises(RuntimeError, match="write_batch"):
        acc.accounting(spark)


def test_unigram_stream_accounting_equals_batch(spark, sf_smoke, tmp_path):
    # the pluggable-tokenizer path: identical stream ≡ batch identity
    # under the frozen unigram-LM vocabulary
    from orionld_to_hive_spark.operators.unigram import unigram_token_accounting
    from orionld_to_hive_spark.streaming.tokens import batch_partials_unigram

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source", "text"
    )
    acct = StreamingTokenAccounting(
        str(tmp_path / "utok"), partials_fn=batch_partials_unigram
    )
    in_dir = str(tmp_path / "uin")
    docs.repartition(3).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = acct.start(stream, checkpoint_dir=str(tmp_path / "uckpt"))
    q.awaitTermination(120)
    assert _rows(acct.accounting(spark)) == _rows(
        unigram_token_accounting(spark, sf_smoke)
    )
    # (replay idempotence of the batch_id-overwrite mechanism is
    # pinned by test_replayed_batch_does_not_double_count above — the
    # mechanism is tokenizer-agnostic, shared by both partials_fn's)
