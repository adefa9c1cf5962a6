"""End-to-end composition of the training-data path on real testdata:

    prepare_corpus → bpe_fit/bpe_encode → export_training_shards (by BPE
    token counts) → pack_sequences

Each stage is tested in isolation elsewhere; this pins that they COMPOSE —
ids survive every hand-off, token accounting is consistent across stages,
and the whole path is deterministic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtstore_spark.operators.pipeline import (
    CorpusPrepConfig,
    export_training_shards,
    pack_sequences,
    prepare_corpus,
)
from rtstore_spark.operators.tokenizer import bpe_encode, bpe_fit


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = prepare_corpus(
        docs, "text", "doc_id",
        CorpusPrepConfig(min_tokens=2, near_dup_threshold=0.5),
    )
    assert out.count() > 0
    return out


def test_prep_output_is_subset_with_lang(spark, sf_dir, corpus):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert "lang" in corpus.columns
    extra = corpus.join(docs.select("doc_id"), "doc_id", "left_anti")
    assert extra.count() == 0  # prep never invents rows


def test_bpe_then_shards_accounts_every_kept_doc(spark, corpus, tmp_path):
    model = bpe_fit(corpus, "text", n_merges=80, min_count=2)
    enc = bpe_encode(corpus, "text", "doc_id", model)
    with_tokens = corpus.join(enc.select("doc_id", "n_tokens"), "doc_id")
    assert with_tokens.count() == corpus.count()  # encode covers all docs

    manifest = export_training_shards(
        with_tokens, str(tmp_path / "shards"), "doc_id",
        token_col="n_tokens", n_shards=4,
    )
    back = spark.read.parquet(str(tmp_path / "shards"))
    # every kept doc lands in exactly one shard; BPE token mass conserved
    assert back.count() == corpus.count()
    assert (
        back.select("doc_id").distinct().count() == corpus.count()
    )
    assert back.agg(F.sum("n_tokens")).collect()[0][0] == with_tokens.agg(
        F.sum("n_tokens")
    ).collect()[0][0]
    assert manifest["n_shards"] == 4


def test_pack_covers_prepared_corpus_exactly_once(corpus):
    packed = pack_sequences(corpus, "text", "doc_id", seq_tokens=64, n_buckets=8)
    ids_in = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    ids_out = [
        i for r in packed.select("doc_ids").collect() for i in r["doc_ids"]
    ]
    # every prepared doc appears; none appears in two sequences unless it
    # was budget-split (split pieces carry the same id — count >= 1)
    assert set(ids_out) == ids_in
    # whitespace-token conservation across the pack
    n_in = corpus.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n")
    ).collect()[0]["n"]
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == n_in


def test_path_is_deterministic_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = CorpusPrepConfig(min_tokens=2, near_dup_threshold=0.5)
    a = prepare_corpus(docs.repartition(2), "text", "doc_id", cfg)
    b = prepare_corpus(docs.repartition(16), "text", "doc_id", cfg)
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in b.select("doc_id").collect()
    )
    ma = bpe_fit(a, "text", n_merges=40, min_count=2)
    mb = bpe_fit(b, "text", n_merges=40, min_count=2)
    assert ma["merges"] == mb["merges"]
