"""Deterministic sampling + benchmark-contamination ops for training-data
pipelines.

Both are corpus-scale primitives a 100-TB data-prep run needs constantly:

- ``stratified_sample``: hash-gated sampling — ``md5(id) mod M < f·M`` —
  so the sample is reproducible across runs/engines (no RNG state, no
  ``sampleBy`` seed drift between Spark versions), is a pure pushed-down
  filter (no shuffle, no sort), and composes per-stratum fractions.
- ``ngram_contamination``: which corpus documents share word n-grams with a
  benchmark set (train/test leakage scan). Both sides explode to hashed
  n-grams; the join is bucket-bounded by the n-gram hash and the benchmark
  side is tiny (broadcast), so the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 1e6 buckets: fraction resolution 1e-6, far below sampling noise at scale
_BUCKETS = 1_000_000


def _hash_bucket(col: Column) -> Column:
    """Deterministic bucket in [0, 1e6): first 8 md5 hex chars as int.
    Engine-agnostic (DuckDB: ('0x'||substr(md5(x),1,8))::BIGINT % buckets)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % _BUCKETS


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | float,
    strata_col: str | None = None,
    seed: str = "sample",
) -> DataFrame:
    """Keep a deterministic fraction of rows, optionally per stratum.

    ``fractions``: one float for a uniform sample, or {stratum: fraction}
    with unlisted strata dropped — the usual shape for language/source
    rebalancing. The gate hashes (seed, id), so different seeds draw
    independent samples and the same seed always reproduces the same rows.
    """
    bucket = _hash_bucket(F.concat_ws(":", F.lit(seed), F.col(id_col)))
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("strata_col is required with per-stratum fractions")
        pred = F.lit(False)
        for stratum, frac in fractions.items():
            pred = pred | (
                (F.col(strata_col) == stratum)
                & (bucket < int(frac * _BUCKETS))
            )
        return df.filter(pred)
    return df.filter(bucket < int(float(fractions) * _BUCKETS))


def _word_ngrams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram) — distinct lowercased word n-grams; docs shorter than
    ``n`` tokens emit nothing.

    Delegates to ``dedup.shingles``'s zip_with chain so the tokenizing
    ``split`` runs once per row. The previous formulation aliased the split
    as ``_t`` and referenced it inside a ``transform(sequence(...), i ->
    slice(_t, ...))`` lambda — Catalyst inlines project aliases into
    higher-order-function lambdas with no CSE, so the regex split re-ran
    per sequence element: O(tokens²) per row despite the old comment's
    claim, the exact trap ``dedup.shingles``'s docstring describes.
    """
    from rtstore_spark.operators.dedup import shingles

    lowered = df.select(
        F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("_text")
    )
    return shingles(
        lowered, "_text", "id", n=n, distinct=True, keep_short=False
    ).withColumnRenamed("shingle", "gram")


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Train/test leakage scan: corpus docs sharing ≥1 word ``n``-gram with
    any benchmark doc → (corpus_id, bench_id, shared_ngrams).

    The benchmark grams (small side) broadcast; the corpus explodes
    map-locally and aggregates once on (corpus_id, bench_id). Long grams
    (n=8 default) make coincidental overlap essentially impossible, the
    standard decontamination setting.
    """
    c = _word_ngrams(corpus, text_col, id_col, n).withColumnRenamed(
        "id", "corpus_id"
    )
    b = _word_ngrams(benchmark, text_col, id_col, n).withColumnRenamed(
        "id", "bench_id"
    )
    return (
        c.join(F.broadcast(b), "gram")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
