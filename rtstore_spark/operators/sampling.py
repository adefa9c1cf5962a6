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


def mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    token_col: str,
    total_tokens: int,
    seed: str = "mixture",
) -> DataFrame:
    """Sample a training mixture to a token budget with target domain
    weights — the "domain mixing" step of every large pretraining run
    (e.g. 60% web / 20% code / 20% books into a 1T-token budget).

    One tiny aggregate (total tokens per domain — O(domains) rows
    collected) sizes the per-domain keep fraction
    ``f_d = min(1, budget · w_d / tokens_d)``; the keep gate is then the
    same deterministic hash filter as ``stratified_sample`` — a pure
    pushed-down predicate, the corpus never shuffles, and the same seed
    always reproduces the same mixture. Domains absent from ``weights``
    (or weighted 0) are dropped.

    A domain with fewer tokens than its target caps at ``f_d = 1`` — an
    engine cannot invent data — so the realized mixture under-weights it.
    That is returned as-is (not silently re-normalized): report realized
    vs target and decide upsampling policy explicitly upstream.

    Sampling is per-document; the realized token count concentrates
    tightly around the target when documents ≪ budget (CLT over doc
    lengths) — exact-token trimming would need a global running sum
    (one-task sequential scan), the wrong trade at corpus scale.
    """
    totals = {
        r["d"]: r["t"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    fractions = {}
    for domain, w in weights.items():
        avail = totals.get(domain, 0) or 0
        if avail <= 0 or w <= 0:
            continue
        fractions[domain] = min(1.0, total_tokens * float(w) / float(avail))
    return stratified_sample(
        df, id_col, fractions, strata_col=domain_col, seed=seed
    )


def mixture_stats(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    temperature: float = 1.0,
) -> DataFrame:
    """Per-domain corpus statistics + proposed sampling weights — the
    sizing report that feeds ``mixture_sample``.

    Returns one row per domain: ``domain, n_docs, n_tokens, mean_tokens,
    token_share, weight`` where ``weight`` is the temperature-scaled
    share ``share^(1/T)`` renormalized to sum 1 (multinomial temperature
    sampling, the standard pretraining-mixture formula):

    - T = 1 → proportional (weights == token shares),
    - T > 1 → flattened toward uniform (upweights small domains — e.g.
      T = 3.33 ≈ the common α = 0.3 exponent),
    - T → 0⁺ → concentrates on the largest domain.

    One partial-agg shuffle of O(domains) rows; the renormalization runs
    over the aggregated rows only (a single-partition window over domains
    — ≤ thousands of rows by construction, never the corpus).
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    from pyspark.sql import Window

    agg = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("n_tokens"),
    )
    everything = Window.partitionBy(F.lit(1))
    # staged: a window aggregate cannot nest another window expression,
    # so share materializes as a column before the weight normalization
    with_share = agg.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("n_docs"), 2).alias("mean_tokens"),
        (F.col("n_tokens") / F.sum("n_tokens").over(everything)).alias("_share"),
    )
    scaled = F.pow(F.col("_share"), F.lit(1.0 / temperature))
    return with_share.select(
        "domain",
        "n_docs",
        "n_tokens",
        "mean_tokens",
        F.round(F.col("_share"), 6).alias("token_share"),
        F.round(scaled / F.sum(scaled).over(everything), 6).alias("weight"),
    )


def _word_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int, distinct: bool = True
) -> DataFrame:
    """(id, gram) — lowercased word n-grams (``distinct=True`` for set
    semantics; ``False`` keeps the multiset and skips that shuffle — the
    DSIR counting path); docs shorter than ``n`` tokens emit nothing.

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
        lowered, "_text", "id", n=n, distinct=distinct, keep_short=False
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


def _gram_bucket(col: Column, n_buckets: int) -> Column:
    """Feature bucket in [0, n_buckets) off 12 md5 hex chars (48 bits):
    modulo bias ≤ n_buckets/2^48, and NOT layered on ``_hash_bucket``
    (whose own mod-1e6 would cap the space at 1e6 and skew any
    non-divisor n_buckets). DuckDB replay:
    ``('0x' || substr(md5(g), 1, 12))::BIGINT % n_buckets``."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long") % n_buckets


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 10_000,
    ngram_n: int = 2,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, *Data Selection for
    Language Models via Importance Resampling*): score every raw document
    by how much more likely its hashed n-gram features are under the
    TARGET distribution (e.g. curated wiki/books) than under the raw
    corpus itself. Selecting by these weights shifts the pretraining
    mixture toward the target domain without training a classifier.

    Model: both corpora are reduced to unigram distributions over
    ``n_buckets`` hashed word-``ngram_n``-gram buckets (the paper's
    hashed n-gram feature space; add-``smoothing`` Laplace smoothing so
    unseen buckets stay finite). A document's log-weight is
    Σ_features log p_target(bucket) − log p_raw(bucket).

    Returns (id, n_features, log_w) for every raw doc — docs too short
    for a full n-gram get log_w = 0 (no evidence either way). Feed to
    ``dsir_topk`` for the actual resampling.

    Scale shape: each corpus is exploded ONCE for its bucket-count
    groupBy (output ≤ n_buckets rows — small enough to COLLECT), the
    log-ratio table is computed driver-side and re-enters the plan as a
    guaranteed-broadcast local relation, and the raw corpus's single
    scoring pass is explode → broadcast join → per-doc partial agg —
    text never shuffles, no corpus-sized relation is ever on the build
    side, and Catalyst cannot mis-estimate a local table's size.
    """
    import math

    if n_buckets < 1:
        raise ValueError("n_buckets must be positive")

    def bucket_counts(df_: DataFrame) -> dict[int, int]:
        sh = _word_ngrams(df_, text_col, id_col, ngram_n, distinct=False)
        rows = (
            sh.groupBy(_gram_bucket(F.col("gram"), n_buckets).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {int(r["bucket"]): int(r["c"]) for r in rows}

    tc, rc = bucket_counts(target), bucket_counts(raw)
    t_den = float(sum(tc.values())) + smoothing * n_buckets
    r_den = float(sum(rc.values())) + smoothing * n_buckets
    ratio_rows = [
        (
            b,
            math.log((tc.get(b, 0) + smoothing) / t_den)
            - math.log((rc.get(b, 0) + smoothing) / r_den),
        )
        for b in sorted(set(tc) | set(rc))
    ]
    spark = raw.sparkSession
    ratio = spark.createDataFrame(ratio_rows, "bucket LONG, log_ratio DOUBLE")
    feats = _word_ngrams(raw, text_col, id_col, ngram_n, distinct=False).select(
        "id", _gram_bucket(F.col("gram"), n_buckets).alias("bucket")
    )
    scored = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("log_ratio").alias("log_w"),
        )
    )
    all_ids = raw.select(F.col(id_col).alias("id"))
    return all_ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_features", F.lit(0)).alias("n_features"),
        F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
    )


def dsir_topk(
    weights: DataFrame,
    n: int,
    temperature: float = 1.0,
    seed: str = "dsir",
) -> DataFrame:
    """Gumbel top-k resampling over ``dsir_weights`` output: selecting the
    ``n`` largest ``log_w/temperature + Gumbel(id)`` keys samples without
    replacement proportional to ``w^(1/temperature)`` (the Gumbel-max
    trick) — deterministically, because the Gumbel noise derives from
    ``md5(seed, id)`` instead of an RNG: same corpus + seed ⇒ the same
    selection on any cluster, any partitioning. The noise has 48-bit
    resolution (u from 12 md5 hex chars), so the distribution is exact
    up to that discretization: Gumbel values truncate at ≈ ±33, i.e. a
    doc whose log-weight deficit exceeds ~66/temperature is effectively
    unsampleable — at that probability (< 2^-48) so is a real RNG draw.

    Returns the selected (id, log_w, key) rows. One projection + a
    TakeOrdered (per-partition heaps, no global sort); at 100 TB the
    only moving data is n winner rows.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    res = float(1 << 48)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + ":"), F.col("id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(res)  # uniform in (0, 1), deterministic per id, 48-bit grid
    gumbel = -F.log(-F.log(u))
    key = F.col("log_w") / F.lit(float(temperature)) + gumbel
    return (
        weights.select("id", "log_w", key.alias("key"))
        .orderBy(F.col("key").desc(), F.col("id"))
        .limit(n)
    )
