"""Interpolated bigram language-model quality filter (CCNet-style).

Perplexity of a small n-gram LM over a document is a standard corpus-prep
quality signal (Wenzek et al., *CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data*, 2019): documents whose token stream the LM
finds surprising (boilerplate, lists, encoding noise, wrong language) score
a high cross-entropy and can be filtered or bucketed by it. The reference
engine has no analog (its query surface is document CRUD + JQL — SURVEY
§2.3-2.6); this operator belongs to the training-data-prep family the
Spark build adds on top.

Scale design
------------
``lm_fit`` is two partial-agg shuffles keyed on *words* — the shuffled row
count is bounded by the vocabulary, not the corpus (groupBy count does
map-side combine, so each executor emits one row per distinct word/bigram
it saw). Both tables are then pruned to the ``max_unigrams`` /
``max_bigrams`` most frequent entries (a TakeOrdered — bounded driver
memory), which makes the *model size a knob independent of corpus size*:
at 100 TB the raw bigram vocabulary is billions of rows, but a 1M-entry
pruned LM with unigram+floor backoff is the standard trade (CCNet ships a
pruned KenLM for the same reason) and small enough to broadcast to every
executor at score time. ``lm_perplexity`` is then two broadcast-joins on
word keys plus one partial-agg per doc — no corpus-side shuffle at all
when the model fits the broadcast threshold.

Probability model: interpolated bigram with a floor,

    p(w2 | w1) = lam * p_big(w2 | w1) + (1 - lam) * p_uni(w2)

where ``p_big = c(w1 w2) / c(w1)`` (0 when the bigram was unseen or
pruned) and ``p_uni = c(w2) / total`` with floor ``1 / total`` for
out-of-vocabulary words — so every token has p > 0 and the cross-entropy
is always finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    """Lowercased whitespace tokens — the library-wide convention
    (``text.token_count`` / ``dedup.shingles`` split the same way)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair, multiset semantics
    (``id_col=None`` for corpus-level counting where the id is irrelevant).

    zip_with over two shifted slices keeps the words as separate struct
    fields (no concat-then-split round trip) and stays shuffle-free:
    scan → project → explode. Docs with < 2 tokens emit nothing (a doc
    without a bigram has no bigram cross-entropy).
    """
    id_expr = F.lit(0) if id_col is None else F.col(id_col)
    t = df.select(id_expr.alias("id"), _tokens(text_col).alias("toks"))
    pair = F.expr(
        "explode(zip_with(slice(toks, 1, size(toks) - 1),"
        " slice(toks, 2, size(toks) - 1),"
        " (a, b) -> struct(a AS w1, b AS w2)))"
    )
    return (
        t.filter(F.size("toks") >= 2)
        .select("id", pair.alias("p"))
        .select("id", "p.w1", "p.w2")
    )


def lm_fit(
    df: DataFrame,
    text_col: str,
    max_unigrams: int = 250_000,
    max_bigrams: int = 1_000_000,
) -> dict:
    """Fit the pruned interpolated bigram LM on a (reference) corpus.

    Returns ``{"unigrams": DataFrame(w2, p_uni), "bigrams":
    DataFrame(w1, w2, p_big), "total_tokens": int}``. Conditional
    probabilities are computed against the *unpruned* unigram counts (so
    pruning never inflates p_big), then both tables are cut to the most
    frequent entries with a deterministic (count desc, word asc) tie-break.
    Persist the two tables (they are the model) and pass them to
    ``lm_perplexity``; they are small by construction — see module
    docstring for why that is the 100-TB-safe shape.
    """
    # the unigram table feeds three consumers across separate actions
    # (total collect now, the bigram conditional join, the pruned unigram
    # table later) — persist pins ONE corpus scan + agg for all of them;
    # the table itself is vocab-sized, so the cache is small. The total
    # collect below doubles as the materializing action. Lifetime: the
    # entry stays cached until the session ends (the returned model's
    # lineage references it); a driver fitting MANY models should
    # lm_save/lm_load to parquet or spark.catalog.clearCache() between.
    from pyspark import StorageLevel

    uni = (
        df.select(F.explode(_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = uni.agg(F.sum("c").alias("s")).collect()[0]["s"] or 1
    big = (
        _doc_bigrams(df, text_col, None)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigrams = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .select("w1", "w2", (F.col("c") / F.col("c1")).alias("p_big"), "c")
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(max_bigrams)
        .drop("c")
    )
    unigrams = (
        uni.orderBy(F.col("c").desc(), "w")
        .limit(max_unigrams)
        .select(F.col("w").alias("w2"), (F.col("c") / F.lit(float(total))).alias("p_uni"))
    )
    return {"unigrams": unigrams, "bigrams": bigrams, "total_tokens": int(total)}


def lm_perplexity(
    df: DataFrame,
    model: dict,
    text_col: str,
    id_col: str,
    lam: float = 0.9,
) -> DataFrame:
    """Per-document cross-entropy / perplexity under a ``lm_fit`` model.

    Returns (id, n_bigrams, cross_entropy, ppl); docs with < 2 tokens are
    absent (no bigrams to score). The model tables join on word keys; with
    a pruned model they sit under the broadcast threshold, so the corpus
    side never shuffles — the only exchange is the per-doc partial agg.
    """
    floor = 1.0 / float(model["total_tokens"])
    p = (
        F.lit(lam) * F.coalesce(F.col("p_big"), F.lit(0.0))
        + F.lit(1.0 - lam) * F.coalesce(F.col("p_uni"), F.lit(floor))
    )
    scored = (
        _doc_bigrams(df, text_col, id_col)
        .join(model["bigrams"], ["w1", "w2"], "left")
        .join(model["unigrams"], ["w2"], "left")
        .select("id", (-F.log(p)).alias("nll"))
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("nll").alias("cross_entropy"),
        F.exp(F.avg("nll")).alias("ppl"),
    )


def lm_save(model: dict, path: str) -> None:
    """Persist a fitted LM: two small parquet tables + the scalar total
    (stored as a one-row table — a reader needs no side channel)."""
    model["unigrams"].coalesce(1).write.mode("overwrite").parquet(path + "/unigrams")
    model["bigrams"].coalesce(1).write.mode("overwrite").parquet(path + "/bigrams")
    spark = model["unigrams"].sparkSession
    spark.createDataFrame(
        [(int(model["total_tokens"]),)], ["total_tokens"]
    ).coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def lm_load(spark, path: str) -> dict:
    """Reload a model written by ``lm_save``."""
    return {
        "unigrams": spark.read.parquet(path + "/unigrams"),
        "bigrams": spark.read.parquet(path + "/bigrams"),
        "total_tokens": int(
            spark.read.parquet(path + "/meta").collect()[0]["total_tokens"]
        ),
    }


def lm_buckets(
    df: DataFrame,
    model: dict,
    text_col: str,
    id_col: str,
    lam: float = 0.9,
    cuts: tuple = (1 / 3, 2 / 3),
    rel_err: float = 0.001,
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by cross-entropy
    terciles (head = most in-distribution under the LM).

    The cut points come from ``approx_percentile`` over the scored corpus
    — a mergeable sketch aggregate (one partial-agg pass, no global
    sort), so the split costs one extra reduction over ``lm_perplexity``
    regardless of corpus size. Returns the perplexity columns plus
    ``bucket`` ∈ {'head','middle','tail'}.
    """
    from pyspark import StorageLevel

    # scored feeds two actions (the quantile sketch now, the caller's
    # consumption later); its rows are (id, 3 numerics) — a cheap cache
    # that saves re-running the scoring joins over the corpus.
    scored = lm_perplexity(df, model, text_col, id_col, lam=lam).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    q = scored.agg(
        F.expr(
            f"approx_percentile(cross_entropy, array({cuts[0]}, {cuts[1]}),"
            f" {int(1.0 / rel_err)})"
        ).alias("qs")
    ).collect()[0]["qs"]
    if not q:  # no scorable docs (all < 2 tokens): empty frame, typed
        return scored.withColumn("bucket", F.lit(None).cast("string"))
    return scored.withColumn(
        "bucket",
        F.when(F.col("cross_entropy") <= q[0], "head")
        .when(F.col("cross_entropy") <= q[1], "middle")
        .otherwise("tail"),
    )


def lm_filter(
    df: DataFrame,
    model: dict,
    text_col: str,
    id_col: str,
    max_cross_entropy: float,
    lam: float = 0.9,
) -> DataFrame:
    """Keep documents whose LM cross-entropy is at most the cutoff.

    Docs with < 2 tokens are dropped (they carry no bigram evidence; the
    pipeline's length gate handles them earlier anyway). One semi-join on
    the id key — the corpus text never moves.
    """
    keep = (
        lm_perplexity(df, model, text_col, id_col, lam=lam)
        .filter(F.col("cross_entropy") <= max_cross_entropy)
        .select(F.col("id").alias("__lm_keep_id"))
    )
    return df.join(keep, df[id_col] == F.col("__lm_keep_id"), "left_semi")
