"""Bigram-LM perplexity filter (operators.lm) — hand-computed oracle on a
tiny corpus, pruning behavior, and the filter contract. The sf0.01 DuckDB
cross-check lives in the registry (`lm_perplexity`)."""

from __future__ import annotations

import math

import pytest

from rtstore_spark.operators import lm


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "the dog sat"),
        (4, "zq"),  # single token: no bigrams, absent from scores
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_fit_counts_and_probs(tiny):
    model = lm.lm_fit(tiny, "text")
    assert model["total_tokens"] == 10  # 3+3+3+1
    uni = {r["w2"]: r["p_uni"] for r in model["unigrams"].collect()}
    assert uni["the"] == pytest.approx(3 / 10)
    assert uni["zq"] == pytest.approx(1 / 10)
    big = {(r["w1"], r["w2"]): r["p_big"] for r in model["bigrams"].collect()}
    # c(the cat)=2, c(the)=3; c(cat sat)=1, c(cat)=2
    assert big[("the", "cat")] == pytest.approx(2 / 3)
    assert big[("cat", "sat")] == pytest.approx(1 / 2)


def test_perplexity_hand_computed(tiny):
    model = lm.lm_fit(tiny, "text")
    out = {r["id"]: r for r in lm.lm_perplexity(tiny, model, "text", "id").collect()}
    # doc 1 = "the cat sat": bigrams (the,cat), (cat,sat)
    p1 = 0.9 * (2 / 3) + 0.1 * (2 / 10)  # p(cat|the), p_uni(cat)=2/10
    p2 = 0.9 * (1 / 2) + 0.1 * (2 / 10)  # p(sat|cat), p_uni(sat)=2/10
    ce = (-math.log(p1) - math.log(p2)) / 2
    assert out[1]["n_bigrams"] == 2
    assert out[1]["cross_entropy"] == pytest.approx(ce, rel=1e-12)
    assert out[1]["ppl"] == pytest.approx(math.exp(ce), rel=1e-12)
    # single-token doc has no bigrams -> absent
    assert 4 not in out


def test_oov_floor_keeps_entropy_finite(spark, tiny):
    model = lm.lm_fit(tiny, "text")
    unseen = spark.createDataFrame([(9, "xx yy zz")], ["id", "text"])
    row = lm.lm_perplexity(unseen, model, "text", "id").collect()[0]
    # every bigram unseen, every word OOV: p = 0.1 * (1/total) each
    assert row["cross_entropy"] == pytest.approx(-math.log(0.1 * (1 / 10)), rel=1e-12)
    assert math.isfinite(row["ppl"])


def test_pruning_caps_bind_deterministically(tiny):
    model = lm.lm_fit(tiny, "text", max_unigrams=2, max_bigrams=1)
    assert model["unigrams"].count() == 2
    big = model["bigrams"].collect()
    assert len(big) == 1
    # (the,cat) has count 2, every other bigram 1 -> it is the keeper
    assert (big[0]["w1"], big[0]["w2"]) == ("the", "cat")
    # unigram tie at count 2 ('cat','sat') after 'the'(3): word-asc keeps 'cat'
    kept = sorted(r["w2"] for r in model["unigrams"].collect())
    assert kept == ["cat", "the"]


def test_filter_in_distribution_beats_noise(spark):
    # LM fit on formulaic text: in-distribution docs must score a lower
    # cross-entropy than vocabulary noise, and lm_filter must separate them.
    good = [(i, "alpha beta gamma delta " * 5) for i in range(10)]
    noise = [(100 + i, "delta alpha gamma gamma beta delta alpha beta") for i in range(2)]
    df = spark.createDataFrame(good + noise, ["id", "text"])
    model = lm.lm_fit(df, "text")
    scored = {r["id"]: r["cross_entropy"]
              for r in lm.lm_perplexity(df, model, "text", "id").collect()}
    assert scored[0] < scored[100]
    cutoff = (scored[0] + scored[100]) / 2
    kept = lm.lm_filter(df, model, "text", "id", max_cross_entropy=cutoff)
    assert sorted(r["id"] for r in kept.collect()) == [i for i, _ in good]


def test_save_load_roundtrip(tiny, tmp_path):
    model = lm.lm_fit(tiny, "text")
    before = {r["id"]: r["cross_entropy"]
              for r in lm.lm_perplexity(tiny, model, "text", "id").collect()}
    lm.lm_save(model, str(tmp_path / "model"))
    loaded = lm.lm_load(tiny.sparkSession, str(tmp_path / "model"))
    after = {r["id"]: r["cross_entropy"]
             for r in lm.lm_perplexity(tiny, loaded, "text", "id").collect()}
    assert after == pytest.approx(before, rel=1e-12)


def test_buckets_cover_and_order(spark):
    # 30 docs with a spread of surprisal: buckets partition the corpus and
    # head entropies <= middle <= tail.
    rows = [(i, f"u{i} " + "alpha beta gamma " * (1 + i % 5)) for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "text"])
    model = lm.lm_fit(df, "text")
    out = lm.lm_buckets(df, model, "text", "id").collect()
    assert len(out) == 30
    by = {}
    for r in out:
        by.setdefault(r["bucket"], []).append(r["cross_entropy"])
    assert set(by) <= {"head", "middle", "tail"}
    if "head" in by and "middle" in by:
        assert max(by["head"]) <= min(by["middle"])
    if "middle" in by and "tail" in by:
        assert max(by["middle"]) <= min(by["tail"])


def test_pipeline_lm_gate(spark):
    # prepare_corpus with the LM gate on: the vocabulary-noise outlier is
    # dropped, the in-distribution docs survive. Texts must differ (exact
    # dedup runs first), so each doc gets a distinct word prefix.
    from rtstore_spark.operators.pipeline import CorpusPrepConfig, prepare_corpus

    good = [(i, f"doc{i} " + "alpha beta gamma delta " * 5) for i in range(10)]
    noise = [(100, "gamma delta beta beta alpha gamma delta delta beta alpha "
                   "delta gamma alpha alpha beta delta gamma beta alpha gamma")]
    df = spark.createDataFrame(good + noise, ["id", "text"])
    cfg = CorpusPrepConfig(
        min_tokens=2, langs=["und"], near_dup_threshold=1.01,
        lm_max_cross_entropy=2.0,
    )
    out = prepare_corpus(df, "text", "id", cfg)
    kept_ids = sorted(r["id"] for r in out.collect())
    assert 100 not in kept_ids
    assert kept_ids == [i for i, _ in good]


def test_score_plan_has_no_corpus_shuffle_before_agg(tiny):
    # With the model materialized (the documented usage: persist the two
    # tables, they ARE the model), scoring must broadcast them — the corpus
    # side's only exchange is the per-doc aggregate (hashpartitioning on
    # id), never on word keys.
    model = lm.lm_fit(tiny, "text")
    model["unigrams"] = model["unigrams"].localCheckpoint()
    model["bigrams"] = model["bigrams"].localCheckpoint()
    plan = (
        lm.lm_perplexity(tiny, model, "text", "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "hashpartitioning(w" in line.replace(" ", ""):
            raise AssertionError(f"corpus shuffled on word key:\n{line}")


def test_gopher_rules(spark):
    from rtstore_spark.operators.text import gopher_rules

    good = ("the quick brown fox jumps over a lazy dog and then it runs "
            "far away to find some food in the woods near that old river "
            "bank while birds sing songs of morning light is soft and air "
            "is cool with mist that drifts in slow waves over green grass")
    docs = [
        (1, good),                                     # passes every rule
        (2, "the cat sat"),                            # too short
        (3, " ".join(["a"] * 60)),                     # mean word len < 3 (+ stopword fail)
        (4, good + " " + "#tag " * 30),                # symbol ratio > 0.1
        (5, "\n".join("- item foo" for _ in range(10))),  # bullet lines (+ short)
        (6, good.replace(" ", "... ", 25)),            # ellipsis symbols
        (7, " ".join(["12345"] * 60)),                 # alpha frac 0 + no stopwords
    ]
    out = {r["id"]: r for r in gopher_rules(
        spark.createDataFrame(docs, ["id", "text"]), "text", "id").collect()}
    assert out[1]["gopher_pass"]
    assert not out[2]["gopher_pass"] and out[2]["n_tokens"] == 3
    assert not out[3]["gopher_pass"] and out[3]["mean_word_len"] == 1.0
    assert not out[4]["gopher_pass"] and out[4]["symbol_word_ratio"] > 0.1
    assert not out[5]["gopher_pass"] and out[5]["bullet_line_frac"] == 1.0
    assert not out[6]["gopher_pass"]
    assert not out[7]["gopher_pass"] and out[7]["alpha_word_frac"] == 0.0
    assert out[1]["stopword_hits"] >= 2


def test_gopher_ellipsis_lines(spark):
    from rtstore_spark.operators.text import gopher_rules

    txt = "first line goes on...\nsecond line is fine\nthird one trails …\n"
    row = gopher_rules(
        spark.createDataFrame([(1, txt)], ["id", "text"]), "text", "id"
    ).collect()[0]
    assert row["ellipsis_line_frac"] == pytest.approx(2 / 3, abs=1e-6)
