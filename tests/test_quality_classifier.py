"""Trainable quality classifier (operators/quality_classifier.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rtstore_spark.operators.quality_classifier import (
    quality_filter,
    quality_fit,
    quality_score,
)

GOOD_WORDS = (
    "the quick study of language models requires careful attention to "
    "grammar structure meaning and context within documents"
).split()
BAD_WORDS = "zxq wvv kpr qqj xoxo zz9 blort gnnn spam spam buy now".split()


def _doc(words, rng, n=30):
    return " ".join(rng.choice(words) for _ in range(n))


@pytest.fixture(scope="module")
def model_and_data(spark):
    rng = random.Random(7)
    rows = [( _doc(GOOD_WORDS, rng), 1.0) for _ in range(120)] + [
        (_doc(BAD_WORDS, rng), 0.0) for _ in range(120)
    ]
    labeled = spark.createDataFrame(rows, "text string, label double")
    model = quality_fit(labeled, num_features=1 << 12, max_iter=25)
    return model, rng


class TestQualityClassifier:
    def test_separates_held_out_docs(self, spark, model_and_data):
        model, rng = model_and_data
        test = spark.createDataFrame(
            [(_doc(GOOD_WORDS, rng), 1)] * 20 + [(_doc(BAD_WORDS, rng), 0)] * 20,
            "text string, truth int",
        )
        scored = quality_score(model, test).collect()
        good = [r["quality_prob"] for r in scored if r["truth"] == 1]
        bad = [r["quality_prob"] for r in scored if r["truth"] == 0]
        assert min(good) > max(bad)  # fully separable vocabulary
        assert all(g > 0.9 for g in good) and all(b < 0.1 for b in bad)

    def test_score_keeps_input_schema(self, spark, model_and_data):
        model, rng = model_and_data
        df = spark.createDataFrame(
            [(1, _doc(GOOD_WORDS, rng))], "id long, text string"
        )
        out = quality_score(model, df)
        assert out.columns == ["id", "text", "quality_prob"]

    def test_hard_threshold_filter(self, spark, model_and_data):
        model, rng = model_and_data
        df = spark.createDataFrame(
            [(_doc(GOOD_WORDS, rng),)] * 10 + [(_doc(BAD_WORDS, rng),)] * 10,
            "text string",
        )
        kept = quality_filter(model, df, threshold=0.5)
        assert kept.count() == 10

    def test_pareto_filter_is_deterministic_and_favors_quality(self, spark, model_and_data):
        model, rng = model_and_data
        df = spark.createDataFrame(
            [(_doc(GOOD_WORDS, rng),) for _ in range(30)]
            + [(_doc(BAD_WORDS, rng),) for _ in range(30)],
            "text string",
        )
        a = quality_filter(model, df, pareto_alpha=9.0, seed=3)
        b = quality_filter(model, df, pareto_alpha=9.0, seed=3)
        rows_a = sorted(r["text"] for r in a.collect())
        rows_b = sorted(r["text"] for r in b.collect())
        assert rows_a == rows_b  # per-row hash seed → rerun-stable
        # the policy is STOCHASTIC by design (GPT-3 keeps a ~0.99 doc with
        # p ≈ (1.01)^-9 ≈ 0.91): most good docs survive, most bad drop
        kept = a.collect()
        goods = sum(1 for r in kept if r["quality_prob"] > 0.9)
        bads = sum(1 for r in kept if r["quality_prob"] < 0.1)
        assert goods >= 20  # ≥ 2/3 of 30, well above any plausible noise
        assert bads < goods

    def test_pareto_draw_depends_only_on_text_and_seed(self, spark, model_and_data):
        # the determinism contract (ADVICE r6): the uniform draw hashes
        # ONLY (text, seed) — metadata columns and the model score must
        # not reshuffle which documents survive
        model, rng = model_and_data
        df = spark.createDataFrame(
            [(_doc(GOOD_WORDS, rng),) for _ in range(30)]
            + [(_doc(BAD_WORDS, rng),) for _ in range(30)],
            "text string",
        )
        a = quality_filter(model, df, pareto_alpha=9.0, seed=3)
        b = quality_filter(
            model,
            df.withColumn("source", F.lit("crawl-2026")).withColumn(
                "rank", F.monotonically_increasing_id()
            ),
            pareto_alpha=9.0,
            seed=3,
        )
        assert sorted(r["text"] for r in a.collect()) == sorted(
            r["text"] for r in b.collect()
        )
        with pytest.raises(ValueError, match="text_col"):
            quality_filter(model, df, pareto_alpha=9.0, text_col="docbody")

    def test_save_load_round_trip(self, spark, model_and_data, tmp_path):
        from pyspark.ml import PipelineModel

        model, rng = model_and_data
        path = str(tmp_path / "quality_model")
        model.save(path)
        loaded = PipelineModel.load(path)
        df = spark.createDataFrame([(_doc(GOOD_WORDS, rng),)], "text string")
        a = quality_score(model, df).collect()[0]["quality_prob"]
        b = quality_score(loaded, df).collect()[0]["quality_prob"]
        assert a == pytest.approx(b, abs=1e-12)

    def test_scoring_plan_is_jvm_side(self, spark, model_and_data):
        model, rng = model_and_data
        df = spark.createDataFrame([(_doc(GOOD_WORDS, rng),)], "text string")
        plan = quality_score(model, df)._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in plan, f"python in the scoring path: {marker}"


class TestReviewRegressions:
    def test_scores_df_with_preexisting_classifier_columns(self, spark, model_and_data):
        # corpora often carry another model's output columns — the
        # pipeline's working columns must not collide with them
        model, rng = model_and_data
        df = spark.createDataFrame(
            [(_doc(GOOD_WORDS, rng), 0.4, 1.0)],
            "text string, probability double, prediction double",
        )
        out = quality_score(model, df)
        assert out.columns == ["text", "probability", "prediction", "quality_prob"]
        row = out.collect()[0]
        assert row["probability"] == 0.4  # untouched passthrough
        assert row["quality_prob"] > 0.9


class TestPrepareCorpusIntegration:
    def test_quality_model_gate_stage(self, spark, model_and_data):
        from pyspark.sql import Row

        from rtstore_spark.operators.pipeline import (
            CorpusPrepConfig,
            PrepAudit,
            prepare_corpus,
        )

        model, rng = model_and_data
        rows = [Row(doc_id=i, body=_doc(GOOD_WORDS, rng, n=40)) for i in range(4)]
        rows += [Row(doc_id=10 + i, body=_doc(BAD_WORDS, rng, n=40)) for i in range(4)]
        corpus = spark.createDataFrame(rows)
        # the fixture model was fit with text_col="text": rename to match
        corpus = corpus.withColumnRenamed("body", "text")
        audit = PrepAudit()
        cfg = CorpusPrepConfig(
            min_tokens=5, langs=["en", "und"],  # word-salad text ids as und
            quality_model=model, quality_threshold=0.5,
        )
        out = prepare_corpus(corpus, "text", "doc_id", cfg, audit=audit)
        kept = sorted(r["doc_id"] for r in out.collect())
        assert kept and all(i < 10 for i in kept)  # every BAD doc gated
        counts = audit.counts()
        assert counts["quality_model_gate"] == len(kept)
        # schema unchanged by the gate (score column dropped)
        assert "quality_prob" not in out.columns
