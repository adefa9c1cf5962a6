"""Round-4 data-prep additions: cross-shard incremental near-dup (dedup
against a kept corpus via its stored signatures only) and token-budget
domain-mixture sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rtstore_spark.operators import dedup
from rtstore_spark.operators.sampling import mixture_sample

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the rain falls softly on the roof tonight"
)


class TestIncrementalNearDup:
    def test_new_shard_dedups_against_stored_signatures(self, spark):
        """Shard 2 must drop docs near-identical to shard 1 using only
        shard 1's signature table — no reference text anywhere."""
        shard1 = spark.createDataFrame(
            [
                Row(id=1, text=BASE),
                Row(id=2, text="completely different words about spark engines"),
            ]
        )
        ref_sigs = dedup.minhash_signatures_wide(shard1, "text", "id")
        # carry ONLY the signatures forward, like a rolling crawl would
        ref_sigs = spark.createDataFrame(ref_sigs.collect(), ref_sigs.schema)

        shard2 = spark.createDataFrame(
            [
                Row(id=100, text=BASE),  # exact dup of ref 1
                Row(id=101, text=BASE.replace("rain", "snow")),  # near-dup
                Row(id=102, text="fresh novel content with entirely new words here"),
            ]
        )
        pairs = dedup.incremental_neardup(
            shard2, ref_sigs, "text", "id", threshold=0.75
        )
        got = {(r["new_id"], r["ref_id"]): r["est_jaccard"] for r in pairs.collect()}
        assert got[(100, 1)] == 1.0  # exact dup: all minhashes match
        assert (101, 1) in got  # near-dup surfaces via banding + estimate
        assert not any(nid == 102 for nid, _ in got)  # novel doc kept
        # the estimator is the matching-component fraction: k=8 → multiples of 1/8
        assert all(round(j * 8, 6) == int(round(j * 8)) for j in got.values())

    def test_exact_twins_across_the_shard_split(self, spark):
        """Splitting one corpus into (reference, new) surfaces every exact
        cross-twin: the banding is byte-identical on both sides, so an
        exact duplicate can never slip between shards."""
        other = (
            "parquet files stream through arrow batches while executors "
            "exchange shuffle blocks and the scheduler assigns pending tasks"
        )
        docs = [Row(id=i, text=BASE if i % 2 == 0 else other) for i in range(6)]
        df = spark.createDataFrame(docs)
        ref_sigs = dedup.minhash_signatures_wide(
            df.filter("id < 3"), "text", "id"
        )
        inc = dedup.incremental_neardup(
            df.filter("id >= 3"), ref_sigs, "text", "id", threshold=0.99
        )
        got = {(r["new_id"], r["ref_id"]) for r in inc.collect()}
        # parity twins only: new 3,5 ≡ ref 1; new 4 ≡ ref 0 and 2 — the
        # unrelated cross-parity texts never pair
        assert got == {(3, 1), (4, 0), (4, 2), (5, 1)}


class TestMixtureSample:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = []
        for i in range(400):
            rows.append(Row(id=i, domain="web", n_tokens=100))
        for i in range(400, 500):
            rows.append(Row(id=i, domain="code", n_tokens=100))
        for i in range(500, 520):
            rows.append(Row(id=i, domain="books", n_tokens=100))
        return spark.createDataFrame(rows)

    def test_realized_mixture_tracks_targets(self, corpus):
        out = mixture_sample(
            corpus, "id", "domain",
            weights={"web": 0.5, "code": 0.5},
            token_col="n_tokens", total_tokens=20_000,
        )
        tokens = {
            r["domain"]: r["t"]
            for r in out.groupBy("domain").agg(F.sum("n_tokens").alias("t")).collect()
        }
        # target: 10k tokens each; web samples 100/400 docs, code 100/100
        assert tokens.get("code") == 10_000  # f=1.0: everything kept
        assert abs(tokens.get("web", 0) - 10_000) <= 2_500  # hash-gate noise
        assert "books" not in tokens  # unlisted domain dropped

    def test_underweight_domain_caps_at_full(self, corpus):
        # books has 2k tokens but the target asks for 10k: cap at f=1,
        # keep all of it, never upsample silently
        out = mixture_sample(
            corpus, "id", "domain",
            weights={"books": 1.0}, token_col="n_tokens", total_tokens=10_000,
        )
        assert out.count() == 20

    def test_deterministic(self, corpus):
        a = mixture_sample(
            corpus, "id", "domain", {"web": 1.0}, "n_tokens", 5_000
        )
        b = mixture_sample(
            corpus, "id", "domain", {"web": 1.0}, "n_tokens", 5_000
        )
        assert sorted(r["id"] for r in a.collect()) == sorted(
            r["id"] for r in b.collect()
        )

    def test_pure_filter_no_shuffle(self, corpus):
        """The sampling gate must be a pushed-down predicate — zero
        exchanges in the sampled plan (the sizing aggregate is a separate
        tiny job, not part of the output plan)."""
        out = mixture_sample(
            corpus, "id", "domain", {"web": 0.5}, "n_tokens", 10_000
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestBM25:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [
                Row(id=1, text="spark shuffles data between executors"),
                Row(id=2, text="spark spark spark everywhere in the cluster"),
                Row(id=3, text="ducks swim in the pond"),
                Row(id=4, text="the query engine optimizes the plan"),
            ]
        )

    def test_scores_match_hand_computation(self, docs):
        import math

        from rtstore_spark.operators.text import bm25_topk

        out = {r["id"]: r["score"] for r in
               bm25_topk(docs, "text", "id", ["spark"], k=10).collect()}
        assert set(out) == {1, 2}  # only docs containing the term
        # hand-computed: N=4, df=2, idf = ln(1 + 2.5/2.5) = ln 2
        # avgdl = (5+7+5+6)/4 = 5.75
        k1, b = 1.2, 0.75
        def s(tf, dl):
            return round(math.log(2.0) * tf * (k1 + 1)
                         / (tf + k1 * (1 - b + b * dl / 5.75)), 6)
        assert out[1] == pytest.approx(s(1, 5), abs=1e-6)
        assert out[2] == pytest.approx(s(3, 7), abs=1e-6)
        assert out[2] > out[1]  # tf saturation still ranks the heavy doc up

    def test_multi_term_and_topk_plan(self, docs):
        from rtstore_spark.operators.text import bm25_topk

        out = bm25_topk(docs, "text", "id", ["spark", "pond"], k=2)
        rows = out.collect()
        assert len(rows) == 2
        # rare term 'pond' (df=1) outweighs common 'spark' (df=2)
        assert rows[0]["id"] == 3
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort

    def test_empty_query_rejected(self, docs):
        from rtstore_spark.operators.text import bm25_topk

        with pytest.raises(ValueError):
            bm25_topk(docs, "text", "id", [])


class TestHllSketches:
    def test_rollup_merge_matches_exact_within_error(self, spark):
        """Sketch-rollup workflow: per-group HLLs once, then answer both
        per-group and total distincts by merging — estimates within the
        published ~1.6% (lgK=12) of exact, total NOT the sum of groups
        (overlapping keys dedup through the merge)."""
        from rtstore_spark.operators.sketches import (
            hll_estimate,
            hll_merge,
            hll_rollup,
        )

        df = spark.range(20_000).selectExpr(
            "id % 4 as grp",
            # keys overlap across groups: 12k distinct overall
            "id % 12000 as user",
        )
        roll = hll_rollup(df, "user", by=["grp"])
        per_group = {
            r["grp"]: r["distinct_est"] for r in hll_estimate(roll).collect()
        }
        exact = {
            r["grp"]: r["n"]
            for r in df.groupBy("grp")
            .agg(F.countDistinct("user").alias("n"))
            .collect()
        }
        for g, est in per_group.items():
            assert abs(est - exact[g]) / exact[g] < 0.05
        total = hll_merge(roll).collect()[0]["distinct_est"]
        assert abs(total - 12000) / 12000 < 0.05
        assert total < sum(per_group.values())  # merge deduped the overlap

    def test_merge_to_intermediate_grouping(self, spark):
        from rtstore_spark.operators.sketches import hll_merge, hll_rollup

        df = spark.range(5_000).selectExpr(
            "id % 8 as bucket", "id % 4 as day", "id as user"
        )
        daily = hll_rollup(df, "user", by=["bucket", "day"])
        by_day = {r["day"]: r["distinct_est"] for r in hll_merge(daily, ["day"]).collect()}
        # disjoint users: each day holds exactly 1250
        for est in by_day.values():
            assert abs(est - 1250) / 1250 < 0.05
