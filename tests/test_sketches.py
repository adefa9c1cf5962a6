"""Mergeable rollup sketches: heavy hitters (truncated top-k with error
bounds) and histogram quantiles. The property under test is MERGEABILITY:
the merge of per-partition rollups must answer like a single pass over the
union — exactly for histograms, within the tracked bound for top-k."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from rtstore_spark.operators.sketches import (
    cms_merge,
    cms_query,
    cms_rollup,
    hist_merge,
    hist_quantiles,
    hist_rollup,
    topk_merge,
    topk_rollup,
)


def _zipfish(n_users: int = 40, rows_per_rank: int = 60):
    """Skewed item stream across 4 day-buckets: item i appears
    ~rows_per_rank/(i+1) times per day — a few heavy hitters, a long tail."""
    rows = []
    for day in range(4):
        for i in range(n_users):
            for r in range(max(rows_per_rank // (i + 1), 1)):
                rows.append(Row(day=day, item=f"u{i:03d}", x=float(i * 10 + r)))
    return rows


class TestTopkRollup:
    def test_per_group_counts_are_exact_and_truncated(self, spark):
        df = spark.createDataFrame(_zipfish())
        roll = topk_rollup(df, "item", by=["day"], k=3, slack=2)
        rows = roll.collect()
        # k·slack items kept per day, exact within-group counts
        per_day = {}
        for r in rows:
            per_day.setdefault(r["day"], []).append(r)
        exact = {
            (r["day"], r["item"]): r["cnt"]
            for r in df.groupBy("day", "item")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        for day, kept in per_day.items():
            assert len(kept) == 6  # k·slack
            for r in kept:
                assert r["count"] == exact[(day, r["item"])]
            # the bound is the heaviest count the group dropped
            dropped = [
                c for (d, it), c in exact.items()
                if d == day and it not in {r["item"] for r in kept}
            ]
            assert kept[0]["trunc_bound"] == max(dropped)

    def test_merge_recovers_global_topk_within_bound(self, spark):
        df = spark.createDataFrame(_zipfish())
        roll = topk_rollup(df, "item", by=["day"], k=5, slack=4)
        merged = topk_merge(roll, k=5)
        got = merged.orderBy(F.desc("count_lo"), "item").collect()
        truth = (
            df.groupBy("item")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "item")
            .limit(5)
            .collect()
        )
        assert [r["item"] for r in got] == [r["item"] for r in truth]
        by_item = {r["item"]: r for r in got}
        for t in truth:
            m = by_item[t["item"]]
            # count_lo is a guaranteed lower bound; the bound covers truth
            assert m["count_lo"] <= t["cnt"] <= m["count_lo"] + m["max_err"]

    def test_no_truncation_means_exact_merge(self, spark):
        rows = [Row(g=g, item=f"i{i}") for g in range(3) for i in range(4)]
        df = spark.createDataFrame(rows * 5)
        roll = topk_rollup(df, "item", by=["g"], k=4, slack=2)
        assert roll.agg(F.max("trunc_bound")).collect()[0][0] == 0
        merged = topk_merge(roll, k=4)
        for r in merged.collect():
            assert r["max_err"] == 0
            assert r["count_lo"] == 15  # 3 groups × 5 repeats

    def test_near_uniform_data_reports_honest_uncertainty(self, spark):
        """Worst case for any heavy-hitter summary: near-uniform counts.
        A true top item may be truncated out of EVERY group's kept set —
        the merge must then cover it via the absent-item bound (true count
        ≤ max_err), never silently rank wrong with a tight bound."""
        # 4 groups × 50 items, all counts in {3, 4}: no real heavy hitter
        rows = [
            Row(g=g, item=f"i{i:02d}")
            for g in range(4)
            for i in range(50)
            for _ in range(3 + ((i + g) % 2))
        ]
        df = spark.createDataFrame(rows)
        roll = topk_rollup(df, "item", by=["g"], k=3, slack=2)
        merged = topk_merge(roll, k=3)
        out = merged.collect()
        max_err = out[0]["max_err"]
        present = {r["item"]: r for r in out}
        exact = {
            r["item"]: r["cnt"]
            for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()
        }
        for item, cnt in sorted(exact.items(), key=lambda kv: -kv[1])[:3]:
            if item in present:
                m = present[item]
                assert m["count_lo"] <= cnt <= m["count_lo"] + m["max_err"]
            else:
                assert cnt <= max_err  # absent-item bound covers it
        # and the bound honestly signals "no certain top-k here"
        assert max_err >= max(exact.values()) - min(exact.values())

    def test_global_rollup_shape(self, spark):
        df = spark.createDataFrame(_zipfish())
        roll = topk_rollup(df, "item", by=[], k=2, slack=2)
        assert set(roll.columns) == {"item", "count", "trunc_bound"}
        assert roll.count() == 4  # k·slack


class TestHistQuantiles:
    def test_quantile_error_bounded_by_bin_width(self, spark):
        df = spark.createDataFrame(_zipfish())
        bins = 64
        roll = hist_rollup(df, "x", by=["day"], bins=bins)
        lo, hi = roll.select("lo", "hi").first()
        width = (hi - lo) / bins
        got = {
            (r["day"], r["q"]): r["est"]
            for r in hist_quantiles(roll, [0.25, 0.5, 0.9], by=["day"]).collect()
        }
        truth = {
            (r["day"], q): r[f"p{int(q*100)}"]
            for r in df.groupBy("day")
            .agg(
                *[
                    F.expr(f"percentile(x, {q})").alias(f"p{int(q*100)}")
                    for q in (0.25, 0.5, 0.9)
                ]
            )
            .collect()
            for q in (0.25, 0.5, 0.9)
        }
        for key, est in got.items():
            assert abs(est - truth[key]) <= width + 1e-9, key

    def test_merge_equals_single_pass(self, spark):
        """Summing per-day rollups == the rollup a single pass over the
        union would build (same shared range)."""
        df = spark.createDataFrame(_zipfish())
        lo, hi = 0.0, 400.0
        per_day = hist_rollup(df, "x", by=["day"], bins=32, lo=lo, hi=hi)
        merged = {
            r["bin"]: r["bin_count"] for r in hist_merge(per_day, by=[]).collect()
        }
        single = {
            r["bin"]: r["bin_count"]
            for r in hist_rollup(df, "x", by=[], bins=32, lo=lo, hi=hi).collect()
        }
        assert merged == single

    def test_out_of_range_values_clamp_into_edge_bins(self, spark):
        df = spark.createDataFrame(
            [Row(x=-5.0), Row(x=0.5), Row(x=99.0)]
        )
        roll = hist_rollup(df, "x", by=[], bins=10, lo=0.0, hi=1.0)
        counts = {r["bin"]: r["bin_count"] for r in roll.collect()}
        assert counts[0] == 1  # -5 clamps low
        assert counts[5] == 1
        assert counts[9] == 1  # 99 clamps high

    def test_extreme_quantiles(self, spark):
        df = spark.createDataFrame([Row(x=float(i)) for i in range(100)])
        roll = hist_rollup(df, "x", by=[], bins=10)
        got = {r["q"]: r["est"] for r in hist_quantiles(roll, [0.0, 1.0]).collect()}
        assert got[0.0] <= 0.0 + 9.9  # within the first bin
        assert abs(got[1.0] - 99.0) <= 9.9 + 1e-9


def test_hist_rollup_empty_input(spark):
    from pyspark.sql import types as T

    from rtstore_spark.operators.sketches import hist_rollup

    empty = spark.createDataFrame(
        [], schema=T.StructType([T.StructField("x", T.DoubleType(), True)])
    )
    roll = hist_rollup(empty, "x", by=[], bins=10)
    assert roll.count() == 0  # no rows, but range inference must not crash


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 12)),  # (group, item)
        min_size=1, max_size=120,
    ),
    k=st.integers(1, 4),
    slack=st.integers(1, 3),
)
def test_topk_bounds_always_hold(spark, data, k, slack):
    """Property: for ANY multiset and grouping, every item's true global
    count lies in [count_lo, count_lo + max_err] if merged, and at or
    below max_err if truncated away everywhere. The Misra-Gries merge
    contract, fuzzed."""
    df = spark.createDataFrame(
        [Row(g=g, item=f"i{i}") for g, i in data]
    )
    merged = topk_merge(topk_rollup(df, "item", by=["g"], k=k, slack=slack), k=k)
    out = merged.collect()
    present = {r["item"]: r for r in out}
    max_err = out[0]["max_err"] if out else 0
    exact: dict[str, int] = {}
    for _g, i in data:
        exact[f"i{i}"] = exact.get(f"i{i}", 0) + 1
    for item, cnt in exact.items():
        m = present.get(item)
        if m is not None:
            assert m["count_lo"] <= cnt <= m["count_lo"] + m["max_err"], (item, cnt, m)
        else:
            # absent: either truncated (bounded by max_err) or merely
            # outside the returned top-k — then its count cannot exceed
            # the k-th count_lo + max_err (it would have displaced it)
            kth = min(r["count_lo"] for r in out)
            assert cnt <= max(max_err, kth + max_err), (item, cnt, max_err, kth)


class TestCountMin:
    def test_never_undercounts_and_merge_is_exact(self, spark):
        df = spark.createDataFrame(_zipfish())
        roll = cms_rollup(df, "item", by=["day"], depth=4, width=512)
        # mergeability: per-day sketches merged globally == a single
        # global-pass sketch, counter for counter
        direct = cms_merge(cms_rollup(df, "item", by=[], depth=4, width=512), [])
        merged = cms_merge(roll, [])
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )
        # no-undercount: estimate >= true count for every item, globally
        items = df.select("item").distinct()
        est = {
            r["item"]: r["freq_est"]
            for r in cms_query(roll, items, "item").collect()
        }
        exact = {
            r["item"]: r["cnt"]
            for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()
        }
        assert set(est) == set(exact)
        for it, cnt in exact.items():
            assert est[it] >= cnt

    def test_grouped_query_uses_own_groups_zeros(self, spark):
        # day 0 sees only item "a", day 1 only "b": the day-0 estimate for
        # "b" must be 0 (its own empty counters), not day 1's counts
        rows = [Row(day=0, item="a")] * 7 + [Row(day=1, item="b")] * 5
        df = spark.createDataFrame(rows)
        roll = cms_rollup(df, "item", by=["day"], depth=4, width=256)
        probes = spark.createDataFrame(
            [Row(day=0, item="a"), Row(day=0, item="b"),
             Row(day=1, item="a"), Row(day=1, item="b")]
        )
        got = {
            (r["day"], r["item"]): r["freq_est"]
            for r in cms_query(roll, probes, "item", by=["day"]).collect()
        }
        assert got[(0, "a")] == 7 and got[(1, "b")] == 5
        assert got[(0, "b")] == 0 and got[(1, "a")] == 0

    def test_wide_sketch_is_exact_on_small_domain(self, spark):
        # 40 items into width 4096 x depth 4: every item keeps at least
        # one collision-free counter (deterministic for this fixed data)
        df = spark.createDataFrame(_zipfish())
        roll = cms_rollup(df, "item", by=[], depth=4, width=4096)
        est = {
            r["item"]: r["freq_est"]
            for r in cms_query(roll, df.select("item").distinct(), "item").collect()
        }
        exact = {
            r["item"]: r["cnt"]
            for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()
        }
        assert est == exact

    def test_rollup_bounded_and_self_describing(self, spark):
        df = spark.createDataFrame(_zipfish())
        roll = cms_rollup(df, "item", by=["day"], depth=3, width=64)
        assert set(roll.columns) == {"day", "d", "bucket", "c", "depth", "width"}
        # counter rows per group bounded by depth x width, buckets in range
        assert roll.groupBy("day").count().agg(F.max("count")).collect()[0][0] <= 3 * 64
        mn, mx = roll.agg(F.min("bucket"), F.max("bucket")).collect()[0]
        assert 0 <= mn and mx < 64
        # null items carry no frequency: dropped at rollup
        with_null = df.union(
            spark.createDataFrame(
                [(9, None, 0.0)], "day BIGINT, item STRING, x DOUBLE"
            )
        )
        assert cms_rollup(with_null, "item", by=[], depth=2, width=64).filter(
            F.col("c").isNull()
        ).count() == 0

    def test_empty_rollup_queries_as_zeros_not_crash(self, spark):
        empty = spark.createDataFrame(
            [], "day BIGINT, item STRING, x DOUBLE"
        )
        roll = cms_rollup(empty, "item", by=[], depth=4, width=64)
        probes = spark.createDataFrame([Row(item="a"), Row(item="b")])
        got = {r["item"]: r["freq_est"] for r in cms_query(roll, probes, "item").collect()}
        assert got == {"a": 0, "b": 0}

    def test_mixed_config_rollup_union_raises(self, spark):
        df = spark.createDataFrame([Row(day=0, item="a", x=0.0)] * 3)
        r1 = cms_rollup(df, "item", by=[], depth=4, width=64)
        r2 = cms_rollup(df, "item", by=[], depth=4, width=128)
        probes = spark.createDataFrame([Row(item="a")])
        import pytest as _pytest

        with _pytest.raises(ValueError, match="mixes sketch configs"):
            cms_query(r1.unionByName(r2), probes, "item")
        # explicit config skips the metadata read entirely (stays lazy)
        ok = cms_query(r1, probes, "item", depth=4, width=64)
        assert ok.collect()[0]["freq_est"] == 3

    def test_null_probe_items_report_zero_not_collisions(self, spark):
        df = spark.createDataFrame([Row(day=0, item=f"u{i}", x=0.0) for i in range(20)])
        roll = cms_rollup(df, "item", by=[], depth=2, width=4)  # forced collisions
        probes = spark.createDataFrame(
            [(None,), ("u1",)], "item STRING"
        )
        got = {r["item"]: r["freq_est"] for r in cms_query(roll, probes, "item").collect()}
        # the null probe is excluded (rollup never counted nulls), u1 answers
        assert None not in got and got["u1"] >= 1


class TestLogBins:
    def test_log_quantiles_bound_by_ratio_not_span(self, spark):
        # 4 decades of doc lengths: linear bins put ~everything in bin 0
        # and p50 error spans thousands; log bins answer within one RATIO
        # step (hi/lo)^(1/bins) of the truth
        vals = [10.0 * (1.12 ** i) for i in range(80)]  # 10 .. ~50k
        df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
        roll = hist_rollup(df, "x", by=[], bins=64, log=True)
        got = {r["q"]: r["est"] for r in hist_quantiles(roll, [0.5, 0.9]).collect()}
        import statistics

        truth = {0.5: statistics.quantiles(vals, n=100)[49],
                 0.9: statistics.quantiles(vals, n=100)[89]}
        ratio_step = (max(vals) / min(vals)) ** (1 / 64)
        for q, est in got.items():
            assert truth[q] / ratio_step**2 <= est <= truth[q] * ratio_step**2

    def test_log_merge_equals_single_pass_and_isolates_linear(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(g=i % 2, x=float(2 ** (i % 12 + 1))) for i in range(200)]
        )
        per_g = hist_rollup(df, "x", by=["g"], bins=16, lo=2.0, hi=4096.0, log=True)
        merged = {r["bin"]: r["bin_count"] for r in hist_merge(per_g, []).collect()}
        single = {
            r["bin"]: r["bin_count"]
            for r in hist_rollup(df, "x", by=[], bins=16, lo=2.0, hi=4096.0, log=True).collect()
        }
        assert merged == single
        # a linear rollup never sums with a log one EVEN when the recorded
        # lo/hi coincide numerically (the log rollup stores its range in
        # log10 domain — give the linear one exactly those values, so only
        # the logbins key keeps them apart)
        import math

        lin = hist_rollup(
            df, "x", by=[], bins=16,
            lo=math.log10(2.0), hi=math.log10(4096.0),
        )
        logr = hist_merge(per_g.drop("g"), [])
        both = hist_merge(lin.unionByName(logr), [])
        assert both.count() == lin.count() + logr.count()

    def test_nonpositive_values_clamp_to_lowest_bin(self, spark):
        df = spark.createDataFrame(
            [(0.0,), (-3.0,), (1.0,), (100.0,)], "x DOUBLE"
        )
        roll = hist_rollup(df, "x", by=[], bins=4, lo=1.0, hi=100.0, log=True)
        counts = {r["bin"]: r["bin_count"] for r in roll.collect()}
        assert counts[0] == 3  # 0, -3 clamp in with the true 1.0
        assert sum(counts.values()) == 4

    def test_log_rejects_nonpositive_bounds(self, spark):
        df = spark.createDataFrame([(1.0,)], "x DOUBLE")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="positive"):
            hist_rollup(df, "x", by=[], bins=4, lo=0.0, hi=10.0, log=True)

    def test_nan_values_dropped_like_null(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (10.0,), (float("nan"),), (None,)], "x DOUBLE"
        )
        for log in (False, True):
            roll = hist_rollup(df, "x", by=[], bins=4, log=log)
            assert roll.agg(F.sum("bin_count")).collect()[0][0] == 2
            # auto range not poisoned by the NaN (max would be NaN)
            lo, hi = roll.select("lo", "hi").first()
            assert lo == lo and hi == hi  # not NaN


# ---------------------------------------------------------------------------
# Bloom filter rollup
# ---------------------------------------------------------------------------

import pytest

from rtstore_spark.operators.sketches import (  # noqa: E402
    bloom_contains,
    bloom_merge,
    bloom_rollup,
)


class TestBloom:
    def _probe(self, spark, rollup, words, **kw):
        items = spark.createDataFrame([(w,) for w in words], "item string")
        return {
            r["item"]: r["might_contain"]
            for r in bloom_contains(rollup, items, "item", **kw).collect()
        }

    def test_no_false_negatives(self, spark):
        inserted = [f"doc-{i}" for i in range(200)]
        df = spark.createDataFrame([(w,) for w in inserted], "t string")
        roll = bloom_rollup(df, "t", by=[], nbits=4096, k=5)
        got = self._probe(spark, roll, inserted)
        assert all(got[w] for w in inserted)  # the Bloom guarantee

    def test_fpr_bounded(self, spark):
        # 200 items in 4096 bits, k=5 -> theoretical fpp ~ (1-e^-0.244)^5
        # ~ 0.05%; assert the observed rate on 1000 absent probes stays
        # far under an order-of-magnitude cushion
        df = spark.createDataFrame([(f"doc-{i}",) for i in range(200)], "t string")
        roll = bloom_rollup(df, "t", by=[], nbits=4096, k=5)
        absent = [f"other-{i}" for i in range(1000)]
        got = self._probe(spark, roll, absent)
        assert sum(got.values()) / len(absent) < 0.02

    def test_merge_equals_direct_build(self, spark):
        rows = [(f"w-{i}",) for i in range(100)]
        whole = spark.createDataFrame(rows, "t string")
        a = spark.createDataFrame(rows[:50], "t string")
        b = spark.createDataFrame(rows[50:], "t string")
        direct = bloom_rollup(whole, "t", by=[], nbits=2048, k=4)
        merged = bloom_merge(
            bloom_rollup(a, "t", by=[], nbits=2048, k=4).unionByName(
                bloom_rollup(b, "t", by=[], nbits=2048, k=4)
            )
        )
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_group_isolation(self, spark):
        df = spark.createDataFrame(
            [("a", "only-in-a"), ("b", "only-in-b")], "g string, t string"
        )
        roll = bloom_rollup(df, "t", by=["g"], nbits=4096, k=5)
        items = spark.createDataFrame(
            [("a", "only-in-b"), ("b", "only-in-b")], "g string, item string"
        )
        got = {
            (r["g"], r["item"]): r["might_contain"]
            for r in bloom_contains(roll, items, "item", by=["g"]).collect()
        }
        assert got[("a", "only-in-b")] is False
        assert got[("b", "only-in-b")] is True

    def test_empty_rollup_all_false(self, spark):
        empty = bloom_rollup(
            spark.createDataFrame([], "t string"), "t", by=[], nbits=1024, k=3
        )
        got = self._probe(spark, empty, ["x", "y"])
        assert got == {"x": False, "y": False}

    def test_mixed_config_raises(self, spark):
        df = spark.createDataFrame([("x",)], "t string")
        mixed = bloom_rollup(df, "t", by=[], nbits=1024, k=3).unionByName(
            bloom_rollup(df, "t", by=[], nbits=2048, k=3)
        )
        with pytest.raises(ValueError, match="mixes filter configs"):
            self._probe(spark, mixed, ["x"])

    def test_explicit_config_skips_metadata_read(self, spark):
        df = spark.createDataFrame([("x",)], "t string")
        roll = bloom_rollup(df, "t", by=[], nbits=1024, k=3)
        got = self._probe(spark, roll, ["x", "y"], nbits=1024, k=3)
        assert got["x"] is True

    def test_null_items_and_probes_ignored(self, spark):
        df = spark.createDataFrame([("x",), (None,)], "t string")
        roll = bloom_rollup(df, "t", by=[], nbits=1024, k=3)
        items = spark.createDataFrame([("x",), (None,)], "item string")
        rows = bloom_contains(roll, items, "item").collect()
        assert {r["item"] for r in rows} == {"x"}

    def test_rollup_is_one_partial_agg_shuffle(self, spark):
        df = spark.createDataFrame([(f"w{i}",) for i in range(50)], "t string")
        plan = (
            bloom_rollup(df, "t", by=[], nbits=1024, k=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
        assert "partial_bit_or" in plan

    def test_cross_shard_gate_pattern(self, spark):
        # the documented use: filter a new shard against history's filter;
        # flagged rows are a superset of the true repeats
        history = spark.createDataFrame(
            [(i, f"seen-{i}") for i in range(100)], "id long, t string"
        )
        new = spark.createDataFrame(
            [(200 + i, f"seen-{i}") for i in range(10)]
            + [(300 + i, f"fresh-{i}") for i in range(90)],
            "id long, t string",
        )
        roll = bloom_rollup(history, "t", by=[], nbits=8192, k=5)
        flags = bloom_contains(roll, new, "t")
        joined = {r["item"]: r["might_contain"] for r in flags.collect()}
        repeats = {t for t, f in joined.items() if f}
        assert {f"seen-{i}" for i in range(10)} <= repeats  # no misses
        assert len(repeats) <= 15  # few collisions among the 90 fresh
