"""As-of join unit tests (semantics pinned against hand-computed cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from rtstore_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            Row(sym="A", qts=10, px=100.0),
            Row(sym="A", qts=20, px=101.0),
            Row(sym="A", qts=30, px=102.0),
            Row(sym="B", qts=15, px=50.0),
        ]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", tts=5, qty=1),    # before any quote
            Row(sym="A", tts=20, qty=2),   # exact tie → matches the 20 quote
            Row(sym="A", tts=25, qty=3),   # between 20 and 30
            Row(sym="A", tts=99, qty=4),   # after all quotes
            Row(sym="B", tts=16, qty=5),
            Row(sym="C", tts=10, qty=6),   # key with no right rows
        ]
    )
    return quotes, trades


def test_backward_asof_semantics(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        value_cols=["px"],
    )
    got = {(r["sym"], r["tts"]): r["px_right"] for r in out.collect()}
    assert got == {
        ("A", 5): None,
        ("A", 20): 101.0,
        ("A", 25): 101.0,
        ("A", 99): 102.0,
        ("B", 16): 50.0,
        ("C", 10): None,
    }
    assert out.count() == trades.count()  # left-join cardinality preserved


def test_tolerance(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        value_cols=["px"], tolerance=10,
    )
    got = {(r["sym"], r["tts"]): r["px_right"] for r in out.collect()}
    # the tts=99 trade is 69 ticks after the last quote → nulled by tolerance
    assert got[("A", 99)] is None
    assert got[("A", 25)] == 101.0


class TestRangeJoin:
    def test_matches_inequality_join_on_real_events(self, spark):
        """Bucketed equi-join == DuckDB's native inequality join on real
        sf0.001 events against deterministic maintenance windows."""
        import datetime as dt

        import duckdb

        from rtstore_spark.operators.asof import range_join
        from rtstore_spark.tables import load_table

        sf = "/root/testdata/sf0.001"
        ev = load_table(spark, sf, "events").select("event_id", "ts")
        t0 = dt.datetime(2024, 1, 1)
        windows = [
            (i, t0 + dt.timedelta(hours=3 * i), t0 + dt.timedelta(hours=3 * i + 2))
            for i in range(40)
        ]
        iv = spark.createDataFrame(windows, "win_id long, w_start timestamp, w_end timestamp")
        got = {
            (r["event_id"], r["win_id"])
            for r in range_join(ev, iv, "ts", "w_start", "w_end").collect()
        }
        duckdb.sql("CREATE OR REPLACE TABLE w (win_id BIGINT, w_start TIMESTAMP, w_end TIMESTAMP)")
        duckdb.executemany("INSERT INTO w VALUES (?, ?, ?)", windows)
        want = set(
            duckdb.sql(
                f"""SELECT e.event_id, w.win_id
                    FROM '{sf}/events.parquet' e JOIN w
                      ON e.ts >= w.w_start AND e.ts < w.w_end"""
            ).fetchall()
        )
        assert got == want and len(got) > 0

    def test_overlapping_intervals_and_left_join(self, spark):
        from rtstore_spark.operators.asof import range_join

        ev = spark.createDataFrame(
            [(1, 5), (2, 15), (3, 99)], "event_id long, t long"
        )
        iv = spark.createDataFrame(
            [(10, 0, 10), (11, 4, 20), (12, 15, 16)],
            "win_id long, s long, e long",
        )
        out = range_join(ev, iv, "t", "s", "e", how="left", bucket_width=7)
        got = {(r["event_id"], r["win_id"]) for r in out.collect()}
        # event 1 in two overlapping windows; half-open: t=15 not in [15,16)?
        # yes it is: 15 >= 15 and 15 < 16. t=99 matches nothing (left-kept).
        assert got == {(1, 10), (1, 11), (2, 11), (2, 12), (3, None)}

    def test_keys_and_no_duplicates(self, spark):
        from rtstore_spark.operators.asof import range_join

        ev = spark.createDataFrame(
            [("a", 1, 5), ("b", 2, 5)], "k string, event_id long, t long"
        )
        # same time range, different keys; wide interval spanning many buckets
        iv = spark.createDataFrame(
            [("a", 7, 0, 1000), ("b", 8, 0, 1000)], "k string, win_id long, s long, e long"
        )
        out = range_join(ev, iv, "t", "s", "e", on="k", bucket_width=3)
        rows = [(r["k"], r["event_id"], r["win_id"]) for r in out.collect()]
        # exactly one output row per (event, enclosing interval) even though
        # the interval explodes onto ~334 buckets
        assert sorted(rows) == [("a", 1, 7), ("b", 2, 8)]

    def test_plan_is_equi_join_not_nested_loop(self, spark):
        from rtstore_spark.operators.asof import range_join

        ev = spark.createDataFrame([(i, i * 10) for i in range(100)], "event_id long, t long")
        iv = spark.createDataFrame([(i, i * 50, i * 50 + 30) for i in range(50)], "win_id long, s long, e long")
        out = range_join(ev, iv, "t", "s", "e", bucket_width=25)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRangeJoinFractional:
    def test_double_columns_not_truncated(self, spark):
        """Fractional event/interval columns must be compared exactly — a
        long cast would both spuriously match (t=1.9 vs [1.95, 3)) and
        miss (t=2.9 vs [2.0, 2.95))."""
        from rtstore_spark.operators.asof import range_join

        ev = spark.createDataFrame(
            [(1, 1.9), (2, 2.9), (3, 2.0)], "event_id long, t double"
        )
        iv = spark.createDataFrame(
            [(10, 1.95, 3.0), (11, 2.0, 2.95)],
            "win_id long, s double, e double",
        )
        out = range_join(ev, iv, "t", "s", "e", bucket_width=1)
        got = {(r["event_id"], r["win_id"]) for r in out.collect()}
        assert got == {(2, 10), (2, 11), (3, 10), (3, 11)}

    def test_fractional_end_reaches_final_bucket(self, spark):
        """end=2.5 with bucket_width=1 covers bucket 2; the integer-only
        end-bucket formula floor((end-1)/W) would stop at bucket 1 and the
        event at 2.2 would silently miss its interval."""
        from rtstore_spark.operators.asof import range_join

        ev = spark.createDataFrame([(1, 2.2)], "event_id long, t double")
        iv = spark.createDataFrame([(10, 0.5, 2.5)], "win_id long, s double, e double")
        out = range_join(ev, iv, "t", "s", "e", bucket_width=1)
        assert [(r["event_id"], r["win_id"]) for r in out.collect()] == [(1, 10)]

    def test_integer_end_boundary_still_exclusive(self, spark):
        """ceil(end/W)-1 keeps the half-open contract for integer ends: an
        interval ending exactly on a bucket boundary does not reach into
        that bucket, and boundary events don't match."""
        from rtstore_spark.operators.asof import range_join

        ev = spark.createDataFrame([(1, 4), (2, 3)], "event_id long, t long")
        iv = spark.createDataFrame([(10, 0, 4)], "win_id long, s long, e long")
        out = range_join(ev, iv, "t", "s", "e", bucket_width=2)
        assert {(r["event_id"], r["win_id"]) for r in out.collect()} == {(2, 10)}


class TestRangeJoinStringColumns:
    def test_numeric_strings_compare_numerically(self, spark):
        """String-typed numeric columns must coerce to double in the
        residual predicate — lexicographic '9' < '12' is false and would
        silently drop the match."""
        from rtstore_spark.operators.asof import range_join

        ev = spark.createDataFrame([(1, "9")], "event_id long, t string")
        iv = spark.createDataFrame([(10, "5", "12")], "win_id long, s string, e string")
        out = range_join(ev, iv, "t", "s", "e", bucket_width=100)
        assert [(r["event_id"], r["win_id"]) for r in out.collect()] == [(1, 10)]
