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
