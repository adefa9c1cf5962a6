"""Sequence packing (operators.pipeline.pack_sequences): conservation,
budget, determinism vs input partitioning, and long-doc splitting."""

from __future__ import annotations

import pytest

from rtstore_spark.operators.pipeline import pack_sequences


@pytest.fixture(scope="module")
def corpus(spark):
    # 60 docs of 5..64 tokens plus two oversize docs (7x and 2.5x budget)
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(5 + (i * 7) % 60)))
            for i in range(60)]
    rows.append((900, " ".join(f"big{j}" for j in range(7 * 32))))
    rows.append((901, " ".join(f"huge{j}" for j in range(80))))
    return spark.createDataFrame(rows, ["id", "text"]), rows


def _total_tokens(rows):
    return sum(len(t.split()) for _, t in rows)


def test_conservation_budget_and_coverage(corpus):
    df, rows = corpus
    out = pack_sequences(df, "text", "id", seq_tokens=32, n_buckets=8).collect()
    assert sum(r["n_tokens"] for r in out) == _total_tokens(rows)
    assert all(r["n_tokens"] <= 32 for r in out)
    assert all(r["n_tokens"] == len(r["text"].split()) for r in out)
    assert all(r["n_docs"] == len(r["doc_ids"]) for r in out)
    # every doc appears; oversize docs appear once per piece
    flat = [d for r in out for d in r["doc_ids"]]
    assert set(flat) == {i for i, _ in rows}
    assert flat.count(900) == 7  # 224 tokens / 32 = 7 full pieces
    assert flat.count(901) == 3  # 32 + 32 + 16-token tail


def test_deterministic_vs_input_partitioning(corpus):
    df, _ = corpus

    def key(df_in):
        return sorted(
            (r["seq_id"], tuple(r["doc_ids"]), r["n_tokens"], r["text"])
            for r in pack_sequences(
                df_in, "text", "id", seq_tokens=32, n_buckets=8
            ).collect()
        )

    assert key(df.repartition(7)) == key(df.repartition(3, "text"))


def test_seq_ids_dense_per_bucket(corpus):
    df, _ = corpus
    out = pack_sequences(df, "text", "id", seq_tokens=32, n_buckets=4).collect()
    by_bucket: dict[int, list[int]] = {}
    for r in out:
        b, i = r["seq_id"].split("-")
        assert int(b) == r["bucket"]
        by_bucket.setdefault(r["bucket"], []).append(int(i))
    for idxs in by_bucket.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_packing_is_dense(spark):
    # uniform 10-token docs into a 100-token budget: every sequence except
    # possibly one per bucket is exactly full
    df = spark.createDataFrame(
        [(i, " ".join(f"t{i}p{j}" for j in range(10))) for i in range(200)],
        ["id", "text"],
    )
    out = pack_sequences(df, "text", "id", seq_tokens=100, n_buckets=4).collect()
    short = [r for r in out if r["n_tokens"] < 100]
    assert len(short) <= 4
    assert sum(r["n_tokens"] for r in out) == 2000


def test_property_conservation_and_budget(spark):
    # Fuzzed invariants: for random corpora (varied doc lengths incl.
    # oversize and empty) and random budgets, packing conserves tokens
    # exactly, never exceeds the budget, and covers every non-empty doc.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        lens=st.lists(st.integers(min_value=0, max_value=90), min_size=1, max_size=40),
        budget=st.integers(min_value=4, max_value=40),
        buckets=st.integers(min_value=1, max_value=5),
    )
    def check(lens, budget, buckets):
        rows = [(i, " ".join(f"d{i}t{j}" for j in range(n)))
                for i, n in enumerate(lens)]
        df = spark.createDataFrame(rows, ["id", "text"])
        out = pack_sequences(
            df, "text", "id", seq_tokens=budget, n_buckets=buckets
        ).collect()
        assert sum(r["n_tokens"] for r in out) == sum(lens)
        assert all(0 < r["n_tokens"] <= budget for r in out)
        flat = {d for r in out for d in r["doc_ids"]}
        assert flat == {i for i, n in enumerate(lens) if n > 0}

    check()


def test_string_ids_and_empty_docs(spark):
    df = spark.createDataFrame(
        [("a", "one two three"), ("b", ""), ("c", "four five")],
        ["id", "text"],
    )
    out = pack_sequences(df, "text", "id", seq_tokens=10, n_buckets=2).collect()
    flat = sorted(d for r in out for d in r["doc_ids"])
    assert flat == ["a", "c"]  # empty doc contributes nothing
    assert all(isinstance(d, str) for d in flat)
