"""BM25 inverted-index retrieval (operators/retrieval.py).

Correctness strategy, strongest first:
1. DIFFERENTIAL against text.bm25_topk — the single-query scan already
   oracle-grade-tested — for several queries on the real sf0.001
   documents table: the batch path must return identical (id, score)
   rows per query.
2. DuckDB replay of the full BM25 arithmetic on a small corpus.
3. Persistence: write → read round trip; rebuild pointer flip; crash
   before the flip leaves the previous generation live.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pyspark.sql import functions as F

from rtstore_spark.operators.retrieval import (
    bm25_batch_topk,
    bm25_build,
    bm25_search_batch,
    read_bm25_index,
    write_bm25_index,
)
from rtstore_spark.operators.text import bm25_topk

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    from rtstore_spark.tables import load_table

    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


QUERIES = [
    (0, "model training data"),
    (1, "quality corpus analysis"),
    (2, "the of and"),            # stopword-only: low idf, many hits
    (3, "zzzunseen tokenzzz"),    # no corpus hits: empty result set
]


class TestBatchMatchesSingleQuery:
    def test_differential_vs_bm25_topk(self, spark, docs):
        queries = spark.createDataFrame(QUERIES, "qid long, text string")
        batch = {
            qid: [(r["id"], r["score"]) for r in rows]
            for qid, rows in _group(
                bm25_batch_topk(
                    docs, "text", "doc_id", queries, k=7
                ).collect()
            ).items()
        }
        for qid, qtext in QUERIES:
            single = [
                (r["id"], r["score"])
                for r in bm25_topk(
                    docs, "text", "doc_id", qtext.split(), k=7
                ).collect()
            ]
            assert batch.get(qid, []) == single, f"query {qid} diverged"

    def test_k_cap_and_ordering(self, spark, docs):
        queries = spark.createDataFrame(
            [(9, "model data")], "qid long, text string"
        )
        out = bm25_batch_topk(docs, "text", "doc_id", queries, k=3).collect()
        assert len(out) == 3
        scores = [r["score"] for r in out]
        assert scores == sorted(scores, reverse=True)


def _group(rows):
    g: dict = {}
    for r in rows:
        g.setdefault(r["qid"], []).append(r)
    return g


class TestDuckDbReplay:
    def test_bm25_arithmetic_matches_duckdb(self, spark):
        corpus = [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple cherry cherry durian"),
            (4, "durian"),
            (5, "apple apple apple banana banana cherry"),
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        queries = spark.createDataFrame(
            [(0, "apple cherry"), (1, "banana durian")],
            "qid long, text string",
        )
        got = [
            (r["qid"], r["id"], r["score"])
            for r in bm25_batch_topk(
                df, "text", "doc_id", queries, k=10
            ).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE corpus AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, '{t}')" for i, t in corpus)
            + ") AS t(doc_id, text)"
        )
        con.execute(
            "CREATE TABLE queries AS SELECT * FROM (VALUES "
            "(0, 'apple cherry'), (1, 'banana durian')) AS t(qid, qtext)"
        )
        want = con.execute("""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
              FROM corpus
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
            stats AS (
              SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
            ),
            tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            qt AS (
              SELECT DISTINCT qid,
                     unnest(string_split_regex(lower(trim(qtext)), '\\s+')) AS term
              FROM queries
            )
            SELECT qt.qid, tf.doc_id,
                   round(sum(
                     ln(1 + (stats.n - tdf.df + 0.5) / (tdf.df + 0.5))
                     * (tf.tf * (1.2 + 1))
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                   ), 6) AS score
            FROM qt
            JOIN tf  ON tf.term = qt.term
            JOIN tdf ON tdf.term = qt.term
            JOIN dl  ON dl.doc_id = tf.doc_id
            CROSS JOIN stats
            GROUP BY qt.qid, tf.doc_id
            ORDER BY qt.qid, score DESC, tf.doc_id
        """).fetchall()
        assert got == [(q, d, pytest.approx(s, abs=2e-6)) for q, d, s in want]


class TestPersistence:
    def test_write_read_search_round_trip(self, spark, docs, tmp_path):
        path = str(tmp_path / "bm25")
        write_bm25_index(docs, "text", "doc_id", path, n_buckets=8)
        postings, term_df, stats = read_bm25_index(spark, path)
        assert stats["n_docs"] == docs.count()
        assert stats["n_buckets"] == 8
        queries = spark.createDataFrame(
            [(0, "model training data")], "qid long, text string"
        )
        via_index = [
            (r["id"], r["score"])
            for r in bm25_search_batch(
                postings, term_df, stats, queries, k=5
            ).collect()
        ]
        direct = [
            (r["id"], r["score"])
            for r in bm25_topk(
                docs, "text", "doc_id", ["model", "training", "data"], k=5
            ).collect()
        ]
        assert via_index == direct

    def test_rebuild_flips_pointer_sweeps_with_grace(
        self, spark, docs, tmp_path
    ):
        path = str(tmp_path / "bm25-re")
        write_bm25_index(docs.limit(50), "text", "doc_id", path)
        _, _, s1 = read_bm25_index(spark, path)
        assert s1["n_docs"] == 50
        write_bm25_index(docs.limit(80), "text", "doc_id", path)
        _, _, s2 = read_bm25_index(spark, path)
        assert s2["n_docs"] == 80
        # grace-of-one: the immediate predecessor survives a rebuild (a
        # reader's lazy plans may still reference its files); only
        # OLDER generations sweep
        gens = [d for d in os.listdir(path) if d.startswith("gen-")]
        assert len(gens) == 2
        write_bm25_index(docs.limit(60), "text", "doc_id", path)
        gens = sorted(d for d in os.listdir(path) if d.startswith("gen-"))
        assert len(gens) == 2  # gen-1 retired on the THIRD rebuild
        assert all(not g.startswith("gen-1-") for g in gens)

    def test_empty_corpus_refused_live_generation_survives(
        self, spark, docs, tmp_path
    ):
        path = str(tmp_path / "bm25-empty")
        write_bm25_index(docs.limit(50), "text", "doc_id", path)
        with pytest.raises(ValueError, match="EMPTY corpus"):
            write_bm25_index(
                docs.filter(F.lit(False)), "text", "doc_id", path
            )
        _, _, stats = read_bm25_index(spark, path)
        assert stats["n_docs"] == 50  # live generation untouched

    def test_crash_before_flip_leaves_previous_generation(
        self, spark, docs, tmp_path, monkeypatch
    ):
        from rtstore_spark.store import fs as fsmod

        path = str(tmp_path / "bm25-crash")
        write_bm25_index(docs.limit(50), "text", "doc_id", path)

        real = fsmod.LocalFS.write_text_atomic

        def dying(self, p, text):
            if p.endswith("/_current") and "gen-2" in text:
                raise RuntimeError("injected crash before pointer flip")
            return real(self, p, text)

        monkeypatch.setattr(fsmod.LocalFS, "write_text_atomic", dying)
        with pytest.raises(RuntimeError, match="injected crash"):
            write_bm25_index(docs.limit(80), "text", "doc_id", path)
        monkeypatch.undo()
        _, _, stats = read_bm25_index(spark, path)
        assert stats["n_docs"] == 50  # previous generation fully live

    def test_empty_query_hits_return_no_rows(self, spark, docs, tmp_path):
        queries = spark.createDataFrame(
            [(0, "zzzunseen tokenzzz")], "qid long, text string"
        )
        postings, term_df, stats = bm25_build(docs, "text", "doc_id")
        out = bm25_search_batch(postings, term_df, stats, queries, k=5)
        assert out.count() == 0


class TestPlanShape:
    def test_search_broadcasts_queries_not_postings(self, spark, docs):
        queries = spark.createDataFrame(
            [(0, "model data"), (1, "quality corpus")],
            "qid long, text string",
        )
        postings, term_df, stats = bm25_build(docs, "text", "doc_id")
        plan = (
            bm25_search_batch(postings, term_df, stats, queries, k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        # the per-(qid,id) score sum must partial-aggregate map-side
        assert "partial_sum" in plan
