"""Per-doc tf·idf keyword extraction (DuckDB-oracled on the real documents
table) and hashed-TF-IDF text clustering."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rtstore_spark.operators import text


class TestKeywords:
    def test_matches_duckdb_on_real_documents(self, spark, sf_dir):
        """Exploded (id, rank, token, score) rows must equal DuckDB
        computing the same smoothed tf·idf over the same parquet."""
        from rtstore_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        got = (
            text.keywords(docs, "text", "doc_id", k=5)
            .select(
                "id",
                F.posexplode(F.arrays_zip("keywords", "scores")).alias(
                    "rk", "kw"
                ),
            )
            .select("id", "rk", F.col("kw.keywords").alias("t"), F.col("kw.scores").alias("score"))
        )
        rows = {(r["id"], r["rk"]): (r["t"], r["score"]) for r in got.collect()}
        want = duckdb.sql(f"""
            with tok as (
              select doc_id as id,
                     regexp_replace(u.t, '^[^\\w]+|[^\\w]+$', '', 'g') as t
              from '{sf_dir}/documents.parquet',
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) u(t)
            ),
            tf as (
              select id, t, count(*) tf from tok
              where length(t) >= 3 group by 1, 2
            ),
            dfreq as (select t, count(*) df from tf group by 1),
            n as (select count(*) n from '{sf_dir}/documents.parquet'),
            scored as (
              select tf.id, tf.t,
                     round(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1)) + 1), 6) score
              from tf join dfreq using (t) cross join n
            ),
            ranked as (
              select id, t, score,
                     row_number() over (partition by id order by score desc, t) rk
              from scored
            )
            select id, rk - 1 as rk, t, score from ranked where rk <= 5
        """).fetchall()
        assert len(want) > 0 and len(rows) == len(want)
        for (wid, wrk, wt, wscore) in want:
            t, score = rows[(wid, wrk)]
            assert t == wt and score == pytest.approx(wscore, abs=1e-6), (
                wid, wrk, (t, score), (wt, wscore)
            )

    def test_rare_term_outranks_common(self, spark):
        df = spark.createDataFrame(
            [
                Row(id=1, t="common zebra"),
                Row(id=2, t="common words here"),
                Row(id=3, t="common words there"),
            ]
        )
        out = {r["id"]: r["keywords"] for r in text.keywords(df, "t", "id", k=2).collect()}
        # equal tf: 'zebra' (df=1, idf≈1.69) outranks 'common' (df=3, idf=1)
        assert out[1] == ["zebra", "common"]

    def test_punctuation_stripped_and_short_dropped(self, spark):
        df = spark.createDataFrame([Row(id=1, t='"Hello," she said -- ok?!')])
        out = text.keywords(df, "t", "id").collect()[0]
        assert set(out["keywords"]) == {"hello", "said", "she"}


class TestClusterTexts:
    def _corpus(self, spark):
        cooking = [
            "recipe flour sugar butter oven baking cake delicious dessert",
            "oven baking bread flour yeast recipe kitchen delicious",
            "sugar butter cake dessert baking recipe sweet oven",
        ]
        spark_docs = [
            "spark cluster shuffle partition executor catalyst dataframe",
            "executor partition shuffle spark catalyst query dataframe",
            "dataframe spark query catalyst cluster partition executor",
        ]
        return spark.createDataFrame(
            [Row(id=i, t=t) for i, t in enumerate(cooking + spark_docs)]
        )

    def test_topics_separate_and_deterministic(self, spark):
        out = {
            r["id"]: r["cluster"]
            for r in text.cluster_texts(
                self._corpus(spark), "t", "id", k=2, num_features=1 << 12
            ).collect()
        }
        assert len({out[0], out[1], out[2]}) == 1  # cooking docs together
        assert len({out[3], out[4], out[5]}) == 1  # spark docs together
        assert out[0] != out[3]
        again = {
            r["id"]: r["cluster"]
            for r in text.cluster_texts(
                self._corpus(spark), "t", "id", k=2, num_features=1 << 12
            ).collect()
        }
        assert again == out  # same seed ⇒ same assignment
