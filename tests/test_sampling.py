"""Deterministic sampling + contamination ops, cross-checked against DuckDB
running the equivalent SQL on the same parquet (oracle-grade, but outside
the 50-entry driver inventory)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rtstore_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestStratifiedSample:
    def test_uniform_sample_matches_duckdb(self, docs, sf_dir):
        out = sampling.stratified_sample(docs, "doc_id", 0.25, seed="s1")
        got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
        oracle = duckdb.sql(
            f"""
            SELECT doc_id FROM '{sf_dir}/documents.parquet'
            WHERE ('0x' || substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 1000000 < 250000
            ORDER BY doc_id
            """
        ).fetchall()
        assert got == [r[0] for r in oracle]
        # deterministic: the same seed reproduces the same rows
        again = sampling.stratified_sample(docs, "doc_id", 0.25, seed="s1")
        assert sorted(r["doc_id"] for r in again.select("doc_id").collect()) == got
        # a different seed draws a different sample
        other = sampling.stratified_sample(docs, "doc_id", 0.25, seed="s2")
        assert sorted(r["doc_id"] for r in other.select("doc_id").collect()) != got

    def test_per_stratum_fractions(self, docs):
        langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
        assert "en" in langs
        out = sampling.stratified_sample(
            docs, "doc_id", {"en": 1.0, "fr": 0.0}, strata_col="lang"
        )
        got = out.groupBy("lang").count().collect()
        by_lang = {r["lang"]: r["count"] for r in got}
        assert by_lang.get("en") == docs.filter(F.col("lang") == "en").count()
        assert "fr" not in by_lang  # fraction 0
        assert set(by_lang) == {"en"}  # unlisted strata dropped

    def test_fraction_accuracy(self, docs):
        n = docs.count()
        k = sampling.stratified_sample(docs, "doc_id", 0.5, seed="acc").count()
        assert abs(k / n - 0.5) < 0.15  # hash-uniformity at 500 rows

    def test_sample_is_pushed_filter(self, docs):
        out = sampling.stratified_sample(docs, "doc_id", 0.1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure filter: no shuffle anywhere


class TestNgramContamination:
    def test_known_overlap(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog tonight"),
                (2, "completely unrelated text with no benchmark overlap at all"),
                (3, "we said the quick brown fox jumps over the lazy dog"),
            ],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame(
            [(100, "THE QUICK brown fox jumps over the lazy dog")],
            ["doc_id", "text"],
        )
        out = sampling.ngram_contamination(corpus, bench, "text", "doc_id", n=8)
        rows = {(r["corpus_id"], r["bench_id"]): r["shared_ngrams"] for r in out.collect()}
        # doc 1 and 3 both contain the 8-gram span (case-insensitive)
        assert set(rows) == {(1, 100), (3, 100)}
        assert all(v >= 1 for v in rows.values())

    def test_matches_duckdb_oracle(self, spark, sf_dir):
        """Self-contamination of documents: every doc with ≥ n tokens shares
        its own n-grams; DuckDB computes the same pairs."""
        corpus = spark.createDataFrame(
            [(i, f"token{i} alpha beta gamma delta epsilon zeta eta theta") for i in range(6)],
            ["doc_id", "text"],
        )
        bench = corpus.filter(F.col("doc_id") < 2)
        out = sampling.ngram_contamination(corpus, bench, "text", "doc_id", n=3)
        got = sorted(
            (r["corpus_id"], r["bench_id"], r["shared_ngrams"])
            for r in out.collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE c(doc_id BIGINT, text VARCHAR)")
        con.execute("CREATE TABLE b(doc_id BIGINT, text VARCHAR)")
        for i in range(6):
            t = f"token{i} alpha beta gamma delta epsilon zeta eta theta"
            con.execute("INSERT INTO c VALUES (?, ?)", [i, t])
            if i < 2:
                con.execute("INSERT INTO b VALUES (?, ?)", [i, t])
        oracle = con.execute(
            """
            WITH cg AS (
              SELECT DISTINCT doc_id AS corpus_id,
                     array_to_string(toks[i:i+2], ' ') AS gram
              FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM c),
                   UNNEST(generate_series(1, len(toks) - 2)) AS t(i)
            ), bg AS (
              SELECT DISTINCT doc_id AS bench_id,
                     array_to_string(toks[i:i+2], ' ') AS gram
              FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM b),
                   UNNEST(generate_series(1, len(toks) - 2)) AS t(i)
            )
            SELECT corpus_id, bench_id, COUNT(*) AS shared
            FROM cg JOIN bg USING (gram)
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).fetchall()
        assert got == [(r[0], r[1], r[2]) for r in oracle]

    def test_word_ngrams_single_split_and_short_docs(self, spark):
        """The shingles-backed rewrite: one tokenizing split in the optimized
        plan (the old transform(sequence) lambda re-ran the split per
        element — O(tokens²) per row), and docs with < n tokens emit
        nothing instead of crashing (the old slice(_t, 0, n) formulation
        raised INVALID_PARAMETER_VALUE.START on exactly n-1 tokens)."""
        df = spark.createDataFrame(
            [(1, "A b c d e"), (2, "x y"), (3, "p q r")], ["id", "text"]
        )
        out = sampling._word_ngrams(df, "text", "id", 3)
        got = sorted(map(tuple, out.collect()))
        assert got == [(1, "a b c"), (1, "b c d"), (1, "c d e"), (3, "p q r")]
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("split(") == 1, plan


class TestDsir:
    def _corpora(self, spark):
        # target: clean encyclopedic-ish bigrams; raw: mixed clean/spam
        target = spark.createDataFrame(
            [(i, "the ancient city was founded on the river delta") for i in range(4)],
            "id long, text string",
        )
        raw = spark.createDataFrame(
            [
                (1, "the ancient city was founded on the river near the delta"),
                (2, "click here buy now cheap deals click here buy now"),
                (3, "the river delta was founded near the ancient city"),
                (4, "zz"),  # too short for a bigram
            ],
            "id long, text string",
        )
        return raw, target

    def test_weights_rank_target_like_docs_higher(self, spark):
        from rtstore_spark.operators.sampling import dsir_weights

        raw, target = self._corpora(spark)
        w = {r["id"]: r for r in dsir_weights(raw, target, "text", "id").collect()}
        assert set(w) == {1, 2, 3, 4}  # every raw doc gets a row
        # target-like prose outranks the spam doc decisively
        assert w[1]["log_w"] > w[2]["log_w"]
        assert w[3]["log_w"] > w[2]["log_w"]
        # no full n-gram -> zero evidence
        assert w[4]["n_features"] == 0 and w[4]["log_w"] == 0.0

    def test_topk_is_deterministic_and_weight_biased(self, spark):
        from rtstore_spark.operators.sampling import dsir_topk, dsir_weights

        raw, target = self._corpora(spark)
        w = dsir_weights(raw, target, "text", "id")
        pick = lambda s: sorted(
            r["id"] for r in dsir_topk(w, n=2, seed=s).collect()
        )
        assert pick("a") == pick("a")  # same seed: identical selection
        # near-zero temperature -> argmax of weights: the two target-like
        # docs must win regardless of the Gumbel noise
        hard = sorted(
            r["id"]
            for r in dsir_topk(w, n=2, temperature=1e-6, seed="x").collect()
        )
        assert hard == [1, 3]

    def test_partitioning_invariance(self, spark):
        from rtstore_spark.operators.sampling import dsir_topk, dsir_weights

        raw, target = self._corpora(spark)
        w1 = dsir_weights(raw.repartition(1), target, "text", "id")
        w8 = dsir_weights(raw.repartition(8), target.repartition(4), "text", "id")
        a = {(r["id"], round(r["log_w"], 9)) for r in w1.collect()}
        b = {(r["id"], round(r["log_w"], 9)) for r in w8.collect()}
        assert a == b
        assert sorted(r["id"] for r in dsir_topk(w1, 3).collect()) == sorted(
            r["id"] for r in dsir_topk(w8, 3).collect()
        )

    def test_weights_match_duckdb_replay(self, spark, sf_dir):
        """Full cross-engine replay of the weight math on real testdata:
        bucket hash, Laplace smoothing, log-ratio and the per-doc sum
        (the same contract the registry oracles enforce)."""
        import duckdb

        from rtstore_spark.operators.sampling import dsir_weights

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        target = docs.filter(F.col("lang") == "en")
        got = {
            r["id"]: round(r["log_w"], 6)
            for r in dsir_weights(
                docs, target, "text", "doc_id", n_buckets=500
            ).collect()
        }
        q = f"""
        WITH tok AS (
          SELECT doc_id, lang,
                 string_split_regex(trim(lower(text)), '\\s+') AS ts
          FROM '{sf_dir}/documents.parquet'),
        grams AS (
          SELECT doc_id, lang, ts[i] || ' ' || ts[i+1] AS g
          FROM tok, unnest(generate_series(1, len(ts)-1)) AS t(i)
          WHERE len(ts) >= 2),
        b AS (SELECT doc_id, lang,
                     ('0x' || substr(md5(g), 1, 12))::BIGINT % 500 AS bucket
              FROM grams),
        tc AS (SELECT bucket, count(*) c FROM b WHERE lang='en' GROUP BY 1),
        rc AS (SELECT bucket, count(*) c FROM b GROUP BY 1),
        tots AS (SELECT (SELECT sum(c) FROM tc) tt, (SELECT sum(c) FROM rc) rt),
        ratio AS (
          SELECT rc.bucket,
                 ln((coalesce(tc.c, 0) + 1.0) / (tt + 500.0))
               - ln((rc.c + 1.0) / (rt + 500.0)) AS lr
          FROM rc LEFT JOIN tc USING (bucket), tots)
        SELECT b.doc_id, round(sum(lr), 6) FROM b JOIN ratio USING (bucket)
        GROUP BY 1
        """
        exact = dict(duckdb.sql(q).fetchall())
        assert exact and set(exact) <= set(got)
        for k, v in exact.items():
            assert abs(got[k] - v) < 1e-4, (k, got[k], v)

    def test_topk_rejects_nonpositive_temperature(self, spark):
        from rtstore_spark.operators.sampling import dsir_topk, dsir_weights

        raw, target = self._corpora(spark)
        w = dsir_weights(raw, target, "text", "id")
        with pytest.raises(ValueError, match="temperature"):
            dsir_topk(w, n=1, temperature=0.0)
