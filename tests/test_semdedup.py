"""Semantic dedup (dedup.semdedup) and learned routing
(similarity.kmeans_routes) on synthetic embeddings with known structure."""

from __future__ import annotations

import pytest

from rtstore_spark.operators.dedup import semdedup
from rtstore_spark.operators.similarity import kmeans_routes


def _vec(base, eps=0.0):
    return [float(x) + eps for x in base]


@pytest.fixture(scope="module")
def clustered(spark):
    # two well-separated directions; ids 1-3 are near-copies of A,
    # ids 10-11 near-copies of B, id 20 is an isolated direction
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    c = [0.0, 0.0, 1.0, 0.0]
    rows = [
        (1, _vec(a)), (2, _vec(a, 0.01)), (3, _vec(a, 0.02)),
        (10, _vec(b)), (11, _vec(b, 0.01)),
        (20, _vec(c)),
    ]
    return spark.createDataFrame(rows, ["id", "emb"])


def test_kmeans_routes_shape_and_grouping(clustered):
    routed, centers = kmeans_routes(clustered, "emb", "id", k=3, seed=11, max_iter=10)
    rows = {r["id"]: r["route"] for r in routed.collect()}
    assert len(rows) == 6
    assert len(centers) == 3 and len(centers[0]) == 4
    # near-copies must share a route; the separated directions must not
    assert rows[1] == rows[2] == rows[3]
    assert rows[10] == rows[11]
    assert rows[1] != rows[10] != rows[20]


def test_semdedup_drops_near_copies_keeps_min(clustered):
    out = semdedup(clustered, "emb", "id", k=3, threshold=0.95, seed=11)
    drops = {r["drop_id"]: r["keep"] for r in out.collect()}
    assert drops == {2: 1, 3: 1, 11: 10}


def test_semdedup_no_duplicates_is_empty(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["id", "emb"])
    assert semdedup(df, "emb", "id", k=2, threshold=0.95, seed=3).count() == 0


def test_semdedup_quality_survivor(clustered):
    from pyspark.sql import functions as F

    # score id 3 highest in the A-cluster: it survives, 1 and 2 drop to it
    scored = clustered.withColumn(
        "score", F.when(F.col("id") == 3, 5.0).otherwise(1.0)
    )
    out = semdedup(
        scored, "emb", "id", k=3, threshold=0.95, seed=11, quality_col="score"
    )
    drops = {r["drop_id"]: r["keep"] for r in out.collect()}
    assert drops == {1: 3, 2: 3, 11: 10}  # B-cluster ties back to min id


class TestKnnJoin:
    def test_planted_neighbors_rank_first(self, spark):
        from rtstore_spark.operators.similarity import knn_join

        a = [1.0, 0.05, 0.0, 0.0]
        b = [0.0, 1.0, 0.05, 0.0]
        rows = [
            (1, a), (2, [x * 1.01 for x in a]), (3, [x * 0.99 + 0.01 for x in a]),
            (10, b), (11, [x * 1.02 for x in b]),
        ]
        df = spark.createDataFrame(rows, ["id", "emb"])
        out = knn_join(df, "emb", "id", k=2, num_planes=8, bands=8)
        by_id = {}
        for r in out.collect():
            by_id.setdefault(r["id"], []).append((r["rank"], r["nbr_id"], r["cosine"]))
        # scaled copies of A are each other's rank-1 (cosine 1.0)
        assert by_id[1][0][1] in (2, 3) and by_id[2][0][1] in (1, 3)
        assert by_id[10][0] == (1, 11, 1.0) and by_id[11][0] == (1, 10, 1.0)
        # ranks are dense 1..k and cosines non-increasing per id
        for rs in by_id.values():
            rs.sort()
            assert [r[0] for r in rs] == list(range(1, len(rs) + 1))
            assert all(rs[i][2] >= rs[i + 1][2] for i in range(len(rs) - 1))

    def test_each_pair_scored_once_and_self_excluded(self, spark):
        from rtstore_spark.operators.similarity import knn_join

        # identical vectors collide in EVERY band: the distinct must
        # still yield one row per (id, nbr) and never a self-edge
        v = [1.0, 0.0, 0.0, 0.0]
        df = spark.createDataFrame([(i, v) for i in range(4)], ["id", "emb"])
        out = knn_join(df, "emb", "id", k=10, num_planes=8, bands=4).collect()
        pairs = [(r["id"], r["nbr_id"]) for r in out]
        assert len(pairs) == len(set(pairs)) == 4 * 3
        assert all(i != j for i, j in pairs)

    def test_bad_band_split_rejected(self, spark):
        from rtstore_spark.operators.similarity import knn_join

        df = spark.createDataFrame([(1, [1.0, 0.0])], ["id", "emb"])
        import pytest as _pytest

        with _pytest.raises(ValueError, match="divide"):
            knn_join(df, "emb", "id", num_planes=10, bands=4)


class TestKnnClusters:
    def test_planted_clusters_recovered_mutually(self, spark):
        from rtstore_spark.operators.similarity import knn_clusters

        a = [1.0, 0.02, 0.0, 0.0]
        b = [0.0, 1.0, 0.02, 0.0]
        c = [0.0, 0.0, 0.0, 1.0]  # isolated
        rows = [
            (1, a), (2, [x * 1.01 for x in a]), (3, [x * 0.98 for x in a]),
            (10, b), (11, [x * 1.03 for x in b]),
            (20, c),
        ]
        df = spark.createDataFrame(rows, ["id", "emb"])
        out = {
            r["id"]: r["cluster"]
            for r in knn_clusters(
                df, "emb", "id", k=2, threshold=0.9, num_planes=8, bands=8
            ).collect()
        }
        assert out[1] == out[2] == out[3] == 1
        assert out[10] == out[11] == 10
        assert 20 not in out  # no mutual edge: singleton by absence
        assert out[1] != out[10]

    def test_threshold_splits_weak_links(self, spark):
        from rtstore_spark.operators.similarity import knn_clusters

        # two tight pairs bridged only by weak cosines: a high threshold
        # must keep them separate clusters
        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.05, 0.0, 0.0]),
            (10, [0.0, 0.0, 1.0, 0.0]), (11, [0.0, 0.05, 1.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, ["id", "emb"])
        out = {
            r["id"]: r["cluster"]
            for r in knn_clusters(
                df, "emb", "id", k=3, threshold=0.95, num_planes=8, bands=8
            ).collect()
        }
        assert out[1] == out[2] == 1 and out[10] == out[11] == 10


class TestKnnRobustness:
    def test_zero_norm_vector_never_ranks_first(self, spark):
        from rtstore_spark.operators.similarity import knn_join

        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.01, 0.0, 0.0]),
            (99, [0.0, 0.0, 0.0, 0.0]),  # zero-norm: empty-doc embedding
        ]
        df = spark.createDataFrame(rows, ["id", "emb"])
        out = knn_join(df, "emb", "id", k=2, num_planes=4, bands=4)
        rows_out = out.collect()  # must not raise DIVIDE_BY_ZERO (ANSI)
        by_id = {}
        for r in rows_out:
            by_id.setdefault(r["id"], []).append((r["rank"], r["nbr_id"], r["cosine"]))
        # the zero vector scores 0 against everything: the true neighbor
        # stays rank-1; NaN ordering would have put 99 first
        assert sorted(by_id[1])[0][1] == 2
        assert all(c == 0.0 for rs in by_id.values() for rk, n, c in rs if 99 in (n,))

    def test_empty_input_degrades_to_empty_output(self, spark):
        from rtstore_spark.operators.similarity import knn_clusters, knn_join

        df = spark.createDataFrame([], "id LONG, emb ARRAY<DOUBLE>")
        assert knn_join(df, "emb", "id", k=3).count() == 0
        assert knn_clusters(df, "emb", "id", k=3).count() == 0
