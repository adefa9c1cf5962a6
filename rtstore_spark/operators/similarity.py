"""Similarity search over embedding columns (``array<float>``).

Baseline: exact brute-force cosine top-k — one scan, no shuffle except the
final top-k reduce (Spark compiles orderBy+limit to TakeOrderedAndProject:
per-partition heaps + single merge, never a global sort).

Scale path: hyperplane-LSH bucketing (deterministic md5-derived planes) so a
query probes one bucket (plus optional neighbor buckets), and an IVF-style
variant using per-label/centroid routing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> str:
    """JVM-side dot product over two float-array columns (no Python)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" 0.0D, (acc, v) -> acc + v)"
    )


def cosine_expr(a: str, b: str) -> Column:
    return F.expr(
        f"({dot_expr(a, b)}) / (sqrt({dot_expr(a, a)}) * sqrt({dot_expr(b, b)}))"
    )


def brute_force_topk(
    df: DataFrame, vec_col: str, id_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    with_q = df.withColumn("_q", qv)
    cos = cosine_expr(vec_col, "_q")
    return (
        with_q.select(F.col(id_col).alias("id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def _plane_component(seed: str, p: int, i: int) -> float:
    """Deterministic pseudo-random in [-1, 1): md5-derived, engine-agnostic."""
    import hashlib

    h = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()[:8]
    return int(h, 16) / 2147483648.0 - 1.0


def _plane_matrix(dim: int, planes: int, seed: str) -> list[list[float]]:
    return [
        [_plane_component(seed, p, i) for i in range(dim)] for p in range(planes)
    ]


def _bucket_expr(planes_col: Column, vec_col: str) -> Column:
    """Sign-pattern bucket of ``vec_col`` against a plane-matrix column
    (array<array<double>>): O(1) expression nodes regardless of dim."""
    return F.array_join(
        F.transform(
            planes_col,
            lambda plane: F.when(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col), plane, lambda x, c: x.cast("double") * c
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ),
        "",
    )


def hyperplane_bucket(vec_col: str, dim: int, planes: int = 8, seed: str = "lsh") -> Column:
    """Deterministic sign-pattern bucket id for a vector column.

    Plane components are md5-derived pseudo-randoms in [-1, 1) — identical on
    every executor, no RNG state to broadcast. The matrix enters the plan as
    an inline array literal folded through zip_with/aggregate — fine at test
    dims, but its plan text grows with planes × dim; for production dims
    (≥ 256, e.g. 768-d embeddings) use ``with_hyperplane_bucket``, which
    binds the matrix once as a broadcast one-row relation instead.
    """
    plane_arrays = ", ".join(
        "array(" + ", ".join(f"{_plane_component(seed, p, i)!r}D" for i in range(dim)) + ")"
        for p in range(planes)
    )
    return _bucket_expr(F.expr(f"array({plane_arrays})"), vec_col)


def with_hyperplane_bucket(
    df: DataFrame, vec_col: str, planes: int = 8, seed: str = "lsh",
    out_col: str = "bucket", dim: int | None = None,
) -> DataFrame:
    """Scale path: append a hyperplane-LSH ``out_col`` with the plane matrix
    bound ONCE as a broadcast single-row relation (LocalTableScan prints no
    data, so the plan stays small at any dim — an inline planes × dim
    literal is ~100 KB of plan text at dim 768 and slows every analysis
    pass). The broadcast of one row is free; the per-row math is identical
    to ``hyperplane_bucket``.
    """
    if dim is None:
        dim = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[0]["d"]
    spark = df.sparkSession
    matrix_df = spark.createDataFrame(
        [(_plane_matrix(dim, planes, seed),)], "_planes: array<array<double>>"
    )
    return (
        df.crossJoin(F.broadcast(matrix_df))
        .withColumn(out_col, _bucket_expr(F.col("_planes"), vec_col))
        .drop("_planes")
    )


def build_lsh_index(
    df: DataFrame, vec_col: str, id_col: str, planes: int = 8, seed: str = "lsh"
) -> DataFrame:
    """Materialize (id, vec, bucket). Write this partitioned by bucket for
    partition-pruned probes at scale."""
    return with_hyperplane_bucket(df, vec_col, planes, seed).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col("bucket"),
    )


def _bucket_of(query_vec: list[float], planes: int, seed: str) -> list[str]:
    """Driver-side bucket computation for a literal query vector, including
    single-bit-flip neighbor buckets (multi-probe)."""
    bits = []
    for p in range(planes):
        dot = sum(float(x) * _plane_component(seed, p, i) for i, x in enumerate(query_vec))
        bits.append("1" if dot >= 0 else "0")
    main = "".join(bits)
    probes = [main]
    for flip in range(planes):  # multi-probe: Hamming-1 neighbors
        b = list(main)
        b[flip] = "0" if b[flip] == "1" else "1"
        probes.append("".join(b))
    return probes


def lsh_topk(
    index: DataFrame, query_vec: list[float], k: int = 10,
    planes: int = 8, seed: str = "lsh", multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: probe the query's bucket (+ Hamming-1 neighbors), exact
    cosine within. With a bucket-partitioned index this is a partition-pruned
    scan of ~(planes+1)/2^planes of the data."""
    probes = _bucket_of(query_vec, planes, seed)
    if not multiprobe:
        probes = probes[:1]
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    hits = index.filter(F.col("bucket").isin(probes)).withColumn("_q", qv)
    cos = cosine_expr("vec", "_q")
    return (
        hits.select("id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def compute_centroids(df: DataFrame, vec_col: str, route_col: str) -> DataFrame:
    """Element-wise mean vector per coarse route: (route, centroid).

    One posexplode + two partial-agg shuffles over (route, i) — rows scale
    with routes × dim, never with the corpus. Persist the result (it is the
    IVF index's tiny hot half) and pass it to ``ivf_topk`` so repeated
    queries skip the corpus scan entirely.
    """
    pos = df.select(
        F.col(route_col).alias("route"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    )
    return (
        pos.groupBy("route", "i")
        .agg(F.avg("x").alias("c"))
        .groupBy("route")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("pairs"))
        .select("route", F.expr("transform(pairs, p -> p.c)").alias("centroid"))
    )


def write_ivf_index(
    df: DataFrame, vec_col: str, id_col: str, route_col: str, path: str
) -> None:
    """Materialize the IVF index: vectors parquet-partitioned by route (so a
    probe is a partition-pruned scan of nprobe directories) + persisted
    centroids under ``<path>/_centroids``."""
    df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col(route_col).alias("route"),
    ).write.mode("overwrite").partitionBy("route").parquet(path)
    compute_centroids(df, vec_col, route_col).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/_centroids")


def read_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(vectors partitioned by route, centroids) from ``write_ivf_index``."""
    vecs = spark.read.parquet(path)
    cents = spark.read.parquet(path + "/_centroids")
    return vecs, cents


def ivf_topk(
    df: DataFrame, vec_col: str, id_col: str, route_col: str,
    query_vec: list[float], k: int = 10, nprobe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: rank coarse partitions (``route_col``) by centroid
    similarity, scan only the best ``nprobe`` partitions.

    ``centroids``: a persisted (route, centroid) table from
    ``compute_centroids`` — without it they are recomputed from ``df`` (one
    extra corpus scan, fine for ad-hoc use, wasteful for repeated queries).
    When ``df`` is a route-partitioned parquet read (``write_ivf_index``),
    the broadcast-semi-join on route prunes to the probed partitions.
    Exact cosine within the probed partitions.
    """
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    cent = (
        centroids
        if centroids is not None
        else compute_centroids(df, vec_col, route_col)
    ).withColumn("_q", qv)
    ranked = cent.select(
        "route", cosine_expr("centroid", "_q").alias("route_score")
    ).orderBy(F.col("route_score").desc()).limit(nprobe)
    probed = df.join(
        F.broadcast(ranked.select(F.col("route").alias(route_col))), route_col
    ).withColumn("_q", qv)
    cos = cosine_expr(vec_col, "_q")
    return (
        probed.select(F.col(id_col).alias("id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )
