"""Loaders for the driver-generated test tables (TESTDATA.md).

``events.ts`` and ``orders.o_orderdate`` are written as parquet
TIMESTAMP(NANOS), which Spark's vectorized reader rejects by default. We flip
``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) and rebuild a
microsecond TimestampType column via integer division — the same truncation
DuckDB applies when it narrows TIMESTAMP_NS to its µs TIMESTAMP, so oracle
comparisons agree. Session timezone is UTC (engine.py), so wall-clock values
match DuckDB's timezone-less TIMESTAMP.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_NANOS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


# (applicationId, sf_dir, name) -> DataFrame. The test tables are immutable
# parquet fixtures, and a DataFrame is an immutable logical plan whose file
# listing is captured at read time — so reusing one per session is safe and
# removes the dominant fixed cost of query *construction*: every
# spark.read.parquet is a py4j round-trip plus a footer read for schema
# (~100 ms), paid per table per query before this cache. Keyed by
# applicationId so a restarted session never sees plans from a dead context.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, cache: bool = True
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if cache and key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer `div`, not `/`: float division loses ULP precision at
            # 1e18-nanosecond magnitudes and can shift a value by 1 µs.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # µs-precision parquet timestamps surface as TIMESTAMP_NTZ; normalize to
    # session-UTC TIMESTAMP so unix_micros/date_trunc treat all tables alike.
    for c, dt in df.dtypes:
        if dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if cache:
        # one application is live at a time: drop entries from previous
        # (dead) sessions so restart loops don't accumulate stale
        # DataFrames holding references into defunct gateways
        app_id = key[0]
        for stale in [k for k in _TABLE_CACHE if k[0] != app_id]:
            del _TABLE_CACHE[stale]
        _TABLE_CACHE[key] = df
    return df


@functools.lru_cache(maxsize=64)
def _parse_size(v: str) -> int:
    """Parse a Spark size conf value ('67108864', '64MB', '10m', '-1')."""
    s = v.strip().lower().removesuffix("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(s) * mult


@functools.lru_cache(maxsize=256)
def table_size_bytes(sf_dir: str, name: str) -> int:
    """On-disk parquet bytes — the same sizeInBytes estimate Spark's planner
    uses for file sources (file size × fileCompressionFactor, default 1.0).
    Cached: the test tables are immutable fixtures, and ``maybe_broadcast``
    calls this once per join side per query build. The broadcast threshold
    itself is re-read from the live session conf on every call (tests and
    deployments retune it at runtime); only the pure string parse is
    memoized."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    if "://" in sf_dir:
        # URI table root (s3a://, hdfs://, …): size via the Hadoop
        # FileSystem client of the active session — same estimate source
        from pyspark.sql import SparkSession

        from rtstore_spark.store.fs import HadoopFS

        active = SparkSession.getActiveSession()
        if active is not None:
            return HadoopFS(active).du(path)
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if not f.startswith(("_", "."))
        )
    return os.path.getsize(path)


@functools.lru_cache(maxsize=256)
def scan_splits(sf_dir: str, name: str) -> int:
    """Upper bound on the scan parallelism the file layout admits.

    Parquet splits at ROW-GROUP boundaries: a byte-range task only
    produces rows for row groups whose midpoint falls inside its range,
    so a single-file single-row-group table is read by exactly ONE task
    no matter how many cores the cluster has. Footer-only read via
    pyarrow; cached (the fixtures are immutable). URI stores (s3a://,
    hdfs://) return a large sentinel — at warehouse scale the layout is
    many files and never the bottleneck this guards against.
    """
    import os

    if "://" in sf_dir:
        return 1 << 30
    path = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
        else:
            files = [path]
        return sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
    except Exception:  # pragma: no cover - missing file/pyarrow: be neutral
        return 1 << 30


def fan_out(
    spark: SparkSession,
    df: DataFrame,
    sf_dir: str,
    name: str,
    key: str | list[str] | None = None,
) -> DataFrame:
    """Repartition an UNDER-SPLIT scan so heavy per-row work parallelizes
    (optimization guide §2.5: "one huge unsplittable file" is input skew —
    "fix at the source if you can; otherwise repartition immediately after
    the read").

    The test fixtures are single-file single-row-group parquet, which
    admits exactly one scan task (see ``scan_splits``) — every downstream
    map-side cost (parquet decode aside) then runs on 1 of N cores. This
    helper inserts one hash exchange on ``key`` sized to the session's
    ``defaultParallelism`` ONLY when the layout admits fewer splits than
    cores; at warehouse scale (many files / row groups) it is a no-op, so
    nothing here is tuned to local[32] — the target tracks whatever core
    count the session actually has.

    ``key`` should be a high-cardinality column (the table's PK), picked
    so a downstream groupBy/window keyed the same way reuses the exchange
    (guide §2.4) instead of adding a second one. Keyed hash partitioning
    is preferred over round-robin because round-robin pays a local sort
    of the input (``spark.sql.execution.sortBeforeRepartition``) for
    retry determinism. Results are unchanged for the inventory's queries:
    every float aggregate is decimal-exact (order-independent) by design.
    """
    target = spark.sparkContext.defaultParallelism
    # Fan out only when the layout admits well under one task per core
    # (×4 hysteresis: a layout already within 4× of core count gains
    # little and the extra exchange is pure cost at warehouse scale).
    if scan_splits(sf_dir, name) * 4 > target:
        return df
    keys = [key] if isinstance(key, str) else list(key or [])
    if keys:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df.repartition(target)


def maybe_broadcast(
    spark: SparkSession, sf_dir: str, name: str, df: DataFrame
) -> DataFrame:
    """Broadcast hint only while the table fits the session's
    autoBroadcastJoinThreshold; above it, return the plan unhinted and let
    AQE pick the join strategy from runtime sizes.

    A hard-coded ``F.broadcast`` on a table that *grows with the fact* (e.g.
    orders vs lineitem) is a scale bug: past the threshold Spark would
    either OOM building the broadcast or silently fall back. Size-gate the
    hint on the same on-disk estimate the planner itself uses.
    """
    thr = _parse_size(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    if thr > 0 and table_size_bytes(sf_dir, name) <= thr:
        return F.broadcast(df)
    return df


def register_views(spark: SparkSession, sf_dir: str, names=None) -> None:
    """Register each table as a temp view for the SQL escape hatch."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def save_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a bucketed parquet table and return the bucketed
    relation — the co-located-join layout for 100-TB fact tables.

    Bucketing pays the shuffle ONCE at write time: every later equi-join
    or aggregation keyed on ``bucket_cols`` between tables bucketed with
    the same column set and bucket count runs exchange-free (the scan
    itself satisfies the hash-clustered distribution requirement), which
    at scale removes the dominant cost of repeated fact⋈fact joins —
    exactly what ``repartition()`` per query cannot do, since a plain
    parquet scan forgets its layout.

    The frame is pre-repartitioned by the same hash Spark's bucketing
    uses (``HashPartitioning`` = pmod(murmur3, n)), so each write task
    holds exactly one bucket and the table lands as one file per bucket
    — without this, every task writes a sliver of every bucket and the
    table explodes into tasks × buckets small files. ``sort_cols`` adds
    per-bucket sort order (sort-merge joins skip their sort step).

    The bucket spec lives in the session catalog (``table_name``); the
    data is external at ``path``. Size ``num_buckets`` so one bucket of
    the LARGEST co-bucketed table fits an executor core's working set
    (~100-500 MB of parquet per bucket at the target scale).
    """
    bc = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols or [])
    writer = (
        df.repartition(num_buckets, *[F.col(c) for c in bc])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bc)
        .option("path", path)
    )
    if sc:
        writer = writer.sortBy(*sc)
    writer.saveAsTable(table_name)
    return df.sparkSession.table(table_name)
