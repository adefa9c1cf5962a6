"""Wire-interop benchmark: decode/verify/import throughput.

Replicates the reference node's checked-in rollup artifact N× (distinct
block ranges so ids/ranges don't collide), then times:

- ``decode`` (N× replicated input): distributed envelope parse +
  secp256k1 signature recovery + protobuf/BSON decode
  (`decode_wire_log`) — the per-row CPU kernel a 100-TB foreign-archive
  ingest is bounded by, embarrassingly parallel;
- with ``--full``, additionally ``import`` (1× artifact) and ``export``
  (the imported store). These are NOT scaled by N and are off by
  default: this artifact is catalog-heavy (2/3 of its mutations CREATE
  databases/collections, applied driver-side like the reference's own
  control path — ~seconds per catalog op at local[32] job overheads),
  so timing it measures catalog-op latency, not data throughput; the
  set-wise doc replay that actually scales is covered by
  bench_ingest.py, and the end-to-end import is correctness-pinned in
  tests/test_wire_import.py.

Prints ONE JSON line: {"metric": "wire_path_total_wall", "value": sec,
"stages": {...}, "input_mutations": N, "decode_mutations_per_sec": r}
(plus "mutations"/"exported" under --full).

Methodology: run on an IDLE machine (same rule as bench.py); each stage
timed cold, one pass — these are linear scans, not cached-plan queries.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from rtstore_spark.engine import get_spark  # noqa: E402
from rtstore_spark.sources.wire_export import export_wire_rollup  # noqa: E402
from rtstore_spark.sources.wire_import import (  # noqa: E402
    decode_wire_log,
    import_wire_rollup,
)
from rtstore_spark.store.docstore import DocStore  # noqa: E402

ARTIFACT = "/root/reference/src/node/resources/test/37829_37968.gz.parquet"
FULL = "--full" in sys.argv
_args = [a for a in sys.argv[1:] if not a.startswith("-")]
COPIES = int(_args[0]) if _args else 50  # 50 × 204 = 10200 rows


def main() -> None:
    spark = get_spark("bench_wire")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(ARTIFACT)
    base = base.select(
        base["payload"].cast("binary").alias("payload"),
        base["signature"].cast("string").alias("signature"),
        base["block"].cast("long").alias("block"),
        base["order"].cast("int").alias("order"),
    )
    # N copies at shifted block ranges: same bytes, distinct history.
    # The envelope signatures stay VALID (block is outside the signed
    # payload), so recovery still runs per row.
    span = 1000
    copies = spark.range(COPIES).select(
        (F.col("id") * span).alias("_shift")
    )
    df = copies.crossJoin(base).select(
        "payload", "signature",
        (F.col("block") + F.col("_shift")).alias("block"), "order",
    ).repartition(32).persist()
    n = df.count()  # materialize input before timing

    stages: dict[str, float] = {}

    t0 = time.time()
    decoded = decode_wire_log(df)
    # one OUTPUT row per (mutation, BodyWrapper): count FAILURES, not a
    # row-for-row match — a multi-body mutation legitimately fans out
    errors = decoded.filter(F.col("error").isNotNull()).count()
    stages["decode_verify"] = round(time.time() - t0, 3)
    assert errors == 0, f"{errors} decode failures"

    # warm steady-state pass: the cold number above pays one-time Python
    # worker startup (~2 s wall at local[32]); a long-running ingest pays
    # it once per executor, so the warm figure is the 100-TB-scan rate —
    # same warm-up convention bench.py applies to every query
    t0 = time.time()
    decode_wire_log(df).filter(F.col("error").isNotNull()).count()
    stages["decode_verify_warm"] = round(time.time() - t0, 3)

    result = {
        "metric": "wire_path_total_wall",
        "unit": "sec",
        "input_mutations": int(n),
        "decode_mutations_per_sec": round(n / stages["decode_verify"], 1),
        "decode_mutations_per_sec_warm": round(
            n / stages["decode_verify_warm"], 1
        ),
    }
    if FULL:
        store = DocStore(spark, tempfile.mkdtemp(prefix="benchwire_"))
        t0 = time.time()
        report = import_wire_rollup(store, base)
        stages["import_replay"] = round(time.time() - t0, 3)
        t0 = time.time()
        out = tempfile.mkdtemp(prefix="benchwire_out_") + "/export"
        exported = export_wire_rollup(store, out, priv=0xBEEF)
        stages["export_sign"] = round(time.time() - t0, 3)
        result["mutations"] = int(report["mutations"])
        result["exported"] = int(exported)

    df.unpersist()
    result["stages"] = stages
    # headline value stays the COLD decode stage (comparable across
    # rounds); the warm stage is reported alongside, not summed in
    result["value"] = stages["decode_verify"]
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
