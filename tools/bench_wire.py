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

Methodology: run on an IDLE machine (same rule as bench.py). The cold
stage is inherently one-shot (it pays the per-JVM Python-worker
startup exactly once); the warm stage is the MEDIAN OF 3 passes with
the raw passes in ``runs`` — the bench.py convention since round 8.
Cross-round comparison text is COMPUTED from the recorded fields (the
newest repo-root BENCH_WIRE_r*.json), never hand-written: round 8's
artifact cited numbers that contradicted its own fields.
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


def _vs_prev_note(result: dict) -> str:
    """Comparison note COMPUTED from the newest prior artifact's fields.

    Hand-written notes rot: BENCH_WIRE_r08's prose cited 2455/5131 while
    its own fields said 2725.1/5685.6. Every number below is derived
    from the two JSON documents at print time."""
    import glob
    import os
    import re

    prior = sorted(
        glob.glob("/root/repo/BENCH_WIRE_r*.json"),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    # a re-run AFTER the driver wrote this round's artifact must not
    # compare against that artifact (a near-zero "vs prev" delta of a
    # run against itself); $SPARK_GRAFT_ROUND names the current round
    # so only strictly-older artifacts qualify
    cur = os.environ.get("SPARK_GRAFT_ROUND")
    if cur and cur.isdigit():
        prior = [
            p for p in prior
            if int(re.search(r"_r(\d+)", p).group(1)) < int(cur)
        ]
    if not prior:
        return "no prior BENCH_WIRE artifact to compare against"
    prev_path = prior[-1]
    try:
        prev = json.loads(open(prev_path).read())
        pcold, pwarm = (
            float(prev["decode_mutations_per_sec"]),
            float(prev["decode_mutations_per_sec_warm"]),
        )
    except (ValueError, KeyError, OSError) as e:
        return f"prior artifact {os.path.basename(prev_path)} unreadable: {e}"
    cold, warm = (
        result["decode_mutations_per_sec"],
        result["decode_mutations_per_sec_warm"],
    )
    dc, dw = 100.0 * (cold / pcold - 1.0), 100.0 * (warm / pwarm - 1.0)
    return (
        f"vs {os.path.basename(prev_path)}: cold {pcold}->{cold}/s "
        f"({dc:+.1f}%), warm {pwarm}->{warm}/s ({dw:+.1f}%). The wire "
        "kernel is pure Python + fixed input, so this row is the "
        "round's host-CPU-speed reference when reading BENCH_r* deltas."
    )


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

    # warm steady-state: the cold number above pays one-time Python
    # worker startup (~2 s wall at local[32]); a long-running ingest pays
    # it once per executor, so the warm figure is the 100-TB-scan rate.
    # Median of 3 passes (bench.py's round-8 convention), raw passes kept
    warm_runs = []
    for _ in range(3):
        t0 = time.time()
        decode_wire_log(df).filter(F.col("error").isNotNull()).count()
        warm_runs.append(round(time.time() - t0, 3))
    stages["decode_verify_warm"] = sorted(warm_runs)[1]

    from tools.bench_session import session_info

    result = {
        "metric": "wire_path_total_wall",
        "unit": "sec",
        **session_info(),
        "input_mutations": int(n),
        "decode_mutations_per_sec": round(n / stages["decode_verify"], 1),
        "decode_mutations_per_sec_warm": round(
            n / stages["decode_verify_warm"], 1
        ),
        "runs": {"decode_verify_warm": warm_runs},
    }
    result["note"] = _vs_prev_note(result)
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
