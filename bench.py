"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a `noop` sink so the full plan runs (nothing is
collected to the driver, mirroring a cluster job's sink-side behavior).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rtstore_spark import inventory  # noqa: E402
from rtstore_spark.engine import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# ngram_jaccard_pairs is excluded: it is the exact-verification stage meant to
# run on LSH candidates only; running it corpus-wide at sf0.1 is the O(n^2)
# path the LSH pipeline exists to avoid.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_change",
    "q_top_orders_per_customer",
    "q_events_hourly",
    "q_user_sessions",
    "q_order_priority",
    "jql_filter_eq",
    "jql_json_subfield",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash32",
    "text_quality",
    "ann_cosine_topk",
]


def main() -> None:
    spark = get_spark("rtstore_spark_bench")
    qs = inventory.queries()
    timings: dict[str, float] = {}

    # Warm-up, untimed: the flagship once (JVM + parquet footers), then TWO
    # throwaway passes of every benched query. The first executions of a
    # query in a fresh JVM pay whole-stage-codegen compilation and JIT
    # warm-up that no steady-state execution pays — on a long-lived
    # cluster those are amortized to zero, so the measured portion
    # excludes them. Two passes, not one: with one, the timed pass totals
    # still declined monotonically (C2 compilation continues past the
    # first execution at these sub-second query durations), which skewed
    # the median upward.
    inventory.flagship(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for _ in range(2):
        for name in BENCH_QUERIES:
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # Median-of-3 whole PASSES (each pass runs every query once, in
    # order) with the per-pass totals recorded in the artifact: two
    # rounds of ±15% single-run noise on unchanged code showed that a
    # lone total cannot be compared across rounds — the median can, and
    # the spread of `runs` tells the reader whether the box was loaded.
    passes: list[dict[str, float]] = []
    for _ in range(3):
        p: dict[str, float] = {}
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            p[name] = time.perf_counter() - t0
        passes.append(p)

    def _median3(a: float, b: float, c: float) -> float:
        return sorted((a, b, c))[1]

    for name in BENCH_QUERIES:
        timings[name] = round(_median3(*(p[name] for p in passes)), 3)
    run_totals = [round(sum(p.values()), 3) for p in passes]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    from tools.bench_session import session_info

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": _median3(*run_totals),
                "unit": "sec",
                **session_info(),
                "runs": run_totals,
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
