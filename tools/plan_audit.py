"""Physical-plan audit across the whole query inventory.

For every ``queries()`` entry, builds the DataFrame at the given SF dir and
inspects the executed plan for scale anti-patterns:

- CartesianProduct / BroadcastNestedLoopJoin  (accidental cross joins)
- BatchEvalPython                             (row-at-a-time Python UDF)
- shuffle vs broadcast Exchange counts        (shuffle budget per query)

Prints one line per query plus a summary; exits non-zero on hard flags
(cartesian, row-python). ArrowEvalPython (vectorized) is allowed but
reported. NESTED-LOOP is reported soft: every current occurrence is a
one-row broadcast cross join (query vector / plane matrix binding) —
effectively a map, not a join explosion.

Usage: python tools/plan_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
    else os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
)


def main() -> int:
    import __spark_entry__ as entrymod
    from rtstore_spark.engine import get_spark

    spark = get_spark("plan_audit")
    qs = entrymod.queries()
    only = {a for a in sys.argv[1:] if not os.path.isdir(a)}

    hard_flags = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            plan = (
                fn(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            hard_flags += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("NESTED-LOOP")
        if "BatchEvalPython" in plan:
            flags.append("ROW-PYTHON")
        arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        broadcasts = plan.count("BroadcastExchange")
        shuffles = plan.count("Exchange") - broadcasts
        hard = [f for f in flags if f in ("CARTESIAN", "ROW-PYTHON")]
        hard_flags += len(hard)
        status = "FLAG" if hard else "ok"
        extras = f" arrow_udf={arrow}" if arrow else ""
        print(
            f"{status:4} {name}: shuffles={shuffles} broadcasts={broadcasts}"
            f"{extras}{' ' + ','.join(flags) if flags else ''}"
        )
    print(f"\nhard flags: {hard_flags}")
    return 1 if hard_flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
