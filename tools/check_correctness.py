"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against the matching
``oracle_sql()`` in DuckDB: row count, column names, and an order-insensitive
value comparison (rows sorted by all columns, floats rounded to 9 sig figs).

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from rtstore_spark.engine import get_spark

    spark = get_spark("correctness_check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )

    only = set(sys.argv[1:])

    # Value-domain guard for the scaled-long money aggregates
    # (inventory q1/q3/q5/q6): `cast(x * 100 + 0.5 as bigint)` equals the
    # unscaled decimal(18,4) cast ONLY while the money columns are exact
    # 2-decimal non-negative values. Re-prove that precondition on this
    # gate's data so a future fixture regeneration with finer precision
    # fails HERE, loudly, instead of shifting an aggregate by an ulp.
    p2e, d2e, t2e, qe, pmin, dmin, tmin, qmin = con.execute(
        """SELECT max(abs(l_extendedprice*100 - round(l_extendedprice*100))),
                  max(abs(l_discount*100 - round(l_discount*100))),
                  max(abs(l_tax*100 - round(l_tax*100))),
                  max(abs(l_quantity - round(l_quantity))),
                  min(l_extendedprice), min(l_discount), min(l_tax),
                  min(l_quantity)
           FROM lineitem"""
    ).fetchone()
    if (
        max(p2e, d2e, t2e, qe) > 1e-6
        or min(pmin, dmin, tmin, qmin) < 0
    ):
        print(
            "FAIL scaled-long precondition: lineitem money columns are no "
            f"longer exact non-negative 2dp (errs {p2e}, {d2e}, {t2e}, {qe}; "
            f"mins {pmin}, {dmin}, {tmin}, {qmin}) — revert inventory "
            "q1/q3/q5/q6 to the decimal(18,4) aggregate form"
        )
        return 1

    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = normalize([r.asDict() for r in sdf.collect()], scols)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"okNO-ORACLE {name}: rows={len(srows)}")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
            dcols = list(ddf.columns)
            drows = normalize(ddf.to_dict("records"), dcols)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            failures.append(name)
            continue
        if scols != dcols:
            # rebuild duckdb rows in spark column order
            drows = normalize(ddf[scols].to_dict("records"), scols)
        if srows != drows:
            diff = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs at {diff}")
            for i in diff:
                print(f"   spark : {srows[i]}")
                print(f"   duckdb: {drows[i]}")
            failures.append(name)
            continue
        print(f"ok {name}: rows={len(srows)}")

    print(f"\n{ran - len(failures)}/{ran} pass ({len(qs)} registered)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
