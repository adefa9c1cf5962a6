"""Scale-stress harness: do the headline plans survive a 20-100x inflation?

The correctness gate runs at sf0.01 and the bench at sf0.1; this tool is
the empirical check behind the "would still work at 100 TB" claim. It
inflates the sf directory's FACT tables in place (distinct shifted keys,
referential integrity to the unscaled dimension tables preserved — dims
are broadcast-joined anyway, exactly like a real star schema), runs the
cost-dominant queries at each scale, and records wall time plus peak
driver RSS. A plan that is linear in input shows ~K-times wall time and
FLAT driver memory; superlinear time or growing driver RSS is the
scale-killer signal.

Inflation, per scale K:
- ``lineitem`` / ``orders``: K copies with ``orderkey + i*maxOrderkey``
  (join keys stay consistent between the two; cust/supp/part keys stay
  in the dims' range);
- ``documents``: K copies with salted ``doc_id`` — text is UNCHANGED,
  so dedup-family queries stress the true adversarial case (everything
  has K-1 near-identical twins);
- ``embeddings``: K copies with shifted ``id``;
- dimension tables and ``events`` are symlinked verbatim.

Prints ONE JSON line:
{"metric": "scale_stress", "scales": [..], "queries": {name:
 {scale: {"sec": s, "rows": n}}, ...}, "driver_peak_rss_mb": {scale: mb},
 "ratios": {name: wall(Kmax)/wall(1)/Kmax}}   (ratio ≈ 1 ⇒ linear)

Methodology: IDLE machine, one warm-up pass per query at scale 1 (same
convention as bench.py), facts materialized to a temp dir before timing.
Usage: python tools/bench_scale.py [K ...]   (default: 1 20)
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q_order_priority",
    "minhash_lsh_pairs",
    "simhash32",
    "substring_dedup_stats",
    "ann_ivf_topk",
]

_VERBATIM = [
    "region", "nation", "customer", "supplier", "part", "events",
]


def _inflate(spark, k: int, out_dir: str) -> None:
    """Materialize a load_table-compatible sf directory at scale k."""
    from rtstore_spark.tables import load_table

    os.makedirs(out_dir, exist_ok=True)
    for name in _VERBATIM:
        src = os.path.join(SF_DIR, f"{name}.parquet")
        os.symlink(src, os.path.join(out_dir, f"{name}.parquet"))

    def copies(df, shift_exprs: dict):
        if k == 1:
            return df
        reps = spark.range(k).select(F.col("id").alias("_rep"))
        out = reps.crossJoin(df)
        for col, expr in shift_exprs.items():
            out = out.withColumn(col, expr)
        return out.drop("_rep")

    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0]
    copies(orders, {
        "o_orderkey": F.col("o_orderkey") + F.col("_rep") * (max_ok + 1),
    }).write.parquet(os.path.join(out_dir, "orders.parquet"))
    copies(lineitem, {
        "l_orderkey": F.col("l_orderkey") + F.col("_rep") * (max_ok + 1),
    }).write.parquet(os.path.join(out_dir, "lineitem.parquet"))

    docs = load_table(spark, SF_DIR, "documents")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    copies(docs, {
        "doc_id": F.col("doc_id") + F.col("_rep") * (max_doc + 1),
    }).write.parquet(os.path.join(out_dir, "documents.parquet"))

    emb = load_table(spark, SF_DIR, "embeddings")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    copies(emb, {
        "vec_id": F.col("vec_id") + F.col("_rep") * (max_id + 1),
    }).write.parquet(os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    scales = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 20]

    from rtstore_spark.engine import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench_scale")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    results: dict = {q: {} for q in QUERIES}
    rss: dict = {}
    base = tempfile.mkdtemp(prefix="bench_scale_")
    for k in scales:
        sdir = os.path.join(base, f"x{k}")
        _inflate(spark, k, sdir)
        for name in QUERIES:
            fn = queries[name]
            if k == scales[0]:
                fn(spark, sdir).count()  # warm-up (codegen/JIT), untimed
            t0 = time.time()
            n = fn(spark, sdir).count()
            results[name][f"x{k}"] = {
                "sec": round(time.time() - t0, 3), "rows": int(n),
            }
        # Python driver RSS (collect buffers land here) + JVM driver heap
        # in use (broadcasts, JVM-side collects) — both must stay FLAT
        # across scales for the "no driver-side accumulation" claim
        rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
        rss[f"x{k}"] = {
            "python_peak_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
            ),
            "jvm_heap_used_mb": round(
                (rt.totalMemory() - rt.freeMemory()) / (1 << 20), 1
            ),
        }

    ratios = {}
    if len(scales) > 1:
        k0, k1 = scales[0], scales[-1]
        for name in QUERIES:
            w0 = results[name][f"x{k0}"]["sec"]
            w1 = results[name][f"x{k1}"]["sec"]
            # wall-time growth normalized by data growth: ≈1 is linear,
            # <1 sublinear (fixed overheads amortize), >1 superlinear
            ratios[name] = round((w1 / w0) / (k1 / k0), 3) if w0 else None

    print(json.dumps({
        "metric": "scale_stress",
        "sf_dir": SF_DIR,
        "scales": scales,
        "queries": results,
        "driver_peak_rss_mb": rss,
        "ratios_vs_linear": ratios,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
