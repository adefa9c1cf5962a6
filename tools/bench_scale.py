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
Every timed measurement is the MEDIAN OF 3 passes with the raw passes
recorded in ``runs`` and the per-cell spread surfaced in ``variance``
(round-9 verdict #4: two ×20 ratios drifted ~0.12 across rounds on
unchanged plans — a lone pass cannot distinguish host noise from a plan
regression; the median can, and the spread says which it was).

Deep probe (round-11 verdict #4): the two plans whose ×20 ratios sit
closest to linear — q_order_priority (~0.49) and minhash_lsh_pairs
(~0.49) — additionally run at ×``SPARK_GRAFT_DEEP_SCALE`` (default 50;
0 disables). The 100-TB claim leans hardest on these staying sublinear,
so they get the extra decade: sf0.1×50 ≈ 30M lineitem rows / 250k docs
— comfortably inside 128 GiB. Their ×50 ratios land in
``ratios_vs_linear_deep``.
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


def _timed3(run) -> dict:
    """Median-of-3 timing of ``run()`` (which returns a row count):
    {"sec": median, "runs": [all 3], "rows": n}. Callers do their own
    warm-up before the first timed pass where cold costs (codegen,
    Python-worker startup) would otherwise land in pass 1."""
    walls: list[float] = []
    rows = 0
    for _ in range(3):
        t0 = time.time()
        rows = run()
        walls.append(round(time.time() - t0, 3))
    return {"sec": sorted(walls)[1], "runs": walls, "rows": int(rows)}


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


def _wire_probe(spark, k: int) -> dict:
    """Decode+verify kernel at chain inflation 5·k (the round-8 ask:
    the wire plane was unprobed at scale). The reference's checked-in
    artifact (204 signed envelopes) replicates at shifted block ranges
    — signatures stay valid, so every row pays the real secp256k1
    recovery. Expected shape: LINEAR in rows (embarrassingly parallel
    mapInPandas), so the normalized ratio should sit near or below 1
    once the fixed Python-worker startup amortizes."""
    from rtstore_spark.sources.wire_import import decode_wire_log

    artifact = "/root/reference/src/node/resources/test/37829_37968.gz.parquet"
    base = spark.read.parquet(artifact)
    base = base.select(
        base["payload"].cast("binary").alias("payload"),
        base["signature"].cast("string").alias("signature"),
        base["block"].cast("long").alias("block"),
        base["order"].cast("int").alias("order"),
    )
    copies = spark.range(5 * k).select((F.col("id") * 1000).alias("_shift"))
    df = copies.crossJoin(base).select(
        "payload", "signature",
        (F.col("block") + F.col("_shift")).alias("block"), "order",
    ).repartition(32).persist()
    n = df.count()

    def once() -> int:
        errors = decode_wire_log(df).filter(F.col("error").isNotNull()).count()
        assert errors == 0, f"{errors} decode failures"
        return int(n)

    out = _timed3(once)
    df.unpersist()
    return out


def _recovery_probe(k: int) -> dict:
    """Permaweb chain recovery at max(25, 5·k) artifacts (k=20 → the
    100-artifact chain). The ×1 floor of 25 exists because a 5-artifact
    walk through an 8-wide download pool finishes in ~tens of ms —
    below timer noise — which made round 8's ×1-normalized ratio
    meaningless; 25 artifacts puts the base measurement well above
    noise, and the ratio for this row normalizes by ARTIFACT COUNT
    (the ``rows`` field), not by k. Reuses the test suite's in-process
    gateway — the one that validates signature/id/fee/merkle like a
    real node — so the walk, the sig-verified tag reads, and the
    merkle-checked downloads are all exercised. Expected shape: LINEAR
    in artifact count by construction (a back-pointer chain walk is
    O(artifacts); the scale claims to verify are constant per-artifact
    cost and flat driver RSS)."""
    import random
    import shutil
    import threading
    from http.server import ThreadingHTTPServer

    from rtstore_spark.sources.permaweb import (
        ArPermaweb,
        recover_permaweb_chain,
    )
    from tests.test_permaweb import _GatewayHandler, _GatewayState

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _GatewayHandler)
    srv.state = _GatewayState()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    workdir = tempfile.mkdtemp(prefix="bench_recovery_")
    try:
        pw = ArPermaweb(
            f"http://127.0.0.1:{srv.server_address[1]}",
            os.path.join(workdir, "keys"),
            bits=768, rng=random.Random(0xBEEF),
        )
        n_art = max(25, 5 * k)
        rng = random.Random(k)
        tip = ""
        src = os.path.join(workdir, "artifact.bin")
        for i in range(n_art):
            with open(src, "wb") as f:
                f.write(rng.randbytes(4096))
            tip, _ = pw.upload_file(
                src, last_ar_tx=tip, start_block=i, end_block=i,
                network_id=1, filename=f"round-{i}.gz.parquet",
            )
        dests = iter(
            os.path.join(workdir, f"recovered{i}") for i in range(3)
        )

        def once() -> int:
            got = recover_permaweb_chain(pw, tip, next(dests))
            assert len(got) == n_art, f"recovered {len(got)} of {n_art}"
            return n_art

        out = _timed3(once)
        out["ms_per_artifact"] = round(1000.0 * out["sec"] / n_art, 2)
        return out
    finally:
        srv.shutdown()
        srv.server_close()
        shutil.rmtree(workdir, ignore_errors=True)


def _bm25_probe(spark, sdir: str, warm: bool = False) -> dict:
    """Batch BM25 search against an index over the inflated corpus —
    the decontamination shape. The index build (O(corpus), a rebuild
    cost) is materialized OUTSIDE the timed window; the timed part is
    the search job: broadcast query terms → postings probe → score sum
    → two-phase top-k. The query batch deliberately includes a
    stopword-heavy query ("the of and"): at x20 its matched set is
    ~the whole corpus, exactly the shape the single-window ranking of
    round 8 would have funneled through one reducer."""
    from rtstore_spark.operators.retrieval import (
        bm25_build,
        bm25_search_batch,
    )
    from rtstore_spark.tables import load_table

    docs = load_table(spark, sdir, "documents")
    postings, term_df, stats = bm25_build(docs, "text", "doc_id")
    postings = postings.persist()
    term_df = term_df.persist()
    postings.count(), term_df.count()
    queries = spark.createDataFrame(
        [
            (0, "model training data"),
            (1, "quality corpus analysis"),
            (2, "the of and"),
        ],
        "qid long, text string",
    )
    try:
        if warm:
            bm25_search_batch(
                postings, term_df, stats, queries, k=10
            ).count()
        out = _timed3(
            lambda: bm25_search_batch(
                postings, term_df, stats, queries, k=10
            ).count()
        )
    finally:
        postings.unpersist()
        term_df.unpersist()
    return out


def _bm25_maintained_probe(spark, sdir: str, warm: bool = False) -> dict:
    """Batch BM25 search against a MAINTAINED (base+delta) index shape:
    postings AND term dfs as two union arms with the dfs UNFOLDED — the
    exact plan ``read_bm25_index`` yields for a delta'd index (minus
    the file scans; the persisted layout's static bucket pruning is
    plan-pinned in tests/test_retrieval.py), exercising the round-10
    fold-after-restriction path. The scale claim: a maintained index's
    search ratio matches the fresh index's (``bm25_search``) — the
    per-batch cost must never grow with TOTAL vocabulary, only with
    matched postings."""
    from rtstore_spark.operators.retrieval import (
        bm25_build,
        bm25_search_batch,
    )
    from rtstore_spark.tables import load_table

    docs = load_table(spark, sdir, "documents")
    p1, t1, s1 = bm25_build(docs.filter(F.col("doc_id") % 2 == 0),
                            "text", "doc_id")
    p2, t2, s2 = bm25_build(docs.filter(F.col("doc_id") % 2 == 1),
                            "text", "doc_id")
    postings = p1.unionByName(p2).persist()
    term_df = t1.unionByName(t2).persist()  # unfolded: per-arm partials
    postings.count(), term_df.count()
    n_docs = s1["n_docs"] + s2["n_docs"]
    sum_dl = s1["sum_dl"] + s2["sum_dl"]
    stats = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 1.0,
        "n_buckets": s1["n_buckets"],
    }
    queries = spark.createDataFrame(
        [
            (0, "model training data"),
            (1, "quality corpus analysis"),
            (2, "the of and"),
        ],
        "qid long, text string",
    )
    try:
        if warm:
            bm25_search_batch(
                postings, term_df, stats, queries, k=10
            ).count()
        out = _timed3(
            lambda: bm25_search_batch(
                postings, term_df, stats, queries, k=10
            ).count()
        )
    finally:
        postings.unpersist()
        term_df.unpersist()
    return out


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
            results[name][f"x{k}"] = _timed3(
                lambda fn=fn: fn(spark, sdir).count()
            )
        results.setdefault("bm25_search", {})[f"x{k}"] = _bm25_probe(
            spark, sdir, warm=(k == scales[0])
        )
        results.setdefault("bm25_search_maintained", {})[f"x{k}"] = (
            _bm25_maintained_probe(spark, sdir, warm=(k == scales[0]))
        )
        if k == scales[0]:
            _wire_probe(spark, 1)  # warm the Python workers, untimed
        results.setdefault("wire_decode_verify", {})[f"x{k}"] = _wire_probe(
            spark, k
        )
        results.setdefault("permaweb_recovery", {})[f"x{k}"] = _recovery_probe(k)
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

    # deep probe: the flattest-scaling plans get one more decade of
    # inflation — their ratios carry the 100-TB claim (module doc)
    deep_k = int(os.environ.get("SPARK_GRAFT_DEEP_SCALE", "50"))
    deep_queries = ["q_order_priority", "minhash_lsh_pairs"]
    deep_ratios = {}
    if deep_k and deep_k not in scales:
        sdir = os.path.join(base, f"x{deep_k}")
        _inflate(spark, deep_k, sdir)
        for name in deep_queries:
            fn = queries[name]
            results[name][f"x{deep_k}"] = _timed3(
                lambda fn=fn: fn(spark, sdir).count()
            )
            w1 = results[name][f"x{scales[0]}"]["sec"]
            wd = results[name][f"x{deep_k}"]["sec"]
            deep_ratios[name] = (
                round((wd / w1) / (deep_k / scales[0]), 3) if w1 else None
            )
        rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
        rss[f"x{deep_k}"] = {
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
        for name in results:
            r0, r1 = results[name][f"x{k0}"], results[name][f"x{k1}"]
            w0, w1 = r0["sec"], r1["sec"]
            # wall-time growth normalized by DATA growth: ≈1 is linear,
            # <1 sublinear (fixed overheads amortize), >1 superlinear.
            # The two synthetic probes normalize by their own input-row
            # counts (the recovery probe floors its x1 at 25 artifacts,
            # so k1/k0 is NOT its data-growth factor).
            if name in ("wire_decode_verify", "permaweb_recovery"):
                growth = r1["rows"] / r0["rows"]
            else:
                growth = k1 / k0
            ratios[name] = round((w1 / w0) / growth, 3) if w0 else None

    from tools.bench_session import session_info

    # per-cell spread of the 3 raw passes, as a fraction of the median:
    # the reader's noise gauge when a ratio moves between rounds
    variance = {
        name: {
            xk: round((max(cell["runs"]) - min(cell["runs"]))
                      / max(cell["sec"], 1e-9), 3)
            for xk, cell in per_scale.items()
        }
        for name, per_scale in results.items()
    }

    print(json.dumps({
        "metric": "scale_stress",
        "sf_dir": SF_DIR,
        **session_info(),
        "scales": scales,
        "queries": results,
        "driver_peak_rss_mb": rss,
        "ratios_vs_linear": ratios,
        "ratios_vs_linear_deep": deep_ratios,
        "deep_scale": deep_k,
        "variance_spread_over_median": variance,
        "notes": {
            "deep_probe": (
                "q_order_priority and minhash_lsh_pairs — the two "
                "plans with x20 ratios closest to linear — re-probed "
                f"at x{deep_k}: the 100-TB claim leans hardest on "
                "these staying sublinear across another decade of "
                "inflation."
            ),
            "bm25_search": (
                "fixed 3-query batch (incl. a stopword-heavy query) "
                "against a bm25 index built over the inflated corpus; "
                "index build/materialization untimed (it is a rebuild "
                "cost, probed separately by its own ratio only through "
                "the postings volume the search scans). Two-phase "
                "top-k: no single reducer sees a query's full matched "
                "set."
            ),
            "bm25_search_maintained": (
                "same 3-query batch against the base+delta (maintained) "
                "index shape: two postings arms + UNFOLDED per-arm term "
                "dfs, folded only after the query-vocab restriction. "
                "The claim is parity with bm25_search's ratio — search "
                "cost must never grow with total vocabulary."
            ),
            "wire_decode_verify": (
                "5*k replications of the reference's 204-envelope "
                "artifact; real signature recovery per row. LINEAR by "
                "construction (embarrassingly parallel kernel) — the "
                "scale claim is ratio<=~1 and flat RSS, not sublinear."
            ),
            "permaweb_recovery": (
                "max(25, 5*k)-artifact back-pointer chain against the "
                "sig/merkle-validating in-process gateway; k=20 is the "
                "100-artifact chain. The x1 base is floored at 25 "
                "artifacts so it sits above timer noise, and this "
                "row's ratio normalizes by ARTIFACT COUNT (rows), not "
                "k. A chain walk is O(artifacts) — the scale claim is "
                "constant ms_per_artifact and flat RSS, not sublinear."
            ),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
