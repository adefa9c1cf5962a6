"""Bucketed-table layout: the pre-shuffled co-located join path.

Pins the property the helper exists for — a join and an aggregation on
the bucket key run with ZERO exchanges — and that the bucketed relation
returns exactly the unbucketed results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtstore_spark.tables import load_table, save_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-eligible joins so the bucketed scan, not a broadcast,
    is what removes the exchange."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)


def _executed(df) -> str:
    df.collect()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedLayout:
    def test_cobucketed_join_and_agg_are_exchange_free(
        self, spark, sf_dir, tmp_path, no_broadcast
    ):
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        bo = save_bucketed(
            orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            "t_orders_b", str(tmp_path / "o"), "o_custkey", num_buckets=8,
            sort_cols="o_custkey",
        )
        bc = save_bucketed(
            customer.select("c_custkey", "c_name"),
            "t_customer_b", str(tmp_path / "c"), "c_custkey", num_buckets=8,
            sort_cols="c_custkey",
        )
        try:
            joined = bo.join(bc, bo.o_custkey == bc.c_custkey).select(
                "o_orderkey", "c_name", "o_totalprice"
            )
            plan = _executed(joined)
            assert "Exchange" not in plan, plan
            # same rows as the plain-parquet join
            want = (
                orders.join(customer, orders.o_custkey == customer.c_custkey)
                .count()
            )
            assert joined.count() == want

            agg = bo.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
            aplan = _executed(agg)
            assert "Exchange" not in aplan, aplan
            got = {r["o_custkey"]: float(r["s"]) for r in agg.collect()}
            wantg = {
                r["o_custkey"]: float(r["s"])
                for r in orders.groupBy("o_custkey")
                .agg(F.sum("o_totalprice").alias("s"))
                .collect()
            }
            assert got == pytest.approx(wantg)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_orders_b")
            spark.sql("DROP TABLE IF EXISTS t_customer_b")

    def test_one_file_per_bucket(self, spark, sf_dir, tmp_path):
        import os

        orders = load_table(spark, sf_dir, "orders")
        save_bucketed(
            orders.select("o_orderkey", "o_custkey"),
            "t_files_b", str(tmp_path / "f"), "o_custkey", num_buckets=4,
        )
        try:
            files = [
                f for f in os.listdir(tmp_path / "f")
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
            assert len(files) == 4, files
        finally:
            spark.sql("DROP TABLE IF EXISTS t_files_b")
