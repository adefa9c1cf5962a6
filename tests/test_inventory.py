"""Registry-contract pins for the driver interface: the correctness
harness truncates at 50 entries, records rows in registration order, and
pairs every query with its oracle by name — violating any of these
silently un-verifies an operator family."""

from __future__ import annotations


def test_registry_contract():
    import __spark_entry__ as entry
    from rtstore_spark.inventory import _FIRST

    q = entry.queries()
    o = entry.oracle_sql()
    # the driver truncates at 50: more entries silently drop the tail,
    # fewer wastes verified coverage
    assert len(q) == 50, len(q)
    # the round-1-truncated entries stay first so a truncated run can
    # never leave a family unverified again
    assert list(q)[: len(_FIRST)] == _FIRST
    # every oracle pairs with a registered query, every query callable
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_rotation_policy():
    """Exactly one rotation-pool entry occupies the rotating slot; the
    others remain registered (their functions stay callable and their
    oracle SQL stays paired) so a future round can rotate them back in
    without re-writing anything."""
    import __spark_entry__ as entry
    from rtstore_spark.inventory import (
        _REGISTRY,
        _ROTATION_POOL,
        ROTATION_ROUND,
    )

    q = entry.queries()
    in_slot = _ROTATION_POOL[ROTATION_ROUND % len(_ROTATION_POOL)]
    assert in_slot in q
    for name in _ROTATION_POOL:
        assert name in _REGISTRY  # registration survives rotation
        fn, sql = _REGISTRY[name]
        assert callable(fn) and isinstance(sql, str) and sql.strip()
        if name != in_slot:
            assert name not in q  # sitting out this round


def test_rotated_out_pivot_still_correct(spark):
    """Family-coverage guarantee for q_events_pivot while it sits out of
    the oracle registry: the pivot must equal a per-type filtered-count
    aggregation at sf0.001 — the same per-(user, type) counts the oracle
    SQL checks, derived here without pivot()."""
    from pyspark.sql import functions as F

    from rtstore_spark.inventory import q_events_pivot
    from rtstore_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (
            r["n_click"], r["n_view"], r["n_error"], r["n_signup"],
            r["n_purchase"],
        )
        for r in q_events_pivot(spark, sf).collect()
    }
    types = ["click", "view", "error", "signup", "purchase"]
    want = {
        r["user_id"]: tuple(r[f"n_{t}"] for t in types)
        for r in load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(*[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in types
        ])
        .collect()
    }
    assert got == want and len(got) > 0
