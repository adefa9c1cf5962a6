"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-shape pricing summary) at
sf0.001. ``queries()``/``oracle_sql()`` expose the operator inventory from
``rtstore_spark.inventory`` — one entry per implemented operator from
SURVEY.md §2, each with a DuckDB-equivalent ANSI-SQL oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rtstore_spark import inventory  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return inventory.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return inventory.queries()


def oracle_sql() -> dict[str, str]:
    return inventory.oracle_sql()
