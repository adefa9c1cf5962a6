from rtstore_spark.plans.structured_query import run_structured_query  # noqa: F401
