from rtstore_spark.store.docstore import DocStore  # noqa: F401
