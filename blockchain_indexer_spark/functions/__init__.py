from blockchain_indexer_spark.functions import text, vectors  # noqa: F401
