"""blockchain_indexer_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
CirclesUBI/blockchain-indexer (reference at /root/reference, studied for
behavior only), re-expressed Spark-first:

- ``schemas``    — declared StructTypes + chain constants (reference
  ``Settings.cs:47-67,182-183`` semantics).
- ``operators``  — classify / extract / promote / views (the blockchain
  domain) plus dedup, similarity and text-analysis operators for
  large-scale training-data pipelines.
- ``sources``    — parquet loaders, block-number sources (bulk / gap /
  reorg semantics).
- ``plans``      — the query library exposed through ``__spark_entry__``:
  every SURVEY.md §2 operator shape as a (Spark builder, DuckDB oracle
  SQL) pair over the driver testdata tables.
- ``streaming``  — Structured Streaming wiring (foreachBatch promote).

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
