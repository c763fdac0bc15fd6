"""asterlake — a PySpark-native analytics engine with the capabilities of
VictorClvtt/nasa_asteroid_data_lakehouse (reference at /root/reference/).

One idiomatic Spark system replacing the reference's three parallel stacks
(PySpark ETL scripts at ``src/etl/``, the pandas twins at ``src/etl/pandas/``,
and the DuckDB serving catalog at ``src/gold_catalog.py``):

- ``asterlake.session``     — SparkSession builder (local FS or S3A, config-driven)
- ``asterlake.schemas``     — explicit StructTypes for bronze / silver / gold
- ``asterlake.operators``   — pure DataFrame -> DataFrame transforms
  (flatten, star-schema build, dedup family, similarity search, text analysis)
- ``asterlake.sources``     — ingestion (NeoWs REST source, JSON bronze reader,
  partitioned parquet writers)
- ``asterlake.catalog``     — Spark SQL views + show/describe/sql helpers
  (replaces the reference's DuckDB catalog, src/gold_catalog.py:52-84)
- ``asterlake.pipeline``    — end-to-end bronze -> silver -> gold run
- ``asterlake.streaming``   — Structured Streaming incremental ingestion
- ``asterlake.plans``       — physical-plan inspection helpers (pushdown /
  broadcast assertions used by the perf tests)

Design stance (SURVEY.md §7): DataFrame/SQL-declared logical plans, Catalyst
and AQE pick the physical strategy; deterministic hash surrogate keys instead
of ``monotonically_increasing_id``; no ``collect()`` in any operator path so
every operator scales from local[32] to a 1000-executor cluster unchanged.
"""

__version__ = "0.1.0"
