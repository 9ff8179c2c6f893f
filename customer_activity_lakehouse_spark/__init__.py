"""customer_activity_lakehouse_spark — a PySpark-native lakehouse analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``Aishwar04/customer-activity-lakehouse`` (a Dask + s3fs + Prefect batch ETL
pipeline; see /root/reference) as an idiomatic Spark engine:

- ``sources``   — CSV/Parquet scans & sinks (reference data_processing.py:135-244,
  399-435) plus synthetic generators (generate_transaction.py:6-51).
- ``operators`` — raw→curated transforms (data_processing.py:163-392), dedup,
  similarity search, text analysis, multimodal column plumbing.
- ``functions`` — scalar/vector/text expression helpers (all JVM-side built-ins).
- ``plans``     — the analytical query catalog served over the star schema
  (the query surface the reference delegates to Spark SQL, ReadMe.md:85-94).
- ``streaming`` — Structured Streaming ingest of the events stream
  (the reference's declared future work, ReadMe.md:99).
- ``pipeline``  — the end-to-end 6-step DAG (flows.py:285-384), Prefect-free.

Everything is DataFrame/Catalyst-first: transforms are lazy, writes are the only
actions, dimensions broadcast, facts hive-partition by date.
"""

__version__ = "0.1.0"
