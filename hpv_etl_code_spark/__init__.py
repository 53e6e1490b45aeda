"""hpv_etl_code_spark — a PySpark-native analytics/ETL engine.

A ground-up, Spark-first rebuild of the query and data-processing
capabilities of the reference ``ncl-cancer-alliance/hpv_etl_code``
pipeline (a single-node eager pandas ETL, see SURVEY.md), generalized
into a lazy, distributed engine:

- sources/   — source registry (parquet star schema), wide-table ingestion,
               sinks with overwrite (truncate-reload) semantics
- functions/ — scalar/cleaning/vector expression helpers (all native
               Column expressions; zero row-at-a-time Python UDFs in the
               core paths)
- operators/ — reshaping (unpivot/pivot), grouping-sets rollups, dedup,
               similarity search, text analysis, multimodal plumbing
- plans/     — composed end-to-end pipelines (the reference-parity HPV
               pipeline among them)
- streaming/ — Structured Streaming windows/state on the events table

Design stance (SURVEY.md §7): idiomatic Spark, not a port. Everything is
a lazy DataFrame plan; Catalyst optimizes; the only actions are sinks and
tiny driver-side metadata reads.
"""

__version__ = "0.1.0"
