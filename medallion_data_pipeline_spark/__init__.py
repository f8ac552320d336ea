"""medallion_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference medallion ETL (pandas + psycopg2 +
PostgreSQL, see SURVEY.md) as idiomatic Spark DataFrame/SQL pipelines:

- ``functions/``  — scalar column-expression libraries (cleaning, text,
  vectors) replacing the reference's row-at-a-time Python cleaners.
- ``sources/``    — readers/writers (parquet testdata, CSV, JDBC-shaped
  sinks) replacing Sheets/psycopg2 ingestion.
- ``operators/``  — relational + LLM-data-pipeline operators (marts,
  profiling, windows, dedup, similarity search, multimodal plumbing).
- ``plans/``      — the medallion bronze→silver→gold→audit pipeline and
  data-quality check registry.
- ``queries/``    — the declared query inventory: every operator exposed
  as a (spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL
  string for the correctness gate.
- ``streaming/``  — Structured Streaming variants (green-field extension;
  the reference is batch-only, SURVEY.md §2.8).

Design stance (SURVEY.md §7): DataFrame-first, Catalyst does the
optimizing; broadcast small dimensions; no collect() on fact tables;
AQE on; Python UDFs only where built-ins genuinely cannot express the
semantics (and then Arrow-vectorized).
"""

__version__ = "0.1.0"
