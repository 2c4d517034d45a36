"""arnab_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference project ``ariaghora/arnab``.

The reference (see /root/reference, surveyed in SURVEY.md) is a SQL pipeline
orchestrator that delegates all query execution to an embedded DuckDB
(reference: src/node.rs:176). This rebuild keeps the same contract — a
directory of SQL model files plus a YAML config in, materialized relations
and a DAG visualization out — but makes Apache Spark the engine: models
become lazy temp views over Parquet and Catalyst replaces DuckDB as the
optimizer/executor.

Layout
------
- :mod:`arnab_spark.config`    — YAML config (reference: src/session.rs:16-40)
- :mod:`arnab_spark.node`      — model node: macro render, dependency
  extraction, materialization (reference: src/node.rs)
- :mod:`arnab_spark.session`   — discovery, DAG build, toposort, run loop
  (reference: src/session.rs)
- :mod:`arnab_spark.viz`       — DAG → DOT/SVG (reference: src/graphviz.rs)
- :mod:`arnab_spark.cli`       — ``run`` / ``run-file`` / ``viz`` commands
  (reference: src/main.rs)
- :mod:`arnab_spark.queries`   — the operator corpus: every delegated-SQL
  capability from SURVEY.md §2.B re-expressed as Spark DataFrame/SQL,
  plus the beyond-reference LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing).
- :mod:`arnab_spark.streaming` — Structured Streaming extensions.
"""

__version__ = "0.1.0"
