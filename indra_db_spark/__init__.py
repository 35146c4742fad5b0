"""indra_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of gyorilab/indra_db.

The reference (at /root/reference) is a Postgres-backed statement database
with (a) a batch assembly/materialization dataflow and (b) a compositional
query algebra compiled to SQL.  This package re-expresses both halves as
idiomatic Spark DataFrame programs:

- ``indra_db_spark.plans``      — the Query algebra (HasAgent, HasType, ...,
  Intersection/Union/inversion) compiling to DataFrame plans over a
  readonly Parquet lake (reference: indra_db/client/readonly/query.py).
- ``indra_db_spark.assembly``   — the batch materialization DAG
  (distill -> preprocess -> dedup -> refinement -> belief -> readonly
  tables; reference: indra_db/readonly_dumping/*).
- ``indra_db_spark.operators``  — reusable relational + training-data
  operators (top-k, set ops, dedup families, similarity search, text
  analysis, multimodal plumbing).
- ``indra_db_spark.sources``    — parquet/TSV/JDBC-shaped readers/writers.
- ``indra_db_spark.functions``  — scalar helpers (id normalization, hashing,
  decimal-exact aggregation).
- ``indra_db_spark.streaming``  — Structured Streaming ingestion (extension;
  the reference is batch-only, SURVEY.md §2.11).
"""

__version__ = "0.1.0"
