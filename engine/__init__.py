"""spark-graft engine — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference incremental-ETL pipeline
(NYPL/patron-info-poller), re-expressed Spark-first.

Layout (SURVEY.md §7):

- :mod:`engine.session`   — SparkSession builder tuned for the harness
- :mod:`engine.schemas`   — every explicit StructType (SURVEY §1.3: never infer)
- :mod:`engine.ops`       — one module per SURVEY §2 operator category
- :mod:`engine.pipeline`  — the three incremental pipeline mode graphs (SURVEY §3)
- :mod:`engine.streaming` — Structured Streaming layer (SURVEY §2.9)
- :mod:`engine.extended`  — scale-oriented LLM-data-pipeline operators
"""

__version__ = "0.1.0"
