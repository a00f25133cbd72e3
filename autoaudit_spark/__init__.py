"""autoaudit_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mengchillee/AutoAudit (IEEE Big Data 2020),
re-expressed Spark-first for 100 TB scale.

The reference (read-only at /root/reference/) is three single-node
pandas/NumPy scripts; this package re-derives every operator it computes as
declarative DataFrame/SQL plans (Catalyst-optimized), plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal columns,
text analysis) mandated by the project north star.

Layout:
    session      — tuned SparkSession factory
    sources      — parquet table loaders + graph/edge derivations
    functions    — scalar/array column-expression helpers (no UDFs)
    operators    — relational / graph / temporal operators (DataFrame→DataFrame)
    mining       — AutoAudit's ML/mining layer (iforest, sketch, SVD, MDL,
                   smurf — the end-to-end AA-Smurf/AA-AR/generator pipelines
                   live here; plan-shape assertions in tests/test_plans.py)
    llm          — dedup / similarity / text-analysis / multimodal extensions
    streaming    — Structured Streaming variants of the temporal operators
    registry     — query + DuckDB-oracle registry backing __spark_entry__.py
"""

__version__ = "0.1.0"
