"""floatchat_datapipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``AaryanCode69/FloatChat-DataPipeLine``
(an ARGO-float NetCDF -> Postgres -> ChromaDB ETL + vector-search system),
extended with the operators a large-scale LLM training-data pipeline needs
(dedup, similarity search, text analysis, multimodal plumbing).

Design principles (see SURVEY.md §7):

- Declarative DataFrame/SQL plans; Catalyst/Tungsten pick the physical
  strategy. No hand-scheduled row loops.
- Built-in ``pyspark.sql.functions`` everywhere possible; Pandas UDFs only
  where JVM expressions genuinely cannot express the semantics (NetCDF
  decode, embedding model inference).
- Every operator is a composable ``DataFrame -> DataFrame`` function, so
  plans stay lazy end-to-end and optimizations (pushdown, pruning, AQE)
  apply across operator boundaries.
- Designed for 100 TB / 1000-executor scale: broadcast-able dims are
  broadcast, aggregations are partial-agg friendly, ids are content-derived
  (never positional), skew-prone joins have salting/LSH escape hatches.
"""

__version__ = "0.1.0"

from floatchat_datapipeline_spark.session import get_spark  # noqa: F401


def __getattr__(name: str):
    """Lazy top-level API (keeps bare-import cost at one module)."""
    if name == "FloatChatEngine":
        from floatchat_datapipeline_spark.api import FloatChatEngine

        return FloatChatEngine
    if name == "read_argo":
        from floatchat_datapipeline_spark.sources.netcdf import read_argo

        return read_argo
    if name == "semantic_search":
        from floatchat_datapipeline_spark.embeddings.search import semantic_search

        return semantic_search
    raise AttributeError(name)
