"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship KG-construction query on /root/testdata/sf0.001.
queries()     — one (spark, sf_dir) -> DataFrame per operator (SURVEY §2).
oracle_sql()  — DuckDB twins (row-count + schema + value-hash compared by
                the driver at sf=0.01). Implementations in
                kr_spark/entry_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts (derived from sf0.001 documents row ids) ->
    extraction -> entity linking/normalization -> deduplicated (s,p,o)."""
    from kr_spark.entry_queries import q_kg_pipeline

    return q_kg_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kr_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kr_spark.entry_queries import ORACLES

    return dict(ORACLES)
