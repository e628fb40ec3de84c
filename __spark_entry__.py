"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end KG pipeline at sf0.001.
``queries()`` / ``oracle_sql()`` expose every SQL-expressible operator
from SURVEY.md §2 with a DuckDB oracle; non-SQL-expressible ops
(LSH blocking, simhash/minhash dedup, KMeans clustering, connected
components, the full triple pipeline) appear in queries() only
(rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_knowledge_extractor_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full knowledge-graph
    construction pipeline (enrich -> mentions -> tfidf -> concepts +
    similarity join -> graph) materialized as (subj, pred, obj, weight,
    prov) triples."""
    return entry_queries.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.get_queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.get_oracles()
