"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dask_recommender_system_spark``; the query ↔
oracle pairs are registered side-by-side in the operator modules (see
``dask_recommender_system_spark/registry.py``) and re-exported here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dask_recommender_system_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship (SURVEY.md §7.1 milestone 0): sf0.001 interactions →
    dedup-keep-last → encode → MLlib ALS fit → per-user top-5
    recommendations (X5), exercising S4, D2, A1-A4, J1 and the blocked-ALS
    training path in one pipe."""
    from dask_recommender_system_spark.models.queries import mllib_als_recommend

    return mllib_als_recommend(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; training/LSH queries
    are intentionally absent → driver rows-only check (SURVEY.md §5.2)."""
    return all_oracles()
