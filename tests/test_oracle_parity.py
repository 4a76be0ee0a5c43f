"""Run every oracle-checked query against its DuckDB twin at sf0.001 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from dask_recommender_system_spark.registry import REGISTRY, load_all_operators

from .oracle_util import compare, duckdb_con

load_all_operators()

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, con, name):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    oracle_pdf = con.sql(q.oracle).df()
    problems = compare(spark_pdf, oracle_pdf, name)
    assert not problems, "\n".join(problems)
    assert len(spark_pdf) > 0, f"{name}: empty result"


@pytest.mark.slow
@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0


def test_approx_distinct_error_bound(spark, sf_dir):
    """agg_approx_distinct (rows-only for the driver): HLL++ estimates must
    sit within ~3x the configured 2.3% rsd of the exact per-bucket counts."""
    from pyspark.sql import functions as F

    approx = {
        r["bucket"]: r["approx_items"]
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    from dask_recommender_system_spark.data import load_table, ratings_from_df

    r = ratings_from_df(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )
    exact = {
        row["bucket"]: row["n"]
        for row in r.groupBy((F.col("user_id") % 10).alias("bucket"))
        .agg(F.countDistinct("item_id").alias("n"))
        .collect()
    }
    for b, n in exact.items():
        assert abs(approx[b] - n) <= max(0.07 * n, 2), (b, approx[b], n)


def test_hll_rollup_error_bound(spark, sf_dir):
    """hll_sketch_rollup (rows-only for the driver): the merged-sketch
    estimate must track the exact per-type distinct-user count within a
    few percent, and the row/day counts are exact."""
    from pyspark.sql import functions as F

    from dask_recommender_system_spark.data import load_table

    rolled = {
        r["event_type"]: r
        for r in REGISTRY["hll_sketch_rollup"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    n_rows = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(rolled) == set(exact)
    for t, n in exact.items():
        assert abs(rolled[t]["approx_users"] - n) <= max(0.05 * n, 2)
        assert rolled[t]["n_rows"] == n_rows[t]
