"""Declared queries backed by the training models (SURVEY.md §2.6-2.7).

These are the genuinely non-SQL-expressible operators (iterative SGD /
blocked ALS), so they have no oracle_sql twin — the driver records the
rows-only check (driver contract, __spark_entry__.py docstring); their
numeric correctness is pinned instead by tests/test_model_parity.py
(1e-9 vs an independent numpy replica) and metric-tolerance tests.

Everything is deterministic: hash-based split, hash-uniform init, fixed
seeds — so row counts and schemas are stable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table, ratings_from_df
from ..registry import query
from .als import ALS
from .funk_svd import FunkSVD
from .mllib_als import fit_mllib_als, recommend_top_k


def _ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings_from_df(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )
    # reference prep pipeline: dedup keep-last then split (run_als.py:9-14)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "item_id").orderBy(
        F.col("ts").desc(), F.col("interaction_id").desc()
    )
    return (
        r.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "item_id", "rating", "interaction_id")
    )


def _fit_metrics_df(spark, sf_dir, model_cls, epochs=3, k=4):
    r = _ratings(spark, sf_dir)
    train = r.filter(F.col("interaction_id") % 10 < 7)
    test = r.filter(F.col("interaction_id") % 10 >= 7)
    m = model_cls(n_factors=k, lr=0.005, reg=0.001, epochs=epochs)
    m.fit(train, user_col="user_id", item_col="item_id", rating_col="rating",
          collect_errors=True)
    mae, mse, rmse = m.eval(m.predict(test))
    rows = [
        (e, round(tm[0], 6), round(tm[1], 6), round(tm[2], 6))
        for e, tm in enumerate(m.train_errors)
    ] + [(-1, round(mae, 6), round(mse, 6), round(rmse, 6))]
    return spark.createDataFrame(rows, "epoch int, mae double, mse double, rmse double")


@query("funk_svd_fit_metrics")  # non-SQL-expressible: iterative SGD
def funk_svd_fit_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 (SURVEY.md §7.3): FunkSVD relational SGD end-to-end — dedup →
    encode → fit (3 epochs, k=4) → predict held-out → eval. Returns
    per-epoch training (MAE,MSE,RMSE) plus the test metrics as epoch=-1."""
    return _fit_metrics_df(spark, sf_dir, FunkSVD)


@query("als_fit_metrics")  # non-SQL-expressible: iterative SGD
def als_fit_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: the "ALS" (alternating GD) variant — two error recomputes per
    epoch (reference models/als.py:160-174)."""
    return _fit_metrics_df(spark, sf_dir, ALS)


@query("mllib_als_recommend")  # non-SQL-expressible: blocked normal-equation ALS
def mllib_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 fast path: MLlib ALS (rank 8, 5 iters, seed 7) fit on the derived
    ratings; per-user top-5 via the blocked BLAS recommendForAllUsers."""
    r = _ratings(spark, sf_dir).withColumns(
        {
            "user_id": F.col("user_id").cast("int"),
            "item_id": F.col("item_id").cast("int"),
            "rating": F.col("rating").cast("float"),
        }
    )
    model = fit_mllib_als(r, rank=8, max_iter=5)
    return recommend_top_k(model, 5)
