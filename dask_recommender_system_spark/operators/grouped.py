"""Grouped-map and vectorized-scalar Pandas UDF operators — the two
Arrow-crossing patterns not already exercised by multimodal (mapInPandas)
and streaming (applyInPandasWithState). Used only where the semantics are
genuinely awkward as SQL (SURVEY.md §7.0: built-ins first); both are
rows-only for the driver, with python-replica tests in
tests/test_properties.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..data import load_table, ratings_from_df, spread
from ..registry import query

EWMA_ALPHA = 0.3


def _ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ratings_from_df(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("interaction_id", T.LongType()),
        T.StructField("rating", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def ewma_per_user(ratings: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """Per-user EWMA of ratings in time order — the canonical sequential
    per-group recurrence (y_t = α·x_t + (1-α)·y_{t-1}) that window
    functions cannot express without recursion. GROUPED_MAP
    ``applyInPandas``: one shuffle on user_id, then each group's
    recurrence runs vectorized in pandas. At 100 TB the group payload is
    one user's history (bounded); skewed power-users are the risk — cap
    history length upstream or salt by time-bucket with a stitch pass."""

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "interaction_id"])
        y = pdf["rating"].ewm(alpha=alpha, adjust=False).mean()
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "interaction_id": pdf["interaction_id"],
                "rating": pdf["rating"],
                "ewma": np.round(y, 6),
            }
        )

    return ratings.groupBy("user_id").applyInPandas(ewma, schema=EWMA_SCHEMA)


@query("user_ewma")  # no oracle: sequential recurrence, not ANSI-SQL-expressible
def user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA over the ratings stream (deterministic user subset to
    bound output). Python-replica-tested in tests/test_properties.py."""
    r = (
        _ratings(spark, sf_dir)
        .filter(F.col("user_id") % 100 == 0)
        .dropDuplicates()  # testdata carries exact dup rows (D1); a defined
        # sequence needs one row per interaction
    )
    return ewma_per_user(r)


@query("embedding_quantize_int8")  # no oracle: array-of-int8 codec is engine-specific
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embeddings (per-vector scale =
    max|x|/127) — the memory-scale path for ANN: 4× smaller vectors, dot
    products in int arithmetic. Vectorized SCALAR ``pandas_udf`` over
    Arrow batches (numpy does whole batches; no per-row Python). Dequant
    error ≤ scale/2 per component, asserted in tests."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def quantize(v: pd.Series) -> pd.Series:
        def q1(arr):
            a = np.asarray(arr, dtype=np.float64)
            m = np.abs(a).max()
            s = (m / 127.0) if m > 0 else 1.0
            return np.clip(np.rint(a / s), -127, 127).astype(np.int32).tolist()

        return v.map(q1)

    @pandas_udf("double")
    def qscale(v: pd.Series) -> pd.Series:
        return v.map(
            lambda arr: float(np.abs(np.asarray(arr, dtype=np.float64)).max() / 127.0)
            or 1.0
        )

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return e.select(
        "vec_id",
        F.round(qscale("v"), 9).alias("scale"),
        quantize("v").alias("q"),
    )
