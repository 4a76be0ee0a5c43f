"""Schema-explicit sources & sinks (SURVEY.md §2.1).

The reference's I/O surface: header-less positional CSV
(``run_als.py:8``: ``pd.read_csv(path, names=[...])``), JSON-lines
(``json-to-csv.py:5-9``), header-less CSV sink (``json-to-csv.py:12``),
and parquet for the distributed dataset (report.pdf §4). Everything here
is schema-first — ``inferSchema`` costs a second full pass and produces
nondeterministic types at scale (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _schema(schema: T.StructType | str) -> T.StructType | str:
    return schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    """S1: positional CSV scan. ``names=[...]`` semantics come from the
    schema's field order, exactly like pandas' header-less read."""
    return (
        spark.read.schema(_schema(schema))
        .option("header", header)
        .option("sep", sep)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """S2: JSON-lines scan — Spark's native JSON format is JSONL, so the
    reference's driver-side readlines+json.loads loop becomes a
    distributed scan."""
    return spark.read.schema(_schema(schema)).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4: parquet scan; schema from the footer (exact), pruning/pushdown
    via Catalyst."""
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = False, mode: str = "overwrite") -> None:
    """S3: CSV sink (header-less by default, matching
    ``to_csv(index=False, header=False)``)."""
    df.write.mode(mode).option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Parquet sink; ``partition_by`` gives directory-level partition
    pruning for downstream readers — the 100 TB default for fact tables."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
