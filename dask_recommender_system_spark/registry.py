"""Query registry: the single source of truth behind the driver contract.

Every operator from SURVEY.md §2 registers itself here with

- a PySpark implementation ``fn(spark, sf_dir) -> DataFrame``, and
- (when SQL-expressible) its DuckDB oracle twin — an ANSI-SQL string over
  the pre-registered parquet views (region nation customer supplier part
  orders lineitem events documents embeddings).

``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``. ``tests/test_oracle_parity.py`` runs the same
Spark-vs-DuckDB comparison the driver runs, locally at sf0.001.

Determinism rules (FIXTURES.md §6): every float output is ROUND(x, 6) on
both sides; every ranking has a unique tiebreak column; no wall-clock, no
unseeded randomness; timestamps leave the engine as epoch seconds BIGINT
so session-timezone settings cannot skew the comparison.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver falls back to rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query (SURVEY.md §2 inventory)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so registration side effects run."""
    from .operators import (  # noqa: F401
        dedup,
        extended,
        grouped,
        linalg,
        multimodal,
        relational,
        scale,
        similarity,
        text,
        windows,
    )
    from .models import queries as model_queries  # noqa: F401
    from .streaming import windows as streaming_windows  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all_operators()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    load_all_operators()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
